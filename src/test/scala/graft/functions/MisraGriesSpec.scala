package graft.functions

import graft.SparkSpec
import graft.ops.SketchOps
import org.apache.spark.sql.functions._

/** Misra–Gries sketch guarantees: planted zipf-ish stream with known
  * heavy hitters, adversarial partitioning, and the coverage/error
  * theorems on real corpus data via the registry gate. */
class MisraGriesSpec extends SparkSpec {

  test("planted stream: every heavy hitter surfaces, estimates are in-bound lower bounds") {
    import spark.implicits._
    // n = 1000: "alpha" 400, "beta" 250, "gamma" 150, 200 singletons
    val stream = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++
      Seq.fill(150)("gamma") ++ (1 to 200).map(i => s"rare$i")
    val k = 9 // floor n/(k+1) = 100 -> alpha/beta/gamma are guaranteed
    val mg = udaf(MisraGriesAggregator(k))
    // adversarial: many partitions, shuffled arrival order
    val sketch = new scala.util.Random(7).shuffle(stream).toDF("term")
      .repartition(13)
      .agg(mg(col("term")).as("s"))
      .select(explode(col("s")).as(Seq("term", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k)
    val truth = Map("alpha" -> 400L, "beta" -> 250L, "gamma" -> 150L)
    truth.foreach { case (t, f) =>
      assert(sketch.contains(t), s"heavy hitter $t missing")
      assert(sketch(t) <= f, s"$t overestimated")
      assert(f - sketch(t) <= 1000L / (k + 1), s"$t error out of bound")
    }
  }

  test("merge is the mergeable-summaries rule: k-bounded and count-conservative") {
    val agg = MisraGriesAggregator(3)
    val a = Map("x" -> 10L, "y" -> 5L, "z" -> 3L)
    val b = Map("x" -> 2L, "w" -> 6L, "v" -> 1L)
    val m = agg.merge(a, b)
    assert(m.size <= 3)
    // summed: x 12, w 6, y 5, z 3, v 1; 4th largest = 3 -> subtract 3
    assert(m == Map("x" -> 9L, "w" -> 3L, "y" -> 2L))
  }

  test("registry gate holds on the real corpus (coverage + error bound)") {
    val g = SketchOps.heavyHittersGate(spark, Sf0001).collect()(0)
    assert(g.getBoolean(2), "MG guarantee violated on corpus")
    assert(g.getInt(1) >= 1, "fixture should have at least one heavy hitter")
  }

  test("grouped gate: the MG guarantee holds independently inside every language") {
    val rows = SketchOps.heavyHittersByLangGate(spark, Sf0001).collect()
    assert(rows.length >= 2, "fixture should span multiple languages")
    rows.foreach { r =>
      assert(r.getBoolean(3), s"MG guarantee violated for lang ${r.getString(0)}")
    }
  }

  test("grouped sketch isolates a group-local heavy hitter a global sketch drowns") {
    import spark.implicits._
    // 'minor' language: 30 tokens, 12 of them "pivot" (40% locally,
    // but only 12/1030 ≈ 1.2% globally — far below the global floor)
    val major = (1 to 1000).map(i => ("major", s"word${i % 500}"))
    val minor = Seq.fill(12)(("minor", "pivot")) ++ (1 to 18).map(i => ("minor", s"m$i"))
    val docs = (major ++ minor).groupBy(_._1).toSeq.map { case (lang, ts) =>
      (lang.hashCode.toLong, ts.map(_._2).mkString(" "), lang, "src0", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("hh_lang")
    docs.repartition(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val grouped = SketchOps.heavyHittersByLang(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // group-local floor: n_minor/(k+1) = 30/65 < 1 -> "pivot" guaranteed
    assert(grouped.contains(("minor", "pivot")), "group-local heavy hitter missing")
    assert(grouped(("minor", "pivot")) <= 12L)
    val gate = SketchOps.heavyHittersByLangGate(spark, dir).collect()
    gate.foreach(r => assert(r.getBoolean(3), s"gate failed for ${r.getString(0)}"))
  }

  // ------------------------------- HLL sketch cube (DataSketches tiles)

  test("sketch cube: per-month estimates track exact counts within 5%") {
    import org.apache.spark.sql.functions._
    val est = SketchOps.sketchCube(spark, Sf0001).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val exact = graft.ops.Tables(spark, Sf0001, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (m, e) =>
      assert(math.abs(e - exact(m)) * 100 <= exact(m) * 5, s"month $m: $e vs ${exact(m)}")
    }
  }

  test("sketch tiles survive parquet storage and union to the same range answer") {
    import org.apache.spark.sql.functions._
    // the storability point: write the monthly tiles, read them back,
    // merge ACROSS the storage boundary — approx_count_distinct can't
    val tiles = graft.ops.Tables(spark, Sf0001, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
    val dir = tempDir("hll_tiles")
    tiles.write.mode("overwrite").parquet(s"$dir/tiles")
    val merged = spark.read.parquet(s"$dir/tiles")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val exact = graft.ops.Tables(spark, Sf0001, "lineitem")
      .agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(merged - exact) * 100 <= exact * 4, s"$merged vs $exact")
    val gate = SketchOps.sketchCubeGate(spark, Sf0001).collect()(0)
    assert(gate.getAs[Boolean]("passes"))
  }
}
