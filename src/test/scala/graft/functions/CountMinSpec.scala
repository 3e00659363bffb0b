package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch semantics: never undercounts, partitioning-
  * invariant (mergeable), and tight on a small planted stream. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private def sketchOf(terms: Seq[String], parts: Int): Array[Long] = {
    val cms = udaf(CountMinAggregator(D, W))
    terms.toDF("term").repartition(parts)
      .agg(cms(col("term")).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sk").toArray
  }

  test("planted counts: estimates exact when no collisions, never below truth") {
    val stream = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val sk = sketchOf(stream, 3)
    val est = Map(
      "alpha" -> CountMinAggregator.estimate(sk, "alpha", D, W),
      "beta" -> CountMinAggregator.estimate(sk, "beta", D, W),
      "gamma" -> CountMinAggregator.estimate(sk, "gamma", D, W))
    assert(est("alpha") >= 5 && est("beta") >= 3 && est("gamma") >= 1)
    // 3 distinct terms in 4×1024 cells: collision-free in at least one
    // row with overwhelming margin — estimates are exact here
    assert(est == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
    // total mass per row is the stream length
    for (d <- 0 until D)
      assert(sk.slice(d * W, (d + 1) * W).sum == stream.length.toLong)
  }

  test("mergeable: estimates independent of partitioning") {
    val stream = (1 to 400).map(i => s"t${i % 37}")
    val a = sketchOf(stream, 1)
    val b = sketchOf(stream, 8)
    assert(a.toSeq == b.toSeq, "elementwise-sum merge must be partition-count-invariant")
  }

  test("inner product: exact join size when collision-free, never below truth") {
    // A = {a×3, b×2, c×1}, B = {b×4, c×5, d×7} → true join size
    // Σ n_A(k)·n_B(k) = 2·4 + 1·5 = 13; 4 distinct terms in 4×1024
    // cells → some row is collision-free and min() recovers it exactly
    val a = sketchOf(Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"), 2)
    val b = sketchOf(Seq.fill(4)("b") ++ Seq.fill(5)("c") ++ Seq.fill(7)("d"), 3)
    assert(CountMinAggregator.innerProduct(a, b, D, W) == 13L)
    // self-join size (F2): 9 + 4 + 1 = 14
    assert(CountMinAggregator.innerProduct(a, a, D, W) == 14L)
  }

  test("join-size gate: both bounds hold on the real tables at sf0.001") {
    val rows = graft.ops.SketchOps.joinSizeGate(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("l_partkey_self", "lineitem_orders"))
    rows.foreach(r => assert(r.getAs[Boolean]("passes"), r.getString(0)))
  }

  test("gate passes on the real corpus at sf0.001") {
    val rows = graft.ops.SketchOps.cmsGate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("overestimates"), s"undercount at ${r.getString(0)}")
      assert(r.getAs[Boolean]("within_bound"), s"excess blown at ${r.getString(0)}")
    }
  }

  test("negative control: a scrambled sketch breaks the never-undercount bound the CMS gate checks") {
    // failure mode: the hash→cell mapping the estimator assumes no
    // longer matches the counters (a serialization/merge bug would look
    // exactly like this). Rotating every row by one cell leaves all the
    // mass in place but moves it off the probe cells — the estimate for
    // a frequent term collapses, so the gate's `overestimates`
    // (est >= freq) predicate reads FALSE and the correctness row reds.
    val stream = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      (1 to 200).map(i => s"t$i")
    val sk = sketchOf(stream, 2)
    val bad = new Array[Long](D * W)
    for (d <- 0 until D; i <- 0 until W)
      bad(d * W + i) = sk(d * W + (i + 1) % W)
    val est = CountMinAggregator.estimate(bad, "alpha", D, W)
    assert(est < 50, s"scrambled sketch still covers alpha's count: $est")
  }

  test("negative control: lost and inflated sketches red both join-size gate bounds") {
    // exact |A ⋈ B| = 2·4 + 1·5 = 13 (from the planted streams above)
    val a = sketchOf(Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"), 2)
    val b = sketchOf(Seq.fill(4)("b") ++ Seq.fill(5)("c") ++ Seq.fill(7)("d"), 3)
    // failure mode 1 — lost rows (a scan that silently dropped a
    // partition): the inner product undercounts, so the gate's
    // `est >= exact` lower bound reds
    val aLost = sketchOf(Seq("a", "b"), 1)
    assert(CountMinAggregator.innerProduct(aLost, b, D, W) < 13L)
    // failure mode 2 — double-counted partials (a merge applied twice):
    // the excess blows the deterministic depth·|A|·|B|/width band, so
    // `within_bound` reds (|A|=6, |B|=16)
    val aDoubled = a.map(_ * 2L)
    val inflated = CountMinAggregator.innerProduct(aDoubled, b, D, W)
    assert(inflated > 13L && (inflated - 13L) * W > D.toLong * 6L * 16L)
  }
}
