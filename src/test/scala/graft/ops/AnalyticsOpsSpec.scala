package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the round-5 analytics additions: cohort retention,
  * boilerplate stripping, int8 embedding quantization, the bloom-pruned
  * semi join, and the aggregate-join-back (Q18) shape. */
class AnalyticsOpsSpec extends SparkSpec {

  // ---------------------------------------------------------------- retention

  test("retention: day-0 cohort sizes sum to the distinct-user count") {
    val r = EventOps.retentionCohorts(spark, Sf0001)
    val rows = r.collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0)
      .map(_.getAs[Long]("n_users")).sum
    val users = Tables(spark, Sf0001, "events")
      .select(col("user_id")).distinct().count()
    assert(day0 == users) // every user enters exactly one cohort at offset 0
    // offsets are non-negative and consistent with the timestamps
    rows.foreach { row =>
      val off = row.getAs[Int]("day_offset")
      assert(off >= 0)
      val coh = row.getAs[java.sql.Timestamp]("cohort_day")
      val act = row.getAs[java.sql.Timestamp]("activity_day")
      assert((act.getTime - coh.getTime) == off * 86400000L)
    }
  }

  test("retention: no activity row below its user's cohort day") {
    // each cohort's day-0 row exists (a cohort is BORN from activity)
    val r = EventOps.retentionCohorts(spark, Sf0001).collect()
    val cohorts = r.map(_.getAs[java.sql.Timestamp]("cohort_day")).distinct
    cohorts.foreach { c =>
      assert(r.exists(row => row.getAs[java.sql.Timestamp]("cohort_day") == c
        && row.getAs[Int]("day_offset") == 0))
    }
  }

  // ------------------------------------------------------------- boilerplate

  /** Fixture: docs 0 and 1 share their first 16-token paragraph
    * (boilerplate, df=2); every other paragraph is unique to its doc. */
  private lazy val boilerDir: String = {
    import spark.implicits._
    val plate = (1 to 16).map(i => s"plate$i").mkString(" ")
    val a = plate + " " + (1 to 16).map(i => s"alpha$i").mkString(" ")
    val b = plate + " " + (1 to 16).map(i => s"beta$i").mkString(" ")
    val c = (1 to 16).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (0L, a, "en", "src0", a.length.toLong),
      (1L, b, "en", "src0", b.length.toLong),
      (2L, c, "en", "src1", c.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("boiler_docs")
    docs.repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("boilerplate: the shared paragraph is stripped from BOTH docs") {
    val r = PretrainOps.boilerplateStrip(spark, boilerDir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_paras"), x.getAs[Int]("n_kept"), x.getAs[String]("clean_text"))).toMap
    assert(r(0L)._1 == 2 && r(0L)._2 == 1) // plate dropped, alpha kept
    assert(r(0L)._3.startsWith("alpha1 "))
    assert(!r(0L)._3.contains("plate"))
    assert(r(1L)._2 == 1 && r(1L)._3.startsWith("beta1 "))
    assert(r(2L) == ((1, 1, (1 to 16).map(i => s"gamma$i").mkString(" "))))
  }

  test("boilerplate: complements paragraphDedup (first occurrence vs none)") {
    // paragraphDedup keeps ONE copy of the shared paragraph; boilerplate
    // strips ALL copies — the df>=2 paragraph must survive in exactly one
    // of doc 0/1 under dedup and in neither under boilerplate.
    val dedup = PretrainOps.paragraphDedup(spark, boilerDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("clean_text")).toMap
    assert(dedup(0L).contains("plate1") ^ dedup(1L).contains("plate1"))
  }

  // ------------------------------------------------------------ quantization

  test("quantize: codes in [-127,127], dequant error <= scale/2, zero vector safe") {
    import spark.implicits._
    val dir = tempDir("quant_emb")
    val vecs = Seq(
      (0L, Array(0.5f, -1.0f, 0.25f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f, 0.0f), 1), // zero vector edge
      (2L, Array(1e-8f, -1e-8f, 1e-8f, -1e-8f), 2)) // tiny but nonzero scale
      .toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = SimilarityOps.quantizeInt8(spark, dir).collect()
      .map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Double]("scale"), x.getAs[scala.collection.Seq[Int]]("qvec"))).toMap
    // zero vector: scale 0, all-zero codes (no NaN/overflow)
    assert(r(1L)._1 == 0.0 && r(1L)._2.forall(_ == 0))
    // codes bounded; max|x| quantizes to exactly +/-127
    assert(r(0L)._2.forall(q => q >= -127 && q <= 127))
    assert(r(0L)._2(1) == -127)
    // reconstruction error bounded by half a step
    val (s0, q0) = r(0L)
    val orig = Array(0.5, -1.0, 0.25, 0.0)
    q0.zipWithIndex.foreach { case (q, i) =>
      assert(math.abs(q * s0 - orig(i)) <= s0 / 2 + 1e-12)
    }
  }

  test("quantize: quantized cosine approximates exact cosine on real data") {
    val r = SimilarityOps.quantizeInt8(spark, Sf0001)
      .join(Tables(spark, Sf0001, "embeddings"), "vec_id")
      .limit(50).collect()
    r.foreach { row =>
      val scale = row.getAs[Double]("scale")
      val q = row.getAs[scala.collection.Seq[Int]]("qvec").map(_ * scale)
      val x = row.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
      val dot = q.zip(x).map { case (a, b) => a * b }.sum
      val cos = dot / math.sqrt(q.map(a => a * a).sum * x.map(b => b * b).sum)
      assert(cos > 0.999) // int8 keeps cosine structure to ~3 decimals
    }
  }

  test("quantized top-k: self is rank 1 and recall clears the gate floor") {
    val q = SimilarityOps.topkQuantized(spark, Sf0001).collect()
    // a vector's quantized twin still has cosine 1 with itself → rank 1
    q.filter(_.getAs[Int]("rank") == 1)
      .foreach(r => assert(r.getAs[Long]("q_id") == r.getAs[Long]("neighbor_id")))
    val exact = SimilarityOps.topkBrute(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hit = q.count(r => exact((r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))))
    assert(hit.toDouble / exact.size >= SimilarityOps.QuantRecallFloor)
    // and the gate entry itself agrees
    val gate = SimilarityOps.quantRecallGate(spark, Sf0001).collect()(0)
    assert(gate.getAs[Boolean]("passes"))
  }

  // ------------------------------------------------- binary (sign-bit) codes

  test("binary quantize: packed words round-trip the coordinate signs") {
    val rows = SimilarityOps.quantizeBinary(spark, Sf0001)
      .join(Tables(spark, Sf0001, "embeddings"), "vec_id")
      .limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Long]("lo"); val hi = r.getAs[Long]("hi")
      val x = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(x.length == 64)
      // both words use only their low 32 bits
      assert((lo >>> 32) == 0L && (hi >>> 32) == 0L)
      x.zipWithIndex.foreach { case (v, i) =>
        val word = if (i < 32) lo else hi
        val bit = (word >> (i % 32)) & 1L
        assert(bit == (if (v > 0f) 1L else 0L),
          s"dim $i of vec ${r.getAs[Long]("vec_id")}: coord $v, bit $bit")
      }
    }
  }

  test("hamming top-k: self pair is present at distance 0") {
    val rows = SimilarityOps.topkHamming(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val self = rows.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("neighbor_id"))
    assert(self.length == 10) // all 10 queries retain their own code
    self.foreach(r => assert(r.getAs[Int]("hamming") == 0))
    // distances are bounded by the code width and non-decreasing in rank
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Int]("hamming"))
      assert(byRank.forall(h => h >= 0 && h <= 64))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("binary rerank: exact on a ±1 corpus where sign bits lose nothing") {
    import spark.implicits._
    val dir = tempDir("bin_emb")
    val rnd = new scala.util.Random(7)
    // ±1 vectors: cos = (64 - 2·hamming)/64, so the Hamming order IS the
    // cosine order and the 64-wide shortlist covers the whole corpus —
    // the two-stage path must reproduce the brute-force anchor exactly
    val vecs = (0L until 40L).map { id =>
      (id, Array.fill(64)(if (rnd.nextBoolean()) 1.0f else -1.0f), (id % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rerank = SimilarityOps.topkBinaryRerank(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    val brute = SimilarityOps.topkBrute(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(rerank.sorted.sameElements(brute.sorted))
    // ...and the first-stage Hamming ranking already agrees pair-for-pair
    val ham = SimilarityOps.topkHamming(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(ham.sorted.sameElements(brute.sorted))
  }

  test("mmr rerank: local greedy replay matches row-for-row; scores non-increasing") {
    val vecs = graft.ops.Tables(spark, Sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100000).toLong).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val out = SimilarityOps.mmrRerank(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // replay the greedy locally: pool = top-8 by (dot desc, id), then
    // 4 rounds of argmax(rel − max-sim-to-selected), ties to lower id
    for (q <- vecs.keys.filter(_ < 10)) {
      val pool = vecs.toSeq.collect { case (id, v) if id != q => (id, dot(vecs(q), v)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(8)
      var selected = Vector.empty[(Long, Long, Long)]
      var remaining = pool
      for (r <- 1 to 4) {
        val pick = remaining.map { case (id, rel) =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(s => dot(vecs(id), vecs(s._1))).max
          (id, rel, ms)
        }.minBy { case (id, rel, ms) => (-(rel - ms), id) }
        selected :+= pick
        remaining = remaining.filterNot(_._1 == pick._1)
        assert(out.contains((q, r, pick._1, pick._2, pick._3)),
          s"q=$q round=$r expected ${pick}")
      }
    }
    // greedy invariant FROM round 2 on: each candidate's max-sim only
    // grows as the selected set does, so the per-round maxima are
    // non-increasing (round 1 pins ms = 0, and dot-sims can be
    // negative, so 1→2 may legitimately rise)
    out.groupBy(_._1).values.foreach { rows =>
      val s = rows.sortBy(_._2).map(t => t._4 - t._5).drop(1)
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("binary index probe: identical rows to the inline form") {
    val idx = SimilarityOps.binaryIndexDirFor(Sf0001)
    val inline = SimilarityOps.topkHamming(spark, Sf0001).collect().toSeq
    val probed = SimilarityOps.topkHammingIndexed(spark, Sf0001).collect().toSeq
    assert(probed == inline)
    assert(new java.io.File(idx, "_SUCCESS").exists())
  }

  test("binary rerank: recall clears the gate floor on real data") {
    val gate = SimilarityOps.binaryRecallGate(spark, Sf0001).collect()(0)
    assert(gate.getAs[Int]("n_exact") == 100)
    assert(gate.getAs[Boolean]("passes"))
  }

  // ------------------------------------------------------ set-all / window

  test("exceptAll/intersectAll: multiplicities subtract and min, not collapse") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("user_id")
    val b = Seq(1L, 2L, 2L).toDF("user_id")
    val surplus = a.exceptAll(b).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(surplus == Map(1L -> 2L, 3L -> 1L)) // 3-1 ones, 1-2 twos (floor 0), 1-0 threes
    val common = a.intersectAll(b).groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(common == Map(1L -> 1L, 2L -> 1L)) // min(3,1), min(1,2)
  }

  test("w8: per-user first/last/second are frame-wide, not running") {
    val rows = WindowOps.w8FirstLast(spark, Sf0001).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      // every row of a user carries the SAME first/last/second annotation
      assert(rs.map(_.getAs[String]("first_type")).distinct.length == 1)
      assert(rs.map(_.getAs[String]("last_type")).distinct.length == 1)
      assert(rs.map(_.getAs[String]("second_type")).distinct.length == 1)
      // and a single-event user has no second event
      if (rs.length == 1) assert(rs.head.getAs[String]("second_type") == null)
    }
  }

  // ----------------------------------------------------------- bloom/Q18

  test("bloom semi join: exactly equals the plain semi join") {
    val got = JoinOps.j9BloomSemi(spark, Sf0001).collect().toSeq
    val hot = Tables(spark, Sf0001, "orders").filter(col("o_totalprice") > 450000.0)
    val want = Tables(spark, Sf0001, "lineitem")
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(got == want) // bloom prunes, never drops (no false negatives)
    assert(got.nonEmpty)
  }

  test("column stats: consistent bounds, histogram mass conserves and respects min/max") {
    val stats = StatsOps.analyzeLineitem(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats.size == 4)
    stats.values.foreach { r =>
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
    val hist = StatsOps.histogramQuantity(spark, Sf0001).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("n")).toMap
    assert(hist.keySet.subsetOf((0 to 9).toSet))
    assert(hist.values.sum == stats("l_quantity").getAs[Long]("n_rows"))
    assert(hist.contains(0) && hist.contains(9), "extreme buckets must hold min/max rows")
  }

  test("top-k family plans: partial map-side aggregate, never a q_id window") {
    // the r5-flagged scale killer must stay dead: every top-k consumer
    // ranks through the k-bounded pairs aggregate (partial before the
    // exchange), not a row_number window over the |queries|-value key
    Seq(
      SimilarityOps.topkBrute(spark, Sf0001),
      SimilarityOps.hardNegatives(spark, Sf0001),
      RetrievalOps.bm25(spark, Sf0001)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_topkpairsaggregator"),
        "map-side partial top-k missing from plan")
      assert(!plan.contains("Window"), "q_id window crept back into a top-k plan")
    }
  }

  test("salted join: shuffled (not broadcast) plan keyed on salt; rows equal plain join") {
    val df = JoinOps.j10SaltedJoin(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), "salted join must shuffle, not broadcast")
    assert(!plan.contains("BroadcastHashJoin"))
    assert(plan.contains("salt"), "join keys must include the salt column")
    // semantic neutrality: identical to the plain unsalted broadcast join
    val plain = Tables(spark, Sf0001, "events")
      .join(Tables(spark, Sf0001, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("type_n")),
        Seq("event_type"))
      .groupBy(col("event_type"), col("type_n"))
      .agg(sumExact(col("value")).as("total_value"), count(lit(1)).as("n_rows"))
      .orderBy("event_type")
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  test("q1: scaled-int64 measures agree with the decimal aggregation path") {
    val r = JoinOps.q1PricingSummary(spark, Sf0001).collect()
    assert(r.nonEmpty)
    val cutoff = java.sql.Timestamp.valueOf("1998-09-02 00:00:00")
    val want = Tables(spark, Sf0001, "lineitem")
      .filter(col("l_shipdate") <= lit(cutoff))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sumExact(col("l_quantity")).as("sq"),
        sumExact(col("l_extendedprice")).as("sp"),
        revenueExact(col("l_extendedprice"), col("l_discount")).as("sd"),
        count(lit(1)).as("n"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getLong(5))).toMap
    r.foreach { row =>
      val k = (row.getAs[String]("l_returnflag"), row.getAs[String]("l_linestatus"))
      val (sq, sp, sd, n) = want(k)
      assert(row.getAs[Double]("sum_qty") == sq)
      assert(row.getAs[Double]("sum_base_price") == sp)
      assert(row.getAs[Double]("sum_disc_price") == sd)
      assert(row.getAs[Long]("count_order") == n)
      // charge >= disc price (tax is non-negative)
      assert(row.getAs[Double]("sum_charge") >= row.getAs[Double]("sum_disc_price"))
    }
    // the served DECIMAL-path twin is row-for-row (bit-for-bit) equal —
    // the scaled-int extraction route makes parity structural
    assert(JoinOps.q1PricingSummaryDecimal(spark, Sf0001).collect().toSeq == r.toSeq)
  }

  test("q4: priority counts equal a distinct-count formulation") {
    val got = JoinOps.q4PriorityCount(spark, Sf0001).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("order_count")).toMap
    val o = Tables(spark, Sf0001, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val li = Tables(spark, Sf0001, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    val want = o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("q18: every surviving order's quantity sum exceeds the threshold") {
    val rows = JoinOps.q18BigOrders(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 250.0))
    // join-back consistency: recompute one order's quantity sum
    val k = rows.head.getAs[Long]("o_orderkey")
    val want = Tables(spark, Sf0001, "lineitem")
      .filter(col("l_orderkey") === k)
      .agg(sumExact(col("l_quantity"))).collect()(0).getDouble(0)
    assert(rows.head.getAs[Double]("total_qty") == want)
  }

  // ------------------------------------------------- approx-accuracy gates

  test("HLL distinct gate: sketch within 5x rsd of the exact anchor") {
    val g = SetOps.g3ApproxDistinctGate(spark, Sf0001).collect()(0)
    assert(g.getAs[Boolean]("passes"))
    // and the anchor itself agrees with a direct recount
    val exact = Tables(spark, Sf0001, "lineitem")
      .agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(g.getAs[Long]("n_parts") == exact)
  }

  test("HLL distinct gate plan: the sketch never rides inside the distinct-expand") {
    // the sf1 scale validation caught the mixed form live: countDistinct
    // + approx_count_distinct in ONE agg plans the HLL inside the
    // distinct-expand's sort-based aggregation, where every input row
    // MERGES a full register array (O(rows·registers)). The gate must
    // keep the two passes as separate aggregations joined at one row.
    val plan = SetOps.g3ApproxDistinctGate(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"exact pass lost its distinct expand:\n$plan")
    assert(plan.contains("approx_count_distinct"), s"HLL pass missing:\n$plan")
    // the pathological plan lists both function families in ONE
    // aggregate node ("functions=[count(distinct ...), ...,
    // approx_count_distinct(...)]"); the fixed plan never does
    val mixed = plan.linesIterator.filter(l =>
      l.contains("approx_count_distinct") && l.contains("count(distinct")).toSeq
    assert(mixed.isEmpty,
      s"exact distinct and HLL share an aggregate node:\n${mixed.mkString("\n")}")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"expected a 1-row-x-1-row join of the two passes:\n$plan")
  }

  test("negative control: a tile set missing months reds the sketch-cube gate band") {
    // failure mode: the tile materialization loses partitions (a
    // partial overwrite, a month-boundary off-by-one). Answering the
    // gate's full-1995 range query from January's tile alone must blow
    // the 4% band — the exact predicate sketchCubeGate serves — so a
    // broken tile pipeline reds the correctness row rather than
    // shipping a silently-low distinct count.
    val janOnly = SketchOps.monthlyTiles(spark, Sf0001)
      .filter(col("month") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("month") < lit(java.sql.Timestamp.valueOf("1995-02-01 00:00:00")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val exact1995 = Tables(spark, Sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(math.abs(janOnly - exact1995) * 100L > exact1995 * 4L,
      s"one-month tile est $janOnly vs exact $exact1995 still inside the band")
    // the healthy gate stays green on the same data, same predicate
    assert(SketchOps.sketchCubeGate(spark, Sf0001).collect()(0).getAs[Boolean]("passes"))
  }

  test("approx percentile gate: GK rank error within n/accuracy per group") {
    val rows = SetOps.g4bApproxPercentileGate(spark, Sf0001).collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getAs[Boolean]("passes"),
      s"rank bound violated for flag ${r.getString(0)}"))
  }

  test("hard negatives: no neighbor shares the query's label, ranks descend by cosine") {
    val labels = Tables(spark, Sf0001, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SimilarityOps.hardNegatives(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("q_id")),
        s"neighbor shares label with query ${r.getAs[Long]("q_id")}")
    }
    // hard-negative set = brute-force top-k restricted to other labels
    val brute = SimilarityOps.topkBrute(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // a query's top hard negative can't outrank its global top-1 twin (self)
    rows.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("q_id"))
    }
    assert(brute.nonEmpty) // anchor sanity
  }

  test("equi-depth histogram: skewed mass isolates, tail shares a bucket") {
    import spark.implicits._
    // 80 rows of value 1 + one row each of 2..9: equi-width would put
    // 81/88 rows in bucket 0; equi-depth isolates the hot value in
    // bucket 0 and packs the 8-row tail into bucket 7 (first-row-rank
    // rule: cum_before(2)=80 → (80·8)//88 = 7)
    val qs = Seq.fill(80)(1.0) ++ (2 to 9).map(_.toDouble)
    val fix = tempDir("eqdepth")
    qs.toDF("l_quantity").repartition(4)
      .write.mode("overwrite").parquet(s"$fix/lineitem.parquet")
    val got = StatsOps.histogramEquiDepth(spark, fix).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == Seq((0, 1.0, 1.0, 80L), (7, 2.0, 9.0, 8L)))
  }

  test("equi-depth histogram: uniform distinct values spread evenly") {
    import spark.implicits._
    val fix = tempDir("eqdepth_u")
    (1 to 16).map(_.toDouble).toDF("l_quantity").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/lineitem.parquet")
    val got = StatsOps.histogramEquiDepth(spark, fix).collect()
      .map(r => (r.getInt(0), r.getLong(3))).toSeq
    assert(got == (0 to 7).map(b => (b, 2L)), s"got $got") // 16 values / 8 buckets
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val pre = ts("2024-01-10 00:00:00")
  private val post = ts("2024-01-20 00:00:00")

  test("CUPED: hand-computed theta and adjusted means on a planted cohort") {
    import spark.implicits._
    val fix = tempDir("cuped")
    // per user (pre x, post y) in whole currency: (10,20) (20,30) (30,50)
    // (40,60) → exact θ = (4·47e6 − 1e4·1.6e4)/(4·3e7 − 1e8) = 1.4
    Seq((1L, pre, 10.0), (1L, post, 20.0),
      (2L, pre, 20.0), (2L, post, 30.0),
      (3L, pre, 30.0), (3L, post, 50.0),
      (4L, pre, 40.0), (4L, post, 60.0))
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.abCuped(spark, fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    // raw arm gap 45 vs 35; CUPED shrinks it to 38 vs 42 — the pre-period
    // imbalance (arm 0 drew heavier users) is exactly what θ removes
    assert(got == Seq((0L, 2L, 45.0, 38.0, 1.4), (1L, 2L, 35.0, 42.0, 1.4)),
      s"got $got")
  }

  test("CUPED: constant covariate degrades to the raw mean (theta = 0)") {
    import spark.implicits._
    val fix = tempDir("cuped_const")
    Seq((1L, pre, 10.0), (1L, post, 20.0),
      (2L, pre, 10.0), (2L, post, 40.0))
      .toDF("user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.abCuped(spark, fix).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    // var(x) = 0 would make θ undefined; the nullif guard pins θ = 0 so
    // the adjusted mean equals the raw mean instead of NaN-poisoning
    assert(got == Seq((0L, 40.0, 40.0, 0.0), (1L, 20.0, 20.0, 0.0)), s"got $got")
  }

  test("Welch t: hand-computed statistic and df on a planted 2x2 cohort") {
    import spark.implicits._
    val fix = tempDir("welch")
    // arm1 = {u1: 20, u3: 40}, arm0 = {u2: 30, u4: 50} → both variances
    // 200, diff 10 → t = 10/√200, Welch df degenerates to exactly 2
    Seq((1L, pre, 20.0), (2L, pre, 30.0), (3L, pre, 40.0), (4L, pre, 50.0))
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val r = EventOps.abWelch(spark, fix).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((40.0, 30.0, 10.0)))
    assert(r.getDouble(5) == 10.0 / math.sqrt(200.0), s"t = ${r.getDouble(5)}")
    assert(r.getDouble(6) == 2.0, s"df = ${r.getDouble(6)}")
  }

  test("SRM guard: balanced split passes, 9:1 split trips the chi-square wire") {
    import spark.implicits._
    def srmOf(name: String, users: Seq[Long]): (Long, Long, Double, Boolean) = {
      val fix = tempDir(name)
      // duplicate one user's events: the guard must count DISTINCT users
      (users ++ users.take(1)).map(u => (u, pre, 1.0))
        .toDF("user_id", "ts", "value").repartition(2)
        .write.mode("overwrite").parquet(s"$fix/events.parquet")
      val r = EventOps.abSrm(spark, fix).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    }
    assert(srmOf("srm_ok", (1L to 10L)) == ((5L, 5L, 0.0, false)))
    // 9 even vs 1 odd: χ² = 2·(4²/5) = 6.4 > 3.841
    assert(srmOf("srm_bad", (1L to 9L).map(_ * 2L) :+ 1L) == ((9L, 1L, 6.4, true)))
  }

  test("AB readout plans: window-free, map-side-combinable aggregates") {
    // the family's scale claim is structural: per-user rollups must be
    // partial-aggregated below the exchange and NO operator may fall
    // back to a window (a window keyed by arm would buffer half the
    // users in one task)
    for (op <- Seq(EventOps.abCuped _, EventOps.abWelch _, EventOps.abSrm _,
        EventOps.abDid _)) {
      val plan = op(spark, Sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), s"window leaked into:\n$plan")
      assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
    }
  }

  test("mann-whitney plan: running counts ride range-partitioned slices, not one global window") {
    val plan = EventOps.abMannWhitney(spark, Sf0001)
      .queryExecution.executedPlan.toString
    // every window in the plan must involve the slice id — a
    // windowspecdefinition without __pid would be the one-task global
    // cumsum this core exists to avoid (distinct per-user totals can
    // approach the user count)
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"no window found in:\n$plan")
    assert(windows.forall(_.contains("__pid")),
      s"global window leaked:\n${windows.mkString("\n")}")
    assert(plan.contains("rangepartitioning"), s"no range exchange in:\n$plan")
  }

  test("mann-whitney: complete separation and tied symmetry, hand-computed") {
    import spark.implicits._
    def mwOf(name: String, rows: Seq[(Long, Double)]) = {
      val fix = tempDir(name)
      rows.map { case (u, v) => (u, pre, v) }
        .toDF("user_id", "ts", "value").repartition(3)
        .write.mode("overwrite").parquet(s"$fix/events.parquet")
      val r = EventOps.abMannWhitney(spark, fix).collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    // arm0 = {1,2,3} all below arm1 = {4,5,6}: U1 = n0·n1 = 9 (complete
    // separation), z = 4.5/√5.25 — replayed in plain doubles
    val sep = mwOf("mw_sep", Seq((2L, 1.0), (4L, 2.0), (6L, 3.0),
      (1L, 4.0), (3L, 5.0), (5L, 6.0)))
    assert(sep == ((3L, 3L, 9.0, 4.5 / math.sqrt(0.75 * 7.0))), s"got $sep")
    // identical arms with ties: U1 = n0·n1/2, z = 0 — and the tie
    // correction (Σ(t³−t) = 12) must not disturb the exact zero
    val tie = mwOf("mw_tie", Seq((2L, 1.0), (4L, 2.0), (1L, 1.0), (3L, 2.0)))
    assert(tie == ((2L, 2L, 2.0, 0.0)), s"got $tie")
  }

  test("cliff's delta: ±1 at complete separation, 0 at symmetry, real-data identity") {
    import spark.implicits._
    def deltaOf(name: String, rows: Seq[(Long, Double)]) = {
      val fix = tempDir(name)
      rows.map { case (u, v) => (u, pre, v) }
        .toDF("user_id", "ts", "value").repartition(3)
        .write.mode("overwrite").parquet(s"$fix/events.parquet")
      val r = EventOps.abCliffsDelta(spark, fix).collect().head
      (r.getAs[Double]("delta"), r.getAs[String]("magnitude"))
    }
    // arm1 strictly above arm0 → δ = +1; strictly below → δ = −1
    assert(deltaOf("cd_up", Seq((2L, 1.0), (4L, 2.0), (1L, 3.0), (3L, 4.0)))
      == ((1.0, "large")))
    assert(deltaOf("cd_down", Seq((2L, 3.0), (4L, 4.0), (1L, 1.0), (3L, 2.0)))
      == ((-1.0, "large")))
    // identical arms (all ties) → δ = 0
    assert(deltaOf("cd_sym", Seq((2L, 1.0), (4L, 2.0), (1L, 1.0), (3L, 2.0)))
      == ((0.0, "negligible")))
    // real data: δ must equal 2U1/(n0·n1) − 1 off the SAME rank core
    val mw = EventOps.abMannWhitney(spark, Sf0001).collect().head
    val cd = EventOps.abCliffsDelta(spark, Sf0001).collect().head
    val (n0, n1, u1) = (mw.getLong(0), mw.getLong(1), mw.getDouble(2))
    assert(cd.getLong(0) == n0 && cd.getLong(1) == n1)
    // 2U1 and n0n1 are exact integers in double range — the identity is exact
    assert(cd.getAs[Double]("delta") ==
      (2.0 * u1 - n0.toDouble * n1).toDouble / (n0.toDouble * n1))
  }

  test("diff-in-diff: planted pre-period gap nets out of the effect") {
    import spark.implicits._
    val fix = tempDir("did")
    // arm0: pre {20,40}→30, post {30,50}→40, Δ=10
    // arm1: pre {10,30}→20, post {40,60}→50, Δ=30 → DiD = 20
    Seq((2L, pre, 20.0), (2L, post, 30.0), (4L, pre, 40.0), (4L, post, 50.0),
      (1L, pre, 10.0), (1L, post, 40.0), (3L, pre, 30.0), (3L, post, 60.0))
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val r = EventOps.abDid(spark, fix).collect().head
    val got = (0 to 6).map(r.getDouble)
    assert(got == Seq(30.0, 40.0, 10.0, 20.0, 50.0, 30.0, 20.0), s"got $got")
  }

  test("quantile treatment effect: exact per-arm quartiles and their gaps") {
    import spark.implicits._
    val fix = tempDir("qte")
    // arm0 = {10,20,30,40}, arm1 = {5,25,35,75}: the tails move in
    // OPPOSITE directions (qte25 = -5, qte75 = +5) — invisible to a mean
    Seq((2L, 10.0), (4L, 20.0), (6L, 30.0), (8L, 40.0),
      (1L, 5.0), (3L, 25.0), (5L, 35.0), (7L, 75.0))
      .map { case (u, v) => (u, pre, v) }
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val r = EventOps.abQuantileEffect(spark, fix).collect().head
    val got = (0 to 8).map(r.getDouble)
    assert(got == Seq(10.0, 5.0, -5.0, 20.0, 25.0, 5.0, 30.0, 35.0, 5.0),
      s"got $got")
  }

  test("survival hazard: hand-computed Nelson-Aalen table with censoring") {
    import spark.implicits._
    val fix = tempDir("survival")
    def t(d: Int) = ts(f"2024-01-${d + 1}%02d 12:00:00")
    // u1,u2: lifetime 2 (churned); u3: lifetime 5 (churned); u4:
    // lifetime 0 (churned); u5: active at the corpus end → CENSORED at 2
    val rows = Seq(
      (1L, t(0)), (1L, t(2)),
      (2L, t(0)), (2L, t(2)),
      (3L, t(0)), (3L, t(5)),
      (4L, t(10)),
      (5L, t(18)), (5L, t(20)))
    rows.map { case (u, s) => (u, s, 1.0) }
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.survivalHazard(spark, fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // study_end = day 20; horizon 1 → churn iff last event before day 19
    // t=0: risk 5, d=1 → h = 1e12/5; t=2: risk 4, d=2, c=1 → h = 2e12/4;
    // t=5: risk 1 (three lifetimes of 2 left), d=1 → h = 1e12
    assert(got == Seq(
      (0L, 5L, 1L, 0L, 200000000000L, 200000000000L),
      (2L, 4L, 2L, 1L, 500000000000L, 700000000000L),
      (5L, 1L, 1L, 0L, 1000000000000L, 1700000000000L)), s"got $got")
  }

  test("survival hazard: real corpus — risk counts strictly decrease, cum hazard rises") {
    val rows = EventOps.survivalHazard(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("t_days") < b.getAs[Long]("t_days"))
      assert(a.getAs[Long]("n_risk") > b.getAs[Long]("n_risk"))
      assert(a.getAs[Long]("cum_hazard_micro") < b.getAs[Long]("cum_hazard_micro"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("d_churn") > 0)
      assert(r.getAs[Long]("n_risk") >= r.getAs[Long]("d_churn"))
    }
  }

  test("poisson bootstrap thresholds: strictly increasing, textbook CDF endpoints") {
    val t = EventOps.PoisCdfMicro
    assert(t.size == 10)
    assert(t.head == 367879L, s"P(X=0) = e^-1 floored, got ${t.head}") // e^-1
    assert(t(1) == 735758L) // 2·e^-1
    assert(t.last == 999999L)
    assert(t.sliding(2).forall(p => p(0) < p(1)), "CDF must be strictly increasing")
  }

  test("poisson bootstrap: constant arms give a degenerate CI at the true gap") {
    import spark.implicits._
    val fix = tempDir("boot_const")
    // 16 users per arm, constant metric per arm: every replicate's
    // weighted mean is the constant whenever the arm draws ANY weight,
    // so all 64 replicate diffs collapse to the true gap (20.0)
    val rows = (0 until 16).flatMap { i =>
      Seq((2L * i + 2L, post, 30.0), (2L * i + 1L, post, 10.0))
    }
    rows.toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val r = EventOps.abBootstrap(spark, fix).collect()(0)
    assert(r.getAs[Long]("n_users") == 32L)
    assert(r.getAs[Int]("b") == EventOps.BootstrapB)
    assert(r.getAs[Double]("est_diff") == 20.0)
    assert(r.getAs[Double]("ci_lo") == 20.0, s"got $r")
    assert(r.getAs[Double]("ci_hi") == 20.0, s"got $r")
    assert(!r.getAs[Boolean]("covers_zero"))
  }

  test("poisson bootstrap: one empty arm stays defined (degenerate, never null)") {
    import spark.implicits._
    val fix = tempDir("boot_one_arm")
    // every user_id even → arm 1 is empty; the est leg must coalesce
    // like the replicate leg (empty arm contributes mean 0) instead of
    // nulling n_users/est_diff/covers_zero
    (0 until 8).map(i => (2L * i, post, 50.0))
      .toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val r = EventOps.abBootstrap(spark, fix).collect()(0)
    assert(r.getAs[Long]("n_users") == 8L)
    assert(r.getAs[Double]("est_diff") == 50.0)
    assert(r.getAs[Double]("ci_lo") == 50.0 && r.getAs[Double]("ci_hi") == 50.0)
    assert(!r.getAs[Boolean]("covers_zero"))
  }

  test("poisson bootstrap: real corpus — CI brackets the estimate, replay-identical") {
    val a = EventOps.abBootstrap(spark, Sf0001).collect()(0)
    val b = EventOps.abBootstrap(spark, Sf0001).collect()(0)
    assert(a == b, "content-hashed draws must make the CI deterministic")
    assert(a.getAs[Int]("b") == EventOps.BootstrapB)
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("ci_hi"))
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("est_diff") &&
      a.getAs[Double]("est_diff") <= a.getAs[Double]("ci_hi"),
      s"percentile CI should bracket the point estimate: $a")
  }

  test("post-stratification: planted Simpson cohort — adjustment reverses the raw readout") {
    import spark.implicits._
    val fix = tempDir("poststrat")
    def ev(u: Long, n: Int, v: Double) = Seq.fill(n)((u, pre, v))
    // stratum A = 1-event users {u1:10 | u2:20 u4:40 u6:60},
    // stratum B = 3-event users {u3:90 u5:120 u7:150 | u8:180}
    val rows = ev(1, 1, 10) ++ ev(2, 1, 20) ++ ev(4, 1, 40) ++ ev(6, 1, 60) ++
      ev(3, 3, 30) ++ ev(5, 3, 40) ++ ev(7, 3, 50) ++ ev(8, 3, 60)
    rows.toDF("user_id", "ts", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.abPostStrat(spark, fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // raw: arm1 (92.5) looks better than arm0 (75); activity-stratified
    // truth is the reverse: arm0 wins both strata (40 vs 10, 180 vs 120)
    assert(got == Seq((0L, 4L, 75.0, 110.0), (1L, 4L, 92.5, 65.0)), s"got $got")
  }

  test("post-stratification: uniform activity degrades to the raw mean") {
    import spark.implicits._
    val fix = tempDir("poststrat_flat")
    Seq((1L, pre, 10.0), (2L, pre, 30.0), (3L, pre, 50.0), (4L, pre, 70.0))
      .toDF("user_id", "ts", "value").repartition(2)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.abPostStrat(spark, fix).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq((0L, 50.0, 50.0), (1L, 30.0, 30.0)), s"got $got")
  }

  // ------------------------------------------------- trimmed/winsorized

  test("trimmed means: hand-computed fixture, k=1 and the k=0 degenerate") {
    import spark.implicits._
    // A: sorted 1,2,2,2,3,4,5,6,9,50 → n=10, k=1, interior ranks 2..9 sum
    // 33 → trimmed 4.125; v_low=2 (rank 2), v_high=9 (rank 9) → winsor
    // (33 + 2 + 9)/10 = 4.4. B: n=5 → k=0, both means = plain mean.
    val a = Seq(50.0, 2.0, 1.0, 3.0, 2.0, 4.0, 9.0, 5.0, 2.0, 6.0).map(("A", _))
    val b = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("B", _))
    val rows = (a ++ b).toDF("key", "value").repartition(3)
    val got = StatsOps.trimmedOf(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("A", 10L, 1L, 2.0, 9.0, 4.125, 4.4),
      ("B", 5L, 0L, 1.0, 5.0, 3.0, 3.0)), s"got $got")
  }

  test("trimmed means: tie mass spanning the trim boundary is cut exactly") {
    import spark.implicits._
    // nine 1s and one 2: the value-1 run covers ranks 1..9, so ONE unit
    // of its mass is trimmed low and the value-2 row is trimmed high
    val rows = (Seq.fill(9)(1.0) :+ 2.0).map(("T", _)).toDF("key", "value")
    val r = StatsOps.trimmedOf(rows).collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("trimmed means: equals a driver-side sort on real data (sf0.001)") {
    val got = StatsOps.trimmedMeans(spark, Sf0001).collect()
    val byFlag = Tables(spark, Sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    got.foreach { r =>
      val vals = byFlag(r.getString(0)).map(_._2).sorted
      val n = vals.length; val k = n / 10
      assert(r.getLong(1) == n && r.getLong(2) == k)
      val interior = vals.slice(k, n - k)
      // quantities are integer-valued, so BigDecimal sums replay the
      // decimal route exactly
      val tsum = interior.map(BigDecimal(_)).sum
      assert(r.getDouble(3) == vals(k) && r.getDouble(4) == vals(n - k - 1))
      assert(r.getDouble(5) == tsum.toDouble / (n - 2 * k))
      val wsum = tsum + k * (BigDecimal(vals(k)) + BigDecimal(vals(n - k - 1)))
      assert(r.getDouble(6) == wsum.toDouble / n)
    }
  }

  // ------------------------------------------------- rank correlation

  test("spearman: monotone +1, antitone -1, tied and untied hand values, degenerate NULL") {
    import spark.implicits._
    def rho(pairs: Seq[(Long, Long)]): Double =
      StatsOps.spearmanOf(pairs.toDF("x", "y").repartition(3))
        .collect()(0).getDouble(1)
    assert(math.abs(rho(Seq((1L, 10L), (2L, 20L), (5L, 21L), (9L, 90L))) - 1.0) < 1e-12)
    assert(math.abs(rho(Seq((1L, 90L), (2L, 21L), (5L, 20L), (9L, 10L))) + 1.0) < 1e-12)
    // classic no-tie example: d = (1,-1,... ), sum d^2 = 4 over n=5 → 0.8
    assert(math.abs(rho(Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 5L))) - 0.8) < 1e-12)
    // ties: x=(1,1,2) vs y=(1,2,3) → doubled ranks (3,3,6)/(2,4,6) → √3/2
    assert(math.abs(rho(Seq((1L, 1L), (1L, 2L), (2L, 3L))) - math.sqrt(3.0) / 2) < 1e-12)
    // constant x: zero rank variance → NULL, never a division blowup
    assert(StatsOps.spearmanOf(Seq((1L, 1L), (1L, 2L)).toDF("x", "y"))
      .collect()(0).isNullAt(1))
  }

  test("spearman plan: both rank tables ride range-partitioned slices, no global window") {
    val plan = StatsOps.spearmanOf(
      Tables(spark, Sf0001, "documents")
        .select(col("doc_id").as("x"), col("n_chars").as("y")))
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"no window found in:\n$plan")
    assert(windows.forall(_.contains("__pid")),
      s"global window leaked:\n${windows.mkString("\n")}")
    assert(plan.contains("rangepartitioning"), s"no range exchange in:\n$plan")
  }

  test("kendall tau-b: identity grid, hand-computed tied grid, all-tied NULL") {
    import spark.implicits._
    def tau(cells: Seq[(Long, Long, Long)]) =
      StatsOps.kendallOfGrid(cells.toDF("bx", "by", "cnt").repartition(2))
        .collect()(0)
    // perfectly concordant buckets: C = 3·2 = 6, D = 0, tau-b = 1
    val id = tau(Seq((0L, 0L, 3L), (1L, 1L, 2L)))
    assert((id.getLong(0), id.getLong(1), id.getLong(2)) == ((5L, 6L, 0L)))
    assert(math.abs(id.getDouble(3) - 1.0) < 1e-12)
    // x=(1,2,2,3), y=(1,2,3,3): C=4, D=0, n(n-1)=12, tx2=ty2=2 → 8/10
    val h = tau(Seq((1L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 1L), (3L, 3L, 1L)))
    assert((h.getLong(1), h.getLong(2)) == ((4L, 0L)))
    assert(math.abs(h.getDouble(3) - 0.8) < 1e-12)
    // discordance flips the sign exactly
    val inv = tau(Seq((0L, 1L, 2L), (1L, 0L, 2L)))
    assert((inv.getLong(1), inv.getLong(2)) == ((0L, 4L)))
    assert(math.abs(inv.getDouble(3) + 1.0) < 1e-12)
    // a single cell: every pair tied on both axes → NULL
    assert(tau(Seq((0L, 0L, 4L))).isNullAt(3))
  }

  // ------------------------------------------------- power / MDE

  test("mde: welch-seam identity on the planted 2x2 cohort; powered flag flips") {
    import spark.implicits._
    def mdeOf(name: String, rows: Seq[(Long, Double)]) = {
      val fix = tempDir(name)
      rows.map { case (u, v) => (u, pre, v) }.toDF("user_id", "ts", "value")
        .repartition(3).write.mode("overwrite").parquet(s"$fix/events.parquet")
      EventOps.abMde(spark, fix).collect().head
    }
    // same cohort as the Welch spec: v0 = v1 = 200, n = 2 each
    val r = mdeOf("mde_under", Seq((1L, 20.0), (2L, 30.0), (3L, 40.0), (4L, 50.0)))
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert((r.getDouble(2), r.getDouble(3)) == ((40.0, 30.0)))
    assert(r.getDouble(4) == math.sqrt(200.0), s"se_diff ${r.getDouble(4)}")
    val mde = (EventOps.ZAlphaHalf + EventOps.ZBeta80) * math.sqrt(200.0)
    assert(r.getDouble(5) == mde && r.getDouble(6) == mde / 40.0)
    assert(r.getDouble(7) == 10.0 && !r.getBoolean(8),
      "diff 10 below mde ≈ 39.6 → the test was underpowered, not null")
    // separation far beyond the bar → powered
    val r2 = mdeOf("mde_over", Seq((1L, 10.0), (2L, 1000.0), (3L, 20.0), (4L, 1010.0)))
    assert(r2.getDouble(7) == 990.0 && r2.getBoolean(8), "diff 990 ≫ mde → powered")
  }

  test("sequential: late effect crosses only the final OF look; full look ≡ welch") {
    import spark.implicits._
    // arms identical through day 1 (z = 0 at looks 1-4), then arm 0
    // lands a +1000 lift on the final day — only look 5 may page
    val day1 = ts("2024-01-10 00:00:00"); val day5 = ts("2024-01-14 00:00:00")
    val fix = tempDir("seq_fix")
    (Seq((1L, day1, 10.0), (2L, day1, 10.0), (3L, day1, 12.0), (4L, day1, 12.0))
      ++ Seq((2L, day5, 1000.0), (4L, day5, 1000.0)))
      .toDF("user_id", "ts", "value")
      .repartition(3).write.mode("overwrite").parquet(s"$fix/events.parquet")
    val rows = EventOps.abSequential(spark, fix).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to EventOps.SeqLooks))
    rows.foreach { r =>
      val k = r.getInt(0)
      // the OF envelope, replayed: C·√(K/k), early looks conservative
      assert(r.getAs[Double]("boundary")
        == EventOps.ObfC * math.sqrt(EventOps.SeqLooks.toDouble / k))
      if (k < EventOps.SeqLooks) {
        assert(r.getAs[Double]("z") == 0.0 && !r.getAs[Boolean]("crossed"),
          s"look $k must be quiet before the effect lands")
      } else {
        // arm0 totals (1010, 1012) vs arm1 (10, 12): v = 2 each,
        // z = 1000/√(1+1)
        assert(r.getAs[Double]("z") == 1000.0 / math.sqrt(2.0))
        assert(r.getAs[Boolean]("crossed"), "the final look must page")
      }
    }
    // the final look INCLUDES everything, so its z is bit-identical to
    // the fixed-horizon Welch t on the same store (one moment seam)
    val zFull = EventOps.abSequential(spark, Sf0001).collect()
      .find(_.getInt(0) == EventOps.SeqLooks).get.getAs[Double]("z")
    val tWelch = EventOps.abWelch(spark, Sf0001).collect()(0).getAs[Double]("t_stat")
    assert(zFull == tWelch)
  }

  test("wilson interval: hand-replayed tree; k=0 pins lo at exactly 0; brackets p-hat") {
    import spark.implicits._
    val fix = tempDir("wilson_fix")
    // type 'hot': 4 events, 1 above the floor; type 'cold': 3 events,
    // none above — the p̂ = 0 edge where a Wald interval goes negative
    // but Wilson's lower bound is EXACTLY 0 (center = margin = z²/2n)
    (Seq((1L, pre, "hot", 150.0), (2L, pre, "hot", 10.0),
      (3L, pre, "hot", 20.0), (4L, pre, "hot", 30.0))
      ++ Seq((1L, pre, "cold", 5.0), (2L, pre, "cold", 6.0), (3L, pre, "cold", 7.0)))
      .toDF("user_id", "ts", "event_type", "value")
      .repartition(2).write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.eventWilsonCi(spark, fix).collect()
      .map(r => r.getString(0) -> r).toMap
    val z = EventOps.ZAlphaHalf
    def wilson(n: Long, k: Long): (Double, Double) = {
      val p = k.toDouble / n.toDouble
      val half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
      val c = p + z * z / (2.0 * n)
      // the published bounds are clamped to [0,1] (r14 ADVICE: algebraic
      // containment leaves a last-ulp residue at p̂ ∈ {0,1})
      (math.max((c - half) / (1.0 + z * z / n), 0.0),
        math.min((c + half) / (1.0 + z * z / n), 1.0))
    }
    val hot = got("hot")
    assert((hot.getLong(1), hot.getLong(2)) == ((4L, 1L)))
    assert(hot.getAs[Double]("wilson_lo") == wilson(4, 1)._1
      && hot.getAs[Double]("wilson_hi") == wilson(4, 1)._2)
    val cold = got("cold")
    assert(cold.getLong(2) == 0L)
    // p̂ = 0: algebraically lo = 0 (center = margin = z²/2n); the raw
    // IEEE tree can leave a last-ulp residue of EITHER sign — the clamp
    // guarantees the published bound is never negative, and the replay
    // identity pins the exact value either way
    assert(cold.getAs[Double]("wilson_lo") == wilson(3, 0)._1)
    assert(cold.getAs[Double]("wilson_lo") >= 0.0
      && cold.getAs[Double]("wilson_lo") < 1e-15, "lo ∈ [0, ulp) at p̂ = 0 (clamped)")
    assert(cold.getAs[Double]("wilson_hi") > 0.0 && cold.getAs[Double]("wilson_hi") < 1.0)
    // real corpus: interval brackets p̂ and stays inside [0, 1]
    EventOps.eventWilsonCi(spark, Sf0001).collect().foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p_hat"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }

  test("cohen's d: hand-computed pooled SD; hedges shrinks toward 0; degenerate NULL") {
    import spark.implicits._
    def dOf(name: String, rows: Seq[(Long, Double)]) = {
      val fix = tempDir(name)
      rows.map { case (u, v) => (u, pre, v) }.toDF("user_id", "ts", "value")
        .repartition(2).write.mode("overwrite").parquet(s"$fix/events.parquet")
      EventOps.abCohensD(spark, fix).collect().head
    }
    // the planted Welch cohort: means 40 vs 30, both variances 200 →
    // s_p² = 200, d = 10/√200; J = 1 − 3/(4·4 − 9) = 4/7
    val r = dOf("cohens_base", Seq((1L, 20.0), (2L, 30.0), (3L, 40.0), (4L, 50.0)))
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getAs[Double]("diff") == 10.0)
    assert(r.getAs[Double]("cohens_d") == 10.0 / math.sqrt(200.0))
    assert(r.getAs[Double]("hedges_g")
      == (10.0 / math.sqrt(200.0)) * (1.0 - 3.0 / 7.0))
    assert(math.abs(r.getAs[Double]("hedges_g")) < math.abs(r.getAs[Double]("cohens_d")),
      "the small-sample correction must shrink toward 0")
    assert(r.getAs[String]("magnitude") == "medium", s"d ≈ 0.707: $r")
    // a single-user arm: no sample variance, no effect size
    val one = dOf("cohens_n1", Seq((1L, 20.0), (2L, 30.0), (4L, 50.0)))
    assert(one.isNullAt(one.fieldIndex("cohens_d"))
      && one.isNullAt(one.fieldIndex("magnitude")))
    // both arms constant: zero pooled variance → NULL, never Inf
    val flat = dOf("cohens_flat", Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0)))
    assert(flat.isNullAt(flat.fieldIndex("cohens_d")))
    // real corpus: defined, finite, and sign-consistent with the diff
    val real = EventOps.abCohensD(spark, Sf0001).collect().head
    val d = real.getAs[Double]("cohens_d")
    assert(!d.isNaN && !d.isInfinite)
    assert(math.signum(d) == math.signum(real.getAs[Double]("diff")))
  }

  test("pass@k: hand-computed estimator — exact 0/1 anchors, clamp, n<k NULL") {
    import spark.implicits._
    val fix = tempDir("passk_fix")
    // problem 1: n=10, c=3 (3 purchases); problem 2: n=10, c=0;
    // problem 3: n=10, c=8 (n−c=2 < 5 → pass@5 = 1 exactly via the
    // clamped factor); problem 4: n=3 < 5 → pass@5/10 NULL
    def evs(u: Long, n: Int, c: Int) = (0 until n).map(i =>
      (u, pre, if (i < c) "purchase" else "view", 1.0))
    (evs(1L, 10, 3) ++ evs(2L, 10, 0) ++ evs(3L, 10, 8) ++ evs(4L, 3, 1))
      .toDF("user_id", "ts", "event_type", "value")
      .repartition(3).write.mode("overwrite").parquet(s"$fix/events.parquet")
    val got = EventOps.passAtK(spark, fix).collect()
      .map(r => r.getLong(0) -> r).toMap
    // the same left-associated IEEE tree the plan (and oracle) build
    def expect(n: Long, c: Long, k: Int): Double =
      1.0 - (0 until k).map(i =>
        math.max(n - c - i, 0L).toDouble / (n - i).toDouble).product
    assert(got(1L).getAs[Double]("pass_1") == expect(10, 3, 1))
    assert(got(1L).getAs[Double]("pass_5") == expect(10, 3, 5))
    assert(got(1L).getAs[Double]("pass_10") == 1.0,
      "k = n with c > 0 must exhaust the misses")
    assert(got(2L).getAs[Double]("pass_10") == 0.0, "c = 0 is exactly 0")
    assert(got(3L).getAs[Double]("pass_5") == 1.0,
      "n−c < k collapses a factor to +0 → exactly 1")
    assert(got(4L).getAs[Double]("pass_1") == expect(3, 1, 1))
    assert(got(4L).isNullAt(got(4L).fieldIndex("pass_5"))
      && got(4L).isNullAt(got(4L).fieldIndex("pass_10")),
      "no size-k draw exists when n < k")
    // summary: micro-quantized means over the eligible problems only
    val s = EventOps.passAtKSummary(spark, fix).collect().head
    assert(s.getAs[Long]("n_problems") == 4L)
    assert(s.getAs[Long]("n_eligible_5") == 3L && s.getAs[Long]("n_eligible_10") == 3L)
    def meanMicro(ps: Seq[Double]) =
      ps.map(p => math.floor(p * 1e12).toLong).sum.toDouble / (1e12 * ps.length)
    assert(s.getAs[Double]("mean_pass_1") ==
      meanMicro(Seq(expect(10, 3, 1), 0.0, expect(10, 8, 1), expect(3, 1, 1))))
    assert(s.getAs[Double]("mean_pass_5") ==
      meanMicro(Seq(expect(10, 3, 5), 0.0, 1.0)))
  }

  test("pass@k: real corpus — estimator dominates pass@1, bounded, eligible counts") {
    val rows = EventOps.passAtK(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("c"))
      assert(c <= n)
      Seq(1, 5, 10).foreach { k =>
        if (n >= k) {
          val p = r.getAs[Double](s"pass_$k")
          assert(p >= 0.0 && p <= 1.0)
          if (c == 0) assert(p == 0.0)
        } else assert(r.isNullAt(r.fieldIndex(s"pass_$k")))
      }
      // pass@k is monotone nondecreasing in k wherever defined
      if (n >= 10) assert(r.getAs[Double]("pass_1") <= r.getAs[Double]("pass_5")
        && r.getAs[Double]("pass_5") <= r.getAs[Double]("pass_10"))
    }
  }

  test("BH-FDR: step-up rescues rank 1; null metrics excluded; singleton family") {
    import spark.implicits._
    // two users per arm, arm1 constant ⇒ pooled se = v0/2 = 1 exactly
    // (sqrt(1) = 1), so z ≈ mean0 − mean1 — plant z_A ≈ 2.1 (misses its
    // rank-1 boundary 2.2414 at m=2) and z_B ≈ 2.0 (crosses rank-2's
    // 1.96): BH's step-up must reject BOTH, the property a per-metric
    // Bonferroni would get wrong
    def arm(t: String, a0: Double): Seq[(Long, java.sql.Timestamp, String, Double)] =
      Seq((2L, pre, t, a0 + 1.0), (4L, pre, t, a0 - 1.0),
        (1L, pre, t, 10.0), (3L, pre, t, 10.0))
    val fix = tempDir("fdr_fix")
    (arm("alpha", 12.1) ++ arm("beta", 12.0)
      ++ Seq((1L, pre, "gamma", 5.0))) // single-user type: z NULL → excluded
      .toDF("user_id", "ts", "event_type", "value")
      .repartition(3).write.mode("overwrite").parquet(s"$fix/events.parquet")
    val rows = EventOps.abFdrByType(spark, fix).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("alpha", "beta"),
      "gamma has no statistic and must not count toward m")
    rows.foreach(r => assert(r.getAs[Long]("m") == 2L))
    val byType = rows.map(r => r.getString(0) -> r).toMap
    val zA = byType("alpha").getAs[Double]("z")
    val zB = byType("beta").getAs[Double]("z")
    assert(math.abs(zA - 2.1) < 1e-9 && math.abs(zB - 2.0) < 1e-9)
    assert(byType("alpha").getAs[Long]("rank") == 1L
      && byType("beta").getAs[Long]("rank") == 2L)
    assert(zA < byType("alpha").getAs[Double]("z_bound"),
      "alpha must miss its own (tighter) boundary for the test to bite")
    assert(zB >= byType("beta").getAs[Double]("z_bound"))
    assert(rows.forall(_.getAs[Boolean]("rejected")),
      "rank-2's crossing rejects everything above it (step-up)")
    // singleton family: boundary is the plain two-sided 1.96; z = 1 stays
    val lone = tempDir("fdr_lone")
    arm("solo", 11.0).toDF("user_id", "ts", "event_type", "value")
      .repartition(2).write.mode("overwrite").parquet(s"$lone/events.parquet")
    val l = EventOps.abFdrByType(spark, lone).collect()
    assert(l.length == 1 && l(0).getAs[Long]("m") == 1L)
    assert(math.abs(l(0).getAs[Double]("z_bound") - 1.959964) < 1e-5,
      "m=1 boundary is Φ⁻¹(0.975)")
    assert(!l(0).getAs[Boolean]("rejected"))
    // real corpus: family over the five event types, ranks 1..m, each
    // boundary tightens as rank drops
    val real = EventOps.abFdrByType(spark, Sf0001).collect()
    assert(real.nonEmpty)
    assert(real.map(_.getAs[Long]("rank")).toSeq == (1L to real.length))
    val bounds = real.map(_.getAs[Double]("z_bound"))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a >= b })
    // a family past FdrMaxM has no boundary rows: the step-up is
    // UNDEFINED and every rejected must read NULL — never a definite
    // false on a family of wildly significant metrics (the review's
    // silent-non-rejection seam)
    val wide = tempDir("fdr_wide")
    (1 to EventOps.FdrMaxM + 1).flatMap(i => arm(f"t$i%02d", 50.0))
      .toDF("user_id", "ts", "event_type", "value")
      .repartition(3).write.mode("overwrite").parquet(s"$wide/events.parquet")
    val w = EventOps.abFdrByType(spark, wide).collect()
    assert(w.length == EventOps.FdrMaxM + 1)
    w.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z_bound"))
        && r.isNullAt(r.fieldIndex("rejected")),
        s"oversized family must be loud (NULL), got $r")
    }
  }

  test("degenerate cohorts: single-user arms and zero variance read NULL, never Inf") {
    import spark.implicits._
    // Spark's Divide yields NULL on a zero divisor where DuckDB's IEEE
    // division yields Inf/NaN — the seam guards (var at n=1, t/z at
    // zero pooled variance) make BOTH engines agree the statistic is
    // undefined; these fixtures pin the Spark half of that contract
    def welchOf(name: String, rows: Seq[(Long, Double)]) = {
      val fix = tempDir(name)
      rows.map { case (u, v) => (u, pre, v) }.toDF("user_id", "ts", "value")
        .repartition(2).write.mode("overwrite").parquet(s"$fix/events.parquet")
      EventOps.abWelch(spark, fix).collect().head
    }
    // arm1 has ONE user: its sample variance (and so t, df) is undefined
    val one = welchOf("welch_n1", Seq((1L, 20.0), (2L, 30.0), (4L, 50.0)))
    assert(one.getLong(1) == 1L)
    assert(one.isNullAt(one.fieldIndex("t_stat")) && one.isNullAt(one.fieldIndex("df")))
    // both arms constant: pooled variance is exactly 0 → no statistic
    val flat = welchOf("welch_flat", Seq((1L, 10.0), (2L, 10.0), (3L, 10.0), (4L, 10.0)))
    assert(flat.getDouble(4) == 0.0, "diff well-defined")
    assert(flat.isNullAt(flat.fieldIndex("t_stat")) && flat.isNullAt(flat.fieldIndex("df")))
    // sequential monitor: arm1 is a single user at EVERY look → each
    // look's z and crossed are NULL (a page from one user isn't a
    // statistic); boundary stays served
    val fix = tempDir("seq_degenerate")
    Seq((1L, ts("2024-01-10 00:00:00"), 10.0),
      (2L, ts("2024-01-10 00:00:00"), 10.0),
      (4L, ts("2024-01-14 00:00:00"), 12.0))
      .toDF("user_id", "ts", "value").repartition(2)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    val rows = EventOps.abSequential(spark, fix).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 1L, "arm1 single-user at every look")
      assert(r.isNullAt(r.fieldIndex("z")) && r.isNullAt(r.fieldIndex("crossed")))
      assert(r.getAs[Double]("boundary") > 0.0)
    }
  }
}
