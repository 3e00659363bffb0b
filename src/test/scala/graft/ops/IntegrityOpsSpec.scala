package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the data-integrity / reliability operators:
  * χ² drift cells, engine-portable table checksums, wildcard-hash
  * edit-distance pairs, and bottom-k-by-hash sampling. */
class IntegrityOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ------------------------------------------------------------- drift

  test("drift: identical monthly mixes give expected == observed, chi2 == 0") {
    import spark.implicits._
    // two months, both with 2 views + 1 click → overall mix equals each
    // month's mix exactly, so every cell's expectation is its count
    val rows = Seq(
      (1L, ts("2024-01-05 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-06 00:00:00"), 1L, "view", 0.0, "{}"),
      (3L, ts("2024-01-07 00:00:00"), 1L, "click", 0.0, "{}"),
      (4L, ts("2024-02-05 00:00:00"), 1L, "view", 0.0, "{}"),
      (5L, ts("2024-02-06 00:00:00"), 1L, "view", 0.0, "{}"),
      (6L, ts("2024-02-07 00:00:00"), 1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("drift_flat")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val cells = StatsOps.driftCells(spark, dir).collect()
    assert(cells.length == 4)
    cells.foreach { r =>
      assert(r.getAs[Double]("expected") == r.getAs[Long]("observed").toDouble)
      assert(r.getAs[Double]("chi2_cell") == 0.0)
    }
  }

  test("drift: marginals reconcile on real data (sf0.001)") {
    val cells = StatsOps.driftCells(spark, Sf0001)
    // per month: observed sums to the month total the expectation used
    val bad = cells
      .groupBy(col("month"))
      .agg(sum(col("observed")).as("o"), sum(col("expected")).as("e"))
      .filter(abs(col("o") - col("e")) > 1e-6)
    assert(bad.count() == 0)
    assert(cells.filter(col("chi2_cell") < 0.0).count() == 0)
  }

  // ---------------------------------------------------------- checksum

  test("checksum: invariant under partitioning and row order") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"text body $i", "en", s"src${i % 3}", 10L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d1 = tempDir("ck_a"); val d2 = tempDir("ck_b")
    docs.repartition(1).write.mode("overwrite").parquet(s"$d1/documents.parquet")
    docs.orderBy(desc("doc_id")).repartition(7)
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val a = StatsOps.tableChecksum(spark, d1).collect().map(_.toString).toSeq
    val b = StatsOps.tableChecksum(spark, d2).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("checksum: one changed byte moves exactly its source's checksum") {
    import spark.implicits._
    val base = (0L until 50L).map(i =>
      (i, s"text body $i", "en", s"src${i % 3}", 10L + i))
    val mutated = base.map { case r @ (i, t, l, s, n) =>
      if (i == 7L) (i, t + "!", l, s, n) else r } // doc 7 lives in src1
    val d1 = tempDir("ck_c"); val d2 = tempDir("ck_d")
    base.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    mutated.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val a = StatsOps.tableChecksum(spark, d1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val b = StatsOps.tableChecksum(spark, d2).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(a("src1") != b("src1"))
    assert(a.filterNot(_._1 == "src1") == b.filterNot(_._1 == "src1"))
  }

  // -------------------------------------------------------------- diff

  test("diff: planted snapshots classify added/removed/changed exactly") {
    import spark.implicits._
    def df(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = df(Seq(1L -> "one", 2L -> "two", 3L -> "three"))
    val revised = df(Seq(2L -> "two", 3L -> "three (rev2)", 4L -> "four"))
    val got = StatsOps.diffSnapshots(base, revised).collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((4L, "added"), (3L, "changed"), (1L, "removed")))
    assert(StatsOps.diffSnapshots(base, base).count() == 0)
  }

  test("diff: change counts follow the modular revision rules (sf0.001)") {
    val ids = Tables(spark, Sf0001, "documents").select(col("doc_id"))
    def n(m: Int) = ids.filter(col("doc_id") % m === 0).count()
    val alsoRemoved = ids.filter(col("doc_id") % 97 === 0 && col("doc_id") % 101 === 0).count()
    val byChange = StatsOps.snapshotDiff(spark, Sf0001).groupBy(col("change")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChange.getOrElse("removed", 0L) == n(97))
    assert(byChange.getOrElse("changed", 0L) == n(101) - alsoRemoved)
    assert(byChange.getOrElse("added", 0L) == n(103))
  }

  // ----------------------------------------------------- HLL overlap

  test("overlap: planted half-overlapping audiences estimate within the band") {
    import spark.implicits._
    // type A: users 1..100; type B: users 51..150 → exact overlap 50
    val rows = (1 to 100).map(u => (u.toLong, ts("2024-01-01 00:00:00"), u.toLong, "A", 0.0, "{}")) ++
      (51 to 150).map(u => (1000L + u, ts("2024-01-01 01:00:00"), u.toLong, "B", 0.0, "{}"))
    val dir = tempDir("ovl_events")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val est = SketchOps.typeOverlap(spark, dir).collect()
    assert(est.length == 1)
    assert(math.abs(est(0).getLong(2) - 50L) <= 8L) // 4% of n_a+n_b
    val gate = SketchOps.typeOverlapGate(spark, dir).collect()
    assert(gate.length == 1 && gate(0).getAs[Boolean]("passes"))
    assert(gate(0).getAs[Long]("exact_overlap") == 50L)
  }

  test("overlap: every pair's gate passes on real data (sf0.001)") {
    val rows = SketchOps.typeOverlapGate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("passes"),
      s"${r.getString(0)}/${r.getString(1)}"))
  }

  // ------------------------------------------------------ edit distance

  test("editdist pairs: planted neighborhood — dist 0 and 1 kept, 2 dropped") {
    import spark.implicits._
    // names share the reference TPC-H shape: 9-char prefix + 9 digits
    val cust = Seq(
      (1L, "Customer#000000001"),
      (2L, "Customer#000000002"), // vs 1: one substitution
      (3L, "Customer#000000011"), // vs 1: one; vs 2: two
      (4L, "Customer#999999999"), // far from everything
      (5L, "Customer#000000001")) // duplicate of 1 → dist 0
      .toDF("c_custkey", "c_name")
    val dir = tempDir("ed_cust")
    cust.repartition(3).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = DedupOps.editDistPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(
      (1L, 2L, 1), (1L, 3L, 1), (1L, 5L, 0),
      (2L, 5L, 1), (3L, 5L, 1)))
  }

  test("editdist pairs: complete vs the brute-force quadratic (sf0.001)") {
    val got = DedupOps.editDistPairs(spark, Sf0001)
    val c = Tables(spark, Sf0001, "customer").select(col("c_custkey"), col("c_name"))
    val brute = c.as("a").join(c.as("b"), col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("key_a"), col("b.c_custkey").as("key_b"),
        levenshtein(col("a.c_name"), col("b.c_name")).as("dist"))
      .filter(col("dist") <= 1)
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).count() == 0)
  }

  // ---------------------------------------------------------- bottom-k

  test("bottom-k sample: equals the per-source hash-order head (sf0.001)") {
    val got = SamplingOps.bottomKSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // recompute independently: full sort per source by (h, doc_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val want = Tables(spark, Sf0001, "documents")
      .select(col("source"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("long").as("h"))
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= SamplingOps.BottomK)
      .select(col("source"), col("sample_rank"), col("doc_id"), col("h"))
      .orderBy("source", "sample_rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("bottom-k sample: per-shard samples merge into the global sample") {
    import spark.implicits._
    // bottom-k composes under union: bk(A ∪ B) = bk(bk(A) ∪ bk(B)) —
    // the property that lets 1000 executors sample shards independently
    val docs = Tables(spark, Sf0001, "documents")
    val d1 = tempDir("bk_even"); val d2 = tempDir("bk_odd")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val merged = SamplingOps.bottomKSample(spark, d1)
      .unionAll(SamplingOps.bottomKSample(spark, d2))
      .select(col("source"), col("doc_id"), col("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    val remerged = merged
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= SamplingOps.BottomK)
      .select(col("source"), col("sample_rank"), col("doc_id"), col("h"))
      .orderBy("source", "sample_rank").collect().map(_.toString).toSeq
    val full = SamplingOps.bottomKSample(spark, Sf0001)
      .collect().map(_.toString).toSeq
    assert(remerged == full)
  }

  test("pps: planted weights select hand-computed slots; certainty and budget laws") {
    import spark.implicits._
    // w = [5,1,1,1,8], K = 2, T = 16: slots ⌊2·cum/16⌋ = 0,0,0,1,2 →
    // docs 4 (cum 8) and 5 (cum 16) cross a boundary; doc 5 has
    // w = 8 = T/K, the certainty-inclusion case
    val docs = Seq((1L, 5L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 8L)).toDF("doc_id", "w")
    val got = SamplingOps.ppsOf(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((4L, 1L, 8L, 1L), (5L, 8L, 16L, 2L)))
    // real corpus: |sample| ≤ K always; == K when no doc spans 2+ slots
    // (w < T/K for all docs); every selection crosses a distinct slot
    val real = SamplingOps.ppsSystematic(spark, Sf0001).collect()
    val slots = real.map(_.getAs[Long]("slot"))
    assert(real.length <= SamplingOps.PpsBudget && slots.distinct.length == slots.length)
    val tot = Tables(spark, Sf0001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("w"))
      .agg(sum(col("w"))).collect()(0).getLong(0)
    val maxW = real.map(_.getAs[Long]("w")).max
    if (maxW < tot / SamplingOps.PpsBudget)
      assert(real.length == SamplingOps.PpsBudget)
    // selection ∝ size: the sampled token mass per pick brackets T/K
    assert(real.nonEmpty)
  }

  test("pps: cum*K beyond int64 must not wrap — decimal slots stay exact") {
    import spark.implicits._
    // 4 docs of 2.4e17 tokens each: tot ≈ 9.6e17 fits int64, but
    // cum·64 peaks at ~6.1e19 > 2^63 — int64 arithmetic wraps silently
    // (and the oracle doing the same would stay hash-green while both
    // mis-sample); the DECIMAL(38,0) path keeps the floor crossings
    // exact: slots ⌊64·cum/tot⌋ = ⌊16·i⌋ = 16, 32, 48, 64, every doc
    // selected with certainty (w = tot/4 ≫ tot/64)
    val w = 240000000000000000L // 2.4e17
    val docs = (1L to 4L).map(i => (i, w)).toDF("doc_id", "w")
    val got = SamplingOps.ppsOf(docs, 64).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((1L, 16L), (2L, 32L), (3L, 48L), (4L, 64L)), s"got $got")
  }

  // ------------------------------------------------------------ Neyman

  test("neyman: hand-computed apportionment; zero-variance stratum floors at 1 micro") {
    import spark.implicits._
    // A: x ∈ {1,3} → sd = 1, weight = 2e6; B: x ∈ {2,2} → sd = 0,
    // weight floors at 1. budget 10: base_A = 2e7 div 2000001 = 9,
    // base_B = 0, extra = 1 → A's remainder (1999991) wins → 10/0
    val rows = Seq(("A", 1L), ("A", 3L), ("B", 2L), ("B", 2L))
      .toDF("stratum", "x").repartition(2)
    val got = SamplingOps.neymanOf(rows, 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", 2L, 1.0, 2000000L, 10L),
      ("B", 2L, 0.0, 1L, 0L)), s"got ${got.toSeq}")
  }

  test("neyman: equal strata tie-break to the first stratum; budget always exhausted") {
    import spark.implicits._
    val rows = Seq(("A", 1L), ("A", 3L), ("B", 1L), ("B", 3L))
      .toDF("stratum", "x").repartition(2)
    val got = SamplingOps.neymanOf(rows, 5L).collect()
      .map(r => (r.getString(0), r.getLong(4)))
    // bases 2/2, one leftover, tied remainders → stratum-asc wins
    assert(got.toSeq == Seq(("A", 3L), ("B", 2L)), s"got ${got.toSeq}")
    // real data: the allocation is total by construction
    val real = SamplingOps.neymanAllocation(spark, Sf0001).collect()
    assert(real.map(_.getAs[Long]("n_alloc")).sum == SamplingOps.NeymanBudget)
    assert(real.forall(_.getAs[Long]("weight_micro") >= 1L))
  }

  // ---------------------------------------------------------- KS drift

  test("ks drift: hand-computed D on a planted two-sample fixture") {
    import spark.implicits._
    // train {1,2,3,4}, val {3,4,4,5}: F_t = .25/.5/.75/1/1,
    // F_v = 0/0/.25/.75/1 → |Δ|·16 = 4, 8, 8, 4, 0; D = 8/16 = 0.5 at
    // value 2 (2 and 3 tie at 8 → smallest value wins)
    val rows = (Seq(1L, 2L, 3L, 4L).map((_, "train")) ++
      Seq(3L, 4L, 4L, 5L).map((_, "val"))).toDF("value", "split")
    val per = SamplingOps.ksOf(rows)
      .select("value", "cum_train", "cum_val", "d_num")
      .orderBy("value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(per.toSeq == Seq((1L, 1L, 0L, 4L), (2L, 2L, 0L, 8L),
      (3L, 3L, 1L, 8L), (4L, 4L, 3L, 4L), (5L, 4L, 4L, 0L)))
    val s = SamplingOps.ksSummaryOf(SamplingOps.ksOf(rows)).collect()(0)
    assert(s.getAs[Long]("n_train") == 4L && s.getAs[Long]("n_val") == 4L)
    assert(s.getAs[Long]("d_num_max") == 8L)
    assert(s.getAs[Long]("ks_value") == 2L)
    assert(s.getAs[Double]("d_stat") == 0.5)
  }

  test("emd drift: equals the mean sorted-sample difference; zero on identical samples") {
    import spark.implicits._
    // train {1,2,3,4} vs val {3,4,4,5}: W1 = (|1−3|+|2−4|+|3−4|+|4−5|)/4
    // = 1.5; via the CDF integral: Σ|d|·gap = 4+8+8+4 = 24 over n_t·n_v=16
    val rows = (Seq(1L, 2L, 3L, 4L).map((_, "train")) ++
      Seq(3L, 4L, 4L, 5L).map((_, "val"))).toDF("value", "split")
    val r = SamplingOps.emdOf(rows).collect()(0)
    assert(r.getAs[Double]("emd_num") == 24.0)
    assert(r.getAs[Double]("w1") == 1.5)
    val same = (Seq(1L, 5L, 9L).map((_, "train")) ++
      Seq(1L, 5L, 9L).map((_, "val"))).toDF("value", "split")
    assert(SamplingOps.emdOf(same).collect()(0).getAs[Double]("w1") == 0.0)
  }

  test("next-value primitive: range-partitioned lead equals the textbook window") {
    import spark.implicits._
    // keyed, gappy, many partitions — boundaries must stitch exactly
    val rows = (for (k <- Seq("a", "b"); v <- 1L to 400L if (v * 7 + k.length) % 3 != 0)
      yield (k, v, v * 2 + k.length)).toDF("k", "value", "cnt")
    val got = StatsOps.withNextValue(rows.repartition(7), Seq("k"), "value", "nv")
      .select("k", "value", "nv").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    val want = rows.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).toSeq.flatMap { case (k, vs) =>
        val s = vs.map(_._2).sorted
        s.zip(s.tail :+ -1L).map { case (v, n) => (k, v, n) }
      }.sorted
    assert(got == want)
  }

  test("ks drift: disjoint supports trip the flag (negative control)") {
    import spark.implicits._
    // train on [1,100], val on [201,300]: D = 1, far above the critical
    // value 1.358·√(200/10000) ≈ 0.19 — a monitor that cannot red on
    // THIS shift is not a monitor
    val rows = ((1L to 100L).map((_, "train")) ++
      (201L to 300L).map((_, "val"))).toDF("value", "split")
    val s = SamplingOps.ksSummaryOf(SamplingOps.ksOf(rows)).collect()(0)
    assert(s.getAs[Double]("d_stat") == 1.0)
    assert(s.getAs[Long]("ks_value") == 100L) // max deviation first attained at train's top
    assert(s.getAs[Boolean]("drifted"))
  }

  test("ks drift: identical samples give D = 0 and no drift flag") {
    import spark.implicits._
    val vals = Seq(1L, 2L, 2L, 3L, 7L)
    val rows = (vals.map((_, "train")) ++ vals.map((_, "val")))
      .toDF("value", "split")
    val s = SamplingOps.ksSummaryOf(SamplingOps.ksOf(rows)).collect()(0)
    assert(s.getAs[Long]("d_num_max") == 0L)
    assert(s.getAs[Double]("d_stat") == 0.0)
    assert(!s.getAs[Boolean]("drifted"))
  }

  test("ks drift plan: running counts ride range-partitioned slices, not one global window") {
    // the 100 TB claim is structural (the pack-plan rule): a global-order
    // cumulative sum over the distinct-value table must never land in
    // one task — every window carries the slice id, a range exchange
    // feeds it
    val plan = SamplingOps.splitDriftKs(spark, Sf0001)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty, s"no window found in:\n$plan")
    assert(windows.forall(_.contains("__pid")),
      s"global-order window leaked:\n${windows.mkString("\n")}")
    assert(plan.contains("rangepartitioning"), s"no range exchange in:\n$plan")
  }

  test("source ks: shifted source reds, identical sources clear, brute-force replay exact") {
    import spark.implicits._
    val data: Seq[(String, Long)] =
      (1L to 20L).map(("A", _)) ++ (1L to 20L).map(("B", _)) ++
        (200L to 204L).flatMap(v => Seq.fill(4)(("C", v)))
    val got = SamplingOps.sourceKsOf(data.toDF("source", "value").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("C").getAs[Boolean]("drifted"), "disjoint-support source must red")
    // brute-force one-vs-rest replay over the union support, per source
    val support = data.map(_._2).distinct.sorted
    val nAll = data.size.toLong
    got.foreach { case (s, r) =>
      val nS = data.count(_._1 == s).toLong
      val nR = nAll - nS
      var (cs, cr) = (0L, 0L)
      val ds = support.map { v =>
        cs += data.count(p => p._1 == s && p._2 == v)
        cr += data.count(p => p._1 != s && p._2 == v)
        (v, math.abs(cs * nR - cr * nS))
      }
      val dMax = ds.map(_._2).max
      assert(r.getAs[Long]("n_source") == nS && r.getAs[Long]("n_rest") == nR)
      assert(r.getAs[Long]("d_num_max") == dMax, s"source $s")
      assert(r.getAs[Long]("ks_value") == ds.filter(_._2 == dMax).map(_._1).min)
      assert(r.getAs[Double]("d_stat") ==
        dMax.toDouble / (nS.toDouble * nR.toDouble))
    }
    // two identical sources alone: neither drifts against the other
    val calm = SamplingOps.sourceKsOf(
      ((1L to 20L).map(("A", _)) ++ (1L to 20L).map(("B", _)))
        .toDF("source", "value")).collect()
    assert(calm.forall(!_.getAs[Boolean]("drifted")))
    assert(calm.forall(_.getAs[Long]("d_num_max") == 0L))
  }

  test("source emd: brute one-vs-rest W1 replay exact; identical sources give 0") {
    import spark.implicits._
    val data: Seq[(String, Long)] =
      (1L to 20L).map(("A", _)) ++ (1L to 20L).map(("B", _)) ++
        (200L to 204L).flatMap(v => Seq.fill(4)(("C", v)))
    val got = SamplingOps.sourceEmdOf(data.toDF("source", "value").repartition(3))
      .collect().map(r => r.getString(0) -> r).toMap
    val support = data.map(_._2).distinct.sorted
    val nAll = data.size.toLong
    got.foreach { case (s, r) =>
      val nS = data.count(_._1 == s).toLong
      val nR = nAll - nS
      var (cs, cr, acc) = (0L, 0L, BigInt(0))
      support.zip(support.tail).foreach { case (v, nv) =>
        cs += data.count(p => p._1 == s && p._2 == v)
        cr += data.count(p => p._1 != s && p._2 == v)
        acc += BigInt((cs * nR - cr * nS).abs) * BigInt(nv - v)
      }
      assert(r.getAs[Long]("n_source") == nS && r.getAs[Long]("n_rest") == nR)
      assert(r.getAs[Double]("emd_num") == acc.toDouble, s"source $s")
      assert(r.getAs[Double]("w1") == acc.toDouble / (nS.toDouble * nR.toDouble))
    }
    // the shifted source carries ~200-unit transport cost; the twins don't
    assert(got("C").getAs[Double]("w1") > 100.0)
    assert(got("A").getAs[Double]("w1") < got("C").getAs[Double]("w1"))
    val calm = SamplingOps.sourceEmdOf(
      ((1L to 20L).map(("A", _)) ++ (1L to 20L).map(("B", _)))
        .toDF("source", "value")).collect()
    assert(calm.forall(_.getAs[Double]("w1") == 0.0))
  }

  test("cramers v: hand-computed on a planted counts table; 0 on identical distributions") {
    import spark.implicits._
    // planted (n_train, n_val) buckets incl. one unseen-in-train:
    // tt=10, tv=10; e = 10·n_t/10 = n_t; terms: (6−4)²/4=1.0,
    // (2−4)²/4=1.0, (1−2)²/2=0.5; unseen bucket (0, 1) excluded
    val counts = Seq((0, 4L, 6L), (16, 4L, 2L), (32, 2L, 1L), (48, 0L, 1L))
      .toDF("bucket_lo", "n_train", "n_val")
    val r = SamplingOps.cramersVOf(SamplingOps.chisqReport(counts)).collect()(0)
    assert(r.getAs[Int]("k_eff") == 3)
    assert(r.getAs[Int]("n_unseen_in_train") == 1)
    assert(r.getAs[Long]("chi2_micro") == 2500000L) // (1.0+1.0+0.5)·1e6 exact
    assert(r.getAs[Long]("n_val") == 10L)
    assert(r.getAs[Double]("v") == math.sqrt(2.5 / (10.0 * 2.0)))
    // identical marginals → every term 0 → V = 0 (the no-drift anchor)
    val same = Seq((0, 3L, 3L), (16, 5L, 5L), (32, 2L, 2L))
      .toDF("bucket_lo", "n_train", "n_val")
    val s = SamplingOps.cramersVOf(SamplingOps.chisqReport(same)).collect()(0)
    assert(s.getAs[Long]("chi2_micro") == 0L && s.getAs[Double]("v") == 0.0)
  }

  test("ks drift: summary reconciles with the per-value table (sf0.001)") {
    val per = SamplingOps.splitDriftKs(spark, Sf0001)
    val maxD = per.agg(max(col("d_num"))).collect()(0).getLong(0)
    val atMax = per.filter(col("d_num") === maxD)
      .agg(min(col("value"))).collect()(0).getLong(0)
    val s = SamplingOps.splitDriftKsSummary(spark, Sf0001).collect()(0)
    assert(s.getAs[Long]("d_num_max") == maxD)
    assert(s.getAs[Long]("ks_value") == atMax)
    val expected = maxD.toDouble /
      (s.getAs[Long]("n_train").toDouble * s.getAs[Long]("n_val").toDouble)
    assert(s.getAs[Double]("d_stat") == expected)
    // a healthy content-hash split must NOT drift on length
    assert(!s.getAs[Boolean]("drifted"))
  }
}
