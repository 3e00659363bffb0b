package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the dimension/corpus maintenance operators: SCD2
  * merge, incremental (batch-vs-corpus) dedup, length-bucketed batching
  * stats, and the Q5/Q10 join shapes. */
class MaintenanceOpsSpec extends SparkSpec {

  // ------------------------------------------------------------------ scd2

  test("scd2: changed keys get a closed v1 and an open v2; others untouched") {
    val dim = Tables(spark, Sf0001, "customer")
    val nCust = dim.count()
    val nChanged = dim.filter(col("c_custkey") % 7 === 0).count()
    val r = UpsertOps.scd2Merge(spark, Sf0001)
    assert(r.count() == nCust + nChanged)

    val byKey = r.collect().groupBy(_.getAs[Long]("c_custkey"))
    byKey.foreach { case (key, rows) =>
      if (key % 7 == 0) {
        assert(rows.length == 2, s"changed key $key")
        val v1 = rows.find(_.getAs[Int]("version") == 1).get
        val v2 = rows.find(_.getAs[Int]("version") == 2).get
        // v1 closes exactly where v2 opens — history is seamless
        assert(v1.getAs[java.sql.Timestamp]("valid_to") ==
          v2.getAs[java.sql.Timestamp]("valid_from"))
        assert(v2.getAs[java.sql.Timestamp]("valid_to") == null)
        // the new version carries the exact-decimal +100 balance
        val expected = (BigDecimal(v1.getAs[Double]("c_acctbal"))
          .setScale(2) + 100).toDouble
        assert(v2.getAs[Double]("c_acctbal") == expected)
      } else {
        assert(rows.length == 1, s"unchanged key $key")
        assert(rows.head.getAs[Int]("version") == 1)
        assert(rows.head.getAs[java.sql.Timestamp]("valid_to") == null)
      }
    }
  }

  // ---------------------------------------------------- incremental dedup

  /** Batch (src0) vs corpus (src1): one batch doc duplicates the corpus,
    * two batch docs duplicate each other, one is genuinely new. */
  private lazy val incDir: String = {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha text body", "en", "src1", 15L),
      (2L, "beta text body", "en", "src1", 14L),
      (10L, "alpha text body", "en", "src0", 15L), // dup of corpus → dropped
      (11L, "gamma text body", "en", "src0", 15L), // new, first copy
      (12L, "gamma text body", "en", "src0", 15L), // within-batch dup
      (13L, "delta text body", "en", "src0", 15L)) // new, unique
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("inc_docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("incremental dedup: corpus dups dropped, batch dups collapsed") {
    val r = DedupOps.incremental(spark, incDir).collect()
      .map(row => (row.getAs[Long]("keep_id"), row.getAs[Long]("n_copies")))
    assert(r.toSeq == Seq((11L, 2L), (13L, 1L)))
  }

  test("incremental dedup: agrees with exact dedup when the corpus is empty") {
    // with no prior corpus the incremental path degenerates to plain
    // within-batch exact dedup — same survivors as DedupOps.exact
    import spark.implicits._
    val docs = Seq(
      (11L, "gamma text body", "en", "src0", 15L),
      (12L, "gamma text body", "en", "src0", 15L),
      (13L, "delta text body", "en", "src0", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("inc_docs_empty")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val inc = DedupOps.incremental(spark, dir).collect().map(_.toSeq).toSeq
    val ex = DedupOps.exact(spark, dir).collect().map(_.toSeq).toSeq
    assert(inc == ex)
  }

  // ------------------------------------------------- quality survivorship

  test("quality survivor: the best-scored case variant wins") {
    import spark.implicits._
    // "the of and to" scores sr=1.0; "The Of And To" scores 0.0 (stopword
    // match is case-sensitive) — the capitalized copy must survive even
    // though its doc_id is larger
    val docs = Seq(
      (1L, "the of and to", "en", "src0", 13L),
      (2L, "The Of And To", "en", "src0", 13L),
      (3L, "unique body here", "en", "src0", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("qs_docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DedupOps.qualitySurvivor(spark, dir).collect()
      .map(row => (row.getAs[Long]("keep_id"), row.getAs[Long]("n_copies")))
    assert(r.toSeq == Seq((2L, 2L), (3L, 1L)))
  }

  test("quality survivor: survivor count equals the normalized-key count") {
    val r = DedupOps.qualitySurvivor(spark, Sf0001)
    val distinctKeys = Tables(spark, Sf0001, "documents")
      .select(lower(col("text"))).distinct().count()
    assert(r.count() == distinctKeys)
  }

  // ------------------------------------------------------------ winsorize

  test("winsorize: clipped to the per-type band, interior values untouched") {
    val r = EventOps.winsorize(spark, Sf0001)
    assert(r.count() == Tables(spark, Sf0001, "events").count())
    // per type: clipped range is within [min, max] of the clipped column
    // and every untouched row satisfies value == value_clipped
    val touched = r.filter(col("value") =!= col("value_clipped"))
    assert(touched.count() > 0) // 5% tails exist in the synthetic data
    // clipping never moves a value PAST the band: clipped values are
    // order-preserving (monotone map)
    val perType = r.groupBy(col("event_type"))
      .agg(min(col("value_clipped")).as("lo"), max(col("value_clipped")).as("hi"),
        count(when(col("value") < col("value_clipped"), 1)).as("n_raised"),
        count(when(col("value") > col("value_clipped"), 1)).as("n_lowered"))
      .collect()
    perType.foreach { row =>
      assert(row.getAs[Long]("n_raised") > 0) // both tails clip
      assert(row.getAs[Long]("n_lowered") > 0)
      assert(row.getAs[Double]("lo") <= row.getAs[Double]("hi"))
    }
  }

  // -------------------------------------------------------- length buckets

  test("length buckets: partition the corpus, bounds honored") {
    val docs = Tables(spark, Sf0001, "documents")
    val total = docs.count()
    val r = PretrainOps.lengthBuckets(spark, Sf0001).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum == total) // every doc in one bucket
    r.foreach { row =>
      val lo = row.getAs[Int]("bucket_lo")
      assert(lo % PretrainOps.BucketWidth == 0)
      assert(row.getAs[Int]("min_tokens") >= lo)
      assert(row.getAs[Int]("max_tokens") < lo + PretrainOps.BucketWidth)
      assert(row.getAs[Int]("min_tokens") <= row.getAs[Int]("max_tokens"))
    }
    // token mass conserved against the token counter (same currency)
    val totalTokens = docs
      .select(sum(TextOps.bpeTokenCount(col("text")))).head().getLong(0)
    assert(r.map(_.getAs[Long]("sum_tokens")).sum == totalTokens)
  }

  // -------------------------------------------------------- q5 / q10 shapes

  test("q5: local-supplier condition is strictly more selective than j3") {
    val q5 = JoinOps.q5LocalSupplier(spark, Sf0001).collect()
    assert(q5.nonEmpty)
    // revenue-descending output order
    val revs = q5.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
    assert(revs.forall(_ > 0))
  }

  test("q10: top-20 returned-item customers, deterministic order") {
    val rows = JoinOps.q10ReturnedItems(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val keys = rows.map(r =>
      (-r.getAs[Double]("revenue"), r.getAs[Long]("c_custkey"))).toSeq
    assert(keys == keys.sorted) // desc revenue, custkey tiebreak
  }

  test("vacuumStaleIndexes: stale stamps reclaimed, the current snapshot survives") {
    val dir = Sf0001
    val tag = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val tmp = System.getProperty("java.io.tmpdir")
    // current lex index (stamp matches the live source file)
    val currentIdx = graft.ops.RetrievalOps.ensureLexIndex(spark, dir)
    // a stranded snapshot with a stale stamp
    val stale = new java.io.File(s"$tmp/graft_lex_index_v2_${tag}_1_1")
    stale.mkdirs()
    new java.io.FileOutputStream(new java.io.File(stale, "orphan")).close()
    val report = UpsertOps.vacuumStaleIndexes(spark, dir).collect()
      .map(r => r.getString(1) -> r.getString(2)).toMap
    assert(report(stale.getName) == "deleted")
    assert(!stale.exists(), "stale index dir must actually be gone")
    val curName = new java.io.File(currentIdx).getName
    assert(report(curName) == "kept")
    assert(new java.io.File(currentIdx, "stats").exists(), "live index must survive")
    // and the survivor still serves queries
    assert(graft.ops.RetrievalOps.bm25FromIndex(spark, currentIdx).collect().nonEmpty)
  }

  test("cdc apply: last writer wins, tombstones delete, out-of-order arrival is irrelevant") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // key 5: upsert seq 5 then tombstone seq 1002 (=5 mod 997)  → gone
    // key 7: tombstone seq 7 then upsert seq 1004 (=7 mod 997)  → lives
    // key 3: single upsert                                      → lives
    val rows = Seq(
      (1002L, ts0, 1L, "error", 0.0, "{}"),
      (5L, ts0, 1L, "view", 50.0, "{}"),
      (1004L, ts0, 2L, "purchase", 70.0, "{}"),
      (7L, ts0, 2L, "error", 0.0, "{}"),
      (3L, ts0, 3L, "click", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("cdc_events")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = UpsertOps.cdcApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((3L, 3L, 30.0), (7L, 1004L, 70.0)))
  }

  // ------------------------------------------------- incremental MV

  test("mv incremental: base ⊕ delta is bit-identical to the full recompute") {
    val inc = UpsertOps.mvIncrementalMonthly(spark, Sf0001).collect()
    val full = CoreOps.a1MonthlyAggEvents(spark, Sf0001).collect()
    assert(inc.length == full.length && inc.length > 0)
    inc.zip(full).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getTimestamp(1) == b.getTimestamp(1))
      // exact equality, not tolerance: the mergeable state is decimal
      assert(a.getDouble(2) == b.getDouble(2), s"avg for ${a.getString(0)}")
      assert(a.getDouble(3) == b.getDouble(3), s"sum for ${a.getString(0)}")
      assert(a.getLong(4) == b.getLong(4))
    }
  }

  test("mv incremental: second call reuses the materialized base (no rebuild)") {
    UpsertOps.mvIncrementalMonthly(spark, Sf0001).collect() // ensure built
    val base = graft.ops.stampedIndexDir("graft_mv_base_v1_", Sf0001, "events.parquet")
    val stamp = new java.io.File(s"$base/_SUCCESS").lastModified()
    UpsertOps.mvIncrementalMonthly(spark, Sf0001).collect()
    assert(new java.io.File(s"$base/_SUCCESS").lastModified() == stamp)
  }

  test("mv join incremental: delta-join algebra is bit-identical to the recompute") {
    import org.apache.spark.sql.functions._
    val inc = UpsertOps.mvJoinIncremental(spark, Sf0001).collect()
    val full = Tables(spark, Sf0001, "orders")
      .join(Tables(spark, Sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sumExact(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority", "month").collect()
    assert(inc.length == full.length && inc.length > 0)
    inc.zip(full).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getTimestamp(1) == b.getTimestamp(1))
      // exact equality: mergeable state is decimal, fold order-free
      assert(a.getDouble(2) == b.getDouble(2), s"revenue for ${a.getString(0)}")
      assert(a.getLong(3) == b.getLong(3))
    }
    // the split moduli must keep all THREE delta terms live — a split
    // that empties one term would pass the equality above while silently
    // no longer exercising the ΔA⋈ΔB (or cross) path
    val ord = Tables(spark, Sf0001, "orders")
    val li = Tables(spark, Sf0001, "lineitem")
    def n(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    val oD = ord.filter(col("o_orderkey") % 10 === 0)
    val oB = ord.filter(col("o_orderkey") % 10 =!= 0)
    val lD = li.filter(col("l_orderkey") % 7 === 0)
    val lB = li.filter(col("l_orderkey") % 7 =!= 0)
    assert(n(oD, lB) > 0 && n(oB, lD) > 0 && n(oD, lD) > 0)
  }
}
