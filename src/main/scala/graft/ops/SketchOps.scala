package graft.ops

import graft.functions.MisraGriesAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded-memory frequency sketching over the corpus token stream —
  * the approximate sibling of the exact `TextOps.termDf` family. The
  * exact form shuffles the full |vocab| (unbounded at web scale, Heaps'
  * law); the Misra–Gries aggregate shuffles at most [[SketchK]] counters
  * per partition and still GUARANTEES every term above the n/(k+1)
  * frequency floor surfaces — the right trade for "what dominates this
  * 100 TB crawl" monitoring queries.
  */
object SketchOps {

  /** Sketch width: counters kept per partial. Every term with frequency
    * > n/(k+1) is guaranteed present; estimates undercount by at most
    * n/(k+1). */
  val SketchK = 64

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("term"))

  /** Heavy-hitter candidates: ONE pass, one k-bounded partial per
    * partition, one k-bounded merge — the whole shuffle is
    * ≤ k·|partitions| counters regardless of vocabulary size. Estimates
    * are the MG lower bounds (deterministic for a given partitioning);
    * rows-only oracle — the value-checked signal is
    * [[heavyHittersGate]]. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val mg = udaf(MisraGriesAggregator(SketchK))
    tokens(spark, dir)
      .agg(mg(col("term")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("term", "est_count")))
      .orderBy(col("est_count").desc, col("term"))
  }

  /** Per-language heavy hitters: the same Misra–Gries aggregate scoped
    * to `groupBy(lang)` — one k-bounded sketch PER GROUP, so the shuffle
    * is ≤ k·|partitions|·|langs| counters and the n/(k+1) guarantee holds
    * independently inside every language (the monitoring question a
    * multilingual 100 TB crawl actually asks: "what dominates the Farsi
    * slice" — a global sketch drowns low-resource languages under
    * English mass). Rows-only; the value-checked signal is
    * [[heavyHittersByLangGate]]. */
  def heavyHittersByLang(spark: SparkSession, dir: String): DataFrame = {
    val mg = udaf(MisraGriesAggregator(SketchK))
    langTokens(spark, dir)
      .groupBy(col("lang"))
      .agg(mg(col("term")).as("sketch"))
      .select(col("lang"), explode(col("sketch")).as(Seq("term", "est_count")))
      .orderBy(col("lang"), col("est_count").desc, col("term"))
  }

  private def langTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("term"))

  /** Grouped twin of [[heavyHittersGate]]: one row PER LANGUAGE with the
    * language's exact token count, its count of guaranteed-heavy terms
    * (freq·(k+1) > n within the group), and `passes` asserting both MG
    * theorems group-locally — no heavy term missing from that language's
    * sketch, every estimate a lower bound within n_lang/(k+1). The
    * oracle recomputes n_tokens/n_heavy per language independently and
    * expects the literal passes=true row set, making per-group sketch
    * correctness a hash-checked CORRECTNESS signal rather than a
    * spec-only claim. */
  def heavyHittersByLangGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = langTokens(spark, dir).groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("freq"))
    val totals = exact.groupBy(col("lang")).agg(sum(col("freq")).as("n"))
    val sketch = heavyHittersByLang(spark, dir)
    exact
      .join(sketch, Seq("lang", "term"), "left")
      .join(broadcast(totals), Seq("lang"))
      .groupBy(col("lang"))
      .agg(
        max(col("n")).as("n_tokens"),
        sum(when(col("freq") * (SketchK + 1) > col("n"), 1L).otherwise(0L))
          .cast(IntegerType).as("n_heavy"),
        sum(when(col("freq") * (SketchK + 1) > col("n") &&
          col("est_count").isNull, 1L).otherwise(0L)).as("missed"),
        sum(when(col("est_count") > col("freq") ||
          (col("freq") - coalesce(col("est_count"), col("freq"))) * (SketchK + 1) > col("n"),
          1L).otherwise(0L)).as("violated"))
      .select(col("lang"), col("n_tokens"), col("n_heavy"),
        (col("missed") === 0L && col("violated") === 0L).as("passes"))
      .orderBy(col("lang"))
  }

  /** Value-oracled guarantee gate (the recall-gate pattern): joins the
    * sketch against the EXACT token frequencies (a validation anchor —
    * affordable at oracle scale exactly like `knnExact`) and checks the
    * two Misra–Gries theorems: every term with freq·(k+1) > n is present
    * in the sketch, and every estimate is a lower bound within n/(k+1)
    * of truth. Integer arithmetic throughout, so the oracle can compute
    * n_tokens and n_heavy independently and expect the literal
    * passes=true. */
  def heavyHittersGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = tokens(spark, dir).groupBy(col("term"))
      .agg(count(lit(1)).as("freq"))
    val total = exact.agg(sum(col("freq")).as("n")).select(col("n"))
    val sketch = heavyHitters(spark, dir)
    exact
      .join(sketch, Seq("term"), "left")
      .crossJoin(broadcast(total))
      .agg(
        max(col("n")).as("n_tokens"),
        sum(when(col("freq") * (SketchK + 1) > col("n"), 1L).otherwise(0L))
          .cast(IntegerType).as("n_heavy"),
        sum(when(col("freq") * (SketchK + 1) > col("n") &&
          col("est_count").isNull, 1L).otherwise(0L)).as("missed"),
        sum(when(col("est_count") > col("freq") ||
          (col("freq") - coalesce(col("est_count"), col("freq"))) * (SketchK + 1) > col("n"),
          1L).otherwise(0L)).as("violated"))
      .select(col("n_tokens"), col("n_heavy"),
        (col("missed") === 0L && col("violated") === 0L).as("passes"))
  }

  // ------------------------------------------------------------------
  // Mergeable distinct-count sketch cube (Spark 4 DataSketches HLL)
  // ------------------------------------------------------------------

  /** Per-month DataSketches HLL tiles over lineitem's part keys — the
    * pre-aggregated distinct-count CUBE a 100 TB warehouse stores so
    * "distinct parts shipped in any date range" never rescans raw data:
    * sketches are mergeable BYTES (unlike `approx_count_distinct`, whose
    * sketch dies inside one query), so tiles materialize once per
    * partition and arbitrary ranges union in O(|months| · sketch size).
    * Estimates are deterministic for fixed data (the union is
    * associative/commutative), but engine-internal → rows-only; the
    * value-checked signal is [[sketchCubeGate]]. */
  def sketchCube(spark: SparkSession, dir: String): DataFrame =
    monthlyTiles(spark, dir)
      .select(col("month"), hll_sketch_estimate(col("sk")).as("est_parts"))
      .orderBy("month")

  // private[ops] so the negative-control spec can drive the gate's
  // range query with a deliberately broken tile set
  private[ops] def monthlyTiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))

  /** Value-oracled accuracy gate for the sketch cube: a RANGE query
    * (calendar 1995) answered by unioning the monthly tiles is checked
    * against the exact distinct count over the same range — the
    * merge-then-estimate path is the one production trusts, so that is
    * the path gated (lgK=14 → rse ≈ 0.65%; the int64 bound allows 4%,
    * a ≥6σ margin). Oracle recomputes the exact anchor independently
    * and expects the literal passes=true. */
  def sketchCubeGate(spark: SparkSession, dir: String): DataFrame = {
    val y1995 = (col("month") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))) &&
      (col("month") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
    val est = monthlyTiles(spark, dir).filter(y1995)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
    exact.crossJoin(broadcast(est))
      .select(col("n_parts"),
        (abs(col("est") - col("n_parts")) * 100L <= col("n_parts") * 4L).as("passes"))
  }

  // ------------------------------------------------------------------
  // Count-Min point-frequency sketch
  // ------------------------------------------------------------------

  /** 4×1024 counters = 32 KB per partial — the fixed budget that
    * replaces an unbounded |vocab| shuffle for point-frequency queries. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Deterministic probe workload: the BM25 query vocabulary. */
  private def cmsProbeTerms: Seq[String] =
    RetrievalOps.DefaultQueries.flatMap(_._2.split(" ")).distinct.sorted

  /** Point-frequency estimates for the probe terms from ONE global
    * Count-Min aggregate: each partition ships its 32 KB matrix, merges
    * are elementwise sums, and the driver holds exactly one matrix (the
    * bounded-scalar discipline — compare the |vocab|-row shuffle the
    * exact count pays). Estimates depend on the engine-internal hash →
    * rows-only; the value-checked signal is [[cmsGate]]. */
  def cmsEstimates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cms = udaf(graft.functions.CountMinAggregator(CmsDepth, CmsWidth))
    val sk = tokens(spark, dir).agg(cms(col("term")).as("sketch"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sketch").toArray
    cmsProbeTerms
      .map(t => (t, graft.functions.CountMinAggregator.estimate(sk, t, CmsDepth, CmsWidth)))
      .toDF("term", "est_count")
      .orderBy("term")
  }

  /** Value-oracled CMS guarantee gate (the heavy-hitters-gate pattern):
    * joins the sketch estimates against the exact probe-term counts and
    * checks both one-sided bounds — `est ≥ true` (an occurrence can
    * never be lost) and `est ≤ true + depth·n/width` (excess is
    * collision mass; the deterministic band is depth× the expected
    * n/width). Integer arithmetic throughout, so the oracle recomputes
    * the exact frequencies independently and expects the literal
    * passes-pair TRUE/TRUE per term. */
  def cmsGate(spark: SparkSession, dir: String): DataFrame = {
    val probes = cmsProbeTerms
    val toks = tokens(spark, dir)
    val exact = toks.filter(col("term").isin(probes: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val total = toks.agg(count(lit(1)).as("n"))
    exact
      .join(broadcast(cmsEstimates(spark, dir)), Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("term"), col("freq"),
        (col("est_count") >= col("freq")).as("overestimates"),
        ((col("est_count") - col("freq")) * CmsWidth <= lit(CmsDepth.toLong) * col("n"))
          .as("within_bound"))
      .orderBy("term")
  }

  // ------------------------------------------------------------------
  // Join-size estimation: the CMS inner product
  // ------------------------------------------------------------------

  /** Join-size sketch shape. Wider than the point-frequency sketch
    * because inner-product excess scales with |A|·|B|/width, not n/width:
    * at width 2^16 the expected excess on a 600k-row self-join is ~n²/2^16
    * ≈ 0.3·F2 — usable; at the point sketch's 2^10 it would be 64× and
    * swamp the signal. 4×65536×8 B = 2 MB per partial — each of 1000
    * executors ships one 2 MB matrix instead of its key histogram. */
  val JoinDepth = 4
  val JoinWidth = 65536

  /** One scan, one sketch per requested key column — the two lineitem
    * sketches below share a single pass over the fact table. */
  private def keySketches(df: DataFrame, keys: String*): Seq[Array[Long]] = {
    val cms = udaf(graft.functions.CountMinAggregator(JoinDepth, JoinWidth))
    val row = df
      .agg(cms(col(keys.head).cast(StringType)).as(keys.head),
        keys.tail.map(k => cms(col(k).cast(StringType)).as(k)): _*)
      .collect()(0)
    keys.map(k => row.getAs[scala.collection.Seq[Long]](k).toArray)
  }

  /** The two join-size questions the optimizer asks before picking a
    * strategy, answered from sketches alone (never materializing the
    * join): the l_partkey self-join size (the F2 moment — skew signal
    * and grace-hash sizing input) and |lineitem ⋈ orders| on orderkey.
    * One scan per input, one 2 MB mergeable matrix each, inner product
    * on the driver. Estimates depend on the engine-internal hash →
    * rows-only; the value-checked signal is [[joinSizeGate]]. */
  def joinSizeEstimates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.CountMinAggregator.innerProduct
    val Seq(li, lo) = keySketches(Tables(spark, dir, "lineitem"), "l_partkey", "l_orderkey")
    val Seq(oo) = keySketches(Tables(spark, dir, "orders"), "o_orderkey")
    Seq(
      ("l_partkey_self", innerProduct(li, li, JoinDepth, JoinWidth)),
      ("lineitem_orders", innerProduct(lo, oo, JoinDepth, JoinWidth)))
      .toDF("pair", "est_size")
      .orderBy("pair")
  }

  // ------------------------------------------------------------------
  // Distinct-overlap estimation: HLL inclusion–exclusion
  // ------------------------------------------------------------------

  /** lgK for the overlap sketches: 2¹⁴ registers → rse ≈ 0.81%. */
  val OverlapLgK = 14

  /** Per-type HLL sketch over distinct users — built once, reused by
    * estimate and union sides below. */
  private def userSketches(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(OverlapLgK)).as("sk"))

  /** Audience-overlap estimates between every event-type pair via
    * inclusion–exclusion over mergeable HLL sketches:
    * |A∩B| ≈ |A| + |B| − |A∪B|. HLL cannot intersect directly, but its
    * union is lossless-mergeable, so the overlap needs only the three
    * estimates — and the sketches are the SAME per-type tiles a 100 TB
    * deployment already stores (one fact scan, |types| sketches of 2¹⁴
    * registers; the pair expansion happens on sketches, never on data).
    * Estimates are engine-internal → rows-only; [[typeOverlapGate]] is
    * the value-checked signal. */
  def typeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sk = userSketches(spark, dir)
    sk.as("a").join(sk.as("b"), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        (hll_sketch_estimate(col("a.sk")) + hll_sketch_estimate(col("b.sk")) -
          hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))))
          .as("overlap_est"))
      .orderBy("type_a", "type_b")
  }

  /** Value-oracled overlap gate: per overlapping pair, the exact
    * distinct-user intersection alongside a deterministic accuracy
    * band — the inclusion–exclusion error is bounded by the three
    * estimates' rse against their own set sizes, so the gate allows 4%
    * of (|A|+|B|) (≥ 5σ across all three terms at lgK 14). The oracle
    * recomputes the exact overlap and expects the literal TRUE. */
  def typeOverlapGate(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val exact = ut.as("a")
      .join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("exact_overlap"))
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val est = typeOverlap(spark, dir)
    exact
      .join(est, col("ta") === col("type_a") && col("tb") === col("type_b"))
      .join(sizes.select(col("event_type").as("sa"), col("n").as("n_a")), col("ta") === col("sa"))
      .join(sizes.select(col("event_type").as("sb"), col("n").as("n_b")), col("tb") === col("sb"))
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"), col("exact_overlap"),
        (abs(col("overlap_est") - col("exact_overlap")) * 100.0 <=
          (col("n_a") + col("n_b")) * 4.0).as("passes"))
      .orderBy("type_a", "type_b")
  }

  /** Value-oracled join-size gate: per pair, the exact join size (a
    * count the oracle recomputes by actually joining) alongside the
    * sketch estimate's two one-sided bounds — `est ≥ true` (collision
    * mass is non-negative) and `est ≤ true + depth·|A|·|B|/width` (the
    * deterministic band, depth× the expected excess). Integer
    * arithmetic throughout; the oracle expects the literal TRUE pair. */
  def joinSizeGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val est = joinSizeEstimates(spark, dir).as[(String, Long)].collect().toMap
    val li = Tables(spark, dir, "lineitem")
    val or = Tables(spark, dir, "orders")
    val selfExact = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).collect()(0).getLong(0)
    val joinExact = li.select(col("l_orderkey"))
      .join(or.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey")).count()
    val nLi = li.count(); val nOr = or.count()
    def row(pair: String, exact: Long, na: Long, nb: Long): (String, Long, Long, Long, Boolean) = {
      val e = est(pair)
      (pair, na, nb, exact,
        e >= exact && (e - exact) * JoinWidth <= JoinDepth.toLong * na * nb)
    }
    Seq(row("l_partkey_self", selfExact, nLi, nLi),
      row("lineitem_orders", joinExact, nLi, nOr))
      .toDF("pair", "n_left", "n_right", "exact_size", "passes")
      .orderBy("pair")
  }
}
