package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampling / splitting operators for training-data pipelines: the
  * dataset-assembly steps that sit between dedup and training.
  *
  * Scale design: every operator here is a narrow per-row decision (a hash
  * or a seeded coin flip) — no shuffle, no state, embarrassingly parallel
  * at any corpus size; the only exchange is the deterministic output sort
  * the oracle requires.
  */
object SamplingOps {

  /** The content-hash split bucket and its 90/5/5 label — ONE definition
    * shared by [[splitHash]] and the drift monitor, so the monitored
    * rule can never silently diverge from the served split (the BenchMod
    * one-constant convention). */
  private[graft] def splitBucket: Column =
    conv(substring(md5(col("text")), 1, 4), 16, 10).cast(IntegerType) % 100

  private[graft] def splitOf(bucket: Column): Column =
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")

  /** Systematic-PPS sample budget (slots over the token-mass line). The
    * synthetic corpora run 500–50k docs, so 64 keeps both branches live
    * (selected and skipped) at every SF; production budgets scale the
    * same plan. */
  val PpsBudget = 64

  /** Systematic probability-proportional-to-size sampling — the epoch
    * subsampler that picks documents ∝ token mass (a 10k-token doc
    * should be 100× likelier in a token-budgeted epoch than a 100-token
    * one): lay all documents on the cumulative token line in doc_id
    * order and take one at every step T/K. Document i is selected iff
    * its interval (cum_{i−1}, cum_i] contains a slot boundary, i.e.
    * ⌊K·cum_i/T⌋ > ⌊K·cum_{i−1}/T⌋ — integer floor arithmetic end to
    * end (no step double, no accumulated rounding), deterministic, and
    * exactly K selections whenever no single document spans multiple
    * slots (a doc with w ≥ T/K is selected with CERTAINTY — the PPS
    * property the quality-weighted Bernoulli sampler lacks).
    *
    * Scale shape: the cumulative line rides
    * [[StatsOps.withRunningCount]] (range-partitioned prefix sums — no
    * one-task window over the corpus); the 1-row total broadcasts
    * back; selection is a per-row predicate. */
  def ppsSystematic(spark: SparkSession, dir: String): DataFrame =
    ppsOf(Tables(spark, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("w")), PpsBudget)

  /** The PPS core over any (doc_id, w ≥ 1) relation — separated so
    * specs can plant weight patterns with hand-computed selections.
    * cum·K is computed in DECIMAL(38,0) (HUGEINT on the oracle side):
    * in int64 it wraps silently once total token mass exceeds 2^63/K
    * (~1.4e17 tokens at K = 64 — production-corpus territory), and the
    * oracle doing the same int64 arithmetic would keep the gate green
    * while both engines mis-sample. `div` on decimals still returns
    * BIGINT, so the output schema is unchanged. */
  private[ops] def ppsOf(docs: DataFrame, k: Int): DataFrame = {
    val cum = StatsOps.withRunningCount(docs, Nil, "doc_id", "w", "cum")
    val tot = docs.agg(sum(col("w")).as("tot"))
    cum.crossJoin(broadcast(tot))
      .withColumn("slot", expr(s"(cast(cum as decimal(38,0)) * $k) div tot"))
      .withColumn("pslot", expr(s"(cast(cum - w as decimal(38,0)) * $k) div tot"))
      .filter(col("slot") > col("pslot"))
      .select(col("doc_id"), col("w"), col("cum"), col("slot"))
      .orderBy("doc_id")
  }

  /** Content-hash train/val/test split (90/5/5): the bucket is derived
    * from md5 of the TEXT, not the row id, so byte-identical documents
    * land in the same split no matter where they sit — the
    * leakage-resistant way to split a corpus that may still contain
    * duplicates. md5 is bit-identical across engines → full value oracle.
    * Narrow, codegen'd, no shuffle. */
  def splitHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), splitBucket.as("bucket"))
      .select(col("doc_id"), col("bucket"), splitOf(col("bucket")).as("split"))
      .orderBy("doc_id")

  /** Split-drift monitor: per token-length bucket, the observed val-split
    * count against its expectation under the train-split length
    * distribution, with the χ² contribution (o−e)²/e — the
    * goodness-of-fit statistic a pipeline watches to catch a broken or
    * biased split (e.g. a split keyed on something length-correlated).
    * χ² is chosen over PSI/KL precisely because it is RATIONAL: every
    * term is integer counts through one multiply, two divides and a
    * square — IEEE-deterministic in any engine, so the whole report is
    * value-oracled (a log-based divergence would hit the libm
    * transcendentals rule). Per-bucket terms only — a total χ² would be
    * an order-dependent double sum, which hash-verification forbids; the
    * driver can fold the column, and [[splitDriftSummary]] serves the
    * order-independent aggregate signals.
    *
    * Scale shape: one narrow scan (hash-split + token count per row),
    * one composite-key-free but TINY aggregation (≤ |length buckets|
    * groups after map-side partials), a 1-row total broadcast back.
    * Buckets unseen in train carry NULL e/χ² (flagged, not divided). */
  def splitDriftChisq(spark: SparkSession, dir: String): DataFrame =
    splitDriftCounts(spark, dir)
      .select(col("bucket_lo"), col("n_train"), col("n_val"),
        col("e_val"), col("chi2_term"))
      .orderBy("bucket_lo")

  /** Order-independent one-row summary of [[splitDriftChisq]]: bucket
    * and unseen-bucket counts plus the MAX χ² term (max over doubles is
    * permutation-safe where a sum is not) — the alerting scalar. */
  def splitDriftSummary(spark: SparkSession, dir: String): DataFrame =
    splitDriftCounts(spark, dir)
      .agg(count(lit(1)).cast(IntegerType).as("n_buckets"),
        sum(when(col("e_val").isNull, 1L).otherwise(0L))
          .cast(IntegerType).as("n_unseen_in_train"),
        max(col("chi2_term")).as("max_chi2_term"))

  /** Per-length-bucket train/val counts of a (…, text) document set —
    * the streaming-aggregatable core of the drift monitor (every column
    * is a sum, so the SAME expression runs as a complete-mode streaming
    * aggregation in graft.streaming.StreamingDriftMonitor). */
  private[graft] def driftBucketCounts(docs: DataFrame): DataFrame = {
    docs
      .select(
        splitOf(splitBucket).as("split"),
        (floor(TextOps.bpeTokenCount(col("text")) / PretrainOps.BucketWidth)
          .cast(IntegerType) * PretrainOps.BucketWidth).as("bucket_lo"))
      .filter(col("split").isin("train", "val"))
      .groupBy(col("bucket_lo"))
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
  }

  /** χ² finishing step over a (bucket_lo, n_train, n_val) counts table —
    * shared by the batch report and the streaming twin so the statistic
    * cannot drift between them. */
  private[graft] def chisqReport(counts: DataFrame): DataFrame = {
    // two consumers (the totals aggregate and the cross-join back) would
    // otherwise re-execute the whole counts plan — a full corpus re-scan
    // in batch, a double micro-batch evaluation in the streaming twin
    // (column pruning gives each branch a different canonical aggregate,
    // so exchange reuse cannot dedupe them — the salientTerms lesson).
    // The table is ≤ |length buckets| rows, so the EAGER checkpoint is
    // free; its blocks are ContextCleaner-managed.
    val c = counts.localCheckpoint()
    val totals = c
      .agg(sum(col("n_train")).as("tot_train"), sum(col("n_val")).as("tot_val"))
    // e and every χ² term are the SAME IEEE expression sequence the
    // DuckDB oracle spells out: exact integer product → double divide →
    // subtract → self-multiply → divide
    val e = (col("tot_val") * col("n_train")).cast(DoubleType) / col("tot_train")
    val diff = col("n_val").cast(DoubleType) - e
    c.crossJoin(broadcast(totals))
      .withColumn("e_val", when(col("n_train") > 0, e))
      .withColumn("chi2_term", when(col("n_train") > 0, diff * diff / e))
  }

  private def splitDriftCounts(spark: SparkSession, dir: String): DataFrame =
    chisqReport(driftBucketCounts(Tables(spark, dir, "documents")))

  /** Per-SOURCE length-drift profile — the "which shard shifted" axis of
    * corpus QA, complementing [[splitDriftChisq]]'s split axis: for
    * every (source, length bucket) cell, the observed document count
    * against its expectation under the CORPUS-WIDE length distribution,
    * with the χ² contribution. The full source × bucket grid is emitted
    * (zero cells included — a source missing a bucket the corpus has is
    * exactly the drift signal), built by crossing the two TINY
    * marginal tables, never the data: one narrow scan feeds a
    * composite-key (source, bucket) count — map-side combinable, no
    * skew — and every later step re-aggregates or joins that ≤
    * |sources|·|buckets| table. Same rational-χ² determinism story as
    * the split monitor → fully value-oracled. */
  def sourceDriftChisq(spark: SparkSession, dir: String): DataFrame =
    sourceDriftCells(spark, dir)
      .select(col("source"), col("bucket_lo"), col("n_docs"),
        col("n_bucket"), col("e_docs"), col("chi2_term"))
      .orderBy("source", "bucket_lo")

  /** Per-source one-row rollup of [[sourceDriftChisq]] — the alerting
    * view, order-independent only (cell count, zero-cell count, max χ²
    * term; never a double sum). */
  def sourceDriftSummary(spark: SparkSession, dir: String): DataFrame =
    sourceDriftCells(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(IntegerType).as("n_buckets"),
        sum(when(col("n_docs") === 0L, 1L).otherwise(0L))
          .cast(IntegerType).as("n_empty_buckets"),
        max(col("chi2_term")).as("max_chi2_term"))
      .orderBy("source")

  private def sourceDriftCells(spark: SparkSession, dir: String): DataFrame = {
    // four consumers (both marginals, the total, the join back) would
    // each re-derive the aggregate — four corpus scans with the regex
    // tokenizer; the EAGER checkpoint of the ≤ |sources|·|buckets|-row
    // table makes the scan happen once (the salientTerms/chisqReport
    // pattern; blocks are ContextCleaner-managed)
    val counts = Tables(spark, dir, "documents")
      .select(col("source"),
        (floor(TextOps.bpeTokenCount(col("text")) / PretrainOps.BucketWidth)
          .cast(IntegerType) * PretrainOps.BucketWidth).as("bucket_lo"))
      .groupBy(col("source"), col("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val bySource = counts.groupBy(col("source")).agg(sum(col("n")).as("tot_source"))
    val byBucket = counts.groupBy(col("bucket_lo")).agg(sum(col("n")).as("n_bucket"))
    val total = counts.agg(sum(col("n")).as("tot_all"))
    // e > 0 on every grid cell (both marginals are ≥ 1 by construction),
    // so no null guard is needed — zero OBSERVED cells are the signal
    val e = (col("tot_source") * col("n_bucket")).cast(DoubleType) / col("tot_all")
    val nObs = coalesce(col("n"), lit(0L))
    val diff = nObs.cast(DoubleType) - e
    bySource.crossJoin(byBucket).crossJoin(broadcast(total))
      .join(counts, Seq("source", "bucket_lo"), "left")
      .select(col("source"), col("bucket_lo"),
        nObs.as("n_docs"), col("n_bucket"),
        e.as("e_docs"), (diff * diff / e).as("chi2_term"))
  }

  /** Per-language target sampling rates: the data-mixing knob (upweight
    * scarce languages, downsample the dominant one). */
  val LangFractions: Map[String, Double] =
    Map("en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 0.8)

  /** Stratified (per-language) sampling via `DataFrameStatFunctions
    * .sampleBy`: each stratum is Bernoulli-sampled at its own rate with a
    * fixed seed — one scan, no shuffle, deterministic for a given seed
    * and partitioning. Seeded RNG draws are engine-internal → rows-only
    * oracle; proportions and determinism are pinned by spec. */
  def stratifiedSample(spark: SparkSession, dir: String, seed: Long = 42L): DataFrame =
    Tables(spark, dir, "documents")
      .stat.sampleBy("lang", LangFractions, seed)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Stratified sampling, deterministic twin: the SAME per-language rates
    * as `stratifiedSample`, but the keep/drop decision is the document's
    * content-hash bucket (md5, engine-identical) against its stratum's
    * rate instead of a seeded RNG draw — the `mixSources` mechanism with a
    * strata column. Exactly reproducible across engines, partitionings
    * and re-runs, leakage-resistant (byte-identical texts decide
    * together), and fully value-oracled — the check `stratifiedSample`'s
    * RNG draws structurally cannot have. Languages outside the rate map
    * sample at 0, matching `sampleBy` semantics. Narrow, no shuffle. */
  def stratifiedSampleHash(spark: SparkSession, dir: String): DataFrame = {
    val rate = LangFractions.foldLeft(lit(0.0)) { case (acc, (l, f)) =>
      when(col("lang") === l, lit(f)).otherwise(acc)
    }
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast(IntegerType) % 1000).as("bucket"),
        rate.as("rate"))
      .filter(col("bucket") < col("rate") * 1000.0)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Per-source document cap for the balanced-corpus step: no single
    * shard may contribute more than `cap` documents. Which documents
    * survive is decided by CONTENT-hash order within the shard (md5 of
    * text, doc_id tiebreak) — deterministic, engine-identical, and
    * unbiased by ingestion order, unlike "first N per file". One shuffle
    * on source for the rank window; at 100 TB a skewed mega-shard bounds
    * its window state to a running count (rank windows stream). Fully
    * value-oracled. */
  def capPerSource(spark: SparkSession, dir: String, cap: Int = 20): DataFrame =
    capPerSourceOf(Tables(spark, dir, "documents"), cap).orderBy("doc_id")

  /** The composable form over any (doc_id, source, text) set —
    * `CorpusPipeline.assemble` caps its dedup survivors with this. */
  def capPerSourceOf(docs: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hash_key"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"), md5(col("text")).as("hash_key"))
      .withColumn("rank_in_source", row_number().over(w).cast(IntegerType))
      .filter(col("rank_in_source") <= cap)
      .select(col("doc_id"), col("source"), col("rank_in_source"))
  }

  /** Quality-weighted deterministic sampling: a document's keep
    * probability RISES with its quality score instead of being a flat
    * per-stratum rate — the curriculum/filtering middle ground between
    * "drop below threshold" (loses all low-quality signal) and "keep
    * everything" (drowns the good data). rate = 0.2 + 0.8·q keeps the
    * best documents always and the worst at 20%; the score here is the
    * shared `TextOps.stopRatio` currency (q = 1 − sr, a stand-in for any
    * scorer — model perplexity, length mix, dedup cluster size). The
    * keep/drop decision is the content-hash bucket against the rate
    * (the `mixSources` mechanism), so the sample is exactly
    * reproducible, leakage-resistant, and fully value-oracled — all
    * arithmetic is IEEE-exact division/multiply, no transcendentals.
    * Narrow, codegen'd, no shuffle. */
  def qualityWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val q = lit(1.0) - graft.ops.TextOps.stopRatio(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast(IntegerType) % 1000).as("bucket"),
        (lit(0.2) + lit(0.8) * q).as("rate"))
      .filter(col("bucket") < col("rate") * 1000.0)
      .select(col("doc_id"), col("lang"), col("source"), col("rate"))
      .orderBy("doc_id")
  }

  /** Deterministic source-mixture sampling — the data-mixing step that
    * turns raw shard sizes into target mixture weights (downsample the
    * glut, keep the scarce): each document is kept iff its CONTENT-hash
    * bucket falls under its source's weight, so the sample is exactly
    * reproducible, leakage-resistant (duplicate texts sample together),
    * and requires no RNG state. Weights here derive from the source index
    * (first 5 shards full, next 5 half, rest 20%) — the rule is a stand-in
    * for a weights table and is SQL-expressible, so the operator is fully
    * value-oracled (md5 is engine-identical). Narrow, no shuffle. */
  def mixSources(spark: SparkSession, dir: String): DataFrame = {
    val idx = substring(col("source"), 4, 10).cast(IntegerType)
    val weight = when(idx < 5, 1.0).when(idx < 10, 0.5).otherwise(0.2)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast(IntegerType) % 1000).as("bucket"),
        weight.as("weight"))
      .filter(col("bucket") < col("weight") * 1000.0)
      .orderBy("doc_id")
  }

  /** Temperature-scaled multilingual sampling shares (the mBERT/XLM-R
    * α-smoothing rule at α = 1/2): raw per-language token masses are
    * exponentiated to mass^α and renormalized, boosting scarce
    * languages and damping the glut — THE standard answer to "English
    * is 40× Swahili, how often do I sample each?". This derives the
    * weights that [[mixSources]]-style appliers then consume.
    *
    * Integer-exactness: mass^(1/2) is the one α where exactness is
    * free — w = ⌊√(mass·10¹²)⌋ (≈10⁶·√mass) is computed with the SAME
    * IEEE sequence in both engines (double multiply → correctly-rounded
    * sqrt → floor), lands in int64, and every share/boost after it is
    * integer division. Other α need pow (libm → rows-only); serving the
    * α=1/2 point value-oracled pins the whole plan shape.
    *
    * Scale shape: one corpus scan → |langs|-row aggregate; the total is
    * a 1-row aggregate broadcast back. Nothing corpus-sized shuffles. */
  def temperatureShares(spark: SparkSession, dir: String): DataFrame = {
    val mass = Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("token_mass"))
      .select(col("lang"), col("token_mass"),
        floor(sqrt(col("token_mass").cast(DoubleType) * lit(1.0e12)))
          .cast(LongType).as("w"))
    val totals = mass.agg(sum(col("token_mass")).as("total_mass"),
      sum(col("w")).as("total_w"))
    mass.crossJoin(broadcast(totals))
      .select(col("lang"), col("token_mass"),
        expr("(token_mass * 1000000) div total_mass").as("raw_ppm"),
        expr("(w * 1000000) div total_w").as("temp_ppm"))
      .withColumn("boost_ppm", expr("(temp_ppm * 1000000) div raw_ppm"))
      .orderBy("lang")
  }

  /** How many documents per source the bottom-k sample keeps. */
  val BottomK = 10

  /** Bottom-k-by-hash sampling: per source, the [[BottomK]] documents
    * with the smallest md5(doc_id) rank — the reproducible uniform
    * sample every training-data pipeline needs (eyeball panels,
    * held-out audits) with three properties a `rand()` sample lacks:
    * engine-portable (any system that can md5 reproduces the exact
    * rows), stable under reruns/partitioning, and CONSISTENT under
    * corpus growth (a doc leaves the sample only when a smaller-hash
    * doc arrives — bottom-k sketches compose under union, so per-shard
    * samples merge into the global sample for free).
    *
    * Scale shape: the k-bounded pairs aggregate, NOT a row_number
    * window — partial bottom-k per partition map-side, so the exchange
    * carries ≤ k pairs per (partition, source) instead of shuffling
    * every row into |sources| reducers. The 48-bit hash prefix is
    * exactly representable in the aggregator's Double score. */
  def bottomKSample(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(graft.functions.TopKPairsAggregator(BottomK))
    Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast(StringType)), 1, 12), 16, 10)
          .cast(LongType).as("h"))
      .groupBy(col("source"))
      // ScoredNeighbor orders (score DESC, id ASC); negate for hash ASC
      .agg(topk((-col("h")).cast(DoubleType), col("doc_id")).as("picks"))
      .select(col("source"), posexplode(col("picks")).as(Seq("i", "pick")))
      .select(col("source"), (col("i") + 1).cast(IntegerType).as("sample_rank"),
        col("pick.neighborId").as("doc_id"),
        (-col("pick.cos")).cast(LongType).as("h"))
      .orderBy("source", "sample_rank")
  }

  /** Evaluation-sample budget for [[neymanAllocation]]. */
  val NeymanBudget = 1000L

  /** Neyman allocation: split a fixed eval-sample budget across strata
    * (languages) proportionally to N_h·S_h — the variance-optimal
    * stratified design, vs proportional allocation's N_h. The stratum
    * whose lengths vary most gets oversampled; a constant stratum gets
    * (nearly) nothing. This is how an eval set is sized when the metric
    * variance differs by language.
    *
    * Determinism: per-stratum variance numerator N·Σx² − (Σx)² rides
    * DECIMAL(38,0) (int64 dies at ~3e9 chars of mass); S_h pays ONE
    * sqrt and one division; the weight is floored to integer
    * micro-units with a 1-micro floor (zero-variance strata stay in the
    * design, and the total weight is never 0), so the apportionment —
    * integral bases plus largest-remainder top-up, ties to the first
    * stratum — is EXACT integer arithmetic end to end. Σ n_alloc =
    * budget structurally. Headroom: budget·weight ≤ 2⁶³ holds to
    * N_h·S_h ≈ 9e9 char-units; beyond, the micro scale drops a decade.
    *
    * Scale shape: one map-side-combinable moments aggregate to
    * |strata| rows; everything after (totals, ranks, top-up) lives on
    * that bounded domain. */
  def neymanAllocation(spark: SparkSession, dir: String): DataFrame =
    neymanOf(Tables(spark, dir, "documents")
      .select(col("lang").as("stratum"), col("n_chars").as("x")), NeymanBudget)

  private[graft] def neymanOf(rows: DataFrame, budget: Long): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val dbl = (c: Column) => c.cast(DoubleType)
    val stats = rows.groupBy("stratum").agg(
      count(lit(1)).as("n_docs"),
      sum(col("x")).as("sx"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"))
    val sd = sqrt((d38(col("n_docs")) * col("sxx") - d38(col("sx")) * d38(col("sx")))
      .cast(DoubleType)) / dbl(col("n_docs"))
    val withW = stats.withColumn("sd", sd)
      .withColumn("weight_micro",
        greatest(floor(dbl(col("n_docs")) * col("sd") * lit(1000000.0))
          .cast(LongType), lit(1L)))
      .select(col("stratum"), col("n_docs"), col("sd"), col("weight_micro"))
    val tot = withW.agg(sum(col("weight_micro")).as("w_tot"))
    val based = withW.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($budget * weight_micro) div w_tot"))
      .withColumn("rem", lit(budget) * col("weight_micro") - col("base") * col("w_tot"))
    val extra = based.agg((lit(budget) - sum(col("base"))).as("extra"))
    // bounded-domain window: |strata| rows
    val rk = row_number().over(Window.orderBy(col("rem").desc, col("stratum")))
    based.withColumn("rk", rk)
      .crossJoin(broadcast(extra))
      .select(col("stratum"), col("n_docs"), col("sd"), col("weight_micro"),
        (col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
          .as("n_alloc"))
      .orderBy("stratum")
  }

  /** Two-sample Kolmogorov–Smirnov drift test between the train and val
    * splits over document length (`n_chars`) — the distribution-free
    * companion to the binned χ² monitors above. Where χ² needs a bucket
    * width (and is blind to in-bucket shifts), KS compares the full
    * empirical CDFs: D = max_v |F_train(v) − F_val(v)|.
    *
    * Determinism: the per-value statistic is carried as the
    * cross-multiplied INTEGER |cum_train·n_val − cum_val·n_train| (the
    * common-denominator trick — no per-value division, so the max is an
    * integer max, never a float comparison); the single division to D
    * and the critical-value sqrt (IEEE-correctly-rounded, unlike ln)
    * happen once in the summary. Overflow headroom: cum·n ≤ 2⁶³ needs
    * n_train, n_val ≤ ~3e9 rows; a larger corpus KS-tests a
    * hash-sampled slice — the statistic is an estimate either way.
    *
    * Scale shape: one narrow scan (hash split per row) → composite-key
    * frequency aggregate (map-side combinable, ≤ |distinct lengths|
    * rows) → running counts via [[StatsOps.withRunningCount]]'s
    * range-partitioned prefix sums (a value domain as large as the
    * longest document never lands in one task) → 1-row totals broadcast
    * back. */
  def splitDriftKs(spark: SparkSession, dir: String): DataFrame =
    ksOf(splitValues(spark, dir))
      .select(col("value"), col("cum_train"), col("cum_val"), col("d_num"))
      .orderBy("value")

  /** One-row KS verdict: the max statistic, WHERE it happens (smallest
    * value attaining it — the drifted region a debugging run looks at
    * first), D itself, and the α=0.05 two-sample critical value
    * c(α)·√((n₁+n₂)/(n₁·n₂)) with c(0.05) = 1.358. */
  def splitDriftKsSummary(spark: SparkSession, dir: String): DataFrame =
    ksSummaryOf(ksOf(splitValues(spark, dir)))

  private def splitValues(spark: SparkSession, dir: String): DataFrame =
    ksValuesOf(Tables(spark, dir, "documents"))

  /** The (value, split) derivation over a (…, text, n_chars) document
    * relation — ONE definition shared by the batch entries and
    * [[graft.streaming.StreamingKsDrift]] (the driftBucketCounts
    * convention: the monitored rule can never diverge from the batch
    * report). */
  private[graft] def ksValuesOf(docs: DataFrame): DataFrame =
    docs.select(col("n_chars").as("value"), splitOf(splitBucket).as("split"))
      .filter(col("split") =!= "test")

  /** Per-distinct-value (f_train, f_val) frequency table — a plain
    * two-sum aggregate, so the streaming twin can maintain it as a
    * complete-mode streaming aggregation (state bounded by the length
    * distribution's support, independent of document volume). */
  private[graft] def ksFreqOf(values: DataFrame): DataFrame =
    values.groupBy("value").agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("f_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("f_val"))

  /** Per-distinct-value KS table over a (value: long, split ∈
    * {train, val}) relation: inclusive cumulative counts per side and
    * the cross-multiplied deviation. Exposed for the planted-fixture
    * spec. */
  private[graft] def ksOf(values: DataFrame): DataFrame =
    ksOfFreq(ksFreqOf(values))

  /** The finishing step from the frequency table (shared by batch and
    * the streaming twin's per-epoch publish). */
  private[graft] def ksOfFreq(freq: DataFrame): DataFrame = {
    val run = StatsOps.withRunningCount(
      StatsOps.withRunningCount(freq, Nil, "value", "f_train", "cum_train"),
      Nil, "value", "f_val", "cum_val")
    val totals = freq.agg(sum(col("f_train")).as("n_train"),
      sum(col("f_val")).as("n_val"))
    run.crossJoin(broadcast(totals))
      .withColumn("d_num",
        abs(col("cum_train") * col("n_val") - col("cum_val") * col("n_train")))
  }

  /** Per-source KS drift: each source's length CDF against the REST of
    * the corpus (one-vs-rest — the KS sibling of
    * [[sourceDriftChisq]]'s binned χ²), one verdict row per source.
    * The deviation can peak at a length the source never emits, so the
    * statistic runs over the full source × distinct-length grid
    * (bounded by |sources|·|length support|, independent of corpus
    * rows — the sourceDrift grid argument); rest-CDF counts are exact
    * complements cum_g − cum_s, so one global and one per-source
    * running count suffice. Same cross-multiplied integer deviations,
    * one division + sqrt per source. */
  def sourceDriftKs(spark: SparkSession, dir: String): DataFrame =
    sourceKsOf(Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").as("value")))

  /** The per-(source, value) one-vs-rest deviation grid (`d_num` =
    * |cum_s·n_rest − cum_rest·n_s|) — the shared core of the per-source
    * KS verdict AND the per-source W₁ magnitude, bounded by
    * |sources|·|support| regardless of corpus rows. */
  private[graft] def sourceKsCells(rows: DataFrame): DataFrame = {
    val sf = rows.groupBy("source", "value").agg(count(lit(1)).as("c"))
    val gcum = StatsOps.withRunningCount(
      sf.groupBy("value").agg(sum(col("c")).as("cg")),
      Nil, "value", "cg", "cum_g")
    val grid = gcum.crossJoin(broadcast(sf.select("source").distinct()))
      .join(sf, Seq("source", "value"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val scum = StatsOps.withRunningCount(grid, Seq("source"), "value", "c", "cum_s")
    val totals = sf.groupBy("source").agg(sum(col("c")).as("n_s"))
    val grand = sf.agg(sum(col("c")).as("n_g"))
    scum.join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("n_rest", col("n_g") - col("n_s"))
      .withColumn("d_num", abs(col("cum_s") * col("n_rest")
        - (col("cum_g") - col("cum_s")) * col("n_s")))
  }

  private[graft] def sourceKsOf(rows: DataFrame): DataFrame = {
    val d = sourceKsCells(rows)
    val nS = col("n_source").cast(DoubleType)
    val nR = col("n_rest").cast(DoubleType)
    d.groupBy(col("source"))
      .agg(max(col("n_s")).as("n_source"), max(col("n_rest")).as("n_rest"),
        max(struct(col("d_num"), (-col("value")).as("nv"))).as("m"))
      .select(col("source"), col("n_source"), col("n_rest"),
        col("m.d_num").as("d_num_max"), (-col("m.nv")).as("ks_value"))
      .withColumn("d_stat", col("d_num_max").cast(DoubleType) / (nS * nR))
      .withColumn("d_crit", lit(1.358) * sqrt((nS + nR) / (nS * nR)))
      .withColumn("drifted", col("d_stat") > col("d_crit"))
      .orderBy("source")
  }

  /** Wasserstein-1 (earth-mover) drift distance between the train and
    * val length distributions — KS's integral sibling: where D reports
    * the WORST CDF gap, W₁ = ∫|F_t − F_v| dv reports the TOTAL
    * transport cost in value units (for equal sample sizes it equals
    * the mean |difference of sorted samples| — the magnitude readout D
    * cannot give). Rides the KS table directly: per consecutive
    * distinct values, |d_num|·gap summed exactly on DECIMAL(38,0)
    * (d_num ≤ n_t·n_v already strains int64 before the gap multiply),
    * with the gap lengths from [[StatsOps.withNextValue]]'s
    * range-partitioned lead — no one-task window at any support size.
    * ONE division at the end. */
  def splitDriftEmd(spark: SparkSession, dir: String): DataFrame =
    emdOf(splitValues(spark, dir))

  private[graft] def emdOf(values: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val withNext = StatsOps.withNextValue(ksOf(values), Nil, "value", "next_value")
    val agg = withNext.agg(
      max(col("n_train")).as("n_train"), max(col("n_val")).as("n_val"),
      sum(d38(col("d_num")) *
        d38(coalesce(col("next_value"), col("value")) - col("value"))).as("s"))
    val nT = col("n_train").cast(DoubleType)
    val nV = col("n_val").cast(DoubleType)
    agg.select(col("n_train"), col("n_val"),
        col("s").cast(DoubleType).as("emd_num"))
      .withColumn("w1", col("emd_num") / (nT * nV))
  }

  /** Per-source Wasserstein-1 drift: each source's length distribution
    * against the REST of the corpus — the magnitude sibling of
    * [[sourceDriftKs]] exactly as [[splitDriftEmd]] is of
    * [[splitDriftKs]]. Rides the SAME one-vs-rest deviation grid
    * ([[sourceKsCells]]); gap lengths come from the range-partitioned
    * lead partitioned BY source (every source's support is the full
    * grid, so no one-task window at any support size); Σ|d_num|·gap on
    * DECIMAL(38,0); ONE division per source. */
  def sourceDriftEmd(spark: SparkSession, dir: String): DataFrame =
    sourceEmdOf(Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").as("value")))

  private[graft] def sourceEmdOf(rows: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val withNext = StatsOps.withNextValue(
      sourceKsCells(rows), Seq("source"), "value", "next_value")
    val agg = withNext.groupBy(col("source")).agg(
      max(col("n_s")).as("n_source"), max(col("n_rest")).as("n_rest"),
      sum(d38(col("d_num")) *
        d38(coalesce(col("next_value"), col("value")) - col("value"))).as("s"))
    val nS = col("n_source").cast(DoubleType)
    val nR = col("n_rest").cast(DoubleType)
    agg.select(col("source"), col("n_source"), col("n_rest"),
        col("s").cast(DoubleType).as("emd_num"))
      .withColumn("w1", col("emd_num") / (nS * nR))
      .orderBy("source")
  }

  /** Cramér's V for the split-drift monitor: the EFFECT-SIZE readout
    * beside the χ² report — how far the val length distribution sits
    * from train on a 0..1 scale, comparable across corpus sizes where
    * raw χ² is not. The χ² total is a sum of per-bucket doubles, which
    * is permutation-UNSAFE to hash (the reason splitDriftSummary max'es
    * instead of summing), so each term is floor-scaled to int64
    * micro-units first — the BM25 order-independence trick — and the
    * one sqrt runs on the quantized total: V = √(χ²_micro/10⁶ /
    * (N·(k_eff−1))) with N = the val count and k_eff = buckets with a
    * defined expectation. Unseen-in-train buckets are reported, not
    * summed (their term is undefined), matching the χ² report. */
  def splitDriftCramersV(spark: SparkSession, dir: String): DataFrame =
    cramersVOf(chisqReport(driftBucketCounts(Tables(spark, dir, "documents"))))

  private[graft] def cramersVOf(report: DataFrame): DataFrame = {
    val agg = report.agg(
      sum(when(col("e_val").isNotNull, 1L).otherwise(0L))
        .cast(IntegerType).as("k_eff"),
      sum(when(col("e_val").isNull, 1L).otherwise(0L))
        .cast(IntegerType).as("n_unseen_in_train"),
      sum(when(col("e_val").isNotNull,
        floor(col("chi2_term") * lit(1000000.0)).cast(LongType))
        .otherwise(0L)).as("chi2_micro"),
      sum(col("n_val")).as("n_val"))
    agg.withColumn("v",
      when(col("k_eff") > 1 && col("n_val") > 0,
        sqrt((col("chi2_micro").cast(DoubleType) / lit(1000000.0))
          / (col("n_val").cast(DoubleType) * (col("k_eff") - 1).cast(DoubleType)))))
  }

  private[graft] def ksSummaryOf(perValue: DataFrame): DataFrame = {
    val picked = perValue.agg(
      max(col("n_train")).as("n_train"),
      max(col("n_val")).as("n_val"),
      // struct max: largest deviation, ties broken to the SMALLEST value
      // (−value sorts descending) — mirrored by the oracle's min(value)
      max(struct(col("d_num"), (-col("value")).as("neg_value"))).as("m"))
    val nT = col("n_train").cast(DoubleType)
    val nV = col("n_val").cast(DoubleType)
    picked
      .select(col("n_train"), col("n_val"),
        col("m.d_num").as("d_num_max"), (-col("m.neg_value")).as("ks_value"))
      .withColumn("d_stat", col("d_num_max").cast(DoubleType) / (nT * nV))
      .withColumn("d_crit", lit(1.358) * sqrt((nT + nV) / (nT * nV)))
      .withColumn("drifted", col("d_stat") > col("d_crit"))
  }
}
