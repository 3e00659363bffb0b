package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for the final assembly stage of a training
  * run: selecting under a token budget, scheduling fractional epochs per
  * source, and fixing a reproducible global shuffle order. These are the
  * decisions a pretraining data pipeline makes AFTER dedup/filtering and
  * BEFORE tokenization (cf. the mixture/epoch tables in the Llama, Pile
  * and Dolma reports).
  *
  * All three are deterministic hash/integer/exact-division pipelines —
  * fully value-oracled against DuckDB. No RNG anywhere: repeat counts and
  * shuffle positions derive from content/id hashes, so a re-run (or a
  * different partitioning) reproduces the exact same corpus.
  */
object CurationOps {

  /** Global token budget for [[budgetSelect]] — selects roughly half the
    * corpus at sf0.01 and the top ~6% at sf0.1, so both oracle scales
    * exercise a non-trivial cut. */
  val TokenBudget = 15000L

  /** Quality quantization for the scalable greedy: floor(q·1000) — fine
    * enough that the boundary bucket is a sliver of the corpus. */
  val QualityBuckets = 1000

  /** Greedy token-budget selection: take documents in quality order
    * (q = 1 − stop-ratio, the shared `TextOps.stopRatio` currency;
    * doc_id tie-break) until the cumulative token count exceeds
    * [[TokenBudget]] — "best data that fits the compute budget", the
    * canonical data-constrained-scaling selection rule.
    *
    * Scale shape: the textbook form is a cumulative sum over ONE global
    * quality ordering — a single-partition window, the classic driver
    * bottleneck. This plan never builds that ordering. Quality is
    * quantized to [[QualityBuckets]] buckets (floor is monotone, so
    * bucket-desc → exact-q-desc → doc_id is THE greedy order); per-bucket
    * token totals aggregate to a ≤1001-row table whose bucket-prefix sums
    * broadcast back; each document then needs only its WITHIN-bucket
    * running sum (window partitioned by bucket — parallel, and any one
    * bucket is ~1/1000 of the corpus unless quality is degenerate).
    * cum = bucket-prefix + within-bucket running sum equals the global
    * cumulative exactly, which is what the DuckDB oracle computes with
    * the naive global window — the equivalence is the check. */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val q = lit(1.0) - TextOps.stopRatio(col("text"))
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"), q.as("q"))
      .withColumn("bucket", floor(col("q") * QualityBuckets).cast(IntegerType))
    val wb = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = docs.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("cum_before", coalesce(sum(col("btok")).over(wb), lit(0L)))
      .select(col("bucket"), col("cum_before"))
    val wd = Window.partitionBy(col("bucket"))
      .orderBy(col("q").desc, col("doc_id"))
    docs.join(broadcast(cumBefore), Seq("bucket"))
      .withColumn("cum", col("cum_before") + sum(col("n_tokens")).over(wd))
      .filter(col("cum") <= TokenBudget)
      .select(col("doc_id"), col("n_tokens"), col("cum"))
      .orderBy("doc_id")
  }

  /** Per-source epoch weights for [[epochMix]]: scarce high-value shards
    * train 2.4 epochs, the mid tier 1.2, the glut 0.4 — the standard
    * "upsample the good, downsample the web crawl" mixture table (a
    * stand-in for a configured weights table; the index rule keeps it
    * SQL-expressible for the oracle). */
  val EpochHi = 2.4
  val EpochMid = 1.2
  val EpochLo = 0.4

  /** Weights enter the plan as exact integer PERMILLE (2.4 → base 2,
    * extra-bucket threshold 400), not as doubles: `0.4 * 1000` in IEEE
    * arithmetic lands a hair ABOVE 400, so a float threshold would admit
    * bucket 400 where exact decimal arithmetic (DuckDB's) excludes it —
    * integer thresholds make the keep rule engine-exact by construction. */
  def permille(w: Double): Int = math.round(w * 1000).toInt

  /** Fractional-epoch mixing: materialize the training-mixture repeat
    * plan — each document appears floor(w) times, plus once more iff its
    * content-hash bucket falls under frac(w), so a source with w = 2.4
    * contributes each document 2 or 3 times and EXACTLY 2.4× in
    * expectation over content hashes. Documents whose repeat count lands
    * on 0 (w < 1) drop out — mixing subsumes downsampling. The decision
    * is md5-of-text (engine-identical, leakage-resistant: byte-identical
    * duplicates repeat together), not RNG, so the epoch plan is exactly
    * reproducible across runs, engines and partitionings.
    *
    * Scale shape: narrow per-row arithmetic + an explode bounded by
    * ceil(max w) — no shuffle beyond the output sort, embarrassingly
    * parallel at any corpus size. */
  def epochMix(spark: SparkSession, dir: String): DataFrame = {
    val idx = substring(col("source"), 4, 10).cast(IntegerType)
    val pm = when(idx < 5, permille(EpochHi))
      .when(idx < 10, permille(EpochMid)).otherwise(permille(EpochLo))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast(IntegerType) % 1000).as("bucket"),
        pm.as("pm"))
      .withColumn("repeats",
        (col("pm") / 1000).cast(IntegerType) +
          when(col("bucket") < col("pm") % 1000, 1).otherwise(0))
      .filter(col("repeats") >= 1)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("repeats"))).as("epoch"))
      .orderBy("doc_id", "epoch")
  }

  /** Target language shares (permille) for [[resampleToTarget]] — the
    * distribution the curated corpus should have, as opposed to the
    * crawl's accidental one. Integer permille for the same engine-exact
    * reason as [[epochMix]]. */
  val TargetSharePm: Map[String, Int] =
    Map("en" -> 300, "de" -> 175, "es" -> 175, "fr" -> 175, "zh" -> 175)

  /** Importance resampling to a TARGET distribution: downsample each
    * language so the surviving corpus matches [[TargetSharePm]] as
    * closely as downsampling-only allows — the scarcest language
    * (relative to its target share) keeps everything, every other
    * language keeps the rate that preserves the target proportions.
    * This is the general distribution-matching step behind "rebalance
    * the crawl to the product mix" (CCNet, mC4 language balancing).
    *
    * Engine-exactness: the keep rule is fully cross-multiplied —
    * bucket · pm_limiting · count_lang < 1000 · pm_lang · count_limiting
    * — all int64, so no float boundary exists anywhere (the limiting
    * language itself is an argmin of an IEEE-identical double ratio
    * with a lang tie-break). Scale shape: one tiny per-lang aggregate,
    * its 1-row argmin broadcast back, then a narrow per-row hash
    * decision — the corpus never shuffles. */
  def resampleToTarget(spark: SparkSession, dir: String): DataFrame = {
    val pm = TargetSharePm.foldLeft(lit(0)) { case (acc, (l, p)) =>
      when(col("lang") === l, p).otherwise(acc)
    }
    val counts = Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .withColumn("pm", pm)
      .filter(col("pm") > 0)
    val lim = counts
      .orderBy((col("cnt").cast(DoubleType) / col("pm")).asc, col("lang"))
      .limit(1)
      .select(col("cnt").as("cnt_lim"), col("pm").as("pm_lim"))
    Tables(spark, dir, "documents")
      .join(counts.select(col("lang"), col("cnt"), col("pm")), Seq("lang"))
      .crossJoin(broadcast(lim))
      .filter(
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast(LongType) % 1000) *
          col("pm_lim") * col("cnt") < lit(1000L) * col("pm") * col("cnt_lim"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** CCNet-style per-language quality terciles: label every document
    * head / middle / tail by where its quality sits within ITS OWN
    * language's distribution (cross-language score scales never agree,
    * so the split must be per-language — the core CCNet observation).
    * The currency is the shared exact `TextOps.stopRatio` quality, and
    * the boundaries are exact percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the parity `winsorize` already proves) — so the
    * whole labeling is value-oracled, unlike a perplexity bucket.
    *
    * Scale shape: the tercile table is |langs| rows (one small
    * aggregate), broadcast back over the corpus scan; labeling is a
    * pure map. The corpus never shuffles. */
  def qualityTerciles(spark: SparkSession, dir: String): DataFrame = {
    val q = lit(1.0) - TextOps.stopRatio(col("text"))
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), q.as("q"))
    val bands = docs.groupBy(col("lang")).agg(
      expr("percentile(q, 0.3333333333333333)").as("p33"),
      expr("percentile(q, 0.6666666666666666)").as("p66"))
    docs.join(broadcast(bands), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("q"),
        when(col("q") > col("p66"), "head")
          .when(col("q") > col("p33"), "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  /** Shard count for [[shuffleShards]] — fixed here; in production it
    * scales with the corpus (one shard per output file), keeping
    * per-shard volume constant. */
  val NumShards = 16

  /** Cross-split leakage audit: near-duplicate pairs whose members
    * landed in DIFFERENT train/val/test splits — the QA query run after
    * splitting, because a validation doc with a near-dup twin in train
    * silently inflates eval. The content-hash split (`splitHash`) makes
    * byte-IDENTICAL duplicates split together by construction; NEAR-dups
    * (one token off) can still cross — exactly what this measures.
    * Output: the (split_a, split_b) pair-count matrix with a `leaked`
    * flag on off-diagonal cells.
    *
    * Scale shape: pair discovery IS the oracled PPJoin plan
    * (`DedupOps.ngramJaccard` — one corpus scan, prefix-filtered
    * candidates); split labels are a narrow md5 map over the corpus; the
    * pair set (≪ corpus) drives two keyed joins against the labels, and
    * the final aggregate is ≤ 9 rows. Nothing here adds a corpus-sized
    * shuffle beyond what the dedup pass already paid. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.ngramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val splits = SamplingOps.splitHash(spark, dir)
      .select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("split_a") =!= col("split_b")).as("leaked"))
      .orderBy("split_a", "split_b")
  }

  /** Per-source corpus datasheet — the one-table "data card" summary a
    * dataset release ships (Gebru et al., Datasheets for Datasets):
    * volume (docs/tokens/chars), language spread, English share, token
    * length envelope, and the within-source exact-duplicate load. One
    * wide row per source, every figure an exact integer or a single
    * division of exact integers → fully value-oracled.
    *
    * Scale shape: two map-side-combinable aggregates — the per-source
    * rollup and a (source, text) duplicate count folded to per-source —
    * joined on the |sources|-row key. The corpus is scanned once per
    * aggregate and never shuffled wider than its composite keys. */
  def corpusDatasheet(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("lang"), col("text"),
        size(split(col("text"), " ")).as("n_tok"),
        length(col("text")).as("n_ch"))
    val dups = docs.groupBy(col("source"), col("text"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_texts"),
        coalesce(sum(when(col("c") >= 2, col("c"))), lit(0L)).as("n_dup_docs"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).cast(IntegerType).as("n_langs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(col("n_tok").cast(LongType)).as("total_tokens"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_ch").cast(LongType)).as("total_chars"))
      .join(dups, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        (dbl(col("n_en")) / col("n_docs")).as("pct_en"),
        col("total_tokens"),
        (dbl(col("total_tokens")) / col("n_docs")).as("mean_tokens"),
        col("min_tokens"), col("max_tokens"), col("total_chars"),
        col("n_dup_texts"), col("n_dup_docs"))
      .orderBy("source")
  }

  /** Cluster-respecting train/val/test split — the constructive FIX for
    * what [[splitLeakage]] measures: a content-hash split puts two
    * NEAR-duplicates (one token apart → different md5) on opposite
    * sides, leaking train data into eval. Here every near-dup cluster
    * is assigned as a UNIT (split derived from md5 of its component
    * label — the same content-hash currency, so the whole assignment
    * stays value-oracled), and unclustered documents keep the plain
    * content-hash rule ([[SamplingOps.splitHash]]). Cross-split near-dup
    * pairs are impossible by construction — [[clusterSplitGate]] pins
    * that per round.
    *
    * Scale shape: the cluster table is a vanishing fraction of the
    * corpus, so the assignment join broadcasts; everything else is the
    * narrow per-row hash the plain split already pays. */
  def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val clusters = ClusterOps.nearDupClusters(spark, dir)
    val clusterBucket =
      conv(substring(md5(concat(lit("c:"), col("cluster_id").cast(StringType))),
        1, 4), 16, 10).cast(IntegerType) % 100
    Tables(spark, dir, "documents")
      .select(col("doc_id"), SamplingOps.splitBucket.as("own_bucket"))
      .join(broadcast(clusters), Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("cluster_id").isNotNull.as("clustered"),
        when(col("cluster_id").isNotNull, SamplingOps.splitOf(clusterBucket))
          .otherwise(SamplingOps.splitOf(col("own_bucket"))).as("split"))
      .orderBy("doc_id")
  }

  /** 1-row gate: under [[clusterSplit]] no verified near-dup pair may
    * cross splits (under the plain hash split, [[splitLeakage]] shows
    * they do). n_docs/n_pairs anchor the oracle; cross_pairs is pinned
    * 0 and passes true. */
  def clusterSplitGate(spark: SparkSession, dir: String): DataFrame = {
    val splits = clusterSplit(spark, dir).select(col("doc_id"), col("split"))
    val pairs = DedupOps.ngramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
    val nDocs = Tables(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L)),
          lit(0L)).as("cross_pairs"))
      .crossJoin(broadcast(nDocs))
      .select(col("n_docs"), col("n_pairs"), col("cross_pairs"),
        (col("cross_pairs") === 0L).as("passes"))
  }

  /** Deterministic global shuffle for training-order export: every
    * document gets a (shard, position) from a seeded content-independent
    * id hash — the reproducible "shuffle once, write sharded" step every
    * trainer needs so a restarted job reads the identical byte order.
    * Hashing doc_id (not text) keeps duplicate texts in DIFFERENT
    * positions — a shuffle must separate copies, the opposite concern of
    * the sampling ops' content hashing.
    *
    * Scale shape: one exchange on the shard key; the per-shard position
    * window orders |corpus|/[[NumShards]] rows per reducer, and shard
    * count grows with the corpus in production, so per-reducer volume is
    * flat — this is exactly how a 1000-executor job writes a shuffled
    * 100 TB corpus without any global sort. */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast(StringType), lit(":graft-shuffle-42")))
    val shard = (conv(substring(col("h"), 1, 4), 16, 10).cast(IntegerType) % NumShards)
    val wp = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(wp).cast(IntegerType))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // DSIR-style domain-importance weighting (hashed n-gram features)
  // ------------------------------------------------------------------

  /** Fixed-point scale for the DSIR affinity score (parts-per-million).
    * Int64 headroom: a bucket weight ≤ 10⁶ and per-doc sums of
    * n_bigrams·w stay far under 2⁶³ for any feasible document; the
    * bucket-table numerator 10⁶·(ct+1) would only approach overflow at
    * ~10¹³ occurrences per SINGLE bucket — at that point the counts
    * table moves to DECIMAL, same plan. */
  val DsirScale = 1000000L

  /** The target-domain rule for the synthetic corpus: lang = 'en' stands
    * in for "the high-quality domain we want more of" (the Wikipedia/
    * books side of the DSIR setup). One constant shared with the oracle
    * SQL so the rule cannot drift. */
  val DsirTargetLang = "en"

  /** Hashed-bigram importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS '23): score every document by how target-domain-like its
    * hashed bigram features are, using two bucket count tables — target
    * occurrences ct_b and raw-corpus occurrences cq_b over the same
    * [[TextOps.ClassifierBuckets]] feature space (the hashing trick,
    * md5-bucketed like the quality classifier so both engines agree
    * bit-for-bit).
    *
    * The per-bucket weight here is the INTEGER-EXACT affinity
    * w_b = ⌊Scale·(ct_b+1) / (ct_b+cq_b+2)⌋ — the add-one-smoothed
    * probability that a bucket-b occurrence came from the target — and a
    * document's score is the occurrence-weighted mean of its buckets'
    * affinities (ppm). This is the monotone fixed-point stand-in for the
    * paper's log-likelihood-ratio sum: log(p̂/q̂) bucket weights drop into
    * the SAME broadcast-join plan but libm logs land rows-only; the
    * affinity form keeps the whole operator value-oracled.
    *
    * Scale shape: fit aggregates bigram occurrences STRAIGHT into the
    * ≤4096-row bucket table (map-side combinable — a hot bucket
    * collapses per partition before the wire) and pins it; scoring
    * joins each occurrence against the broadcast weight table and
    * rolls up per doc. No shuffle ever keys on raw text.
    * Statistics-then-score is inherently two phases, so the bigram-hash
    * pass runs once per phase — twice total; a production run
    * materializes the fitted tables ([[dsirFit]]) once per corpus
    * snapshot and pays the fit exactly once, and the streaming scorer
    * (graft.streaming.StreamingDsirScore) reuses them per micro-batch.
    * Documents too short for a bigram pass through at the
    * corpus-prior score (they carry no domain evidence either way) —
    * explicitly, not dropped. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirScored(spark, dir)
      .select(col("doc_id"), col("n_bigrams"), col("sum_w"), col("score_ppm"))
      .orderBy("doc_id")

  /** The selection half of DSIR: keep documents scoring ABOVE the
    * corpus-prior affinity — "more target-like than the average raw
    * document", the deterministic top-group form of the paper's
    * importance resampling (rank-then-cut needs no RNG, so a re-run
    * selects the identical corpus). Emits the kept docs with their
    * lang so the domain shift is visible in the output itself. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirScored(spark, dir)
      .filter(col("score_ppm") > col("prior_ppm"))
      .select(col("doc_id"), col("lang"), col("score_ppm"))
      .orderBy("doc_id")

  /** Per-occurrence hashed-bigram bucket stream of a (doc_id, lang,
    * text) doc set — the ONE feature definition every DSIR phase (fit,
    * batch score, streaming score) derives from. */
  private def bigramBuckets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => TextOps.featBucket(array_join(slice(col("t"), i + 1, lit(2)), " ")))).as("bucket"))

  /** Fit the scorer: ONE hash pass over the corpus straight into the
    * ≤4096-row bucket table (fully map-side combinable — no per-doc
    * intermediate), eagerly pinned so the weight table and the prior
    * both read it without re-traversing the corpus. Returns the fitted
    * artifacts a serving path freezes: the weight table and the 1-row
    * prior. */
  def dsirFit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Tables.parallel: the bigram hash pass is pure CPU over a
    // single-row-group scan task at test SFs (no-op on production lakes)
    val bt = bigramBuckets(Tables.parallel(spark, dir, "documents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cq"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"))
      .localCheckpoint()
    val w = bt.select(col("bucket"),
      expr(s"($DsirScale * (ct + 1)) div (ct + cq + 2)").as("w"))
    val prior = bt.agg(
      expr(s"((sum(ct) + 1) * $DsirScale) div (sum(ct) + sum(cq) + 2)").as("prior_ppm"))
    (w, prior)
  }

  /** Score a (doc_id, lang, text) doc set with FITTED weight/prior
    * tables — per-document given the broadcasts (no cross-doc state),
    * shared by the batch operators and the streaming twin
    * (graft.streaming.StreamingDsirScore), so micro-batch composition
    * preserves semantics exactly. One hash pass: occurrences join the
    * broadcast weights, one doc_id rollup, explicit passthrough rows at
    * the prior for evidence-free docs. */
  def dsirScoreAgainst(docs: DataFrame, w: DataFrame, prior: DataFrame): DataFrame = {
    // LEFT join: a bucket the fit corpus never populated still scores —
    // at the add-one-smoothed empty-bucket affinity ⌊S·(0+1)/(0+0+2)⌋ =
    // S/2, exactly what the weight formula yields at ct = cq = 0. An
    // inner join would silently DROP novel-vocabulary occurrences: the
    // streaming deployment scores new data against a frozen fit, where
    // unseen buckets are routine, and a doc of entirely novel bigrams
    // must land at the smoothed neutral, not inherit the corpus prior
    // with an empty evidence count. (Batch paths score the fit corpus
    // itself, so every bucket exists there — rows unchanged.)
    val scored = bigramBuckets(docs)
      .join(broadcast(w), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w"), lit(DsirScale / 2))).as("sum_w"),
        count(lit(1)).cast(IntegerType).as("n_bigrams"))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("sum_w"), lit(0L)).as("sum_w"),
        coalesce(expr("sum_w div n_bigrams"), col("prior_ppm")).as("score_ppm"),
        col("prior_ppm"))
  }

  /** Shared scoring core: fit, then score the same corpus — statistics-
    * then-apply is inherently two hash passes, one per phase; a
    * production run materializes the fitted tables once and pays the
    * fit exactly once per corpus snapshot. */
  private def dsirScored(spark: SparkSession, dir: String): DataFrame = {
    val (w, prior) = dsirFit(spark, dir)
    dsirScoreAgainst(Tables.parallel(spark, dir, "documents"), w, prior)
  }

  /** The ordered rule chain behind [[filterFunnel]]: (name, predicate)
    * over a document row. Reuses the engine's shared currencies — the
    * stopword floor IS [[TextOps.stopRatio]] ≥ 0.1 (the kappa/fleiss
    * gold rule) and the punctuation ceiling is the fleiss third
    * rater's expression — so the funnel audits the rules the quality
    * family actually applies. */
  private def funnelRules: Seq[(String, Column)] = {
    val nTok = size(split(col("text"), " "))
    Seq(
      "len_bounds" -> nTok.between(3, 10000),
      "stopword_floor" -> (TextOps.stopRatio(col("text")) >= 0.1),
      "punct_ceiling" ->
        ((length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
          / length(col("text"))) < 0.1),
      "digit_ceiling" ->
        ((length(regexp_replace(col("text"), "[^0-9]", ""))
          / length(col("text"))) < 0.3))
  }

  /** Filter-funnel attrition: for each rule in the C4/Gopher-style
    * chain, how many documents pass it ALONE, how many survive the
    * prefix up to it, and how many it is the SOLE killer of (the
    * "what happens if I drop this rule" column) — the ablation table a
    * curation run reads before shipping a rule change. ONE scan: every
    * readout is a conditional sum over the per-row rule booleans,
    * unpivoted to a 4-row report. Exact integers throughout. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelReport(funnelCounts(Tables(spark, dir, "documents")))

  /** The funnel's 1-row conditional-sum aggregate over a document
    * relation — a plain sum, so the streaming twin maintains it as a
    * complete-mode streaming aggregation. */
  private[graft] def funnelCounts(docs: DataFrame): DataFrame = {
    val rules = funnelRules
    val cnt = (c: Column) => sum(when(c, 1L).otherwise(0L))
    val aggs = count(lit(1)).as("n_docs") +:
      rules.zipWithIndex.flatMap { case ((_, b), i) =>
        val prefix = rules.take(i + 1).map(_._2).reduce(_ && _)
        val others = (rules.take(i) ++ rules.drop(i + 1)).map(_._2).reduce(_ && _)
        Seq(cnt(b).as(s"p$i"), cnt(prefix).as(s"s$i"),
          cnt(!b && others).as(s"k$i"))
      }
    docs.agg(aggs.head, aggs.tail: _*)
  }

  /** Unpivot the counts row to the 4-row report (shared finishing
    * step, batch and streaming). */
  private[graft] def funnelReport(counts: DataFrame): DataFrame = {
    val rules = funnelRules
    val stackExpr = s"stack(${rules.length}, " +
      rules.zipWithIndex.map { case ((name, _), i) =>
        s"${i + 1}, '$name', p$i, s$i, k$i"
      }.mkString(", ") +
      ") as (stage, rule, n_pass_rule, n_surviving, n_sole_kill)"
    counts
      .select(col("n_docs"), expr(stackExpr))
      .select(col("stage").cast(IntegerType), col("rule"), col("n_docs"),
        col("n_pass_rule"), col("n_surviving"), col("n_sole_kill"))
      .orderBy("stage")
  }

  /** Mass-weighted length percentiles per source: where the corpus
    * VOLUME sits, not where the documents sit — the count-median length
    * and the char-mass-weighted median/p90 side by side. A source whose
    * typical document is 200 chars can still spend most of its token
    * budget inside 10k-char documents; mixture and packing decisions
    * follow the mass column, dedup/quality ones the count column.
    *
    * Mechanism: the discPercentiles frequency-table core with a WEIGHT
    * column — per-(source, length) exact int64 char masses, running
    * counts for BOTH measures via [[StatsOps.withRunningCount]]'s
    * range-partitioned prefix sums, cume-dist as one division each, and
    * `min value with cd ≥ p` per percentile. Fully hash-oracled.
    *
    * Scale shape: one map-side-combinable composite-key aggregate, two
    * range-partitioned prefix-sum passes over the distinct-length
    * table, a broadcast totals join, one |sources|-row rollup. */
  def massWeightedLength(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val freq = Tables(spark, dir, "documents")
      .groupBy(col("source"), col("n_chars").as("value"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("w"))
    val run = StatsOps.withRunningCount(
      StatsOps.withRunningCount(freq, Seq("source"), "value", "cnt", "rc"),
      Seq("source"), "value", "w", "rw")
    val totals = freq.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_docs"), sum(col("w")).as("total_chars"))
    run.join(broadcast(totals), Seq("source"))
      .withColumn("cd_docs", dbl(col("rc")) / col("n_docs"))
      .withColumn("cd_mass", dbl(col("rw")) / col("total_chars"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("total_chars")).as("total_chars"),
        min(when(col("cd_docs") >= 0.5, col("value"))).as("p50_docs"),
        min(when(col("cd_mass") >= 0.5, col("value"))).as("p50_mass"),
        min(when(col("cd_mass") >= 0.9, col("value"))).as("p90_mass"))
      .orderBy("source")
  }

  /** Source-concentration audit: how unevenly the corpus mass (chars) is
    * spread across sources — the datasheet companion a mixture designer
    * reads before setting temperature weights. One row: Gini coefficient
    * over the per-source char masses (0 = uniform, (n−1)/n = one source
    * owns everything), Herfindahl–Hirschman index Σpᵢ², and the largest
    * source's share.
    *
    * Determinism: the per-source masses are exact int64 sums; Gini rides
    * the sorted-weights identity G = (2·Σ i·wᵢ − (n+1)·ΣW) / (n·ΣW) with
    * an exact INTEGER numerator (ranks ascending by (mass, source)), and
    * each of gini/hhi/top_share is a fixed 1-row IEEE tree over exact
    * integers — bit-identical in DuckDB. Overflow headroom: Σ i·w ≤ n·W
    * needs n·W ≤ 2⁶³ (at 100 sources that is ~9e16 chars ≈ 90 TB of
    * text; beyond, masses switch to kilochar units — one literal); the
    * HHI numerator Σw² rides DECIMAL(38,0), exact to 10³⁸.
    *
    * Scale shape: ONE map-side-combinable aggregate collapses the corpus
    * to |sources| rows; the rank window runs over that bounded domain
    * (the windows-over-aggregates rule), and the final fold is a 1-row
    * aggregate. */
  def sourceConcentration(spark: SparkSession, dir: String): DataFrame =
    concentrationOf(Tables(spark, dir, "documents")
      .groupBy(col("source")).agg(sum(col("n_chars")).as("w")))

  private[graft] def concentrationOf(weights: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val ranked = weights.withColumn("i",
      row_number().over(Window.orderBy(col("w"), col("source"))).cast(LongType))
    val folded = ranked.agg(
      count(lit(1)).as("n_sources"),
      sum(col("w")).as("total_chars"),
      sum(col("i") * col("w")).as("iw"),
      // ties on mass break to the lexicographically LAST source — the
      // struct max order, mirrored by the oracle's (w DESC, source DESC)
      max(struct(col("w"), col("source"))).as("top"),
      sum(col("w").cast(DecimalType(38, 0)) * col("w").cast(DecimalType(38, 0)))
        .as("s2"))
    folded.select(
      col("n_sources"), col("total_chars"),
      col("top.source").as("top_source"),
      (dbl(col("top.w")) / dbl(col("total_chars"))).as("top_share"),
      (dbl(lit(2L) * col("iw") - (col("n_sources") + 1L) * col("total_chars"))
        / (dbl(col("n_sources")) * dbl(col("total_chars")))).as("gini"),
      ((dbl(col("s2")) / dbl(col("total_chars"))) / dbl(col("total_chars")))
        .as("hhi"))
  }
}
