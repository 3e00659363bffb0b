package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus assembly — the composed flow a user of this engine
  * runs to turn a raw document lake into a training corpus:
  *
  *   quality filter → exact dedup (survivors) → near-dup removal
  *   (n-gram Jaccard canonical keep) → benchmark decontamination →
  *   per-source balance cap → language id → content-hash split →
  *   per-shard sequence packing.
  *
  * Every stage is one of the registered operators; the composition stays
  * ONE declarative plan, so Catalyst sees through all of it: the quality
  * filter pushes to the scan, the dedup group-bys and the final packing
  * window are the wide stages, and the language/split columns are narrow
  * projections on the surviving rows. At 100 TB the stage order is the
  * cost order — cheap row-local filters first shrink the corpus before
  * the shuffling stages, and decontamination runs after dedup so the
  * benchmark-gram join sees the smallest possible corpus.
  *
  * Engine-internal heuristics (langid, near-dup hashes) → rows-only
  * driver check; the invariants (dedup, leakage-free split, filter
  * soundness, decontamination, packing continuity) are pinned by spec. */
object CorpusPipeline {

  /** Per-source contribution cap for the balance stage (see
    * `SamplingOps.capPerSource` — content-hash ranked, deterministic). */
  val SourceCap = 20

  def assemble(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")

    // 1. quality: drop short docs (row-local, pushes to the scan)
    val quality = docs.filter(size(split(col("text"), " ")) >= 5)

    // 2. exact dedup: keep the min-id survivor of each distinct text
    val survivors = quality
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))

    // 3. near-dup removal: of every verified Jaccard≥0.5 pair, the lower
    //    id is canonical — drop the higher. (Pairs are already computed
    //    on the full corpus; restricting to survivors only shrinks it.)
    val nearDupLosers = DedupOps.ngramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val deduped = survivors.join(nearDupLosers, Seq("doc_id"), "left_anti")

    // 4. decontamination: the benchmark subset itself never trains, and
    //    neither does anything sharing an n-gram with it. The gram check
    //    runs on the DEDUP SURVIVORS only (checkAgainst, not the
    //    whole-corpus operator) — the expensive explode sees the smallest
    //    possible corpus, which is the point of the stage order.
    val trainCandidates = deduped.filter(col("doc_id") % PretrainOps.BenchMod =!= 0)
    val bench = PretrainOps.benchmarkGrams(
      docs.filter(col("doc_id") % PretrainOps.BenchMod === 0))
    val contaminated = PretrainOps.checkAgainst(trainCandidates, bench)
      .filter(col("contaminated")).select(col("doc_id"))
    val clean = trainCandidates.join(contaminated, Seq("doc_id"), "left_anti")

    // 5. balance: no shard over-contributes — the content-hash-ranked
    //    per-source cap runs on the CLEAN survivors (after the corpus has
    //    already shrunk), so the rank window is as small as it can be
    val sources = docs.select(col("doc_id"), col("source"))
    val withSource = clean.join(sources, Seq("doc_id"))
    val capped = SamplingOps.capPerSourceOf(withSource, SourceCap)
      .select(col("doc_id"))
    val balanced = withSource.join(capped, Seq("doc_id"), "left_semi")

    // 6. narrow annotations on what remains: language id + split + stats
    val langs = TextOps.langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val splits = SamplingOps.splitHash(spark, dir).select(col("doc_id"), col("split"))
    val annotated = balanced
      .join(langs, Seq("doc_id"))
      .join(splits, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("pred_lang"), col("split"),
        size(split(col("text"), " ")).as("n_tokens"))

    // 7. pack the SURVIVING train-split docs into fixed-length sequences
    //    per source shard (eval splits are served unpacked → null seq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val trainTokens = when(col("split") === "train", col("n_tokens")).otherwise(0)
    val cum = sum(trainTokens).over(w)
    annotated
      .withColumn("seq_first",
        when(col("split") === "train",
          ((cum - col("n_tokens")) / PretrainOps.SeqLen)
            .cast(org.apache.spark.sql.types.IntegerType)))
      .select(col("doc_id"), col("source"), col("pred_lang"), col("split"),
        col("n_tokens"), col("seq_first"))
      .orderBy("doc_id")
  }

  /** Value-checked gate over the assembled corpus (the recall-gate
    * pattern — the pipeline's exact survivor set is engine-internal, its
    * CONTRACT is not): output ids unique and ⊆ input, no source over its
    * [[SourceCap]], splits inside the {train,val,test} domain, every
    * survivor at or above the 5-token quality floor, train docs carry a
    * non-negative packed-sequence id and eval docs none. The oracle
    * recomputes n_docs_in/cap from the input and expects passes = true. */
  def assembleGate(spark: SparkSession, dir: String): DataFrame = {
    // three independent check subplans (row bounds, per-source cap,
    // stray ids) read the assembled corpus; persist it or the whole
    // multi-shuffle assembly subtree re-executes once per subplan
    // (ReuseExchange only dedups canonically-identical exchanges, not
    // the windows and joins above them). Bounded: ≤ |documents| rows.
    val out = assemble(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowChecks = out.agg(
      count(lit(1)).as("n_out"),
      countDistinct(col("doc_id")).as("n_ids"),
      sum(when(!col("split").isin("train", "val", "test") ||
        col("n_tokens") < 5 ||
        (col("split") === "train" && (col("seq_first").isNull || col("seq_first") < 0)) ||
        (col("split") =!= "train" && col("seq_first").isNotNull), 1L)
        .otherwise(0L)).as("bad_rows"))
    val capCheck = out.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L)).as("max_per_source"))
    val docs = Tables(spark, dir, "documents")
    val strays = out.select(col("doc_id"))
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_strays"))
    val inCount = docs.agg(count(lit(1)).as("n_docs_in"))
    val gate = inCount.crossJoin(rowChecks).crossJoin(capCheck).crossJoin(strays)
      .select(col("n_docs_in"),
        lit(SourceCap).as("cap"),
        (col("bad_rows") === 0L &&
          col("n_ids") === col("n_out") &&
          col("n_out") > 0L && col("n_out") <= col("n_docs_in") &&
          col("n_strays") === 0L &&
          col("max_per_source") <= SourceCap).as("passes"))
    // materialize the single gate row while the cache is live, then drop
    // the cached assembly — without this every gate invocation in a
    // long-lived session (tests + Verify + bench share one JVM) leaks
    // another cached copy of the corpus for the session lifetime
    val row = gate.collect()
    out.unpersist()
    spark.createDataFrame(java.util.Arrays.asList(row: _*), gate.schema)
  }
}
