package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus assembly — the composed flow a user of this engine
  * runs to turn a raw document lake into a training corpus:
  *
  *   quality filter → exact dedup (survivors) → near-dup removal
  *   (n-gram Jaccard canonical keep) → language id → content-hash split.
  *
  * Every stage is one of the registered operators; the composition stays
  * ONE declarative plan, so Catalyst sees through all of it: the quality
  * filter pushes to the scan, the two dedup group-bys are the only wide
  * shuffles, and the language/split columns are narrow projections on the
  * surviving rows. At 100 TB the stage order is the cost order — cheap
  * row-local filters first shrink the corpus before the shuffling stages.
  *
  * Engine-internal heuristics (langid, near-dup hashes) → rows-only
  * driver check; the invariants (dedup, leakage-free split, filter
  * soundness) are pinned by spec. */
object CorpusPipeline {

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

    // 4. narrow annotations on what remains: language id + split + stats
    val langs = TextOps.langId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val splits = SamplingOps.splitHash(spark, dir).select(col("doc_id"), col("split"))
    deduped
      .join(langs, Seq("doc_id"))
      .join(splits, Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("split"),
        size(split(col("text"), " ")).as("n_tokens"))
      .orderBy("doc_id")
  }
}
