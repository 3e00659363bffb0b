package graft.streaming

import graft.ops.PretrainOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming decontamination: an unbounded stream of incoming documents
  * checked against the STATIC benchmark n-gram set — the ingestion-time
  * form of the batch `PretrainOps.decontaminate`, for pipelines that gate
  * documents as they land instead of sweeping the lake afterwards.
  *
  * The check is per-document (no cross-document state), so each
  * micro-batch runs the exact batch plan via `foreachBatch`: explode
  * distinct n-grams, broadcast-join the (small, fixed) benchmark gram
  * set, aggregate per doc. Stream-vs-batch agreement is pinned by spec.
  * At scale the benchmark set is an eval suite — KBs to MBs — so the
  * broadcast is cheap and the stream side never shuffles wider than its
  * own per-batch doc-id aggregation.
  *
  * Sink discipline (same as ForeachBatchUpsert): each epoch lands in its
  * own `batch_id=<epoch>` partition with overwrite semantics and the
  * query checkpoints its progress, so a replayed batch REPLACES its own
  * output instead of appending duplicates, and a restarted query resumes
  * from the checkpoint instead of re-gating already-processed files. */
object StreamingDecontaminate {

  /** The per-batch gate — public so replay behavior is testable. */
  def writeBatch(
      benchGrams: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String, k: Int = PretrainOps.ContamGram): Unit =
    PretrainOps.checkAgainst(batch, benchGrams, k)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Gate a document stream ((doc_id, text) schema) against a benchmark
    * gram set into an idempotent partitioned parquet sink. */
  def serve(
      benchGrams: DataFrame, docStream: DataFrame,
      sinkDir: String, k: Int = PretrainOps.ContamGram): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(benchGrams, batch, id, sinkDir, k)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** The surgical twin of the gate: each epoch's documents land
    * REDACTED (covered spans excised, everything else verbatim — the
    * `PretrainOps.redactAgainst` core) instead of merely flagged.
    * Redaction is per-document like the boolean check, so micro-batch
    * composition and the batch_id=<epoch> replace-on-replay sink
    * discipline carry over unchanged. */
  def writeRedactBatch(
      benchGrams: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String, k: Int = PretrainOps.ContamGram): Unit =
    PretrainOps.redactAgainst(batch, benchGrams, k)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Redact a document stream against a benchmark gram set — the
    * ingestion-time form of `PretrainOps.decontaminateRedact`. */
  def serveRedact(
      benchGrams: DataFrame, docStream: DataFrame,
      sinkDir: String, k: Int = PretrainOps.ContamGram): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeRedactBatch(benchGrams, batch, id, sinkDir, k)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** The FUZZY twin of the gate: each epoch's documents are checked for
    * near-duplicate (trigram Jaccard ≥ 1/2) matches against the static
    * benchmark shingle posting (`PretrainOps.benchShinglePosting`) —
    * ingestion-time paraphrase-leak detection. The check is
    * per-document like the exact gate, so the same micro-batch
    * composition and batch_id=<epoch> replace-on-replay sink discipline
    * carry over unchanged. */
  def writeFuzzyBatch(
      benchPosting: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String): Unit =
    PretrainOps.fuzzyCheckAgainst(batch, benchPosting)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Fuzzy-gate a document stream against a benchmark shingle posting —
    * the ingestion-time form of `PretrainOps.decontaminateFuzzy`. */
  def serveFuzzy(
      benchPosting: DataFrame, docStream: DataFrame,
      sinkDir: String): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeFuzzyBatch(benchPosting, batch, id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
