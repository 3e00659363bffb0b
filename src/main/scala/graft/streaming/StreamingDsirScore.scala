package graft.streaming

import graft.ops.CurationOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming DSIR scoring: an unbounded stream of incoming documents
  * scored for target-domain affinity against the FROZEN fitted tables
  * (`CurationOps.dsirFit`'s ≤4096-row weight table + 1-row prior) — the
  * ingestion-time form of the batch `CurationOps.dsirWeights`, for
  * pipelines that tag domain relevance as documents land instead of
  * sweeping the lake afterwards. This is exactly how DSIR deploys: the
  * importance weights are fitted ONCE from a corpus/target snapshot,
  * then applied as a stateless scorer over new data.
  *
  * Scoring is per-document given the broadcast tables (no cross-doc
  * state), so each micro-batch runs the exact batch plan
  * (`dsirScoreAgainst`) via `foreachBatch`; stream-vs-batch agreement is
  * pinned by spec. Sink discipline (same as StreamingDecontaminate):
  * each epoch lands in its own `batch_id=<epoch>` partition with
  * overwrite semantics, so a replayed batch REPLACES its own output, and
  * the checkpoint resumes a restarted query past processed files. */
object StreamingDsirScore {

  /** The per-batch scorer — public so replay behavior is testable. */
  def writeBatch(
      weights: DataFrame, prior: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String): Unit =
    CurationOps.dsirScoreAgainst(batch, weights, prior)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Score a document stream ((doc_id, lang, text) schema) against the
    * fitted weight/prior tables into an idempotent partitioned sink. */
  def serve(
      weights: DataFrame, prior: DataFrame, docStream: DataFrame,
      sinkDir: String): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(weights, prior, batch, id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
