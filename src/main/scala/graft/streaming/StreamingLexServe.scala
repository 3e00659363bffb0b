package graft.streaming

import graft.ops.RetrievalOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming BM25 serving: an unbounded stream of (q_id, query) text
  * queries probes the MATERIALIZED lexical index
  * ([[RetrievalOps.buildLexIndex]]) — the lexical sibling of
  * [[StreamingKnnServe]], completing batch / indexed / streaming
  * symmetry across both retrieval modalities.
  *
  * Per micro-batch the (small, bounded) query workload is collected to
  * the driver — queries are a serving workload, not data — and the exact
  * batch probe plan runs (`bm25FromIndex`): term-pruned tf scan,
  * broadcast df/idf, bounded top-k. Stream ≡ batch is structural.
  *
  * Sink discipline (the ForeachBatchUpsert convention): each epoch lands
  * in its own `batch_id=<epoch>` partition with overwrite semantics and
  * checkpointed progress, so at-least-once replays REPLACE their own
  * output instead of appending duplicates. */
object StreamingLexServe {

  /** The per-batch probe — public so replay behavior is testable.
    * Empty batches write nothing (no partition, nothing to replace). */
  def writeBatch(indexDir: String, batch: DataFrame, batchId: Long,
      sinkDir: String): Unit = {
    val qs = batch.select("q_id", "query").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toSeq
    if (qs.nonEmpty)
      RetrievalOps.bm25FromIndex(batch.sparkSession, indexDir, qs)
        .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
  }

  /** Serve a (q_id int, query string) stream against a materialized
    * lexical index into an idempotent partitioned sink. */
  def serve(indexDir: String, queryStream: DataFrame,
      sinkDir: String): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(indexDir, batch, id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
