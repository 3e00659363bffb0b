package graft.streaming

import graft.ops.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming binary-quantized serving: an unbounded stream of query
  * vectors probes the MATERIALIZED sign-code index
  * (`SimilarityOps.buildBinaryIndex`) — the binary sibling of
  * [[StreamingKnnServe]], for tiers that answer similarity queries as
  * they arrive off the 8-byte-per-vector representation.
  *
  * Each micro-batch packs its query vectors (narrow — the identical
  * signWord expressions the index build ran) and runs the exact batch
  * probe (`SimilarityOps.probeBinaryIndex`): broadcast the packed batch,
  * two xor+popcounts per pair, bounded map-side top-k. No cross-query
  * state, so stream-vs-batch agreement is structural and spec-pinned.
  *
  * Sink discipline (the ForeachBatchUpsert pattern): each epoch lands in
  * its own `batch_id=<epoch>` partition with overwrite semantics and the
  * query checkpoints progress, so replayed batches REPLACE their own
  * output instead of appending duplicates. */
object StreamingBinaryServe {

  /** The per-batch probe — public so replay behavior is testable. */
  def writeBatch(index: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String, k: Int = 10): Unit =
    SimilarityOps.probeBinaryIndex(index, batch, k)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Serve a query-vector stream ((q_id, v) schema, v = double array)
    * against a materialized binary-code index into an idempotent
    * partitioned sink. */
  def serve(index: DataFrame, queryStream: DataFrame,
      sinkDir: String, k: Int = 10): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(index, batch, id, sinkDir, k)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
