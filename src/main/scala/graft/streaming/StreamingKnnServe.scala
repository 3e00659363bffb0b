package graft.streaming

import graft.ops.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving: an unbounded stream of query vectors probes the
  * MATERIALIZED kNN index (`SimilarityOps.buildKnnIndex`) — the serving
  * half of the write-once / probe-many shape, for pipelines that answer
  * similarity queries as they arrive instead of joining the whole corpus.
  *
  * The probe is per-query (no cross-query state), so each micro-batch
  * runs the exact batch probe plan (`SimilarityOps.probeIndex`) via
  * `foreachBatch`: signature-hash the batch (narrow), join the index on
  * (table, bucket) — AQE broadcasts the small batch side — and rank
  * per-query top-k. Stream-vs-batch agreement is structural and pinned
  * by spec. At 100 TB the index is the big bucketed table and each batch
  * touches only its probed buckets.
  *
  * Sink discipline (same as ForeachBatchUpsert/StreamingDecontaminate):
  * each epoch lands in its own `batch_id=<epoch>` partition with
  * overwrite semantics and the query checkpoints progress, so replayed
  * batches REPLACE their own output instead of appending duplicates. */
object StreamingKnnServe {

  /** The per-batch probe — public so replay behavior is testable. */
  def writeBatch(index: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String, k: Int = 5): Unit =
    SimilarityOps.probeIndex(index, batch, k)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Serve a query-vector stream ((q_id, v) schema, v = double array)
    * against a materialized index into an idempotent partitioned sink. */
  def serve(index: DataFrame, queryStream: DataFrame,
      sinkDir: String, k: Int = 5): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(index, batch, id, sinkDir, k)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
