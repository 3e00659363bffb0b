package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Idempotent streaming → lake ingestion via `foreachBatch`: each
  * micro-batch lands in its own `batch_id=<epoch>` partition directory
  * with overwrite semantics, so a replayed batch (failure recovery
  * re-delivers the same epoch id with the same data) REPLACES its own
  * output instead of appending a duplicate — exactly-once at the batch
  * grain on top of at-least-once delivery, with no transactional store
  * needed. Readers see the lake as one partitioned table
  * (`batch_id` is a discovered partition column).
  *
  * This is the production sink pattern for the reference's
  * document-append hop (F7) under streaming: the at-rest layout stays
  * plain parquet, and the commit unit is the directory swap. */
object ForeachBatchUpsert {

  /** The per-batch writer — public so recovery/replay behavior is
    * directly testable. */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  def start(stream: DataFrame, outDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((b: DataFrame, id: Long) => writeBatch(b, id, outDir))
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .start()
}
