package graft.streaming

import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming sample-ratio-mismatch guard — the SRM check is the one
  * experiment readout that must run DURING the experiment (a broken
  * traffic split invalidates everything downstream; finding it at
  * readout time wastes the whole run). Each micro-batch commits its
  * batch-distinct user set to a `batch_id=<epoch>` partition with
  * overwrite semantics (the delta-log shape shared with
  * [[StreamingMvJoin]]: a replayed epoch REPLACES its own commit, so
  * at-least-once delivery cannot double-count), and serving reads the
  * log through the SAME [[graft.ops.EventOps.srmOfUsers]] core the
  * batch guard uses — cross-epoch dedup happens in that core's
  * distinct, so stream ≡ batch is structural, not asserted.
  *
  * Commit size is the batch's distinct users (≪ events); the served
  * χ² touches only the union of those sets. */
object StreamingAbGuard {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.select("user_id").distinct()
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the guard's user log from an event stream (any schema
    * carrying user_id). */
  def guard(events: DataFrame, sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => writeBatch(b, id, sinkDir) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current SRM verdict from the commit log. */
  def readGuard(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.srmOfUsers(spark.read.parquet(sinkDir).select("user_id"))
}
