package graft.streaming

import graft.ops.{Dec2, EventOps, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming group-sequential A/B monitor — the live "stop early, the
  * effect is real" page WHILE the experiment runs, which is the entire
  * reason the O'Brien–Fleming readout exists: a platform that can only
  * compute it retrospectively has already spent the α it was designed
  * to protect. Each serve republishes all looks-to-date z statistics
  * against their OF boundaries.
  *
  * The cuts (t0, t1) are the experiment's PLANNED horizon, fixed at
  * design time (in the retrospective batch op they are measured from
  * the stored events — same arithmetic, same `div` cuts). Once the
  * cuts are fixed, an event's look membership is fixed, so the
  * mergeable commit grain is per-(look, user) DECIMAL partial sums:
  * each micro-batch overwrites its `batch_id=<epoch>` partition (a
  * replayed epoch replaces its commit — the [[StreamingWelch]]
  * delta-log shape), and serving re-groups the log by (look, user)
  * — decimal addition is exact and order-free, so ANY epoch slicing
  * reassembles the identical per-look totals — before handing the
  * relation to the SAME [[graft.ops.EventOps.sequentialReadout]]
  * moment-and-z tree the batch monitor uses. Stream ≡ batch is
  * structural: one look predicate, one variance seam, one z tree.
  *
  * State is bounded by SeqLooks × |users| rows across the log — the
  * fan-out is a constant K = 5, not data-sized. */
object StreamingSequential {

  /** The per-batch committer — public so replay behavior is testable.
    * Rides [[graft.ops.EventOps.perUserLookOf]], the batch monitor's
    * own first aggregate, with the planned cuts attached as literals. */
  def writeBatch(batch: DataFrame, batchId: Long, t0: Long, t1: Long,
                 sinkDir: String): Unit =
    EventOps.perUserLookOf(batch.select(
        col("user_id"), dec2(col("value")).as("v"),
        unix_micros(col("ts")).as("us"),
        lit(t0).as("t0"), lit(t1).as("t1")))
      .withColumnRenamed("y", "ypart")
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the look log from an event stream ((user_id, ts, value)
    * schema suffices) under the planned [t0, t1] µs horizon. */
  def maintain(events: DataFrame, t0: Long, t1: Long,
               sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        writeBatch(b, id, t0, t1, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current looks-to-date monitor from the look log. */
  def readMonitor(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.sequentialReadout(
      spark.read.parquet(sinkDir)
        .groupBy(col("look"), col("user_id"))
        .agg(sum(col("ypart")).cast(Dec2).as("y")))
}
