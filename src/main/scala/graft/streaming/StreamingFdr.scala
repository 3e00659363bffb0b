package graft.streaming

import graft.ops.{EventOps, Dec2, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Benjamini–Hochberg monitor — the live multi-metric
  * significance board while the experiment runs: every epoch, the
  * per-event-type Welch z family re-ranks and the BH step-up
  * recomputes which metrics currently clear the FDR bar. The batch
  * entry corrects ONE readout for metric multiplicity; this corrects
  * the readout a platform actually watches — all metrics, continuously.
  *
  * Same commit grain as [[StreamingWelch]], keyed: per-user totals are
  * not mergeable as squared moments across epochs, so each micro-batch
  * overwrites a `batch_id=<epoch>` partition of per-(event_type, user)
  * DECIMAL partial sums (replayed epoch replaces its commit), and
  * serving re-groups the log — decimal addition is exact and
  * order-free — before handing the keyed relation to the SAME
  * [[graft.ops.EventOps.fdrOfPerUser]] tail the batch entry runs: one
  * moment seam, one boundary-literal table, twin drift impossible. */
object StreamingFdr {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.groupBy(col("event_type"), col("user_id"))
      .agg(sum(dec2(col("value"))).as("ypart"))
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the keyed moment log from an event stream ((event_type,
    * user_id, value) schema suffices). */
  def maintain(events: DataFrame, sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => writeBatch(b, id, sinkDir) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current BH board from the moment log. */
  def readFdr(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.fdrOfPerUser(
      spark.read.parquet(sinkDir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("ypart")).cast(Dec2).as("y")))
}
