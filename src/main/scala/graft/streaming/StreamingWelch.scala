package graft.streaming

import graft.ops.{EventOps, Dec2, dec2}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Welch t — the live significance readout while the
  * experiment runs. Per-user totals are NOT mergeable as squared
  * moments (a user spanning epochs would contribute (a² + b²), not
  * (a+b)²), so the commit grain is the thing that IS mergeable: each
  * micro-batch writes its per-user DECIMAL partial sums to a
  * `batch_id=<epoch>` partition (overwrite — a replayed epoch replaces
  * its commit, the [[StreamingMvJoin]] delta-log shape), and serving
  * re-groups the log by user (decimal addition is exact and
  * order-free, so ANY epoch slicing of a user's events reassembles the
  * identical total) before handing the per-user relation to the SAME
  * [[graft.ops.EventOps.welchOfPerUser]] tail the batch readout uses.
  * Stream ≡ batch is structural: one moment definition, one t tree. */
object StreamingWelch {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).as("ypart"))
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the moment log from an event stream ((user_id, value)
    * schema suffices). */
  def maintain(events: DataFrame, sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => writeBatch(b, id, sinkDir) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current Welch readout from the moment log. */
  def readWelch(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.welchOfPerUser(
      spark.read.parquet(sinkDir)
        .groupBy(col("user_id"))
        .agg(sum(col("ypart")).cast(Dec2).as("y")))
}
