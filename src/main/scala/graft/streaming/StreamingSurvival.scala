package graft.streaming

import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming Nelson–Aalen — the churn curve maintained WHILE events
  * arrive. Unlike the Welch moments, the survival primitive is already
  * idempotent-mergeable: a user's span is (min first, max last), and
  * min/max absorb replays and arbitrary epoch slicing without any
  * correction. Each micro-batch commits its per-user span partials to a
  * `batch_id=<epoch>` partition (overwrite — a replayed epoch replaces
  * its own commit, the [[StreamingWelch]] delta-log shape); serving
  * re-groups the log by user (min of firsts, max of lasts reassembles
  * the true span under ANY slicing) and hands the spans to the SAME
  * [[graft.ops.EventOps.hazardOfSpans]] tail the batch readout uses.
  * Stream ≡ batch is structural: one span definition, one hazard fold.
  *
  * Scale note: the log grows one bounded partition per epoch
  * (≤ |users-in-batch| rows); a production deployment compacts it with
  * UpsertOps.compact on the same schedule as any other delta log. */
object StreamingSurvival {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.groupBy(col("user_id"))
      .agg(min(col("ts")).as("f"), max(col("ts")).as("l"))
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the span log from an event stream ((user_id, ts) schema
    * suffices). */
  def maintain(events: DataFrame, sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => writeBatch(b, id, sinkDir) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current Nelson–Aalen table from the span log. */
  def readHazard(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.hazardOfSpans(
      spark.read.parquet(sinkDir)
        .groupBy(col("user_id"))
        .agg(min(col("f")).as("first_ts"), max(col("l")).as("last_ts")))
}
