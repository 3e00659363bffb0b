package graft.streaming

import graft.ops.EventOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming pass@k board — the live eval readout while generation
  * samples arrive: per-problem attempt/success counts maintained over
  * the sample stream, the unbiased estimator re-served per epoch. An
  * eval harness watches THIS (is the fleet's pass@10 stabilizing? has a
  * problem collected k samples yet?) rather than re-scanning completed
  * runs.
  *
  * Unlike the Welch/FDR twins, the state here is counts — (n, c) per
  * problem is an exact integer sum, mergeable across ANY epoch
  * slicing — so the commit log stores per-problem integer partials per
  * `batch_id` (overwrite: a replayed epoch replaces its commit) and
  * serving re-sums the log before handing the (problem_id, n, c)
  * relation to the SAME [[graft.ops.EventOps.passAtKOf]] product tree
  * the batch entry runs. Stream ≡ batch is structural. */
object StreamingPassAtK {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(batch: DataFrame, batchId: Long, sinkDir: String): Unit =
    batch.groupBy(col("user_id").as("problem_id"))
      .agg(count(lit(1)).as("npart"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cpart"))
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the count log from a sample stream ((user_id, event_type)
    * schema suffices). */
  def maintain(events: DataFrame, sinkDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => writeBatch(b, id, sinkDir) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current pass@k board from the count log. */
  def readPassAtK(spark: SparkSession, sinkDir: String): DataFrame =
    EventOps.passAtKOf(
      spark.read.parquet(sinkDir)
        .groupBy(col("problem_id"))
        .agg(sum(col("npart")).as("n"), sum(col("cpart")).as("c")))
}
