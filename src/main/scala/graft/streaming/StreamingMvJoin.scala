package graft.streaming

import graft.ops.UpsertOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the join-aggregate MV
  * (`UpsertOps.mvJoinIncremental`'s view): each lineitem micro-batch
  * stream-static joins the orders dimension, partial-aggregates to the
  * MV's mergeable (decimal sum, count) states via the SAME
  * `mvJoinPartial` the batch IVM uses, and commits the partials to its
  * own `batch_id=<epoch>` partition with overwrite semantics — the
  * delta-log shape: a replayed epoch (at-least-once delivery) REPLACES
  * its own commit instead of double-folding into mutable state, so the
  * sink is exactly-once at the batch grain with no transactional store.
  *
  * Serving reads merge the delta log through `mvJoinServe` — decimal
  * partials are exact and order-free, so ANY epoch slicing of the
  * stream serves the identical view (spec pins stream ≡ batch ≡
  * recompute). Read cost grows with the number of commits until a
  * compaction rewrites the log into one partial set — the same
  * `mvJoinServe` call materialized, identical rows by construction
  * (the x_maint_compact economics applied to MV state). */
object StreamingMvJoin {

  /** The per-batch committer — public so replay behavior is testable. */
  def writeBatch(orders: DataFrame, batch: DataFrame, batchId: Long,
      sinkDir: String): Unit =
    UpsertOps.mvJoinPartial(orders, batch)
      .write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")

  /** Maintain the MV from a lineitem stream ((l_orderkey,
    * l_extendedprice) schema) against the static orders dimension. */
  def maintain(orders: DataFrame, liStream: DataFrame,
      sinkDir: String): StreamingQuery =
    liStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        writeBatch(orders, batch, id, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()

  /** Serve the current view from the commit log. */
  def readMv(spark: SparkSession, sinkDir: String): DataFrame =
    UpsertOps.mvJoinServe(spark.read.parquet(sinkDir)
      .select("o_orderpriority", "month", "s", "n"))
}
