package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming disparate-impact monitor: the four-fifths audit of
  * `TextOps.classifierDisparity` maintained INCREMENTALLY over a
  * document stream — the live fairness view of the quality filter as a
  * crawl arrives (a language whose impact ratio decays under 0.8 as new
  * shards land is being silently suppressed by the filter; that is a
  * downstream model-capability bug, and this is the monitor that pages
  * before an epoch of biased data ships).
  *
  * The audit's entire state is one integer (n, n_keep) row per group
  * over the batch op's OWN decision expression
  * (`TextOps.classifierKeep` / `disparityCounts` — one definition, twin
  * drift impossible), so the exact aggregate runs as a complete-mode
  * streaming aggregation; each epoch the shared tail
  * (`disparityReport`) republishes rates, max-rate ratios and flags.
  *
  * Sink discipline: current-state artifact — overwrite `report/` whole
  * per epoch, checkpointed so a replayed epoch rewrites the same counts
  * rather than double-counting. */
object StreamingDisparity {

  /** The per-epoch publish — public so replay behavior is testable. */
  def writeReport(counts: DataFrame, sinkDir: String): Unit =
    TextOps.disparityReport(counts)
      .write.mode("overwrite").parquet(s"$sinkDir/report")

  /** Monitor a document stream ((…, lang, text) schema): complete-mode
    * per-language keep counts → report overwritten per epoch. */
  def serve(docStream: DataFrame, sinkDir: String): StreamingQuery =
    TextOps.disparityCounts(docStream.select(
      col("lang").as("group"), TextOps.classifierKeep(col("text")).as("keep")))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: DataFrame, _: Long) =>
        writeReport(counts, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
