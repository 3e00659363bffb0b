package graft.streaming

import graft.ops.CurationOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming filter-funnel monitor: the rule-ablation table of
  * `CurationOps.filterFunnel` maintained INCREMENTALLY over a document
  * stream — the live view of which curation rule is killing what as a
  * crawl arrives (a rule whose sole-kill count suddenly spikes is the
  * first sign the incoming distribution moved).
  *
  * The funnel's entire state is ONE row of conditional sums over the
  * batch op's own rule expressions (`CurationOps.funnelCounts` — one
  * definition, twin drift impossible), so the exact aggregate runs as a
  * complete-mode global streaming aggregation; each epoch the shared
  * unpivot (`funnelReport`) republishes the 4-row report.
  *
  * Sink discipline: current-state artifact — overwrite `report/` whole
  * per epoch, checkpointed so a replayed epoch rewrites the same counts
  * rather than double-counting. */
object StreamingFilterFunnel {

  /** The per-epoch publish — public so replay behavior is testable. */
  def writeReport(counts: DataFrame, sinkDir: String): Unit =
    CurationOps.funnelReport(counts)
      .write.mode("overwrite").parquet(s"$sinkDir/report")

  /** Monitor a document stream ((…, text) schema): complete-mode
    * running rule counts → report overwritten per epoch. */
  def serve(docStream: DataFrame, sinkDir: String): StreamingQuery =
    CurationOps.funnelCounts(docStream)
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: DataFrame, _: Long) =>
        writeReport(counts, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
