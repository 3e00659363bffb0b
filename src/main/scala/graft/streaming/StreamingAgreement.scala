package graft.streaming

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming annotation-agreement monitor: Fleiss' kappa and
  * Krippendorff's alpha maintained INCREMENTALLY over a document
  * stream — the live reliability view of the three rule annotators as a
  * crawl arrives (agreement decaying as new shards land means the rater
  * panel no longer measures one construct on the incoming distribution —
  * exactly when auto-labels stop being trustworthy).
  *
  * The metrics' entire state is the 1-row integer sufficient statistic
  * (n, keep_votes, unanimous) over the batch ops' OWN vote expression
  * (`TextOps.raterVoteExpr` / `agreementCounts` — one definition, twin
  * drift impossible); each epoch the shared tails (`agreementReport`)
  * republish both readouts in one row.
  *
  * Sink discipline: current-state artifact — overwrite `report/` whole
  * per epoch, checkpointed so a replayed epoch rewrites the same counts
  * rather than double-counting. */
object StreamingAgreement {

  /** The per-epoch publish — public so replay behavior is testable.
    * The counts row is materialized once (1 row) so the two metric
    * tails inside [[TextOps.agreementReport]] cannot re-run the
    * micro-batch vote scan as differently-pruned branches. */
  def writeReport(counts: DataFrame, sinkDir: String): Unit =
    TextOps.agreementReport(counts.localCheckpoint())
      .write.mode("overwrite").parquet(s"$sinkDir/report")

  /** Monitor a document stream ((…, text) schema): complete-mode vote
    * counts → both agreement readouts overwritten per epoch. */
  def serve(docStream: DataFrame, sinkDir: String): StreamingQuery =
    TextOps.agreementCounts(docStream.select(
      TextOps.raterVoteExpr(col("text")).as("k")))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: DataFrame, _: Long) =>
        writeReport(counts, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
