package graft.streaming

import graft.ops.SamplingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming split-drift monitor: the χ² report of
  * `SamplingOps.splitDriftChisq` maintained INCREMENTALLY over a
  * document stream — how a live ingestion pipeline watches its
  * train/val split for length bias without re-sweeping the lake.
  *
  * The per-bucket train/val counts are plain sums over a derived key,
  * so the EXACT batch aggregation runs as a complete-mode streaming
  * aggregation (`SamplingOps.driftBucketCounts` — one shared
  * expression, no twin drift possible); each epoch the tiny
  * (≤ |length buckets|) state re-emits in full and the shared χ²
  * finishing step (`chisqReport`) republishes the report.
  *
  * State story: one (n_train, n_val) pair per length bucket — bounded
  * by the length distribution's support (BucketWidth-quantized),
  * independent of document volume; no watermark needed because the
  * counts are a monotone running total, not a windowed view.
  *
  * Sink discipline: a monitor's report is a CURRENT-STATE artifact,
  * not a ledger — each epoch overwrites `report/` whole (latest wins),
  * and the checkpoint makes replays rewrite the same state rather than
  * double-count. */
object StreamingDriftMonitor {

  /** The per-epoch publish — public so replay behavior is testable. */
  def writeReport(counts: DataFrame, sinkDir: String): Unit =
    SamplingOps.chisqReport(counts)
      .select(col("bucket_lo"), col("n_train"), col("n_val"),
        col("e_val"), col("chi2_term"))
      .write.mode("overwrite").parquet(s"$sinkDir/report")

  /** Monitor a document stream ((doc_id, text) schema): complete-mode
    * running counts → χ² report overwritten per epoch. */
  def serve(docStream: DataFrame, sinkDir: String): StreamingQuery =
    SamplingOps.driftBucketCounts(docStream)
      .writeStream
      .outputMode("complete")
      .foreachBatch { (counts: DataFrame, _: Long) =>
        writeReport(counts, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
