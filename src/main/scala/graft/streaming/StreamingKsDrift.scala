package graft.streaming

import graft.ops.SamplingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming two-sample KS drift monitor: the full-CDF report of
  * `SamplingOps.splitDriftKs` (+ its 1-row verdict) maintained
  * INCREMENTALLY over a document stream — the distribution-free sibling
  * of [[StreamingDriftMonitor]]'s binned χ², for the live pipeline that
  * wants to catch in-bucket length shifts as documents arrive.
  *
  * The per-distinct-length (f_train, f_val) counts are plain sums over
  * a derived key (`SamplingOps.ksFreqOf` over `ksValuesOf` — the SAME
  * expressions the batch entries run, so twin drift is impossible), so
  * the exact aggregation runs as a complete-mode streaming aggregation;
  * each epoch the bounded state re-emits in full and the shared
  * finishing step (`ksOfFreq` — range-partitioned running counts, the
  * cross-multiplied integer deviations) republishes both surfaces.
  *
  * State story: one (f_train, f_val) pair per distinct document length
  * — bounded by the length distribution's support, independent of
  * document volume; monotone running totals, so no watermark.
  *
  * Sink discipline: current-state artifact, not a ledger — each epoch
  * overwrites `report/` and `summary/` whole; the checkpoint makes a
  * replayed epoch rewrite the same state rather than double-count. */
object StreamingKsDrift {

  /** The per-epoch publish — public so replay behavior is testable. */
  def writeReport(freq: DataFrame, sinkDir: String): Unit = {
    val per = SamplingOps.ksOfFreq(freq)
    per.select(col("value"), col("cum_train"), col("cum_val"), col("d_num"))
      .orderBy("value")
      .write.mode("overwrite").parquet(s"$sinkDir/report")
    SamplingOps.ksSummaryOf(per)
      .write.mode("overwrite").parquet(s"$sinkDir/summary")
  }

  /** Monitor a document stream ((…, text, n_chars) schema):
    * complete-mode running frequency table → KS report + verdict
    * overwritten per epoch. */
  def serve(docStream: DataFrame, sinkDir: String): StreamingQuery =
    SamplingOps.ksFreqOf(SamplingOps.ksValuesOf(docStream))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (freq: DataFrame, _: Long) =>
        writeReport(freq, sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$sinkDir/_checkpoint")
      .start()
}
