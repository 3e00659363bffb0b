package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming distinct-count tiles: the [[graft.ops.SketchOps]] HLL cube
  * built INCREMENTALLY from an event stream — per-day DataSketches
  * sketches of the distinct active users, maintained by a watermarked
  * windowed aggregation. The emitted rows are the same storable,
  * mergeable sketch bytes the batch cube materializes, so a range query
  * unions streaming-built tiles exactly like batch-built ones; this is
  * how the pre-aggregated distinct cube stays current between batch
  * rebuilds on a live lake.
  *
  * State story: one HLL sketch (≈ 16 KiB at lgK=14) per open window —
  * bounded by windows-in-watermark, independent of event volume; the
  * watermark closes and evicts windows in append mode. The sketch
  * aggregate is mergeable, so partial aggregation applies map-side
  * exactly as in batch. */
object StreamingSketchTiles {

  /** (window, sketch bytes, estimate) per closed day-window. */
  def dailyUserTiles(events: DataFrame,
      watermarkDelay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .select(col("w.start").as("day"), col("sk"),
        hll_sketch_estimate(col("sk")).as("est_users"))
}
