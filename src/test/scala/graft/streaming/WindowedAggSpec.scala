package graft.streaming

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window streaming aggregate over the events table:
  * closed windows emitted in append mode must match the batch computation
  * of the same windows. */
class WindowedAggSpec extends SparkSpec {

  test("streaming 6h tumbling windows (append, 1h watermark) match batch") {
    val events = Tables(spark, Sf0001, "events")
      .select(col("ts"), col("event_type"), col("value"))

    val srcDir = tempDir("winagg_src")
    events.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_out")
      .select(col("window.start").as("w"), col("event_type"), col("n"), col("total"))
      .orderBy("w", "event_type").collect()

    // batch equivalent, restricted to windows fully below the final
    // watermark (max ts − 1h) — those are the ones append mode emits
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime
    val closedBefore = new java.sql.Timestamp(maxTs - 3600 * 1000)
    val want = events
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .filter(col("window.end") <= closedBefore)
      .select(col("window.start").as("w"), col("event_type"), col("n"), col("total"))
      .orderBy("w", "event_type").collect()

    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, x) =>
      assert(g.getTimestamp(0) == x.getTimestamp(0))
      assert(g.getString(1) == x.getString(1))
      assert(g.getLong(2) == x.getLong(2))
      assert(g.getDouble(3) == x.getDouble(3)) // exact: decimal route
    }
  }
}
