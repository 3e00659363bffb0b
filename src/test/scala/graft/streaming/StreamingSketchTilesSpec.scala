package graft.streaming

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Streaming-built HLL tiles must carry the same distinct-count answer
  * as batch-built tiles over the same events — HLL register state is
  * order-independent, so the estimates agree exactly. */
class StreamingSketchTilesSpec extends SparkSpec {
  import spark.implicits._

  test("streaming day tiles == batch day tiles; estimates track exact counts") {
    val events = Tables(spark, Sf0001, "events")
      .select("event_id", "ts", "user_id")
    // far-future sentinel advances the watermark so every real window
    // provably closes and emits; its own window is excluded from compare
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val farTs = new java.sql.Timestamp(maxTs.getTime + 5L * 24 * 3600 * 1000)
    val srcDir = tempDir("tiles_src")
    events.unionByName(Seq((-1L, farTs, -1L)).toDF("event_id", "ts", "user_id"))
      .write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    val q = StreamingSketchTiles.dailyUserTiles(stream)
      .writeStream.outputMode("append").format("memory").queryName("tiles_out")
      .start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("tiles_out")
      .filter(col("day") <= maxTs).orderBy("day").collect()
      .map(r => r.getTimestamp(0) -> r.getAs[Long]("est_users")).toMap
    assert(got.nonEmpty)

    val batch = spark.read.parquet(srcDir).filter(col("user_id") >= 0)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("w.start").as("day"), col("est"), col("exact"))
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == batch.keySet,
      s"windows differ: ${got.keySet} vs ${batch.keySet}")
    got.foreach { case (day, est) =>
      val (bEst, exact) = batch(day)
      assert(est == bEst, s"day $day: stream $est vs batch $bEst")
      assert(math.abs(est - exact) * 100 <= exact * 5, s"day $day: $est vs exact $exact")
    }
  }
}
