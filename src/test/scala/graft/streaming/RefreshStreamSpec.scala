package graft.streaming

import graft.SparkSpec
import graft.weather.{OpenMeteoIngest, Warehouse}
import org.apache.spark.sql.functions._

/** Streaming refresh: enriched dir → watermarked monthly agg →
  * foreachBatch-overwritten serving table; asserts the streaming result
  * matches the batch Warehouse.monthlyAgg on the same input. */
class RefreshStreamSpec extends SparkSpec {

  test("AvailableNow refresh materializes the monthly aggregate") {
    val fixture = OpenMeteoIngest.readRaw(
      spark, getClass.getResource("/openmeteo_sample.json").getPath)
    val enriched = OpenMeteoIngest.enrich(
      OpenMeteoIngest.explodeHourly(fixture),
      sourceTimestamp = "2026-01-02T00:00:00.000Z",
      apiRequestId = None, etlBatchId = "etl-stream-1")

    val enrichedDir = tempDir("enriched_stream")
    val servingDir = tempDir("serving_stream") + "/out"
    val ckptDir = tempDir("ckpt_stream")
    enriched.write.mode("overwrite").parquet(enrichedDir)

    val q = RefreshStream.start(spark, enrichedDir, servingDir, ckptDir)
    q.awaitTermination(120000L)

    val got = spark.read.parquet(servingDir)
      .select("city", "month", "avg_temp_c", "total_rain_mm", "rows_loaded")
      .orderBy("month").collect()
    val want = Warehouse.monthlyAgg(
      Warehouse.toDailyWeather(enriched, java.sql.Timestamp.valueOf("2026-01-02 00:00:00")),
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      .select("city", "month", "rows_loaded").orderBy("month").collect()

    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("city") == w.getAs[String]("city"))
      assert(g.getAs[java.sql.Timestamp]("month") == w.getAs[java.sql.Timestamp]("month"))
      assert(g.getAs[Long]("rows_loaded") == w.getAs[Int]("rows_loaded").toLong)
    }
    // incremental append → re-trigger updates the serving table idempotently
    enriched.limit(0).write.mode("append").parquet(enrichedDir)
    val q2 = RefreshStream.start(spark, enrichedDir, servingDir, ckptDir)
    q2.awaitTermination(120000L)
    assert(spark.read.parquet(servingDir).count() == got.length)
  }
}
