package graft.streaming

import graft.SparkSpec
import graft.ops.{JoinOps, Tables}
import org.apache.spark.sql.functions._

/** The watermarked stream-stream interval join must produce exactly the
  * batch range-join's matches on the same input. */
class IntervalJoinSpec extends SparkSpec {

  test("stream-stream interval join == batch j7_range_join") {
    val events = Tables(spark, Sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type")
    val srcDir = tempDir("ij_src")
    events.write.mode("overwrite").parquet(srcDir)

    def side(t: String) = spark.readStream.schema(events.schema).parquet(srcDir)
      .filter(col("event_type") === t)

    val q = IntervalJoin.errorsWithRecentPurchases(side("error"), side("purchase"))
      .writeStream.outputMode("append").format("memory").queryName("ij_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("ij_out")
      .orderBy("user_id", "error_id", "purchase_id").collect()
    val want = JoinOps.j7RangeJoin(spark, Sf0001).collect()
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    assert(got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("user_id") == w.getAs[Long]("user_id"))
      assert(g.getAs[Long]("error_id") == w.getAs[Long]("error_id"))
      assert(g.getAs[Long]("purchase_id") == w.getAs[Long]("purchase_id"))
      assert(g.getAs[java.sql.Timestamp]("purchase_ts") == w.getAs[java.sql.Timestamp]("purchase_ts"))
    }
  }

  test("left-outer interval join: null-extension after watermark == batch left join") {
    import spark.implicits._
    val events = Tables(spark, Sf0001, "events")
      .select("user_id", "event_id", "ts", "event_type")
    // sentinel rows far past the data advance BOTH sides' watermarks so
    // every real error's match horizon provably closes and its
    // null-extension (if unmatched) must emit; sentinels carry user -1
    // and are excluded from the comparison
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val farTs = new java.sql.Timestamp(maxTs.getTime + 10L * 3600 * 1000)
    val sentinels = Seq(
      (-1L, -1L, farTs, "error"), (-1L, -2L, farTs, "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val srcDir = tempDir("ijo_src")
    events.unionByName(sentinels).write.mode("overwrite").parquet(srcDir)

    def side(t: String) = spark.readStream.schema(events.schema).parquet(srcDir)
      .filter(col("event_type") === t)
    val q = IntervalJoin.errorsWithRecentPurchasesLeftOuter(
        side("error"), side("purchase"))
      .writeStream.outputMode("append").format("memory").queryName("ijo_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("ijo_out").filter(col("user_id") >= 0)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("error_id"),
        Option(r.getAs[java.lang.Long]("purchase_id")))).sorted.toSeq
    // batch twin: errors LEFT JOIN purchases on the same interval
    val ev = Tables(spark, Sf0001, "events")
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val purs = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val want = errs.join(purs,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("error_ts") - expr("INTERVAL 30 MINUTES") &&
          col("purchase_ts") <= col("error_ts"),
        "left")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("error_id"),
        Option(r.getAs[java.lang.Long]("purchase_id")))).sorted.toSeq
    assert(got.nonEmpty && got.exists(_._3.isEmpty), "no null-extended rows emitted")
    assert(got == want)
  }
}
