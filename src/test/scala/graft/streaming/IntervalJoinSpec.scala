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
}
