package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The stateful streaming funnel must agree exactly with the batch
  * funnelStages: max emitted stage per user == the batch stage. */
class StreamingFunnelSpec extends SparkSpec {

  test("streaming funnel (max advance per user) == batch funnelStages") {
    import spark.implicits._
    import StreamingFunnel._

    val events = Tables(spark, Sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[Ev]
    val srcDir = tempDir("funnel_src")
    events.write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(events.schema).parquet(srcDir).as[Ev]
    val q = stageAdvances(stream).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("funnel_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("funnel_out")
      .groupBy("user_id").agg(max(col("stage")).as("stage"))
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
    val want = EventOps.funnelStages(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage")))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("stage machine: strict progression across micro-batches, ties never count") {
    import spark.implicits._
    import StreamingFunnel._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(u: Long, t: String, hhmm: String): Ev =
      Ev(u, t, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"))

    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = stageAdvances(src.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("funnel_mb").start()
    try {
      // batch 1: user 1 views; user 2's click precedes any view (no-op);
      // user 3 view+click at the SAME instant (strict > → click ignored)
      src.addData(ev(1, "view", "10:00"), ev(2, "click", "10:00"),
        ev(3, "view", "10:00"), ev(3, "click", "10:00"))
      q.processAllAvailable()
      // batch 2: user 1 clicks then purchases (across-batch state carries);
      // user 2 views then clicks (progression restarts cleanly)
      src.addData(ev(1, "click", "10:05"), ev(1, "purchase", "10:10"),
        ev(2, "view", "10:05"), ev(2, "click", "10:06"))
      q.processAllAvailable()
      val stages = spark.table("funnel_mb")
        .groupBy("user_id").agg(max(col("stage")).as("stage")).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
      assert(stages == Map(1L -> 3, 2L -> 2, 3L -> 1))
    } finally q.stop()
  }
}
