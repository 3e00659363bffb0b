package graft.streaming

import graft.SparkSpec
import graft.ops.{Tables, WindowOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The stateful streaming sessionizer must agree exactly with the batch
  * window-based sessionization on the same input: closed sessions from
  * the stream + final open sessions = the batch session set. */
class StatefulSessionsSpec extends SparkSpec {

  test("streaming sessions (closed + drained open) == batch w4_sessionize") {
    import spark.implicits._
    import StatefulSessions._

    val events = Tables(spark, Sf0001, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Ev]

    // stream the events table through the stateful sessionizer
    val srcDir = tempDir("sess_src")
    events.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(events.schema).parquet(srcDir).as[Ev]
    val q = closedSessions(stream).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("sessions_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sessions_out")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    val drained = finalOpenSessions(events).toDF()
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    val got = streamed.union(drained)
      .orderBy("user_id", "session_start").collect()

    val want = WindowOps.w4Sessionize(spark, Sf0001)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start").collect()

    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("user_id") == w.getAs[Long]("user_id"))
      assert(g.getAs[java.sql.Timestamp]("session_start") == w.getAs[java.sql.Timestamp]("session_start"))
      assert(g.getAs[java.sql.Timestamp]("session_end") == w.getAs[java.sql.Timestamp]("session_end"))
      assert(g.getAs[Long]("n_events") == w.getAs[Long]("n_events"))
      assert(math.abs(g.getAs[Double]("total_value") - w.getAs[Double]("total_value")) < 1e-9)
    }
  }
}
