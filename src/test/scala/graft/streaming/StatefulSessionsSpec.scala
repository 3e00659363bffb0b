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

  test("event-time timeout: idle user's open session is emitted and state freed") {
    import spark.implicits._
    import StatefulSessions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ev(user: Long, id: Long, hhmm: String, v: Double): Ev =
      Ev(user, id, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), v)

    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = closedSessionsWithTimeout(src.toDS(), "10 minutes").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("timeout_sessions").start()
    try {
      // batch 1: user 1 has a 2-event session; user 2 one event
      src.addData(ev(1L, 1L, "10:00", 1.0), ev(1L, 2L, "10:05", 2.0), ev(2L, 3L, "10:00", 5.0))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").isEmpty) // nothing closed yet
      // batch 2: user 2 returns much later -> watermark advances to 11:50;
      // user 1 saw NO new data, yet their open session (gap horizon 10:35)
      // must be emitted by timeout alone, and user 2's first session closes
      // by gap within their own fold
      src.addData(ev(2L, 4L, "12:00", 7.0))
      q.processAllAvailable()
      val rows = spark.table("timeout_sessions")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .orderBy("user_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L), rows.mkString(";"))
      val u1 = rows(0)
      assert(u1.getAs[java.sql.Timestamp]("session_start") == java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(u1.getAs[java.sql.Timestamp]("session_end") == java.sql.Timestamp.valueOf("2024-01-01 10:05:00"))
      assert(u1.getAs[Long]("n_events") == 2L && u1.getAs[Double]("total_value") == 3.0)
      val u2 = rows(1)
      assert(u2.getAs[Long]("n_events") == 1L && u2.getAs[Double]("total_value") == 5.0)
      // user 2's 12:00 session is still open (in state), not emitted
    } finally q.stop()
  }
}
