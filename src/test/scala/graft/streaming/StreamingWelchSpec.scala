package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._

/** The streamed moment log must serve exactly the batch Welch readout:
  * per-user decimal partials are order-free, so epoch slicing of a
  * user's events cannot change the t statistic. */
class StreamingWelchSpec extends SparkSpec {

  private def fmt(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq

  test("streamed moment log serves the same t readout as the batch Welch") {
    val ev = Tables(spark, Sf0001, "events").select("user_id", "value")
    val srcDir = tempDir("welch_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("welch_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(ev.schema).parquet(srcDir)
    StreamingWelch.maintain(stream, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    val served = fmt(StreamingWelch.readWelch(spark, sinkDir).collect())
    val batch = fmt(EventOps.abWelch(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("a user split across epochs reassembles exactly; replay cannot double-count") {
    import spark.implicits._
    val sinkDir = tempDir("welch_replay") + "/out"
    // user 1 spans both epochs (10 + 10); squared-moment naivety would
    // commit 100 + 100 where the true (10+10)² = 400 — the per-user
    // partial grain is what makes the log mergeable
    val e0 = Seq((1L, 10.0), (2L, 30.0)).toDF("user_id", "value")
    val e1 = Seq((1L, 10.0), (3L, 40.0), (4L, 50.0)).toDF("user_id", "value")
    StreamingWelch.writeBatch(e0, 0L, sinkDir)
    StreamingWelch.writeBatch(e1, 1L, sinkDir)
    val r = StreamingWelch.readWelch(spark, sinkDir).collect().head
    // users: 1→20, 3→40 (arm1); 2→30, 4→50 (arm0): means 40 vs 30,
    // variances 200/200 — the planted Welch cohort: t = 10/√200, df = 2
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == ((40.0, 30.0, 10.0)))
    assert(r.getDouble(5) == 10.0 / math.sqrt(200.0) && r.getDouble(6) == 2.0)
    // at-least-once delivery re-runs epoch 0 with the same rows
    StreamingWelch.writeBatch(e0, 0L, sinkDir)
    val r2 = StreamingWelch.readWelch(spark, sinkDir).collect().head
    assert(fmtOne(r2) == fmtOne(r))
  }

  private def fmtOne(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
}
