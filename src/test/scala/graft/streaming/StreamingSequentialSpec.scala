package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._

/** The streamed look log must serve exactly the batch group-sequential
  * readout: once the planned cuts are fixed, per-(look, user) decimal
  * partials are order-free, so epoch slicing of a user's events cannot
  * change any look's z — and a replayed epoch replaces its commit. */
class StreamingSequentialSpec extends SparkSpec {

  private def fmt(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toString).toSeq

  private def spanOf(ev: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head
    (r.getLong(0), r.getLong(1))
  }

  test("streamed look log serves the batch sequential readout bit-for-bit") {
    val ev = Tables(spark, Sf0001, "events").select("user_id", "ts", "value")
    val (t0, t1) = spanOf(ev) // the planned horizon = the stored span,
    // so stream and batch compute the SAME cuts on the same data
    val srcDir = tempDir("seq_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("seq_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(ev.schema).parquet(srcDir)
    StreamingSequential.maintain(stream, t0, t1, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    val served = fmt(StreamingSequential.readMonitor(spark, sinkDir).collect())
    val batch = fmt(EventOps.abSequential(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("late-onset effect pages only at the final look; replay cannot double-count") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val day1 = ts("2024-01-10 00:00:00"); val day5 = ts("2024-01-14 00:00:00")
    // arms identical through day 1, then arm 0 (users 2, 4) lands a
    // +1000 lift on the final day — only look 5 may page. User 2 spans
    // BOTH epochs: the per-(look, user) partial grain is what makes the
    // log mergeable across the split.
    val e0 = Seq((1L, day1, 10.0), (2L, day1, 10.0), (3L, day1, 12.0))
      .toDF("user_id", "ts", "value")
    val e1 = Seq((4L, day1, 12.0), (2L, day5, 1000.0), (4L, day5, 1000.0))
      .toDF("user_id", "ts", "value")
    val (t0, t1) = spanOf(e0.unionAll(e1))
    val sinkDir = tempDir("seq_replay") + "/out"
    StreamingSequential.writeBatch(e0, 0L, t0, t1, sinkDir)
    StreamingSequential.writeBatch(e1, 1L, t0, t1, sinkDir)
    val rows = StreamingSequential.readMonitor(spark, sinkDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to EventOps.SeqLooks))
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getAs[Double]("boundary")
        == EventOps.ObfC * math.sqrt(EventOps.SeqLooks.toDouble / k))
      if (k < EventOps.SeqLooks)
        assert(r.getAs[Double]("z") == 0.0 && !r.getAs[Boolean]("crossed"),
          s"look $k must be quiet before the effect lands")
      else {
        // arm0 totals (1010, 1012) vs arm1 (10, 12): v = 2 each,
        // z = 1000/√(1+1) — the live page fires exactly once
        assert(r.getAs[Double]("z") == 1000.0 / math.sqrt(2.0))
        assert(r.getAs[Boolean]("crossed"), "the final look must page")
      }
    }
    // at-least-once delivery re-runs epoch 0 with the same rows: the
    // overwritten commit replaces, never double-counts
    StreamingSequential.writeBatch(e0, 0L, t0, t1, sinkDir)
    val replayed = fmt(StreamingSequential.readMonitor(spark, sinkDir).collect())
    assert(replayed == fmt(rows))
  }
}
