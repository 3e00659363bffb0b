package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.Row

/** The streamed count log must serve exactly the batch pass@k board:
  * per-problem (n, c) are exact integer sums, so epoch slicing cannot
  * move an estimate. */
class StreamingPassAtKSpec extends SparkSpec {

  private def fmt(rows: Array[Row]) = rows.map { r =>
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), r.getLong(2), d(3), d(4), d(5))
  }.toSeq

  test("streamed count log serves the same pass@k board as the batch entry") {
    val ev = Tables(spark, Sf0001, "events").select("user_id", "event_type")
    val srcDir = tempDir("passk_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("passk_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(ev.schema).parquet(srcDir)
    StreamingPassAtK.maintain(stream, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    val served = fmt(StreamingPassAtK.readPassAtK(spark, sinkDir).collect())
    val batch = fmt(EventOps.passAtK(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("samples split across epochs re-sum; replay cannot double-count") {
    import spark.implicits._
    val sinkDir = tempDir("passk_replay") + "/out"
    // problem 1 collects 10 samples / 3 successes ACROSS the epochs —
    // pass@5 must read the full-horizon value, and a problem stuck at
    // n = 3 stays NULL at k = 5 until more samples land
    val e0 = Seq((1L, "purchase"), (1L, "view"), (1L, "view"), (1L, "view"),
      (2L, "view"), (2L, "view"))
      .toDF("user_id", "event_type")
    val e1 = Seq((1L, "purchase"), (1L, "purchase"), (1L, "view"),
      (1L, "view"), (1L, "view"), (1L, "view"), (2L, "view"))
      .toDF("user_id", "event_type")
    StreamingPassAtK.writeBatch(e0, 0L, sinkDir)
    StreamingPassAtK.writeBatch(e1, 1L, sinkDir)
    val rows = StreamingPassAtK.readPassAtK(spark, sinkDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def expect(n: Long, c: Long, k: Int): Double =
      1.0 - (0 until k).map(i =>
        math.max(n - c - i, 0L).toDouble / (n - i).toDouble).product
    assert(rows(1L).getLong(1) == 10L && rows(1L).getLong(2) == 3L)
    assert(rows(1L).getAs[Double]("pass_5") == expect(10, 3, 5))
    assert(rows(2L).getLong(1) == 3L
      && rows(2L).isNullAt(rows(2L).fieldIndex("pass_5")),
      "3 samples cannot answer pass@5 yet")
    // at-least-once delivery re-runs epoch 0 with the same rows
    StreamingPassAtK.writeBatch(e0, 0L, sinkDir)
    val replayed = StreamingPassAtK.readPassAtK(spark, sinkDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(replayed(1L).getLong(1) == 10L
      && replayed(1L).getAs[Double]("pass_5") == expect(10, 3, 5))
  }
}
