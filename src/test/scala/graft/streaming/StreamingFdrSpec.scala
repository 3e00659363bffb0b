package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.Row

/** The streamed keyed moment log must serve exactly the batch BH board:
  * per-(event_type, user) decimal partials are order-free, so epoch
  * slicing cannot move a z, a rank, a boundary, or a rejection. */
class StreamingFdrSpec extends SparkSpec {

  private def fmt(rows: Array[Row]) = rows.map(r =>
    (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7),
      r.getDouble(8), r.getBoolean(9))).toSeq

  test("streamed moment log serves the same BH board as the batch entry") {
    val ev = Tables(spark, Sf0001, "events")
      .select("event_type", "user_id", "value")
    val srcDir = tempDir("fdr_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("fdr_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(ev.schema).parquet(srcDir)
    StreamingFdr.maintain(stream, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    val served = fmt(StreamingFdr.readFdr(spark, sinkDir).collect())
    val batch = fmt(EventOps.abFdrByType(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("a user split across epochs reassembles; replay cannot flip a rejection") {
    import spark.implicits._
    val sinkDir = tempDir("fdr_replay") + "/out"
    // the planted step-up cohort (alpha z ≈ 2.1, beta z ≈ 2.0, m = 2 →
    // both rejected), with arm-0 users' totals SPLIT across the two
    // epochs — reassembly must land on the identical board
    val e0 = Seq(("alpha", 2L, 7.1), ("alpha", 4L, 6.1), ("alpha", 1L, 10.0),
      ("beta", 2L, 13.0), ("beta", 1L, 10.0), ("beta", 3L, 10.0))
      .toDF("event_type", "user_id", "value")
    val e1 = Seq(("alpha", 2L, 6.0), ("alpha", 4L, 5.0), ("alpha", 3L, 10.0),
      ("beta", 4L, 11.0), ("beta", 3L, 0.0))
      .toDF("event_type", "user_id", "value")
    StreamingFdr.writeBatch(e0, 0L, sinkDir)
    StreamingFdr.writeBatch(e1, 1L, sinkDir)
    val rows = StreamingFdr.readFdr(spark, sinkDir).collect()
    val byType = rows.map(r => r.getString(0) -> r).toMap
    assert(math.abs(byType("alpha").getAs[Double]("z") - 2.1) < 1e-9)
    assert(math.abs(byType("beta").getAs[Double]("z") - 2.0) < 1e-9)
    assert(rows.forall(_.getAs[Boolean]("rejected")), "step-up board")
    // at-least-once delivery re-runs epoch 0 with the same rows
    StreamingFdr.writeBatch(e0, 0L, sinkDir)
    val replayed = StreamingFdr.readFdr(spark, sinkDir).collect()
    assert(fmt(replayed) == fmt(rows))
  }
}
