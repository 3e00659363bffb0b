package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._

/** The streamed span log must serve exactly the batch Nelson–Aalen
  * table: per-user (min, max) spans are idempotent-mergeable, so epoch
  * slicing and replays cannot move the hazard curve. */
class StreamingSurvivalSpec extends SparkSpec {

  private def fmt(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).toSeq

  test("streamed span log serves the same hazard table as the batch readout") {
    val ev = Tables(spark, Sf0001, "events").select("user_id", "ts")
    val srcDir = tempDir("surv_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("surv_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(ev.schema).parquet(srcDir)
    StreamingSurvival.maintain(stream, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    val served = fmt(StreamingSurvival.readHazard(spark, sinkDir).collect())
    val batch = fmt(EventOps.survivalHazard(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("a user split across epochs reassembles the true span; replay is a no-op") {
    import spark.implicits._
    val sinkDir = tempDir("surv_replay") + "/out"
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    // user 1's FIRST event sits in epoch 0 and LAST in epoch 1: only the
    // cross-epoch min/max reassembly sees the full 0..10 lifetime.
    // user 5 keeps the study end late so 1 and 2 count as churned.
    val e0 = Seq((1L, t(0)), (2L, t(0)), (2L, t(2))).toDF("user_id", "ts")
    val e1 = Seq((1L, t(10)), (5L, t(20))).toDF("user_id", "ts")
    StreamingSurvival.writeBatch(e0, 0L, sinkDir)
    StreamingSurvival.writeBatch(e1, 1L, sinkDir)
    val r = fmt(StreamingSurvival.readHazard(spark, sinkDir).collect())
    // lifetimes: u1 = 10 (churned — only visible after the cross-epoch
    // merge), u2 = 2 (churned), u5 = 0 (censored at the study end).
    // u5's censoring at t=0 removes it from later risk sets: t=2 risk
    // = {u1, u2} = 2, t=10 risk = {u1} = 1.
    assert(r == Seq(
      (2L, 2L, 1L, 0L, 500000000000L, 500000000000L),
      (10L, 1L, 1L, 0L, 1000000000000L, 1500000000000L)), s"got $r")
    // at-least-once delivery re-runs epoch 0 with the same rows
    StreamingSurvival.writeBatch(e0, 0L, sinkDir)
    assert(fmt(StreamingSurvival.readHazard(spark, sinkDir).collect()) == r)
  }
}
