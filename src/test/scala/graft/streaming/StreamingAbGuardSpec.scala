package graft.streaming

import graft.SparkSpec
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._

/** The streamed SRM guard must serve exactly the batch verdict: the
  * commit log is per-epoch distinct user sets and the serve-side core
  * dedups across epochs, so epoch slicing cannot change χ². */
class StreamingAbGuardSpec extends SparkSpec {

  test("streamed user log serves the same SRM verdict as the batch guard") {
    val ev = Tables(spark, Sf0001, "events").select("user_id")
    val srcDir = tempDir("srm_src") + "/ev"
    ev.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("srm_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(ev.schema).parquet(srcDir)
    StreamingAbGuard.guard(stream, sinkDir).awaitTermination()

    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    def fmt(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    val served = fmt(StreamingAbGuard.readGuard(spark, sinkDir).collect())
    val batch = fmt(EventOps.abSrm(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)
  }

  test("a replayed epoch replaces its commit and users spanning epochs count once") {
    import spark.implicits._
    val sinkDir = tempDir("srm_replay") + "/out"
    // epoch 0: users 1..6; epoch 1: users 5..10 — overlap {5,6}
    val e0 = (1L to 6L).toDF("user_id")
    val e1 = (5L to 10L).toDF("user_id")
    StreamingAbGuard.writeBatch(e0, 0L, sinkDir)
    StreamingAbGuard.writeBatch(e1, 1L, sinkDir)
    val r = StreamingAbGuard.readGuard(spark, sinkDir).collect().head
    // 10 distinct users, 5/5 balanced despite the cross-epoch overlap
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)) ==
      ((5L, 5L, 0.0, false)))
    // at-least-once delivery re-runs epoch 0: the verdict is unchanged
    StreamingAbGuard.writeBatch(e0, 0L, sinkDir)
    val r2 = StreamingAbGuard.readGuard(spark, sinkDir).collect().head
    assert((r2.getLong(0), r2.getLong(1)) == ((5L, 5L)))
  }
}
