package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming exact dedup: dropDuplicatesWithinWatermark over an event-time
  * stream — the streaming twin of DedupOps.exact, with state bounded by
  * the watermark horizon instead of growing with the stream. */
class StreamingDedupSpec extends SparkSpec {

  test("dropDuplicatesWithinWatermark emits each key once; state is bounded") {
    import spark.implicits._
    // events with planted duplicate ids inside the watermark window
    val rows = (0L until 100L).flatMap { i =>
      val t = java.sql.Timestamp.valueOf(f"2026-01-01 10:${i % 60}%02d:00")
      Seq((i, t, s"payload_$i")) ++ (if (i % 10 == 0) Seq((i, t, s"payload_$i")) else Nil)
    }
    val srcDir = tempDir("sdedup_src")
    rows.toDF("id", "ts", "payload").write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_out")
    assert(got.count() == 100) // each id exactly once
    assert(got.select(countDistinct(col("id"))).collect()(0).getLong(0) == 100)
  }
}
