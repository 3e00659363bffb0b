package graft.streaming

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The foreachBatch sink must deliver every source row exactly once into
  * the lake, and replaying a batch (at-least-once recovery) must replace
  * its directory, not duplicate it. */
class ForeachBatchUpsertSpec extends SparkSpec {

  test("foreachBatch lake sink: all rows once; batch replay does not duplicate") {
    val events = Tables(spark, Sf0001, "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
    val srcDir = tempDir("fbu_src")
    events.write.mode("overwrite").parquet(srcDir)
    val outDir = tempDir("fbu_out")

    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    val q = ForeachBatchUpsert.start(stream, outDir)
    q.awaitTermination()

    def lake = spark.read.parquet(outDir).drop("batch_id")
    assert(lake.count() == events.count())
    assert(lake.select(sum(col("event_id"))).collect()(0).getLong(0)
      == events.select(sum(col("event_id"))).collect()(0).getLong(0))

    // simulate at-least-once redelivery: re-run batch 0 with the same data
    // (materialized first — a real replay re-reads the SOURCE, not the sink)
    val batchIds = spark.read.parquet(outDir).select("batch_id").distinct()
      .collect().map(_.getAs[Number]("batch_id").longValue()).sorted
    val replayed = spark.read.parquet(s"$outDir/batch_id=${batchIds.head}")
    val replayDf = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(replayed.collect(): _*)), replayed.schema)
    ForeachBatchUpsert.writeBatch(replayDf, batchIds.head, outDir)
    assert(lake.count() == events.count(), "replayed batch must overwrite, not append")
  }
}
