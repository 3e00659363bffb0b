package graft.streaming

import graft.SparkSpec
import graft.ops.{Tables, TextOps}

/** The streaming disparity monitor's final report must equal the batch
  * classifierDisparity row-for-row on the same corpus, regardless of
  * micro-batch chopping; a replayed publish replaces, never appends. */
class StreamingDisparitySpec extends SparkSpec {

  test("streaming disparity report over chunked files == batch audit") {
    val docs = Tables(spark, Sf0001, "documents").select("doc_id", "lang", "text")
    val srcDir = tempDir("disp_src") + "/docs"
    docs.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("disp_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple epochs
      .schema(docs.schema).parquet(srcDir)
    StreamingDisparity.serve(stream, sinkDir).awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("group").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq
    val got = rows(spark.read.parquet(s"$sinkDir/report"))
    val want = rows(TextOps.classifierDisparity(spark, Sf0001))
    assert(got.nonEmpty && got == want)

    // replaying an epoch publish must REPLACE the report, not append
    StreamingDisparity.writeReport(
      TextOps.disparityCounts(docs.select(
        docs("lang").as("group"),
        TextOps.classifierKeep(docs("text")).as("keep"))), sinkDir)
    assert(rows(spark.read.parquet(s"$sinkDir/report")) == want)
  }
}
