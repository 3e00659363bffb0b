package graft.streaming

import graft.SparkSpec
import graft.ops.{CurationOps, Tables}

/** The streaming funnel's final report must equal the batch
  * filterFunnel row-for-row on the same corpus, regardless of
  * micro-batch chopping; a replayed publish replaces, never appends. */
class StreamingFilterFunnelSpec extends SparkSpec {

  test("streaming funnel report over chunked files == batch filterFunnel") {
    val docs = Tables(spark, Sf0001, "documents").select("doc_id", "text")
    val srcDir = tempDir("funnel_src") + "/docs"
    docs.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("funnel_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple epochs
      .schema(docs.schema).parquet(srcDir)
    StreamingFilterFunnel.serve(stream, sinkDir).awaitTermination()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("stage").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val got = rows(spark.read.parquet(s"$sinkDir/report"))
    val want = rows(CurationOps.filterFunnel(spark, Sf0001))
    assert(got.nonEmpty && got == want)

    // replaying an epoch publish must REPLACE the report, not append
    StreamingFilterFunnel.writeReport(CurationOps.funnelCounts(docs), sinkDir)
    assert(rows(spark.read.parquet(s"$sinkDir/report")) == want)
  }
}
