package graft.streaming

import graft.SparkSpec
import graft.ops.{SamplingOps, Tables}
import org.apache.spark.sql.functions._

/** The streaming drift monitor's final report must equal the batch χ²
  * report row-for-row on the same corpus, regardless of how the stream
  * was chopped into micro-batches. */
class StreamingDriftMonitorSpec extends SparkSpec {

  test("streaming drift report over chunked files == batch splitDriftChisq") {
    val docs = Tables(spark, Sf0001, "documents").select("doc_id", "text")
    val srcDir = tempDir("drift_src") + "/docs"
    // several source files so AvailableNow has real micro-batch structure
    docs.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("drift_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple epochs
      .schema(docs.schema).parquet(srcDir)
    StreamingDriftMonitor.serve(stream, sinkDir).awaitTermination()

    def readReport() = spark.read.parquet(s"$sinkDir/report")
      .orderBy("bucket_lo").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    val got = readReport()
    val want = SamplingOps.splitDriftChisq(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got.nonEmpty && got == want)

    // replaying an epoch publish must REPLACE the report, not append
    StreamingDriftMonitor.writeReport(
      SamplingOps.driftBucketCounts(docs), sinkDir)
    assert(readReport() == want, "replayed publish must not duplicate the report")
  }
}
