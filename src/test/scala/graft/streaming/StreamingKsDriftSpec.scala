package graft.streaming

import graft.SparkSpec
import graft.ops.{SamplingOps, Tables}
import org.apache.spark.sql.functions._

/** The streaming KS monitor's final surfaces must equal the batch
  * splitDriftKs report and verdict row-for-row on the same corpus,
  * regardless of micro-batch chopping; a replayed publish must replace,
  * never append. */
class StreamingKsDriftSpec extends SparkSpec {

  test("streaming KS report + verdict over chunked files == batch splitDriftKs") {
    val docs = Tables(spark, Sf0001, "documents")
      .select("doc_id", "text", "n_chars")
    val srcDir = tempDir("ks_src") + "/docs"
    docs.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("ks_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple epochs
      .schema(docs.schema).parquet(srcDir)
    StreamingKsDrift.serve(stream, sinkDir).awaitTermination()

    def perValue(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val gotReport = perValue(spark.read.parquet(s"$sinkDir/report"))
    val wantReport = perValue(SamplingOps.splitDriftKs(spark, Sf0001))
    assert(gotReport.nonEmpty && gotReport == wantReport)

    def verdict(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect()(0)
      (r.getAs[Long]("n_train"), r.getAs[Long]("n_val"),
        r.getAs[Long]("d_num_max"), r.getAs[Long]("ks_value"),
        r.getAs[Double]("d_stat"), r.getAs[Boolean]("drifted"))
    }
    val want = verdict(SamplingOps.splitDriftKsSummary(spark, Sf0001))
    assert(verdict(spark.read.parquet(s"$sinkDir/summary")) == want)

    // replaying an epoch publish must REPLACE both surfaces, not append
    StreamingKsDrift.writeReport(
      SamplingOps.ksFreqOf(SamplingOps.ksValuesOf(docs)), sinkDir)
    assert(perValue(spark.read.parquet(s"$sinkDir/report")) == wantReport,
      "replayed publish must not duplicate the report")
    assert(verdict(spark.read.parquet(s"$sinkDir/summary")) == want)
  }
}
