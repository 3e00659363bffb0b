package graft.streaming

import graft.SparkSpec
import graft.ops.{PretrainOps, Tables}
import org.apache.spark.sql.functions._

/** The streaming decontamination gate must agree with the batch operator
  * document-for-document on the same corpus and benchmark set. */
class StreamingDecontaminateSpec extends SparkSpec {

  test("stream-static decontamination == batch decontaminate") {
    val docs = Tables(spark, Sf0001, "documents")
    val bench = PretrainOps.benchmarkGrams(docs.filter(col("doc_id") % 97 === 0))
    val incoming = docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")

    val srcDir = tempDir("decon_src") + "/docs"
    incoming.write.parquet(srcDir)
    val sinkDir = tempDir("decon_sink") + "/out"

    val stream = spark.readStream.schema(incoming.schema).parquet(srcDir)
    StreamingDecontaminate.serve(bench, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shared"),
        r.getAs[Boolean]("contaminated"))).toSeq
    val got = readSink()
    val want = PretrainOps.decontaminate(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shared"),
        r.getAs[Boolean]("contaminated"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // at-least-once replay of an epoch must REPLACE its output, not append
    StreamingDecontaminate.writeBatch(bench, incoming, 0L, sinkDir)
    assert(readSink() == want, "replayed batch must not duplicate the sink")
  }
}
