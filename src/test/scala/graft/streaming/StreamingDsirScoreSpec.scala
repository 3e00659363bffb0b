package graft.streaming

import graft.SparkSpec
import graft.ops.{CurationOps, Tables}
import org.apache.spark.sql.functions._

/** The streaming DSIR scorer must agree with the batch operator
  * document-for-document when both use the same fitted tables. */
class StreamingDsirScoreSpec extends SparkSpec {

  test("stream-static dsir scoring == batch dsirWeights across epochs") {
    val (w, prior) = CurationOps.dsirFit(spark, Sf0001)
    val incoming = Tables(spark, Sf0001, "documents")
      .select("doc_id", "lang", "text")

    val srcDir = tempDir("dsir_src") + "/docs"
    incoming.repartition(3).write.parquet(srcDir)
    val sinkDir = tempDir("dsir_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(incoming.schema).parquet(srcDir)
    StreamingDsirScore.serve(w, prior, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir)
      .select("doc_id", "n_bigrams", "sum_w", "score_ppm")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val got = readSink()
    val want = CurationOps.dsirWeights(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == want)
    // replaying an epoch with its own documents replaces that partition
    val epoch0Ids = spark.read.parquet(s"$sinkDir/batch_id=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(epoch0Ids.nonEmpty && epoch0Ids.size < want.size, "need real epochs")
    StreamingDsirScore.writeBatch(
      w, prior, incoming.filter(col("doc_id").isin(epoch0Ids: _*)), 0L, sinkDir)
    assert(readSink() == want, "replayed epoch must not duplicate the sink")
  }
}
