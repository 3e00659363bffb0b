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

  test("stream-static surgical redaction == batch decontaminateRedact") {
    val docs = Tables(spark, Sf0001, "documents")
    val bench = PretrainOps.benchmarkGrams(docs.filter(col("doc_id") % 97 === 0))
    val incoming = docs.filter(col("doc_id") % 97 =!= 0).select("doc_id", "text")

    val srcDir = tempDir("redact_src") + "/docs"
    incoming.repartition(3).write.parquet(srcDir)
    val sinkDir = tempDir("redact_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(incoming.schema).parquet(srcDir)
    StreamingDecontaminate.serveRedact(bench, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Int]("n_matches"), r.getAs[Int]("n_redacted"),
        r.getAs[String]("clean_text"))).toSeq
    val got = readSink()
    val want = PretrainOps.decontaminateRedact(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Int]("n_matches"), r.getAs[Int]("n_redacted"),
        r.getAs[String]("clean_text"))).toSeq
    assert(got.nonEmpty && got == want)
    // replaying an epoch WITH ITS OWN DOCUMENTS replaces that partition
    // and leaves the sink identical — at-least-once delivery is safe
    val epoch0Ids = spark.read.parquet(s"$sinkDir/batch_id=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(epoch0Ids.nonEmpty && epoch0Ids.size < want.size, "need real epochs")
    StreamingDecontaminate.writeRedactBatch(
      bench, incoming.filter(col("doc_id").isin(epoch0Ids: _*)), 0L, sinkDir)
    assert(readSink() == want, "replayed epoch must not duplicate the sink")
  }

  test("stream-static fuzzy gate == batch decontaminateFuzzy across epochs") {
    val docs = Tables(spark, Sf0001, "documents")
    val m = PretrainOps.FuzzyBenchMod
    val posting = PretrainOps.benchShinglePosting(docs.filter(col("doc_id") % m === 0))
    val incoming = docs.filter(col("doc_id") % m =!= 0).select("doc_id", "text")

    val srcDir = tempDir("fuzzy_src") + "/docs"
    incoming.repartition(3).write.parquet(srcDir)
    val sinkDir = tempDir("fuzzy_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(incoming.schema).parquet(srcDir)
    StreamingDecontaminate.serveFuzzy(posting, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_bench_nd"),
        r.getAs[Double]("best_jaccard"), r.getAs[Boolean]("contaminated"))).toSeq
    val got = readSink()
    val want = PretrainOps.decontaminateFuzzy(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_bench_nd"),
        r.getAs[Double]("best_jaccard"), r.getAs[Boolean]("contaminated"))).toSeq
    assert(got.nonEmpty && got == want)
    assert(got.exists(_._4), "the planted mod-31 suite must flag someone at sf0.001")
    // replaying an epoch with its own documents replaces that partition
    val epoch0Ids = spark.read.parquet(s"$sinkDir/batch_id=0")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(epoch0Ids.nonEmpty && epoch0Ids.size < want.size, "need real epochs")
    StreamingDecontaminate.writeFuzzyBatch(
      posting, incoming.filter(col("doc_id").isin(epoch0Ids: _*)), 0L, sinkDir)
    assert(readSink() == want, "replayed epoch must not duplicate the sink")
  }
}
