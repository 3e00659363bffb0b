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

  test("novel-vocabulary doc scores at the smoothed neutral, with full evidence count") {
    import spark.implicits._
    // the frozen fit has never seen these bigrams: every bucket misses
    // the weight table, and each occurrence must score the add-one
    // empty-bucket affinity S/2 — an inner join would drop them all and
    // return the corpus prior over ZERO counted bigrams
    val (w, prior) = CurationOps.dsirFit(spark, Sf0001)
    val text = "zzq1 zzq2 zzq3 zzq4 zzq5"
    val novel = Seq((9000L, "en", text)).toDF("doc_id", "lang", "text")
    val r = CurationOps.dsirScoreAgainst(novel, w, prior).collect()(0)
    assert(r.getAs[Int]("n_bigrams") == 4, s"all 4 novel bigrams must count: $r")
    // independent recompute: replay the md5 bucket rule per bigram; a
    // bucket absent from the fitted table scores the S/2 empty-bucket
    // affinity (a novel bigram CAN collide into a populated bucket —
    // the recompute handles either case, the drop bug neither)
    val wm = w.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    val toks = text.split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    val wantSum = toks.sliding(2).map { bg =>
      val hex = md.digest(bg.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 5)
      val bucket = java.lang.Long.parseLong(hex, 16) % 4096
      wm.getOrElse(bucket, CurationOps.DsirScale / 2)
    }.sum
    assert(r.getAs[Long]("sum_w") == wantSum,
      s"sum_w ${r.getAs[Long]("sum_w")} != recomputed $wantSum")
    assert(r.getAs[Long]("score_ppm") == wantSum / 4)
  }
}
