package graft.streaming

import graft.SparkSpec
import graft.ops.{Tables, TextOps}

/** The streaming agreement monitor's final report must carry BOTH batch
  * entries' exact values on the same corpus, regardless of micro-batch
  * chopping; a replayed publish replaces, never appends. */
class StreamingAgreementSpec extends SparkSpec {

  test("streaming agreement report over chunked files == both batch metrics") {
    val docs = Tables(spark, Sf0001, "documents").select("doc_id", "text")
    val srcDir = tempDir("agree_src") + "/docs"
    docs.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("agree_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // force multiple epochs
      .schema(docs.schema).parquet(srcDir)
    StreamingAgreement.serve(stream, sinkDir).awaitTermination()

    val got = spark.read.parquet(s"$sinkDir/report").collect()
    assert(got.length == 1)
    val r = got(0)
    val f = TextOps.fleissKappa(spark, Sf0001).collect()(0)
    val k = TextOps.krippendorffAlpha(spark, Sf0001).collect()(0)
    // fleiss side, bit-identical
    for (c <- Seq("n_docs", "keep_votes", "n_unanimous"))
      assert(r.getAs[Long](c) == f.getAs[Long](c), c)
    for (c <- Seq("p_keep", "p_bar", "p_e", "kappa"))
      assert(r.getAs[Double](c) == f.getAs[Double](c), c)
    // alpha side, bit-identical
    assert(r.getAs[Long]("d_num") == k.getAs[Long]("d_num"))
    for (c <- Seq("d_obs", "d_exp", "alpha"))
      assert(r.getAs[Double](c) == k.getAs[Double](c), c)

    // replaying an epoch publish must REPLACE the report, not append
    StreamingAgreement.writeReport(
      TextOps.agreementCounts(docs.select(
        TextOps.raterVoteExpr(docs("text")).as("k"))), sinkDir)
    val again = spark.read.parquet(s"$sinkDir/report").collect()
    assert(again.length == 1 && again(0).getAs[Double]("kappa") == r.getAs[Double]("kappa"))
  }
}
