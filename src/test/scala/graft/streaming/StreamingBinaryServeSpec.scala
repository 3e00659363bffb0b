package graft.streaming

import graft.SparkSpec
import graft.ops.{SimilarityOps, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The streaming binary-quantized serving path must agree with the
  * batch Hamming top-k query-for-query on the same code index. */
class StreamingBinaryServeSpec extends SparkSpec {

  test("stream-static binary probe == batch topkHamming on the query subset") {
    val idxDir = tempDir("bin_serve_idx") + "/idx"
    SimilarityOps.buildBinaryIndex(spark, Sf0001, idxDir)
    val index = spark.read.parquet(idxDir)

    // query stream: the same 10 corpus vectors the batch form uses, as
    // RAW vectors — the batch packs them with the index build's own
    // signWord expressions, so agreement also pins pack consistency
    val queries = Tables(spark, Sf0001, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val srcDir = tempDir("bin_serve_src") + "/q"
    queries.write.parquet(srcDir)
    val sinkDir = tempDir("bin_serve_sink") + "/out"

    val stream = spark.readStream.schema(queries.schema).parquet(srcDir)
    StreamingBinaryServe.serve(index, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("hamming"))).toSeq
    val got = readSink()
    val want = SimilarityOps.topkHamming(spark, Sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("hamming"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // at-least-once replay of an epoch must REPLACE its output, not append
    StreamingBinaryServe.writeBatch(index, queries, 0L, sinkDir)
    assert(readSink() == want, "replayed batch must not duplicate the sink")
  }
}
