package graft.streaming

import graft.SparkSpec
import graft.ops.{SimilarityOps, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The streaming ANN serving path must agree with the batch
  * index-probe query-for-query on the same materialized index. */
class StreamingKnnServeSpec extends SparkSpec {

  test("stream-static index probe == batch knnJoinFromIndex on the query subset") {
    val idxDir = tempDir("knn_serve_idx") + "/idx"
    SimilarityOps.buildKnnIndex(spark, Sf0001, idxDir)
    val index = spark.read.parquet(idxDir)

    // query stream: 10 corpus vectors (ids match the corpus, so the
    // self-match suppression mirrors the batch join's semantics)
    val queries = Tables(spark, Sf0001, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val srcDir = tempDir("knn_serve_src") + "/q"
    queries.write.parquet(srcDir)
    val sinkDir = tempDir("knn_serve_sink") + "/out"

    val stream = spark.readStream.schema(queries.schema).parquet(srcDir)
    StreamingKnnServe.serve(index, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSeq
    val got = readSink()
    val want = SimilarityOps.knnJoinFromIndex(spark, idxDir)
      .filter(col("q_id") < 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // at-least-once replay of an epoch must REPLACE its output, not append
    StreamingKnnServe.writeBatch(index, queries, 0L, sinkDir)
    assert(readSink() == want, "replayed batch must not duplicate the sink")
  }
}
