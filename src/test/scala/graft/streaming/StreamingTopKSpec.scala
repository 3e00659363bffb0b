package graft.streaming

import graft.SparkSpec
import graft.ops.{SimilarityOps, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Streaming top-k served against the static corpus must equal the batch
  * brute-force ranking for the same query set. */
class StreamingTopKSpec extends SparkSpec {

  test("stream-static top-k == batch topkBrute for the same queries") {
    val corpus = Tables(spark, Sf0001, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

    val qDir = tempDir("stk_queries") + "/q"
    queries.write.parquet(qDir)
    val sinkDir = tempDir("stk_sink") + "/out"

    val stream = spark.readStream.schema(queries.schema).parquet(qDir)
    val q = StreamingTopK.serve(corpus, stream, 10, sinkDir)
    q.awaitTermination()

    val got = spark.read.parquet(sinkDir).orderBy("q_id", "rank").collect()
    val want = SimilarityOps.topkBrute(spark, Sf0001).collect()
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Long]("q_id") == w.getAs[Long]("q_id"))
      assert(g.getAs[Int]("rank") == w.getAs[Int]("rank"))
      assert(g.getAs[Long]("neighbor_id") == w.getAs[Long]("neighbor_id"))
    }
  }
}
