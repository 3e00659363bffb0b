package graft.streaming

import graft.SparkSpec
import graft.ops.RetrievalOps

/** The streaming BM25 serving path must agree with the batch index
  * probe query-for-query on the same materialized index. */
class StreamingLexServeSpec extends SparkSpec {
  import spark.implicits._

  test("stream probe == batch bm25FromIndex; replayed epoch replaces, not appends") {
    val idxDir = tempDir("lex_serve_idx") + "/idx"
    RetrievalOps.buildLexIndex(spark, Sf0001, idxDir)

    val queries = RetrievalOps.DefaultQueries.toDF("q_id", "query")
    val srcDir = tempDir("lex_serve_src") + "/q"
    queries.write.parquet(srcDir)
    val sinkDir = tempDir("lex_serve_sink") + "/out"

    val stream = spark.readStream.schema(queries.schema).parquet(srcDir)
    StreamingLexServe.serve(idxDir, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("q_id", "rank").collect()
      .map(r => (r.getAs[Int]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
    val got = readSink()
    val want = RetrievalOps.bm25FromIndex(spark, idxDir).collect()
      .map(r => (r.getAs[Int]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // at-least-once replay must REPLACE the epoch's output
    StreamingLexServe.writeBatch(idxDir, queries, 0L, sinkDir)
    assert(readSink() == want, "replayed batch must not duplicate the sink")
  }
}
