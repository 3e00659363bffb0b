package graft.streaming

import graft.functions.exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming similarity serving: a stream of query vectors ranked against
  * the STATIC embedding corpus — the stream-static join shape. The corpus
  * side is a bounded DataFrame (broadcast per micro-batch; at scale a
  * bucketed/cached table), the query side is unbounded, and ranking runs
  * inside `foreachBatch`, where full batch semantics (window functions)
  * apply to each micro-batch — the standard escape hatch for per-group
  * top-k on a stream, which streaming-native operators cannot express
  * without custom state.
  *
  * The scored plan per batch is exactly the batch `topkBrute` shape:
  * corpus scans once per batch, queries broadcast, CosineSimilarity
  * kernel inside whole-stage codegen. */
object StreamingTopK {

  /** Rank one micro-batch of queries against the corpus (batch-land):
    * the same `TopKPairsAggregator` map-side bounded ranking the batch
    * family uses (round 6 retired the per-query window here too — the
    * scored set is |corpus|·|batch| rows and the window funneled all of
    * them into |batch| reducers). */
  def rankBatch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    // unordered: the parquet append sink has no row order — a terminal
    // sort would pay a range exchange per micro-batch for nothing
    graft.ops.SimilarityOps.topkMapSideUnordered(scored, k)
  }

  /** Serve a query-vector stream against the static corpus into an
    * append parquet sink. `corpus` columns: (vec_id, v: array<double>);
    * `queryStream` columns: (q_id, qv: array<double>). */
  def serve(
      corpus: DataFrame, queryStream: DataFrame, k: Int,
      sinkDir: String): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        rankBatch(corpus, batch, k).write.mode("append").parquet(sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
