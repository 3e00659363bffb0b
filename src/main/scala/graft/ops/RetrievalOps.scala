package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 keyword retrieval over the document corpus — the lexical half of
  * a retrieval stack (the embedding half is SimilarityOps): Robertson/
  * Spärck Jones BM25 with k1 = 1.2, b = 0.75, the Lucene-style
  * `ln(1 + (N − df + ½)/(df + ½))` idf (always ≥ 0).
  *
  * Hash-oracle strategy: a naive double implementation is NOT
  * reproducible across engines — the per-document score is a SUM of
  * per-term doubles, and float addition is order-dependent, so Spark's
  * partial aggregation and DuckDB's row order could disagree in the last
  * ulp and flip a rank. Instead each per-term factor is floor-scaled to
  * int64 micro-units (idf·1e6, tf-saturation·1e6) and the score is their
  * integer product-sum — order-independent, partial-aggregation-safe,
  * bit-identical. The only transcendental (ln) is computed ONCE per
  * distinct query term on an identical double input; a 1-ulp libm
  * difference only matters if ln·1e6 lands within an ulp of an integer
  * boundary (p ≈ 1e-10 per term, fixed data — verified green at all
  * three SFs).
  *
  * Scale shape: ONE corpus tokenization; the query vocabulary (bounded
  * by the query workload, broadcast) filters tokens BEFORE the tf
  * shuffle, so the keyed aggregates only ever see query-term tokens;
  * doc lengths are one map-side-combined count per doc (a production
  * index materializes dl once, like the kNN index); df/idf is a
  * |vocab|-row broadcast; ranking is the bounded map-side top-k
  * aggregate ([[graft.functions.TopKPairsAggregator]]) — no window, no
  * full-score shuffle. The driver sees two scalars (N, avgdl). */
object RetrievalOps {

  val TopK = 10
  private val ScaleM = 1000000L

  /** In-vocabulary multi-word queries (the corpus vocabulary is the
    * ~31-term synthetic word soup; "dup"/"vector" are its rare tail). */
  val DefaultQueries: Seq[(Int, String)] = Seq(
    0 -> "hash join fast",
    1 -> "table scan slow",
    2 -> "window agg",
    3 -> "sort merge batch",
    4 -> "vector query dup")

  def bm25(spark: SparkSession, dir: String): DataFrame =
    bm25For(spark, dir, DefaultQueries)

  def bm25For(spark: SparkSession, dir: String,
      queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    val toks = Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // bounded driver scalars: corpus size and average doc length
    val st = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).collect()(0)
    val nDocs = st.getLong(0).toDouble
    val avgdl = st.getLong(1).toDouble / st.getLong(0)

    val qTerms = queries.flatMap { case (q, s) => s.split(" ").map(t => (q, t)) }
    val qDf = qTerms.toDF("q_id", "term")
    val vocab = qTerms.map(_._2).distinct
    val tf = toks.filter(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // Literal constants (2.2 = k1+1, 0.25 = 1−b) appear as the SAME
    // decimal literals in the DuckDB oracle — never derived (1.2+1 in
    // double is a half-ulp rounding coin-flip away from literal 2.2).
    val idfMicro =
      floor(log(lit(1.0) +
        (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) * ScaleM)
        .cast(LongType)
    val satMicro =
      floor(col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
        * ScaleM).cast(LongType)

    val scored = tf
      .join(broadcast(qDf), Seq("term"))
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("q_id"), col("doc_id"), (idfMicro * satMicro).as("part"))
      .groupBy(col("q_id"), col("doc_id")).agg(sum(col("part")).as("score"))

    // bounded top-k; scores ≤ ~1e13 ≪ 2^53, so the double round-trip
    // through the pair aggregator is exact
    val topk = udaf(graft.functions.TopKPairsAggregator(TopK))
    scored.groupBy(col("q_id"))
      .agg(topk(col("score").cast(DoubleType), col("doc_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast(IntegerType).as("rank"),
        col("p.neighborId").as("doc_id"), col("p.cos").cast(LongType).as("score"))
      .orderBy("q_id", "rank")
  }
}
