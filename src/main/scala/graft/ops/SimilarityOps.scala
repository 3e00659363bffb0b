package graft.ops

import graft.functions.exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`Array[Float]`, 64-dim).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - brute-force exact top-k: broadcast the (small) query set against the
  *    (huge) corpus scan — one narrow pass over the corpus, no corpus
  *    shuffle, exact results. This is the correctness anchor and is
  *    already the right 100 TB plan when |queries| is small.
  *  - LSH-bucketed ANN (random hyperplanes): corpus is pre-bucketed by a
  *    16-bit signature; a query probes only its bucket — sublinear work
  *    per query at the cost of recall. Multi-probe (flipping low-margin
  *    bits) is the standard recall knob; bucket skew is bounded because
  *    hyperplane buckets are balanced for centered data.
  *
  * The cosine kernel is the custom CosineSimilarity expression — one
  * tight-loop eval per pair, formula-identical to DuckDB's
  * list_cosine_similarity so the oracle can compare values, not just
  * ranks.
  */
object SimilarityOps {

  private val K = 10
  private val NumQueries = 10

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))

  /** Exact top-k cosine neighbors for the first NumQueries vectors. */
  def topkBrute(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir)
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  /** Random-hyperplane LSH: 16 seeded pseudo-random planes → 16-bit bucket
    * signature. Deterministic (fixed seed), engine-internal → rows-only. */
  private val NumPlanes = 16
  private val Dim = 64
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** ANN top-k: probe only the query's LSH bucket. Approximate — recall
    * measured against topkBrute in the test suite. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = array(planes(p).map(lit).toIndexedSeq: _*)
      // sign-bit via the cosine kernel: cos(v, plane) > 0 ⟺ dot > 0
      when(cosine_similarity(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    val bucketed = corpus(spark, dir)
      .withColumn("bucket", bits.reduce(_ bitwiseOR _))
    val queries = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("qbucket"))
    val scored = bucketed.join(broadcast(queries), col("bucket") === col("qbucket"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }
}
