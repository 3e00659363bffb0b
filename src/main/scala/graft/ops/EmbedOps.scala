package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-hygiene diagnostics for the vector store feeding the
  * similarity family: how much of each vector's energy lives in its
  * leading dimensions. Matryoshka-style representations (Kusupati et
  * al., NeurIPS 2022) are trained so a prefix of the embedding is itself
  * a usable embedding; before a 100 TB store commits to serving
  * truncated vectors (2× IO/memory savings at query time), the curation
  * pipeline needs a corpus-wide read on whether the head actually
  * carries the mass. These operators compute that signal exactly.
  *
  * Determinism: each float widens exactly to double, is scaled by
  * [[EmbedOps.Scale]] and floored to int64 — identical IEEE steps in
  * Spark and DuckDB — and everything after is integer arithmetic
  * (squares, sums, floor division), so the oracle matches bit-for-bit.
  * Overflow headroom: |x| ≤ ~9.5 keeps q² ≤ 9e11, the 64-dim sum
  * ≤ 5.8e13, and the ppm numerator ≤ 5.8e19/1e2 — inside int64 for the
  * unit-norm vectors this store holds (total_q ≈ 1e10 observed).
  */
object EmbedOps {

  /** Fixed-point scale for the float→int64 quantization (1e5: five
    * decimal digits, far below float32's 7, so no information loss that
    * matters for a mass RATIO; chosen so squared sums times the ppm
    * numerator stay inside int64 — see overflow note above). */
  val Scale = 100000

  /** Prefix length treated as the matryoshka head (half of the store's
    * 64 dims — the standard 2× truncation step). */
  val HeadDims = 32

  private def sq(c: Column): Column =
    transform(transform(c, x => floor(x.cast(DoubleType) * Scale).cast(LongType)),
      v => v * v)

  private def lsum(c: Column): Column =
    aggregate(c, lit(0L), (acc, v) => acc + v)

  /** Per-vector masses: `total_q` = scaled squared L2 norm, `head_ppm` =
    * parts-per-million of that norm carried by the first [[HeadDims]]
    * dimensions (integer floor division; zero vector → 0).
    *
    * Scale shape: embarrassingly parallel — a narrow per-row projection
    * with NO shuffle, no state, no join; at 100 TB this pipelines into
    * the scan like [[SimilarityOps.quantizeInt8]]. The `orderBy` exists
    * only for the oracle; production consumers drop it. */
  def mrlHeadMass(spark: SparkSession, dir: String): DataFrame =
    headMasses(spark, dir)
      .select(col("vec_id"), col("total_q"), col("head_ppm"))
      .orderBy(col("vec_id"))

  private def headMasses(spark: SparkSession, dir: String): DataFrame = {
    val s = sq(col("embedding"))
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        lsum(s).as("total_q"), lsum(slice(s, 1, HeadDims)).as("head_q"))
      // integral div (not `/`): the ppm numerator exceeds 2^53, where
      // double division starts rounding — floor semantics match DuckDB's
      // `//` because every operand is non-negative
      .withColumn("head_ppm",
        when(col("total_q") === 0L, lit(0L))
          .otherwise(expr("head_q * 1000000 div total_q")))
  }

  /** Head-mass distribution per label: the decision table for "can this
    * label's slice be served truncated" — exact int64 ppm sums divided
    * once in double (exact-int division is IEEE-identical in both
    * engines, the `avgExact` currency).
    *
    * Scale shape: ONE hash aggregate keyed by label with map-side
    * combine; shuffle volume is |labels| rows of three int64s regardless
    * of corpus size. */
  def headMassByLabel(spark: SparkSession, dir: String): DataFrame =
    headMasses(spark, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("head_ppm")).as("sum_ppm"))
      .select(col("label"), col("n_vecs"), col("sum_ppm"),
        (col("sum_ppm").cast(DoubleType) / col("n_vecs")).as("avg_head_ppm"))
      .orderBy(col("label"))
}
