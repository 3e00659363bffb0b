package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions hook: registers the custom Catalyst kernels as
  * SQL functions, so the SQL-string surface (`spark.sql`, the way the
  * reference's users write queries) reaches the same code paths as the
  * Column API — `SELECT cosine_similarity(a, b)`,
  * `simhash64(token_hashes(split(lower(text), ' ')))`, etc.
  *
  * This is the extension tier the engine actually needs from
  * SparkSessionExtensions: function injection. No custom optimizer rules
  * or strategies are registered — every operator here is expressible as
  * DataFrame plans + expressions, and injecting planner machinery that
  * Catalyst already subsumes would be complexity without semantics. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$fn expects a literal INT, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (es: Seq[Expression]) => builder(es)))

    reg("cosine_similarity") { case Seq(a, b) => CosineSimilarity(a, b) }
    reg("sorted_jaccard") { case Seq(a, b) => SortedJaccard(a, b) }
    reg("token_hashes") { case Seq(t) => TokenHashes(t) }
    reg("shingle_hashes") { case Seq(t, k) => ShingleHashes(t, intLit(k, "shingle_hashes")) }
    reg("minhash_signature") { case Seq(h, k) =>
      MinHashSignature(h, intLit(k, "minhash_signature")) }
    reg("simhash64") { case Seq(h) => SimHash64(h) }
    reg("chunk_hashes") { case Seq(s, c) => ChunkHashes(s, intLit(c, "chunk_hashes")) }
    reg("posting_list_pairs") { case Seq(ds) => PostingListPairs(ds) }
    reg("prefix_candidate_pairs") { case Seq(ds, num, den) =>
      PrefixCandidatePairs(ds,
        intLit(num, "prefix_candidate_pairs"), intLit(den, "prefix_candidate_pairs")) }
    reg("simhash_pairs") { case Seq(ms, chunk, maxH) =>
      SimHashPairs(ms, chunk, intLit(maxH, "simhash_pairs")) }
    reg("minhash_bucket_pairs") { case Seq(ms, band, num, den) =>
      MinHashBucketPairs(ms, band,
        intLit(num, "minhash_bucket_pairs"), intLit(den, "minhash_bucket_pairs")) }
  }
}
