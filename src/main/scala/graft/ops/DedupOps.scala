package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, at four levels of
  * fuzziness: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the whole point — 100 TB of documents):
  *  - exact: one hash-shuffle on the text (or a digest of it), |groups|
  *    output — the optimal distributed plan.
  *  - n-gram Jaccard: inverted-index self-join (explode shingles → join on
  *    shingle → count per pair). Only pairs sharing ≥1 shingle are ever
  *    materialized. Hot shingles are the skew risk: production adds a
  *    document-frequency cap (drop shingles with df > threshold — they
  *    carry no discriminating signal); AQE skew-split covers the rest.
  *  - MinHash LSH: constant work per doc (N hashes over its shingle set),
  *    then candidates only within LSH band buckets — the standard
  *    near-linear near-dup pipeline (Broder '97).
  *  - SimHash: 64-bit signature per doc; 4×16-bit pigeonhole banding finds
  *    all pairs within Hamming distance 3 without O(n²).
  */
object DedupOps {

  /** Exact dedup via hash group-by: survivor id + multiplicity per
    * distinct text. At scale, group on xxhash64(text) first and only
    * compare full text within hash groups. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy("keep_id")

  /** k-token shingles of the lowercased text, as an array column. */
  private def shingleArr(k: Int): Column = {
    val t = split(lower(col("text")), " ")
    array_distinct(
      transform(sequence(lit(0), size(t) - k), i => concat_ws(" ", slice(t, i + lit(1), lit(k)))))
  }

  /** Exact n-gram (3-token shingle) Jaccard near-dup pairs, threshold 0.5,
    * via inverted-index join. Threshold test uses integer arithmetic
    * (3*common >= |A|+|B|) so there is no float boundary. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
    val tri = docs.select(col("doc_id"), explode(shingleArr(3)).as("sh"))
    val cnt = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = tri.as("a")
      .join(tri.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .filter(lit(3) * col("n_common") >= col("ca.n") + col("cb.n"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("n_common").cast(DoubleType) / (col("ca.n") + col("cb.n") - col("n_common")))
          .as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signature length / LSH band layout: 64 hashes = 16 bands × 4
    * rows → S-curve threshold ≈ (1/16)^(1/4) ≈ 0.5. */
  private val NumHashes = 64
  private val Bands = 16
  private val Rows = NumHashes / Bands

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard ≥ 0.5 on
    * the shingle-hash sets. Deterministic (seeded hash family h_i(s) =
    * xxhash64(s || "#i")); engine-internal hashes → rows-only oracle. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingleArr(3).as("sh"))
      // shingle-hash set: verification currency, cheaper to carry than text
      .select(col("doc_id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
    val sig = (0 until NumHashes).map { i =>
      array_min(transform(col("hs"), h => xxhash64(h, lit(i)))).as(s"mh_$i")
    }
    val signed = docs.select(col("doc_id") +: col("hs") +: sig: _*)
    val bands = array((0 until Bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((b * Rows until (b + 1) * Rows).map(i => col(s"mh_$i")): _*).as("bh"))
    }: _*)
    val buckets = signed.select(col("doc_id"), col("hs"), explode(bands).as("bk"))
      .select(col("doc_id"), col("hs"), col("bk.band"), col("bk.bh"))
    // candidates: distinct pairs co-located in ≥1 band bucket
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("a.hs").as("hs_a"),
        col("b.doc_id").as("doc_b"), col("b.hs").as("hs_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("n_common", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("n_union", size(array_union(col("hs_a"), col("hs_b"))))
      .filter(lit(2) * col("n_common") >= col("n_union"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("n_common").cast(DoubleType) / col("n_union")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document + all pairs within Hamming distance ≤ 3,
    * found by 4×16-bit chunk pigeonhole banding (a pair at distance ≤3
    * must agree on ≥1 of 4 chunks). Rows-only oracle. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sim = expr(
      """aggregate(
        |  sequence(0, 63), cast(0 as bigint),
        |  (acc, b) -> acc | if(
        |    size(filter(transform(array_distinct(split(lower(text), ' ')), t -> xxhash64(t)),
        |                h -> (h >> b) & 1 = 1)) * 2
        |      > size(array_distinct(split(lower(text), ' '))),
        |    shiftleft(cast(1 as bigint), b), cast(0 as bigint)))""".stripMargin)
    val sigs = Tables(spark, dir, "documents")
      .select(col("doc_id"), sim.as("simhash"))
    val chunks = sigs.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          (shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))).as("cv"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.cv"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (cos ≥ 0.5 — the synthetic corpus's
    * max pairwise cosine is ~0.51, so the threshold is set where signal
    * exists), exact all-pairs with id_a < id_b. Exact variant is the
    * oracle/correctness anchor; the scalable path is SimilarityOps.annLsh's
    * bucketing. */
  def embedCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("norm", sqrt(expr("aggregate(v, cast(0 as double), (a, x) -> a + x * x)")))
    emb.as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)")
          / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= 0.5)
      .orderBy("vec_a", "vec_b")
  }
}
