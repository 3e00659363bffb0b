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

  /** IVF ANN: k-means coarse quantizer over the corpus (the classic
    * inverted-file index build), then each query probes its `nprobe`
    * nearest cells and ranks candidates exactly. The index build is one
    * MLlib KMeans fit (distributed); the probe set is derived driver-side
    * from the query vectors — bounded by |queries|, which is small by
    * construction in a top-k serving path. At 100 TB the cell assignment
    * is a materialized column and probes touch |corpus|·nprobe/k rows. */
  def annIvf(spark: SparkSession, dir: String, k: Int = 8, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base = corpus(spark, dir)
    val feat = base.withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(k).setSeed(42).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat).select(col("vec_id"), col("v"), col("cell"))
    val centers = model.clusterCenters.map(_.toArray)

    // probe table: (q_id, qv, cell) for the nprobe nearest centroids of
    // each query — |queries|×nprobe rows, built from a bounded collect
    val queryRows = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("v")).collect()
    val probeRows = queryRows.flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Double](1).toArray
      def l2(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < qv.length) { val d = qv(i) - c(i); s += d * d; i += 1 }
        s
      }
      centers.zipWithIndex.sortBy { case (c, _) => l2(c) }.take(nprobe)
        .map { case (_, cell) => (qid, qv.toSeq, cell) }
    }.toSeq
    import spark.implicits._
    val probes = probeRows.toDF("q_id", "qv", "cell")

    val scored = assigned.join(broadcast(probes), "cell")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  private def withBucket(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = array(planes(p).map(lit).toIndexedSeq: _*)
      // sign-bit via the cosine kernel: cos(v, plane) > 0 ⟺ dot > 0
      when(cosine_similarity(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    corpus(spark, dir).withColumn("bucket", bits.reduce(_ bitwiseOR _))
  }

  private def rankWithin(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  /** ANN top-k: probe only the query's LSH bucket. Approximate — recall
    * measured against topkBrute in the test suite. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = withBucket(spark, dir)
    val queries = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("qbucket"))
    val scored = bucketed.join(broadcast(queries), col("bucket") === col("qbucket"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    rankWithin(scored)
  }

  /** kNN-join LSH layout: L independent hash tables of `KnnPlanes`
    * hyperplanes each. An all-corpus join can't lean on "query is its own
    * bucket" like the serving path does, so recall comes from table
    * multiplicity: a cos≈0.5 neighbor pair collides in ≥1 of 4 8-bit
    * tables (with Hamming-1 probes) with probability ≈0.6, vs ≈0.02 for
    * one 16-bit table. Candidate volume stays a tiny corpus fraction
    * (random pairs collide at ~L·(probes)/2^planes ≈ 1/7 per corpus
    * row pair at 8 bits — filtered before ranking). */
  private val KnnTables = 4
  private val KnnPlanes = 8
  private lazy val knnPlanes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(1337)
    Array.fill(KnnTables, KnnPlanes, Dim)(rnd.nextGaussian())
  }

  /** kNN JOIN: top-k cosine neighbors for EVERY corpus vector (not a
    * small query set) — the all-corpus companion to annLsh that
    * embedding-level near-dup and cluster-balancing pipelines need, where
    * broadcasting queries is impossible because the query set IS the
    * corpus. Candidates are generated by multi-table multi-probe
    * hyperplane bucketing: the corpus is indexed once per (table,
    * bucket), each vector probes its own bucket plus the KnnPlanes
    * Hamming-1 buckets in every table, and the self-join shuffles ONCE on
    * the (table, bucket) key — never |corpus|² pairs. Duplicate candidate
    * pairs collapse before ranking; ranking is a per-vector window top-k.
    * Approximate — recall vs the brute-force ranking is pinned by spec. */
  /** The multi-table LSH index rows (vec_id, v, tbl, bkt) — one corpus
    * pass, KnnTables rows per vector. */
  private def knnIndexPlan(spark: SparkSession, dir: String): DataFrame = {
    val tableBuckets = (0 until KnnTables).map { t =>
      val bits = (0 until KnnPlanes).map { p =>
        val plane = array(knnPlanes(t)(p).map(lit).toIndexedSeq: _*)
        when(cosine_similarity(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }
      struct(lit(t).as("tbl"), bits.reduce(_ bitwiseOR _).as("bkt"))
    }
    corpus(spark, dir)
      .select(col("vec_id"), col("v"), explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
  }

  /** Materialize the kNN index — the write-once / probe-many form: the
    * hyperplane signatures are computed in ONE corpus pass and persisted
    * bucket-partitioned, so every subsequent kNN join (or external query
    * batch) reads parquet instead of recomputing 32 dot products per
    * vector per side. This is the shape the PLANS.md audit calls for at
    * 100 TB. */
  def buildKnnIndex(spark: SparkSession, dir: String, indexDir: String): Unit =
    knnIndexPlan(spark, dir).write.mode("overwrite").parquet(indexDir)

  /** Candidate generation over any index DataFrame (from `knnIndexPlan`
    * inline or `spark.read.parquet` of a built index). */
  private def candidatesOf(indexed: DataFrame): DataFrame = {
    val probeMasks = array((lit(0L) +: (0 until KnnPlanes).map(p => lit(1L << p))).toIndexedSeq: _*)
    val probes = indexed.select(col("vec_id").as("q_id"), col("v").as("qv"), col("tbl"),
      explode(transform(probeMasks, m => col("bkt").bitwiseXOR(m))).as("bkt"))
    indexed.join(probes, Seq("tbl", "bkt"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
      .dropDuplicates("q_id", "neighbor_id")
  }

  /** Scored candidate pairs of the kNN join (q_id, neighbor_id, cos),
    * globally deduplicated — shared by the ranked top-k form below and
    * the ANN near-dup clustering path. */
  def knnCandidates(spark: SparkSession, dir: String): DataFrame =
    candidatesOf(knnIndexPlan(spark, dir))

  /** kNN join against a MATERIALIZED index (see `buildKnnIndex`): same
    * rows as `knnJoin`, zero signature recomputation. */
  def knnJoinFromIndex(spark: SparkSession, indexDir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    candidatesOf(spark.read.parquet(indexDir))
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  def knnJoin(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
    knnCandidates(spark, dir)
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"))
      .orderBy("q_id", "rank")
  }

  /** ANN embedding near-dup CLUSTERS — the production-scale twin of the
    * size-gated exact `DedupOps.embedCosine`: multi-table LSH candidates
    * ≥ threshold become an edge list, connected components collapse
    * transitive chains, one representative per cluster survives. Every
    * stage is keyed (bucket join → threshold filter → min-label
    * propagation); nothing is all-pairs at any corpus size. Rows-only
    * (hyperplane buckets are engine-internal); clustering semantics are
    * pinned by the ClusterOps planted-graph specs and the recall floor
    * of the candidate generator. */
  def annEmbedClusters(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val edges = knnCandidates(spark, dir)
      .filter(col("cos") >= threshold)
      // candidates are directed (q -> neighbor); components symmetrize
      .select(col("q_id"), col("neighbor_id"))
    ClusterOps.connectedComponents(edges)
      .select(col("component").as("cluster_id"), col("id").as("vec_id"))
      .orderBy("cluster_id", "vec_id")
  }

  /** Multi-probe ANN: each query also probes the NumPlanes buckets at
    * Hamming distance 1 from its own (one flipped hyperplane sign) — the
    * standard recall knob: ×(1+NumPlanes) probe fan-out, far cheaper than
    * more tables, and candidates are still a tiny corpus fraction. */
  def annLshMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = withBucket(spark, dir)
    val probeSet = array((lit(0L) +: (0 until NumPlanes).map(p => lit(1L << p))).toIndexedSeq: _*)
    val queries = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m))).as("qbucket"))
    val scored = bucketed.join(broadcast(queries), col("bucket") === col("qbucket"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
      .dropDuplicates("q_id", "neighbor_id")
    rankWithin(scored)
  }
}
