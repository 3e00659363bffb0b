package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KmeansOps: planted-structure recovery, determinism, and internal
  * consistency between the three served projections. The hash oracle
  * (Registry `x_cluster_kmeans*` vs the unrolled DuckDB CTE) pins the
  * exact arithmetic; these specs pin the SEMANTICS on a fixture where the
  * right answer is known by construction. */
class KmeansOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Two orthogonal blobs in 64-dim space. Seed rows (vec_id < 8) split
    * 4/4 across the blobs, so Lloyd must keep the blobs in disjoint
    * cluster sets; labels encode blob membership (A=0, B=1). */
  private lazy val blobDir: String = {
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val v = Array.fill(64)(0.0f)
      v(axis) = 1.0f
      v((axis + 1) % 64) = jitter
      v
    }
    val a = (0L to 3L) ++ (100L to 109L)
    val b = (4L to 7L) ++ (200L to 209L)
    val rows =
      a.map(id => (id, vec(0, 0.01f * (id % 5)), 0)) ++
        b.map(id => (id, vec(10, 0.01f * (id % 5)), 1))
    val dir = tempDir("kmeans_blobs")
    rows.toDF("vec_id", "embedding", "label").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("kmeans: planted blobs never share a cluster; purity is exact") {
    val assign = KmeansOps.kmeansAssign(spark, blobDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assign.size == 28)
    val aClusters = assign.collect {
      case (id, c) if id <= 3 || (id >= 100 && id <= 109) => c
    }.toSet
    val bClusters = assign.collect {
      case (id, c) if (id >= 4 && id <= 7) || id >= 200 => c
    }.toSet
    assert((aClusters & bClusters).isEmpty,
      s"blobs share clusters: $aClusters vs $bClusters")
    // every cluster is pure → dominant-label share is exactly 1e6 ppm
    val purity = KmeansOps.kmeansPurity(spark, blobDir).collect()
    purity.foreach(r => assert(r.getAs[Long]("top_share_ppm") == 1000000L,
      s"cluster ${r.getInt(0)} impure"))
  }

  test("kmeans: deterministic across runs and consistent across projections") {
    val a1 = KmeansOps.kmeansAssign(spark, Sf0001).collect().toSeq
    val a2 = KmeansOps.kmeansAssign(spark, Sf0001).collect().toSeq
    assert(a1 == a2)
    a1.foreach { r =>
      val c = r.getInt(1)
      assert(c >= 0 && c < KmeansOps.K)
    }
    val prof = KmeansOps.kmeansProfile(spark, Sf0001).collect()
    assert(prof.map(_.getAs[Long]("n_vecs")).sum == a1.size)
    prof.foreach(r => assert(r.getAs[Long]("inertia") >= 0L))
    // profile sizes agree with the assignment's own cluster histogram
    val hist = a1.groupBy(_.getInt(1)).view.mapValues(_.size.toLong).toMap
    prof.foreach(r => assert(hist(r.getInt(0)) == r.getAs[Long]("n_vecs")))
    // purity row-count and sizes agree too
    val pur = KmeansOps.kmeansPurity(spark, Sf0001).collect()
    assert(pur.map(_.getInt(0)).toSeq == prof.map(_.getInt(0)).toSeq)
    pur.foreach(r => assert(hist(r.getInt(0)) == r.getAs[Long]("n_vecs")))
  }

  test("balanced sample: big clusters thin toward the target, decisions reproducible") {
    // target 2 on ~62-vector clusters -> rate ~3%: the sample must
    // collapse hard but stay non-empty and hash-deterministic
    val thin = KmeansOps.kmeansBalancedSample(spark, Sf0001, target = 2).collect()
    assert(thin.nonEmpty && thin.length < 60, s"kept ${thin.length} of 500")
    thin.foreach { r =>
      assert(r.getAs[Int]("bucket") < r.getAs[Double]("rate") * 1000.0)
    }
    assert(KmeansOps.kmeansBalancedSample(spark, Sf0001, target = 2).collect().toSeq
      == thin.toSeq)
    // clusters at-or-under the target keep everything (rate 1.0)
    val all = KmeansOps.kmeansBalancedSample(spark, Sf0001, target = 500).collect()
    assert(all.length == 500)
    all.foreach(r => assert(r.getAs[Double]("rate") == 1.0))
  }

  test("exported centroids reproduce the assignment as a nearest-centroid rule") {
    val cents = KmeansOps.kmeansCentroids(spark, Sf0001).collect()
      .groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toArray).toMap
    assert(cents.size == KmeansOps.K && cents.values.forall(_.length == 64))
    val vecs = Tables(spark, Sf0001, "embeddings").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 100000).toLong).toArray)
      .toMap
    val assign = KmeansOps.kmeansAssign(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assign.foreach { case (id, cluster) =>
      val v = vecs(id)
      val best = cents.toSeq.map { case (cid, c) =>
        (c.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum, cid)
      }.min
      assert(best._2 == cluster, s"vec $id assigned $cluster but nearest is ${best._2}")
    }
  }

  test("multimodal curation: exactly the quality∩balance intersection") {
    val kept = KmeansOps.curateMultimodal(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    val quality = TextOps.qualityCut(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    val balanced = KmeansOps.kmeansBalancedSample(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(kept == (quality & balanced))
    assert(kept.nonEmpty && kept.size < quality.size && kept.size < balanced.size)
  }

  test("semdedup: planted cell-mate duplicate pruned with min-id witness, everyone else kept") {
    // 8 orthogonal seed vectors (one per cell under the vec_id<8 seeding)
    // + vec 8 ≈ vec 0: same cell, cosine ≈ 1 ≫ τ → pruned, witness 0
    def unit(axis: Int, minor: Float = 0f): Array[Float] = {
      val v = Array.fill(16)(0.0f)
      v(axis) = 1.0f
      if (minor != 0f) v((axis + 1) % 16) = minor
      v
    }
    val rows = (0 until 8).map(i => (i.toLong, unit(i), 0)) :+ (8L, unit(0, 0.05f), 0)
    val dir = tempDir("semdedup_planted")
    rows.toDF("vec_id", "embedding", "label").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = KmeansOps.semDedup(spark, dir).collect()
      .map(x => (x.getLong(0), (x.getBoolean(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    assert(r.size == 9)
    assert(r(8L) == ((false, 0L)), s"duplicate must be pruned by witness 0: ${r(8L)}")
    (0L to 7L).foreach(id => assert(r(id) == ((true, -1L)), s"vec $id wrongly pruned: ${r(id)}"))
  }

  test("db index: scatter reconciles with profile; worst-neighbor replay exact") {
    val db = KmeansOps.kmeansDbIndex(spark, Sf0001).collect()
    assert(db.nonEmpty)
    val prof = KmeansOps.kmeansProfile(spark, Sf0001).collect()
      .map(r => r.getAs[Int]("cluster") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("inertia")))).toMap
    val cents = KmeansOps.fitCentroids(spark, Sf0001).toMap
    val scat = db.map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("scatter")).toMap
    db.foreach { r =>
      val c = r.getAs[Int]("cluster")
      val (n, inert) = prof(c)
      assert(r.getAs[Long]("n_vecs") == n)
      assert(r.getAs[Long]("scatter") == inert / n,
        "scatter must be the integral mean of the profile's inertia")
      // driver replay of the fixed IEEE tree, ties to smallest j
      val rij = scat.keys.filter(_ != c).map { j =>
        val dc = cents(c).zip(cents(j))
          .map { case (x, y) => (x - y) * (x - y) }.sum
        (j, (scat(c) + scat(j)).toDouble / dc.toDouble)
      }.toSeq
      val rmax = rij.map(_._2).max
      assert(r.getAs[Double]("r_max") == rmax)
      assert(r.getAs[Int]("worst_j") == rij.filter(_._2 == rmax).map(_._1).min)
      assert(rmax > 0.0 && r.getAs[Int]("worst_j") != c)
    }
  }
}
