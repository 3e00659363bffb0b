package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the embedding head-mass diagnostics (EmbedOps):
  * planted basis vectors with hand-computed ppm values, the zero-vector
  * edge, and per-vector/by-label consistency on the real store. */
class EmbedOpsSpec extends SparkSpec {

  private def basis(hot: Seq[Int]): Seq[Float] =
    (0 until 64).map(i => if (hot.contains(i)) 1.0f else 0.0f)

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val vecs = Seq(
      (0L, basis(Seq(0)), 0),       // all mass in dim 0 -> head_ppm 1e6
      (1L, basis(Seq(63)), 0),      // all mass in the tail -> head_ppm 0
      (2L, basis(Seq(0, 32)), 1),   // split head/tail -> head_ppm 500000
      (3L, Seq.fill(64)(0.0f), 1))  // zero vector -> defined as 0
      .toDF("vec_id", "embedding", "label")
    val dir = tempDir("embed_fixture")
    vecs.repartition(2).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted basis vectors produce the hand-computed ppm values") {
    val r = EmbedOps.mrlHeadMass(spark, fixtureDir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val unit = EmbedOps.Scale.toLong * EmbedOps.Scale // one 1.0f dim's q^2
    assert(r(0L) == (unit, 1000000L))
    assert(r(1L) == (unit, 0L))
    assert(r(2L) == (2 * unit, 500000L))
    assert(r(3L) == (0L, 0L))
  }

  test("real store: ppm stays in range and by-label aggregates match per-vector rows") {
    val per = EmbedOps.mrlHeadMass(spark, Sf0001).collect()
    assert(per.nonEmpty)
    per.foreach { x =>
      assert(x.getLong(1) > 0L, s"vec ${x.getLong(0)} has zero norm")
      val ppm = x.getLong(2)
      assert(ppm >= 0L && ppm <= 1000000L, s"ppm $ppm out of range")
    }
    // recompute the label roll-up from the per-vector rows
    val withLabel = EmbedOps.mrlHeadMass(spark, Sf0001)
      .join(Tables(spark, Sf0001, "embeddings").select("vec_id", "label"), "vec_id")
      .groupBy("label").agg(count(lit(1)).as("n"), sum("head_ppm").as("s"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rolled = EmbedOps.headMassByLabel(spark, Sf0001).collect()
    rolled.foreach { r =>
      val (n, s) = withLabel(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == s)
      assert(math.abs(r.getDouble(3) - s.toDouble / n) == 0.0)
    }
  }

  // ---------------------------------------- one-pass Gram / covariance

  test("gram on planted basis vectors matches hand-computed products") {
    val unit = EmbedOps.Scale.toLong * EmbedOps.Scale
    val g = EmbedOps.embedGram(spark, fixtureDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(g.size == 64 * 65 / 2)
    assert(g((0, 0)) == 2 * unit)   // e0 appears in v0 and v2
    assert(g((0, 32)) == unit)      // co-occurs only in v2
    assert(g((0, 63)) == 0L)        // never co-occur
    assert(g((32, 32)) == unit)
    assert(g((63, 63)) == unit)
    assert(g((1, 2)) == 0L)
  }

  test("covariance numerators: n*q - s_i*s_j on the planted fixture") {
    val unit = EmbedOps.Scale.toLong * EmbedOps.Scale
    val c = EmbedOps.embedCovariance(spark, fixtureDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(c((0, 0)) == 4 * 2 * unit - 4 * unit)  // n=4, s_0=2e5
    assert(c((0, 32)) == 4 * unit - 2 * unit)
    assert(c((0, 63)) == 0 - 2 * unit)
    assert(c((5, 7)) == 0L)
  }

  test("gram trace equals the head-mass total_q sum; partitioning-invariant") {
    val trace = EmbedOps.embedGram(spark, Sf0001).collect()
      .collect { case r if r.getInt(0) == r.getInt(1) => r.getLong(2) }.sum
    val totalQ = EmbedOps.mrlHeadMass(spark, Sf0001).collect()
      .map(_.getLong(1)).sum
    assert(trace == totalQ)
    val again = EmbedOps.embedGram(spark, Sf0001).collect().toSeq
    assert(again == EmbedOps.embedGram(spark, Sf0001).collect().toSeq)
  }

  test("pca gate passes and reports the store size") {
    val r = EmbedOps.embedPcaGate(spark, Sf0001).collect()(0)
    assert(r.getAs[Boolean]("passes"))
    assert(r.getAs[Long]("n_vecs") == 500L)
  }

  test("centroid classify: separable planted classes recover perfectly") {
    import spark.implicits._
    val dir = tempDir("ncc_emb")
    val rnd = new scala.util.Random(3)
    // label 0 lives near +e1, label 1 near -e1 — tight noise, wide margin
    val vecs = (0L until 40L).map { id =>
      val lbl = (id % 2).toInt
      val base = if (lbl == 0) 1.0f else -1.0f
      val v = Array.tabulate(64)(d =>
        (if (d == 0) base else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.02f)
      (id, v, lbl)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbedOps.centroidClassify(spark, dir).collect()
    assert(got.length == 40)
    got.foreach(r => assert(r.getAs[Int]("pred") == r.getAs[Int]("label"),
      s"vec ${r.getAs[Long]("vec_id")} misclassified"))
    val cm = EmbedOps.confusionMatrix(spark, dir).collect()
      .map(r => ((r.getAs[Int]("label"), r.getAs[Int]("pred")), r.getAs[Long]("n"))).toMap
    assert(cm == Map((0, 0) -> 20L, (1, 1) -> 20L))
  }

  test("centroid classify: confusion row sums reconcile with label counts on real data") {
    val cm = EmbedOps.confusionMatrix(spark, Sf0001).collect()
    val rowSums = cm.groupBy(_.getAs[Int]("label"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("n")).sum }
    val want = Tables(spark, Sf0001, "embeddings").groupBy(col("label")).count()
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    assert(rowSums == want)
    // distances are non-negative and the assignment is total
    val asg = EmbedOps.centroidClassify(spark, Sf0001).collect()
    assert(asg.length == want.values.sum)
    assert(asg.forall(_.getAs[Long]("dist") >= 0L))
  }

  test("cv accuracy: separable blobs score 1.0 on every held-out fold") {
    import spark.implicits._
    val dir = tempDir("cv_blobs")
    val rows = (0 until 20).map { i =>
      val lbl = i % 2
      val v = if (lbl == 0) Array(1.0f, 0.1f, 0f, 0f) else Array(-1.0f, -0.1f, 0f, 0f)
      (i.toLong, v.toSeq, lbl)
    }
    rows.toDF("vec_id", "embedding", "label").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbedOps.cvAccuracy(spark, dir).collect()
    assert(got.length == EmbedOps.CvFolds)
    assert(got.map(_.getAs[Long]("n_test")).sum == 20L,
      "folds must partition the store")
    got.foreach { r =>
      assert(r.getAs[Double]("accuracy") == 1.0, s"separable blobs: $r")
      assert(r.getAs[Long]("n_correct") == r.getAs[Long]("n_test"))
    }
  }

  test("cv accuracy: sparse vec_ids (empty folds + empty complement) stay total, never NPE") {
    import spark.implicits._
    // every vec_id ≡ 0 (mod CvFolds): fold 0 holds the whole store, so
    // folds 1..4 have empty TEST slices (n_test 0 → null accuracy, not
    // a getDouble NPE) and fold 0 has an empty COMPLEMENT (no training
    // rows → no centroids → zero correct, not a require/least() crash)
    val dir = tempDir("cv_sparse")
    (0 until 4).map(i => ((i * EmbedOps.CvFolds).toLong,
        Array(1.0f, 0f, 0f, 0f).toSeq, i % 2))
      .toDF("vec_id", "embedding", "label").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbedOps.cvAccuracy(spark, dir).collect()
    assert(got.length == EmbedOps.CvFolds)
    val byFold = got.map(r => r.getAs[Int]("fold") -> r).toMap
    assert(byFold(0).getAs[Long]("n_test") == 4L)
    assert(byFold(0).getAs[Long]("n_correct") == 0L)
    assert(byFold(0).getAs[Double]("accuracy") == 0.0)
    (1 until EmbedOps.CvFolds).foreach { f =>
      assert(byFold(f).getAs[Long]("n_test") == 0L)
      assert(byFold(f).getAs[Long]("n_correct") == 0L)
      assert(byFold(f).isNullAt(byFold(f).fieldIndex("accuracy")),
        s"empty fold $f must report null accuracy")
    }
  }

  test("cv accuracy: real store — folds partition, counts reconcile") {
    val got = EmbedOps.cvAccuracy(spark, Sf0001).collect()
    val total = Tables(spark, Sf0001, "embeddings").count()
    assert(got.map(_.getAs[Long]("n_test")).sum == total)
    got.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(acc == r.getAs[Long]("n_correct").toDouble / r.getAs[Long]("n_test"))
    }
  }

  test("jl signs: ±1 only, every output row mixes both signs, deterministic") {
    val s = EmbedOps.JlSigns
    assert(s.length == EmbedOps.JlOutDims && s.forall(_.length == EmbedOps.JlInDims))
    assert(s.flatten.forall(v => v == 1 || v == -1))
    s.zipWithIndex.foreach { case (row, j) =>
      assert(row.contains(1) && row.contains(-1),
        s"row $j is constant — md5 derivation broken")
    }
    assert(s == EmbedOps.JlSigns)
  }

  test("jl projection: one-hot input reads the sign column exactly") {
    val rows = EmbedOps.jlProject(spark, Sf0001)
      .filter(col("vec_id") === 0).collect()
    // reference: recompute vec 0's projection from the raw floats
    val v = Tables(spark, Sf0001, "embeddings").filter(col("vec_id") === 0)
      .collect()(0).getAs[scala.collection.Seq[Float]]("embedding")
    val q = v.map(x => math.floor(x.toDouble * EmbedOps.Scale).toLong)
    rows.foreach { r =>
      val j = r.getAs[Int]("dim")
      val want = q.zip(EmbedOps.JlSigns(j)).map { case (qi, s) => s * qi }.sum
      assert(r.getAs[Long]("y") == want, s"dim $j diverged")
    }
    assert(rows.length == EmbedOps.JlOutDims)
  }

  test("jl gate: passes on the real store; zeroed rows would trip it") {
    val g = EmbedOps.jlGate(spark, Sf0001).collect()(0)
    assert(g.getAs[Boolean]("passes"), s"energy ratio out of band: $g")
    // negative control: a matrix with half its rows zeroed keeps only the
    // 8 live dims' energy — provably below the 0.8 lower bound whenever
    // the full matrix sits inside the band (num_half ≈ num/2 ≤ 0.6·den).
    // (Note an all-ones matrix is NOT a valid control: for centered
    // embeddings E(Σq)² = Σq², so it satisfies the energy identity too —
    // permutation-type breakage is caught by the VALUE oracle, not the
    // gate; the gate guards energy loss.)
    val numHalf = EmbedOps.jlProject(spark, Sf0001)
      .filter(col("dim") < EmbedOps.JlOutDims / 2)
      .agg(sum(col("y") * col("y"))).collect()(0).getLong(0)
    val den = g.getAs[Long]("den")
    assert(numHalf < 4L * den / 5L,
      "half-zeroed matrix must fall below the energy band")
  }

  // ----------------------------------------------------------- k-center

  test("k-center: greedy walks the planted clusters farthest-first") {
    import spark.implicits._
    // four tight 2-point clusters at the corners of a 100×100 square;
    // seed = min id (0,0) → farthest corner (100,101) → the 10000-tie
    // resolves to the smallest id (2) → remaining corner (4)
    val vecs = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(0L, 1L)),
      (2L, Seq(100L, 0L)), (3L, Seq(100L, 1L)),
      (4L, Seq(0L, 100L)), (5L, Seq(0L, 101L)),
      (6L, Seq(100L, 100L)), (7L, Seq(100L, 101L)))
      .toDF("vec_id", "v").repartition(3)
    val got = EmbedOps.kcenterSelect(vecs).map(c => (c._1, c._2, c._3))
    assert(got == Seq((1, 0L, 0L), (2, 7L, 20201L),
      (3, 2L, 10000L), (4, 4L, 10000L)), s"got $got")
  }

  test("k-center: selection dist2 non-increasing; radius bounded by the last pick (sf0.001)") {
    val centers = EmbedOps.kcenterCenters(spark, Sf0001).collect()
    assert(centers.map(_.getAs[Int]("round")).toSeq == (1 to EmbedOps.KCenters))
    assert(centers.map(_.getAs[Long]("vec_id")).distinct.length == EmbedOps.KCenters)
    val dists = centers.drop(1).map(_.getAs[Long]("dist2"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      "greedy picks must be farthest-first")
    val r = EmbedOps.kcenterRadius(spark, Sf0001).collect()(0)
    assert(r.getAs[Long]("n_vecs") ==
      Tables(spark, Sf0001, "embeddings").count())
    // adding center K only shrinks distances: radius ≤ pick K's dist2
    assert(r.getAs[Long]("radius2") <= dists.last)
    assert(r.getAs[Long]("radius2") > 0L)
  }
}
