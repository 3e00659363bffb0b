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
  * Overflow headroom: the binding term is the ppm numerator
  * head_q·1e6 ≤ 2⁶³, which requires head_q ≤ ~9.2e12 — i.e. per-dim
  * |x| ≲ 5.4 at 32 head dims (q ≤ 5.4e5, q² ≤ 2.9e11, 32·q² ≤ 9.2e12).
  * Far above the unit-norm vectors this store holds (total_q ≈ 1e10
  * observed); a store with larger coordinates must drop [[Scale]] a
  * decade before serving head_ppm.
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

  // ------------------------------------------------------------------
  // One-pass exact Gram / covariance (graft.functions.GramAggregator)
  // ------------------------------------------------------------------

  /** Store dimensionality (the synthetic embeddings table is 64-wide;
    * the aggregator itself is d-generic). */
  val Dim = 64

  /** The single global moment row: [n, s_0…s_63, q_00, q_01, …] from ONE
    * mergeable aggregation over the scaled-int64 vectors — map-side
    * combine folds every partition to one 2145-long buffer, the shuffle
    * carries |partitions| buffers, the driver never sees row data. */
  private def momentRow(spark: SparkSession, dir: String): DataFrame = {
    val gram = udaf(graft.functions.GramAggregator(Dim))
    Tables.parallel(spark, dir, "embeddings")
      .select(transform(col("embedding"),
        x => floor(x.cast(DoubleType) * Scale).cast(LongType)).as("v"))
      .agg(gram(col("v")).as("m"))
  }

  /** Upper-triangle index pairs (i ≤ j) with their offset into the moment
    * buffer — a 2080-row local relation broadcast against the 1-row
    * aggregate. */
  private def pairIndex(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      i <- 0 until Dim
      j <- i until Dim
    } yield (i, j, 1 + Dim + (i * (2 * Dim - i - 1)) / 2 + j)
    rows.toDF("i", "j", "off")
  }

  /** Exact int64 Gram matrix of the scaled store: (i, j, sxy) for i ≤ j —
    * the raw second moments a PCA/whitening/covariance consumer wants
    * kept EXACT at any corpus size (sums stay inside int64 to n ≈ 2.5e9
    * rows at this scale factor's value range). One aggregation pass, no
    * self-join; the pair expansion is a d²-row local table against the
    * single moment row. */
  def embedGram(spark: SparkSession, dir: String): DataFrame =
    pairIndex(spark).crossJoin(broadcast(momentRow(spark, dir)))
      .select(col("i"), col("j"), element_at(col("m"), col("off") + 1).as("sxy"))
      .orderBy("i", "j")

  /** Exact covariance NUMERATORS: cov_num(i,j) = n·q_ij − s_i·s_j (the
    * n²-scaled covariance, so no division ever happens and the oracle
    * compare is integer equality). Headroom: |cov_num| ≤ 2·n²·3.6e9 —
    * exact inside int64 to n ≈ 1.1e6 rows; beyond that a production run
    * derives covariance in double from [[embedGram]]'s raw moments
    * (exact to 2.5e9 rows) instead. Same single-pass plan. */
  def embedCovariance(spark: SparkSession, dir: String): DataFrame =
    pairIndex(spark).crossJoin(broadcast(momentRow(spark, dir)))
      .select(col("i"), col("j"),
        (element_at(col("m"), lit(1)) * element_at(col("m"), col("off") + 1) -
          element_at(col("m"), col("i") + 2) * element_at(col("m"), col("j") + 2))
          .as("cov_num"))
      .orderBy("i", "j")

  /** Top-principal-component self-consistency gate (the knnRecallGate
    * pattern: value-oracled `passes=true` + a hash-green anchor). The
    * driver collects the single bounded moment row (2145 longs), forms
    * the double covariance matrix, and runs deterministic power
    * iteration (fixed start, fixed 2000 steps — the store's thinnest
    * observed eigengap λ₂/λ₁ ≈ 0.987 converges the residual below 1e-10
    * by then, 10⁶× inside the gate). `passes` asserts the eigenpair
    * residual ‖Cv − λv‖ ≤ 1e-4·λ and 0 < λ ≤ trace(C) — i.e.
    * the store HAS a coherent top direction and the one-pass moments are
    * internally consistent. Driver-side numerics on O(d²) state is the
    * production shape: no per-row data ever reaches the driver. */
  def embedPcaGate(spark: SparkSession, dir: String): DataFrame = {
    val m = momentRow(spark, dir).collect()(0).getSeq[Long](0)
    val n = m(0).toDouble
    val s = Array.tabulate(Dim)(i => m(1 + i).toDouble)
    val c = Array.ofDim[Double](Dim, Dim)
    for (i <- 0 until Dim; j <- i until Dim) {
      val q = m(1 + Dim + (i * (2 * Dim - i - 1)) / 2 + j).toDouble
      val cov = (q - s(i) * s(j) / n) / n
      c(i)(j) = cov; c(j)(i) = cov
    }
    var v = Array.tabulate(Dim)(i => if (i == 0) 1.0 else 1e-3)
    var lambda = 0.0
    for (_ <- 1 to 2000) {
      val w = Array.tabulate(Dim)(i => (0 until Dim).map(j => c(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
      lambda = (0 until Dim).map(i => (0 until Dim).map(j => v(i) * c(i)(j) * v(j)).sum).sum
    }
    val resid = math.sqrt((0 until Dim).map { i =>
      val cvi = (0 until Dim).map(j => c(i)(j) * v(j)).sum
      val r = cvi - lambda * v(i); r * r
    }.sum)
    val trace = (0 until Dim).map(i => c(i)(i)).sum
    val passes = lambda > 0 && lambda <= trace + 1e-9 && resid <= 1e-4 * lambda
    import spark.implicits._
    Seq((m(0), passes)).toDF("n_vecs", "passes")
  }

  // ----------------------------------------------- nearest-centroid classify

  /** (vec_id, label, v: array<long>) — the scaled-int64 labeled view
    * (the [[graft.ops.KmeansOps]] currency: float widens exactly to
    * double, ×[[Scale]], floor to int64). */
  private def scaledLabeled(spark: SparkSession, dir: String): DataFrame =
    Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * Scale).cast(LongType)).as("v"))

  /** One centroid per LABEL: integer floor-div means over the scaled
    * view — the supervised sibling of the k-means update, collected as
    * bounded driver state (|labels|·64 longs at any corpus size). */
  private def classCentroids(spark: SparkSession, dir: String): Seq[(Int, Array[Long])] =
    classCentroidsOf(scaledLabeled(spark, dir))

  /** The centroid trainer over any (label, v) relation — separated so
    * cross-validation can train on fold complements. */
  private def classCentroidsOf(scaled: DataFrame): Seq[(Int, Array[Long])] = {
    val rows = scaled
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "val")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
      .collect()
    require(rows.nonEmpty, "embeddings table is empty")
    val dims = rows.map(_.getInt(1)).max + 1
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (lbl, rs) =>
      val arr = new Array[Long](dims)
      // floor-div in double: |s| ≤ n·Scale·|x|max ≪ 2^53, exactly
      // representable — the engine-identical integral mean
      rs.foreach(r => arr(r.getInt(1)) =
        math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong)
      (lbl, arr)
    }
  }

  /** Nearest-class-centroid classification — the cheapest supervised
    * "domain tagger" a curation pipeline runs when a labeled slice
    * exists (Rocchio/NCC): train one centroid per label, assign every
    * vector to its nearest class mean, integer-exact end to end
    * (squared scaled-int distances, argmin ties to the lowest label —
    * the `least`-over-structs kernel shared with [[KmeansOps]]).
    *
    * Scale shape: training is one keyed (label, dim) aggregate with
    * map-side combine (reduce side ≤ |labels|·dims rows at any corpus
    * size); inference is a PURE MAP — the centroid table rides into the
    * closure (production broadcasts), each row computes |labels|
    * distances and an argmin in one codegen'd projection. No shuffle,
    * no join anywhere in the inference path. */
  def centroidClassify(spark: SparkSession, dir: String): DataFrame = {
    val cents = classCentroids(spark, dir)
    scaledLabeled(spark, dir).withColumn("best", bestCentroid(cents))
      .select(col("vec_id"), col("label"),
        col("best.lbl").as("pred"), col("best.d").as("dist"))
      .orderBy("vec_id")
  }

  /** The argmin-distance kernel over a literal centroid table (ties to
    * the lowest label) — shared by the full classifier and the CV
    * folds. */
  private def bestCentroid(cents: Seq[(Int, Array[Long])]): Column =
    least(cents.map { case (lbl, cvec) =>
      struct(
        aggregate(
          zip_with(col("v"), array(cvec.toIndexedSeq.map(lit(_)): _*),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(lbl).as("lbl"))
    }: _*)

  /** Number of cross-validation folds (vec_id mod [[CvFolds]] — a
    * deterministic, engine-identical assignment). */
  val CvFolds = 5

  /** K-fold cross-validated accuracy of the centroid classifier — the
    * methodologically honest readout: [[confusionMatrix]] measures
    * self-consistency (every vector votes for its own centroid); this
    * holds each fold OUT of training, so the accuracy is generalization,
    * not memorization. Per fold: centroids from the complement, argmin
    * assignment on the held-out slice, exact integer arithmetic end to
    * end; accuracy is counts + one division.
    *
    * Scale shape: training per fold is the same keyed (label, dim)
    * aggregate with map-side combine (≤ |labels|·dims rows to the
    * driver per fold — bounded); inference stays a pure map. The
    * scaled view persists across the 5 passes so the corpus is scanned
    * once, not ten times. */
  def cvAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val all = scaledLabeled(spark, dir)
      .withColumn("fold", (col("vec_id") % CvFolds).cast(IntegerType))
      .persist()
    try {
      val perFold = (0 until CvFolds).map { f =>
        // a sparse/filtered store can leave a fold or its COMPLEMENT
        // empty (dense vec_ids never do, but the operator must not
        // assume its input's id distribution): an empty complement
        // trains no centroids → zero hits; an empty test fold must
        // yield n_correct 0 (sum over no rows is null) and a NULL
        // accuracy rather than an NPE in the collect-and-rebuild
        val train = all.filter(col("fold") =!= f)
        val cents = if (train.isEmpty) Nil else classCentroidsOf(train)
        val test = all.filter(col("fold") === f)
        val scored =
          if (cents.isEmpty) test.withColumn("hit", lit(0L))
          else test.withColumn("best", bestCentroid(cents))
            .withColumn("hit",
              when(col("label") === col("best.lbl"), 1L).otherwise(0L))
        scored.agg(
            count(lit(1)).as("n_test"),
            coalesce(sum(col("hit")), lit(0L)).as("n_correct"))
          .select(lit(f).as("fold"), col("n_test"), col("n_correct"))
      }
      val out = perFold.reduce(_.unionAll(_))
        .select(col("fold"), col("n_test"), col("n_correct"),
          when(col("n_test") > 0,
            col("n_correct").cast(DoubleType) / col("n_test").cast(DoubleType))
            .as("accuracy"))
        .orderBy("fold")
      // materialize before unpersist: the fold aggregates are tiny
      val rows = out.collect()
      import spark.implicits._
      rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSeq.toDF("fold", "n_test", "n_correct", "accuracy")
    } finally all.unpersist()
  }

  /** The (label, pred) confusion surface of [[centroidClassify]] — the
    * evaluation artifact the tagger ships with: diagonal mass is
    * self-consistency, off-diagonal cells say which domains the
    * embedding geometry conflates. One |labels|²-bounded aggregate. */
  def confusionMatrix(spark: SparkSession, dir: String): DataFrame =
    centroidClassify(spark, dir)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")

  // ------------------------------------------- JL sign projection (64→16)

  /** Output dimensionality of the Johnson–Lindenstrauss sign
    * projection — the 4× shrink step an embedding store runs before
    * coarse ANN (scan IO and index size drop 4×; distances distort by
    * the JL bound). */
  val JlOutDims = 16
  val JlInDims = 64

  /** The ±1 projection matrix, derived from md5 of "j:i" (first hex
    * nibble parity) — the content-hash currency, so the oracle replays
    * the SAME matrix in SQL and the projection is fully value-checked;
    * an RNG matrix never could be. Achlioptas (2003): ±1 entries
    * satisfy the JL guarantee like Gaussians. Computed once at class
    * load; 16×64 ints. */
  lazy val JlSigns: IndexedSeq[IndexedSeq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until JlOutDims).map { j =>
      (0 until JlInDims).map { i =>
        val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1 else -1
      }
    }
  }

  /** y_j = Σ_i s(j,i)·q_i over the scaled-int64 view — exact integer
    * output (|y_j| ≤ 64·1e5 ≈ 6.4e6, far inside int64). Served
    * exploded (vec_id, dim, y) for the value oracle.
    *
    * Scale shape: a narrow per-row projection against two LITERAL
    * arrays — no shuffle, no join, no state; pipelines into the scan
    * exactly like [[mrlHeadMass]]. At 100 TB this is the map stage
    * that halves-and-halves again the store before the ANN index. */
  def jlProject(spark: SparkSession, dir: String): DataFrame = {
    val signs = typedLit[Seq[Seq[Int]]](JlSigns.map(_.toSeq))
    val q = transform(col("embedding"),
      x => floor(x.cast(DoubleType) * Scale).cast(LongType))
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), q.as("q"))
      .select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(JlOutDims - 1)), j =>
          aggregate(sequence(lit(0), lit(JlInDims - 1)), lit(0L), (acc, i) =>
            acc + element_at(element_at(signs, (j + 1).cast(IntegerType)),
              (i + 1).cast(IntegerType)).cast(LongType) *
              element_at(col("q"), (i + 1).cast(IntegerType))))))
      .select(col("vec_id"), col("pos").cast(IntegerType).as("dim"),
        col("col").as("y"))
      .orderBy("vec_id", "dim")
  }

  /** JL energy gate: with ±1 signs, E‖y‖² = k·‖q‖² over sign draws, so
    * the store-wide ratio Σ‖y‖² / (k·Σ‖q‖²) must sit near 1 — the gate
    * allows ±20%, checked with INTEGER cross-multiplied bounds
    * ((4·den) div 5 ≤ num ≤ (6·den) div 5; the div-floor slack is < 1
    * unit on a ~1e16 scale). A broken sign matrix or a dropped
    * dimension moves the ratio far outside. Headroom: num stays inside
    * int64 to ~1.4e4 vectors at d = 64; a full-scale store runs the
    * gate per shard (the sums are trivially mergeable). */
  def jlGate(spark: SparkSession, dir: String): DataFrame = {
    val num = jlProject(spark, dir)
      .agg(sum(col("y") * col("y")).as("num"))
    val den = Tables(spark, dir, "embeddings")
      .select(lsum(sq(col("embedding"))).as("qq"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("qq")) * JlOutDims).as("den"))
    den.crossJoin(broadcast(num))
      .select(col("n_vecs"), col("num"), col("den"),
        (col("num") >= expr("(4 * den) div 5") &&
          col("num") <= expr("(6 * den) div 5")).as("passes"))
  }

  /** Centers selected by [[kcenterSelect]] — Gonzalez' farthest-point
    * greedy, the classic 2-approximation for k-center. */
  val KCenters = 4

  /** Scaled-int64 view shared by the k-center family (the [[Scale]]
    * currency — exact squared distances; headroom: 64 dims × (2·1e5)²
    * ≈ 2.6e12 per pair, far inside int64). */
  private def scaledVecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast(DoubleType) * Scale).cast(LongType)).as("v"))

  private def sqDistTo(c: Seq[Long]): Column = {
    val cl = typedLit(c)
    aggregate(sequence(lit(0), lit(c.length - 1)), lit(0L), (acc, i) => {
      val d = element_at(col("v"), (i + 1).cast(IntegerType)) -
        element_at(cl, (i + 1).cast(IntegerType))
      acc + d * d
    })
  }

  private def minDistTo(cents: Seq[Seq[Long]]): Column =
    cents.map(sqDistTo).reduce(least(_, _))

  /** Gonzalez k-center greedy over the scaled store: center 1 is the
    * smallest vec_id (a deterministic stand-in for "arbitrary"); each
    * later round adds the point FARTHEST from the chosen set (ties to
    * the smallest vec_id). Returns (round, vec_id, dist2-at-selection,
    * scaled vector) — K rows of driver state.
    *
    * Scale shape: K−1 full scans, each a narrow min-over-≤K literal
    * integer distances folded by ONE 1-row struct-max aggregate
    * (map-side combinable, no shuffle of rows, no sort) — the same
    * bounded-driver-state pattern as [[classCentroidsOf]]. The greedy
    * is inherently sequential in K (each pick conditions the next),
    * which is fine: K is a constant, the CORPUS never serializes. */
  private[graft] def kcenterSelect(vecs: DataFrame): Seq[(Int, Long, Long, Seq[Long])] = {
    val f = vecs.agg(min(struct(col("vec_id"), col("v"))).as("m"))
      .select(col("m.vec_id"), col("m.v")).collect()(0)
    val first = (1, f.getLong(0), 0L, f.getSeq[Long](1))
    (2 to KCenters).foldLeft(Vector(first)) { (chosen, r) =>
      val d = minDistTo(chosen.map(_._4))
      val p = vecs
        .agg(max(struct(d.as("d"), (-col("vec_id")).as("nid"), col("v").as("v")))
          .as("m"))
        .select(col("m.d"), col("m.nid"), col("m.v")).collect()(0)
      chosen :+ ((r, -p.getLong(1), p.getLong(0), p.getSeq[Long](2)))
    }
  }

  /** Per-directory memo of the Gonzalez selection (K rows of driver
    * state). The x_embed_kcenter and x_embed_kcenter_radius registry
    * entries both need the selected set; without sharing, the radius
    * entry re-ran the seed aggregate + K−1 full-corpus scans before its
    * own scan (r12 ADVICE). The fixture under a dir is immutable for a
    * JVM's lifetime (the suites never rewrite embeddings.parquet), so
    * dir is a sound key. */
  private val kcenterMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Long, Long, Seq[Long])]]()

  /** Selection for `dir`, computed once per JVM: runs the greedy over a
    * persisted scaled store, then caches the K-row result. */
  private def selectedCenters(spark: SparkSession, dir: String): Seq[(Int, Long, Long, Seq[Long])] =
    kcenterMemo.computeIfAbsent(dir, _ => {
      val vecs = scaledVecs(spark, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try kcenterSelect(vecs) finally vecs.unpersist()
    })

  /** The K selected centers as a table: (round, vec_id, dist2) where
    * dist2 is the squared scaled distance to the previously-chosen set
    * at selection time (0 for the seed) — monotonically non-increasing
    * by the greedy invariant. */
  def kcenterCenters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    selectedCenters(spark, dir).map { case (r, id, d, _) => (r, id, d) }
      .toDF("round", "vec_id", "dist2").orderBy("round")
  }

  /** Coverage readout for the selected centers: how far the farthest
    * point sits from its nearest center (the k-center objective) and
    * which point it is — the "is K enough" diagnostic. One scan beyond
    * the (memo-shared) selection. */
  def kcenterRadius(spark: SparkSession, dir: String): DataFrame = {
    val centers = selectedCenters(spark, dir).map(_._4)
    scaledVecs(spark, dir)
      .select(col("vec_id"), minDistTo(centers).as("d"))
      .agg(count(lit(1)).as("n_vecs"),
        max(struct(col("d"), (-col("vec_id")).as("nid"))).as("m"))
      .select(col("n_vecs"), col("m.d").as("radius2"),
        (-col("m.nid")).as("farthest_vec_id"))
  }
}
