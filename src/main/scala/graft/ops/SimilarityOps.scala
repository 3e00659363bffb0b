package graft.ops

import graft.functions.exprs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Map-side exact top-k ranking of a scored (q_id, neighbor_id, cos)
    * set via [[graft.functions.TopKPairsAggregator]]: partial top-k per
    * partition per query, k-bounded buffer merge — the exchange carries
    * k·|partitions|·|queries| pairs instead of every scored row. The
    * `row_number` window this replaces partitioned by q_id, a |queries|-
    * value key, so each of the few reducers absorbed (and sorted) the
    * ENTIRE scored corpus for its query — the canonical 100×-scale
    * killer. Tie-break (cos desc, neighbor_id asc) is identical, so the
    * output rows — and the DuckDB oracle hash — are unchanged. */
  def topkMapSide(scored: DataFrame, k: Int): DataFrame =
    topkMapSideUnordered(scored, k).orderBy("q_id", "rank")

  /** The same bounded aggregate without the terminal presentation sort —
    * for serving paths (index probe, streaming sinks) whose consumers
    * don't need a globally ordered frame. */
  def topkMapSideUnordered(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(graft.functions.TopKPairsAggregator(k))
    scored.groupBy(col("q_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast(IntegerType).as("rank"),
        col("p.neighborId").as("neighbor_id"))
  }

  /** Exact top-k cosine neighbors for the first NumQueries vectors.
    * One narrow corpus pass (queries broadcast), then the map-side
    * bounded top-k aggregate — no window, no full-score shuffle. */
  def topkBrute(spark: SparkSession, dir: String): DataFrame = {
    val base = corpus(spark, dir)
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    topkMapSide(scored, K)
  }

  /** Hard-negative mining for contrastive training: per query vector,
    * the top-k most-similar vectors carrying a DIFFERENT label — the
    * near-misses a retrieval/embedding model learns the most from
    * (in-batch random negatives are trivially separable; the hard set is
    * what sharpens the margin). Same plan as [[topkBrute]] — queries
    * broadcast over ONE corpus pass (the label-mismatch predicate rides
    * the broadcast join, pruning before scoring), then the map-side
    * bounded top-k aggregate. No window, no full-score shuffle; at
    * 100 TB this is the mining pass run per training epoch. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val scored = base
      .join(broadcast(queries), col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    topkMapSide(scored, K)
  }

  /** MMR candidate-pool size (the re-ranker's input cut) and the
    * diversified cut it serves — pool ≫ cut so diversity has room to
    * act. Production pools come from the ANN probe paths (knnJoinIndexed
    * et al.); the registry entry anchors on the exact-dot pool so the
    * greedy itself is value-oracled. */
  private[graft] val MmrPool = 8
  private[graft] val MmrTopK = 4

  /** Exact int64 dot product over two scaled-integer vectors. */
  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein '98)
    * at λ = 1/2 — the diversity pass a RAG/retrieval serving stack runs
    * between candidate generation and the context window: greedily pick
    * argmax_c [λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)], so near-duplicate
    * candidates cost their redundancy. At λ = 1/2 the doubled objective
    * is rel − max_sim: vectors ride the [[EmbedOps.Scale]] integer
    * grid, every dot product and score is exact int64, ties break to
    * the lower id — the greedy is fully value-oracled (DuckDB replays
    * all [[MmrTopK]] rounds) with no floating point anywhere.
    *
    * Scale shape: the [[NumQueries]]-row query set broadcasts over ONE
    * corpus scan into the map-side bounded top-[[MmrPool]] aggregate
    * (the [[topkBrute]] plan); the greedy then runs on |Q|·pool rows —
    * constant-size joins independent of corpus scale, eagerly
    * materialized once (localCheckpoint) so the [[MmrTopK]] rounds
    * never rescan the corpus. At production scale the pool swaps to an
    * ANN probe path and the greedy is unchanged. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val se = Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * EmbedOps.Scale).cast(LongType)).as("v"))
    val queries = se.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = se.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        dotL(col("qv"), col("v")).cast(DoubleType).as("cos"))
    // |Q|·MmrPool rows; lineage truncated so the greedy never rescans
    val pool = topkMapSideUnordered(scored, MmrPool)
      .select(col("q_id"), col("neighbor_id").as("cand"))
      .join(se.select(col("vec_id").as("cand"), col("v").as("cv")), "cand")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("cand"), dotL(col("qv"), col("cv")).as("rel"),
        col("cv"))
      .localCheckpoint()
    def argmax(cands: DataFrame, round: Int): DataFrame =
      cands.groupBy(col("q_id"))
        .agg(max(struct((col("rel") - col("ms")).as("s"), (-col("cand")).as("nc")))
          .as("m"))
        .select(col("q_id"), (-col("m.nc")).as("cand"))
        .join(cands, Seq("q_id", "cand"))
        .select(col("q_id"), lit(round).as("round"), col("cand"), col("rel"),
          col("ms"), col("cv"))
    var selected = argmax(pool.withColumn("ms", lit(0L)), 1)
    for (r <- 2 to MmrTopK) {
      val rem = pool.join(selected.select(col("q_id"), col("cand")),
        Seq("q_id", "cand"), "left_anti")
      val msTab = rem
        .join(selected.select(col("q_id"), col("cv").as("sv")), Seq("q_id"))
        .select(col("q_id"), col("cand"), dotL(col("cv"), col("sv")).as("sim"))
        .groupBy(col("q_id"), col("cand")).agg(max(col("sim")).as("ms"))
      selected = selected.union(argmax(pool.join(msTab, Seq("q_id", "cand")), r))
    }
    selected.select(col("q_id"), col("round"), col("cand").as("neighbor_id"),
      col("rel").as("rel_dot"), col("ms").as("max_sim"),
      (col("rel") - col("ms")).as("score2"))
      .orderBy("q_id", "round")
  }

  /** Neighborhood size cap for the bitext margin denominator (Artetxe &
    * Schwenk use k=4); a side smaller than MineK averages over however
    * many cross-side neighbors it actually has. */
  val MineK = 4

  /** Margin acceptance threshold: ratio > 1 means the candidate pair is
    * closer than either side's average neighborhood. 1.20 is the point
    * inside the synthetic margin spread (1.03–1.60 across SFs) where
    * BOTH accepted and rejected mutual-best pairs exist at every test
    * SF, so both branches of the flag are value-checked. */
  val MarginTau = 1.20

  /** Margin-based bitext mining (Artetxe & Schwenk '19, the
    * LASER/CCMatrix parallel-corpus miner): candidate translation pairs
    * between two embedding spaces — label 0 and label 1 stand in for
    * the two languages — are MUTUAL nearest neighbors, scored by the
    * ratio margin cos(x,y) / ((avgₖ(x) + avgₖ(y)) / 2), where avgₖ is
    * the mean cosine of a vector's k nearest cross-side neighbors. The
    * ratio normalizes away hubness: a vector that is "close to
    * everything" has a high neighborhood average, so its pairings need
    * proportionally higher absolute similarity to clear τ.
    *
    * Exactness: the k neighbor cosines fold in rank order (the
    * aggregator emits them sorted), the oracle sums the same explicit
    * left-associated chain, and every remaining step is one IEEE
    * division/addition — so margins hash bit-for-bit against DuckDB.
    *
    * Scale shape: the cross-side scoring uses the [[topkBrute]]
    * discipline — one side broadcasts over ONE pass of the other, then
    * BOUNDED map-side top-k aggregates per direction (k·|side| rows to
    * the wire, no windows, no full-score shuffle). The two directions
    * re-score rather than materialize the |A|×|B| cosine table —
    * recompute is the cheaper trade at corpus scale. When neither side
    * broadcasts, candidate generation swaps to the bucketed kNN join
    * ([[knnJoinIndexed]]) with the same margin arithmetic on top. */
  def bitextMarginMine(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val a = base.filter(col("label") === 0)
      .select(col("vec_id").as("a_id"), col("v").as("av"))
    val b = base.filter(col("label") === 1)
      .select(col("vec_id").as("b_id"), col("v").as("bv"))
    val scored = b.join(broadcast(a))
      .select(col("a_id"), col("b_id"),
        cosine_similarity(col("av"), col("bv")).as("cos"))
    val topk = udaf(graft.functions.TopKPairsAggregator(MineK))
    // per-side rollup: best cross-side neighbor + rank-ordered k-mean
    def side(key: String, nbr: String): DataFrame = scored
      .groupBy(col(key))
      .agg(topk(col("cos"), col(nbr)).as("top"))
      .select(col(key),
        element_at(col("top"), 1).getField("neighborId").as(s"best_$nbr"),
        element_at(col("top"), 1).getField("cos").as(s"cos_$key"),
        // divide by the ACTUAL neighborhood size, not the constant k: a
        // side with fewer than MineK vectors yields a shorter top list,
        // and dividing its sum by k would deflate the mean and inflate
        // every margin on that side
        (aggregate(transform(col("top"), s => s.getField("cos")),
          lit(0.0), (acc, x) => acc + x) / size(col("top"))).as(s"avg_$key"))
    val fwd = side("a_id", "b_id")
    val bwd = side("b_id", "a_id")
    fwd.join(bwd,
        col("best_b_id") === col("b_id") && col("best_a_id") === col("a_id"))
      .select(col("a_id"), col("b_id"), col("cos_a_id").as("cos"),
        (col("cos_a_id") / ((col("avg_a_id") + col("avg_b_id")) / lit(2.0)))
          .as("margin"))
      .withColumn("accepted", col("margin") >= MarginTau)
      .orderBy("a_id")
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
    topkMapSide(scored, K)
  }

  private def withBucket(spark: SparkSession, dir: String): DataFrame = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = array(planes(p).map(lit).toIndexedSeq: _*)
      // sign-bit via the cosine kernel: cos(v, plane) > 0 ⟺ dot > 0
      when(cosine_similarity(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    corpus(spark, dir).withColumn("bucket", bits.reduce(_ bitwiseOR _))
  }

  private def rankWithin(scored: DataFrame): DataFrame =
    topkMapSide(scored, K)

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

  /** Multi-table LSH index geometry: `tables` independent hash tables of
    * `planes` random hyperplanes each; a pair is a candidate when its two
    * signatures agree within Hamming distance `probeHamming` in ≥1 table.
    * Table multiplicity and probe radius are the recall knobs — a
    * cos≈0.5 pair agrees per plane with p≈0.67, so per 8-bit table the
    * collision odds are p⁸≈0.04 (exact), ≈0.20 at Hamming≤1, ≈0.48 at
    * Hamming≤2; miss probability decays as (1−per-table)ᵗᵃᵇˡᵉˢ. */
  final case class LshIndexConfig(tables: Int, planes: Int, probeHamming: Int, seed: Long) {
    require(tables >= 1 && planes >= 1 && planes <= 20 && probeHamming >= 0
      && probeHamming <= planes)
    /** All XOR probe masks reaching signatures within `probeHamming`. */
    def probeMasks: Seq[Long] =
      (0L until (1L << planes)).filter(java.lang.Long.bitCount(_) <= probeHamming)
  }

  /** kNN-join layout: 4×8-bit tables with Hamming-1 probes. MEASURED
    * (TuneLsh sweep, sf0.01, vs the hash-green exact anchor — frontier
    * table in PLANS.md §x_sim_knn_join): recall@5 = 0.40 at 37k
    * candidates — the cheap rank-quality point; doubling tables buys
    * 0.61 at 66k, Hamming-2 buys 0.80 at 118k. 8-bit tables dominate
    * 12/16-bit at this corpus size (wider buckets go empty). */
  val KnnJoinConfig: LshIndexConfig = LshIndexConfig(4, 8, 1, 1337)

  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[LshIndexConfig, Array[Array[Array[Double]]]]
  private def planesFor(cfg: LshIndexConfig): Array[Array[Array[Double]]] =
    planeCache.getOrElseUpdate(cfg, {
      val rnd = new scala.util.Random(cfg.seed)
      Array.fill(cfg.tables, cfg.planes, Dim)(rnd.nextGaussian())
    })

  /** kNN JOIN: top-k cosine neighbors for EVERY corpus vector (not a
    * small query set) — the all-corpus companion to annLsh that
    * embedding-level near-dup and cluster-balancing pipelines need, where
    * broadcasting queries is impossible because the query set IS the
    * corpus. Candidates are generated by multi-table multi-probe
    * hyperplane bucketing: the corpus is indexed once per (table,
    * bucket), each vector probes every bucket within the probe radius in
    * every table, and the self-join shuffles ONCE on the (table, bucket)
    * key — never |corpus|² pairs. Each pair is emitted only by its FIRST
    * colliding table (locally decidable from the signature vectors both
    * sides carry — same ownership trick as MinHashBucketPairs /
    * SimHashPairs), so candidates arrive globally unique with no
    * cross-bucket dropDuplicates exchange. Ranking is a per-vector window
    * top-k. Approximate — recall vs brute-force ranking pinned by spec. */
  /** Multi-table LSH index rows (vec_id, v, bkts, tbl, bkt) for ANY
    * (vec_id, v) vector set — one pass, `cfg.tables` rows per vector;
    * `bkts` is the full signature vector that makes pair ownership
    * locally decidable. Shared by the corpus index build and external
    * query sets (the serving probe / streaming twin). */
  private def indexRowsOf(vecs: DataFrame,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame = {
    val ps = planesFor(cfg)
    val sigs = (0 until cfg.tables).map { t =>
      (0 until cfg.planes).map { p =>
        val plane = array(ps(t)(p).map(lit).toIndexedSeq: _*)
        when(cosine_similarity(col("v"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
    vecs
      .select(col("vec_id"), col("v"), array(sigs: _*).as("bkts"))
      .select(col("vec_id"), col("v"), col("bkts"),
        posexplode(col("bkts")).as(Seq("tbl", "bkt")))
  }

  private def knnIndexPlan(spark: SparkSession, dir: String,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame =
    indexRowsOf(corpus(spark, dir), cfg)

  /** Materialize the kNN index — the write-once / probe-many form: the
    * hyperplane signatures are computed in ONE corpus pass and persisted
    * bucket-partitioned, so every subsequent kNN join (or external query
    * batch) reads parquet instead of recomputing 32 dot products per
    * vector per side. This is the shape the PLANS.md audit calls for at
    * 100 TB. */
  def buildKnnIndex(spark: SparkSession, dir: String, indexDir: String,
      cfg: LshIndexConfig = KnnJoinConfig): Unit =
    knnIndexPlan(spark, dir, cfg).write.mode("overwrite").parquet(indexDir)

  /** Candidate generation over any index DataFrame (from `knnIndexPlan`
    * inline or `spark.read.parquet` of a built index). Pairs are emitted
    * exactly once: at the join output both sides carry their full
    * signature vector, so the FIRST table where the signatures agree
    * within the probe radius is computable locally, and only that table's
    * bucket emits the pair — the same first-agreeing-bucket ownership
    * MinHashBucketPairs/SimHashPairs use; no dropDuplicates exchange.
    * (Within one table at most one probe mask can match — the XOR
    * difference is a fixed value — so ownership only needs the table.) */
  private def candidatesOf(indexed: DataFrame,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame =
    candidatesAgainst(indexed, indexed, cfg)

  /** Candidates of an arbitrary query index-row set against a (possibly
    * materialized) corpus index — the self-join form above is the
    * queries-ARE-the-corpus special case. A query sharing its id with a
    * corpus vector excludes that vector (self-match suppression). */
  private def candidatesAgainst(indexed: DataFrame, queryRows: DataFrame,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame = {
    val masks = array(cfg.probeMasks.map(lit).toIndexedSeq: _*)
    val probes = queryRows.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("bkts").as("qbkts"), col("tbl"),
      explode(transform(masks, m => col("bkt").bitwiseXOR(m))).as("bkt"))
    val firstCollidingTbl = array_position(
      zip_with(col("qbkts"), col("bkts"),
        (a, b) => bit_count(a.bitwiseXOR(b)) <= lit(cfg.probeHamming)),
      true) - 1
    indexed.join(probes, Seq("tbl", "bkt"))
      .filter(col("q_id") =!= col("vec_id"))
      .filter(col("tbl") === firstCollidingTbl)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
  }

  /** Serving probe: top-k neighbors from a MATERIALIZED index for an
    * EXTERNAL (q_id, v) query set — the read side of the write-once /
    * probe-many shape (`buildKnnIndex` writes, this probes; the streaming
    * twin `graft.streaming.StreamingKnnServe` feeds micro-batches here).
    * The query batch is signature-hashed in one narrow pass and joined on
    * (table, bucket); at serving scale the query side is small, so AQE
    * broadcasts it and the index is read bucket-pruned. */
  def probeIndex(index: DataFrame, queries: DataFrame, k: Int = 5,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame = {
    val qRows = indexRowsOf(queries.select(col("q_id").as("vec_id"), col("v")), cfg)
    topkMapSideUnordered(candidatesAgainst(index, qRows, cfg), k)
  }

  /** Scored candidate pairs of the kNN join (q_id, neighbor_id, cos),
    * globally unique by construction — shared by the ranked top-k form
    * below and the ANN near-dup clustering path. */
  def knnCandidates(spark: SparkSession, dir: String,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame =
    candidatesOf(knnIndexPlan(spark, dir, cfg), cfg)

  /** kNN join against a MATERIALIZED index (see `buildKnnIndex`): same
    * rows as `knnJoin`, zero signature recomputation. */
  def knnJoinFromIndex(spark: SparkSession, indexDir: String, k: Int = 5,
      cfg: LshIndexConfig = KnnJoinConfig): DataFrame =
    topkMapSide(candidatesOf(spark.read.parquet(indexDir), cfg), k)

  /** Deterministic on-disk location of the materialized kNN index for a
    * data directory — tagged with the index version AND the source file's
    * (size, mtime) stamp, so neither a config change nor regenerated
    * source data can ever silently serve a stale index. */
  def knnIndexDirFor(dir: String): String =
    stampedIndexDir("graft_knn_index_v2_", dir, "embeddings.parquet")

  /** Build the materialized index iff absent; returns its location. */
  def ensureKnnIndex(spark: SparkSession, dir: String): String = {
    val idx = knnIndexDirFor(dir)
    if (!new java.io.File(idx, "_SUCCESS").exists()) buildKnnIndex(spark, dir, idx)
    idx
  }

  /** The write-once / probe-many kNN join: same rows as `knnJoin`, but
    * signatures come from the materialized parquet index (built on first
    * use; Bench pre-builds it untimed) — the 100 TB serving shape where
    * the 32-dot-product signature pass is paid once, not per query run. */
  def knnJoinIndexed(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    knnJoinFromIndex(spark, ensureKnnIndex(spark, dir), k)

  /** EXACT kNN join — top-k cosine neighbors of every corpus vector by
    * brute force. Size-gated like `DedupOps.embedCosine` (all-pairs is a
    * cartesian no cluster survives at corpus scale): this is the
    * value-checked accuracy anchor the approximate family is measured
    * against — DuckDB-oracled end to end, and the spec reports the ANN
    * paths' recall against it. */
  def knnExact(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = corpus(spark, dir)
    val n = emb.count()
    require(n <= DedupOps.ExactAllPairsMaxRows,
      s"knnExact is the exact all-pairs validation anchor (n=$n > " +
        s"${DedupOps.ExactAllPairsMaxRows}); use knnJoin for the approximate scale path")
    topkMapSide(
      emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("neighbor_id"),
          cosine_similarity(col("a.v"), col("b.v")).as("cos")), k)
  }

  /** Per-label embedding CENTROIDS — element-wise mean per group, the
    * primitive behind IVF coarse-quantizer seeding, cluster balancing and
    * per-source embedding drift monitoring. Long output form (label, dim,
    * centroid) — one row per vector component.
    *
    * Scale shape: posexplode is narrow (×Dim rows, no data movement);
    * groupBy(label, dim) partial-aggregates map-side, so the shuffle
    * carries |labels|·Dim rows PER PARTITION, never the corpus.
    *
    * Determinism: float sums are order-dependent, so components are
    * scaled to exact int64 (`floor(x·10⁶)` — floor because DuckDB rounds
    * double→BIGINT while Spark truncates), summed exactly, and divided
    * back in double (two IEEE ops) — bit-identical across engines and
    * partitionings, with a documented 1e-6 quantization. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x").cast(DoubleType) * 1000000).cast(LongType)).as("s"))
      .select(col("label"), col("dim"),
        (col("s").cast(DoubleType) / col("n") / 1000000).as("centroid"))
      .orderBy("label", "dim")

  /** Symmetric per-vector int8 quantization of the embedding column:
    * scale = max|x| / 127, q_i = round-half-up(x_i / scale) ∈ [-127, 127]
    * — the standard 4× compression applied to embedding stores before
    * they are served (quantized dot products run on SIMD int8 at ~4×
    * the double throughput and a quarter of the memory/IO).
    *
    * Scale shape: embarrassingly parallel — one narrow projection per
    * row, no shuffle, no state; at 100 TB this is a pure map stage
    * pipelined into the scan. All arithmetic is double (float widening
    * is exact) with floor(x+0.5) rounding, so Spark and the DuckDB
    * oracle produce bit-identical integers; the zero-vector edge is
    * handled explicitly (scale 0 → all-zero codes). */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    int8Codes(spark, dir).orderBy("vec_id")

  private def int8Codes(spark: SparkSession, dir: String): DataFrame = {
    val dv = transform(col("embedding"), x => x.cast(DoubleType))
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), dv.as("dv"),
        (array_max(transform(dv, x => abs(x))) / 127.0).as("scale"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0, transform(col("dv"), _ => lit(0)))
          .otherwise(transform(col("dv"),
            x => floor(x / col("scale") + 0.5).cast(IntegerType)))
          .as("qvec"))
  }

  /** Exact top-k cosine over the int8-QUANTIZED codes — the serving-side
    * payoff of [[quantizeInt8]]: cosine is invariant to a positive
    * per-vector scale, so the integer codes are compared directly (no
    * dequantization), which is what lets a 100 TB embedding store serve
    * top-k from a 4×-smaller, SIMD-friendly representation. Same
    * broadcast-queries × one-corpus-pass plan as [[topkBrute]]; the
    * accuracy cost of the 8-bit rounding is pinned per-round by
    * `x_sim_quant_recall_gate` against the full-precision anchor. */
  def topkQuantized(spark: SparkSession, dir: String): DataFrame = {
    val base = int8Codes(spark, dir)
      .select(col("vec_id"), transform(col("qvec"), x => x.cast(DoubleType)).as("v"))
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    topkMapSide(scored, K)
  }

  /** Recall floor for int8-quantized top-k vs the full-precision anchor.
    * 8-bit symmetric rounding on 64-dim unit-ish vectors perturbs cosine
    * by ~1e-3 — neighbor sets barely move; the floor is far above any
    * LSH-style approximation but below 1.0 so rank swaps between
    * near-ties don't flap the gate. */
  val QuantRecallFloor = 0.9

  /** Value-checked accuracy gate for the quantized serving path:
    * recall@K of [[topkQuantized]] against [[topkBrute]], one row
    * (n_exact, floor, passes) — same pattern as [[knnRecallGate]], so a
    * quantization regression turns a CORRECTNESS row red. */
  def quantRecallGate(spark: SparkSession, dir: String): DataFrame = {
    val exact = topkBrute(spark, dir).select(col("q_id"), col("neighbor_id"))
    val quant = topkQuantized(spark, dir)
      .select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.join(quant, Seq("q_id", "neighbor_id"), "left")
      .agg(count(lit(1)).cast(IntegerType).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).cast(IntegerType).as("n_hit"))
      .select(col("n_exact"),
        lit(QuantRecallFloor).as("floor"),
        (col("n_hit").cast(DoubleType) / col("n_exact") >= QuantRecallFloor)
          .as("passes"))
  }

  /** Recall@K of an approximate top-k result against the exact
    * [[topkBrute]] anchor, folded to the standard one-row gate
    * (n_exact, floor, passes) — the DuckDB oracle computes n_exact from
    * the exact side alone and expects passes = true, so a recall
    * collapse in ANY gated ANN path turns a CORRECTNESS row red
    * per-round. Shared by the LSH / multi-probe / IVF gates below and
    * structurally identical to [[quantRecallGate]]. */
  /** (n_exact, n_hit) of an approximate (q_id, neighbor_id) set against
    * an exact one — THE recall definition, shared by every gate, the
    * per-round telemetry and the `MeasureAnnRecall` calibration tool so
    * the floors and the measurements can never drift apart. */
  def recallCounts(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = approx.select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
    exact.select(col("q_id"), col("neighbor_id"))
      .join(hits, Seq("q_id", "neighbor_id"), "left")
      .agg(count(lit(1)).cast(IntegerType).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).cast(IntegerType).as("n_hit"))
  }

  private def annRecallGate(spark: SparkSession, dir: String,
      approx: DataFrame, floor: Double): DataFrame =
    recallCounts(topkBrute(spark, dir), approx)
      .select(col("n_exact"),
        lit(floor).as("floor"),
        (col("n_hit").cast(DoubleType) / col("n_exact") >= floor).as("passes"))

  /** Floors for the single-table LSH, multi-probe LSH and IVF serving
    * paths vs the exact anchor. MEASURED (MeasureAnnRecall, seeded
    * planes/kmeans, sf0.001/0.01/0.1): lsh = multiprobe = 0.10 at every
    * sf — on THIS corpus the query set's true neighbors are random
    * (cos ≈ 0.3-0.5), essentially never sharing a 16-plane bucket, so
    * the hit set is the guaranteed self-match; IVF at nprobe=2 reads
    * ~nprobe/k of the corpus and measures 0.56-0.62. Floors sit under
    * the measured values with drift headroom (the [[KnnRecallFloor]]
    * philosophy: they catch a broken generator — e.g. a signature
    * change that loses even the self-bucket — not noise). */
  val AnnLshRecallFloor = 0.05
  val AnnMultiProbeRecallFloor = 0.05
  val AnnIvfRecallFloor = 0.30

  /** Value-checked per-round accuracy gates for the three remaining ANN
    * serving paths (previously rows-only + spec-level floors). */
  def annLshGate(spark: SparkSession, dir: String): DataFrame =
    annRecallGate(spark, dir, annLsh(spark, dir), AnnLshRecallFloor)

  def annMultiProbeGate(spark: SparkSession, dir: String): DataFrame =
    annRecallGate(spark, dir, annLshMultiProbe(spark, dir), AnnMultiProbeRecallFloor)

  def annIvfGate(spark: SparkSession, dir: String): DataFrame =
    annRecallGate(spark, dir, annIvf(spark, dir), AnnIvfRecallFloor)

  /** Recall floor the approximate kNN join must clear against the exact
    * anchor — the accuracy SLO enforced by the hash-green gate entry
    * `x_sim_knn_recall_gate`. RE-MEASURED round 11 (TuneLsh full
    * tables×planes×hamming sweep, sf0.01, curve in PLANS.md §round-11):
    * the default [[KnnJoinConfig]] (4×8-bit, Hamming-1) sits at
    * recall@5 = 0.396 / 37k candidates; neighboring configs land at
    * 0.32 (8×12 H2 twice the candidates) and 0.61 (8×8 H1 double
    * tables), so 0.396 is a genuine config point, not noise. The floor
    * sits just under the measured plateau — ~12% drift headroom — so a
    * generator regression (lost table, broken probe mask) reds the
    * gate while seed-level wobble does not. */
  val KnnRecallFloor = 0.35

  /** Recall@k of the LSH kNN join against the exact anchor, aggregated to
    * ONE row — ANN accuracy as a per-round CORRECTNESS observable instead
    * of a spec-only number. Both sides are deterministic (seeded planes,
    * tie-broken windows), so the value is stable per dataset. */
  def knnRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    recallCounts(knnExact(spark, dir, k), knnJoin(spark, dir, k))
      .select(col("n_exact"), col("n_hit"),
        (col("n_hit").cast(DoubleType) / col("n_exact")).as("recall_at_k"))
  }

  /** The value-checked ANN accuracy gate: (n_exact, floor, passes) with
    * passes = recall@k ≥ `KnnRecallFloor`. The DuckDB oracle computes
    * n_exact exactly and expects passes = true, so a recall collapse in
    * the candidate generator turns a CORRECTNESS row red — accuracy is
    * gated per round, not just in the spec suite. */
  def knnRecallGate(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    knnRecall(spark, dir, k).select(
      col("n_exact"),
      lit(KnnRecallFloor).as("floor"),
      (col("recall_at_k") >= KnnRecallFloor).as("passes"))

  def knnJoin(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    topkMapSide(knnCandidates(spark, dir), k)

  /** Near-dup clustering layout: recall-tuned — at the cos≈0.5 decision
    * threshold a missed edge silently splits a cluster, so this path
    * spends more on candidates than the top-k join does: 8 tables with
    * Hamming-2 probes put the per-table collision odds for a cos=0.5
    * pair at ≈0.48, i.e. miss ≈ 0.52⁸ ≈ 0.5% (vs ≈41% for KnnJoinConfig,
    * which is tuned for ranked top-k where a miss only costs rank
    * quality, not a wrong dedup decision). MEASURED (TuneLsh, sf0.01):
    * recovers both directions of the corpus's threshold edge at 175k
    * candidates, recall@5 = 0.96; every cheaper 8-bit config misses the
    * edge entirely (frontier table in PLANS.md §x_sim_knn_join). */
  val ClusterRecallConfig: LshIndexConfig = LshIndexConfig(8, 8, 2, 1337)

  /** ANN embedding near-dup CLUSTERS — the production-scale twin of the
    * size-gated exact `DedupOps.embedCosine`: multi-table LSH candidates
    * ≥ threshold become an edge list, connected components collapse
    * transitive chains, one representative per cluster survives. Every
    * stage is keyed (bucket join → threshold filter → min-label
    * propagation); nothing is all-pairs at any corpus size. Rows-only
    * (hyperplane buckets are engine-internal); clustering semantics are
    * pinned by the ClusterOps planted-graph specs, a planted near-dup
    * fixture (non-emptiness asserted), and the recall floor of the
    * candidate generator vs the exact-edge twin `embedClustersExact`. */
  def annEmbedClusters(spark: SparkSession, dir: String, threshold: Double = 0.5,
      cfg: LshIndexConfig = ClusterRecallConfig): DataFrame = {
    val edges = knnCandidates(spark, dir, cfg)
      .filter(col("cos") >= threshold)
      // candidates are directed (q -> neighbor); components symmetrize
      .select(col("q_id"), col("neighbor_id"))
    ClusterOps.connectedComponents(edges)
      .select(col("component").as("cluster_id"), col("id").as("vec_id"))
      .orderBy("cluster_id", "vec_id")
  }

  /** Embedding near-dup clusters over EXACT edges — connected components
    * of the size-gated all-pairs cosine pair set. The hash-green
    * correctness anchor for the clustering path (DuckDB recursive-CTE
    * oracle, same pattern as x_dedup_clusters); `annEmbedClusters` is the
    * approximate production twin whose recall is measured against this. */
  def embedClustersExact(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val edges = DedupOps.embedCosine(spark, dir)
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"))
    ClusterOps.connectedComponents(edges)
      .select(col("component").as("cluster_id"), col("id").as("vec_id"))
      .orderBy("cluster_id", "vec_id")
  }

  /** Multi-probe ANN: each query also probes the NumPlanes buckets at
    * Hamming distance 1 from its own (one flipped hyperplane sign) — the
    * standard recall knob: ×(1+NumPlanes) probe fan-out, far cheaper than
    * more tables, and candidates are still a tiny corpus fraction.
    * Duplicate-free by construction — the probe masks are distinct, so a
    * query's 17 probed buckets are 17 DISTINCT values and a corpus row's
    * single bucket can equal at most one of them: no two probes can find
    * the same (query, neighbor) pair, and no dedup exchange is needed
    * (equality with the deduplicated form is spec-pinned). */
  def annLshMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = withBucket(spark, dir)
    val probeSet = array((lit(0L) +: (0 until NumPlanes).map(p => lit(1L << p))).toIndexedSeq: _*)
    val queries = bucketed.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(transform(probeSet, m => col("bucket").bitwiseXOR(m))).as("qbucket"))
    val scored = bucketed.join(broadcast(queries), col("bucket") === col("qbucket"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    rankWithin(scored)
  }

  // ------------------------------------------------- binary (sign-bit) codes

  /** One 32-bit sign word: bit i set iff coordinate `off + i` is strictly
    * positive. A sum of 32 literal-shift `when`s — pure codegen'd integer
    * arithmetic, and a packed half can never touch a 64-bit sign bit, so
    * the DuckDB oracle's `CAST(1 AS BIGINT) << pos` sums land on the
    * identical non-negative BIGINT values. Works on float OR double
    * element types: the `> 0d` predicate inserts an exact widening cast
    * per ELEMENT, so callers must NOT pre-transform the array — the r12
    * inline form's `transform(_, cast)` wrapper was a non-codegen lambda
    * Project that materialized a doubled copy of every vector and split
    * the pack out of the scan's whole-stage span (profiled r13). */
  private def signWord(dv: Column, off: Int): Column =
    (0 until 32).map(i =>
      when(element_at(dv, off + i + 1) > 0d, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Sign-bit binary quantization: 64-dim float32 (256 B/vector) packed
    * to TWO bigint words of 32 sign bits each (8 B/vector, 32×) — the
    * first-stage representation modern vector stores serve from; part of
    * the beyond-reference LLM-pipeline surface (the reference has no
    * vector path). Hamming
    * distance between codes (xor + popcount per word) is a monotone proxy
    * for angular distance on centered data, so a Hamming shortlist plus
    * an exact rerank of the survivors recovers most of the exact top-k at
    * a tiny fraction of the scan cost. Strictly-positive test: a 0.0
    * coordinate contributes a 0 bit in both engines (float→double cast is
    * exact, so the sign predicate can never disagree with the oracle). */
  private def signCodes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), signWord(col("embedding"), 0).as("lo"),
        signWord(col("embedding"), 32).as("hi"))

  /** The materialized code table, value-oracled (DuckDB replays the
    * shift-sum per position). At 100 TB this is a written column pair —
    * 8 bytes — that first-stage retrieval scans INSTEAD of the vectors. */
  def quantizeBinary(spark: SparkSession, dir: String): DataFrame =
    signCodes(spark, dir).orderBy("vec_id")

  /** (q_id, neighbor_id, hamming) over a packed (vec_id, lo, hi) code
    * table: queries broadcast, ONE narrow pass, two xor+popcount per
    * pair. Shared by the inline path (codes computed in the same plan)
    * and the indexed path (codes read from the materialized parquet). */
  private def hammingScoredOver(codes: DataFrame): DataFrame = {
    val queries = codes.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
    codes.join(broadcast(queries))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (bit_count(col("lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("hi").bitwiseXOR(col("q_hi")))).cast(IntegerType).as("hamming"))
  }

  private def hammingScored(spark: SparkSession, dir: String): DataFrame =
    hammingScoredOver(signCodes(spark, dir))

  /** Exact top-k by Hamming distance over the binary codes — the
    * first-stage ranking a binary-quantized store serves directly.
    * Distances are integers in [0, 64], so the ranking (hamming asc,
    * neighbor_id asc) is deterministic and the WHOLE result — ranks AND
    * distances — is a cross-engine value equality, not a recall claim.
    * Ranks through the map-side bounded aggregator: the negated distance
    * is exact in double, so (cos desc, id asc) ≡ (hamming asc, id asc). */
  def topkHamming(spark: SparkSession, dir: String): DataFrame =
    rankHamming(hammingScored(spark, dir))

  /** Rank a (q_id, v: array<double>) query set against a packed
    * (vec_id, lo, hi) code table: pack the batch (narrow — the same
    * signWord expressions the index build ran), broadcast it, two
    * xor+popcounts per pair, bounded top-k. The probe half of the
    * binary serving path, shared by the batch indexed form's semantics
    * and the streaming foreachBatch sink
    * ([[graft.streaming.StreamingBinaryServe]]). */
  def probeBinaryIndex(index: DataFrame, queries: DataFrame, k: Int = K): DataFrame = {
    val qc = queries.select(col("q_id"),
      signWord(col("v"), 0).as("q_lo"), signWord(col("v"), 32).as("q_hi"))
    rankHamming(index.join(broadcast(qc))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        (bit_count(col("lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("hi").bitwiseXOR(col("q_hi")))).cast(IntegerType).as("hamming")),
      k)
  }

  private def rankHamming(scored: DataFrame, k: Int = K): DataFrame = {
    val topk = udaf(graft.functions.TopKPairsAggregator(k))
    scored
      .select(col("q_id"), col("neighbor_id"),
        (-col("hamming")).cast(DoubleType).as("cos"))
      .groupBy(col("q_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast(IntegerType).as("rank"),
        col("p.neighborId").as("neighbor_id"),
        (-col("p.cos")).cast(IntegerType).as("hamming"))
      .orderBy("q_id", "rank")
  }

  /** Stamped location of the materialized binary-code index (the shared
    * (size, mtime) rule — a regenerated store can never serve stale
    * codes). */
  def binaryIndexDirFor(dir: String): String =
    stampedIndexDir("graft_bin_index_v1_", dir, "embeddings.parquet")

  /** Persist the packed sign words once: 8 B/vector, the artifact a
    * binary-quantized store serves first-stage retrieval from. */
  def buildBinaryIndex(spark: SparkSession, dir: String, idx: String): Unit =
    signCodes(spark, dir).write.mode("overwrite").parquet(idx)

  /** Build the binary-code index iff absent; returns its location. */
  def ensureBinaryIndex(spark: SparkSession, dir: String): String = {
    val idx = binaryIndexDirFor(dir)
    if (!new java.io.File(idx, "_SUCCESS").exists()) buildBinaryIndex(spark, dir, idx)
    idx
  }

  /** Hamming top-k served OFF the materialized code index — same rows
    * (and same oracle) as [[topkHamming]], but the packing pass is paid
    * once at build time and the probe scans a 3-column 8-byte-per-vector
    * table instead of re-deriving codes from the 256-byte vectors: the
    * number a binary-quantized serving tier actually pays per query
    * workload, and the regime where the 32× compression shows up as scan
    * time. Bench pre-builds the index untimed (the kNN/lex/PQ pattern). */
  def topkHammingIndexed(spark: SparkSession, dir: String): DataFrame =
    rankHamming(hammingScoredOver(
      spark.read.parquet(ensureBinaryIndex(spark, dir))))

  /** Hamming shortlist size for the rerank path: 64 candidates per query
    * feed the exact top-10 — the standard two-stage serving ratio (probe
    * ~6× k). Bigger shortlists buy recall linearly in rerank cost. */
  val BinaryShortlist = 64

  /** Two-stage binary serving: Hamming shortlist (top-`BinaryShortlist`
    * per query over the 8-byte codes) → exact cosine rerank of the
    * survivors → top-K. Every stage is deterministic (integer distances,
    * id tie-breaks), so unlike the LSH paths the END-TO-END result is
    * hash-oracled, not just recall-gated. Plan shape: codes pass is one
    * narrow corpus scan (queries broadcast, map-side bounded top-64);
    * the rerank joins the |q|·64-row shortlist BACK to the corpus by
    * broadcast — the full vectors are only ever read for shortlisted
    * rows, which is the entire economics of two-stage retrieval at
    * 100 TB (8-byte scan everywhere, 256-byte reads for ~nothing). */
  def topkBinaryRerank(spark: SparkSession, dir: String): DataFrame = {
    val short = udaf(graft.functions.TopKPairsAggregator(BinaryShortlist))
    val shortlist = hammingScored(spark, dir)
      .select(col("q_id"), col("neighbor_id"),
        (-col("hamming")).cast(DoubleType).as("cos"))
      .groupBy(col("q_id"))
      .agg(short(col("cos"), col("neighbor_id")).as("top"))
      .select(col("q_id"), explode(col("top")).as("p"))
      .select(col("q_id"), col("p.neighborId").as("neighbor_id"))
    val base = corpus(spark, dir)
    val queries = base.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = base
      .join(broadcast(shortlist), col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        cosine_similarity(col("qv"), col("v")).as("cos"))
    topkMapSide(scored, K)
  }

  /** Recall floor for the binary two-stage path vs the full-precision
    * anchor. MEASURED (MeasureAnnRecall): 0.77 at sf0.001, 0.76 at
    * sf0.01 — the best approximate path in the file (sign bits on
    * isotropic 64-dim vectors keep most of the angular order; the
    * 64-wide shortlist recovers the rest). Floor 0.4 is set against the
    * failure mode (a scrambled packing ⇒ recall ≈ k/N ≈ 0.01), with
    * ~2× headroom under the measurement for data drift. */
  val BinaryRecallFloor = 0.4

  /** The standard one-row accuracy gate for the binary rerank path:
    * (n_exact, floor, passes) vs [[topkBrute]] — a packing or shortlist
    * regression turns a CORRECTNESS row red per round. */
  def binaryRecallGate(spark: SparkSession, dir: String): DataFrame =
    annRecallGate(spark, dir, topkBinaryRerank(spark, dir), BinaryRecallFloor)
}
