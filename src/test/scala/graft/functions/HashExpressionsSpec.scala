package graft.functions

import graft.SparkSpec
import graft.functions.exprs._
import org.apache.spark.sql.functions._

/** Direct unit tests of the custom Catalyst kernels through the Column
  * API (null behavior, shape invariants, agreement with built-ins). */
class HashExpressionsSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumps"),
      (3L, "one two"),
      (4L, "")).toDF("id", "text")
  }

  test("ShingleHashes: n-k+1 distinct sorted hashes; identical text → identical set") {
    val r = df.select(col("id"), shingle_hashes(split(col("text"), " "), 3).as("hs"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(r(1L).length == 3) // 5 tokens → 3 shingles
    assert(r(1L) == r(2L))
    assert(r(1L) == r(1L).sorted)
    assert(r(3L).length == 1) // shorter than k → whole-doc hash
  }

  test("MinHashSignature + ChunkHashes: fixed shapes, equal inputs → equal bands") {
    val sig = df.select(col("id"),
      minhash_signature(shingle_hashes(split(col("text"), " "), 3), 64).as("sig"))
    val bands = sig.select(col("id"), chunk_hashes(col("sig"), 4).as("b"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(bands(1L).length == 16)
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(3L))
  }

  test("SimHash64: identical text → distance 0; null-intolerant") {
    val r = df.select(col("id"), simhash64(token_hashes(split(col("text"), " "))).as("s"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == r(2L))
    val nullRow = df.select(simhash64(token_hashes(split(lit(null).cast("string"), " "))))
      .collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("CosineSimilarity: self = 1, orthogonal = 0, matches SQL fold") {
    import spark.implicits._
    val v = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0), Seq(3.0, 0.0, -1.0)))
      .toDF("a", "b", "c")
    val r = v.select(
      cosine_similarity(col("a"), col("b")).as("self"),
      cosine_similarity(array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0))).as("ortho"),
      cosine_similarity(col("a"), col("c")).as("x"),
      (expr("aggregate(zip_with(a, c, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)")
        / (sqrt(expr("aggregate(a, cast(0 as double), (s, x) -> s + x * x)"))
          * sqrt(expr("aggregate(c, cast(0 as double), (s, x) -> s + x * x)")))).as("foldx"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == r.getDouble(3)) // kernel bit-matches the fold
  }

  test("PostingListPairs: d ids → d(d-1)/2 normalized pairs") {
    import spark.implicits._
    val r = Seq(Seq((3L, 30), (1L, 10), (2L, 20)))
      .toDF("ds")
      .select(explode(posting_list_pairs(col("ds"))).as("p"))
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getInt(3)))
    assert(r.length == 3)
    assert(r.forall(p => p._1 < p._3))
    assert(r.contains((1L, 10, 3L, 30)))
  }

  test("PrefixCandidatePairs: length + positional bounds prune in-loop, recall stays exact") {
    import spark.implicits._
    // entries: (doc_id, n, pos) — pos = the shingle's 1-based position in
    // the doc's sorted shingle set. Threshold 1/2 → α = ⌈(na+nb)/3⌉.
    // (1,2): n=9 each, pos 1 → ub = 0 + 9 = 9 ≥ α=6 → kept
    // (1,3): length filter kills it (2·4 < 9)
    // (2,3): same
    // (4,5): n=12 each but meeting shingle at pos 12 of a / 2 of b →
    //        ub = min(11,1) + min(1,11) = 2 < α=8 → positionally pruned
    val ds = Seq(Seq(
      (1L, 9, 1), (2L, 9, 1), (3L, 4, 1), (4L, 12, 12), (5L, 12, 2))).toDF("ds")
    val got = ds.select(explode(prefix_candidate_pairs(col("ds"), 1, 2)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "length filter must prune doc 3")
    assert(!got.contains((4L, 5L)), "positional bound must prune (4,5)")
    // pairs doc 4/5 with 1/2 pass both filters at these positions:
    // e.g. (1,4): min(0,11)+min(9,1)=1 < α=7 → pruned too
    assert(!got.contains((1L, 4L)))
    // subset property: never emits a pair PostingListPairs wouldn't
    val full = ds.select(explode(posting_list_pairs(
      expr("transform(ds, e -> named_struct('doc_id', e._1, 'n', e._2))"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.subsetOf(full))
  }

  test("PrefixCandidatePairs ∀ random corpora: pruning never loses a qualifying pair") {
    import spark.implicits._
    // brute-force equivalence on random small corpora: the full prefix
    // pipeline (prefix slice + posexplode + kernel) must generate a
    // candidate SUPERSET of the true Jaccard ≥ 1/2 pairs
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val docs = (1 to 12).map { id =>
        val set = (1 to (3 + rnd.nextInt(10))).map(_ => rnd.nextInt(24).toLong)
          .distinct.sorted
        (id.toLong, set)
      }
      val truth = (for {
        (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
        c = sa.intersect(sb).size; u = sa.union(sb).distinct.size
        if 2 * c >= u
      } yield (ia, ib)).toSet
      val df = docs.toDF("doc_id", "hs").withColumn("n", size(col("hs")))
      val cands = df.select(col("doc_id"), col("n"),
        posexplode(slice(col("hs"), lit(1),
          (col("n") / lit(2)).cast("int") + lit(1))).as(Seq("p0", "sh")))
        .groupBy("sh")
        .agg(collect_list(struct(col("doc_id"), col("n"),
          (col("p0") + lit(1)).cast("int").as("pos"))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(explode(prefix_candidate_pairs(col("ds"), 1, 2)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(truth.subsetOf(cands),
        s"lost qualifying pairs: ${truth.diff(cands)} docs=$docs")
    }
  }

  test("kernels registered as SQL functions via GraftExtensions") {
    // (3,4) has exact norm 5, so self-cosine is exactly 1.0
    val one = spark.sql(
      "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c").collect()(0)
    assert(one.getDouble(0) == 1.0)
    val sh = spark.sql(
      "SELECT size(shingle_hashes(split('a b c d', ' '), 3)) AS n, " +
        "simhash64(token_hashes(split('a b c', ' '))) AS s").collect()(0)
    assert(sh.getInt(0) == 2) // 4 tokens → 2 tri-shingles
    // SQL and Column API resolve to the same expression → same bits
    import graft.functions.exprs._
    import spark.implicits._
    val viaCol = Seq("a b c").toDF("t")
      .select(simhash64(token_hashes(split(col("t"), " ")))).collect()(0).getLong(0)
    assert(sh.getLong(1) == viaCol)
  }

  test("CosineSimilarity: real codegen — no fallback, same bits as interpreted eval") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
    // CODEGEN_ONLY would throw if the expression still fell back
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val gen = df.select(cosine_similarity(col("a"), col("b"))).collect()(0).getDouble(0)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(cosine_similarity(col("a"), col("b"))).collect()(0).getDouble(0)
      assert(gen == interp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("MinHashBucketPairs: expands+verifies in one eval, emits only passing pairs") {
    import spark.implicits._
    // sorted hash sets: (a,b) jaccard 3/5 = 0.6 ≥ 0.5 passes; pairs with c share nothing
    // (band 0 owns every pair — no earlier band can exist)
    val bucket = Seq(Seq(
      (7L, Seq(1L, 2L, 3L, 4L), Seq.empty[Long]),
      (2L, Seq(1L, 2L, 3L, 5L), Seq.empty[Long]),
      (9L, Seq(10L, 11L, 12L), Seq.empty[Long]))).toDF("ms")
    val r = bucket.select(explode(minhash_bucket_pairs(col("ms"), lit(0), 1, 2)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.jaccard"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq == Seq((2L, 7L, 0.6))) // normalized doc_a < doc_b, exact jaccard
    // agreement with the standalone SortedJaccard kernel on the same pair
    val j = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 5L))).toDF("a", "b")
      .select(sorted_jaccard(col("a"), col("b")).as("j"))
      .select(col("j.n_common"), col("j.n_union")).collect()(0)
    assert(j.getInt(0) == 3 && j.getInt(1) == 5)
    // threshold 1/1 (jaccard = 1.0) filters the 0.6 pair out
    val strict = bucket
      .select(explode(minhash_bucket_pairs(col("ms"), lit(0), 1, 1)).as("p")).collect()
    assert(strict.isEmpty)
  }

  test("all kernels reachable from the SQL-string surface; SQL dedup == DataFrame twin") {
    import graft.ops.{CoreOps, DedupOps}
    // every injected function resolves and evaluates through spark.sql
    val one = spark.sql(
      """SELECT size(minhash_bucket_pairs(array(named_struct(
        |         'doc_id', 1L, 'hs', array(1L, 2L), 'bhs', array(9L)),
        |       named_struct('doc_id', 2L, 'hs', array(1L, 2L), 'bhs', array(9L))), 0, 1, 2)) AS np,
        |       size(simhash_pairs(array(named_struct('doc_id', 1L, 'simhash', 5L),
        |         named_struct('doc_id', 2L, 'simhash', 5L)), 0, 3)) AS ns,
        |       size(posting_list_pairs(array(named_struct('doc_id', 1L, 'n', 2),
        |         named_struct('doc_id', 2L, 'n', 3)))) AS npp,
        |       size(prefix_candidate_pairs(array(named_struct('doc_id', 1L, 'n', 9, 'pos', 1),
        |         named_struct('doc_id', 2L, 'n', 9, 'pos', 1)), 1, 2)) AS npc,
        |       size(chunk_hashes(array(1L, 2L, 3L, 4L), 2)) AS nch""".stripMargin).collect()(0)
    assert(one.getInt(0) == 1 && one.getInt(1) == 1 && one.getInt(2) == 1
      && one.getInt(3) == 1 && one.getInt(4) == 2)
    // the full SQL-string dedup pipeline matches the DataFrame twin row for row
    val viaSql = CoreOps.sqlKernelDedup(spark, Sf0001).collect().toSeq
    val viaDf = DedupOps.ngramJaccard(spark, Sf0001).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("wrong input types fail at ANALYSIS with a readable message, not per-row CCE") {
    // SQL-surface misuse: ints where the kernel reads longs / strings
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(1, 2, 3))").collect()
    }
    assert(e1.getMessage.contains("simhash64"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array(1.0, 2.0), array('a', 'b'))").collect()
    }
    assert(e2.getMessage.contains("cosine_similarity"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""SELECT minhash_bucket_pairs(array(named_struct(
        |'doc_id', 1L, 'hs', array(1L), 'bhs', array(1L))), CAST(0 AS BIGINT), 1, 2)""".stripMargin)
        .collect()
    }
    assert(e3.getMessage.contains("band id must be INT"))
  }

  test("MinHashBucketPairs: first-agreeing-band ownership — exactly one band emits each pair") {
    import spark.implicits._
    // two docs agreeing on bands 1 and 3 (0-indexed band-hash vectors):
    // band 1 owns the pair; bands 3's bucket must NOT re-emit it
    val ms = Seq(
      (1L, Seq(10L, 20L, 30L), Seq(100L, 7L, 101L, 9L)),
      (2L, Seq(10L, 20L, 40L), Seq(200L, 7L, 201L, 9L)))
    def emitted(band: Int): Int = Seq(ms).toDF("ms")
      .select(explode(minhash_bucket_pairs(col("ms"), lit(band), 1, 2)).as("p"))
      .collect().length
    assert(emitted(1) == 1) // first agreeing band → owner
    assert(emitted(3) == 0) // later agreeing band → disowned
  }
}
