package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the corpus-curation operators (CurationOps) and
  * substring-level span dedup (PretrainOps.spanDupProfile): planted
  * fixtures with known duplicated spans, greedy-order invariants for the
  * token-budget cut, exact-expectation repeat counts for epoch mixing,
  * and permutation invariants for the deterministic shuffle. */
class CurationOpsSpec extends SparkSpec {

  /** Planted corpus for span dedup: docs 0 and 1 share an 8-token run
    * embedded at DIFFERENT offsets with no aligned paragraph boundary —
    * exactly the case document- and block-level dedup both miss; docs 2
    * and 3 share no 8-token span with anything. */
  private lazy val spanDir: String = {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (0L, s"one two $shared tail words here", "en", "src0", 1L),
      (1L, s"prefix $shared and then something else entirely four", "en", "src1", 1L),
      (2L, "completely different words about spark query engines and shuffles everywhere today", "en", "src0", 1L),
      (3L, "unrelated text mentioning databases clusters and partitions in production systems", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("span_docs")
    docs.repartition(3).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("span dedup: unaligned shared 8-token run is flagged in both docs, clean docs at zero") {
    val r = PretrainOps.spanDupProfile(spark, spanDir).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2))).toMap
    assert(r(0L)._2 >= 1 && r(1L)._2 >= 1) // the planted span recurs
    assert(r(2L)._2 == 0 && r(3L)._2 == 0) // clean docs untouched
    // doc 0: 13 tokens -> 6 distinct spans; exactly one is shared
    assert(r(0L)._1 == 6 && r(0L)._2 == 1)
  }

  test("span dedup filter keeps exactly the docs under the dup_frac threshold") {
    val profile = PretrainOps.spanDupProfile(spark, spanDir).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    val kept = PretrainOps.spanDedupFilter(spark, spanDir).collect()
      .map(_.getLong(0)).toSet
    profile.foreach { case (id, frac) =>
      assert(kept.contains(id) == (frac <= PretrainOps.SpanDupMax))
    }
  }

  test("digest-keyed span twin emits identical rows to the text-keyed form") {
    assert(PretrainOps.spanDupProfileDigest(spark, spanDir).collect().toSeq ==
      PretrainOps.spanDupProfile(spark, spanDir).collect().toSeq)
    assert(PretrainOps.spanDupProfileDigest(spark, Sf0001).collect().toSeq ==
      PretrainOps.spanDupProfile(spark, Sf0001).collect().toSeq)
  }

  test("dsir: target-vocab docs outscore off-vocab docs by CONTENT, short docs sit at the prior") {
    import spark.implicits._
    // disjoint vocabularies: A-words dominate the en target, B-words
    // appear only outside it; doc 3 is A-content under a de label — the
    // score must follow the content, not the label
    val aText = "alpha beta gamma delta epsilon zeta"
    val bText = "omega psi chi phi upsilon tau"
    val docs = Seq(
      (0L, aText, "en", "src0", 1L),
      (1L, aText, "en", "src1", 1L),
      (2L, bText, "de", "src0", 1L),
      (3L, aText, "de", "src1", 1L),
      (4L, "solo", "de", "src0", 1L)) // 1 token: no bigram evidence
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("dsir_docs")
    docs.repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = CurationOps.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(3)))).toMap
    val score = (id: Long) => w(id)._2
    // identical content → identical score, regardless of lang label
    assert(score(0L) == score(1L) && score(0L) == score(3L))
    // target-vocab content above the prior, off-vocab below it, and the
    // evidence-free doc exactly between (it scores AT the corpus prior)
    assert(score(0L) > score(4L) && score(4L) > score(2L),
      s"ordering broke: a=${score(0L)} prior=${score(4L)} b=${score(2L)}")
    assert(w(4L)._1 == 0, "1-token doc must carry zero bigrams")
    // the selection cut keeps exactly the above-prior docs: A-content
    // (including the de-labelled copy), never the off-vocab or
    // evidence-free docs
    val kept = CurationOps.dsirSelect(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 3L), s"unexpected selection: $kept")
  }

  test("temperature shares: α=1/2 on a 4:1 mass split gives exactly 2:1 shares") {
    import spark.implicits._
    // lang 'en': 4 docs × 25 tokens = 100; lang 'sw': 1 doc × 25 = 25.
    // √ masses are 10:5 → temp shares exactly 2/3 and 1/3 (in ppm floor)
    val t25 = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 4).map(i => (i.toLong, t25, "en", "src0", 1L)) :+
      (4L, t25, "sw", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("temp_share_docs")
    docs.repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SamplingOps.temperatureShares(spark, dir).collect()
      .map(x => (x.getString(0), (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("en") == ((100L, 800000L, 666666L, 833332L)), s"en: ${r("en")}")
    assert(r("sw") == ((25L, 200000L, 333333L, 1666665L)), s"sw: ${r("sw")}")
    // the defining property: scarce language boosted, dominant damped
    assert(r("sw")._4 > 1000000L && r("en")._4 < 1000000L)
  }

  test("split leakage matrix is the exact composition of pairs × split labels") {
    val split = SamplingOps.splitHash(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = DedupOps.ngramJaccard(spark, Sf0001).collect()
      .map(r => (split(r.getLong(0)), split(r.getLong(1))))
      .groupBy(identity).map { case ((a, b), v) => (a, b, v.length.toLong, a != b) }
      .toSeq.sortBy(x => (x._1, x._2))
    val got = CurationOps.splitLeakage(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == DedupOps.ngramJaccard(spark, Sf0001).count())
  }

  test("cluster split: near-dup pair co-splits where the plain hash split leaks") {
    import spark.implicits._
    def plainSplit(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val b = Integer.parseInt(hex.substring(0, 4), 16) % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    // 12-token near-dup pair (last token differs → trigram jaccard
    // 7/13 ≥ 0.5); search the deterministic suffix space for a pair the
    // PLAIN content-hash split separates — the leak this op fixes
    val head = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val (base, near) = (0 until 10000).iterator
      .map(i => (s"$head mu$i", s"$head nu$i"))
      .find { case (a, b) => plainSplit(a) != plainSplit(b) }
      .getOrElse(fail("no leaking pair found in the search space"))
    val dir = tempDir("cluster_split")
    Seq((0L, base, "en", "s", base.length.toLong),
      (1L, near, "en", "s", near.length.toLong),
      (2L, "totally different words about engines and shuffles everywhere ok", "en", "s", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // plain split leaks the planted pair...
    val plain = SamplingOps.splitHash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(plain(0L) != plain(1L), "search guaranteed a leaking pair")
    // ...the cluster split does not, and the singleton keeps its rule
    val cs = CurationOps.clusterSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(cs(0L)._1 && cs(1L)._1 && cs(0L)._2 == cs(1L)._2,
      s"near-dups must co-split: $cs")
    assert(!cs(2L)._1 && cs(2L)._2 == plain(2L))
    val g = CurationOps.clusterSplitGate(spark, dir).collect()(0)
    // ngramJaccard emits each unordered pair once (doc_a < doc_b)
    assert(g.getAs[Long]("n_pairs") == 1L && g.getAs[Long]("cross_pairs") == 0L
      && g.getAs[Boolean]("passes"))
  }

  test("datasheet: planted source with known volume, languages, and duplicate load") {
    import spark.implicits._
    val dir = tempDir("datasheet_docs")
    Seq(
      (0L, "a b c", "en", "sA", 5L),       // dup text ×3 in sA
      (1L, "a b c", "en", "sA", 5L),
      (2L, "a b c", "fr", "sA", 5L),
      (3L, "d e f g", "en", "sA", 7L),
      (4L, "a b c", "en", "sB", 5L))       // same text in sB — NOT a dup there
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.corpusDatasheet(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("sA")
    assert(a.getAs[Long]("n_docs") == 4L && a.getAs[Int]("n_langs") == 2)
    assert(a.getAs[Double]("pct_en") == 0.75)
    assert(a.getAs[Long]("total_tokens") == 13L)
    assert(a.getAs[Double]("mean_tokens") == 13.0 / 4)
    assert(a.getAs[Int]("min_tokens") == 3 && a.getAs[Int]("max_tokens") == 4)
    assert(a.getAs[Long]("n_dup_texts") == 1L && a.getAs[Long]("n_dup_docs") == 3L)
    val b = r("sB")
    assert(b.getAs[Long]("n_dup_texts") == 0L && b.getAs[Long]("n_dup_docs") == 0L,
      "duplicate load is WITHIN-source: sB's single copy is not a dup")
  }

  test("budget select: output is the exact greedy quality prefix within budget") {
    val docs = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
        (lit(1.0) - TextOps.stopRatio(col("text"))).as("q"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val greedy = docs.sortBy { case (id, _, q) => (-q, id) }
    val prefix = greedy.scanLeft(0L) { case (acc, (_, n, _)) => acc + n }.tail
      .zip(greedy).takeWhile(_._1 <= CurationOps.TokenBudget).map(_._2._1).toSet

    val got = CurationOps.budgetSelect(spark, Sf0001).collect()
    assert(got.map(_.getLong(0)).toSet == prefix)
    // cum really is the global running sum: max cum == sum of selected tokens
    val totTokens = got.map(_.getInt(1).toLong).sum
    assert(got.map(_.getLong(2)).max == totTokens)
    assert(totTokens <= CurationOps.TokenBudget)
  }

  test("resample to target: limiting language keeps everything, shares approach the target") {
    val before = Tables(spark, Sf0001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = CurationOps.resampleToTarget(spark, Sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the limiting language (min count/share ratio) survives intact
    val limiting = before.keys.minBy(l =>
      (before(l).toDouble / CurationOps.TargetSharePm(l), l))
    assert(after(limiting) == before(limiting))
    // every language is downsampled-only and the share error shrinks:
    // achieved share within a few points of target (hash-bucket noise)
    val n = after.values.sum.toDouble
    after.foreach { case (l, c) =>
      assert(c <= before(l))
      val share = c / n
      val target = CurationOps.TargetSharePm(l) / 1000.0
      assert(math.abs(share - target) < 0.06, s"$l share $share vs target $target")
    }
  }

  test("quality terciles: per-language buckets are balanced and boundary-consistent") {
    val r = CurationOps.qualityTerciles(spark, Sf0001).collect()
      .map(x => (x.getString(1), x.getDouble(2), x.getString(3)))
    r.groupBy(_._1).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._3).view.mapValues(_.length).toMap
      // ~n/3 per bucket; ties on q can shift a few docs across a boundary
      val n = rows.length
      Seq("head", "middle", "tail").foreach { b =>
        assert(byBucket.getOrElse(b, 0) > 0, s"$lang has no $b docs")
        assert(math.abs(byBucket(b) - n / 3.0) <= n / 3.0,
          s"$lang bucket $b wildly unbalanced")
      }
      // ordering consistency: every head q > every tail q
      val minHead = rows.filter(_._3 == "head").map(_._2).min
      val maxTail = rows.filter(_._3 == "tail").map(_._2).max
      assert(minHead > maxTail)
    }
  }

  test("epoch mix: repeats bracket the weight and hit its expectation in aggregate") {
    val r = CurationOps.epochMix(spark, Sf0001)
    val perDoc = r.groupBy("doc_id", "source").agg(max("epoch").as("reps"))
      .collect().map(x => (x.getString(1), x.getInt(2)))
    perDoc.foreach { case (src, reps) =>
      val idx = src.drop(3).toInt
      val w = if (idx < 5) CurationOps.EpochHi
              else if (idx < 10) CurationOps.EpochMid else CurationOps.EpochLo
      assert(reps == math.floor(w).toInt || reps == math.ceil(w).toInt,
        s"$src repeats $reps outside [floor,ceil] of $w")
    }
    // epochs are dense 1..reps per doc (explode emits every epoch)
    val dense = r.groupBy("doc_id", "source")
      .agg(max("epoch").as("reps"), count(lit(1)).as("n"))
      .filter(col("reps") =!= col("n")).count()
    assert(dense == 0)
  }

  test("shuffle shards: a permutation — every doc exactly once, dense per-shard positions") {
    val r = CurationOps.shuffleShards(spark, Sf0001)
    val n = Tables(spark, Sf0001, "documents").count()
    assert(r.count() == n)
    assert(r.select("doc_id").distinct().count() == n)
    // positions are dense 1..count within every shard
    val bad = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(bad == 0)
    // id-hash shuffling separates byte-identical duplicate texts: shard
    // order is independent of doc order (doc_id 0 need not be pos 1)
    val det = CurationOps.shuffleShards(spark, Sf0001).collect().toSeq
    assert(det == r.collect().toSeq) // deterministic across re-runs
  }

  test("filter funnel: per-rule sole kills, prefix attrition, and a two-rule victim") {
    import spark.implicits._
    val dir = tempDir("funnel")
    val docs = Seq(
      (0L, "the cat sat on a mat"),                      // clean
      (1L, "the of"),                                    // sole kill: len_bounds
      (2L, "cat sat mat jumps high"),                    // sole kill: stopword_floor
      (3L, "the cat sat on !!!!!!!!!!!!!!!!!!!!"),       // sole kill: punct_ceiling
      (4L, "the num is 99999999999999999999"),           // sole kill: digit_ceiling
      (5L, "zz 11111111111111111111 qq"))                // fails stopword AND digit
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationOps.filterFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1, "len_bounds", 6L, 5L, 5L, 1L),
      (2, "stopword_floor", 6L, 4L, 3L, 1L),
      (3, "punct_ceiling", 6L, 5L, 2L, 1L),
      (4, "digit_ceiling", 6L, 4L, 1L, 1L)), s"got ${got.toSeq}")
  }

  test("filter funnel: survivors are monotone and bounded by every rule's pass count") {
    val rows = CurationOps.filterFunnel(spark, Sf0001).collect()
    val surv = rows.map(_.getAs[Long]("n_surviving"))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_surviving") <= r.getAs[Long]("n_pass_rule"))
      assert(r.getAs[Long]("n_sole_kill") <= r.getAs[Long]("n_docs") - r.getAs[Long]("n_pass_rule"))
    }
  }

  test("mass median: rare long docs carry the mass median, not the count median") {
    import spark.implicits._
    val dir = tempDir("mass_median")
    // s: four 1-char docs + one 6-char doc → count-median 1, but 6/10 of
    // the char mass lives in the long doc → mass-median 6
    (Seq((0L, "a", 1L), (1L, "b", 1L), (2L, "c", 1L), (3L, "d", 1L),
      (4L, "eeeeee", 6L)).map { case (i, t, n) => (i, t, "en", "s", n) } ++
      Seq((5L, "xx", 2L), (6L, "yy", 2L)).map { case (i, t, n) => (i, t, "en", "u", n) })
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(3)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurationOps.massWeightedLength(spark, dir).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r("s") == ((5L, 10L, 1L, 6L, 6L)), s"got ${r("s")}")
    assert(r("u") == ((2L, 4L, 2L, 2L, 2L)), s"got ${r("u")}")
  }

  test("mass median: mass-weighting never moves a percentile down (sf0.001)") {
    // weight = value is monotone, so the mass CDF is stochastically
    // dominated by the count CDF — p50_mass ≥ p50_docs per source
    CurationOps.massWeightedLength(spark, Sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("p50_mass") >= r.getAs[Long]("p50_docs"),
        s"source ${r.getString(0)}")
      assert(r.getAs[Long]("p90_mass") >= r.getAs[Long]("p50_mass"))
    }
  }

  // ------------------------------------------------------- concentration

  test("concentration: uniform masses score gini 0, hhi 1/n") {
    import spark.implicits._
    val r = CurationOps.concentrationOf(
      Seq(("a", 250L), ("b", 250L), ("c", 250L), ("d", 250L))
        .toDF("source", "w")).collect()(0)
    assert(r.getAs[Long]("n_sources") == 4L)
    assert(r.getAs[Long]("total_chars") == 1000L)
    assert(r.getAs[Double]("gini") == 0.0)
    assert(r.getAs[Double]("hhi") == 250000.0 / 1000.0 / 1000.0) // = 1/4
    assert(r.getAs[Double]("top_share") == 0.25)
    // uniform ties: struct max picks the lexicographically last source
    assert(r.getAs[String]("top_source") == "d")
  }

  test("concentration: hand-computed skewed fixture (1, 1, 998)") {
    import spark.implicits._
    val r = CurationOps.concentrationOf(
      Seq(("a", 1L), ("b", 1L), ("c", 998L)).toDF("source", "w")).collect()(0)
    // iw = 1·1 + 2·1 + 3·998 = 2997; gini = (5994 − 4000)/3000
    assert(r.getAs[Double]("gini") == 1994.0 / (3.0 * 1000.0))
    // s2 = 1 + 1 + 996004
    assert(r.getAs[Double]("hhi") == 996006.0 / 1000.0 / 1000.0)
    assert(r.getAs[String]("top_source") == "c")
    assert(r.getAs[Double]("top_share") == 998.0 / 1000.0)
  }

  test("concentration: replays a driver-side fold on real data (sf0.001)") {
    val r = CurationOps.sourceConcentration(spark, Sf0001).collect()(0)
    val masses = Tables(spark, Sf0001, "documents")
      .groupBy("source").agg(sum(col("n_chars")).as("w")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
      .sortBy(identity) // (source asc) — re-sorted below by (w, source)
      .sortBy(_._2)
    val n = masses.length.toLong
    val total = masses.map(_._2).sum
    val iw = masses.zipWithIndex.map { case ((_, w), i) => (i + 1) * w }.sum
    assert(r.getAs[Long]("n_sources") == n)
    assert(r.getAs[Long]("total_chars") == total)
    assert(r.getAs[Double]("gini") ==
      (2 * iw - (n + 1) * total).toDouble / (n.toDouble * total.toDouble))
    val s2 = masses.map(m => BigDecimal(m._2) * BigDecimal(m._2)).sum
    assert(r.getAs[Double]("hhi") == s2.toDouble / total.toDouble / total.toDouble)
  }
}
