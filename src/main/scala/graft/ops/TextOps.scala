package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language id, fingerprinting.
  * All are narrow per-row transforms (no shuffle) — they scale linearly
  * and sit in whole-stage codegen except the higher-order lambdas.
  */
object TextOps {

  private[graft] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "or", "for", "on")

  private def toks: Column = split(col("text"), " ")

  /** Stopword ratio of a text column — ONE shared definition across
    * qualityScore / qualityCut / DedupOps.qualitySurvivor so the quality
    * currency cannot drift between the scorer and its consumers. */
  def stopRatio(text: Column): Column = {
    val t = split(text, " ")
    size(filter(t, x => x.isInCollection(stopwords))) / size(t)
  }

  /** BPE-ish pre-tokenization regex: word runs / single punctuation — the
    * segmentation GPT-style BPE applies before merges. ONE constant shared
    * by `tokenStats` and `PretrainOps.packSequencesBpe` so the token
    * currency cannot drift between counting and packing. Stays inside the
    * Java/RE2-agreeing subset (explicit char classes only) so the DuckDB
    * oracle computes identical counts. */
  val BpeTokenRe = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"

  /** The `BpeTokenRe` token count of a text column. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  /** Token + char counting: whitespace tokenizer plus the BPE-ish regex
    * segmentation. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).as("n_chars_m"))
      .orderBy("doc_id")

  /** Tokenizer fertility per language — the table a tokenizer choice is
    * judged on: BPE-regex tokens per whitespace word (fertility; high
    * values mean the tokenizer shreds that language) and characters per
    * BPE token (compression). Sums are exact integers; the two ratios
    * are single divisions — fully value-oracled. One map-side-combined
    * |langs|-row aggregate. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    Tables(spark, dir, "documents")
      .select(col("lang"),
        size(toks).cast(LongType).as("ws"),
        bpeTokenCount(col("text")).cast(LongType).as("bpe"),
        length(col("text")).cast(LongType).as("ch"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("ch")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        col("n_chars"),
        (dbl(col("bpe_tokens")) / col("ws_tokens")).as("fertility"),
        (dbl(col("n_chars")) / col("bpe_tokens")).as("chars_per_bpe"))
      .orderBy("lang")
  }

  /** Exploded (doc_id, term) token stream — the shared front of the
    * corpus term-statistics operators. */
  private def tokenStream(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))

  /** Per-(doc, term) counts — ONE token shuffle; `termDf` and
    * `salientTerms` both derive from this aggregate (df(term) = #rows per
    * term HERE, because this table has exactly one row per (doc, term)). */
  private def termTf(spark: SparkSession, dir: String): DataFrame =
    tokenStream(spark, dir)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast(IntegerType).as("tf"))

  /** Token-level F1 between each verified near-dup pair — the
    * SQuAD/generation-eval arithmetic (prediction-vs-reference clipped
    * token overlap) run at corpus scale over the one paired-text set
    * the fixture provides, [[graft.ops.DedupOps.ngramJaccard]]'s
    * decision pairs: the reader's sanity panel for what "near-dup at
    * Jaccard ≥ 1/2 on shingles" MEANS in token terms, and the reusable
    * F1 core an eval harness points at (prediction_id, gold_id) pairs.
    *
    * Exactness: clipped overlap o = Σ_t min(tf_a, tf_b) shares its
    * numerator between precision o/n_a and recall o/n_b, so the
    * harmonic mean COLLAPSES to F1 = 2o/(n_a + n_b) — one exact
    * rational per pair, one division; the corpus micro-F1
    * 2Σo/Σ(n_a+n_b) is integer sums + one division (no order-dependent
    * mean of per-pair doubles anywhere).
    *
    * Scale shape: tf joins are keyed on (doc, term) — overlap rows
    * exist only for terms BOTH sides contain (a min with one side
    * absent is 0, so the inner join is exact); the per-pair table is
    * checkpointed (∝ |pairs|, the op's own output size) so the micro
    * totals never re-run the pair detection. */
  def pairTokenF1(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    // the pair-detection subtree is referenced twice below (overlap and
    // the left-join base) — materialize its small id list once so the
    // near-dup pipeline runs ONCE and the planner sees a broadcastable
    // build side instead of an opaque lazy subtree
    val pairs = DedupOps.ngramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    // tf only for PAIR MEMBERS (the bleuPerPair move, r14 sf100 fix):
    // the downstream joins restrict to pair docs anyway, but a
    // corpus-wide termTf shuffled EVERY document's tokens first — the
    // spill volume that breached the sf100 scratch disk. One semi join
    // before the explode bounds the token shuffle by |pair docs|·len,
    // not corpus size. tf still feeds three differently-pruned branches
    // (both overlap sides + the token totals) — materialize the
    // tokenize+count once, the salientTerms lesson.
    val members = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val tf = Tables(spark, dir, "documents")
      .join(members, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast(IntegerType).as("tf"))
      .localCheckpoint()
    val nTok = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n"))
    val ov = pairs
      .join(tf.select(col("doc_id").as("doc_a"), col("term"),
        col("tf").as("tf_a")), Seq("doc_a"))
      .join(tf.select(col("doc_id").as("doc_b"), col("term"),
        col("tf").as("tf_b")), Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("tf_a"), col("tf_b")).cast(LongType)).as("overlap"))
    val perPair = pairs
      .join(ov, Seq("doc_a", "doc_b"), "left")
      .join(nTok.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(nTok.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .localCheckpoint()
    val tot = perPair.agg(sum(col("overlap")).as("so"),
      sum(col("n_a") + col("n_b")).as("sn"))
    perPair.crossJoin(broadcast(tot))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("overlap"),
        (dbl(col("overlap")) / col("n_a")).as("p"),
        (dbl(col("overlap")) / col("n_b")).as("r"),
        (dbl(col("overlap") * 2) / (col("n_a") + col("n_b"))).as("f1"),
        (dbl(col("so") * 2) / col("sn")).as("micro_f1"))
      .orderBy("doc_a", "doc_b")
  }

  /** BLEU core between each verified near-dup pair (doc_a = candidate,
    * doc_b = reference) — the MT/generation-eval arithmetic at corpus
    * scale over the one paired-text set the fixture provides,
    * [[graft.ops.DedupOps.ngramJaccard]]'s decision pairs. An eval
    * harness points the same chain at (prediction_id, reference_id).
    *
    * Exactness (the transcendentals rule): clipped matches
    * m_n = Σ_g min(tf_cand, tf_ref) and candidate gram totals
    * t_n = max(len_a − n + 1, 0) are exact int64 (hash-green); each
    * modified precision p_n = m_n/t_n is ONE division, and the
    * geometric-mean core is published as prec_geo4 =
    * ((p1·p2)·p3)·p4 = BLEU⁴/BP⁴ — a fixed IEEE tree with no ln/exp
    * anywhere (BLEU itself needs exp(1−r/c) and a 4th root, both
    * libm-dependent; the reader applies them to the published exact
    * rationals). bp_clamped (len_a ≥ len_b ⇒ BP = 1) and len_ratio
    * carry the brevity-penalty inputs. Micro (corpus) BLEU rides the
    * same sums: Σm_n/Σt_n per order, one division each — the
    * order-independent corpus readout, never a mean of per-pair floats.
    *
    * Scale shape: gram tf tables are keyed on (doc, n, gram) and built
    * only for PAIR MEMBERS (one semi-join before the explode — the gram
    * volume is ∝ |pair docs|·len·4, not corpus size); the clipped-match
    * join exists only for grams BOTH sides contain (min with an absent
    * side is 0, so the inner join is exact); the per-pair table is
    * checkpointed so the corpus totals never re-run pair detection. */
  def pairBleu(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val orders = 1 to 4
    val perPair = bleuPerPair(spark, dir)
    val totAggs = orders.flatMap(k => Seq(
        sum(col(s"m$k")).as(s"sm$k"), sum(col(s"t$k")).as(s"st$k"))) ++
      Seq(sum(col("len_a")).as("cla"), sum(col("len_b")).as("clb"))
    val tot = perPair.agg(totAggs.head, totAggs.tail: _*)
    def p(k: Int) = dbl(col(s"m$k")) / col(s"t$k")
    perPair.crossJoin(broadcast(tot))
      .select(Seq(col("doc_a"), col("doc_b"), col("len_a"), col("len_b")) ++
        orders.flatMap(k => Seq(col(s"m$k"), col(s"t$k"))) ++
        orders.map(k => when(col(s"t$k") > 0, p(k)).as(s"p$k")) ++
        Seq(
          when(orders.map(k => col(s"t$k") > 0).reduce(_ && _),
            orders.map(p).reduce(_ * _)).as("prec_geo4"),
          (dbl(col("len_a")) / col("len_b")).as("len_ratio"),
          (col("len_a") >= col("len_b")).as("bp_clamped")) ++
        orders.map(k => when(col(s"st$k") > 0,
          dbl(col(s"sm$k")) / col(s"st$k")).as(s"micro_p$k")) ++
        Seq(col("cla").cast(LongType).as("corpus_len_a"),
          col("clb").cast(LongType).as("corpus_len_b")): _*)
      .orderBy("doc_a", "doc_b")
  }

  /** The ONE pair-gram pipeline every pair metric rides (the r14
    * deferred refactor): for every verified near-dup pair
    * ([[graft.ops.DedupOps.ngramJaccard]]'s decision pairs,
    * doc_a = candidate, doc_b = reference), exact int64 clipped
    * matches m_n = Σ_g min(tf_cand, tf_ref) for n = 1..maxOrder plus
    * both sequence lengths — parameterized over the GRAM EXTRACTOR
    * only (word grams for BLEU/ROUGE, char grams for chrF; candidate/
    * reference gram totals are pure functions of the lengths, so
    * callers derive them). Stages, defined exactly once:
    *  1. pair checkpoint (∝ |pairs| — pair detection never re-runs);
    *  2. member-only semi join BEFORE the gram explode (gram volume is
    *     ∝ |pair docs|·len·maxOrder, not corpus size);
    *  3. one exploded (doc, n, gram) stream → keyed tf table
    *     (checkpointed — it feeds BOTH overlap sides);
    *  4. clipped-match join keyed (doc, n, gram) — rows exist only for
    *     grams BOTH sides contain (min with an absent side is 0, so
    *     the inner join is exact), pivoted by conditional sums
    *     (maxOrder fixed orders — no generic pivot plan);
    *  5. per-pair left join + length joins, m_n coalesced to 0,
    *     checkpointed so each metric's corpus totals re-read this
    *     table, never the pipeline.
    *
    * @param prep   text → the per-doc sequence (bound as column `s`)
    * @param lenOf  sequence → its element count
    * @param gramAt (s, i, n) → the n-gram starting at 1-based i */
  private def clippedGramPerPair(
      spark: SparkSession, dir: String, maxOrder: Int,
      prep: Column => Column, lenOf: Column => Column,
      gramAt: (Column, Column, Column) => Column): DataFrame = {
    val orders = 1 to maxOrder
    val pairs = DedupOps.ngramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
      .localCheckpoint()
    val members = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val seqs = Tables(spark, dir, "documents")
      .join(members, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), prep(col("text")).as("s"))
      .localCheckpoint()
    val lens = seqs.select(col("doc_id"), lenOf(col("s")).cast(LongType).as("len"))
    // one exploded (doc, n, gram) stream, n = 1..maxOrder; positions
    // are 1-based (slice/substr convention)
    val grams = seqs
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(1), lit(orders.last))).as("n"))
      .where(lenOf(col("s")) >= col("n"))
      .select(col("doc_id"), col("n"),
        explode(transform(sequence(lit(1), lenOf(col("s")) - col("n") + 1),
          i => gramAt(col("s"), i, col("n")))).as("gram"))
    val gtf = grams.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).cast(LongType).as("tf"))
      .localCheckpoint()
    val mAggs = orders.map(k =>
      sum(when(col("n") === k, least(col("tf_a"), col("tf_b"))))
        .cast(LongType).as(s"mm$k"))
    val mWide = pairs
      .join(gtf.select(col("doc_id").as("doc_a"), col("n"), col("gram"),
        col("tf").as("tf_a")), Seq("doc_a"))
      .join(gtf.select(col("doc_id").as("doc_b"), col("n"), col("gram"),
        col("tf").as("tf_b")), Seq("doc_b", "n", "gram"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(mAggs.head, mAggs.tail: _*)
    pairs
      .join(mWide, Seq("doc_a", "doc_b"), "left")
      .join(lens.select(col("doc_id").as("doc_a"), col("len").as("len_a")), Seq("doc_a"))
      .join(lens.select(col("doc_id").as("doc_b"), col("len").as("len_b")), Seq("doc_b"))
      .select(Seq(col("doc_a"), col("doc_b"), col("len_a"), col("len_b")) ++
        orders.map(k => coalesce(col(s"mm$k"), lit(0L)).as(s"m$k")): _*)
      .localCheckpoint()
  }

  /** The word-gram instantiation of [[clippedGramPerPair]] shared by
    * [[pairBleu]] and [[pairRouge]]: clipped matches m_n and candidate
    * gram totals t_n = max(len_a − n + 1, 0) for n = 1..4 — the ONE
    * gram currency both metrics read (a tokenization tweak edits one
    * site, BLEU and ROUGE move together). */
  private[graft] def bleuPerPair(spark: SparkSession, dir: String): DataFrame = {
    val orders = 1 to 4
    val core = clippedGramPerPair(spark, dir, orders.last,
      t => split(lower(t), " "), size,
      (s, i, n) => array_join(slice(s, i, n), " "))
    core.select(Seq(col("doc_a"), col("doc_b"), col("len_a"), col("len_b")) ++
      orders.flatMap(k => Seq(
        col(s"m$k"),
        greatest(col("len_a") - (k - 1), lit(0L)).as(s"t$k"))): _*)
  }

  /** ROUGE-1/2 between each verified near-dup pair (doc_b = reference)
    * — the recall-oriented summarization companion to [[pairBleu]]'s
    * precision view, on the SAME clipped-gram currency
    * ([[bleuPerPair]]): recall_n = m_n/r_n with reference totals
    * r_n = max(len_b − n + 1, 0), and F1_n = 2m_n/(t_n + r_n) (the
    * harmonic identity: numerators shared, so P and R fold into one
    * exact fraction — the pairTokenF1 algebra at gram order n). FULLY
    * rational, so every score is value-oracled; r_n = 0 reads NULL,
    * m_n = 0 reads exactly 0. micro twins apply the identical trees to
    * the corpus-summed counts — never a mean of per-pair floats. */
  def pairRouge(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val orders = 1 to 2
    val perPair = bleuPerPair(spark, dir)
      .withColumn("r1", col("len_b"))
      .withColumn("r2", greatest(col("len_b") - 1, lit(0L)))
    val totAggs = orders.flatMap(k => Seq(
      sum(col(s"m$k")).as(s"sm$k"), sum(col(s"t$k")).as(s"st$k"),
      sum(col(s"r$k")).as(s"sr$k")))
    val tot = perPair.agg(totAggs.head, totAggs.tail: _*)
    perPair.crossJoin(broadcast(tot))
      .select(Seq(col("doc_a"), col("doc_b"), col("len_a"), col("len_b")) ++
        orders.flatMap(k => Seq(col(s"m$k"), col(s"t$k"), col(s"r$k"))) ++
        orders.flatMap(k => Seq(
          when(col(s"r$k") > 0, dbl(col(s"m$k")) / col(s"r$k"))
            .as(s"rouge_$k"),
          when(col(s"t$k") + col(s"r$k") > 0,
            dbl(col(s"m$k") * 2) / (col(s"t$k") + col(s"r$k")))
            .as(s"rouge_f$k"))) ++
        orders.flatMap(k => Seq(
          when(col(s"sr$k") > 0, dbl(col(s"sm$k")) / col(s"sr$k"))
            .as(s"micro_rouge_$k"),
          when(col(s"st$k") + col(s"sr$k") > 0,
            dbl(col(s"sm$k") * 2) / (col(s"st$k") + col(s"sr$k")))
            .as(s"micro_rouge_f$k"))): _*)
      .orderBy("doc_a", "doc_b")
  }

  /** chrF2 between each verified near-dup pair — the character-n-gram
    * F-score (β = 2, orders 1..6, whitespace stripped: the sacrebleu
    * defaults) that complements [[pairBleu]]: BLEU's word grams reward
    * exact token matches; chrF's char grams give partial credit for
    * morphological variants, the reason it's the standard second metric.
    *
    * Unlike BLEU, chrF is FULLY rational — no ln/exp/root anywhere — so
    * the final score is value-oracled, not just its integer core:
    * per order, P_n = m_n/tc_n and R_n = m_n/tr_n (clipped match /
    * candidate / reference gram totals, exact int64) and
    * F_n = 5·(P_n·R_n)/(4·P_n + R_n) (β = 2), with F_n = 0 when
    * m_n = 0 (sacrebleu's convention — avoids 0/0) and an order
    * EXCLUDED when either side has no grams; chrf2 is the arithmetic
    * mean over the included orders (left-associated 6-term sum, one
    * division). micro_chrf2 applies the same tree to the corpus-summed
    * counts. Pipeline IS [[clippedGramPerPair]] (the one shared with
    * BLEU/ROUGE) instantiated with the char-gram extractor; only the
    * readout below is chrF's own. */
  def pairChrf(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val orders = 1 to 6
    val core = clippedGramPerPair(spark, dir, orders.last,
      t => regexp_replace(lower(t), " ", ""), length,
      (s, i, n) => s.substr(i, n))
    val perPair = core.select(
      Seq(col("doc_a"), col("doc_b"),
        col("len_a").as("nc"), col("len_b").as("nr")) ++
        orders.flatMap(k => Seq(
          col(s"m$k"),
          greatest(col("len_a") - (k - 1), lit(0L)).as(s"tc$k"),
          greatest(col("len_b") - (k - 1), lit(0L)).as(s"tr$k"))): _*)
    val totAggs = orders.flatMap(k => Seq(
      sum(col(s"m$k")).as(s"sm$k"), sum(col(s"tc$k")).as(s"stc$k"),
      sum(col(s"tr$k")).as(s"str$k")))
    val tot = perPair.agg(totAggs.head, totAggs.tail: _*)
    // F_n from (m, tc, tr): the ONE fixed tree both the per-pair and
    // micro readouts share — 0 at m = 0, NULL (excluded) at tc·tr = 0
    def fOf(m: Column, tc: Column, tr: Column): Column = {
      val pN = dbl(m) / tc
      val rN = dbl(m) / tr
      when(tc > 0 && tr > 0,
        when(m > 0, lit(5.0) * (pN * rN) / (lit(4.0) * pN + rN))
          .otherwise(lit(0.0)))
    }
    def meanOf(fs: Seq[Column]): Column = {
      val valid = fs.map(f => when(f.isNotNull, 1).otherwise(0))
        .reduce(_ + _)
      when(valid > 0,
        fs.map(f => coalesce(f, lit(0.0))).reduce(_ + _) / valid)
    }
    val pairF = orders.map(k => fOf(col(s"m$k"), col(s"tc$k"), col(s"tr$k")))
    val microF = orders.map(k => fOf(col(s"sm$k"), col(s"stc$k"), col(s"str$k")))
    perPair.crossJoin(broadcast(tot))
      .select(Seq(col("doc_a"), col("doc_b"), col("nc"), col("nr")) ++
        orders.flatMap(k => Seq(col(s"m$k"), col(s"tc$k"), col(s"tr$k"))) ++
        orders.zip(pairF).map { case (k, f) => f.as(s"f$k") } ++
        Seq(meanOf(pairF).as("chrf2"), meanOf(microF).as("micro_chrf2")): _*)
      .orderBy("doc_a", "doc_b")
  }

  /** Corpus vocabulary statistics: the `top` terms by document frequency
    * (boilerplate/stopword discovery — what a pipeline inspects before
    * choosing filter lists). Two keyed aggregations, then a distributed
    * partial top-k (TakeOrderedAndProject — no global sort); ties broken
    * by term so the cut is deterministic. Fully value-oracled. */
  def termDf(spark: SparkSession, dir: String, top: Int = 50): DataFrame =
    termTf(spark, dir)
      .groupBy(col("term"))
      .agg(count(lit(1)).cast(IntegerType).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(top)

  /** Vocabulary size for [[oovProfile]]. The synthetic corpus bottoms
    * out at 31 distinct terms, so 16 keeps the cut meaningful (half the
    * vocabulary is out) — production runs ~10⁵ with the identical plan
    * shape (the ContamGram-vs-13-gram precedent). */
  val VocabSize = 16

  /** Out-of-vocabulary profile: the corpus's top-[[VocabSize]] terms by
    * document frequency (the deterministic [[termDf]] cut — df DESC,
    * term) stand in for a tokenizer/filter-list vocabulary; each
    * document reports its token count, how many token OCCURRENCES fall
    * outside that vocabulary, and the OOV fraction — the coverage
    * check a pipeline runs before freezing a vocabulary (high-OOV
    * documents are the ones a lexical filter or tokenizer will mangle).
    *
    * Scale shape: the vocabulary is a distributed partial top-k of the
    * df aggregate (V rows) and BROADCASTS; the stream side is one
    * narrow scan, a broadcast membership flag, and a doc_id
    * aggregation — no content-key shuffle anywhere (the df aggregate
    * reuses [[termTf]]'s map-side-combinable shape). One IEEE division
    * per doc → fully value-oracled. */
  def oovProfile(spark: SparkSession, dir: String): DataFrame = {
    val vocab = termDf(spark, dir, VocabSize)
      .select(col("term"), lit(true).as("in_vocab"))
    tokenStream(spark, dir)
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .cast(IntegerType).as("n_oov"))
      .withColumn("oov_frac", col("n_oov").cast(DoubleType) / col("n_tokens"))
      .orderBy("doc_id")
  }

  /** Per-document salient terms: top-k by (tf DESC, df ASC, term) — term
    * frequency first, corpus rarity as the discriminator, the integer
    * TF-IDF ordering that both engines compute bit-identically (a
    * deployment swaps in tf·ln(N/df) scoring — same plan, but ln is libm-
    * dependent so the oracle pins the rational form; see the
    * transcendentals rule in the determinism policy).
    *
    * Plan: df is a partial-aggregatable groupBy over the tf table joined
    * back on the term — NOT a window partitioned by the term. A stopword
    * is a GUARANTEED hot key (it appears in ~every document, so its tf
    * rows are ~|docs|), and a window partitioned by the term funnels all
    * of them into one task — the same skew cliff the paragraph-dedup
    * family was purged of in round 11. The groupBy collapses a hot term
    * map-side to ≤ numPartitions rows before its exchange, and the join
    * back has a ONE-row-per-term build side, which AQE's skew-join split
    * can handle on the hot probe partitions (a window offers neither
    * escape). tf is consumed by both branches, so an EAGER local
    * checkpoint materializes the tokenize+count once (the
    * cdcNearDupPairs pattern; the blocks are not cacheManager-registered
    * — they free when the ContextCleaner GCs the RDD handle after the
    * query result is consumed, the accepted lifecycle for per-invocation
    * checkpoints in this repo) — without it, column pruning rewrites the
    * df branch into a different canonical aggregate and the corpus
    * re-explodes per branch (measured in round 6). The rank window
    * prunes early via Spark 4's partial WindowGroupLimit. */
  def salientTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val tf = termTf(spark, dir).localCheckpoint()
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast(IntegerType).as("df"))
    val wr = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(wr).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
      .orderBy("doc_id", "rank")
  }

  /** Quality scoring: stopword ratio, average token length, short-doc
    * flag — the length/punct/stopword heuristics of C4/Gopher-style
    * filtering, as pure column arithmetic. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val inList = stopwords.map(s => s"'$s'").mkString(", ")
    val nStop = expr(s"size(filter(split(text, ' '), t -> t IN ($inList)))")
    val nTok = size(toks)
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        nStop.as("n_stopwords"),
        (nStop / nTok).as("stop_ratio"),
        ((length(col("text")) - (nTok - lit(1))) / nTok).as("avg_token_len"),
        (length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")) / length(col("text")))
          .as("punct_ratio"),
        (nTok < 5).as("is_short"))
      .orderBy("doc_id")
  }

  /** Distribution-based quality cut (the FineWeb-style refinement of
    * fixed-threshold filtering): keep documents whose stopword ratio is
    * at or below their LANGUAGE's median — thresholds adapt to each
    * stratum's distribution instead of hard-coding one corpus-wide
    * constant. Spark `percentile` and DuckDB `quantile_cont` interpolate
    * identically (exact IEEE midpoint), so the cut is fully
    * value-oracled. Plan: one narrow scoring pass, a per-language median
    * aggregate (|langs| rows), AQE broadcasts it back — the corpus never
    * shuffles. */
  def qualityCut(spark: SparkSession, dir: String): DataFrame = {
    val inList = stopwords.map(s => s"'$s'").mkString(", ")
    val nStop = expr(s"size(filter(split(text, ' '), t -> t IN ($inList)))")
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), (nStop / size(toks)).as("stop_ratio"))
    val medians = scored.groupBy(col("lang"))
      .agg(percentile(col("stop_ratio"), lit(0.5)).as("lang_median"))
    scored.join(medians, Seq("lang"))
      .filter(col("stop_ratio") <= col("lang_median"))
      .select(col("doc_id"), col("lang"), col("stop_ratio"), col("lang_median"))
      .orderBy("doc_id")
  }

  /** Repetition scoring (the Gopher "repetitious text" signal): fraction
    * of duplicate 2-gram / 3-gram occurrences per document. Boilerplate
    * and degenerate generations repeat n-grams; natural prose mostly
    * doesn't. Narrow per-row array arithmetic — no shuffle; per-row
    * double division is IEEE-identical across engines → full oracle. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    // materialize the token array, then each gram array, in their own
    // projections: higher-order functions are interpreted (no codegen)
    // and a `split` nested inside the transform lambda re-tokenizes the
    // whole document once PER GRAM POSITION — O(n²·len) per doc
    // (measured 35 s for this entry at sf0.1; ~1 s once staged). The
    // staged form computes the same arrays once each; values identical.
    def grams(t: Column, n: Int) =
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " "))
    def dupFrac(g: Column) =
      when(size(g) > 0,
        (size(g) - size(array_distinct(g))).cast(DoubleType) / size(g))
        .otherwise(lit(0.0))
    // Tables.parallel: single-row-group test files scan as ONE task and
    // the gram work is pure CPU — spread it (no-op cost on a many-file
    // production table)
    Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        grams(col("t"), 2).as("g2"), grams(col("t"), 3).as("g3"))
      .select(
        col("doc_id"),
        dupFrac(col("g2")).as("dup_2gram_frac"),
        dupFrac(col("g3")).as("dup_3gram_frac"))
      .orderBy("doc_id")
  }

  /** Top-n-gram concentration + immediate-repeat count — the Gopher
    * rule-set signals [[repetition]] doesn't carry: `repetition`
    * measures how much of a document is ANY duplicate gram; these
    * measure whether ONE gram dominates (degenerate generations loop a
    * single phrase; "fraction of tokens in the most common n-gram",
    * Rae et al. 2021 §A1.1) and how often a token immediately repeats.
    * Concentration is reported over gram POSITIONS (top count / (n−k+1))
    * so it is bounded in (0, 1] even for self-overlapping repeats.
    *
    * Scale shape: the modal count is a (doc_id, gram) composite-key
    * hash aggregate — map-side combinable, doc_id in the key so no
    * document concentrates a task — folded to one row per doc by a
    * second tiny aggregate; the immediate-repeat count is pure per-row
    * array arithmetic. Integer counts + single divisions → full
    * oracle. */
  def topGramConcentration(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .withColumn("n", size(col("t")))
    // Spark's sequence(a, b) auto-reverses when b < a, so single-token
    // docs must short-circuit instead of scanning [1, 0]
    val base = docs.select(col("doc_id"), col("n"),
      when(col("n") >= 2,
        size(filter(sequence(lit(1), col("n") - 1),
          i => element_at(col("t"), i) === element_at(col("t"), i + 1))))
        .otherwise(lit(0)).as("n_immediate_repeats"))
    def topCount(k: Int) = docs.filter(col("n") >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n") - k),
          i => array_join(slice(col("t"), i + 1, lit(k)), " "))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as(s"top${k}_count"))
    base
      .join(topCount(2), Seq("doc_id"), "left")
      .join(topCount(3), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("n_immediate_repeats"),
        coalesce(col("top2_count"), lit(0L)).as("top2_count"),
        when(col("n") >= 2, coalesce(col("top2_count"), lit(0L)).cast(DoubleType)
          / (col("n") - 1)).otherwise(lit(0.0)).as("top2_frac"),
        coalesce(col("top3_count"), lit(0L)).as("top3_count"),
        when(col("n") >= 3, coalesce(col("top3_count"), lit(0L)).cast(DoubleType)
          / (col("n") - 2)).otherwise(lit(0.0)).as("top3_frac"))
      .orderBy("doc_id")
  }

  /** Character-trigram profiles per language, derived from that
    * language's most frequent function words — the classic n-gram
    * language-id heuristic (Cavnar-Trenkle shape, profile fixed at
    * compile time instead of trained). */
  private val langProfiles: Seq[(String, Set[String])] = {
    def tri(words: Seq[String]): Set[String] =
      words.flatMap(w => s" $w ".sliding(3)).toSet
    Seq(
      "en" -> tri(Seq("the", "and", "of", "to", "is", "that", "with", "for")),
      "es" -> tri(Seq("el", "la", "de", "que", "es", "los", "una", "por")),
      "de" -> tri(Seq("der", "die", "und", "das", "ist", "ein", "nicht", "mit")),
      "fr" -> tri(Seq("le", "la", "et", "les", "est", "une", "pour", "dans")))
  }

  /** Language id: score = |document char-trigrams ∩ language profile|,
    * argmax with deterministic tie-break. Heuristic → rows-only check;
    * unit-tested on hand-built fixtures. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    // stage the padded text, then the trigram set, in their own
    // projections: inlined, the concat/lower re-ran once per trigram
    // position (O(n²) chars) and the whole transform re-ran once per
    // language profile (the repetition-entry lesson: higher-order
    // lambdas are interpreted and block common-subexpression reuse) —
    // 13.5 s → ~1 s at sf0.1, same rows
    val scored = langProfiles.map { case (l, profile) =>
      val lits = array(profile.toSeq.sorted.map(lit): _*)
      struct(size(array_intersect(col("tris"), lits)).as("s"), lit(l).as("l"))
    }
    // argmax by (score, then lexicographically-last lang as tiebreak via max)
    val best = greatest(scored: _*)
    Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), concat(lit(" "), lower(col("text")), lit(" ")).as("padded"))
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, greatest(1, length(padded) - 2)), " +
          "i -> substring(padded, i, 3))")).as("tris"))
      .select(col("doc_id"), best.getField("l").as("pred_lang"), best.getField("s").as("score"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: order-sensitive polynomial rolling hash over
    * tokens, h' = (h*31 + hash(t)) mod 2^31 — the modulus keeps every
    * intermediate < 2^36, safe under ANSI overflow checking. Engine-
    * internal hash → no SQL oracle; determinism pinned by unit test. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        expr("""aggregate(split(text, ' '), cast(0 as bigint),
                (h, t) -> pmod(h * 31 + pmod(xxhash64(t), 2147483647), 2147483647))""")
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Winnowing shingle size (k tokens per gram) and window width (w
    * consecutive gram hashes per selection window). Guarantee: any two
    * documents sharing a run of ≥ k + w − 1 = 8 tokens share at least
    * one selected fingerprint VALUE. */
  val WinnowK = 4
  val WinnowW = 5

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * SIGMOD '03 — the MOSS algorithm): positional k-gram hashes, then
    * in every window of w consecutive hashes select the minimum
    * (rightmost on ties), dedup the selections. Density ≈ 2/(w+1) of
    * the gram stream, yet the match guarantee above holds — the
    * fingerprint INDEX a plagiarism/dedup service stores instead of
    * every gram. Hashes are the md5 content currency (not xxhash64),
    * so the whole selection — positions included — is value-oracled.
    *
    * Scale shape: one narrow gram-hash projection, a window-index
    * explode, the O(w) per-window argmin, and a distinct keyed by
    * (doc, pos, fp) — the selected fingerprints (≈ 2/(w+1) of the gram
    * stream) are the only thing that crosses a shuffle. Docs shorter
    * than k + w − 1 tokens carry no guarantee and are excluded
    * (spec-pinned).
    *
    * The explode between the gram projection and the window argmin is
    * LOAD-BEARING, not style: with both in one projection the
    * optimizer inlines the md5-transform alias into its (statically
    * single, dynamically per-window) reference, and every window then
    * recomputes the ENTIRE gram array — O(n²·w) md5 calls per
    * document. The round-12 sf1 validation caught it live (179 s for
    * 500 docs at sf0.001; the plan probe counted 7 inlined md5 sites);
    * a Generate boundary is one CollapseProject cannot cross, so the
    * gram array is hashed exactly once per document. */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val k = WinnowK
    val w = WinnowW
    Tables(spark, dir, "documents")
      .withColumn("tk", split(lower(col("text")), " "))
      .filter(size(col("tk")) >= k + w - 1)
      .withColumn("gs", expr(
        s"""transform(sequence(1, size(tk) - ${k - 1}), i ->
           |  cast(conv(substring(md5(array_join(slice(tk, i, $k), ' ')), 1, 15), 16, 10) as bigint))""".stripMargin))
      .select(col("doc_id"), col("gs"),
        explode(expr(s"sequence(1, size(gs) - ${w - 1})")).as("i"))
      .select(col("doc_id"), expr(
        s"""aggregate(sequence(i, i + ${w - 1}),
           |  named_struct('v', cast(9223372036854775807 as bigint), 'p', cast(0 as int)),
           |  (acc, j) -> if(element_at(gs, j) <= acc.v,
           |                 named_struct('v', element_at(gs, j), 'p', j), acc))""".stripMargin).as("s"))
      .select(col("doc_id"), col("s.p").as("pos"), col("s.v").as("fp"))
      .distinct()
      .orderBy("doc_id", "pos", "fp")
  }

  /** PII patterns for training-corpus redaction — emails, North-American
    * phone shapes, IPv4 addresses. Written ONLY with explicit character
    * classes and bounded repetition, the regex subset on which Java's
    * engine (Spark) and RE2 (DuckDB) agree exactly, so the operator stays
    * fully value-oracled; no \\w/\\b/lookaround. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"),
    ("phone", "[0-9][0-9][0-9][- .][0-9][0-9][0-9][- .][0-9][0-9][0-9][0-9]"),
    ("ipv4", "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"))

  /** PII scrub: replace every match of each pattern with its `<TYPE>`
    * sentinel and report per-type match counts — the redaction step a
    * corpus runs before anything ships to a trainer. Pure per-row
    * regex_replace/size(regexp_extract_all) projections: narrow,
    * codegen'd, no shuffle, embarrassingly parallel at any corpus size.
    * The synthetic corpus is clean (counts 0, text unchanged) — planted
    * fixtures pin the redaction semantics in the spec; the oracle pins
    * engine-equality of the regex subset on every row. */
  def scrubPii(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = PiiPatterns.foldLeft(col("text")) { case (c, (name, re)) =>
      regexp_replace(c, re, s"<${name.toUpperCase}>")
    }
    val counts = PiiPatterns.map { case (name, re) =>
      // Column-form regexp_extract_all: the pattern must NOT round-trip
      // through SQL-string parsing, which would strip the \. escapes
      size(regexp_extract_all(col("text"), lit(re), lit(0))).as(s"n_$name")
    }
    Tables(spark, dir, "documents")
      .select(col("doc_id") +: scrubbed.as("clean_text") +: counts: _*)
      .orderBy("doc_id")
  }

  /** Hard cap on the broadcast unigram-LM vocabulary: corpus vocabulary
    * grows with corpus size (Heaps' law), so an uncapped corpus-trained
    * vocab broadcast is a driver/executor OOM at web scale; 2^16 terms
    * at ~30 bytes each is a ~2 MB broadcast at ANY corpus size. */
  val UnigramVocabCap = 65536

  /** Unigram language-model quality score: mean negative log-probability
    * per document under a unigram LM trained on the corpus itself — the
    * model-based quality signal (CCNet/"perplexity bucket" style) that
    * complements the rule-based stop-ratio/repetition heuristics: docs
    * made of corpus-typical words score LOW (good), rare-word soup
    * scores HIGH. A real deployment swaps the corpus-trained unigram
    * table for a KenLM-style external model; the plan is identical —
    * the model is a broadcast (term, count) table either way.
    *
    * Plan: the (doc, term, tf) table is the one token shuffle; the vocab
    * aggregate reuses its term partitioning. The LM itself is BOUNDED:
    * only the top [[UnigramVocabCap]] terms by corpus frequency (ties
    * broken on term) are kept — a distributed partial top-k
    * (TakeOrderedAndProject, the `termDf` shape), never a global sort —
    * and every dropped term folds into ONE out-of-vocabulary bucket
    * scored at p = oov_mass / n_total (the bucket is a single
    * pseudo-term: the standard closed-vocabulary treatment, and exactly
    * the MaxBucket discipline the dedup caps use). The dropped mass is
    * published per-run via `observe("unigram_vocab", ...)`, so a cap
    * that starts to bite is visible, not silent. Scoring is a broadcast
    * join of the ≤cap vocab onto the tf rows + one doc_id reduce of
    * already-collapsed rows; the broadcast is provably ≤ cap entries at
    * ANY corpus size. At test scale |V| < cap, so the output is
    * identical to the uncapped form (spec-pinned). ln is libm-dependent
    * → rows-only oracle; ordering/monotonicity pinned by a planted
    * spec. */
  def unigramNll(spark: SparkSession, dir: String,
      vocabCap: Int = UnigramVocabCap): DataFrame = {
    val tf = termTf(spark, dir)
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val kept = vocab.orderBy(col("cf").desc, col("term")).limit(vocabCap)
    // one row: total token mass and the mass falling outside the kept
    // vocab (the OOV bucket's frequency) — two bounded scalar aggregates
    val totals = vocab.agg(sum(col("cf")).as("n_total"))
      .crossJoin(kept.agg(sum(col("cf")).as("kept_mass")))
      .select(col("n_total"), (col("n_total") - col("kept_mass")).as("oov_mass"))
      .observe("unigram_vocab", sum(col("oov_mass")).as("oov_mass"))
    tf.join(broadcast(kept), Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("tf") * -log(
          coalesce(col("cf"), col("oov_mass")).cast(DoubleType) / col("n_total"))) /
          sum(col("tf"))).as("nll"),
        sum(col("tf")).cast(IntegerType).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Deflate level for [[compressionRatio]] — pinned so the signal is
    * reproducible across runs and partitionings. */
  val DeflateLevel = 6

  /** Deflate-compressibility quality signal (the Gopher/CCNet
    * "compression ratio" heuristic): machine-generated boilerplate and
    * copy-paste spam compress far below natural prose, and near-random
    * noise barely compresses at all — so deflated/raw byte ratio is a
    * cheap two-sided quality band no token statistic replicates
    * (repetition at ranges longer than the [[repetitionScore]] n-grams
    * still shows up here). Per-row kernel with ONE Deflater reused per
    * partition (allocation amortized, `reset()` between docs), no
    * shuffle. zlib output is engine-internal → rows-only; the planted
    * ordering and determinism contracts are spec-pinned. */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(DeflateLevel, true)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          d.reset(); d.setInput(raw); d.finish()
          var out = 0
          while (!d.finished()) out += d.deflate(buf)
          (id, raw.length.toLong, out.toLong,
            if (raw.length == 0) 1.0 else out.toDouble / raw.length)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate", "ratio")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Value-checked gates for the engine-internal text signals
  // ------------------------------------------------------------------
  // The recall-gate pattern applied to heuristics whose VALUES no SQL
  // oracle can recompute (trigram profiles, xxhash64, zlib, libm ln):
  // fold each signal to ONE row of oracle-derivable counts plus a
  // `passes` boolean asserting the signal's checkable contract —
  // coverage (every doc scored), determinism (equal texts score equal:
  // a partitioning/codegen regression breaks this first), domain and
  // bounds. The oracle recomputes the counts from the INPUT table and
  // expects passes = true, so a regression turns a CORRECTNESS row red
  // even though the heuristic itself stays engine-internal.

  /** THE coverage+functionality gate kernel, shared by every per-doc
    * engine-internal signal (langid, fingerprint, image hash): left-join
    * the signal onto the corpus, then one aggregate asserting full
    * coverage, no bad rows, and text-functionality — every distinct text
    * maps to exactly ONE signal value (the first thing a partitioning or
    * kernel-state regression breaks). One definition so a contract fix
    * cannot be applied to one gate and missed in another. */
  private[ops] def coverageFunctionalityGate(
      docs: DataFrame, signal: DataFrame,
      value: Column, bad: Column): DataFrame =
    docs.join(signal, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_texts"),
        countDistinct(struct(col("text"), value)).as("n_pairs"),
        sum(when(bad, 1L).otherwise(0L)).as("bad"))
      .select(col("n_docs"), col("n_texts"),
        (col("bad") === 0L && col("n_pairs") === col("n_texts")).as("passes"))

  /** langid gate: full coverage, predictions inside the profile domain,
    * equal texts → equal predictions. (The synthetic corpus's `lang`
    * labels are independent of its text, so an ACCURACY floor is not
    * meaningful here; on a real corpus it would join this row.) */
  def langIdGate(spark: SparkSession, dir: String): DataFrame = {
    val domain = langProfiles.map(_._1)
    coverageFunctionalityGate(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")),
      langId(spark, dir),
      col("pred_lang"),
      col("pred_lang").isNull ||
        !col("pred_lang").isin(domain: _*) || col("score") < 0)
  }

  /** fingerprint gate: full coverage and text-functionality (cross-text
    * collisions are allowed; the rolling hash is 31 bits). */
  def fingerprintGate(spark: SparkSession, dir: String): DataFrame =
    coverageFunctionalityGate(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")),
      fingerprint(spark, dir),
      col("fingerprint"),
      col("fingerprint").isNull || col("fingerprint") < 0)

  /** deflate-ratio gate: full coverage, the raw-byte side reconciles
    * with the input (sum of UTF-8 lengths — the one column DuckDB CAN
    * recompute via octet_length), and every output obeys the zlib
    * contract: positive deflated size, ratio = deflated/raw, and
    * deflated ≤ raw·1.03 + 16 BYTES — an absolute bound, because
    * deflate's worst case is ~0.03% expansion PLUS a constant ~5-byte
    * stored-block overhead, and on short documents the constant
    * dominates (a 2-byte doc deflates to ~4 bytes: ratio 2.0, still a
    * correct kernel — a ratio ceiling would false-red it the first time
    * the corpus generator emits a short doc). */
  def compressionRatioGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    docs.join(compressionRatio(spark, dir), Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(col("ratio").isNull || col("n_deflate") <= 0 ||
          col("n_bytes") =!= octet_length(col("text")) ||
          col("n_deflate").cast(DoubleType) >
            col("n_bytes").cast(DoubleType) * 1.03 + 16.0 ||
          (col("n_bytes") > 0 &&
            col("ratio") =!= col("n_deflate").cast(DoubleType) / col("n_bytes")), 1L)
          .otherwise(0L)).as("bad"))
      .select(col("n_docs"), col("total_bytes"),
        (col("bad") === 0L).as("passes"))
  }

  /** NLL ceiling for [[unigramNllGate]]: -ln of the smallest probability
    * any token can carry is ln(n_total) ≤ ln(2^63); 50 nats is far above
    * any real corpus and only trips on a sign/∞/NaN kernel break. */
  val NllCeiling = 50.0

  /** unigram-NLL gate: every document scores (the tokenizer finds ≥ 1
    * token per doc on this corpus), scores are finite, non-negative and
    * under [[NllCeiling]]. (No equal-text-equal-score clause: the per-doc
    * double sum is order-sensitive in its last ulp, so identical texts
    * may differ by rounding across partitions — a bounds gate, not a
    * bitwise one.) */
  def unigramNllGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    docs.join(unigramNll(spark, dir), Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("nll").isNull || isnan(col("nll")) ||
          col("nll") < 0 || col("nll") > NllCeiling ||
          col("n_tokens") <= 0, 1L).otherwise(0L)).as("bad"))
      .select(col("n_docs"), (col("bad") === 0L).as("passes"))
  }

  /** Bigram interpolated-LM quality score — the next model size up from
    * [[unigramNll]] and the closest in-engine analogue of the KenLM
    * perplexity filter (CCNet): per document, the mean negative log of
    * p(wᵢ | wᵢ₋₁) = ½·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁·) + ½·p_uni(wᵢ)
    * (Jelinek-Mercer interpolation, λ = ½) over the doc's n−1 bigrams.
    * The context count c(wᵢ₋₁·) is the bigram-table row sum — the model
    * is self-consistent by construction, and since the corpus contains
    * the doc, every bigram has c ≥ 1: no zero probabilities even
    * without the interpolation floor. Repetitive/templated text scores
    * LOW (its transitions are corpus-typical), shuffled word soup
    * scores HIGH even when its unigrams are common — the signal the
    * unigram model cannot see (spec-pinned).
    *
    * Plan: one bigram explode → (doc, prev, cur) count is the only
    * corpus-sized shuffle; the corpus bigram table and context sums
    * derive from it by keyed reaggregation (no second scan), and
    * scoring joins them back BY KEY — bigram vocabularies grow too fast
    * to broadcast at web scale, so unlike the capped unigram broadcast
    * this is a co-partitioned shuffle join on (prev, cur)/(prev), which
    * AQE plans from the already-partitioned aggregates. The unigram
    * interpolant reuses [[termTf]]'s aggregate; only the 1-row totals
    * cross the driver. ln is libm-dependent → rows-only; the gate
    * value-checks the exact integer side (coverage + Σ bigram counts)
    * and bounds. */
  def bigramNll(spark: SparkSession, dir: String): DataFrame = {
    // lowercased to match [[tokenStream]] — the unigram interpolant and
    // the bigram table must share one token definition
    val toks = Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1).as("prev"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("cur"))).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val dtf = bi.groupBy(col("doc_id"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("dtf"))
    val cb = dtf.groupBy(col("prev"), col("cur")).agg(sum(col("dtf")).as("cb"))
    val cctx = cb.groupBy(col("prev")).agg(sum(col("cb")).as("cctx"))
    val cf = termTf(spark, dir).groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val totals = cf.agg(sum(col("cf")).as("n_total"))
    dtf
      .join(cb, Seq("prev", "cur"))
      .join(cctx, Seq("prev"))
      .join(cf.withColumnRenamed("term", "cur"), Seq("cur"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(
        (sum(col("dtf") * -log(
          lit(0.5) * col("cb").cast(DoubleType) / col("cctx") +
            lit(0.5) * col("cf").cast(DoubleType) / col("n_total"))) /
          sum(col("dtf"))).as("nll"),
        sum(col("dtf")).cast(IntegerType).as("n_bigrams"))
      .orderBy("doc_id")
  }

  /** Bigram-NLL gate: exact-integer reconciliation + bounds. Every doc
    * with ≥ 2 tokens scores; its n_bigrams is EXACTLY n_tokens − 1
    * (DuckDB recomputes the corpus-wide sum — a chunking/zip bug cannot
    * hide); single-token docs score null; values finite in
    * [0, NllCeiling]. Same no-bitwise-clause rationale as
    * [[unigramNllGate]]: the per-doc double sum is order-sensitive in
    * its last ulp. */
  def bigramNllGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    docs.join(bigramNll(spark, dir), Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_bigrams").cast(LongType), lit(0L))).as("total_bigrams"),
        sum(when(
          (col("n_toks") >= 2 && (col("nll").isNull || isnan(col("nll")) ||
            col("nll") < 0 || col("nll") > NllCeiling ||
            col("n_bigrams") =!= col("n_toks") - 1)) ||
            (col("n_toks") < 2 && col("nll").isNotNull), 1L)
          .otherwise(0L)).as("bad"))
      .select(col("n_docs"), col("total_bigrams"),
        (col("bad") === 0L).as("passes"))
  }

  /** Corpus support floor for a collocation candidate — rare bigrams
    * have wildly unstable lift (one co-occurrence of two hapaxes scores
    * astronomically), so the standard practice (Manning & Schütze ch. 5)
    * is a hard count cut before ranking. Shared literal with the
    * oracle. */
  val CollocMinCount = 5L
  /** Size of the served collocation list. */
  val CollocTopK = 50

  /** Top-[[CollocTopK]] collocations by PMI lift — the corpus-analysis
    * readout behind phrase mining and tokenizer-merge audits: for each
    * adjacent token pair, lift = c_xy·N / (c_x·c_y) where the marginals
    * and total are ALL row sums of the one corpus bigram table (prev
    * marginal, cur marginal, grand total — the model is self-consistent
    * by construction, no separate unigram pass to drift against).
    * lift > 1 means the pair co-occurs more than its parts predict;
    * PMI = log₂(lift) is monotone in it, so ranking by the exact
    * rational lift IS ranking by PMI without a transcendental — the
    * final score stays value-oracled.
    *
    * Determinism: counts are exact int64; lift is exact DECIMAL(38,0)
    * products cast to double then ONE division — both engines compute
    * the identical IEEE value, and the (lift DESC, prev, cur) sort key
    * breaks every tie by name.
    *
    * Scale shape: one bigram explode → groupBy(prev, cur) count is the
    * only corpus-sized shuffle (the [[bigramNll]] plan); both marginals
    * are keyed REAGGREGATIONS of that table (no second scan) joined
    * back by key — bigram vocabularies grow too fast to broadcast at
    * web scale; the support floor prunes the long tail BEFORE the
    * marginal joins; the global top-k is TakeOrderedAndProject (a
    * per-partition heap, never a full sort). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val toks = Tables.parallel(spark, dir, "documents")
      .select(split(lower(col("text")), " ").as("t"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("prev"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("cur"))).as("b"))
      .select(col("b.prev").as("prev"), col("b.cur").as("cur"))
    val cb = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_xy"))
    val cx = cb.groupBy(col("prev")).agg(sum(col("c_xy")).as("c_x"))
    val cy = cb.groupBy(col("cur")).agg(sum(col("c_xy")).as("c_y"))
    val n = cb.agg(sum(col("c_xy")).as("n_bi"))
    cb.filter(col("c_xy") >= CollocMinCount)
      .join(cx, Seq("prev"))
      .join(cy, Seq("cur"))
      .crossJoin(broadcast(n))
      .select(col("prev"), col("cur"), col("c_xy"),
        col("c_x").cast(LongType).as("c_x"),
        col("c_y").cast(LongType).as("c_y"),
        col("n_bi").cast(LongType).as("n_bi"),
        ((d38(col("c_xy")) * d38(col("n_bi"))).cast(DoubleType)
          / (d38(col("c_x")) * d38(col("c_y"))).cast(DoubleType)).as("lift"))
      .orderBy(col("lift").desc, col("prev"), col("cur"))
      .limit(CollocTopK)
  }

  /** Flesch readability panel — the classic cheap quality feature
    * (reading ease + FK grade level) every rule-based corpus filter
    * ships next to stopword/punctuation ratios: word salad and OCR
    * noise score far off the human band. Syllables are approximated as
    * VOWEL GROUPS (`[aeiouy]+` runs — the standard heuristic; both
    * engines run the same RE2-compatible pattern), sentences as
    * `[.!?]+` runs clamped to ≥ 1 (a fragment is one sentence, and the
    * clamp is what keeps the per-doc divisions defined). Every number
    * is exact integer counts into TWO fixed IEEE trees with the
    * published Flesch constants as shared literals — fully
    * value-oracled, one scan, no shuffle at all (narrow per-row
    * arithmetic). */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast(LongType).as("n_sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast(LongType).as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206.835) - lit(1.015) * (dbl(col("n_words")) / col("n_sentences"))
          - lit(84.6) * (dbl(col("n_syllables")) / col("n_words")))
          .as("flesch_ease"),
        (lit(0.39) * (dbl(col("n_words")) / col("n_sentences"))
          + lit(11.8) * (dbl(col("n_syllables")) / col("n_words"))
          - lit(15.59)).as("fk_grade"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Hashed linear quality classifier (fastText/CCNet inference shape)
  // ------------------------------------------------------------------

  /** Feature-space size of the hashing trick (2^12 buckets). */
  val ClassifierBuckets = 4096
  /** Weight magnitude bound: weights live in [-500000, 500000] integer
    * micro-units, so a document's logit is an exact int64 sum. */
  val ClassifierWeightMod = 1000001L

  /** Token → feature bucket: md5 is the one hash both engines compute
    * bit-identically (the `splitHash` pattern), so the hashing trick —
    * the part fastText actually relies on — is fully value-oracled.
    * 5 hex chars = 20 bits, reduced mod [[ClassifierBuckets]]. */
  private[ops] def featBucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 5), 16, 10).cast(LongType) % ClassifierBuckets

  /** Deterministic per-bucket weight in [-500000, 500000]: derived from
    * md5 of the bucket id, standing in for trained parameters (no model
    * ships in this container). The INFERENCE PLAN — hash, look up, sum,
    * threshold — is exactly what a trained fastText/CCNet filter runs;
    * swapping these pseudo-weights for a learned table changes one
    * column expression (or the joined twin's weight table load). */
  private def bucketWeight(bucket: Column): Column =
    conv(substring(md5(concat(lit("w"), bucket.cast(StringType))), 1, 8), 16, 10)
      .cast(LongType) % ClassifierWeightMod - 500000L

  /** Linear text classifier over hashed bag-of-words features — the
    * fastText-style quality filter (Joulin et al. '16; the CCNet / LLaMA
    * data-pipeline quality gate), in the zero-shuffle inline form: each
    * token hashes to one of [[ClassifierBuckets]] feature buckets, the
    * bucket's weight is computed INSIDE the row expression, and the
    * document's logit is the exact int64 weight sum (keep ⇔ logit > 0 —
    * the sign of the logit needs no libm sigmoid, so the decision is
    * engine-bit-identical). Pure per-row map: no shuffle, no UDF, one
    * whole-stage-codegen'd projection — the 100 TB-sized shape for a
    * model small enough to inline. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
          lit(0L), (acc, w) => acc + w).as("logit"))
      .withColumn("keep", col("logit") > 0L)
      .orderBy("doc_id")
  }

  /** The same classifier with the weights as a MATERIALIZED table — the
    * production form when parameters come from a trained-model file
    * instead of an expression: tokens explode, the ≤
    * [[ClassifierBuckets]]-row weight table broadcasts into the hash
    * lookup (never a shuffle of the corpus side), and one map-side-
    * combined sum per document rebuilds the logit. Output is
    * row-identical to [[qualityClassifier]] (same oracle SQL) — the
    * hash equality across two genuinely different physical plans is the
    * point: inline for tiny models, broadcast-join for real ones,
    * same semantics at any corpus size. */
  def qualityClassifierJoined(spark: SparkSession, dir: String): DataFrame = {
    val weights = spark.range(ClassifierBuckets.toLong)
      .select(col("id").as("bucket"), bucketWeight(col("id")).as("w"))
    val tokens = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id"), featBucket(col("tok")).as("bucket"))
    tokens.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_tokens"), sum(col("w")).as("logit"))
      .withColumn("keep", col("logit") > 0L)
      .select(col("doc_id"), col("n_tokens"), col("logit"), col("keep"))
      .orderBy("doc_id")
  }

  /** Calibration/reliability readout for the hashed quality classifier:
    * documents bin by classifier logit (fixed-width 2e6 bins clamped to
    * [-4, 4]; floor over an exactly-representable double, so bin ids
    * are engine-identical integers) and each bin reports its document
    * count, heuristic-gold positives (gold = [[stopRatio]] ≥ 0.1 — the
    * shared quality currency; stopword-bearing text is the CCNet-style
    * naturalness signal), the exact gold rate and the mean logit. The
    * readout to inspect BEFORE trusting the cheap filter on 100 TB: if
    * gold rate does not rise with the logit bin, the classifier is
    * noise on this corpus. One scan, one |bins|-row aggregate. */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    calibrationBinsRaw(spark, dir)
      .select(col("bin"), col("n_docs"), col("n_gold"),
        (dbl(col("n_gold")) / dbl(col("n_docs"))).as("gold_rate"),
        (dbl(col("slogit")) / dbl(col("n_docs"))).as("mean_logit"))
      .orderBy("bin")
  }

  /** Cohen's kappa between the hashed quality classifier's keep
    * decision and the stopword gold rule — agreement BEYOND CHANCE,
    * the number an annotation pipeline reads before trusting a cheap
    * labeler: raw agreement (po) is inflated whenever both annotators
    * share skewed marginals; kappa subtracts the chance floor
    * pe = pA·pB + (1−pA)·(1−pB).
    *
    * Exactness: the 2×2 confusion counts are one map-side-combinable
    * integer aggregate (the decisions themselves are exact int64 logit
    * signs and an engine-identical ratio threshold); po/pe/kappa are a
    * FIXED tree of IEEE ops over those integers, written identically
    * in the oracle — deterministic at any partitioning. One scan. */
  def classifierKappa(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    confusionCells(spark, dir)
      .withColumn("po", (dbl(col("n11")) + dbl(col("n00"))) / col("n"))
      .withColumn("p_a", (dbl(col("n11")) + dbl(col("n10"))) / col("n"))
      .withColumn("p_b", (dbl(col("n11")) + dbl(col("n01"))) / col("n"))
      .withColumn("pe",
        col("p_a") * col("p_b") + (lit(1.0) - col("p_a")) * (lit(1.0) - col("p_b")))
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        col("po"), col("pe"),
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
  }

  /** The 2×2 confusion cells between the hashed classifier's keep
    * decision (a) and the stopword gold rule (b) — ONE definition shared
    * by [[classifierKappa]] and [[classifierMcc]] (the evalSummaryTail
    * rule: an agreement-metric tweak edits one cell source). One
    * map-side-combinable scan to a 1-row aggregate. */
  private def confusionCells(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    val decisions = Tables(spark, dir, "documents")
      .select(
        (aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
          lit(0L), (acc, w) => acc + w) > 0L).as("a"),
        (stopRatio(col("text")) >= 0.1).as("b"))
    val cell = (pa: Boolean, pb: Boolean) =>
      sum(when(col("a") === pa && col("b") === pb, 1L).otherwise(0L))
    decisions
      .agg(count(lit(1)).as("n"),
        cell(true, true).as("n11"), cell(true, false).as("n10"),
        cell(false, true).as("n01"), cell(false, false).as("n00"))
  }

  /** Matthews correlation coefficient over the same 2×2 cells — the
    * balance-robust agreement readout next to kappa (a 95%-keep corpus
    * can show high accuracy and near-zero MCC at once). The numerator
    * n11·n00 − n10·n01 is exact DECIMAL(38,0) (int64 would overflow at
    * n ≈ 3e9 docs); the denominator's four marginal products run in
    * double with sqrt the only root — one fixed IEEE tree, fully
    * hash-oracled. Degenerate margins (an all-keep rater) yield NULL,
    * never a zero division. */
  def classifierMcc(spark: SparkSession, dir: String): DataFrame = {
    val m = (a: String, b: String) => (col(a) + col(b)).cast(DoubleType)
    val d38 = (c: String) => col(c).cast(DecimalType(38, 0))
    confusionCells(spark, dir)
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("n11") + col("n10") > 0L && col("n11") + col("n01") > 0L &&
          col("n00") + col("n10") > 0L && col("n00") + col("n01") > 0L,
          (d38("n11") * d38("n00") - d38("n10") * d38("n01")).cast(DoubleType)
            / sqrt(m("n11", "n10") * m("n11", "n01")
              * m("n00", "n10") * m("n00", "n01"))).as("mcc"))
  }

  /** McNemar's paired test over the same 2×2 cells — "do the
    * classifier and the gold rule err at DIFFERENT rates on the same
    * documents?": kappa/MCC measure agreement, but a systematic
    * marginal shift (classifier keeps 60%, rule keeps 40%) lives
    * entirely in the discordant cells, which the paired design
    * isolates: χ² = max(|n10−n01|−1, 0)² / (n10+n01) (Edwards
    * continuity correction, clamped so n10 = n01 reads exactly 0),
    * against the same α = 0.05 df=1 trip wire as the SRM guard. The
    * discordant odds ratio n11·n00 / (n10·n01) rides along as the
    * effect-size column — a significant χ² on a near-1 OR is scale,
    * not substance.
    *
    * Exactness: integer cells (one map-side-combinable scan, shared
    * [[confusionCells]] seam), χ² a fixed 3-op IEEE tree, OR an exact
    * DECIMAL(38,0) product pair with ONE division; both guarded NULL
    * at empty denominators so Spark and DuckDB agree (the divide-by-
    * zero NULL-vs-Inf seam). No transcendental. */
  def classifierMcnemar(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val d38 = (c: String) => col(c).cast(DecimalType(38, 0))
    val g = dbl(greatest(abs(col("n10") - col("n01")) - lit(1L), lit(0L)))
    confusionCells(spark, dir)
      .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        when(col("n10") + col("n01") > 0L,
          g * g / dbl(col("n10") + col("n01"))).as("chi2_mcnemar"),
        when(col("n10") > 0L && col("n01") > 0L,
          (d38("n11") * d38("n00")).cast(DoubleType)
            / (d38("n10") * d38("n01")).cast(DoubleType)).as("odds_ratio"))
      .withColumn("asymmetric", col("chi2_mcnemar") > 3.841)
  }

  /** Fleiss' kappa across THREE rule annotators (classifier keep,
    * stopword gold, low-punctuation) — [[classifierKappa]]'s
    * multi-rater generalization: with 3 binary raters every document's
    * pairwise-agreement term P_i collapses to 1 (unanimous) or 1/3
    * (2-1 split), so P̄ = (N + 2·unanimous)/(3N) is EXACT integers +
    * one division — no order-dependent double mean anywhere. The
    * chance floor uses the pooled keep share p = keep_votes/(3N);
    * kappa = (P̄ − Pe)/(1 − Pe) is a fixed IEEE tree replicated in the
    * oracle. One map-side-combinable scan. */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame =
    fleissOfCounts(agreementCounts(raterVotes(spark, dir)))

  /** The 1-row integer agreement state over any (k: int ∈ 0..3) vote
    * relation — the full sufficient statistic for BOTH agreement
    * metrics (Σk(3−k) ≡ 2(N − unanimous): a unit disagrees iff it is a
    * 2-1 split), and therefore the streaming twin's complete-mode
    * state. Map-side combinable. */
  private[graft] def agreementCounts(votes: DataFrame): DataFrame =
    votes.agg(count(lit(1)).as("n_docs"),
      sum(col("k")).cast(LongType).as("keep_votes"),
      sum(when(col("k") === 0 || col("k") === 3, 1L).otherwise(0L))
        .as("n_unanimous"))

  /** Fleiss tail over the agreement counts — the fixed IEEE tree the
    * oracle replicates. */
  private[graft] def fleissOfCounts(counts: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    counts
      .withColumn("p_keep", dbl(col("keep_votes")) / (col("n_docs") * 3))
      .withColumn("p_bar",
        (dbl(col("n_docs")) + col("n_unanimous") * 2) / (col("n_docs") * 3))
      .withColumn("p_e",
        col("p_keep") * col("p_keep")
          + (lit(1.0) - col("p_keep")) * (lit(1.0) - col("p_keep")))
      .select(col("n_docs"), col("keep_votes"), col("n_unanimous"),
        col("p_keep"), col("p_bar"), col("p_e"),
        when(col("p_e") < 1.0,
          (col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))).as("kappa"))
  }

  /** The three-rule binary vote count k ∈ {0..3} per document — ONE
    * definition shared by [[fleissKappa]] and [[krippendorffAlpha]]
    * (the [[confusionCells]] rule: an agreement-metric tweak edits one
    * vote source, never two drifting copies). Raters: classifier keep
    * (logit sign), stopword gold, low-punctuation. */
  private def raterVotes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(raterVoteExpr(col("text")).as("k"))

  /** The per-document vote count as ONE expression over a text column —
    * shared by the batch scan and the streaming agreement twin, riding
    * [[classifierKeep]] for the first rater. */
  private[graft] def raterVoteExpr(text: Column): Column =
    classifierKeep(text).cast(IntegerType) +
      (stopRatio(text) >= 0.1).cast(IntegerType) +
      ((length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
        / length(text)) < 0.1).cast(IntegerType)

  /** Krippendorff's alpha (nominal) across the same three rule
    * annotators — the reliability readout annotation teams publish when
    * raters or units can vary (its pairwise-disagreement form
    * generalizes to missing votes, ordinal metrics, >2 raters):
    * α = 1 − D_o/D_e with the observed disagreement averaged per unit
    * and the expected disagreement pooled over ALL ratings with
    * Krippendorff's finite-sample n(n−1) floor — the small-sample
    * correction Fleiss' chance term lacks.
    *
    * Exactness: with 3 binary raters a unit with k keep-votes
    * contributes disagreeing-pair weight k(3−k)/3 ∈ {0, 2/3}, so
    * D = Σ k(3−k) and K = Σ k are two integer sums in the ONE
    * map-side-combinable scan, and α collapses to
    * 1 − D(3N−1)/(2K(3N−K)) — DECIMAL(38,0) products (int64 overflows
    * at N ≈ 2e9 docs), ONE division. D_o = 1 − P̄ of [[fleissKappa]]
    * exactly (both count the 2-1 splits), which the spec pins.
    * Degenerate unanimity (K = 0 or K = 3N) yields NULL, never a zero
    * division. */
  def krippendorffAlpha(spark: SparkSession, dir: String): DataFrame =
    krippendorffOfVotes(raterVotes(spark, dir))

  /** The alpha core over any (k: int ∈ 0..3) vote relation — separated
    * so specs can feed planted vote patterns with hand-computed
    * alphas. */
  private[ops] def krippendorffOfVotes(votes: DataFrame): DataFrame =
    krippendorffOfCounts(agreementCounts(votes))

  /** Both agreement readouts off ONE counts row — the streaming twin's
    * published artifact (kappa and alpha side by side, the same fixed
    * IEEE trees as the two batch entries). */
  private[graft] def agreementReport(counts: DataFrame): DataFrame =
    fleissOfCounts(counts).crossJoin(
      krippendorffOfCounts(counts)
        .select(col("d_num"), col("d_obs"), col("d_exp"), col("alpha")))

  /** Alpha tail over the shared agreement counts: D = Σk(3−k) derives
    * exactly as 2(N − unanimous) — a unit contributes disagreement 2
    * iff it is a 2-1 split. */
  private[graft] def krippendorffOfCounts(counts: DataFrame): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val dbl = (c: Column) => c.cast(DoubleType)
    counts
      .withColumn("d_num", (col("n_docs") - col("n_unanimous")) * 2)
      .withColumn("n3", col("n_docs") * 3)
      .select(col("n_docs"), col("keep_votes"), col("d_num"),
        (dbl(col("d_num")) / col("n3")).as("d_obs"),
        (dbl(d38(lit(2L)) * d38(col("keep_votes")) * d38(col("n3") - col("keep_votes")))
          / dbl(d38(col("n3")) * d38(col("n3") - 1))).as("d_exp"),
        when(col("keep_votes") > 0L && col("keep_votes") < col("n3"),
          lit(1.0) - dbl(d38(col("d_num")) * d38(col("n3") - 1))
            / dbl(d38(lit(2L)) * d38(col("keep_votes"))
              * d38(col("n3") - col("keep_votes")))).as("alpha"))
  }

  /** The shared bin-table currency behind [[classifierCalibration]],
    * [[isotonicCalibration]] and [[calibrationEce]]: one corpus pass
    * into ≤ 9 rows of (bin, n_docs, n_gold, Σlogit, Σconf, Σconf²,
    * Σconf·gold), where conf is the clamped-linear confidence
    * NUMERATOR clamp(logit, ±4e6) + 4e6 ∈ [0, 8e6] — the deterministic,
    * sigmoid-free probability surrogate p̂ = conf/8e6 whose per-bin and
    * per-corpus moments stay exact int64/decimal. */
  /** Per-document (logit, stop_ratio gold, clamped confidence
    * numerator) projection — the ONE definition of p̂ = cnum/8e6 behind
    * the calibration family AND [[confidentJoint]] (a clamp tweak edits
    * one site, both readouts move together). */
  private def docConfidence(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    Tables(spark, dir, "documents")
      .select(
        aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
          lit(0L), (acc, w) => acc + w).as("logit"),
        stopRatio(col("text")).as("stop_ratio"))
      .select(col("logit"), col("stop_ratio"),
        (least(greatest(col("logit"), lit(-4000000L)), lit(4000000L))
          + lit(4000000L)).as("cnum"))
  }

  private def calibrationBinsRaw(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val d38 = DecimalType(38, 0)
    docConfidence(spark, dir)
      .select(col("logit"), col("stop_ratio"), col("cnum"),
        least(greatest(floor(dbl(col("logit")) / lit(2000000.0)), lit(-4L)),
          lit(4L)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("stop_ratio") >= 0.1, 1L).otherwise(0L)).as("n_gold"),
        sum(col("logit")).as("slogit"),
        sum(col("cnum")).as("sconf"),
        sum(col("cnum").cast(d38) * col("cnum").cast(d38)).as("sconf2"),
        sum(when(col("stop_ratio") >= 0.1, col("cnum")).otherwise(0L))
          .as("sconfgold"))
  }

  /** Isotonic (PAV) recalibration of the reliability bins — what a
    * production filter DOES with the calibration readout: the
    * monotone-nondecreasing gold-rate fit closest (weighted L2) to the
    * observed per-bin rates, served next to the raw rates in exact
    * micro-units.
    *
    * Instead of the sequential pool-adjacent-violators sweep (driver
    * code an oracle cannot replay), this computes PAV's closed form —
    * the minimax identity cal(i) = max_{j ≤ i} min_{k ≥ i}
    * mean(gold[j..k]) / mean(docs[j..k]) (Robertson & Wright, "Order
    * Restricted Statistical Inference") — as three joins over the
    * BOUNDED bin table. Floor commutes with min/max (it is monotone),
    * so computing every interval mean as floor(1e12·g/d) in INTEGRAL
    * division makes the whole fit exact int64: value-oracled, no
    * doubles anywhere, and the hash equality against DuckDB's
    * independent replay of the same identity IS the optimality proof.
    *
    * Scale shape: the corpus cost is the ONE scan into ≤ 9 bins (the
    * logit clamp bounds the domain at any corpus size); the O(|bins|³)
    * interval expansion runs on broadcast 9-row tables — constant work
    * regardless of scale. */
  def isotonicCalibration(spark: SparkSession, dir: String): DataFrame =
    isotonicOfBins(calibrationBinsRaw(spark, dir)
      .select(col("bin"), col("n_docs"), col("n_gold")))

  /** The minimax-PAV core over any (bin, n_docs, n_gold) table with
    * n_docs > 0 — separated so specs can feed planted violator bins. */
  def isotonicOfBins(bins: DataFrame): DataFrame = {
    val b = bins.select(col("bin"), col("n_docs"), col("n_gold"))
    val iv = broadcast(b.select(col("bin").as("jb")))
      .join(broadcast(b.select(col("bin").as("kb"))), col("jb") <= col("kb"))
      .join(broadcast(b), col("bin").between(col("jb"), col("kb")))
      .groupBy(col("jb"), col("kb"))
      .agg(sum(col("n_gold")).as("g"), sum(col("n_docs")).as("d"))
      .withColumn("v", expr("(g * 1000000000000) div d"))
    val mn = iv
      .join(broadcast(b.select(col("bin"))),
        col("jb") <= col("bin") && col("bin") <= col("kb"))
      .groupBy(col("jb"), col("bin"))
      .agg(min(col("v")).as("mnv"))
    val cal = mn.groupBy(col("bin")).agg(max(col("mnv")).as("cal_micro"))
    b.withColumn("raw_micro", expr("(n_gold * 1000000000000) div n_docs"))
      .join(cal, Seq("bin"))
      .select(col("bin"), col("n_docs"), col("n_gold"),
        col("raw_micro"), col("cal_micro"))
      .orderBy("bin")
  }

  /** AUC-ROC of the hashed quality classifier's logit as a RANKING of
    * the stopword gold rule — the threshold-free readout next to the
    * thresholded kappa/MCC pair: AUC = P(score⁺ > score⁻) +
    * ½P(score⁺ = score⁻), which is exactly the tie-averaged rank-sum
    * identity (R₁ − n₁(n₁+1)/2)/(n₀n₁) — the same machinery as the
    * Mann–Whitney U, because AUC IS U/(n₀n₁). Exact everything: logits
    * are int64, the doubled rank sums ride the value-frequency table +
    * range-partitioned prefix sums, and AUC is ONE division. The Gini
    * coefficient 2·AUC − 1 rides along — it equals Cliff's δ between
    * the positive and negative score distributions. */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    aucOf(Tables(spark, dir, "documents").select(
      aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
        lit(0L), (acc, w) => acc + w).as("score"),
      (stopRatio(col("text")) >= 0.1).as("gold")))
  }

  /** The rank-sum AUC core over any (score: int64, gold: boolean)
    * relation — separated so specs can feed planted rankings with
    * hand-computed areas (perfect = 1, inverted = 0, ties = ½ credit).
    * One value-frequency aggregate, [[StatsOps.withRunningCount]]'s
    * de-skewed running counts, one 1-row reduce. */
  private[ops] def aucOf(scored: DataFrame): DataFrame = aucCore(scored, Nil)

  /** Per-key AUC (the fairness-by-group form): the SAME rank machinery
    * with every stage keyed — frequency rows carry the key, the
    * running counts range-partition WITHIN each key group, and the
    * reduce is one row per key. */
  private[ops] def aucByKey(scored: DataFrame, key: String): DataFrame =
    aucCore(scored, Seq(key))

  private def aucCore(scored: DataFrame, keyCols: Seq[String]): DataFrame = {
    val d38 = DecimalType(38, 0)
    val keys = keyCols.map(col)
    val freq = scored.groupBy(keys :+ col("score"): _*)
      .agg(sum(when(col("gold"), 0L).otherwise(1L)).as("c0"),
        sum(when(col("gold"), 1L).otherwise(0L)).as("c1"))
      .withColumn("cnt", col("c0") + col("c1"))
    val run = StatsOps.withRunningCount(freq, keyCols, "score", "cnt", "run")
      .withColumn("cb", col("run") - col("cnt"))
    val db = (c: String) => col(c).cast(DoubleType)
    val aggs = Seq(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
      sum(col("c1").cast(d38) *
        (col("cb") * 2 + col("c0") + col("c1") + 1).cast(d38)).as("r1x2"))
    val grouped =
      if (keyCols.isEmpty) run.agg(aggs.head, aggs.tail: _*)
      else run.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val out = grouped
      .select(keys ++ Seq(col("n0"), col("n1"),
        when(col("n0") > 0L && col("n1") > 0L,
          (col("r1x2") - col("n1").cast(d38) * (col("n1").cast(d38) + 1))
            .cast(DoubleType) / (lit(2.0) * db("n0") * db("n1"))).as("auc")): _*)
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))
    if (keyCols.isEmpty) out else out.orderBy(keyCols.head, keyCols.tail: _*)
  }

  /** Per-language AUC of the classifier — the RANKING-fairness audit
    * next to [[classifierDisparity]]'s selection-rate one: a filter can
    * keep every language at the same rate and still rank one language's
    * quality signal at chance (AUC ≈ ½ for that group means the
    * threshold is effectively random there). One keyed frequency
    * aggregate, per-language de-skewed rank sums, |langs| output rows. */
  def classifierAucByLang(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    aucByKey(Tables(spark, dir, "documents").select(
      col("lang"),
      aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
        lit(0L), (acc, w) => acc + w).as("score"),
      (stopRatio(col("text")) >= 0.1).as("gold")), "lang")
  }

  /** Disparate-impact audit of the quality filter's keep decision by
    * language — the governance readout a curation pipeline publishes
    * with its datasheet: each group's keep rate, its ratio to the
    * most-favored group's rate, and the EEOC four-fifths flag
    * (ratio < 0.8). A quality filter that silently suppresses one
    * language's data is a model-capability bug downstream; this is the
    * one-scan check that catches it. Integer counts per group, rates
    * and ratios a fixed IEEE tree mirrored in the oracle; the max rate
    * broadcasts back over the |langs|-row table. */
  def classifierDisparity(spark: SparkSession, dir: String): DataFrame =
    keepDisparityOf(Tables(spark, dir, "documents").select(
      col("lang").as("group"), classifierKeep(col("text")).as("keep")))

  /** The inline keep decision (exact int64 logit sign) as ONE column
    * expression — shared by the batch disparity audit and its
    * streaming twin so the live monitor cannot drift from the oracled
    * decision rule. */
  private[graft] def classifierKeep(text: Column): Column = {
    val t = split(lower(text), " ")
    aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
      lit(0L), (acc, w) => acc + w) > 0L
  }

  /** The disparity tail over any (group, keep: boolean) relation —
    * separated for planted-rate specs. */
  private[ops] def keepDisparityOf(decisions: DataFrame): DataFrame =
    disparityReport(disparityCounts(decisions))

  /** Per-group integer (n, n_keep) counts — the streamable complete-mode
    * state of the disparity audit (one row per group). */
  private[graft] def disparityCounts(decisions: DataFrame): DataFrame =
    decisions.groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))

  /** Rates + four-fifths flags over the count state — republished per
    * epoch by the streaming twin, final-select by the batch audit. */
  private[graft] def disparityReport(counts: DataFrame): DataFrame = {
    val rates = counts.withColumn("keep_rate",
      col("n_keep").cast(DoubleType) / col("n").cast(DoubleType))
    val mx = rates.agg(max(col("keep_rate")).as("max_rate"))
    rates.crossJoin(broadcast(mx))
      .select(col("group"), col("n"), col("n_keep"), col("keep_rate"),
        when(col("max_rate") > 0.0, col("keep_rate") / col("max_rate"))
          .as("impact_ratio"))
      .withColumn("flagged", col("impact_ratio") < 0.8)
      .orderBy("group")
  }

  /** Expected / maximum calibration error + Brier score of the hashed
    * classifier against the stopword gold rule — the three standard
    * calibration summaries over the SAME bin table as the reliability
    * readout, with the clamped-linear confidence p̂ = (clamp(logit,
    * ±4e6) + 4e6)/8e6 making all three EXACT up to one final division:
    * per-bin |mean p̂ − gold rate|·n_b collapses to the integer
    * |Σconf − 8e6·n_gold| (ECE = Σ_bins |·| / (8e6·N)), MCE is a max of
    * per-bin fixed IEEE ratios (order-safe), and the Brier expansion
    * Σ(conf − 8e6·y)² = Σconf² − 16e6·Σconf·y + 64e12·Σy is three
    * exact decimal moments the bin scan already carries. One corpus
    * pass, a ≤ 9-row reduce. */
  def calibrationEce(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    calibrationSummaryOf(calibrationBinsRaw(spark, dir)
      .select(col("bin"), col("n_docs"), col("n_gold"),
        col("sconf"), col("sconf2").cast(d38).as("sconf2"), col("sconfgold")))
  }

  /** The ECE/MCE/Brier tail over any bin table carrying (n_docs,
    * n_gold, sconf, sconf2, sconfgold) — separated so specs can plant
    * perfectly-calibrated bins (ece = 0) and hand-computed gaps. */
  private[ops] def calibrationSummaryOf(bins: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val db = (c: String) => col(c).cast(DoubleType)
    bins
      .withColumn("gap_num", abs(col("sconf") - lit(8000000L) * col("n_gold")))
      .agg(sum(col("n_docs")).as("n_docs"), count(lit(1)).as("n_bins"),
        sum(col("gap_num")).as("ece_num"),
        max(col("gap_num").cast(DoubleType)
          / (lit(8000000.0) * col("n_docs").cast(DoubleType))).as("mce"),
        sum(col("sconf2")).as("sc2"), sum(col("sconfgold")).as("scy"),
        sum(col("n_gold")).as("ngold"))
      .select(col("n_docs"), col("n_bins"),
        (db("ece_num") / (lit(8000000.0) * db("n_docs"))).as("ece"),
        col("mce"),
        ((col("sc2").cast(d38) - col("scy").cast(d38) * lit(16000000L)
          + col("ngold").cast(d38) * lit(64000000000000L)).cast(DoubleType)
          / (lit(64000000000000.0) * db("n_docs"))).as("brier"))
  }

  /** Confident-learning joint (Northcutt, Jiang & Chuang, JAIR 2021 —
    * the cleanlab estimator): how many documents carry a PROBABLY WRONG
    * label? Treats the stopword rule as the noisy label ỹ and the
    * classifier's p̂ = cnum/8e6 as the competent second opinion; a doc
    * counts toward C[ỹ][j] when its confidence in class j clears that
    * class's SELF-CONFIDENCE mean t_j (the calibration-robust threshold
    * that makes this beat naive disagreement counting). Off-diagonal
    * mass = the label-issue estimate a relabeling queue is fed from.
    *
    * Determinism: t_j is a mean of exact int64 confidence numerators,
    * so p̂_j(x) ≥ t_j cross-multiplies to the EXACT integer comparison
    * cnum·n_j ≥ Σcnum_j (DECIMAL(38,0) — int64 dies near 1e12 docs);
    * both-qualify ties break to the argmax cnum ≥ 4e6, neither-qualify
    * docs are excluded (the paper's rule). Every output cell is an
    * integer count; the two noise rates are column-normalized ratios,
    * ONE division each, NULL on an empty column.
    *
    * Scale shape: two map-side-combinable scans of documents (the
    * thresholds are global means, so one pass must complete before the
    * counting pass; the 1-row threshold aggregate broadcasts into the
    * second). Nothing else crosses stages. */
  def confidentJoint(spark: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val dbl = (c: Column) => c.cast(DoubleType)
    val docs = docConfidence(spark, dir)
      .select((col("stop_ratio") >= 0.1).as("gold"), col("cnum"))
    // per-class self-confidence sums: class 1 reads cnum over gold
    // docs, class 0 reads the complement 8e6−cnum over non-gold docs
    val thr = docs.agg(
      sum(when(col("gold"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("gold"), col("cnum")).otherwise(0L)).as("sc1"),
      sum(when(!col("gold"), 1L).otherwise(0L)).as("n0"),
      sum(when(!col("gold"), lit(8000000L) - col("cnum")).otherwise(0L))
        .as("sc0"))
    // an EMPTY class has no self-confidence mean, so nothing can
    // qualify into it (without the n_j > 0 guard, cnum·0 ≥ 0 is
    // trivially true and a single-class corpus would manufacture
    // label issues toward a class with zero support — cleanlab drops
    // empty classes for the same reason; spec-pinned)
    val q1 = col("n1") > 0L &&
      d38(col("cnum")) * d38(col("n1")) >= d38(col("sc1"))
    val q0 = col("n0") > 0L &&
      (d38(lit(8000000L)) - d38(col("cnum"))) * d38(col("n0")) >=
        d38(col("sc0"))
    // assigned class: argmax breaks a double-qualify, NULL = excluded
    val j = when(q1 && q0, when(col("cnum") >= 4000000L, 1L).otherwise(0L))
      .when(q1, 1L).when(q0, 0L)
    val cell = (i: Boolean, jj: Long) =>
      sum(when(col("gold") === i && col("j") === jj, 1L).otherwise(0L))
    docs.crossJoin(broadcast(thr))
      .withColumn("j", j)
      .agg(count(lit(1)).as("n"),
        sum(when(col("j").isNull, 1L).otherwise(0L)).as("n_excluded"),
        cell(true, 1L).as("c11"), cell(true, 0L).as("c10"),
        cell(false, 1L).as("c01"), cell(false, 0L).as("c00"),
        max(col("n1")).as("n1"), max(col("sc1")).as("sc1"),
        max(col("n0")).as("n0"), max(col("sc0")).as("sc0"))
      .select(col("n"), col("n_excluded"),
        col("c11"), col("c10"), col("c01"), col("c00"),
        (col("c10") + col("c01")).as("n_issues"),
        when(col("n1") > 0L,
          dbl(col("sc1")) / (lit(8000000.0) * dbl(col("n1")))).as("t1"),
        when(col("n0") > 0L,
          dbl(col("sc0")) / (lit(8000000.0) * dbl(col("n0")))).as("t0"),
        // column-normalized noise rates p(ỹ≠j | y* = j)
        when(col("c11") + col("c01") > 0L,
          dbl(col("c01")) / dbl(col("c11") + col("c01"))).as("noise_to_1"),
        when(col("c10") + col("c00") > 0L,
          dbl(col("c10")) / dbl(col("c10") + col("c00"))).as("noise_to_0"))
  }

  /** Spearman rank correlation between the classifier logit and the
    * document's token count — the "is the cheap quality filter just
    * measuring LENGTH?" confounder audit a curation pipeline runs
    * before trusting keep-rates: |ρ| near 1 means the learned signal
    * collapses to document size. Rides [[StatsOps.spearmanOf]]'s exact
    * doubled-rank machinery over the two int64 signals. */
  def classifierLengthSpearman(spark: SparkSession, dir: String): DataFrame = {
    val t = split(lower(col("text")), " ")
    StatsOps.spearmanOf(Tables(spark, dir, "documents").select(
      aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
        lit(0L), (acc, w) => acc + w).as("x"),
      size(t).cast(LongType).as("y")))
  }

  /** Kendall's tau-b between the classifier's logit BIN (the
    * calibration bucketing) and the token-count BUCKET (width 16, cap
    * 15) — the concordance companion to the Spearman audit, on the
    * quantized grid because exact tau is O(n²) distributed: the grid
    * form is ONE corpus scan into ≤ 9×16 cells and constant work after
    * ([[StatsOps.kendallOfGrid]]). Quantization is the 100 TB design,
    * not a shortcut — tau over deciles is what a petabyte audit runs. */
  def classifierLengthKendall(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val t = split(lower(col("text")), " ")
    val grid = Tables(spark, dir, "documents")
      .select(
        aggregate(transform(t, tok => bucketWeight(featBucket(tok))),
          lit(0L), (acc, w) => acc + w).as("logit"),
        size(t).cast(LongType).as("n_tokens"))
      .select(
        least(greatest(floor(dbl(col("logit")) / lit(2000000.0)), lit(-4L)),
          lit(4L)).as("bx"),
        least(expr("n_tokens div 16"), lit(15L)).as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("cnt"))
    StatsOps.kendallOfGrid(grid)
  }

  /** Vocabulary-coverage curve: for each frequency cutoff θ ∈ 2⁰..2¹⁰,
    * how many distinct terms occur ≥ θ times and what share of ALL
    * token occurrences they cover — the tokenizer/vocab-design readout
    * ("a min-count of 8 keeps 1.2% of the types and 96% of the
    * tokens"). Cutoff-parameterized rather than top-k-parameterized so
    * no global rank over the vocabulary exists: each grid row is a
    * conditional aggregate, exact int64 counts, ONE division per row.
    *
    * Scale shape: one tokenization → map-side-combinable term counts;
    * the 11-row grid joins BROADCAST against the aggregated vocabulary
    * (11·|vocab| rows into an 11-group combinable rollup), and the
    * 1-row total broadcasts back. No rank window anywhere. */
  def vocabCoverageCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.parallel(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("tot"))
    val thetas = (0 to 10).map(k => Tuple1(1L << k)).toDF("theta")
    counts.crossJoin(broadcast(thetas))
      .groupBy(col("theta"))
      .agg(sum(when(col("c") >= col("theta"), 1L).otherwise(0L)).as("n_terms"),
        coalesce(sum(when(col("c") >= col("theta"), col("c"))), lit(0L))
          .as("covered"))
      .crossJoin(broadcast(total))
      .select(col("theta"), col("n_terms"), col("covered"),
        (col("covered").cast(DoubleType) / col("tot").cast(DoubleType))
          .as("share"))
      .orderBy("theta")
  }

  /** Vocabulary-richness panel — the capture-recapture view of the
    * corpus vocabulary next to [[vocabCoverageCurve]]'s cutoff view,
    * one row per gram length (unigrams, and 3-token shingles — the
    * dedup/fingerprint currency, whose heavy-tailed counts give the
    * estimators real selectivity where the bounded synthetic word
    * vocabulary saturates): type-token ratio, the Chao1 lower bound on
    * TOTAL vocabulary size V + n₁(n₁−1)/(2(n₂+1)) (bias-corrected
    * form, defined even with no doubletons), and the Good–Turing
    * unseen-mass estimate n₁/N — the probability the NEXT gram is a
    * never-seen type, the number that says whether a vocabulary was
    * fit on enough data.
    *
    * Exactness: N, V, hapax n₁ and doubleton n₂ are integer aggregates
    * of the gram-frequency table (one tokenization pass per row,
    * map-side-combinable counts, a 1-row reduce); each readout is a
    * fixed IEEE tree over those integers, replicated in the oracle.
    * Scale shape: the only shuffle is the gram rollup, bounded by
    * |vocab| — same plan as the coverage curve. */
  def vocabRichness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallel(spark, dir, "documents")
      .select(split(lower(col("text")), " ").as("t"))
    def panel(n: Int): DataFrame = {
      val dbl = (c: Column) => c.cast(DoubleType)
      val grams =
        if (n == 1) docs.select(explode(col("t")).as("term"))
        else docs.filter(size(col("t")) >= n)
          .select(explode(transform(sequence(lit(0), size(col("t")) - n),
            i => array_join(slice(col("t"), i + 1, lit(n)), " "))).as("term"))
      grams.groupBy(col("term")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n_dis"))
        .select(lit(n.toLong).as("gram_n"),
          col("n_tokens"), col("n_types"), col("n_hapax"), col("n_dis"),
          (dbl(col("n_types")) / col("n_tokens")).as("ttr"),
          (dbl(col("n_types"))
            + dbl(col("n_hapax")) * (col("n_hapax") - 1L)
              / (lit(2.0) * (col("n_dis") + 1L))).as("chao1"),
          (dbl(col("n_hapax")) / col("n_tokens")).as("gt_unseen"))
    }
    panel(1).union(panel(3)).orderBy("gram_n")
  }
}
