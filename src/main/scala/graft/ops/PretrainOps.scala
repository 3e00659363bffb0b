package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pretraining-corpus preparation operators beyond per-document dedup:
  * sub-document (paragraph) dedup, benchmark decontamination, and
  * fixed-length sequence packing — the three steps every large-scale
  * training-data pipeline runs between "corpus assembled" and "tokens on
  * the trainer" (cf. RefinedWeb/Dolma paragraph dedup, GPT-3/PaLM n-gram
  * decontamination, standard concat-and-split sequence packing).
  *
  * All three are deterministic string/integer pipelines — fully
  * value-oracled against DuckDB.
  */
object PretrainOps {

  /** Paragraph granularity: fixed token-block size. The synthetic corpus
    * has no newlines, so "paragraph" = consecutive 16-token block (the
    * operator is agnostic — a newline split plugs into the same plan). */
  val ParaTokens = 16

  /** Sub-document exact dedup: explode docs into paragraphs, keep only
    * the globally FIRST occurrence of each distinct paragraph (ordered by
    * (doc_id, para_idx)), reassemble the surviving text per document.
    *
    * Scale shape: one PARTIAL-AGGREGATABLE min(struct) keyed by the
    * paragraph for first-occurrence selection (hot boilerplate keys
    * collapse map-side before the exchange; at 100 TB key by a 128-bit
    * digest instead of the text — same plan, thinner shuffle, cf.
    * DedupOps.exactDigest), one shuffle back on doc_id for reassembly.
    * No window over the content key, no self-join, no cartesian; every
    * document is preserved (possibly empty) so the output is a drop-in
    * replacement corpus. */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedupKeyed(spark, dir, identity)

  /** The 100 TB form of [[paragraphDedup]]: the first-occurrence
    * aggregate keys on a 128-BIT DIGEST of the paragraph (two
    * independently-seeded xxhash64s — the `DedupOps.exactDigest` key)
    * instead of the paragraph text, so the dedup exchange hashes,
    * compares and sorts 16-byte keys rather than arbitrary-length
    * strings. Plan and output are otherwise IDENTICAL to the text-keyed
    * form barring a digest collision (~n²/2¹²⁹, negligible at any
    * corpus size) — which is why it shares the text-keyed DuckDB oracle,
    * and the suite pins row-for-row equality of the two forms. */
  def paragraphDedupDigest(spark: SparkSession, dir: String): DataFrame =
    paragraphDedupKeyed(spark, dir, DedupOps.digest128)

  /** Shared paragraph-dedup plan; `keyOf` maps the paragraph column to
    * the dedup aggregation key (text, or its 128-bit digest). */
  private def paragraphDedupKeyed(spark: SparkSession, dir: String,
      keyOf: Column => Column): DataFrame = {
    val k = ParaTokens
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val paras = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ceil(size(col("t")) / lit(k.toDouble)).cast(IntegerType) - 1),
        i => array_join(slice(col("t"), i * k + 1, lit(k)), " "))).as(Seq("para_idx", "para")))
    // First occurrence per distinct paragraph as min(struct(doc_id,
    // para_idx, para)) — (doc_id, para_idx) is globally unique, so the
    // struct min IS the row that a row_number window ordered by (doc_id,
    // para_idx) would rank 1, and it carries the paragraph text out of
    // the aggregate so no join back on the content key is needed. Unlike
    // a window PARTITIONED BY the content key (which lands every
    // occurrence of a hot boilerplate paragraph in ONE task — dedup's
    // hot keys are its duplicates by definition), a partial-aggregatable
    // min collapses each map partition to one row per distinct key
    // BEFORE the exchange: the hot key crosses the wire at most
    // numPartitions times regardless of its corpus frequency.
    val kept = paras
      .groupBy(keyOf(col("para")).as("pk"))
      .agg(min(struct(col("doc_id"), col("para_idx"), col("para"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.para_idx").as("para_idx"),
        col("w.para").as("para"))
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("para_idx"), col("para")))),
            s => s.getField("para")), " ").as("clean_text"))
    toks
      .select(col("doc_id"),
        ceil(size(col("t")) / lit(k.toDouble)).cast(IntegerType).as("n_paras"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** Corpus-frequency boilerplate threshold: a paragraph present in this
    * many (or more) DISTINCT documents is boilerplate (C4/CCNet-style
    * repeated-line removal — headers, footers, licence blurbs). */
  val BoilerplateDf = 2

  /** Boilerplate removal: drop every paragraph (16-token block, see
    * [[ParaTokens]]) whose corpus document-frequency ≥ [[BoilerplateDf]],
    * keeping ALL occurrences of corpus-unique paragraphs — the complement
    * of [[paragraphDedup]], which keeps the first occurrence of every
    * paragraph. Output is a drop-in replacement corpus with per-document
    * survival counts.
    *
    * Scale shape: df — distinct-doc count per paragraph — is TWO
    * partial-aggregatable hash aggregates, not a window over the content
    * key: the (para, doc_id) distinct spreads a hot paragraph across
    * reducers (doc_id varies inside the composite key), and the df count
    * then collapses map-side to one row per distinct paragraph per
    * partition. Only paragraphs at df ≥ [[BoilerplateDf]] survive the
    * filter, so the join back onto the occurrence table carries the
    * (small) BOILERPLATE SET as its build side — broadcastable when it
    * fits, and a one-row-per-key build side that AQE's skew-join split
    * handles when the probe side is hot (a window partitioned by `para`
    * offers neither escape: every occurrence of a hot paragraph lands in
    * ONE task, not map-side combinable — the classic skew cliff at
    * 100×). The verdict, kept count, paragraph total and reassembly fold
    * into one doc_id aggregation (every document has ≥ 1 paragraph, so
    * no left join is needed to resurrect fully-stripped docs — their
    * collect_list is simply empty). At 100 TB the paragraph key becomes
    * a 128-bit digest (cf. DedupOps.exactDigest) so the exchanges carry
    * 16-byte keys, not text. */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val k = ParaTokens
    val paras = Tables.parallel(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ceil(size(col("t")) / lit(k.toDouble)).cast(IntegerType) - 1),
          i => array_join(slice(col("t"), i * k + 1, lit(k)), " "))).as(Seq("para_idx", "para")))
    val boiler = paras.select(col("para"), col("doc_id")).distinct()
      .groupBy(col("para")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerplateDf)
      .select(col("para"), lit(true).as("is_boiler"))
    paras.join(boiler, Seq("para"), "left")
      .groupBy(col("doc_id"))
      .agg(
        (max(col("para_idx")) + 1).cast(IntegerType).as("n_paras"),
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L))
          .cast(IntegerType).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(
            when(col("is_boiler").isNull, struct(col("para_idx"), col("para"))))),
            s => s.getField("para")), " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Decontamination n-gram width (tokens). Real pipelines use ~13-gram;
    * the synthetic docs bottom out at 10 tokens, so 8 keeps every doc in
    * scope without changing the plan shape. */
  val ContamGram = 8

  /** Benchmark-membership rule for the synthetic corpus: doc_id ≡ 0
    * (mod BenchMod) stands in for "row belongs to the eval suite". One
    * constant shared by the batch operator, the assembly pipeline, and
    * the oracle SQL (interpolated) so the rule cannot drift. */
  val BenchMod = 97

  /** Benchmark decontamination: flag every corpus document sharing at
    * least one `ContamGram`-token n-gram with the held-out benchmark set
    * (here: doc_id ≡ 0 (mod 97) — the deterministic stand-in for an eval
    * suite). Output: per non-benchmark doc, the count of distinct shared
    * n-grams and the contamination flag.
    *
    * Scale shape: the benchmark n-gram set is tiny relative to the corpus
    * (eval suites are fixed-size) → broadcast hash join against the
    * exploded corpus n-grams; ONE aggregation shuffle on doc_id. N-grams
    * flow as strings here to stay value-oracleable; the production swap
    * is a 64-bit n-gram hash (ShingleHashes), identical plan. */
  /** Tokens column → distinct k-gram string set (one array per doc). */
  private def gramSet(k: Int) =
    array_distinct(transform(sequence(lit(0), size(col("t")) - k),
      i => array_join(slice(col("t"), i + 1, lit(k)), " ")))

  /** (doc_id, tokens) → exploded distinct k-gram strings per doc. */
  private def grams(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"), explode(gramSet(k)).as("g"))

  private def tokenized(docs: DataFrame, k: Int): DataFrame = docs
    .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    .filter(size(col("t")) >= k)

  /** The distinct benchmark n-gram set of a (doc_id, text) document set —
    * the broadcastable contamination index. `keyOf` maps each gram to
    * the index key (the gram text, or its 128-bit digest — the
    * production contamination-index shape, see
    * [[decontaminateDigest]]). */
  def benchmarkGrams(benchDocs: DataFrame, k: Int = ContamGram,
      keyOf: Column => Column = identity): DataFrame =
    grams(tokenized(benchDocs, k), k).select(keyOf(col("g")).as("g")).distinct()

  /** Check a (doc_id, text) document set against a benchmark gram set.
    * Shared by the batch operator and the streaming twin
    * (graft.streaming.StreamingDecontaminate) — identical semantics per
    * micro-batch because the check is per-document (no cross-doc state).
    * `keyOf` must match the one the gram set was built with. */
  def checkAgainst(docs: DataFrame, benchGrams: DataFrame, k: Int = ContamGram,
      keyOf: Column => Column = identity): DataFrame = {
    val toks = tokenized(docs, k)
    val hits = grams(toks, k)
      .select(col("doc_id"), keyOf(col("g")).as("g"))
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast(IntegerType).as("n_shared"))
    toks.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0)) > 0).as("contaminated"))
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateKeyed(spark, dir, identity)

  /** The 100 TB form of [[decontaminate]] its scale note promises: the
    * broadcast contamination index and the corpus probe both key on a
    * 128-BIT GRAM DIGEST (two independently-seeded xxhash64s — the
    * `DedupOps.digest128` key) instead of the 8-token gram string, so
    * the broadcast holds 16-byte keys and the probe compares
    * fixed-width values — the shape a production n-gram contamination
    * index ships at. Identical output barring a digest collision
    * (~n²/2¹²⁹), which is why it shares the string-keyed DuckDB
    * oracle; the suite pins row equality of the two forms. */
  def decontaminateDigest(spark: SparkSession, dir: String): DataFrame =
    decontaminateKeyed(spark, dir, DedupOps.digest128)

  private def decontaminateKeyed(spark: SparkSession, dir: String,
      keyOf: Column => Column): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bench = benchmarkGrams(docs.filter(col("doc_id") % BenchMod === 0),
      ContamGram, keyOf)
    checkAgainst(docs.filter(col("doc_id") % BenchMod =!= 0), bench,
      ContamGram, keyOf)
      .orderBy("doc_id")
  }

  /** Bloom filter sizing for [[decontaminateBloom]]: 2²¹ bits (256 KiB)
    * for ≤ ~200k benchmark grams ⇒ ~10 bits/key, ~1% false-positive
    * rate — the sketch stays a constant-size driver scalar however big
    * the corpus side grows. */
  val ContamBloomBits: Long = 1L << 21
  val ContamBloomItems: Long = 200000L

  /** The post-broadcast-era form of [[decontaminate]]: when the eval
    * universe outgrows a row-wise broadcast (many benchmarks × many
    * grams), the exact confirm becomes a SHUFFLE join of corpus grams
    * against the benchmark gram set — and the dominant cost is shuffling
    * the exploded corpus grams (the 100 TB side). This twin prunes that
    * exchange with a serialized bloom filter of the benchmark grams
    * (bounded driver bytes, never the keys — the j9_bloom_semi
    * pattern): the codegen'd `might_contain` kernel drops ~99% of
    * non-matching grams BEFORE the shuffle, and the exact join removes
    * the sketch's false positives, so the result is bit-identical to
    * [[decontaminate]] and shares its DuckDB oracle.
    *
    * No broadcast hint on the confirm join on purpose: at test scale
    * AQE may still pick broadcast-hash (fine — same rows); at eval-suite
    * sizes past the threshold the plan degrades to a shuffle join whose
    * probe side the bloom has already shrunk to ~|matching|·(1+fpp). */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions
    val docs = Tables(spark, dir, "documents")
    val bench = benchmarkGrams(docs.filter(col("doc_id") % BenchMod === 0))
    val bf = bench
      .agg(BloomFunctions
        .bloomFilterAgg(col("g"), ContamBloomItems, ContamBloomBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val toks = tokenized(docs.filter(col("doc_id") % BenchMod =!= 0), ContamGram)
    val hits = grams(toks, ContamGram)
      .filter(BloomFunctions.mightContain(bf, col("g")))
      .join(bench, Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast(IntegerType).as("n_shared"))
    toks.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** SURGICAL decontamination — the span-level alternative to dropping
    * a contaminated document whole: every token covered by ANY shared
    * benchmark [[ContamGram]]-gram occurrence is redacted (removed) and
    * the surviving tokens reassemble into a drop-in replacement text.
    * Real pipelines prefer this when contamination is a quoted eval
    * item inside an otherwise-good document — dropping the doc wastes
    * the good tokens, keeping it leaks the eval item; excising exactly
    * the covered span does neither.
    *
    * Matching runs on the lowercased tokens (the [[decontaminate]]
    * rule); redaction removes the ORIGINAL-case tokens at the matched
    * positions — lowercasing never moves a space, so positions align.
    *
    * Scale shape: same broadcast benchmark-gram index as
    * [[decontaminate]]; matched START POSITIONS flow back to the doc
    * through one doc_id aggregation (a list bounded by the doc's own
    * gram count — per-doc state, never corpus-wide), and the covered-
    * set arithmetic is narrow per-row array logic. Every step is
    * deterministic integer/string work → fully value-oracled. */
  def decontaminateRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bench = benchmarkGrams(docs.filter(col("doc_id") % BenchMod === 0))
    redactAgainst(docs.filter(col("doc_id") % BenchMod =!= 0), bench)
      .orderBy("doc_id")
  }

  /** Redact a (doc_id, text) document set against a benchmark gram set —
    * the core [[decontaminateRedact]] and its streaming twin
    * (graft.streaming.StreamingDecontaminate.serveRedact) share;
    * per-document semantics, so micro-batches compose exactly like the
    * boolean gate's. */
  def redactAgainst(docs: DataFrame, bench: DataFrame,
      k: Int = ContamGram): DataFrame = {
    // NO length filter on the output path: a doc shorter than the gram
    // width cannot contain a benchmark gram, so it passes through
    // UNREDACTED — a drop-in replacement corpus must keep every doc
    // (the paragraphDedup contract), unlike the boolean gate, whose
    // report covers only gram-bearing docs by construction
    val toks = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        split(lower(col("text")), " ").as("tl"))
    // ALL gram occurrences with 1-based start positions (no distinct —
    // a benchmark phrase quoted twice redacts both sites). The short-doc
    // guard matters: sequence(0, negative) would auto-reverse, not empty
    val gramsOf = when(size(col("tl")) >= k,
      transform(sequence(lit(0), size(col("tl")) - k),
        i => array_join(slice(col("tl"), i + 1, lit(k)), " ")))
      .otherwise(array().cast(ArrayType(StringType, containsNull = false)))
    val starts = toks
      .select(col("doc_id"), posexplode(gramsOf).as(Seq("p0", "g")))
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("p0") + 1)).as("starts"))
    val emptyStarts = array().cast(ArrayType(IntegerType, containsNull = false))
    val covered = (p: Column) =>
      exists(col("starts"), s => p >= s && p <= s + lit(k - 1))
    toks.join(starts, Seq("doc_id"), "left")
      .withColumn("starts", coalesce(col("starts"), emptyStarts))
      .withColumn("kept_pos",
        filter(sequence(lit(1), size(col("t"))), p => !covered(p)))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        size(col("starts")).as("n_matches"),
        (size(col("t")) - size(col("kept_pos"))).as("n_redacted"),
        array_join(transform(col("kept_pos"), p => element_at(col("t"), p)), " ")
          .as("clean_text"))
  }

  /** Per-document contamination FRACTION — the score form of
    * `decontaminate`'s boolean: shared benchmark grams over the doc's
    * distinct grams. Thresholding at >0 reproduces the boolean; real
    * pipelines instead drop frac > τ outright and route the low-score
    * tail to review, because one shared gram in a long document is
    * usually phrase coincidence while densely shared docs are true eval
    * leaks. Same plan as decontaminate (tiny broadcast gram index, one
    * doc_id aggregation) plus the per-doc gram cardinality carried from
    * the same gram-set expression — no extra pass. */
  def contaminationScore(spark: SparkSession, dir: String): DataFrame =
    contaminationScoreKeyed(spark, dir, identity)

  /** Digest-keyed twin of [[contaminationScore]] — same 16-byte-key
    * broadcast index as [[decontaminateDigest]]; the per-doc gram
    * cardinality is unchanged (digesting a distinct gram set preserves
    * its size barring collision), so it shares the string-keyed oracle
    * and the suite pins twin equality. */
  def contaminationScoreDigest(spark: SparkSession, dir: String): DataFrame =
    contaminationScoreKeyed(spark, dir, DedupOps.digest128)

  private def contaminationScoreKeyed(spark: SparkSession, dir: String,
      keyOf: Column => Column): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val bench = benchmarkGrams(docs.filter(col("doc_id") % BenchMod === 0),
      ContamGram, keyOf)
    val gs = tokenized(docs.filter(col("doc_id") % BenchMod =!= 0), ContamGram)
      .select(col("doc_id"), gramSet(ContamGram).as("gs"))
    val hits = gs.select(col("doc_id"), explode(col("gs")).as("g"))
      .select(col("doc_id"), keyOf(col("g")).as("g"))
      .join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast(IntegerType).as("n_shared"))
    gs.select(col("doc_id"), size(col("gs")).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0)).cast(DoubleType) / col("n_grams"))
          .as("contam_frac"))
      .orderBy("doc_id")
  }

  /** Benchmark NOVELTY audit — contamination viewed from the eval side:
    * for each BENCHMARK document, what fraction of its distinct
    * [[ContamGram]]-grams never occurs in the training corpus? An eval
    * item whose grams are mostly present in training measures
    * memorization, not capability, even when no single document tripped
    * the per-doc decontamination rule (its grams can be scattered over
    * MANY training docs). Eval-suite release notes publish exactly this
    * per-item novelty profile next to the corpus-side report.
    *
    * Scale shape — the mirror image of [[decontaminate]]: the tiny
    * bench gram set broadcasts against ONE corpus gram scan; the
    * matched-gram set collapses to ≤|bench grams| rows via a distinct
    * on the gram key BEFORE the per-bench-doc rollup (a gram seen in a
    * million training docs contributes one row after the map-side
    * partial distinct — hot grams cannot skew the exchange). The corpus
    * never shuffles; only bench-sized relations do. */
  def benchNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val benchDocs = tokenized(docs.filter(col("doc_id") % BenchMod === 0), ContamGram)
      .select(col("doc_id"), gramSet(ContamGram).as("gs"))
    val benchGrams = benchDocs.select(explode(col("gs")).as("g")).distinct()
    // grams of the bench set that occur ANYWHERE in the training corpus:
    // corpus grams stream past the broadcast bench set; distinct-on-gram
    // is partially aggregated map-side, so the exchange carries at most
    // |bench grams| rows regardless of corpus-side gram frequency
    val seen = grams(tokenized(docs.filter(col("doc_id") % BenchMod =!= 0), ContamGram),
        ContamGram)
      .select(col("g"))
      .join(broadcast(benchGrams), Seq("g"))
      .distinct()
    val perDoc = benchDocs.select(col("doc_id"), explode(col("gs")).as("g"))
      .join(seen.withColumn("hit", lit(1)), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast(IntegerType).as("n_seen"))
    perDoc.select(col("doc_id"), col("n_grams"), col("n_seen"),
      (lit(1.0) - col("n_seen").cast(DoubleType) / col("n_grams")).as("novelty_frac"))
      .orderBy("doc_id")
  }

  /** Benchmark-membership modulus for the FUZZY decontamination variant.
    * Deliberately different from [[BenchMod]]: mod 97 places so few docs
    * in the synthetic eval suite that no near-duplicate pair straddles
    * the boundary at sf0.01 — a denser stand-in suite (mod 31) makes the
    * fuzzy flag demonstrably fire at every test SF, so the value oracle
    * exercises the hit path, not just the all-clear path. */
  val FuzzyBenchMod = 31

  /** FUZZY decontamination — the near-duplicate complement of the exact
    * n-gram rule: a corpus document is contaminated when its trigram
    * shingle set has Jaccard ≥ 1/2 with ANY benchmark document. Exact
    * 8-gram matching ([[decontaminate]]) misses eval items that were
    * lightly paraphrased or token-edited before landing in the crawl;
    * near-dup matching against the suite is the standard second gate
    * (the GPT-3/Llama report shape: 13-gram exact + fuzzy dedup of eval
    * overlap).
    *
    * Scale shape: the eval suite is fixed-size, so its exploded shingle
    * POSTING LIST broadcasts (never a corpus-side shuffle by shingle);
    * corpus docs explode against it and one (doc, bench) aggregation —
    * partial-aggregatable, bounded by |bench| rows per doc — recovers
    * the common-shingle counts; the integer Jaccard test and a per-doc
    * rollup finish the job. The corpus is scanned once; internal keys
    * are 64-bit shingle hashes ([[graft.functions.ShingleHashes]]), and
    * the full-corpus left join back makes the all-clear rows explicit
    * (a decontamination report must list every kept doc, not only the
    * flagged ones). */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.parallel(spark, dir, "documents")
    fuzzyCheckAgainst(
      all.filter(col("doc_id") % FuzzyBenchMod =!= 0),
      benchShinglePosting(all.filter(col("doc_id") % FuzzyBenchMod === 0)))
      .orderBy("doc_id")
  }

  /** Trigram shingle spine of a (doc_id, text) doc set: sorted 64-bit
    * hash set + cardinality; ≥3-token docs only (a shorter doc has no
    * trigram and is out of the fuzzy check's scope by construction). */
  private def shingleSpine(docs: DataFrame): DataFrame = {
    import graft.functions.exprs._
    docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingle_hashes(split(lower(col("text")), " "), 3).as("hs"))
      .withColumn("n", size(col("hs")))
  }

  /** Exploded benchmark shingle posting (bench_id, n_b, sh) — the
    * broadcastable fuzzy-contamination index (the near-dup analogue of
    * [[benchmarkGrams]]). Built ONCE per eval-suite snapshot; batch
    * sweeps and the streaming gate both probe it. */
  def benchShinglePosting(benchDocs: DataFrame): DataFrame =
    shingleSpine(benchDocs)
      .select(col("doc_id").as("bench_id"), col("n").as("n_b"),
        explode(col("hs")).as("sh"))

  /** Check a (doc_id, text) doc set against a benchmark shingle posting.
    * Per-document (no cross-doc state) — shared by the batch operator
    * and the streaming twin (graft.streaming.StreamingDecontaminate
    * .serveFuzzy), so micro-batch composition preserves semantics
    * exactly. */
  def fuzzyCheckAgainst(docs: DataFrame, benchPosting: DataFrame): DataFrame = {
    val corpus = shingleSpine(docs)
    val hits = corpus
      .select(col("doc_id"), col("n").as("n_a"), explode(col("hs")).as("sh"))
      .join(broadcast(benchPosting), Seq("sh"))
      .groupBy(col("doc_id"), col("bench_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast(IntegerType).as("c"))
      .filter(lit(2) * col("c") >= col("n_a") + col("n_b") - col("c"))
      .select(col("doc_id"),
        (col("c").cast(DoubleType) / (col("n_a") + col("n_b") - col("c"))).as("jac"))
    val perDoc = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_bench_nd"),
        max(col("jac")).as("best_jaccard"))
    corpus.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_nd"), lit(0)).as("n_bench_nd"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        (coalesce(col("n_bench_nd"), lit(0)) > 0).as("contaminated"))
  }

  /** Span width (tokens) for substring-level dedup. Real pipelines use
    * ~50-token spans (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better"); the synthetic docs bottom out at 10
    * tokens, so 8 keeps every doc in scope with the same plan shape. */
  val SpanTokens = 8

  /** Duplicated-span fraction threshold for [[spanDedupFilter]]. */
  val SpanDupMax = 0.5

  /** Substring-level duplication profile — the dedup granularity BETWEEN
    * document level (DedupOps) and aligned paragraph blocks
    * ([[paragraphDedup]]): every stride-1 window of [[SpanTokens]] tokens
    * is a span; a span present in ≥2 documents is duplicated text even
    * when no paragraph boundary aligns with it. Output per document: its
    * distinct-span count, how many of those spans recur elsewhere in the
    * corpus, and the duplicated fraction — the signal substring-level
    * dedup thresholds on.
    *
    * Scale shape: ONE partial-aggregatable exchange keyed by the span
    * (spans are distinct per doc, so count-per-key IS corpus document
    * frequency, and a hot boilerplate span collapses map-side to one row
    * per partition before the wire — no window over the content key
    * anywhere). A span at df = 1 belongs to exactly ONE document,
    * recoverable as min(doc_id) inside the SAME aggregate, so each doc's
    * duplicated-span count is n_spans − n_unique with NO join back on
    * the span key at all: the df = 1 groups re-aggregate by their owner
    * doc (one tiny row per doc), and n_spans recomputes narrowly from
    * the token arrays. Span fan-out is ~|tokens| rows/doc; at 100 TB the
    * span key becomes a 64/128-bit shingle digest (`ShingleHashes`) so
    * the exchange carries fixed-width keys, and the df count caps with
    * the `MaxBucket` pattern — identical plan. */
  def spanDupProfile(spark: SparkSession, dir: String): DataFrame =
    spanProfileOf(Tables.parallel(spark, dir, "documents")).orderBy("doc_id")

  /** The 100 TB form of [[spanDupProfile]]: the df exchange keys on a
    * 128-BIT DIGEST of the span (two independently-seeded
    * xxhash64s — the `exactDigest`/`paragraphDedupDigest` key) instead
    * of the span text, so the one big shuffle carries 16-byte keys
    * rather than 8-token strings. Identical output barring a digest
    * collision (~n²/2¹²⁹) — which is why it shares the text-keyed
    * DuckDB oracle, and the suite pins row equality of the two forms. */
  def spanDupProfileDigest(spark: SparkSession, dir: String): DataFrame =
    spanProfileOf(Tables.parallel(spark, dir, "documents"), DedupOps.digest128)
      .orderBy("doc_id")

  private def spanProfileOf(docs: DataFrame,
      keyOf: Column => Column = identity): DataFrame = {
    val toks = tokenized(docs, SpanTokens)
    val spans = grams(toks, SpanTokens)
      .select(col("doc_id"), keyOf(col("g")).as("gk"))
    val uniq = spans.groupBy(col("gk"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_uniq"))
    toks.select(col("doc_id"), size(gramSet(SpanTokens)).as("n_spans"))
      .join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_spans").cast(IntegerType).as("n_spans"),
        (col("n_spans") - coalesce(col("n_uniq"), lit(0L)))
          .cast(IntegerType).as("n_dup"))
      .withColumn("dup_frac",
        col("n_dup").cast(DoubleType) / col("n_spans"))
  }

  /** Substring-level dedup filter: drop documents whose duplicated-span
    * fraction exceeds [[SpanDupMax]] — mostly-recycled text is removed
    * whole (stitching partial spans back together mid-document mangles
    * grammar; pipelines cut at the document once duplication dominates).
    * Same plan as [[spanDupProfile]] plus the final filter. */
  def spanDedupFilter(spark: SparkSession, dir: String): DataFrame =
    spanProfileOf(Tables.parallel(spark, dir, "documents"))
      .filter(col("dup_frac") <= SpanDupMax)
      .select(col("doc_id"), col("n_spans"), col("dup_frac"))
      .orderBy("doc_id")

  /** Chunking geometry: window of `ChunkTokens` tokens advancing by
    * `ChunkStride` (25% overlap) — the retrieval/embedding-prep shape. */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** Overlapping-window chunking: each document fans out into token
    * windows of `ChunkTokens` advancing by `ChunkStride` — how a corpus
    * is prepared for embedding models and retrieval indexes (overlap
    * preserves context across cuts). The last window starts at the final
    * stride position that still adds new tokens, so every token lands in
    * ≥1 chunk and no empty windows are emitted. Narrow per-row explode —
    * no shuffle beyond the output sort; fully value-oracled. */
  def chunkWindows(spark: SparkSession, dir: String): DataFrame = {
    val (w, s) = (ChunkTokens, ChunkStride)
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // number of windows = 1 + ceil(max(0, n - w) / s)
    val n = size(col("t"))
    val nChunks = (lit(1) +
      ceil(greatest(n - w, lit(0)).cast(DoubleType) / s).cast(IntegerType)).as("nc")
    toks.select(col("doc_id"), col("t"), nChunks)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => array_join(slice(col("t"), i * s + 1, lit(w)), " "))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"),
        size(split(col("chunk"), " ")).as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Training-sequence length (tokens) for packing. */
  val SeqLen = 2048

  /** Sequence packing bookkeeping: documents are concatenated per source
    * shard in doc_id order and split into fixed `SeqLen`-token training
    * sequences; each document reports its token offset in the shard
    * stream and the first/last sequence it lands in (documents may
    * straddle a boundary — the standard concat-and-split regime).
    *
    * Scale shape: the per-source running sum rides [[packWith]]'s
    * range-partitioned prefix sums — a giant source spreads over many
    * contiguous (source, doc_id) slices instead of serializing into one
    * window task. Pure integer arithmetic → value-oracled. */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packWith(spark, dir, size(split(col("text"), " ")))

  /** Tokenizer-consistent packing: identical plan, but the packing
    * currency is the BPE-ish regex token count `TextOps.tokenStats`
    * publishes (`TextOps.BpeTokenRe` — one shared constant, so counting
    * and packing cannot drift). A trainer packs BPE tokens, not
    * whitespace tokens; with this twin the sequence boundaries line up
    * with what the token counter reports. Fully value-oracled (the regex
    * stays in the Java/RE2-agreeing subset). */
  def packSequencesBpe(spark: SparkSession, dir: String): DataFrame =
    packWith(spark, dir, TextOps.bpeTokenCount(col("text")))

  /** Length-bucketed batching stats: documents binned by BPE-regex token
    * count into fixed-width buckets — the histogram a training scheduler
    * uses to build length-homogeneous batches (padding waste ∝ in-batch
    * length spread) and the sanity check before choosing `SeqLen`.
    *
    * Scale shape: a single hash aggregate on the derived bucket key —
    * partial aggregation collapses each partition to ≤ |buckets| rows
    * before the (tiny) shuffle; nothing else moves. Integer bucket
    * arithmetic → value-oracled. */
  val BucketWidth = 16

  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(TextOps.bpeTokenCount(col("text")).as("n_tokens"))
      .groupBy((floor(col("n_tokens") / BucketWidth).cast(IntegerType) * BucketWidth)
        .as("bucket_lo"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy("bucket_lo")

  /** Per-SEQUENCE document-boundary spans — the inverse view of
    * [[packSequences]] and the artifact the TRAINER actually consumes:
    * concat-and-split packing puts fragments of several documents into
    * one fixed-length sequence, and cross-document attention must be
    * masked at exactly these offsets (the "attention separator" table
    * every packed-pretraining recipe ships next to the token shards).
    * One row per (sequence, resident document): where the fragment
    * starts inside the sequence and how many tokens it contributes —
    * straddling documents appear once per sequence they touch, interior
    * spans cover the full SeqLen, and per-sequence spans tile the
    * sequence exactly (spec-pinned).
    *
    * Scale shape: the [[packSequences]] per-shard running sum, then a
    * NARROW explode of each doc over its [seq_first, seq_last] range —
    * fan-out = #sequences the doc touches (≈ n_tokens/SeqLen + 1), and
    * the span arithmetic is per-row integer min/max. No new shuffle
    * beyond packing's shard window and the output sort. */
  def packBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val sl = lit(SeqLen.toLong)
    packWith(spark, dir, size(split(col("text"), " ")))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("tok_offset"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq_idx"))
      .select(col("source"), col("seq_idx"), col("doc_id"),
        greatest(col("tok_offset") - col("seq_idx").cast(LongType) * sl, lit(0L))
          .cast(IntegerType).as("start_in_seq"),
        (least(col("tok_offset") + col("n_tokens"),
            (col("seq_idx").cast(LongType) + 1L) * sl)
          - greatest(col("tok_offset"), col("seq_idx").cast(LongType) * sl))
          .cast(IntegerType).as("span_len"))
      .orderBy("source", "seq_idx", "start_in_seq")
  }

  /** Packing-regime waste comparison — the capacity question a trainer
    * answers before choosing a packing strategy: per shard, how many
    * [[SeqLen]] sequences (and how much padding waste) does
    * CONCAT-AND-SPLIT need versus PAD-PER-DOC (each document rounded up
    * to whole sequences — no straddling, no cross-doc attention, the
    * regime instruction-tuning typically uses)? Concat wastes only the
    * final partial sequence per shard; pad-per-doc wastes the tail of
    * every document, and the delta is exactly what the attention-mask
    * machinery ([[packBoundaries]]) buys.
    *
    * Scale shape: ONE shard-keyed aggregation — both regimes reduce to
    * sums of per-doc integer arithmetic (Σn and Σ⌈n/L⌉), fully
    * map-side combinable; no window, no explode. */
  def packWaste(spark: SparkSession, dir: String): DataFrame = {
    val l = SeqLen.toLong
    Tables(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast(LongType).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(IntegerType).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(expr(s"(n + ${l - 1}) div $l")).as("seqs_padded"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${l - 1}) div $l").as("seqs_concat"),
        col("seqs_padded"))
      .withColumn("waste_concat", expr(s"seqs_concat * $l") - col("total_tokens"))
      .withColumn("waste_padded", expr(s"seqs_padded * $l") - col("total_tokens"))
      .orderBy("source")
  }

  /** Shared core of the packing family: per-source running token sums
    * in doc_id order, WITHOUT a per-source window. A
    * `Window.partitionBy(source)` running sum hands ALL documents of a
    * source to one task — at 100 TB with a handful of sources that is a
    * sequential scan of billions of rows per task, the last
    * scale-killer shape the round-11 plan audit flagged. The fix is the
    * range-partitioned prefix-sum mechanism already proven for
    * [[StatsOps.withRunningCount]]: range-repartition by
    * (source, doc_id) so each task holds a contiguous sampled-balanced
    * slice, roll each (source, slice) to one partial sum, prefix those
    * partials with a TINY window (|sources|·|slices| rows), broadcast
    * the offsets back, and finish with a within-slice window. Integer
    * sums at every step ⇒ bit-identical to the textbook per-source
    * window (spec-pinned against it, plus a 100×-skewed-source spec). */
  private def packWith(spark: SparkSession, dir: String,
      nTokens: org.apache.spark.sql.Column): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), nTokens.as("n_tokens"))
    StatsOps.withRunningCount(docs, Seq("source"), "doc_id", "n_tokens", "cum")
      .select(col("source"), col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("tok_offset"),
        expr(s"CAST((cum - n_tokens) div $SeqLen AS INT)").as("seq_first"),
        expr(s"CAST((cum - 1) div $SeqLen AS INT)").as("seq_last"))
      .orderBy("source", "doc_id")
  }

  // ------------------------------------------------------------------
  // Content-defined chunking (gear/FastCDC family)
  // ------------------------------------------------------------------

  /** CDC boundary geometry: a chunk boundary falls after token i whenever
    * the hash of the [[CdcWindow]]-token window ending at i is ≡ 0 mod
    * [[CdcMask]] — expected chunk length [[CdcMask]] tokens. */
  val CdcWindow = 4
  val CdcMask = 8

  /** Content-defined chunking — the insertion-robust alternative to
    * [[chunkWindows]]'s fixed stride (Muthitacharoen et al. LBFS '01;
    * FastCDC '16): boundaries depend only on the LOCAL token window, so
    * inserting a prefix into a document shifts every fixed-stride chunk
    * but leaves every content-defined chunk after the first post-edit
    * boundary byte-identical — which is what makes shifted/near-dup
    * content dedupable at chunk granularity (the `spanDupProfile`
    * family's stride-1 cost, without the stride-1 fan-out: one output
    * row per ~[[CdcMask]] tokens instead of one per token).
    *
    * A boundary closes a chunk after token i (i ≥ [[CdcWindow]]) when
    * md5 of the window ending at i maps to 0 mod [[CdcMask]]; the final
    * token always closes the last chunk. Emitted per chunk: ordinal,
    * 1-based token start, token count, and the md5 digest of the chunk
    * text (the dedup key). md5 keeps every step engine-bit-identical →
    * fully value-oracled.
    *
    * Scale shape: pure per-row array arithmetic (window hashes, one
    * filter, one explode) — no shuffle beyond the output sort, and the
    * per-doc work is O(n_tokens · [[CdcWindow]]). The production
    * min/max chunk-size clamp is served as [[cdcChunksClamped]]. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
    // candidate boundary positions: window hash ≡ 0 (mod CdcMask).
    // sequence(a, b) auto-reverses when b < a, so the n < CdcWindow case
    // must short-circuit to an empty array, not sequence(4, n)
    val cuts = filter(
      when(col("n") >= CdcWindow, sequence(lit(CdcWindow), col("n")))
        .otherwise(array().cast(ArrayType(IntegerType, containsNull = false))),
      i => conv(substring(md5(array_join(
        slice(col("t"), i - lit(CdcWindow - 1), lit(CdcWindow)), " ")),
        1, 5), 16, 10).cast(LongType) % CdcMask === 0L)
    // the last token always ends the final chunk; array_max(empty) is
    // null so the comparison safely falls to the append branch
    val withEnds = docs.withColumn("cuts", cuts)
      .withColumn("ends",
        when(array_max(col("cuts")) === col("n"), col("cuts"))
          .otherwise(concat(col("cuts"), array(col("n")))))
    chunkRows(withEnds)
  }

  /** Shared chunk-emission tail: (doc_id, t, ends) → one row per chunk
    * with ordinal, start, length and md5 digest — used by the pure
    * filter form ([[cdcChunks]]) and the clamped fold
    * ([[cdcChunksClamped]]), so the two variants cannot drift in how
    * boundaries become rows. */
  private def chunkRows(withEnds: DataFrame): DataFrame =
    withEnds
      .select(col("doc_id"), col("t"), col("ends"),
        explode(sequence(lit(1), size(col("ends")))).as("chunk_idx"))
      .withColumn("start_pos",
        when(col("chunk_idx") === 1, lit(1))
          .otherwise(element_at(col("ends"), col("chunk_idx") - 1) + 1))
      .withColumn("n_chunk_tokens",
        element_at(col("ends"), col("chunk_idx")) - col("start_pos") + 1)
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"), col("n_chunk_tokens"),
        md5(array_join(slice(col("t"), col("start_pos"), col("n_chunk_tokens")), " "))
          .as("digest"))
      .orderBy("doc_id", "chunk_idx")

  /** Min/max chunk-size clamp for [[cdcChunksClamped]] — the FastCDC
    * production guard: the min bound stops pathological boundary
    * density (a hash that fires every position would otherwise emit
    * 1-token chunks), the max bound guarantees progress through
    * cut-free deserts (a chunk is force-closed at [[CdcMaxChunk]]
    * tokens). Expected length stays ~[[CdcMask]]; the final chunk is
    * exempt from the min (there is nothing left to merge it into). */
  val CdcMinChunk = 4
  val CdcMaxChunk = 16

  /** Clamped content-defined chunking — the production variant of
    * [[cdcChunks]] (FastCDC '16 normalized chunking, min/max form): a
    * candidate hash cut closes a chunk only once the chunk holds ≥
    * [[CdcMinChunk]] tokens, and a chunk reaching [[CdcMaxChunk]]
    * tokens closes unconditionally. The clamp makes each boundary
    * depend on the previous one, so the independent per-position
    * filter of [[cdcChunks]] becomes a LEFT-TO-RIGHT FOLD over the
    * token positions (`aggregate` higher-order function — still pure
    * per-row array arithmetic, no shuffle beyond the output sort, same
    * scale shape; the fold is O(n_tokens · [[CdcWindow]]) like the
    * filter). Same md5 window rule, same emission tail, fully
    * value-oracled against a DuckDB recursive CTE that replays the
    * boundary rule chunk by chunk. */
  def cdcChunksClamped(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
    def isCut(i: Column): Column =
      (i >= CdcWindow) &&
        (conv(substring(md5(array_join(
          slice(col("t"), i - lit(CdcWindow - 1), lit(CdcWindow)), " ")),
          1, 5), 16, 10).cast(LongType) % CdcMask === 0L)
    val emptyEnds = array().cast(ArrayType(IntegerType, containsNull = false))
    val keep = (acc: Column) => struct(
      acc.getField("last").as("last"), acc.getField("ends").as("ends"))
    val ends = aggregate(
      sequence(lit(1), col("n")),
      struct(lit(0).as("last"), emptyEnds.as("ends")),
      (acc, i) => {
        val len = i - acc.getField("last")
        val cutHere = (len >= CdcMaxChunk) || (isCut(i) && len >= CdcMinChunk)
        when(cutHere, struct(i.as("last"),
          concat(acc.getField("ends"), array(i)).as("ends")))
          .otherwise(keep(acc))
      },
      // the last token always ends the final (min-exempt) chunk
      acc => when(acc.getField("last") < col("n"),
        concat(acc.getField("ends"), array(col("n"))))
        .otherwise(acc.getField("ends")))
    chunkRows(docs.withColumn("ends", ends))
  }

  /** Digest frequency cap for [[cdcNearDupPairs]]: a chunk shared by m
    * documents contributes m·(m−1)/2 pairs, so an uncapped boilerplate
    * chunk (header, license block) is the quadratic blowup of every
    * inverted-index pair generator. Digests above the cap are excluded
    * from BOTH the pair counts and the per-doc chunk counts, so the
    * Jaccard is exact over one consistent universe ("eligible" chunks) —
    * the standard super-shingle drop of production dedup. */
  val CdcMaxDocsPerDigest = 50

  /** Pairs need ≥ 2 shared chunks: one 8-token collision between random
    * documents is noise; real near-dups (edited copies) share runs. */
  val CdcMinSharedChunks = 2

  /** Chunk-level near-dup pairs over the content-defined chunks — what
    * [[cdcChunks]]' insertion-robust boundaries exist FOR: two documents
    * that differ by an edit still share every chunk outside the edited
    * region, so joining on chunk digests finds edited copies that
    * whole-document digests miss, at ~1 candidate row per 8 tokens
    * (vs [[spanDup]]'s row per token). Emits (doc_a, doc_b, n_shared,
    * n_a, n_b, jaccard) for pairs sharing ≥ [[CdcMinSharedChunks]]
    * eligible chunks. Every stage is keyed (distinct → digest frequency
    * → capped inverted-index self-join → pair count); nothing is
    * all-pairs at any corpus size, and the cap bounds per-digest fanout
    * at [[CdcMaxDocsPerDigest]]². */
  def cdcNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val chunks = cdcChunks(spark, dir).select(col("doc_id"), col("digest")).distinct()
    val freq = chunks.groupBy(col("digest")).agg(count(lit(1)).as("n_docs"))
    // three consumers (a-side, b-side, per-doc counts) would otherwise
    // re-derive the whole chunking chain three times; an EAGER local
    // checkpoint materializes the small (doc, digest) table once and its
    // blocks are GC-managed — no per-invocation cache leak (the
    // assembleGate lesson)
    val kept = chunks
      .join(freq.filter(col("n_docs") <= CdcMaxDocsPerDigest), Seq("digest"))
      .select(col("doc_id"), col("digest"))
      .localCheckpoint()
    val counts = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.digest") === col("b.digest") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= CdcMinSharedChunks)
      .join(counts.select(col("doc_id").as("doc_a"), col("n_chunks").as("n_a")),
        Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n_chunks").as("n_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        col("n_shared").cast(IntegerType).as("n_shared"),
        col("n_a").cast(IntegerType).as("n_a"),
        col("n_b").cast(IntegerType).as("n_b"),
        // exact integers, one IEEE division — deterministic cross-engine
        (col("n_shared").cast(DoubleType)
          / (col("n_a") + col("n_b") - col("n_shared"))).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Survivor selection over the CDC near-dup graph — the decision step
    * the pair list exists for: connected components collapse transitive
    * edit chains (A edited into B edited into C is ONE group even when
    * A and C share too little directly), and each group keeps its
    * lowest-(stop-ratio, doc_id) member — the [[DedupOps
    * .qualitySurvivor]] rule applied at chunk-level-near-dup granularity
    * instead of byte-identical granularity. Emits one row per
    * multi-member group (singletons trivially survive and stay out of
    * the report). Components run on the already-capped pair table, so
    * nothing here is all-pairs either. */
  def cdcSurvivor(spark: SparkSession, dir: String): DataFrame = {
    val pairs = cdcNearDupPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val comps = ClusterOps.connectedComponents(pairs)
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextOps.stopRatio(col("text")).as("sr"))
    comps.join(quality, comps("id") === quality("doc_id"))
      .groupBy(col("component"))
      .agg(min(struct(col("sr"), col("doc_id"))).as("w"),
        count(lit(1)).as("n_members"))
      .select(col("component").as("cluster_id"),
        col("w.doc_id").as("keep_id"), col("w.sr").as("stop_ratio"),
        col("n_members").cast(IntegerType).as("n_members"))
      .orderBy("cluster_id")
  }
}
