package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, transform}
import graft.ops._
import graft.Registry._

/** Registry shard: drift monitors, sampling/splitting, BPE, sketches,
  * robust stats, storage layout/maintenance, embedding ops, span dedup,
  * curation/datasheets, mixing/budgets, multimodal, and the corpus
  * assembly pipeline. Pure motion from Registry.scala (round-14
  * decomposition); seams live in [[Registry]]. */
private[graft] object RegistryDriftCuration {

  val entries: Seq[GraftQuery] = Seq(
    // split-drift monitor: χ² chosen over PSI/KL because it is rational
    // (no libm transcendentals) → fully value-oracled; summary twin is
    // order-independent (count / count / max), never a double sum
    GraftQuery("x_drift_chisq", SamplingOps.splitDriftChisq, Some(
      s"""WITH $driftCountCtes
        |SELECT CAST(bucket_lo AS INTEGER) AS bucket_lo,
        |       CAST(n_train AS BIGINT) AS n_train, CAST(n_val AS BIGINT) AS n_val,
        |       CASE WHEN n_train > 0 THEN CAST(tv * n_train AS DOUBLE) / tt END AS e_val,
        |       CASE WHEN n_train > 0 THEN
        |         (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |           * (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |           / (CAST(tv * n_train AS DOUBLE) / tt) END AS chi2_term
        |FROM c CROSS JOIN t ORDER BY bucket_lo""".stripMargin)),
    GraftQuery("x_drift_chisq_summary", SamplingOps.splitDriftSummary, Some(
      s"""WITH $driftCountCtes,
        |terms AS (SELECT n_train,
        |            CASE WHEN n_train > 0 THEN
        |              (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |                * (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |                / (CAST(tv * n_train AS DOUBLE) / tt) END AS chi2_term
        |          FROM c CROSS JOIN t)
        |SELECT CAST(count(*) AS INTEGER) AS n_buckets,
        |       CAST(sum(CASE WHEN n_train = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_unseen_in_train,
        |       max(chi2_term) AS max_chi2_term
        |FROM terms""".stripMargin)),
    // Cramér's V effect size over the same χ² report: per-bucket terms
    // floor-scaled to int64 micro-units (a double SUM is permutation-
    // unsafe to hash — the reason the summary max'es), one sqrt on the
    // quantized total; N = val count, df = defined buckets − 1
    GraftQuery("x_drift_cramers_v", SamplingOps.splitDriftCramersV, Some(
      s"""WITH $driftCountCtes,
        |terms AS (SELECT n_train, n_val,
        |            CASE WHEN n_train > 0 THEN
        |              (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |                * (CAST(n_val AS DOUBLE) - CAST(tv * n_train AS DOUBLE) / tt)
        |                / (CAST(tv * n_train AS DOUBLE) / tt) END AS chi2_term
        |          FROM c CROSS JOIN t),
        |a AS (SELECT CAST(sum(CASE WHEN n_train > 0 THEN 1 ELSE 0 END) AS INTEGER) AS k_eff,
        |             CAST(sum(CASE WHEN n_train = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_unseen_in_train,
        |             CAST(sum(CASE WHEN n_train > 0
        |                  THEN CAST(floor(chi2_term * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS chi2_micro,
        |             CAST(sum(n_val) AS BIGINT) AS n_val
        |      FROM terms)
        |SELECT k_eff, n_unseen_in_train, chi2_micro, n_val,
        |       CASE WHEN k_eff > 1 AND n_val > 0 THEN
        |         sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
        |              / (CAST(n_val AS DOUBLE) * CAST(k_eff - 1 AS DOUBLE))) END AS v
        |FROM a""".stripMargin)),
    // per-source axis: observed vs corpus-wide length distribution over
    // the full source × bucket grid (zero cells included — they ARE the
    // drift signal); e > 0 on every cell so no null guard
    GraftQuery("x_drift_source_chisq", SamplingOps.sourceDriftChisq, Some(
      s"""WITH $sourceDriftCtes
        |SELECT source, CAST(bucket_lo AS INTEGER) AS bucket_lo,
        |       CAST(n_docs AS BIGINT) AS n_docs, CAST(n_bucket AS BIGINT) AS n_bucket,
        |       e_docs, chi2_term
        |FROM cells ORDER BY source, bucket_lo""".stripMargin)),
    GraftQuery("x_drift_source_summary", SamplingOps.sourceDriftSummary, Some(
      s"""WITH $sourceDriftCtes
        |SELECT source, CAST(count(*) AS INTEGER) AS n_buckets,
        |       CAST(sum(CASE WHEN n_docs = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_empty_buckets,
        |       max(chi2_term) AS max_chi2_term
        |FROM cells GROUP BY source ORDER BY source""".stripMargin)),
    // per-source one-vs-rest KS: each source's length CDF against the
    // rest of the corpus over the full source × length grid (the
    // deviation can peak at a length the source never emits); rest
    // counts are exact complements, so one global + one keyed running
    // count suffice
    GraftQuery("x_drift_source_ks", SamplingOps.sourceDriftKs, Some(
      s"""WITH $sourceKsCtes,
        |m AS (SELECT source, max(n_s) AS n_source, max(n_rest) AS n_rest,
        |             max(d_num) AS d_max
        |      FROM d GROUP BY source),
        |p AS (SELECT d.source, min(d.value) AS ks_value
        |      FROM d JOIN m ON d.source = m.source AND d.d_num = m.d_max
        |      GROUP BY d.source),
        |v AS (SELECT m.source, m.n_source, m.n_rest,
        |        CAST(m.d_max AS BIGINT) AS d_num_max, p.ks_value,
        |        CAST(m.d_max AS DOUBLE)
        |          / (CAST(m.n_source AS DOUBLE) * CAST(m.n_rest AS DOUBLE)) AS d_stat,
        |        1.358 * sqrt((CAST(m.n_source AS DOUBLE) + CAST(m.n_rest AS DOUBLE))
        |                     / (CAST(m.n_source AS DOUBLE) * CAST(m.n_rest AS DOUBLE))) AS d_crit
        |      FROM m JOIN p USING (source))
        |SELECT source, n_source, n_rest, d_num_max, ks_value, d_stat, d_crit,
        |       d_stat > d_crit AS drifted
        |FROM v ORDER BY source""".stripMargin)),
    // per-source W₁ magnitude beside the per-source KS verdict — the
    // same one-vs-rest grid, gaps from the source-partitioned lead,
    // Σ|d_num|·gap on DECIMAL(38,0), one division per source
    GraftQuery("x_drift_source_emd", SamplingOps.sourceDriftEmd, Some(
      s"""WITH $sourceKsCtes,
        |nx AS (SELECT source, value, d_num, n_s, n_rest,
        |         lead(value) OVER (PARTITION BY source ORDER BY value) AS next_value
        |       FROM d),
        |a AS (SELECT source, max(n_s) AS n_source, max(n_rest) AS n_rest,
        |        CAST(sum(CAST(d_num AS HUGEINT)
        |                 * (coalesce(next_value, value) - value)) AS DOUBLE) AS emd_num
        |      FROM nx GROUP BY source)
        |SELECT source, n_source, n_rest, emd_num,
        |       emd_num / (CAST(n_source AS DOUBLE) * CAST(n_rest AS DOUBLE)) AS w1
        |FROM a ORDER BY source""".stripMargin)),
    // distribution-free split drift: two-sample KS over the full length
    // CDFs — catches the in-bucket shifts the binned χ² is blind to.
    // Deviations are cross-multiplied integers (max is an integer max);
    // the verdict's one division and one sqrt are IEEE-correctly-rounded
    // in both engines (the same rule that picked χ² over PSI: ln is not)
    GraftQuery("x_drift_ks", SamplingOps.splitDriftKs, Some(
      s"""WITH $ksDriftCtes
        |SELECT value, cum_train, cum_val, CAST(d_num AS BIGINT) AS d_num
        |FROM d ORDER BY value""".stripMargin)),
    // Wasserstein-1 drift: the magnitude readout beside KS's worst-gap —
    // Σ|d_num|·gap on DECIMAL(38,0) over consecutive distinct lengths,
    // one division; equals mean |sorted-sample difference| at equal n
    GraftQuery("x_drift_emd", SamplingOps.splitDriftEmd, Some(
      s"""WITH $ksDriftCtes,
        |nx AS (SELECT value, d_num, lead(value) OVER (ORDER BY value) AS next_value FROM d),
        |a AS (SELECT t.n_train, t.n_val,
        |        CAST(sum(CAST(d_num AS HUGEINT)
        |                 * (coalesce(next_value, value) - value)) AS DOUBLE) AS emd_num
        |      FROM nx CROSS JOIN t GROUP BY t.n_train, t.n_val)
        |SELECT n_train, n_val, emd_num,
        |       emd_num / (CAST(n_train AS DOUBLE) * CAST(n_val AS DOUBLE)) AS w1
        |FROM a""".stripMargin)),
    GraftQuery("x_drift_ks_summary", SamplingOps.splitDriftKsSummary, Some(
      s"""WITH $ksDriftCtes,
        |m AS (SELECT max(d_num) AS d_max FROM d),
        |p AS (SELECT min(value) AS ks_value FROM d, m WHERE d.d_num = m.d_max),
        |v AS (SELECT t.n_train, t.n_val, CAST(m.d_max AS BIGINT) AS d_num_max, p.ks_value,
        |        CAST(m.d_max AS DOUBLE) / (CAST(t.n_train AS DOUBLE) * CAST(t.n_val AS DOUBLE)) AS d_stat,
        |        1.358 * sqrt((CAST(t.n_train AS DOUBLE) + CAST(t.n_val AS DOUBLE))
        |                     / (CAST(t.n_train AS DOUBLE) * CAST(t.n_val AS DOUBLE))) AS d_crit
        |      FROM t, m, p)
        |SELECT n_train, n_val, d_num_max, ks_value, d_stat, d_crit,
        |       d_stat > d_crit AS drifted
        |FROM v""".stripMargin)),
    // Neyman allocation: variance-optimal eval-budget split across
    // language strata (N_h·S_h weights) — decimal moments, ONE sqrt per
    // stratum, then exact-integer apportionment with largest-remainder
    // top-up; sum(n_alloc) = budget structurally
    GraftQuery("x_sample_neyman", SamplingOps.neymanAllocation, Some(
      s"""WITH s AS (SELECT lang AS stratum, count(*) AS n_docs,
        |             CAST(sum(n_chars) AS DECIMAL(38,0)) AS sx,
        |             CAST(sum(CAST(n_chars AS DECIMAL(38,0)) * CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        |           FROM documents GROUP BY lang),
        |w AS (SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs,
        |        sqrt(CAST(CAST(n_docs AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
        |          / CAST(n_docs AS DOUBLE) AS sd
        |      FROM s),
        |w2 AS (SELECT stratum, n_docs, sd,
        |         greatest(CAST(floor(CAST(n_docs AS DOUBLE) * sd * 1000000.0) AS BIGINT), 1) AS weight_micro
        |       FROM w),
        |t AS (SELECT CAST(sum(weight_micro) AS BIGINT) AS w_tot FROM w2),
        |b AS (SELECT stratum, n_docs, sd, weight_micro,
        |        (${SamplingOps.NeymanBudget} * weight_micro) // w_tot AS base,
        |        ${SamplingOps.NeymanBudget} * weight_micro
        |          - ((${SamplingOps.NeymanBudget} * weight_micro) // w_tot) * w_tot AS rem
        |      FROM w2 CROSS JOIN t),
        |e AS (SELECT CAST(${SamplingOps.NeymanBudget} - sum(base) AS BIGINT) AS extra FROM b),
        |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, stratum) AS rk FROM b)
        |SELECT stratum, n_docs, sd, weight_micro,
        |       CAST(base + CASE WHEN rk <= e.extra THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
        |FROM r CROSS JOIN e ORDER BY stratum""".stripMargin)),
    GraftQuery("x_sample_stratified", (s, d) => SamplingOps.stratifiedSample(s, d), None),
    GraftQuery("x_sample_stratified_hash", SamplingOps.stratifiedSampleHash, Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1000 <
        |      CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'es' THEN 1.0
        |                WHEN 'fr' THEN 1.0 WHEN 'zh' THEN 0.8 ELSE 0.0 END * 1000.0
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_sample_cap_source", (s, d) => SamplingOps.capPerSource(s, d), Some(
      """SELECT doc_id, source, rank_in_source FROM (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |                ORDER BY md5(text), doc_id) AS INTEGER) AS rank_in_source
        |  FROM documents)
        |WHERE rank_in_source <= 20
        |ORDER BY doc_id""".stripMargin)),
    // systematic PPS sampling ∝ token mass: select doc i iff its
    // cumulative-line interval contains a slot boundary —
    // ⌊K·cum_i/T⌋ > ⌊K·cum_{i−1}/T⌋, integer floors end to end; the
    // oracle takes the window road, the plan the range-partitioned
    // prefix-sum core
    GraftQuery("x_sample_pps", SamplingOps.ppsSystematic, Some(
      s"""WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |           FROM documents),
        |c AS (SELECT doc_id, w, CAST(sum(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM d)
        |SELECT doc_id, w, cum,
        |       CAST((CAST(cum AS HUGEINT) * ${SamplingOps.PpsBudget}) // tot AS BIGINT) AS slot
        |FROM c CROSS JOIN t
        |WHERE (CAST(cum AS HUGEINT) * ${SamplingOps.PpsBudget}) // tot
        |      > (CAST(cum - w AS HUGEINT) * ${SamplingOps.PpsBudget}) // tot
        |ORDER BY doc_id""".stripMargin)),
    // bottom-k-by-md5 reproducible sample: the oracle takes the window
    // road; the Spark plan is the k-bounded map-side pairs aggregate
    GraftQuery("x_sample_bottomk", SamplingOps.bottomKSample, Some(
      """WITH h AS (SELECT source, doc_id,
        |             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
        |           FROM documents)
        |SELECT source,
        |       CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS INTEGER) AS sample_rank,
        |       doc_id, h
        |FROM h QUALIFY sample_rank <= 10
        |ORDER BY source, sample_rank""".stripMargin)),
    GraftQuery("x_sample_quality_weighted", SamplingOps.qualityWeightedSample, Some(
      s"""WITH s AS (
        |  SELECT doc_id, lang, source,
        |         CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1000 AS bucket,
        |         0.2 + 0.8 * (1.0 - $stopCountSql
        |           / len(string_split(text, ' '))) AS rate
        |  FROM documents)
        |SELECT doc_id, lang, source, rate FROM s
        |WHERE bucket < rate * 1000.0
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_bpe_pair_stats", BpeOps.pairStats, Some(
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS word
        |           FROM documents),
        |wf AS (SELECT word, count(*) AS freq FROM w GROUP BY word),
        |cs AS (SELECT freq, regexp_extract_all(word, '.') AS c FROM wf WHERE len(word) >= 2),
        |p AS (SELECT c[i] AS l, c[i+1] AS r, freq
        |      FROM (SELECT freq, c, unnest(generate_series(1, len(c) - 1)) AS i FROM cs))
        |SELECT l, r, CAST(sum(freq) AS BIGINT) AS pair_freq
        |FROM p GROUP BY l, r ORDER BY l, r""".stripMargin)),
    GraftQuery("x_bpe_merges", BpeOps.merges, None),
    // merge-table contract gate (compression_gate covers the encode
    // side): contiguous ranks, positive pick frequencies, no pair
    // merged twice, budget respected
    GraftQuery("x_bpe_merges_gate", BpeOps.mergesGate, Some(
      s"SELECT CAST(${BpeOps.NumMerges} AS INTEGER) AS max_merges, true AS passes")),
    GraftQuery("x_bpe_encode", BpeOps.encode, None),
    // encoder round-trip gate: re-joining each word's BPE symbols must
    // reproduce the word byte-identically (merges concatenate, nothing
    // else) — the direct pin on merge APPLICATION that the compression
    // gate's aggregate counts only imply (round-9 verdict item 5)
    GraftQuery("x_bpe_encode_gate", BpeOps.encodeGate, Some(
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS word
        |           FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_words, true AS passes FROM w""".stripMargin)),
    GraftQuery("x_bpe_compression_gate", BpeOps.compressionGate, Some(
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS word
        |           FROM documents)
        |SELECT CAST(sum(len(word)) AS BIGINT) AS char_tokens, true AS passes
        |FROM w""".stripMargin)),
    GraftQuery("x_heavy_hitters", SketchOps.heavyHitters, None),
    GraftQuery("x_heavy_hitters_gate", SketchOps.heavyHittersGate, Some(
      s"""WITH t AS (SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |f AS (SELECT term, count(*) AS freq FROM t GROUP BY term),
        |n AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM f)
        |SELECT n.n AS n_tokens,
        |       CAST((SELECT count(*) FROM f WHERE freq * ${SketchOps.SketchK + 1} > n.n) AS INTEGER) AS n_heavy,
        |       true AS passes
        |FROM n""".stripMargin)),
    GraftQuery("x_heavy_hitters_by_lang", SketchOps.heavyHittersByLang, None),
    GraftQuery("x_heavy_hitters_by_lang_gate", SketchOps.heavyHittersByLangGate, Some(
      s"""WITH t AS (SELECT lang, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |f AS (SELECT lang, term, count(*) AS freq FROM t GROUP BY lang, term),
        |n AS (SELECT lang, CAST(sum(freq) AS BIGINT) AS n FROM f GROUP BY lang)
        |SELECT n.lang, n.n AS n_tokens,
        |       CAST(sum(CASE WHEN freq * ${SketchOps.SketchK + 1} > n.n THEN 1 ELSE 0 END) AS INTEGER) AS n_heavy,
        |       true AS passes
        |FROM f JOIN n ON f.lang = n.lang
        |GROUP BY n.lang, n.n ORDER BY n.lang""".stripMargin)),
    // item-to-item recs: per-part top-3 co-purchase partners via the
    // bounded pairs aggregate (the oracle takes the window road)
    GraftQuery("x_basket_also_bought", BasketOps.alsoBought, Some(
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |c AS (SELECT a.l_partkey AS part, b.l_partkey AS rec, count(*) AS together
        |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                         AND a.l_partkey <> b.l_partkey
        |      GROUP BY a.l_partkey, b.l_partkey)
        |SELECT part,
        |       CAST(row_number() OVER (PARTITION BY part ORDER BY together DESC, rec) AS INTEGER) AS rank,
        |       rec, together
        |FROM c QUALIFY rank <= 3 ORDER BY part, rank""".stripMargin)),
    // declarative data-quality audit: exact violation counts, literal
    // passes — the ingest gate a lake runs before promoting a snapshot
    // k-anonymity release gate: QID = (event_type, hour), privacy unit
    // = distinct users; below-k groups are flagged (audit) and their
    // row mass summarized per type (suppress)
    GraftQuery("x_kanon_audit", QualityAuditOps.kAnonymityAudit _, Some(
      s"""SELECT event_type, date_trunc('hour', ts) AS qid_hour,
        |       count(*) AS n_rows,
        |       CAST(count(DISTINCT user_id) AS INTEGER) AS n_users,
        |       count(DISTINCT user_id) >= ${QualityAuditOps.KAnonK} AS anonymous
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, qid_hour""".stripMargin)),
    // distinct l-diversity: the homogeneity-attack gate k-anonymity
    // leaves open — distinct SENSITIVE values (props k mod 10) per QID
    // group, flagged below the floor
    GraftQuery("x_kanon_ldiversity", QualityAuditOps.lDiversityAudit _, Some(
      s"""SELECT event_type, date_trunc('hour', ts) AS qid_hour,
        |       count(*) AS n_rows,
        |       CAST(count(DISTINCT CAST(json_extract_string(props, '$$.k') AS INTEGER) % 10) AS INTEGER) AS n_sensitive,
        |       count(DISTINCT CAST(json_extract_string(props, '$$.k') AS INTEGER) % 10)
        |         >= ${QualityAuditOps.LDiversityL} AS diverse
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, qid_hour""".stripMargin)),
    // generalization ladder: release each hourly group at the finest
    // grain (hour → day → month) clearing k distinct users, else
    // suppress — maximal detail at a fixed privacy floor
    GraftQuery("x_kanon_generalize", QualityAuditOps.kAnonymityGeneralize _, Some {
      val k = QualityAuditOps.KAnonK
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS qid_hour,
        |             CAST(count(DISTINCT user_id) AS INTEGER) AS n_hour
        |           FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, date_trunc('day', ts) AS qid_day,
        |        CAST(count(DISTINCT user_id) AS INTEGER) AS n_day
        |      FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, date_trunc('month', ts) AS qid_month,
        |        CAST(count(DISTINCT user_id) AS INTEGER) AS n_month
        |      FROM events GROUP BY 1, 2)
        |SELECT h.event_type, qid_hour, n_hour, n_day, n_month,
        |       CASE WHEN n_hour >= $k THEN 'hour'
        |            WHEN n_day >= $k THEN 'day'
        |            WHEN n_month >= $k THEN 'month'
        |            ELSE 'suppress' END AS release_level
        |FROM h
        |JOIN d ON h.event_type = d.event_type AND date_trunc('day', qid_hour) = qid_day
        |JOIN m ON h.event_type = m.event_type AND date_trunc('month', qid_hour) = qid_month
        |ORDER BY h.event_type, qid_hour""".stripMargin
    }),
    GraftQuery("x_kanon_suppress", QualityAuditOps.kAnonymitySuppress _, Some(
      s"""WITH g AS (SELECT event_type, date_trunc('hour', ts) AS qid_hour,
        |             count(*) AS n_rows, count(DISTINCT user_id) AS n_users
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(sum(n_rows) AS BIGINT) AS n_total,
        |       CAST(sum(CASE WHEN n_users < ${QualityAuditOps.KAnonK} THEN n_rows ELSE 0 END) AS BIGINT) AS n_suppressed,
        |       CAST(sum(CASE WHEN n_users >= ${QualityAuditOps.KAnonK} THEN n_rows ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN n_users < ${QualityAuditOps.KAnonK} THEN 1 ELSE 0 END) AS INTEGER) AS n_groups_suppressed
        |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin)),
    GraftQuery("x_dq_audit", QualityAuditOps.dqAudit, Some(
      """WITH rules AS (
        |  SELECT 'lineitem.discount_in_0_0.1' AS rule,
        |         (SELECT count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.1) AS violations
        |  UNION ALL
        |  SELECT 'lineitem.line_key_unique',
        |         (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
        |  UNION ALL
        |  SELECT 'lineitem.orderkey_in_orders',
        |         (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem.quantity_in_1_50',
        |         (SELECT count(*) FROM lineitem WHERE l_quantity < 1.0 OR l_quantity > 50.0)
        |  UNION ALL
        |  SELECT 'lineitem.shipdate_not_null',
        |         (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL)
        |  UNION ALL
        |  SELECT 'orders.orderkey_unique',
        |         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders))
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |       violations = 0 AS passes
        |FROM rules ORDER BY rule""".stripMargin)),
    // market-basket affinity: co-purchase pair counts + lift
    GraftQuery("x_basket_affinity", BasketOps.basketAffinity, Some(
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
        |pc AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY l_partkey),
        |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |                 count(*) AS c_ab
        |          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |                             AND a.l_partkey < b.l_partkey
        |          GROUP BY a.l_partkey, b.l_partkey)
        |SELECT part_a, part_b, c_ab, pa.c AS c_a, pb.c AS c_b,
        |       CAST(c_ab * n.n_orders AS DOUBLE) / (pa.c * pb.c) AS lift
        |FROM pairs JOIN pc pa ON pa.l_partkey = part_a
        |           JOIN pc pb ON pb.l_partkey = part_b
        |CROSS JOIN n
        |ORDER BY c_ab DESC, part_a, part_b LIMIT 50""".stripMargin)),
    // ANALYZE-style column statistics + equi-width histogram (CBO food)
    GraftQuery("x_stats_analyze", StatsOps.analyzeLineitem, Some(
      """WITH s AS (
        |  SELECT 'l_discount' AS "column", count(*) AS n_rows,
        |         count(*) - count(l_discount) AS n_null,
        |         count(DISTINCT l_discount) AS n_distinct,
        |         min(l_discount) AS min_v, max(l_discount) AS max_v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |         count(DISTINCT l_extendedprice), min(l_extendedprice), max(l_extendedprice) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |         count(DISTINCT l_quantity), min(l_quantity), max(l_quantity) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', count(*), count(*) - count(l_tax),
        |         count(DISTINCT l_tax), min(l_tax), max(l_tax) FROM lineitem)
        |SELECT * FROM s ORDER BY "column"""".stripMargin)),
    GraftQuery("x_stats_histogram", StatsOps.histogramQuantity, Some(
      """WITH b AS (SELECT min(l_quantity) AS mn, max(l_quantity) AS mx FROM lineitem)
        |SELECT CAST(least(9, floor((l_quantity - mn) * 10.0 / (mx - mn))) AS INTEGER) AS bucket,
        |       count(*) AS n
        |FROM lineitem CROSS JOIN b GROUP BY bucket ORDER BY bucket""".stripMargin)),
    // equi-depth sibling: bucket by the rank of each VALUE's first row —
    // the prefix sum runs over |distinct values| (domain-bounded), never
    // |rows|; continuous columns route through the GK sketch (g4b)
    GraftQuery("x_stats_histogram_depth", StatsOps.histogramEquiDepth, Some(
      """WITH c AS (SELECT l_quantity, count(*) AS cnt FROM lineitem GROUP BY 1),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |b AS (SELECT least(7, ((CAST(sum(cnt) OVER (ORDER BY l_quantity) AS BIGINT) - cnt) * 8) // n)
        |               AS bucket,
        |             l_quantity, cnt
        |      FROM c CROSS JOIN n)
        |SELECT CAST(bucket AS INTEGER) AS bucket, min(l_quantity) AS lo,
        |       max(l_quantity) AS hi, CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin)),
    // per-cell χ² drift contributions: all double arithmetic is per-row
    // and correctly rounded, so both engines are bit-equal
    GraftQuery("x_drift_cells", StatsOps.driftCells, Some(
      """WITH ev AS (SELECT date_trunc('month', ts) AS month, event_type FROM events),
        |c AS (SELECT month, event_type, count(*) AS observed FROM ev GROUP BY 1, 2),
        |m AS (SELECT month, count(*) AS n_month FROM ev GROUP BY 1),
        |t AS (SELECT event_type, count(*) AS n_type FROM ev GROUP BY 1),
        |g AS (SELECT count(*) AS n_all FROM ev)
        |SELECT month, event_type, observed, expected,
        |       (observed - expected) * (observed - expected) / expected AS chi2_cell
        |FROM (SELECT c.month, c.event_type, c.observed,
        |             CAST(m.n_month AS DOUBLE) * t.n_type / g.n_all AS expected
        |      FROM c JOIN m USING (month) JOIN t USING (event_type) CROSS JOIN g)
        |ORDER BY month, event_type""".stripMargin)),
    // engine-portable order-independent content fingerprint (md5-prefix
    // sum) — the cross-system replication check, recomputed by DuckDB
    GraftQuery("x_table_checksum", StatsOps.tableChecksum, Some(
      """SELECT source, count(*) AS n_rows,
        |       CAST(sum(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || text || '|' ||
        |                                     lang || '|' || CAST(n_chars AS VARCHAR)), 1, 8)) AS BIGINT))
        |            AS BIGINT) AS checksum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),
    // robust aggregates without a per-group sort: the value-frequency
    // table + range-partitioned running counts turn trimmed/winsorized
    // means into interval arithmetic over rank intervals; decimal sums,
    // one division per mean
    GraftQuery("x_stats_trimmed", StatsOps.trimmedMeans, Some(
      """WITH f AS (SELECT l_returnflag AS key, l_quantity AS value, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT key, value, cnt,
        |        CAST(sum(cnt) OVER (PARTITION BY key ORDER BY value) AS BIGINT) AS cum_hi
        |      FROM f),
        |r2 AS (SELECT key, value, cnt, cum_hi, cum_hi - cnt AS cum_lo FROM r),
        |t AS (SELECT key, CAST(sum(cnt) AS BIGINT) AS n,
        |             CAST(sum(cnt) AS BIGINT) // 10 AS k FROM f GROUP BY key),
        |j AS (SELECT r2.key, r2.value, cum_hi, cum_lo, t.n, t.k,
        |        greatest(0, least(cum_hi, t.n - t.k) - greatest(cum_lo, t.k)) AS inc
        |      FROM r2 JOIN t USING (key)),
        |a AS (SELECT key, max(n) AS n, max(k) AS k,
        |        min(CASE WHEN cum_hi >= k + 1 THEN value END) AS v_low,
        |        max(CASE WHEN cum_lo < n - k THEN value END) AS v_high,
        |        sum(CAST(value AS DECIMAL(18,2)) * inc) AS tsum
        |      FROM j GROUP BY key)
        |SELECT key, n, k, v_low, v_high,
        |       CAST(tsum AS DOUBLE) / (n - 2 * k) AS trimmed_mean,
        |       CAST(tsum + k * (CAST(v_low AS DECIMAL(18,2)) + CAST(v_high AS DECIMAL(18,2)))
        |            AS DOUBLE) / n AS winsor_mean
        |FROM a ORDER BY key""".stripMargin)),
    // month-over-month movers: lag + rank windows over the bounded
    // aggregate domain; counts integer, pct one IEEE division
    GraftQuery("x_mom_movers", StatsOps.momMovers, Some(
      """WITH m AS (SELECT date_trunc('month', l_shipdate) AS month,
        |                  l_returnflag AS segment, count(*) AS n
        |           FROM lineitem GROUP BY 1, 2),
        |d AS (SELECT month, segment, n,
        |             lag(n) OVER (PARTITION BY segment ORDER BY month) AS prev_n
        |      FROM m),
        |r AS (SELECT month, segment, n, prev_n, n - prev_n AS delta,
        |             CASE WHEN prev_n > 0
        |                  THEN CAST(n - prev_n AS DOUBLE) / prev_n END AS pct_change,
        |             CAST(row_number() OVER (PARTITION BY month
        |               ORDER BY abs(n - prev_n) DESC, segment) AS INTEGER) AS mover_rank
        |      FROM d WHERE prev_n IS NOT NULL)
        |SELECT month, mover_rank, segment, n, prev_n, delta, pct_change
        |FROM r WHERE mover_rank <= 3
        |ORDER BY month, mover_rank""".stripMargin)),
    // row-level snapshot diff: (key, md5-digest) fold per side, one
    // full outer join, change rows only — the checksum's escalation
    GraftQuery("x_table_diff", StatsOps.snapshotDiff, Some(
      """WITH v2 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 101 = 0 THEN text || ' (rev2)' ELSE text END AS text,
        |         lang, source, n_chars
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 103 = 0),
        |b AS (SELECT doc_id, source,
        |             md5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
        |                           CAST(n_chars AS VARCHAR))) AS dg
        |      FROM documents),
        |r AS (SELECT doc_id, source,
        |             md5(concat_ws('|', CAST(doc_id AS VARCHAR), text, lang, source,
        |                           CAST(n_chars AS VARCHAR))) AS dg
        |      FROM v2)
        |SELECT coalesce(b.doc_id, r.doc_id) AS doc_id,
        |       coalesce(b.source, r.source) AS source,
        |       CASE WHEN b.doc_id IS NULL THEN 'added'
        |            WHEN r.doc_id IS NULL THEN 'removed'
        |            ELSE 'changed' END AS change
        |FROM b FULL OUTER JOIN r ON b.doc_id = r.doc_id
        |WHERE b.doc_id IS NULL OR r.doc_id IS NULL OR b.dg <> r.dg
        |ORDER BY change, doc_id""".stripMargin)),
    // mergeable HLL distinct-count tiles (DataSketches bytes — unlike
    // approx_count_distinct, storable and unionable across partitions);
    // estimates are engine-internal → rows-only, the gate is the signal
    GraftQuery("x_sketch_cube", SketchOps.sketchCube, None),
    GraftQuery("x_sketch_cube_gate", SketchOps.sketchCubeGate, Some(
      """SELECT count(DISTINCT l_partkey) AS n_parts, true AS passes
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'""".stripMargin)),
    // z-grid layout probe: result is layout-independent (oracle runs the
    // plain filter over raw lineitem with the same derived rectangle);
    // the PLAN reads only intersecting partition dirs — spec-pinned via
    // the files-read census
    GraftQuery("x_layout_zorder", LayoutOps.zProbe, Some(
      """WITH m AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
        |r AS (SELECT mp*2//10 AS p1, mp*4//10 AS p2, ms*1//10 AS s1, ms*4//10 AS s2 FROM m)
        |SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem, r
        |WHERE l_partkey >= p1 AND l_partkey < p2
        |  AND l_suppkey >= s1 AND l_suppkey < s2
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    // pruning-benefit gate: partitions touched under the z-grid vs a
    // linear layout with the same 128-directory budget — exact integer
    // grid arithmetic both engines reproduce
    GraftQuery("x_layout_zorder_gate", LayoutOps.zLayoutGate, Some(
      """WITH m AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
        |g AS (SELECT mp//16 + 1 AS wp, ms//8 + 1 AS ws, mp//128 + 1 AS wl,
        |             mp*2//10 AS p1, mp*4//10 AS p2, ms*1//10 AS s1, ms*4//10 AS s2 FROM m),
        |c AS (SELECT l_partkey // wp * 1048576 + l_suppkey // ws AS zc,
        |             l_partkey // wl AS lc, l_partkey AS p, l_suppkey AS s
        |      FROM lineitem, g)
        |SELECT
        |  CAST(count(DISTINCT CASE WHEN p >= g.p1 AND p < g.p2 AND s >= g.s1 AND s < g.s2
        |                           THEN zc END) AS INTEGER) AS z_touched,
        |  CAST(count(DISTINCT zc) AS INTEGER) AS z_total,
        |  CAST(count(DISTINCT CASE WHEN p >= g.p1 AND p < g.p2 THEN lc END) AS INTEGER) AS linear_touched,
        |  CAST(count(DISTINCT lc) AS INTEGER) AS linear_total,
        |  count(DISTINCT CASE WHEN p >= g.p1 AND p < g.p2 AND s >= g.s1 AND s < g.s2
        |                      THEN zc END) * count(DISTINCT lc)
        |    <= count(DISTINCT CASE WHEN p >= g.p1 AND p < g.p2 THEN lc END)
        |       * count(DISTINCT zc) AS passes
        |FROM c, g GROUP BY g.p1, g.p2, g.s1, g.s2""".stripMargin)),
    // file-level data skipping: range probe through the min/max stats
    // index over the shipdate-clustered lake — result is
    // skipping-independent (plain-filter oracle), file census spec-pinned
    GraftQuery("x_skip_filestats", LayoutOps.skipProbe, Some(
      """SELECT l_returnflag,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    // Count-Min point frequencies: engine-internal hash → rows-only;
    // the dual one-sided-bound gate below is the value-checked signal
    GraftQuery("x_sketch_cms", SketchOps.cmsEstimates, None),
    GraftQuery("x_sketch_cms_gate", SketchOps.cmsGate, Some(
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents)
        |SELECT term, count(*) AS freq, true AS overestimates, true AS within_bound
        |FROM tok
        |WHERE term IN ('agg','batch','dup','fast','hash','join','merge','query',
        |               'scan','slow','sort','table','vector','window')
        |GROUP BY term ORDER BY term""".stripMargin)),
    // HLL inclusion-exclusion audience overlap (estimates engine-
    // internal → rows-only); the exact-anchored gate is value-checked
    GraftQuery("x_sketch_overlap", SketchOps.typeOverlap, None),
    GraftQuery("x_sketch_overlap_gate", SketchOps.typeOverlapGate, Some(
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             count(*) AS exact_overlap
        |      FROM ut a JOIN ut b
        |        ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2),
        |n AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1)
        |SELECT p.type_a, p.type_b, na.n AS n_a, nb.n AS n_b,
        |       p.exact_overlap, TRUE AS passes
        |FROM p JOIN n na ON p.type_a = na.event_type
        |       JOIN n nb ON p.type_b = nb.event_type
        |ORDER BY type_a, type_b""".stripMargin)),
    // CMS inner-product join-size estimates (engine-internal hash →
    // rows-only); the dual one-sided-bound gate below is value-checked
    GraftQuery("x_sketch_joinsize", SketchOps.joinSizeEstimates, None),
    GraftQuery("x_sketch_joinsize_gate", SketchOps.joinSizeGate, Some(
      """WITH sj AS (SELECT CAST(sum(n * n) AS BIGINT) AS v
        |            FROM (SELECT count(*) AS n FROM lineitem GROUP BY l_partkey)),
        |     jo AS (SELECT count(*) AS v FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |     nl AS (SELECT count(*) AS v FROM lineitem),
        |     no AS (SELECT count(*) AS v FROM orders)
        |SELECT 'l_partkey_self' AS pair, nl.v AS n_left, nl.v AS n_right,
        |       sj.v AS exact_size, TRUE AS passes FROM sj, nl
        |UNION ALL
        |SELECT 'lineitem_orders', nl.v, no.v, jo.v, TRUE FROM jo, nl, no
        |ORDER BY pair""".stripMargin)),
    // one-pass exact Gram/covariance (GramAggregator): the oracle takes
    // the self-join-on-dimension road the Spark plan deliberately avoids
    GraftQuery("x_embed_gram", EmbedOps.embedGram, Some(
      s"""WITH ${scaledUnnestCte("")}
        |SELECT CAST(a.pos AS INTEGER) AS i, CAST(b.pos AS INTEGER) AS j,
        |       CAST(sum(a.val * b.val) AS BIGINT) AS sxy
        |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |GROUP BY a.pos, b.pos ORDER BY i, j""".stripMargin)),
    GraftQuery("x_embed_cov", EmbedOps.embedCovariance, Some(
      s"""WITH ${scaledUnnestCte("")},
        |g AS (SELECT a.pos AS i, b.pos AS j, sum(a.val * b.val) AS q
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |      GROUP BY a.pos, b.pos),
        |s AS (SELECT pos, sum(val) AS sv FROM u GROUP BY pos),
        |n AS (SELECT count(*) AS n FROM embeddings)
        |SELECT CAST(g.i AS INTEGER) AS i, CAST(g.j AS INTEGER) AS j,
        |       CAST(n.n * g.q - si.sv * sj.sv AS BIGINT) AS cov_num
        |FROM g CROSS JOIN n
        |JOIN s si ON si.pos = g.i JOIN s sj ON sj.pos = g.j
        |ORDER BY i, j""".stripMargin)),
    // PCA top-eigenpair self-consistency gate: hash-green n_vecs anchor +
    // literal passes=true (driver-side power iteration on the bounded
    // moment row — no SQL can recompute the eigenvector, the contract can
    // still be value-checked)
    GraftQuery("x_embed_pca_gate", EmbedOps.embedPcaGate, Some(
      """SELECT count(*) AS n_vecs, true AS passes FROM embeddings""")),
    // Johnson-Lindenstrauss 64→16 sign projection: the ±1 matrix is
    // md5-derived (content-hash currency), so the 4× dimension shrink is
    // fully value-oracled — exact int64 outputs, no shuffle
    GraftQuery("x_embed_jl_project", EmbedOps.jlProject, Some(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x * ${EmbedOps.Scale}) AS BIGINT)) AS q FROM e),
        |dims AS (SELECT j.j, i.i,
        |           CASE WHEN CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1)) AS INTEGER) % 2 = 0
        |                THEN 1 ELSE -1 END AS s
        |         FROM unnest(generate_series(0, ${EmbedOps.JlOutDims - 1})) AS j(j),
        |              unnest(generate_series(0, ${EmbedOps.JlInDims - 1})) AS i(i)),
        |u AS (SELECT vec_id, i.i AS i, q[i.i + 1] AS qi
        |      FROM q, unnest(generate_series(0, ${EmbedOps.JlInDims - 1})) AS i(i)),
        |p AS (SELECT u.vec_id, d.j AS dim, CAST(sum(d.s * u.qi) AS BIGINT) AS y
        |      FROM u JOIN dims d ON d.i = u.i GROUP BY u.vec_id, d.j)
        |SELECT vec_id, CAST(dim AS INTEGER) AS dim, y FROM p
        |ORDER BY vec_id, dim""".stripMargin)),
    // the JL energy gate: sum|y|^2 within ±20% of k·sum|q|^2, integer
    // cross-multiplied bounds — a broken sign matrix moves it far out
    GraftQuery("x_embed_jl_gate", EmbedOps.jlGate, Some(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, list_transform(v, x -> CAST(floor(x * ${EmbedOps.Scale}) AS BIGINT)) AS q FROM e),
        |dims AS (SELECT j.j, i.i,
        |           CASE WHEN CAST(('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 1)) AS INTEGER) % 2 = 0
        |                THEN 1 ELSE -1 END AS s
        |         FROM unnest(generate_series(0, ${EmbedOps.JlOutDims - 1})) AS j(j),
        |              unnest(generate_series(0, ${EmbedOps.JlInDims - 1})) AS i(i)),
        |u AS (SELECT vec_id, i.i AS i, q[i.i + 1] AS qi
        |      FROM q, unnest(generate_series(0, ${EmbedOps.JlInDims - 1})) AS i(i)),
        |p AS (SELECT u.vec_id, d.j AS dim, CAST(sum(d.s * u.qi) AS BIGINT) AS y
        |      FROM u JOIN dims d ON d.i = u.i GROUP BY u.vec_id, d.j),
        |n1 AS (SELECT CAST(sum(y * y) AS BIGINT) AS num FROM p),
        |d1 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_vecs,
        |              CAST(${EmbedOps.JlOutDims} * sum(qi * qi) AS BIGINT) AS den
        |       FROM u)
        |SELECT n_vecs, num, den,
        |       (num >= (4 * den) // 5 AND num <= (6 * den) // 5) AS passes
        |FROM d1 CROSS JOIN n1""".stripMargin)),
    // Gonzalez k-center greedy: the oracle replays every selection round
    // as an argmax CTE over exact integer distances (generated per round
    // — the PrefOps pair-block pattern), so the chosen set, each pick's
    // farthest-distance credential AND the final coverage radius are all
    // value-checked
    GraftQuery("x_embed_kcenter", EmbedOps.kcenterCenters, Some(
      s"""WITH $kcenterCtes
        |SELECT 1 AS round, vec_id, CAST(0 AS BIGINT) AS dist2 FROM c1
        |${(2 to EmbedOps.KCenters).map(r =>
             s"UNION ALL SELECT $r, vec_id, d FROM c$r").mkString("\n")}
        |ORDER BY round""".stripMargin)),
    GraftQuery("x_embed_kcenter_radius", EmbedOps.kcenterRadius, Some(
      s"""WITH $kcenterCtes
        |SELECT a.n_vecs, m.radius2, p.farthest_vec_id
        |FROM (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM d${EmbedOps.KCenters}) a,
        |     (SELECT CAST(max(d) AS BIGINT) AS radius2 FROM d${EmbedOps.KCenters}) m,
        |     (SELECT min(vec_id) AS farthest_vec_id FROM d${EmbedOps.KCenters}
        |      WHERE d = (SELECT max(d) FROM d${EmbedOps.KCenters})) p""".stripMargin)),
    GraftQuery("x_embed_mrl_head", EmbedOps.mrlHeadMass, Some(
      s"""WITH q AS (SELECT vec_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${EmbedOps.Scale}) AS BIGINT)) AS qv
        |       FROM embeddings),
        |s AS (SELECT vec_id,
        |        CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS total_q,
        |        CAST(list_sum(list_transform(qv[1:${EmbedOps.HeadDims}], v -> v * v)) AS BIGINT) AS head_q
        |      FROM q)
        |SELECT vec_id, total_q,
        |       CAST(CASE WHEN total_q = 0 THEN 0 ELSE head_q * 1000000 // total_q END AS BIGINT) AS head_ppm
        |FROM s ORDER BY vec_id""".stripMargin)),
    GraftQuery("x_embed_mrl_head_by_label", EmbedOps.headMassByLabel, Some(
      s"""WITH q AS (SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${EmbedOps.Scale}) AS BIGINT)) AS qv
        |       FROM embeddings),
        |s AS (SELECT label,
        |        CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS total_q,
        |        CAST(list_sum(list_transform(qv[1:${EmbedOps.HeadDims}], v -> v * v)) AS BIGINT) AS head_q
        |      FROM q),
        |p AS (SELECT label, CASE WHEN total_q = 0 THEN 0 ELSE head_q * 1000000 // total_q END AS ppm FROM s)
        |SELECT label, count(*) AS n_vecs, CAST(sum(ppm) AS BIGINT) AS sum_ppm,
        |       CAST(sum(ppm) AS DOUBLE) / count(*) AS avg_head_ppm
        |FROM p GROUP BY label ORDER BY label""".stripMargin)),
    GraftQuery("x_span_dup", PretrainOps.spanDupProfile, Some(
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= ${PretrainOps.SpanTokens}),
        |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - ${PretrainOps.SpanTokens - 1}),
        |            i -> array_to_string(list_slice(t, i, i + ${PretrainOps.SpanTokens - 1}), ' ')))) AS g FROM toks),
        |d AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM grams)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_spans,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS INTEGER) AS n_dup,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin), headline = true),
    // 100 TB twin of x_span_dup: the span exchange keys are 128-bit
    // digests (16 bytes) instead of 8-token strings — same plan, same
    // rows, so it shares the text-keyed oracle verbatim.
    GraftQuery("x_span_dup_digest", PretrainOps.spanDupProfileDigest, Some(
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= ${PretrainOps.SpanTokens}),
        |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - ${PretrainOps.SpanTokens - 1}),
        |            i -> array_to_string(list_slice(t, i, i + ${PretrainOps.SpanTokens - 1}), ' ')))) AS g FROM toks),
        |d AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM grams)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_spans,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS INTEGER) AS n_dup,
        |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    // per-source data card: volume, language spread, length envelope,
    // exact-duplicate load — every figure an exact integer or a single
    // division of exact integers
    GraftQuery("x_curation_datasheet", CurationOps.corpusDatasheet, Some(
      """WITH d AS (SELECT source, lang, text,
        |             len(string_split(text, ' ')) AS n_tok, length(text) AS n_ch
        |           FROM documents),
        |dup AS (SELECT source,
        |          CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_texts,
        |          CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT) AS n_dup_docs
        |        FROM (SELECT source, text, count(*) AS c FROM d GROUP BY 1, 2)
        |        GROUP BY source),
        |m AS (SELECT source, count(*) AS n_docs,
        |        CAST(count(DISTINCT lang) AS INTEGER) AS n_langs,
        |        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |        CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |        CAST(min(n_tok) AS INTEGER) AS min_tokens,
        |        CAST(max(n_tok) AS INTEGER) AS max_tokens,
        |        CAST(sum(n_ch) AS BIGINT) AS total_chars
        |      FROM d GROUP BY source)
        |SELECT m.source, n_docs, n_langs,
        |       CAST(n_en AS DOUBLE) / n_docs AS pct_en,
        |       total_tokens, CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens,
        |       min_tokens, max_tokens, total_chars, n_dup_texts, n_dup_docs
        |FROM m JOIN dup USING (source) ORDER BY source""".stripMargin)),
    // filter-funnel attrition: pass-alone / survive-prefix / sole-killer
    // per rule of the C4/Gopher-style chain — the rule-ablation table;
    // one scan of conditional sums, stage rows generated from one
    // template (the evalSummaryTail rule)
    GraftQuery("x_curation_filter_funnel", CurationOps.filterFunnel, Some(
      filterFunnelOracle)),
    // mass-weighted length percentiles: count-median vs char-mass
    // median/p90 per source — the "where does the token budget sit"
    // readout; weighted discPercentiles core, exact ints + one division
    GraftQuery("x_curation_mass_median", CurationOps.massWeightedLength, Some(
      """WITH f AS (SELECT source, n_chars AS value, count(*) AS cnt,
        |             CAST(sum(n_chars) AS BIGINT) AS w
        |           FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, value, cnt, w,
        |        CAST(sum(cnt) OVER (PARTITION BY source ORDER BY value) AS BIGINT) AS rc,
        |        CAST(sum(w) OVER (PARTITION BY source ORDER BY value) AS BIGINT) AS rw
        |      FROM f),
        |t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |             CAST(sum(w) AS BIGINT) AS total_chars
        |      FROM f GROUP BY source),
        |j AS (SELECT r.source, r.value,
        |        CAST(rc AS DOUBLE) / t.n_docs AS cd_docs,
        |        CAST(rw AS DOUBLE) / t.total_chars AS cd_mass
        |      FROM r JOIN t USING (source)),
        |a AS (SELECT source,
        |        min(CASE WHEN cd_docs >= 0.5 THEN value END) AS p50_docs,
        |        min(CASE WHEN cd_mass >= 0.5 THEN value END) AS p50_mass,
        |        min(CASE WHEN cd_mass >= 0.9 THEN value END) AS p90_mass
        |      FROM j GROUP BY source)
        |SELECT t.source, t.n_docs, t.total_chars, a.p50_docs, a.p50_mass, a.p90_mass
        |FROM t JOIN a USING (source) ORDER BY source""".stripMargin)),
    // source-concentration audit: Gini via the sorted-weights identity
    // with an exact integer numerator; HHI numerator on DECIMAL(38,0);
    // one fixed IEEE tree per readout — the datasheet's inequality row
    GraftQuery("x_curation_concentration", CurationOps.sourceConcentration, Some(
      """WITH w AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
        |           FROM documents GROUP BY source),
        |r AS (SELECT source, w,
        |        CAST(row_number() OVER (ORDER BY w, source) AS BIGINT) AS i
        |      FROM w),
        |top AS (SELECT source AS top_source, w AS top_w FROM r
        |        ORDER BY w DESC, source DESC LIMIT 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |        CAST(sum(w) AS BIGINT) AS total_chars,
        |        CAST(sum(i * w) AS BIGINT) AS iw,
        |        CAST(sum(CAST(w AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
        |      FROM r)
        |SELECT n_sources, total_chars, top_source,
        |       CAST(top_w AS DOUBLE) / CAST(total_chars AS DOUBLE) AS top_share,
        |       CAST(2 * iw - (n_sources + 1) * total_chars AS DOUBLE)
        |         / (CAST(n_sources AS DOUBLE) * CAST(total_chars AS DOUBLE)) AS gini,
        |       (CAST(s2 AS DOUBLE) / CAST(total_chars AS DOUBLE))
        |         / CAST(total_chars AS DOUBLE) AS hhi
        |FROM a CROSS JOIN top""".stripMargin)),
    // cluster-respecting split: near-dup clusters assigned as a unit
    // (split from md5 of the component label), singletons keep the
    // content-hash rule — the constructive fix for x_split_leakage;
    // the gate pins zero cross-split near-dup pairs by construction
    GraftQuery("x_split_by_cluster", CurationOps.clusterSplit, Some(
      nearDupClustersCtes +
        s""", sp AS (
          |  SELECT d.doc_id, cl.cluster_id,
          |         CASE WHEN cl.cluster_id IS NOT NULL
          |              THEN CAST(('0x' || substr(md5('c:' || CAST(cl.cluster_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
          |              ELSE CAST(('0x' || substr(md5(d.text), 1, 4)) AS BIGINT) % 100 END AS bucket
          |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
          |SELECT doc_id, cluster_id IS NOT NULL AS clustered,
          |       CASE WHEN bucket < 90 THEN 'train'
          |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
          |FROM sp ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_split_by_cluster_gate", CurationOps.clusterSplitGate, Some(
      s"""SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
        |       CAST((SELECT count(*) FROM ($ngramJaccardOracle)) AS BIGINT) AS n_pairs,
        |       CAST(0 AS BIGINT) AS cross_pairs, true AS passes""".stripMargin)),
    GraftQuery("x_split_leakage", CurationOps.splitLeakage, Some(
      s"""WITH $trigramCtes,
        |$goodPairsCtes,
        |sp AS (SELECT doc_id,
        |         CASE WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 90 THEN 'train'
        |              WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 95 THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM documents)
        |SELECT sa.split AS split_a, sb.split AS split_b, count(*) AS n_pairs,
        |       sa.split <> sb.split AS leaked
        |FROM good JOIN sp sa ON good.doc_a = sa.doc_id
        |          JOIN sp sb ON good.doc_b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin)),
    GraftQuery("x_span_dedup_filter", PretrainOps.spanDedupFilter, Some(
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= ${PretrainOps.SpanTokens}),
        |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - ${PretrainOps.SpanTokens - 1}),
        |            i -> array_to_string(list_slice(t, i, i + ${PretrainOps.SpanTokens - 1}), ' ')))) AS g FROM toks),
        |d AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM grams),
        |p AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_spans,
        |        CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
        |      FROM d GROUP BY doc_id)
        |SELECT doc_id, n_spans, dup_frac FROM p
        |WHERE dup_frac <= ${PretrainOps.SpanDupMax}
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_budget_select", CurationOps.budgetSelect, Some(
      s"""WITH s AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |             1.0 - $stopCountSql
        |               / len(string_split(text, ' ')) AS q
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY q DESC, doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM s)
        |SELECT doc_id, n_tokens, cum FROM c
        |WHERE cum <= ${CurationOps.TokenBudget}
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_mix_epochs", CurationOps.epochMix, Some(
      s"""WITH s AS (SELECT doc_id, source,
        |             CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1000 AS bucket,
        |             CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN ${CurationOps.permille(CurationOps.EpochHi)}
        |                  WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN ${CurationOps.permille(CurationOps.EpochMid)}
        |                  ELSE ${CurationOps.permille(CurationOps.EpochLo)} END AS pm
        |           FROM documents),
        |r AS (SELECT doc_id, source,
        |        pm // 1000 + CASE WHEN bucket < pm % 1000 THEN 1 ELSE 0 END AS reps
        |      FROM s),
        |e AS (SELECT doc_id, source, unnest(generate_series(1, reps)) AS epoch FROM r)
        |SELECT doc_id, source, CAST(epoch AS INTEGER) AS epoch
        |FROM e ORDER BY doc_id, epoch""".stripMargin)),
    GraftQuery("x_shuffle_shards", CurationOps.shuffleShards, Some(
      s"""WITH s AS (SELECT doc_id,
        |             md5(CAST(doc_id AS VARCHAR) || ':graft-shuffle-42') AS h
        |           FROM documents),
        |p AS (SELECT doc_id, h,
        |        CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % ${CurationOps.NumShards} AS shard
        |      FROM s)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM p ORDER BY doc_id""".stripMargin)),
    // DSIR importance weighting: hashed-bigram bucket counts (target =
    // lang 'en' vs raw corpus), integer-exact affinity weights, one
    // md5-replayed feature space shared with the quality classifier
    GraftQuery("x_dsir_weights", CurationOps.dsirWeights, Some(
      s"""WITH $dsirCtes
        |SELECT dd.doc_id, CAST(coalesce(n_bigrams, 0) AS INTEGER) AS n_bigrams,
        |       coalesce(sum_w, 0) AS sum_w,
        |       coalesce(sum_w // n_bigrams, prior_ppm) AS score_ppm
        |FROM (SELECT doc_id FROM documents) dd LEFT JOIN s ON dd.doc_id = s.did, pr
        |ORDER BY dd.doc_id""".stripMargin), headline = true),
    // the selection half: keep docs scoring above the corpus prior —
    // deterministic importance-resampling cut, same CTE chain
    GraftQuery("x_dsir_select", CurationOps.dsirSelect, Some(
      s"""WITH $dsirCtes
        |SELECT dd.doc_id, dd.lang, coalesce(sum_w // n_bigrams, prior_ppm) AS score_ppm
        |FROM (SELECT doc_id, lang FROM documents) dd LEFT JOIN s ON dd.doc_id = s.did, pr
        |WHERE coalesce(sum_w // n_bigrams, prior_ppm) > prior_ppm
        |ORDER BY dd.doc_id""".stripMargin)),
    GraftQuery("x_resample_target", CurationOps.resampleToTarget, Some(
      """WITH c AS (SELECT lang, count(*) AS cnt,
        |             CASE lang WHEN 'en' THEN 300 WHEN 'de' THEN 175 WHEN 'es' THEN 175
        |                       WHEN 'fr' THEN 175 WHEN 'zh' THEN 175 ELSE 0 END AS pm
        |           FROM documents GROUP BY lang),
        |lim AS (SELECT cnt AS cnt_lim, pm AS pm_lim FROM c WHERE pm > 0
        |        ORDER BY CAST(cnt AS DOUBLE) / pm, lang LIMIT 1)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN c USING (lang), lim
        |WHERE pm > 0
        |  AND (CAST(('0x' || substr(md5(d.text), 1, 4)) AS INTEGER) % 1000) * pm_lim * cnt
        |      < 1000 * pm * cnt_lim
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_quality_terciles", CurationOps.qualityTerciles, Some(
      s"""WITH s AS (SELECT doc_id, lang,
        |             1.0 - $stopCountSql
        |               / len(string_split(text, ' ')) AS q
        |           FROM documents),
        |b AS (SELECT lang, quantile_cont(q, 0.3333333333333333) AS p33,
        |             quantile_cont(q, 0.6666666666666666) AS p66
        |      FROM s GROUP BY lang)
        |SELECT doc_id, lang, q,
        |       CASE WHEN q > p66 THEN 'head' WHEN q > p33 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM s JOIN b USING (lang)
        |ORDER BY doc_id""".stripMargin)),
    // temperature-scaled (α = 1/2) multilingual sampling shares: the one
    // α where exactness is free — w = floor(sqrt(mass·1e12)) runs the
    // same IEEE double sequence in both engines; shares/boosts are
    // integer division after that
    GraftQuery("x_temperature_shares", SamplingOps.temperatureShares, Some(
      """WITH m AS (SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS token_mass
        |           FROM documents GROUP BY 1),
        |w AS (SELECT lang, token_mass,
        |        CAST(floor(sqrt(CAST(token_mass AS DOUBLE) * 1e12)) AS BIGINT) AS w FROM m),
        |t AS (SELECT CAST(sum(token_mass) AS BIGINT) AS total_mass,
        |             CAST(sum(w) AS BIGINT) AS total_w FROM w),
        |sh AS (SELECT lang, token_mass,
        |         (token_mass * 1000000) // total_mass AS raw_ppm,
        |         (w * 1000000) // total_w AS temp_ppm
        |       FROM w, t)
        |SELECT lang, token_mass, raw_ppm, temp_ppm,
        |       (temp_ppm * 1000000) // raw_ppm AS boost_ppm
        |FROM sh ORDER BY lang""".stripMargin)),
    GraftQuery("x_mix_sources", SamplingOps.mixSources, Some(
      """WITH m AS (
        |  SELECT doc_id, source,
        |         CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 1000 AS bucket,
        |         CAST(CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 1.0
        |                   WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 0.5
        |                   ELSE 0.2 END AS DOUBLE) AS weight
        |  FROM documents)
        |SELECT doc_id, source, bucket, weight FROM m
        |WHERE bucket < weight * 1000.0
        |ORDER BY doc_id""".stripMargin)),
    // perceptual image hashes (aHash): real pixel decode for image
    // blobs, byte-plane fallback for the synthetic corpus; the NEAR-DUP
    // PAIRS pipeline over these hashes (SimHash pigeonhole banding) is
    // pinned by the planted-PNG spec — the synthetic corpus's closest
    // pair sits at Hamming 7, outside the d<=3 pigeonhole guarantee
    GraftQuery("x_mm_image_hash", MultimodalOps.imageHashCorpus, None),
    // perceptual-hash kernel gate: coverage + blob-functionality
    // (identical payloads hash identically — integer-exact contract)
    GraftQuery("x_mm_image_hash_gate", MultimodalOps.imageHashGate, Some(
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_texts,
        |       true AS passes FROM documents""".stripMargin)),
    // PCM frame analysis: Spark walks real RIFF bytes; the oracle
    // re-derives every integer from the closed-form sample generator —
    // agreement proves the parser, not just the arithmetic
    GraftQuery("x_mm_audio_frames", MultimodalOps.audioFrames, Some(
      """WITH d AS (SELECT doc_id, 400 + (doc_id % 5) * 80 AS n FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(0, CAST(n - 1 AS INTEGER))) AS t FROM d),
        |s AS (SELECT doc_id, CAST(t // 160 AS INTEGER) AS frame_idx,
        |             CASE WHEN (t // 160) % 4 = 3 THEN 0
        |                  ELSE CAST((doc_id * 31 + t * 17) % 65536 - 32768 AS INTEGER)
        |             END AS smp
        |      FROM t)
        |SELECT doc_id, frame_idx, count(*) AS n_samples,
        |       CAST(sum(CAST(smp AS BIGINT) * smp) AS BIGINT) AS energy,
        |       max(abs(smp)) AS peak,
        |       CAST(sum(CAST(smp AS BIGINT) * smp) AS BIGINT) < count(*) AS silent
        |FROM s GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin)),
    GraftQuery("x_mm_audio_stats", MultimodalOps.audioStats, Some(
      """WITH d AS (SELECT doc_id, CAST(400 + (doc_id % 5) * 80 AS BIGINT) AS n FROM documents),
        |t AS (SELECT doc_id, unnest(generate_series(0, CAST(n - 1 AS INTEGER))) AS t FROM d),
        |s AS (SELECT doc_id, t // 160 AS frame_idx,
        |             CASE WHEN (t // 160) % 4 = 3 THEN 0
        |                  ELSE CAST((doc_id * 31 + t * 17) % 65536 - 32768 AS INTEGER)
        |             END AS smp
        |      FROM t),
        |fr AS (SELECT doc_id, frame_idx, count(*) AS cnt,
        |              CAST(sum(CAST(smp AS BIGINT) * smp) AS BIGINT) AS energy
        |       FROM s GROUP BY 1, 2)
        |SELECT fr.doc_id, 16000 AS sample_rate, 1 AS channels, 16 AS bits,
        |       d.n AS n_samples, d.n * 1000 // 16000 AS duration_ms,
        |       count(*) AS n_frames,
        |       CAST(sum(CASE WHEN fr.energy < fr.cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |       CAST(sum(CASE WHEN fr.energy < fr.cnt THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS silence_ratio
        |FROM fr JOIN d ON fr.doc_id = d.doc_id
        |GROUP BY fr.doc_id, d.n
        |ORDER BY fr.doc_id""".stripMargin)),
    GraftQuery("x_mm_binary_meta", MultimodalOps.binaryMeta, Some(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS media_format
        |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_mm_decode_meta", MultimodalOps.decodeMeta, Some(
      """SELECT doc_id,
        |       CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio'
        |            ELSE 'video' END AS format,
        |       CAST(16 * (1 + ascii(substr(text, 1, 1)) % 32) AS INTEGER) AS width,
        |       CAST(16 * (1 + octet_length(encode(text)) % 32) AS INTEGER) AS height,
        |       CAST(octet_length(encode(text)) % 7 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_mm_frame_sample", MultimodalOps.frameSample, Some(
      """SELECT doc_id, CAST(unnest(generate_series(0, octet_length(encode(text)) % 7 - 1)) AS INTEGER) AS frame_idx
        |FROM documents WHERE octet_length(encode(text)) % 7 > 0
        |ORDER BY doc_id, frame_idx""".stripMargin)),
    // the synthetic corpus never matches an image signature, so resize
    // runs the stub-dims → fitBox → byte-count path — pure int/double
    // arithmetic, SQL-expressible; real-image thumbnails stay spec-pinned
    GraftQuery("x_mm_resize", (s, d) => MultimodalOps.resize(s, d), Some(
      """WITH m AS (
        |  SELECT doc_id,
        |         16 * (1 + ascii(substr(text, 1, 1)) % 32) AS w,
        |         16 * (1 + octet_length(encode(text)) % 32) AS h,
        |         octet_length(encode(text)) AS nb
        |  FROM documents),
        | f AS (SELECT doc_id, nb, w, h,
        |              least(1.0, least(256.0 / w, 256.0 / h)) AS scale FROM m)
        |SELECT doc_id,
        |       CAST(greatest(1, trunc(w * scale)) AS INTEGER) AS out_w,
        |       CAST(greatest(1, trunc(h * scale)) AS INTEGER) AS out_h,
        |       CAST(least(nb, (CAST(greatest(1, trunc(w * scale)) AS INTEGER)
        |                       * CAST(greatest(1, trunc(h * scale)) AS INTEGER)) // 8)
        |            AS INTEGER) AS n_thumb_bytes
        |FROM f ORDER BY doc_id""".stripMargin)),
    // headline maintenance timing: rebuild a deterministic fragmented
    // lake and compact it — keeps the 100 TB maintenance path honest
    // round-over-round (rows-only: file layout is engine-internal; the
    // byte-identical-survivor property is spec-pinned)
    GraftQuery("x_maint_compact", UpsertOps.compactBench, None, headline = true,
      benchPrep = Some(UpsertOps.rebuildBenchLake)),
    // compaction content gate: after rebuild+compact, one file per
    // partition, only the fragmented fixtures rewritten, and the lake
    // reconciles with the source table (count / partition count /
    // integer id sum — the invariant a file-rewrite op must never lose)
    GraftQuery("x_maint_compact_gate", UpsertOps.compactGate, Some(
      """SELECT count(*) AS n_rows,
        |       CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
        |       CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |       true AS passes FROM events""".stripMargin)),
    GraftQuery("x_corpus_assemble", CorpusPipeline.assemble, None),
    // assembled-corpus contract gate: unique ids ⊆ input, per-source
    // cap respected, split domain, quality floor, packed-seq annotation
    GraftQuery("x_corpus_assemble_gate", CorpusPipeline.assembleGate, Some(
      s"""SELECT count(*) AS n_docs_in,
        |       CAST(${CorpusPipeline.SourceCap} AS INTEGER) AS cap,
        |       true AS passes FROM documents""".stripMargin)),
  )
}
