package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, transform}
import graft.ops._

/** One engine operator exposed through the driver contract.
  *
  * @param oracle DuckDB-runnable ANSI SQL producing the same rows, columns
  *               (by name) and values; None → driver falls back to a
  *               rows-only check (used for ops whose hash functions /
  *               heuristics are not SQL-expressible).
  * @param headline included in the Bench headline timing set.
  * @param benchPrep untimed per-rep fixture setup run by Bench before
  *                  every timed repetition (e.g. re-fragmenting the
  *                  compaction lake), so the timed number measures the
  *                  operator, not its fixture I/O. Verify ignores it:
  *                  `build` must stay self-sufficient for correctness.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false,
    benchPrep: Option[(SparkSession, String) => Unit] = None)

/** The operator registry — the single source of truth behind
  * SparkEntry.queries / oracleSql and Bench. Names are prefixed with the
  * SURVEY.md §2 operator id they implement. */
object Registry {

  /** Shared by a1_monthly_agg_events AND the incremental-MV twin
    * (x_mv_incremental): one SQL so "incremental ≡ recompute" is a hash
    * equality against the same oracle, not two drifting copies. */
  /** Exact n-gram-Jaccard ≥ 1/2 pair set — shared by
    * x_dedup_ngram_jaccard AND the minhash verify gate (one SQL so
    * "banded ⊆ exact" is judged against the very set the exact query is
    * hash-checked on, not a drifting copy). */
  /** Stopword-hit count over whitespace tokens, rendered from the SAME
    * TextOps.stopwords list the Spark plans use — ten oracle sites
    * previously carried verbatim copies of the IN-list, the exact drift
    * shape the evalSummaryTail rule exists to prevent. */
  private val stopCountSql: String =
    "len(list_filter(string_split(text, ' '), t -> t IN (" +
      graft.ops.TextOps.stopwords.map(w => s"'$w'").mkString(",") + ")))"

  /** Filter-funnel oracle: rule booleans once in `b`, every readout a
    * conditional sum in `a`, stage rows GENERATED from one template —
    * mirrors CurationOps.filterFunnel/funnelRules (the stopword floor
    * reuses [[stopCountSql]], the punct ceiling the fleiss third
    * rater's expression). */
  private val filterFunnelOracle: String = {
    val rules = Seq("len_bounds", "stopword_floor", "punct_ceiling", "digit_ceiling")
    val sums = rules.indices.flatMap { i =>
      val prefix = (0 to i).map(j => s"b$j").mkString(" AND ")
      val others = rules.indices.filterNot(_ == i).map(j => s"b$j").mkString(" AND ")
      Seq(
        s"CAST(sum(CASE WHEN b$i THEN 1 ELSE 0 END) AS BIGINT) AS p$i",
        s"CAST(sum(CASE WHEN $prefix THEN 1 ELSE 0 END) AS BIGINT) AS s$i",
        s"CAST(sum(CASE WHEN NOT b$i AND $others THEN 1 ELSE 0 END) AS BIGINT) AS k$i")
    }.mkString(",\n        ")
    val stages = rules.zipWithIndex.map { case (name, i) =>
      s"SELECT ${i + 1} AS stage, '$name' AS rule, n_docs, " +
        s"p$i AS n_pass_rule, s$i AS n_surviving, k$i AS n_sole_kill FROM a"
    }.mkString("\nUNION ALL ")
    s"""WITH b AS (SELECT
      |        len(string_split(text, ' ')) BETWEEN 3 AND 10000 AS b0,
      |        $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS b1,
      |        length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) < 0.1 AS b2,
      |        length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text) < 0.3 AS b3
      |      FROM documents),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |        $sums
      |      FROM b)
      |$stages
      |ORDER BY stage""".stripMargin
  }

  /** The bipartite supplier↔customer interaction graph (CTEs `e0`
    * directed, `e1` symmetrized) shared by the five graph oracles —
    * node ids are disjoint by parity (supplier·2, customer·2+1). */
  private val graphEdgeCtes: String =
    """e0 AS (SELECT DISTINCT l_suppkey*2 AS src, o_custkey*2+1 AS dst
      |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e1 AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin

  /** Vocabulary-richness oracle: both gram lengths rendered from ONE
    * panel template over a parameterized gram source (the
    * filterFunnelOracle rule), mirroring TextOps.vocabRichness. */
  private val richnessOracle: String = {
    def panel(n: Int, gramSrc: String): String =
      s"""SELECT CAST($n AS BIGINT) AS gram_n, n_tokens, n_types, n_hapax, n_dis,
        |       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
        |       CAST(n_types AS DOUBLE)
        |         + CAST(n_hapax AS DOUBLE) * (n_hapax - 1) / (2.0 * (n_dis + 1)) AS chao1,
        |       CAST(n_hapax AS DOUBLE) / n_tokens AS gt_unseen
        |FROM (SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_types,
        |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
        |      FROM (SELECT gram, count(*) AS c FROM ($gramSrc) GROUP BY gram))""".stripMargin
    val uni = "SELECT unnest(string_split(lower(text), ' ')) AS gram FROM documents"
    val tri =
      """SELECT array_to_string(t[i:i+2], ' ') AS gram
        |       FROM (SELECT t, unnest(range(1, len(t)-1)) AS i
        |             FROM (SELECT string_split(lower(text), ' ') AS t FROM documents)
        |             WHERE len(t) >= 3)""".stripMargin
    s"${panel(1, uni)}\nUNION ALL\n${panel(3, tri)}\nORDER BY gram_n"
  }

  /** MMR re-rank oracle: DuckDB replays the exact-dot candidate pool
    * and ALL greedy rounds — each round a generated CTE pair (max-sim
    * against the selected union, then the argmax cut), the
    * filterFunnelOracle template rule. Everything is integer on the
    * EmbedOps.Scale grid, so the greedy trajectory hash-matches
    * bit-for-bit. */
  private val mmrOracle: String = {
    val rounds = (2 to SimilarityOps.MmrTopK).map { r =>
      val prev = (1 until r).map(i => s"SELECT q_id, cand, cv FROM s$i")
        .mkString(" UNION ALL ")
      s"""u${r - 1} AS ($prev),
        |c$r AS (SELECT p.q_id, p.cand,
        |          max(CAST(list_dot_product(p.cv, s.cv) AS BIGINT)) AS ms
        |        FROM pool p JOIN u${r - 1} s USING (q_id)
        |        WHERE NOT EXISTS (SELECT 1 FROM u${r - 1} x
        |                          WHERE x.q_id = p.q_id AND x.cand = p.cand)
        |        GROUP BY p.q_id, p.cand),
        |s$r AS (SELECT q_id, cand, rel, ms, $r AS round, cv FROM (
        |        SELECT c.q_id, c.cand, p.rel, c.ms, p.cv,
        |               row_number() OVER (PARTITION BY c.q_id
        |                 ORDER BY p.rel - c.ms DESC, c.cand) AS rn
        |        FROM c$r c JOIN pool p ON p.q_id = c.q_id AND p.cand = c.cand)
        |        WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to SimilarityOps.MmrTopK)
      .map(i => s"SELECT q_id, cand, rel, ms, round FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH se AS (SELECT vec_id,
      |        list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * ${graft.ops.EmbedOps.Scale})) AS v
      |      FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM se WHERE vec_id < 10),
      |sc AS (SELECT q.q_id, e.vec_id AS cand,
      |         CAST(list_dot_product(q.qv, e.v) AS BIGINT) AS rel, e.v AS cv
      |       FROM q JOIN se e ON e.vec_id <> q.q_id),
      |pool AS (SELECT q_id, cand, rel, cv FROM (
      |         SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, cand) AS rn
      |         FROM sc) WHERE rn <= ${SimilarityOps.MmrPool}),
      |s1 AS (SELECT q_id, cand, rel, CAST(0 AS BIGINT) AS ms, 1 AS round, cv FROM (
      |       SELECT q_id, cand, rel, cv,
      |              row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, cand) AS rn
      |       FROM pool) WHERE rn = 1),
      |$rounds
      |SELECT q_id, round, cand AS neighbor_id, rel AS rel_dot, ms AS max_sim,
      |       rel - ms AS score2
      |FROM ($sel) ORDER BY q_id, round""".stripMargin
  }

  /** Exact cosine-top-10 recall-gate oracle, parameterized by the
    * serving path's recall floor — the same brute-force CTE chain was
    * previously copied per gate (the drift hazard the evalSummaryTail
    * refactor exists to prevent). n_exact counts the exact-side pairs;
    * passes is pinned true. */
  private def annRecallGateOracle(floorLit: String): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
      |s AS (SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos FROM q, e),
      |t AS (SELECT q_id,
      |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
      |      FROM s QUALIFY rank <= 10)
      |SELECT CAST(count(*) AS INTEGER) AS n_exact,
      |       CAST($floorLit AS DOUBLE) AS floor,
      |       true AS passes
      |FROM t""".stripMargin

  /** TPC-H revenue reduction `sum(extendedprice · (1 − discount))` in
    * the exact-decimal currency, cast back to double — the single most
    * repeated fragment of the TPC-H oracle family (14 sites), rendered
    * once so a decimal-policy change cannot fork the definitions. */
  private val revenueSql: String =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** doc → distinct-trigram relation with per-doc counts (toks → tri →
    * cnt) — the shared head of every n-gram near-dup / containment /
    * fuzzy-decontamination / split-leakage oracle. Rendered ONCE (the
    * evalSummaryTail rule applied to the dedup family): a threshold or
    * shingling tweak edits one definition, never a drifted copy. */
  private val trigramCtes: String =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |tri AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      |        FROM toks WHERE len(t) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id)""".stripMargin

  private val ngramJaccardOracle: String =
    s"""WITH $trigramCtes,
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |          FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
      |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      |WHERE 3 * n_common >= ca.n + cb.n
      |ORDER BY doc_a, doc_b""".stripMargin

  /** 16-token paragraph table (`toks` → `paras` → `p2`) — the sub-doc
    * unit shared by paragraph dedup (both key widths) and boilerplate
    * strip, so all three judge against ONE paragraphization. */
  private val paragraphCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |paras AS (SELECT doc_id,
      |            unnest(list_transform(generate_series(0, CAST(ceil(len(t) / 16.0) AS INTEGER) - 1),
      |              i -> {'para_idx': i, 'para': array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ')})) AS pp
      |          FROM toks),
      |p2 AS (SELECT doc_id, CAST(pp.para_idx AS INTEGER) AS para_idx, pp.para AS para FROM paras)""".stripMargin

  /** Per-doc reassembly rollup over a `kept` paragraph relation — the
    * (n_paras, n_kept, clean_text) readout every sub-doc filter ends
    * in; the chooser of `kept` is the only thing that varies. */
  private val paragraphRollupSql: String =
    """agg AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_kept,
      |               string_agg(para, ' ' ORDER BY para_idx) AS clean_text
      |        FROM kept GROUP BY doc_id),
      |tot AS (SELECT doc_id, CAST(ceil(len(string_split(text, ' ')) / 16.0) AS INTEGER) AS n_paras
      |        FROM documents)
      |SELECT t.doc_id AS doc_id, t.n_paras AS n_paras,
      |       coalesce(a.n_kept, 0) AS n_kept, coalesce(a.clean_text, '') AS clean_text
      |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Full paragraph-dedup oracle: first doc (then first position) keeps
    * each distinct paragraph. Shared VERBATIM by x_dedup_paragraph and
    * its 128-bit-digest twin — a digest collision is the only way the
    * two operators can differ, so one oracle pins both. */
  private val paragraphDedupOracle: String =
    s"""WITH $paragraphCtes,
      |kept AS (SELECT * FROM p2
      |         QUALIFY row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) = 1),
      |$paragraphRollupSql""".stripMargin

  /** Shared by x_quality_classifier AND its broadcast-join twin: the
    * hashing trick (md5 → 20-bit bucket) and the pseudo-weight derivation
    * (md5 of 'w'+bucket → [-500000, 500000]) replayed in DuckDB, so both
    * physical plans hash against one logit definition. */
  private val qualityClassifierCtes: String =
    """d AS (SELECT doc_id, text, lang, string_split(lower(text), ' ') AS t FROM documents),
      |s AS (SELECT doc_id, text, lang, CAST(len(t) AS INTEGER) AS n_tokens,
      |        CAST(list_sum(list_transform(t,
      |          tok -> CAST(('0x' || substr(md5('w' || CAST(CAST(('0x' || substr(md5(tok), 1, 5)) AS BIGINT) % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 1000001 - 500000)) AS BIGINT) AS logit
      |      FROM d)""".stripMargin

  private val qualityClassifierOracle: String =
    s"""WITH $qualityClassifierCtes
      |SELECT doc_id, n_tokens, logit, logit > 0 AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  /** 2×2 confusion cells (classifier keep vs stopword gold, through
    * `cm`) — shared by the Cohen-kappa and MCC oracles so the cell
    * source cannot drift between agreement metrics. Mirrors
    * TextOps.confusionCells. */
  private val confusionCellCtes: String =
    s"""$qualityClassifierCtes,
      |g AS (SELECT logit > 0 AS a,
      |             $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS b
      |      FROM s),
      |cm AS (SELECT count(*) AS n,
      |         CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |         CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |         CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |         CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
      |       FROM g)""".stripMargin

  /** Three-rater binary vote count k ∈ {0..3} per document (classifier
    * keep + stopword gold + low-punctuation) over the classifier scan
    * `s` — shared by the Fleiss-kappa and Krippendorff-alpha oracles,
    * mirroring TextOps.raterVotes. */
  private val raterVotesCtes: String =
    s"""$qualityClassifierCtes,
      |g AS (SELECT (CASE WHEN logit > 0 THEN 1 ELSE 0 END)
      |           + (CASE WHEN $stopCountSql / len(string_split(text, ' ')) >= 0.1 THEN 1 ELSE 0 END)
      |           + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) < 0.1 THEN 1 ELSE 0 END) AS k
      |      FROM s)""".stripMargin

  /** The fixed-width clamped logit bin (the calibration bucketing) —
    * one definition shared by the calibration, isotonic, ECE and
    * Kendall oracles. */
  private val logitBinSql: String =
    "least(greatest(CAST(floor(CAST(logit AS DOUBLE) / 2000000.0) AS BIGINT), -4), 4)"

  /** Calibration oracle: bins over the SAME logit CTE the classifier
    * pair is judged against, gold = the stop-ratio rule shared with
    * x_text_quality — single-source on both signals. */
  private val classifierCalibrationOracle: String =
    s"""WITH $qualityClassifierCtes,
      |g AS (SELECT doc_id, logit,
      |        len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is','or','for','on')))
      |          / len(string_split(text, ' ')) AS stop_ratio
      |      FROM s),
      |b AS (SELECT $logitBinSql AS bin,
      |             logit, stop_ratio FROM g)
      |SELECT bin, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN stop_ratio >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gold,
      |       CAST(sum(CASE WHEN stop_ratio >= 0.1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gold_rate,
      |       CAST(sum(logit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_logit
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** Dense hourly cross-join spine + per-hour counts (CTEs `spine`,
    * `c`) — the shared head of EVERY hourly time-series oracle (HW
    * family, ACF, CUSUM, changepoint); the time window is the events
    * table's generation span. */
  private val spineHeadCtes: String =
    """spine AS (
      |  SELECT et.event_type, h.hour_ts
      |  FROM (SELECT DISTINCT event_type FROM events) et
      |  CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
      |                                            TIMESTAMP '2024-01-30 23:00:00',
      |                                            INTERVAL 1 HOUR)) AS hour_ts) h),
      |c AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
      |      FROM events GROUP BY 1, 2)""".stripMargin

  /** The dense per-type hourly spine (CTE `hs`: event_type, t, x) —
    * shared by the HW replay and the changepoint scan. */
  private val hourlySpineCtes: String =
    s"""$spineHeadCtes,
      |hs AS (SELECT spine.event_type,
      |              CAST(CAST(epoch(spine.hour_ts) AS BIGINT) // 3600
      |                - CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT) // 3600 AS INTEGER) AS t,
      |              coalesce(c.c, 0) AS x
      |       FROM spine LEFT JOIN c ON spine.event_type = c.event_type AND spine.hour_ts = c.h)""".stripMargin

  /** The Holt-Winters recursive replay (spine → hourly counts → the
    * per-hour (level, trend, seasonal-vector) fold, ending in CTE `r`
    * with one-step-ahead pred/resid per hour) — shared by the forecast
    * dump and the conformal band so both read the SAME residual
    * definition. Callers prepend WITH RECURSIVE. */
  private val hwRecursiveCtes: String =
    s"""$hourlySpineCtes,
      |r AS (
      |  SELECT event_type, t, x,
      |         CAST(x AS DOUBLE) AS level,
      |         CAST(0.0 AS DOUBLE) AS trend,
      |         CAST(0.0 AS DOUBLE) AS snew,
      |         CAST(x AS DOUBLE) AS pred,
      |         CAST(0.0 AS DOUBLE) AS resid,
      |         list_transform(generate_series(1, 24), i -> CAST(0.0 AS DOUBLE)) AS seas
      |  FROM hs WHERE t = 0
      |  UNION ALL
      |  SELECT event_type, t, x, lvl,
      |         ((lvl - plevel) + ptrend) / 2,
      |         ((x - lvl) + pseas) / 2,
      |         (plevel + ptrend) + pseas,
      |         x - ((plevel + ptrend) + pseas),
      |         seas0[1:j-1] || [((x - lvl) + pseas) / 2] || seas0[j+1:24]
      |  FROM (SELECT h.event_type, h.t, h.x,
      |               r.level AS plevel, r.trend AS ptrend, r.seas AS seas0,
      |               (h.t % 24) + 1 AS j,
      |               r.seas[(h.t % 24) + 1] AS pseas,
      |               ((h.x - r.seas[(h.t % 24) + 1]) + (r.level + r.trend)) / 2 AS lvl
      |        FROM hs h JOIN r ON h.event_type = r.event_type AND h.t = r.t + 1))""".stripMargin

  /** Isotonic recalibration oracle: the SAME bin chain as the
    * calibration readout (single-source rule), then DuckDB's
    * independent replay of the minimax-PAV identity over the bounded
    * bin table — every interval mean in integral 1e12 micro-units, so
    * the comparison is integer equality. */
  private val isotonicCalibrationOracle: String =
    s"""WITH $qualityClassifierCtes,
      |g AS (SELECT doc_id, logit,
      |        len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','to','in','is','or','for','on')))
      |          / len(string_split(text, ' ')) AS stop_ratio
      |      FROM s),
      |b AS (SELECT $logitBinSql AS bin,
      |             stop_ratio FROM g),
      |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
      |                CAST(sum(CASE WHEN stop_ratio >= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gold
      |         FROM b GROUP BY bin),
      |iv AS (SELECT j.bin AS jb, k.bin AS kb,
      |         CAST(sum(m.n_gold) AS BIGINT) AS g2, CAST(sum(m.n_docs) AS BIGINT) AS d2
      |       FROM bins j JOIN bins k ON j.bin <= k.bin
      |       JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
      |       GROUP BY j.bin, k.bin),
      |vv AS (SELECT jb, kb, (g2 * 1000000000000) // d2 AS v FROM iv),
      |mn AS (SELECT vv.jb, b2.bin, min(v) AS mnv
      |       FROM vv JOIN bins b2 ON vv.jb <= b2.bin AND b2.bin <= vv.kb
      |       GROUP BY vv.jb, b2.bin),
      |cal AS (SELECT bin, CAST(max(mnv) AS BIGINT) AS cal_micro FROM mn GROUP BY bin)
      |SELECT bins.bin, n_docs, n_gold,
      |       (n_gold * 1000000000000) // n_docs AS raw_micro, cal_micro
      |FROM bins JOIN cal ON bins.bin = cal.bin ORDER BY bins.bin""".stripMargin

  /** Shared by x_dsir_weights AND x_dsir_select: one CTE chain replaying
    * the hashed-bigram bucket counts (md5 → 20-bit → mod 4096, the
    * quality-classifier feature rule), the add-one-smoothed integer
    * affinity weights, the corpus prior, and the per-doc rollup — so the
    * weights query and its selection cut are judged against the SAME
    * score definition, never two drifting copies. */
  private val dsirCtes: String =
    s"""d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, lang,
      |         CAST(('0x' || substr(md5(array_to_string(list_slice(t, i, i + 1), ' ')), 1, 5)) AS BIGINT)
      |           % ${TextOps.ClassifierBuckets} AS bucket
      |       FROM d, unnest(generate_series(1, len(t) - 1)) AS u(i)
      |       WHERE len(t) >= 2),
      |db AS (SELECT doc_id, lang, bucket, count(*) AS n_db FROM bg GROUP BY 1, 2, 3),
      |bt AS (SELECT bucket, sum(n_db) AS cq,
      |              sum(CASE WHEN lang = '${CurationOps.DsirTargetLang}' THEN n_db ELSE 0 END) AS ct
      |       FROM db GROUP BY 1),
      |w AS (SELECT bucket,
      |        CAST((${CurationOps.DsirScale} * (ct + 1)) // (ct + cq + 2) AS BIGINT) AS w FROM bt),
      |pr AS (SELECT CAST(((sum(ct) + 1) * ${CurationOps.DsirScale})
      |              // (sum(ct) + sum(cq) + 2) AS BIGINT) AS prior_ppm FROM bt),
      |s AS (SELECT doc_id AS did, CAST(sum(n_db * w) AS BIGINT) AS sum_w,
      |        CAST(sum(n_db) AS BIGINT) AS n_bigrams
      |      FROM db JOIN w USING (bucket) GROUP BY 1)""".stripMargin

  /** The VERIFIED near-dup pair set (`prs` co-shingle counts → `good`
    * Jaccard ≥ 1/2 pairs) — the decision boundary the clustering,
    * capping, and split-leakage oracles all build on; one definition,
    * no drifted copies. Assumes `tri`/`cnt` from [[trigramCtes]]. */
  private val goodPairsCtes: String =
    """prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |        FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |good AS (SELECT doc_a, doc_b FROM prs
      |         JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      |         WHERE 3 * n_common >= ca.n + cb.n)""".stripMargin

  /** Transitive-closure clustering over the exact Jaccard ≥ 1/2 pair set
    * (the ngramJaccardOracle threshold) ending in `cl` = (cluster_id,
    * doc_id) — shared by x_dedup_clusters AND the per-cluster quality
    * survivor so both hash against ONE clustering definition. */
  private val nearDupClustersCtes: String =
    s"""WITH RECURSIVE $trigramCtes,
      |$goodPairsCtes,
      | edges AS (SELECT doc_a AS src, doc_b AS dst FROM good
      |           UNION SELECT doc_b, doc_a FROM good),
      | walk AS (
      |   SELECT src AS id, src AS reach FROM edges
      |   UNION
      |   SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src
      | ),
      | cl AS (SELECT min(reach) AS cluster_id, id AS doc_id FROM walk GROUP BY id)
      |""".stripMargin

  private val monthlyAggEventsOracle: String =
    """SELECT event_type, date_trunc('month', ts) AS month,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       count(*) AS rows_loaded
      |FROM events GROUP BY event_type, date_trunc('month', ts)
      |ORDER BY event_type, month""".stripMargin

  val core: Seq[GraftQuery] = Seq(
    GraftQuery("f2_explode_tokens", CoreOps.f2ExplodeTokens, Some(
      """SELECT doc_id, CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
        |       unnest(string_split(text, ' ')) AS token
        |FROM documents ORDER BY doc_id, pos""".stripMargin)),
    GraftQuery("f3_null_coerce", CoreOps.f3NullCoerce, Some(
      """SELECT event_id,
        |       coalesce(nullif(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0), -1.0) AS k_coerced
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("f4_unit_convert", CoreOps.f4UnitConvert, Some(
      """SELECT event_id, value AS temp_c, value * 9 / 5 + 32 AS temp_f
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("a5_literal_columns", CoreOps.a5LiteralColumns, Some(
      """SELECT event_id, 'incremental' AS load_mode, 0 AS sync_interval_min, 'Stockton' AS city
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("f6_date_format", CoreOps.f6DateFormat, Some(
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS day_str
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("e4_substr_to_date", CoreOps.e4SubstrToDate, Some(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CAST(CAST(substr(CAST(l_shipdate AS VARCHAR), 1, 10) AS DATE) AS TIMESTAMP) AS ship_day
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, ship_day""".stripMargin)),
    GraftQuery("e5_ts_normalize", CoreOps.e5TsNormalize, Some(
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_norm
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("e6_null_default", CoreOps.e6NullDefault, Some(
      """SELECT doc_id, coalesce(nullif(source, 'src0'), '') AS source_id
        |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("e2_nested_filter", CoreOps.e2NestedFilter, Some(
      """SELECT doc_id, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id""")),
    GraftQuery("a1_monthly_agg_events", CoreOps.a1MonthlyAggEvents,
      Some(monthlyAggEventsOracle), headline = true),
    GraftQuery("a1_monthly_agg_lineitem", CoreOps.a1MonthlyAggLineitem, Some(
      s"""SELECT l_returnflag, date_trunc('month', l_shipdate) AS month,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       $revenueSql AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, date_trunc('month', l_shipdate)
        |ORDER BY l_returnflag, month""".stripMargin), headline = true),
    GraftQuery("a1_salted_agg", CoreOps.a1SaltedAgg, Some(
      """SELECT event_type, date_trunc('month', ts) AS month,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(*) AS rows_loaded
        |FROM events GROUP BY event_type, date_trunc('month', ts)
        |ORDER BY event_type, month""".stripMargin)),
    GraftQuery("a2_week_trunc", CoreOps.a2WeekTrunc, Some(
      """SELECT date_trunc('week', ts) AS week, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY week""".stripMargin)),
    GraftQuery("d4_count", CoreOps.d4Count, Some(
      """SELECT count(*) AS total FROM lineitem""")),
    GraftQuery("c1_sort_multikey", CoreOps.c1SortMultikey, Some(
      """SELECT * FROM lineitem
        |ORDER BY l_returnflag, l_shipdate, l_orderkey, l_partkey, l_suppkey,
        |         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_linestatus""".stripMargin), headline = true),
    GraftQuery("c2_pushdown_filter", CoreOps.c2PushdownFilter, Some(
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber""".stripMargin)),
    GraftQuery("s2_param_filter_sort", (s, d) => CoreOps.s2ParamFilterSort(s, d), Some(
      """SELECT date_trunc('month', ts) AS month,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY month""".stripMargin)),
    GraftQuery("s3_cast_project", CoreOps.s3CastProject, Some(
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price,
        |       CAST(o_custkey AS INTEGER) AS cust_id
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    GraftQuery("s4_staleness_case", CoreOps.s4StalenessCase, Some(
      """SELECT event_id, value / 200.0 AS ttl_frac,
        |       CASE WHEN value / 200.0 < 0.2 THEN 'out-of-sync'
        |            WHEN value / 200.0 < 0.6 THEN 'partial'
        |            ELSE 'full' END AS sync_status
        |FROM events ORDER BY event_id""".stripMargin)),
    // Weather-fidelity bindings (graft.weather.WeatherFidelity): the
    // REAL Warehouse/ServingCache code paths judged by the per-round
    // DuckDB gate over an events-derived enriched fixture — E2-E6 row
    // by row, A1-A6 through monthlyAgg (quarter-unit dyadics make the
    // float aggregation exact), and the C4/C6/S4 TTL math at two
    // injected clocks (cache-partial and expired-fallback)
    GraftQuery("e3_weather_daily", graft.weather.WeatherFidelity.dailyWeather, Some(
      s"""WITH ${graft.weather.WeatherFidelity.derivedEnrichedSql}
        |SELECT * FROM dw ORDER BY etl_batch_id""".stripMargin)),
    GraftQuery("a1_weather_monthly", graft.weather.WeatherFidelity.monthlyAgg,
      Some(weatherMonthlyOracle)),
    // write-path roundtrips through the REAL sinks: E7's partitioned+
    // sorted fact append (read back WITH the year_month partition
    // column) and A6's overwrite idempotence (written twice, read once)
    // — the last two §2 write anchors move from spec-only to the oracle
    // gate
    GraftQuery("e7_weather_writeback",
      graft.weather.WeatherFidelity.dailyWeatherWriteback, Some(
        s"""WITH ${graft.weather.WeatherFidelity.derivedEnrichedSql}
          |SELECT dw.*, strftime(date, '%Y%m') AS year_month
          |FROM dw ORDER BY etl_batch_id""".stripMargin)),
    GraftQuery("a6_weather_overwrite",
      graft.weather.WeatherFidelity.monthlyAggRewritten,
      Some(weatherMonthlyOracle)),
    GraftQuery("s4_weather_serving_partial",
      graft.weather.WeatherFidelity.servingPartial, Some(
        s"""WITH ${graft.weather.WeatherFidelity.derivedEnrichedSql},
          |$weatherMaCte
          |SELECT month, CAST(avg_temp_c AS DOUBLE) AS avg_temp_c,
          |       CAST(total_rain_mm AS DOUBLE) AS total_rain_mm,
          |       city, warehouse_load_time,
          |       'cache' AS source, 'partial' AS sync_status,
          |       CAST(1600 AS BIGINT) AS ttl_seconds,
          |       count(*) OVER () AS n_rows
          |FROM ma WHERE city = 'Stockton' ORDER BY month""".stripMargin)),
    GraftQuery("s1_weather_serving_expired",
      graft.weather.WeatherFidelity.servingExpired, Some(
        s"""WITH ${graft.weather.WeatherFidelity.derivedEnrichedSql},
          |$weatherMaCte
          |SELECT month, CAST(avg_temp_c AS DOUBLE) AS avg_temp_c,
          |       CAST(total_rain_mm AS DOUBLE) AS total_rain_mm,
          |       city, warehouse_load_time,
          |       'warehouse' AS source, 'out-of-sync' AS sync_status,
          |       CAST(0 AS BIGINT) AS ttl_seconds,
          |       count(*) OVER () AS n_rows
          |FROM ma WHERE city = 'Lodi' ORDER BY month""".stripMargin)),
    GraftQuery("d5_filtered_limit", CoreOps.d5FilteredLimit, Some(
      """SELECT * FROM events WHERE event_type = 'error' ORDER BY event_id LIMIT 1""")),
    GraftQuery("d6_profile", CoreOps.d6Profile, Some(
      """SELECT count(*) AS n_rows,
        |       count(*) FILTER (WHERE value IS NULL) AS n_null_value,
        |       min(value) AS min_value, max(value) AS max_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       count(DISTINCT event_type) AS n_types,
        |       count(DISTINCT user_id) AS n_users,
        |       min(ts) AS ts_min, max(ts) AS ts_max
        |FROM events""".stripMargin)),
    GraftQuery("f8_limit_sample", CoreOps.f8LimitSample, Some(
      """SELECT doc_id, lang, source, n_chars FROM documents ORDER BY doc_id LIMIT 3""")),
    GraftQuery("u1_month_label", CoreOps.u1MonthLabel, Some(
      """SELECT month, strftime(month, '%b %Y') AS label
        |FROM (SELECT DISTINCT date_trunc('month', l_shipdate) AS month FROM lineitem)
        |ORDER BY month""".stripMargin)),
    GraftQuery("u2_round_coalesce", CoreOps.u2RoundCoalesce, Some(
      """SELECT event_id, coalesce(floor(value / 3.0 * 10.0 + 0.5) / 10.0, 0.0) AS value_r
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("f9_string_funcs", CoreOps.f9StringFuncs, Some(
      """SELECT doc_id, upper(source) AS src_up, replace(lang, 'e', 'E') AS lang_r,
        |       substr(text, 1, 20) AS prefix, lpad(lang, 5, '_') AS lang_pad,
        |       CAST(length(trim(text)) AS INTEGER) AS len_t, source LIKE 'src%' AS is_src
        |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("a7_argmax_struct", CoreOps.a7ArgmaxStruct, Some(
      """SELECT o_orderpriority,
        |       max({'p': o_totalprice, 'k': o_orderkey}).p AS top_price,
        |       max({'p': o_totalprice, 'k': o_orderkey}).k AS top_orderkey
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),
    GraftQuery("a8_conditional_agg", CoreOps.a8ConditionalAgg, Some(
      """SELECT event_type, count(*) FILTER (WHERE value > 100) AS n_big,
        |       CAST(sum(CASE WHEN value > 100 THEN CAST(value AS DECIMAL(18,2))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    GraftQuery("f10_from_json", CoreOps.f10FromJson, Some(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("f11_math_funcs", CoreOps.f11MathFuncs, Some(
      """SELECT event_id, abs(value - 100) AS dev, sqrt(value) AS root,
        |       value * value AS sq,
        |       greatest(value, 50.0) AS hi, least(value, 50.0) AS lo
        |FROM events ORDER BY event_id""".stripMargin)),
    GraftQuery("f12_date_arith", CoreOps.f12DateArith, Some(
      """SELECT o_orderkey,
        |       CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due,
        |       CAST(year(o_orderdate) AS INTEGER) AS y, CAST(month(o_orderdate) AS INTEGER) AS m,
        |       CAST(day(o_orderdate) AS INTEGER) AS d
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    GraftQuery("f13_array_funcs", CoreOps.f13ArrayFuncs, Some(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
        |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n, toks[1] AS first_tok,
        |       toks[-1] AS last_tok, list_contains(toks, 'the') AS has_the,
        |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        |       list_min(toks) AS min_tok, list_max(toks) AS max_tok
        |FROM t ORDER BY doc_id""".stripMargin)),
    GraftQuery("f14_map_funcs", CoreOps.f14MapFuncs, Some(
      """WITH per_lang AS (
        |  SELECT source, lang, count(*) AS n FROM documents
        |  WHERE lang <> '__total' GROUP BY 1, 2),
        |entries AS (
        |  SELECT source, lang AS key, n AS value FROM per_lang
        |  UNION ALL
        |  SELECT source, '__total' AS key, CAST(sum(n) AS BIGINT) AS value
        |  FROM per_lang GROUP BY source)
        |SELECT source, key, value FROM entries
        |WHERE value >= 2
        |ORDER BY source, key""".stripMargin)),
    GraftQuery("a9_stddev_exact", CoreOps.a9StddevExact, Some(
      """SELECT event_type,
        |       sqrt((CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |             - CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE))
        |            / (CAST(count(value) AS DOUBLE) - 1.0)) AS stddev_v,
        |       CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS mean_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    GraftQuery("a10_pivot", CoreOps.a10Pivot, Some(
      """SELECT date_trunc('month', ts) AS month,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
        |FROM events GROUP BY date_trunc('month', ts) ORDER BY month""".stripMargin)),
    GraftQuery("a11_unpivot", CoreOps.a11Unpivot, Some(
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS metric_value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric, metric_value""".stripMargin)),
    // oracle uses the explicit dot/(sqrt(na)*sqrt(nb)) fold: DuckDB's
    // list_cosine_similarity computes sqrt(na*nb), 1 ulp off at self-pairs
    GraftQuery("sql_kernel_cosine", CoreOps.sqlKernelCosine, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |     q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |     s AS (SELECT e.vec_id AS vec_id,
        |              list_sum(list_transform(generate_series(1, len(e.v)), i -> e.v[i] * qv[i])) AS dot,
        |              list_sum(list_transform(e.v, x -> x * x)) AS na,
        |              list_sum(list_transform(qv, x -> x * x)) AS nb
        |           FROM e CROSS JOIN q)
        |SELECT vec_id, dot / (sqrt(na) * sqrt(nb)) AS cos
        |FROM s ORDER BY vec_id""".stripMargin)),
    // SQL-string twin of DedupOps.ngramJaccard — same kernels via
    // injectFunction, same inverted-index plan, same oracle
    // byte-identical to the ngram oracle by construction: the SQL-entry
    // twin reuses the named definition instead of a verbatim copy
    GraftQuery("sql_kernel_dedup", CoreOps.sqlKernelDedup, Some(ngramJaccardOracle)),
    GraftQuery("sql_monthly_agg", CoreOps.sqlMonthlyAgg, Some(
      """SELECT event_type, date_trunc('month', ts) AS month,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(*) AS rows_loaded
        |FROM events GROUP BY event_type, date_trunc('month', ts)
        |ORDER BY event_type, month""".stripMargin)))

  val joins: Seq[GraftQuery] = Seq(
    GraftQuery("j1_broadcast_dim_join", JoinOps.j1BroadcastDimJoin, Some(
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin), headline = true),
    GraftQuery("j2_fact_join_agg", JoinOps.j2FactJoinAgg, Some(
      s"""SELECT o_orderpriority,
        |       $revenueSql AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin), headline = true),
    GraftQuery("j3_star_join", JoinOps.j3StarJoin, Some(
      s"""SELECT r_name, n_name,
        |       $revenueSql AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin), headline = true),
    GraftQuery("j4_anti_join", JoinOps.j4AntiJoin, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),
    GraftQuery("j5_semi_join", JoinOps.j5SemiJoin, Some(
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin)),
    GraftQuery("q6_filtered_agg", JoinOps.q6FilteredAgg, Some(
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin), headline = true),
    GraftQuery("j8_full_outer", JoinOps.j8FullOuter, Some(
      """WITH e AS (SELECT user_id, count(*) AS n_err FROM events
        |           WHERE event_type = 'error' GROUP BY 1),
        |     p AS (SELECT user_id, count(*) AS n_pur FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(e.user_id, p.user_id) AS user_id,
        |       coalesce(n_err, 0) AS n_err, coalesce(n_pur, 0) AS n_pur
        |FROM e FULL OUTER JOIN p ON e.user_id = p.user_id
        |ORDER BY user_id""".stripMargin)),
    GraftQuery("q1_pricing_summary", JoinOps.q1PricingSummary,
      Some(q1PricingOracle)),
    // warehouse-scale DECIMAL twin: exact decimal aggregation whose
    // output doubles go through the same scaled-int extraction as the
    // int64 form — bit parity is structural, so it shares q1's oracle
    GraftQuery("q1_pricing_summary_decimal", JoinOps.q1PricingSummaryDecimal,
      Some(q1PricingOracle)),
    GraftQuery("q4_priority_count", JoinOps.q4PriorityCount, Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),
    GraftQuery("j9_bloom_semi", JoinOps.j9BloomSemi, Some(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),
    // skew-salted shuffle join: the salt exists only in the plan — the
    // oracle is the plain unsalted join, pinning semantic neutrality
    GraftQuery("j10_salted_join", JoinOps.j10SaltedJoin, Some(
      """WITH dim AS (SELECT event_type, count(*) AS type_n FROM events GROUP BY event_type)
        |SELECT e.event_type, d.type_n,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(*) AS n_rows
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type, d.type_n ORDER BY e.event_type""".stripMargin)),
    // bucketed co-located join: layout changes, answer doesn't — the
    // oracle is deliberately the SAME SQL as j2 (plain parquet join in
    // DuckDB), so a hash match proves bucketing is pure physical-plan
    // optimization; the zero-exchange plan itself is pinned by
    // BucketingSpec. Headline: times the probe-many regime (the twins
    // are built in the Bench warmup, like the kNN/lexical indexes).
    GraftQuery("j11_bucket_join", JoinOps.j11BucketJoin, Some(
      s"""SELECT o_orderpriority,
        |       $revenueSql AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      headline = true),
    // grid-bucketed range join: the week-cell decomposition exists only
    // in the plan (turns the range-only predicate into an equi join);
    // the oracle is the plain range join DuckDB can evaluate directly,
    // pinning that the grid changes the plan shape, never the answer.
    // Plan (no BroadcastNestedLoopJoin) pinned by RangeJoinSpec.
    GraftQuery("j12_range_join", JoinOps.j12RangeJoin, Some(
      s"""SELECT o_orderkey,
        |       count(*) AS n_shipments,
        |       $revenueSql AS revenue
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 7 DAY
        |WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin), headline = true),
    // interval×interval overlap join, the general form of j12: both
    // window sets decompose into week cells → hash equi join; pairs are
    // emitted exactly once by the overlap-start cell (ownership filter,
    // no distinct). Oracle = the bare overlap predicate DuckDB evaluates
    // directly, pinning that the grid changes the plan, not the answer.
    GraftQuery("j13_interval_overlap", JoinOps.j13IntervalOverlap, Some(
      """WITH a AS (SELECT o_orderkey AS campaign_key, o_orderdate AS s
        |           FROM orders WHERE o_orderkey % 97 = 0),
        |     b AS (SELECT o_orderkey AS promo_key, o_orderdate AS s
        |           FROM orders WHERE o_orderkey % 89 = 0)
        |SELECT campaign_key, promo_key,
        |       CAST(date_diff('day', greatest(a.s, b.s),
        |            least(a.s + INTERVAL 7 DAY, b.s + INTERVAL 10 DAY)) AS INTEGER) AS overlap_days
        |FROM a JOIN b ON a.s < b.s + INTERVAL 10 DAY AND b.s < a.s + INTERVAL 7 DAY
        |ORDER BY campaign_key, promo_key""".stripMargin)),
    GraftQuery("q18_big_orders", JoinOps.q18BigOrders, Some(
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        |       o.o_totalprice, b.total_qty
        |FROM big b JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        |LIMIT 100""".stripMargin)),
    GraftQuery("q5_local_supplier", JoinOps.q5LocalSupplier, Some(
      s"""SELECT n_name,
        |       $revenueSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)),
    GraftQuery("q10_returned_items", JoinOps.q10ReturnedItems, Some(
      s"""WITH lost AS (
        |  SELECT o_custkey,
        |         $revenueSql AS revenue
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        |FROM lost
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)),
    GraftQuery("q2_min_cost_supplier", TpchOps.q2MinCostSupplier, Some(
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |esupp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        |FROM part
        |JOIN ps ON p_partkey = l_partkey
        |JOIN esupp ON l_suppkey = s_suppkey
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |  AND s_acctbal = (SELECT min(s2.s_acctbal)
        |                   FROM ps ps2 JOIN esupp s2 ON ps2.l_suppkey = s2.s_suppkey
        |                   WHERE ps2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin)),
    GraftQuery("q7_volume_shipping", TpchOps.q7VolumeShipping, Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       $revenueSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin)),
    GraftQuery("q8_market_share", TpchOps.q8MarketShare, Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
        |                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |       / $revenueSql
        |       AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)),
    GraftQuery("q9_product_profit", TpchOps.q9ProductProfit, Some(
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       $revenueSql AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin)),
    GraftQuery("q11_important_stock", TpchOps.q11ImportantStock, Some(
      """WITH v AS (
        |  SELECT l_partkey,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS v_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_1'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS ps_partkey, CAST(v_cents AS DOUBLE) / 10000.0 AS value
        |FROM v
        |WHERE v_cents * 1000 > (SELECT sum(v_cents) FROM v)
        |ORDER BY value DESC, ps_partkey""".stripMargin)),
    GraftQuery("q12_ship_priority", TpchOps.q12ShipPriority, Some(
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),
    // oracle runs the literal nested-correlated form (EXISTS over a
    // per-(part,supplier) row set gated by a correlated scalar subquery),
    // pinning the engine's single-aggregate decorrelation
    GraftQuery("q20_promotion_parts", TpchOps.q20PromotionParts, Some(
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT))
        |           FILTER (WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |                     AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') AS avail_qc
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%'
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AFRICA'
        |  AND EXISTS (
        |    SELECT 1 FROM ps
        |    WHERE ps_suppkey = s_suppkey
        |      AND avail_qc * 2 > (SELECT sum(CAST(round(l_quantity * 100) AS BIGINT))
        |                          FROM lineitem
        |                          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |                            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |                            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        |ORDER BY s_name""".stripMargin)),
    GraftQuery("q13_cust_distribution", TpchOps.q13CustDistribution, Some(
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),
    GraftQuery("q14_promo_revenue", TpchOps.q14PromoRevenue, Some(
      s"""SELECT 100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |       / $revenueSql
        |       AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)),
    GraftQuery("q15_top_supplier", TpchOps.q15TopSupplier, Some(
      s"""WITH revenue AS (
        |  SELECT l_suppkey,
        |         $revenueSql AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin)),
    GraftQuery("q16_supplier_variety", TpchOps.q16SupplierVariety, Some(
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)),
    GraftQuery("q17_small_qty", TpchOps.q17SmallQty, Some(
      """WITH part_avg AS (
        |  SELECT l_partkey AS a_partkey,
        |         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qc,
        |         count(*) AS n_li
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN part_avg ON l_partkey = a_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * n_li < sum_qc""".stripMargin)),
    GraftQuery("q19_disjunctive", TpchOps.q19Disjunctive, Some(
      s"""SELECT $revenueSql AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),
    GraftQuery("q21_waiting_supplier", TpchOps.q21WaitingSupplier, headline = true, oracle = Some(
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin)),
    GraftQuery("q22_idle_balance", TpchOps.q22IdleBalance, Some(
      """SELECT c_mktsegment, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)),
    GraftQuery("x_scd2_merge", UpsertOps.scd2Merge, Some(
      """WITH upd AS (
        |  SELECT c_custkey AS u_key,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + CAST(100 AS DECIMAL(18,2)) AS DOUBLE) AS new_bal
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT c.c_custkey AS c_custkey, c.c_acctbal AS c_acctbal,
        |       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |       CASE WHEN u.u_key IS NOT NULL
        |            THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
        |       1 AS version
        |FROM customer c LEFT JOIN upd u ON c.c_custkey = u.u_key
        |UNION ALL
        |SELECT u_key, new_bal, TIMESTAMP '2024-06-01 00:00:00', NULL, 2 FROM upd
        |ORDER BY c_custkey, version""".stripMargin)),
    // incremental materialized-view maintenance: base partial states ⊕
    // delta batch must hash-match the full-recompute oracle (the SAME
    // SQL as a1_monthly_agg_events) — refresh cost tracks batch size
    GraftQuery("x_mv_incremental", UpsertOps.mvIncrementalMonthly,
      Some(monthlyAggEventsOracle)),
    // JOIN-aggregate IVM: Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB folded into
    // the stored base partials; the oracle is the plain recompute, so
    // "delta algebra ≡ recompute" is a hash equality, not a claim
    GraftQuery("x_mv_join_incremental", UpsertOps.mvJoinIncremental,
      headline = true, oracle = Some(
      """SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_rows
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderpriority, month""".stripMargin)),
    // CDC changelog compaction: last-writer-wins by sequence number with
    // delete tombstones — ONE map-side-combined argmax aggregate (the
    // oracle takes the row_number window road the plan avoids)
    GraftQuery("x_cdc_apply", UpsertOps.cdcApply, Some(
      """WITH log AS (SELECT event_id % 997 AS key, event_id AS seq,
        |                    event_type = 'error' AS tombstone, value, user_id
        |             FROM events),
        |w AS (SELECT key, seq, tombstone, value, user_id,
        |             row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |      FROM log)
        |SELECT key, seq AS last_seq, value, user_id FROM w
        |WHERE rn = 1 AND NOT tombstone ORDER BY key""".stripMargin)),
    GraftQuery("j6_asof_join", JoinOps.j6AsofJoin, Some(
      """WITH p AS (SELECT user_id, ts, max(event_id) AS pid FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     e AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error')
        |SELECT e.user_id AS user_id, e.event_id AS error_id, e.ts AS error_ts,
        |       p.pid AS last_purchase_id, p.ts AS last_purchase_ts
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY user_id, error_id""".stripMargin), headline = true),
    GraftQuery("j6c_asof_forward", JoinOps.j6cAsofForward, Some(
      """WITH p AS (SELECT user_id, ts, max(event_id) AS pid FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     e AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error')
        |SELECT e.user_id AS user_id, e.event_id AS error_id, e.ts AS error_ts,
        |       p.pid AS next_purchase_id, p.ts AS next_purchase_ts
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY user_id, error_id""".stripMargin)),
    GraftQuery("j6d_asof_nearest", JoinOps.j6dAsofNearest, Some(
      """WITH p AS (SELECT user_id, ts, max(event_id) AS pid FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |     e AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        |     b AS (SELECT e.user_id, e.event_id, e.ts, p.pid AS b_id, p.ts AS b_ts
        |           FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts),
        |     f AS (SELECT e.user_id, e.event_id, p.pid AS f_id, p.ts AS f_ts
        |           FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts < p.ts)
        |SELECT b.user_id AS user_id, b.event_id AS error_id, b.ts AS error_ts,
        |       CASE WHEN b_ts IS NULL THEN f_id
        |            WHEN f_ts IS NULL THEN b_id
        |            WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
        |            THEN b_id ELSE f_id END AS near_purchase_id,
        |       CASE WHEN b_ts IS NULL THEN f_ts
        |            WHEN f_ts IS NULL THEN b_ts
        |            WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
        |            THEN b_ts ELSE f_ts END AS near_purchase_ts
        |FROM b JOIN f ON b.user_id = f.user_id AND b.event_id = f.event_id
        |ORDER BY user_id, error_id""".stripMargin)),
    GraftQuery("j6b_asof_payload", JoinOps.j6bAsofPayload, Some(
      """WITH p0 AS (SELECT user_id, ts, event_id, value, props,
        |              row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) AS rn
        |            FROM events WHERE event_type = 'purchase'),
        |     p AS (SELECT user_id, ts AS p_ts, event_id AS p_id,
        |                  CASE WHEN value > 100 THEN value END AS p_big_value,
        |                  CAST(json_extract_string(props, '$.k') AS INTEGER) AS p_k
        |           FROM p0 WHERE rn = 1),
        |     e AS (SELECT user_id, event_id AS error_id, ts AS error_ts
        |           FROM events WHERE event_type = 'error')
        |SELECT e.user_id AS user_id, e.error_id AS error_id, e.error_ts AS error_ts,
        |       p.p_ts AS p_ts, p.p_id AS p_id, p.p_big_value AS p_big_value, p.p_k AS p_k
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.error_ts >= p.p_ts
        |ORDER BY user_id, error_id""".stripMargin)),
    GraftQuery("j7_range_join", JoinOps.j7RangeJoin, Some(
      """SELECT e.user_id AS user_id, e.event_id AS error_id, e.ts AS error_ts,
        |       p.event_id AS purchase_id, p.ts AS purchase_ts
        |FROM events e JOIN events p
        |  ON e.user_id = p.user_id AND e.event_type = 'error' AND p.event_type = 'purchase'
        | AND p.ts >= e.ts - INTERVAL 30 MINUTE AND p.ts <= e.ts
        |ORDER BY user_id, error_id, purchase_id""".stripMargin)),
    GraftQuery("q3_top_unshipped", JoinOps.q3TopUnshipped, Some(
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       $revenueSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin), headline = true))

  val windows: Seq[GraftQuery] = Seq(
    GraftQuery("w1_topn_per_group", WindowOps.w1TopNPerGroup, Some(
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_orderpriority
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin)),
    GraftQuery("w2_running_sum", WindowOps.w2RunningSum, Some(
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY event_id) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin)),
    GraftQuery("w3_lag_delta", WindowOps.w3LagDelta, Some(
      """SELECT user_id, event_id,
        |       value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin)),
    GraftQuery("w6_moving_avg", WindowOps.w6MovingAvg, Some(
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |            OVER (PARTITION BY user_id ORDER BY event_id
        |                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |       / count(value) OVER (PARTITION BY user_id ORDER BY event_id
        |                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg_4
        |FROM events ORDER BY user_id, event_id""".stripMargin)),
    GraftQuery("w8_first_last", WindowOps.w8FirstLast, Some(
      """SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin)),
    GraftQuery("w7_rank_family", WindowOps.w7RankFamily, Some(
      """SELECT o_orderpriority, o_orderkey,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |       percent_rank() OVER w AS prank,
        |       cume_dist() OVER w AS cdist,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin)),
    GraftQuery("w4b_session_window", WindowOps.w4bSessionWindow, Some(
      """WITH f AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)),
    GraftQuery("w5_rolling_time", WindowOps.w5RollingTime, Some(
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
        |            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_1h
        |FROM events ORDER BY user_id, event_id""".stripMargin), headline = true),
    GraftQuery("w4_sessionize", WindowOps.w4Sessionize, Some(
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN ts - lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin), headline = true))

  val sets: Seq[GraftQuery] = Seq(
    GraftQuery("set1_union_distinct", SetOps.set1UnionDistinct, Some(
      """SELECT r_name AS name FROM region UNION SELECT n_name FROM nation ORDER BY name""")),
    GraftQuery("set2_except", SetOps.set2Except, Some(
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY custkey""".stripMargin)),
    GraftQuery("set4_except_all", SetOps.set4ExceptAll, Some(
      """WITH d AS (
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS surplus_errors
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),
    GraftQuery("set5_intersect_all", SetOps.set5IntersectAll, Some(
      """WITH d AS (
        |  SELECT user_id FROM events WHERE event_type = 'error'
        |  INTERSECT ALL
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |SELECT user_id, count(*) AS n_common
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin)),
    GraftQuery("set3_intersect", SetOps.set3Intersect, Some(
      """SELECT user_id FROM events WHERE event_type = 'error'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin)),
    GraftQuery("g1_rollup", SetOps.g1Rollup, Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin)),
    GraftQuery("g2_count_distinct", SetOps.g2CountDistinct, Some(
      """SELECT count(DISTINCT l_partkey) AS n_parts FROM lineitem""")),
    GraftQuery("g3_approx_distinct", SetOps.g3ApproxDistinct, None),
    GraftQuery("g3_approx_distinct_gate", SetOps.g3ApproxDistinctGate, Some(
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       true AS passes
        |FROM lineitem""".stripMargin)),
    GraftQuery("g4b_approx_percentiles", SetOps.g4bApproxPercentiles, None),
    GraftQuery("g4b_approx_pct_gate", SetOps.g4bApproxPercentileGate, Some(
      """SELECT l_returnflag, count(*) AS n_rows, true AS passes
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("g4c_disc_percentiles", SetOps.g4cDiscPercentiles, Some(
      """SELECT l_returnflag,
        |       quantile_disc(l_quantity, 0.5) AS p50,
        |       quantile_disc(l_quantity, 0.9) AS p90,
        |       quantile_disc(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("g4_percentiles", SetOps.g4Percentiles, Some(
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.9) AS p90, quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("a14_corr_exact", SetOps.a14CorrExact, Some(
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sx,
        |         CAST(CAST(sum(CAST(l_discount AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sy,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_quantity AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxx,
        |         CAST(CAST(sum(CAST(l_discount AS DECIMAL(38,4)) * CAST(l_discount AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS syy,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_discount AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |       (sxy - sx * sy / n) / (n - 1.0) AS covar_s,
        |       (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
        |FROM m ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("a16_regression_exact", SetOps.a16RegressionExact, Some(
      """WITH mm AS (
        |  SELECT l_returnflag,
        |         CAST(count(*) AS DOUBLE) AS n,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sx,
        |         CAST(CAST(sum(CAST(l_discount AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sy,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_quantity AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxx,
        |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4)) * CAST(l_discount AS DECIMAL(38,4))) * 10000 AS BIGINT) AS DOUBLE) / 10000.0 AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |sl AS (
        |  SELECT l_returnflag, n, sx, sy,
        |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |  FROM mm)
        |SELECT l_returnflag, slope, (sy - slope * sx) / n AS intercept
        |FROM sl ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("a15_mode", SetOps.a15Mode, Some(
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n_occur
        |FROM c QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |                                  ORDER BY cnt DESC, l_quantity ASC) = 1
        |ORDER BY l_returnflag""".stripMargin)),
    GraftQuery("a13_string_agg", SetOps.a13StringAgg, Some(
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),
    GraftQuery("a12_topk_agg", SetOps.a12TopkAgg, Some(
      """SELECT l_returnflag, rank, qty FROM (
        |  SELECT l_returnflag, l_quantity AS qty,
        |         CAST(row_number() OVER (PARTITION BY l_returnflag
        |                                 ORDER BY l_quantity DESC) AS INTEGER) AS rank
        |  FROM lineitem)
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin)),
    GraftQuery("g6_grouping_sets", SetOps.g6GroupingSets, Some(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin)),
    GraftQuery("g5_cube", SetOps.g5Cube, Some(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)))

  /** Shared oracle prelude for the k-means family: DuckDB unrolls the
    * SAME three integer-exact Lloyd rounds KmeansOps runs (scale-floor to
    * int64, squared-int distances, argmin ties to lowest cid, floor-div
    * centroid means in double, empty clusters keep coordinates), so the
    * iterative algorithm is hash-checkable end-to-end. `a3` = final
    * (vec_id, cid, d) assignment under the round-3 centroids. */
  /** The kmeans CTE chain with every CTE name prefixed by `p` — the
    * prefix exists so composed oracles (IVF-PQ) can embed this chain
    * next to the PQ chain without name collisions while both families
    * keep ONE source of SQL truth. `p = ""` reproduces the historical
    * names (u … a3) for the kmeans-family oracles (inner references go
    * through local aliases, so any prefix leaves them untouched). */
  /** The scaled-int64 unnested vector table (`u`): one row per
    * (vec_id, pos) with val = floor(x·1e5) — the embedding currency
    * every exact-integer vector oracle starts from. Prefix-
    * parameterized like [[kmeansCtes]] so chains can nest it. */
  private def scaledUnnestCte(p: String): String =
    s"""${p}u AS (
      |  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS val
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |               unnest(generate_series(0, len(embedding) - 1)) AS pos
      |        FROM embeddings))""".stripMargin

  private def kmeansCtes(p: String): String =
    s"""${scaledUnnestCte(p)},
      |${p}c0 AS (SELECT vec_id AS cid, pos, val AS cval FROM ${p}u WHERE vec_id < 8),
      |${p}d1 AS (SELECT u.vec_id, c.cid, sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM ${p}u u JOIN ${p}c0 c USING (pos) GROUP BY u.vec_id, c.cid),
      |${p}a1 AS (SELECT vec_id, cid, d FROM
      |        (SELECT vec_id, cid, d,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM ${p}d1) WHERE rn = 1),
      |${p}s1 AS (SELECT a.cid, u.pos,
      |              CAST(floor(CAST(sum(u.val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |       FROM ${p}u u JOIN ${p}a1 a USING (vec_id) GROUP BY a.cid, u.pos),
      |${p}c1 AS (SELECT p.cid, p.pos, coalesce(s.cval, p.cval) AS cval
      |       FROM ${p}c0 p LEFT JOIN ${p}s1 s USING (cid, pos)),
      |${p}d2 AS (SELECT u.vec_id, c.cid, sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM ${p}u u JOIN ${p}c1 c USING (pos) GROUP BY u.vec_id, c.cid),
      |${p}a2 AS (SELECT vec_id, cid, d FROM
      |        (SELECT vec_id, cid, d,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM ${p}d2) WHERE rn = 1),
      |${p}s2 AS (SELECT a.cid, u.pos,
      |              CAST(floor(CAST(sum(u.val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |       FROM ${p}u u JOIN ${p}a2 a USING (vec_id) GROUP BY a.cid, u.pos),
      |${p}c2 AS (SELECT p.cid, p.pos, coalesce(s.cval, p.cval) AS cval
      |       FROM ${p}c1 p LEFT JOIN ${p}s2 s USING (cid, pos)),
      |${p}d3 AS (SELECT u.vec_id, c.cid, sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM ${p}u u JOIN ${p}c2 c USING (pos) GROUP BY u.vec_id, c.cid),
      |${p}a3 AS (SELECT vec_id, cid, d FROM
      |        (SELECT vec_id, cid, d,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |         FROM ${p}d3) WHERE rn = 1)
      |""".stripMargin

  private val kmeansCte: String = "WITH " + kmeansCtes("")

  /** Grouped-Lloyd CTE for the PQ family — [[graft.ops.PqOps]]'s two
    * integer-exact assignment rounds replayed with the subspace index m
    * as a grouping column (m = pos div 16, spos = pos mod 16): c0 seeds
    * from the first 16 vectors' sub-slices, a1/a2 argmin per (vec_id, m)
    * with ties to the lowest code, s1 floor-div means per (m, cid, spos),
    * empty clusters carry c0. Shared by codebooks / encode / ADC top-k so
    * the three surfaces are judged against ONE training trajectory. */
  private def pqCtes(p: String): String =
    s"""${p}u AS (
      |  SELECT vec_id, CAST(pos // 8 AS INTEGER) AS m, CAST(pos % 8 AS INTEGER) AS spos,
      |         CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS val
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |               unnest(generate_series(0, len(embedding) - 1)) AS pos
      |        FROM embeddings)),
      |${p}c0 AS (SELECT m, CAST(vec_id AS INTEGER) AS cid, spos, val AS cval FROM ${p}u WHERE vec_id < 16),
      |${p}d1 AS (SELECT u.vec_id, u.m, c.cid, sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM ${p}u u JOIN ${p}c0 c ON u.m = c.m AND u.spos = c.spos
      |       GROUP BY u.vec_id, u.m, c.cid),
      |${p}a1 AS (SELECT vec_id, m, cid FROM
      |        (SELECT vec_id, m, cid,
      |                row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
      |         FROM ${p}d1) WHERE rn = 1),
      |${p}s1 AS (SELECT a.m, a.cid, u.spos,
      |              CAST(floor(CAST(sum(u.val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |       FROM ${p}u u JOIN ${p}a1 a ON u.vec_id = a.vec_id AND u.m = a.m
      |       GROUP BY a.m, a.cid, u.spos),
      |${p}c1 AS (SELECT p.m, p.cid, p.spos, coalesce(s.cval, p.cval) AS cval
      |       FROM ${p}c0 p LEFT JOIN ${p}s1 s ON p.m = s.m AND p.cid = s.cid AND p.spos = s.spos),
      |${p}d2 AS (SELECT u.vec_id, u.m, c.cid, sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM ${p}u u JOIN ${p}c1 c ON u.m = c.m AND u.spos = c.spos
      |       GROUP BY u.vec_id, u.m, c.cid),
      |${p}a2 AS (SELECT vec_id, m, cid FROM
      |        (SELECT vec_id, m, cid,
      |                row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rn
      |         FROM ${p}d2) WHERE rn = 1)
      |""".stripMargin

  private val pqCte: String = "WITH " + pqCtes("")

  /** ADC top-k oracle — shared by the retrain-inline and the
    * probe-from-index PQ entries (one SQL so their agreement is a hash
    * equality, the qualityClassifier pattern). */
  private val pqTopkSql: String =
    pqCte +
      """, qd AS (SELECT q.vec_id AS q_id, c.m, c.cid,
        |            sum((q.val - c.cval) * (q.val - c.cval)) AS td
        |          FROM u q JOIN c1 c ON q.m = c.m AND q.spos = c.spos
        |          WHERE q.vec_id < 10 GROUP BY q.vec_id, c.m, c.cid),
        |adc AS (SELECT t.q_id, a.vec_id AS neighbor_id, CAST(sum(t.td) AS BIGINT) AS adc_dist
        |        FROM a2 a JOIN qd t ON a.m = t.m AND a.cid = t.cid
        |        GROUP BY t.q_id, a.vec_id)
        |SELECT q_id, CAST(rn AS INTEGER) AS rank, neighbor_id, adc_dist FROM
        | (SELECT q_id, neighbor_id, adc_dist,
        |         row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, neighbor_id) AS rn
        |  FROM adc) WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin

  /** Sign-bit binary code CTE chain: `bc` = (vec_id, lo, hi) packed sign
    * words, `bq` = the first-NumQueries query codes, `bs` = per-pair
    * Hamming distances. Shared by the code dump, the Hamming top-k and
    * the two-stage rerank oracle so the packing SQL cannot drift between
    * them. Mirrors SimilarityOps.signCodes bit for bit: bit (pos mod 32)
    * of the lo (pos < 32) / hi word ⇔ coordinate strictly positive. */
  private val binaryCtes: String =
    """bc AS (SELECT vec_id,
      |         CAST(sum(CASE WHEN pos < 32 AND x > 0 THEN CAST(1 AS BIGINT) << pos ELSE 0 END) AS BIGINT) AS lo,
      |         CAST(sum(CASE WHEN pos >= 32 AND x > 0 THEN CAST(1 AS BIGINT) << (pos - 32) ELSE 0 END) AS BIGINT) AS hi
      |       FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
      |                    unnest(generate_series(0, len(embedding) - 1)) AS pos
      |             FROM embeddings)
      |       GROUP BY vec_id),
      |bq AS (SELECT vec_id AS q_id, lo AS q_lo, hi AS q_hi FROM bc WHERE vec_id < 10),
      |bs AS (SELECT q_id, bc.vec_id AS neighbor_id,
      |         CAST(bit_count(xor(lo, q_lo)) + bit_count(xor(hi, q_hi)) AS INTEGER) AS hamming
      |       FROM bq, bc)
      |""".stripMargin

  /** The Hamming top-10 ranking over [[binaryCtes]] — shared by the
    * inline and the index-served forms so their agreement is a hash
    * equality against ONE oracle. */
  private val binaryTopkSql: String =
    "WITH " + binaryCtes +
      """SELECT q_id, CAST(rn AS INTEGER) AS rank, neighbor_id, hamming FROM
        | (SELECT q_id, neighbor_id, hamming,
        |         row_number() OVER (PARTITION BY q_id ORDER BY hamming, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin

  /** BM25 scoring CTE chain (through the per-(query, doc) integer score
    * `sc`) — shared by the three BM25 oracle forms AND the RRF hybrid
    * oracle, one definition so the scoring SQL cannot drift between
    * them. Mirrors RetrievalOps' integer-scaled scoring step for step. */
  /** Corpus-side CTEs (tokens, doc lengths, corpus stats) plus the
    * default query relation `q`. */
  private val bm25BaseCtes: String =
    """tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |             FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
      |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |q(q_id, term) AS (VALUES (0,'hash'),(0,'join'),(0,'fast'),
      |                         (1,'table'),(1,'scan'),(1,'slow'),
      |                         (2,'window'),(2,'agg'),
      |                         (3,'sort'),(3,'merge'),(3,'batch'),
      |                         (4,'vector'),(4,'query'),(4,'dup'))""".stripMargin

  /** The micro-unit scoring chain over an arbitrary (q_id, term) query
    * relation `qn`, CTE names suffixed by `sfx` — parameterized so the
    * PRF oracle can score the EXPANDED query set with the identical
    * formula (one scoring-SQL source, two rounds). `sfx = ""`, `qn =
    * "q"` reproduces the historical chain for every existing consumer. */
  private def bm25ScoringCtes(qn: String, sfx: String): String =
    s"""tf$sfx AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t
      |       WHERE t.term IN (SELECT DISTINCT term FROM $qn)
      |       GROUP BY t.doc_id, t.term),
      |dft$sfx AS (SELECT term, count(*) AS df FROM tf$sfx GROUP BY term),
      |sc$sfx AS (SELECT qq.q_id, tf$sfx.doc_id,
      |         CAST(sum(
      |           CAST(floor(ln(1 + (st.n_docs - dft$sfx.df + 0.5) / (dft$sfx.df + 0.5)) * 1000000) AS BIGINT) *
      |           CAST(floor((tf$sfx.tf * 2.2 / (tf$sfx.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) * 1000000) AS BIGINT)
      |         ) AS BIGINT) AS score
      |       FROM tf$sfx JOIN $qn qq USING (term) JOIN dft$sfx USING (term)
      |            JOIN dl USING (doc_id) CROSS JOIN st
      |       GROUP BY qq.q_id, tf$sfx.doc_id)""".stripMargin

  private val bm25ScoreCtes: String =
    bm25BaseCtes + ",\n" + bm25ScoringCtes("q", "")

  /** The PRF CTE chain on top of the round-1 scores: top-10 feedback
    * docs → top-3 new terms by in-feedback frequency (original terms
    * anti-joined away, ties on term) → round-2 scoring over
    * q ∪ expansion. Shared by the run dump and the PRF-eval runr. */
  private val bm25PrfChain: String =
    s"""top1 AS (SELECT q_id, doc_id FROM
      |          (SELECT q_id, doc_id,
      |                  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
      |           FROM sc) WHERE rn <= 10),
      |exp0 AS (SELECT t1.q_id, t.term, count(*) AS tfsum
      |         FROM top1 t1 JOIN tok t ON t.doc_id = t1.doc_id
      |         LEFT JOIN q qo ON qo.q_id = t1.q_id AND qo.term = t.term
      |         WHERE qo.term IS NULL
      |         GROUP BY t1.q_id, t.term),
      |exp AS (SELECT q_id, term FROM
      |         (SELECT q_id, term,
      |                 row_number() OVER (PARTITION BY q_id ORDER BY tfsum DESC, term) AS rn
      |          FROM exp0) WHERE rn <= 3),
      |q2 AS (SELECT q_id, term FROM q UNION SELECT q_id, term FROM exp),
      |${bm25ScoringCtes("q2", "2")}""".stripMargin

  private val bm25PrfOracle: String =
    s"""WITH $bm25ScoreCtes,
      |$bm25PrfChain
      |SELECT q_id, CAST(rn AS INTEGER) AS rank, doc_id, score FROM
      | (SELECT q_id, doc_id, score,
      |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
      |  FROM sc2) WHERE rn <= 10
      |ORDER BY q_id, rank""".stripMargin

  /** The PRF round-2 ranking as a `runr` definition (nested WITH — the
    * inner chain resolves the outer tok/q/sc CTEs). */
  private val prfRunrDef: String =
    s"""WITH $bm25PrfChain
      |SELECT q_id, doc_id,
      |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      |FROM sc2 QUALIFY rank <= 10""".stripMargin

  private val evalPrfSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(prfRunrDef)},
      |$evalSummaryTail""".stripMargin

  /** Ideal-DCG prefix-sum lookup as a CASE over the literal table
    * generated from EvalOps.NdcgSW — the SAME constants the Spark plan
    * carries, so the one transcendental (log2) never runs in either
    * engine's query. */
  private def ndcgSwCase(expr: String): String =
    s"CASE least($expr, 10) " +
      graft.ops.EvalOps.NdcgSW.zipWithIndex
        .map { case (v, i) => s"WHEN $i THEN $v" }.mkString(" ") +
      " ELSE 0 END"

  /** NDCG CTE chain over the shared BM25 score CTEs: graded qrels
    * (grade = distinct query terms present), literal-weight DCG, and
    * ideal DCG folded over the per-(query, grade) COUNT table — the
    * frequency-table form the Spark plan uses, mirrored. */
  private def ndcgCtesFor(runrDef: String): String = {
    val wCase = "CASE rank " +
      graft.ops.EvalOps.NdcgW.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ") +
      " ELSE 0 END"
    s"""$bm25ScoreCtes,
      |runr AS ($runrDef),
      |dterm AS (SELECT DISTINCT t.doc_id, t.term FROM tok t
      |          WHERE t.term IN (SELECT DISTINCT term FROM q)),
      |gq AS (SELECT qt.q_id, dt.doc_id, CAST(count(*) AS BIGINT) AS grade
      |       FROM (SELECT DISTINCT q_id, term FROM q) qt
      |       JOIN dterm dt USING (term)
      |       GROUP BY qt.q_id, dt.doc_id),
      |mk AS (SELECT r.q_id, r.rank, coalesce(g.grade, 0) AS grade
      |       FROM runr r LEFT JOIN gq g ON r.q_id = g.q_id AND r.doc_id = g.doc_id),
      |dc AS (SELECT q_id, CAST(sum(grade * ($wCase)) AS BIGINT) AS dcg_scaled
      |       FROM mk WHERE rank <= 10 GROUP BY q_id),
      |gcnt AS (SELECT q_id, grade, CAST(count(*) AS BIGINT) AS c
      |         FROM gq GROUP BY q_id, grade),
      |ccum AS (SELECT q_id, grade, c,
      |           CAST(sum(c) OVER (PARTITION BY q_id ORDER BY grade DESC) AS BIGINT) AS cum
      |         FROM gcnt),
      |ic AS (SELECT q_id,
      |         CAST(sum(grade * ((${ndcgSwCase("cum")}) - (${ndcgSwCase("cum - c")}))) AS BIGINT) AS idcg_scaled
      |       FROM ccum GROUP BY q_id),
      |nper AS (SELECT dc.q_id, dcg_scaled, idcg_scaled,
      |           coalesce(CAST(dcg_scaled AS DOUBLE) / nullif(CAST(idcg_scaled AS DOUBLE), 0.0), 0.0) AS ndcg
      |         FROM dc JOIN ic ON dc.q_id = ic.q_id)""".stripMargin
  }

  private lazy val ndcgPerQueryOracle: String =
    s"""WITH ${ndcgCtesFor(bm25RunrDef)}
      |SELECT q_id, dcg_scaled, idcg_scaled, ndcg FROM nper ORDER BY q_id""".stripMargin

  /** Macro mean folds the per-query ndcg doubles as a LEFT-ASSOCIATED
    * chain in static query order — parenthesized identically to the
    * Spark fold (the Bradley–Terry IEEE-order discipline). */
  private def ndcgSummaryOracleFor(runrDef: String): String = {
    val chain = graft.ops.RetrievalOps.DefaultQueries.map { case (q, _) =>
      s"coalesce(max(CASE WHEN q_id = $q THEN ndcg END), 0.0)"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH ${ndcgCtesFor(runrDef)}
      |SELECT CAST(${graft.ops.RetrievalOps.DefaultQueries.size} AS INTEGER) AS n_queries,
      |       CAST(count(*) AS INTEGER) AS n_scored,
      |       $chain / ${graft.ops.RetrievalOps.DefaultQueries.size}.0 AS mean_ndcg
      |FROM nper""".stripMargin
  }

  private lazy val ndcgSummaryOracle: String = ndcgSummaryOracleFor(bm25RunrDef)
  private lazy val ndcgRrfSummaryOracle: String = ndcgSummaryOracleFor(rrfRunrDef)
  private lazy val ndcgPrfSummaryOracle: String = ndcgSummaryOracleFor(prfRunrDef)

  /** Shared BM25 oracle (inline and index-probe forms serve identical
    * rows). */
  private val bm25Oracle: String =
    s"""WITH $bm25ScoreCtes
      |SELECT q_id,
      |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
      |       doc_id, score
      |FROM sc QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Dirichlet query-likelihood oracle: candidates = docs matching ≥1
    * query term, each scored over ALL its query's terms (absent terms
    * contribute the background probability via the LEFT JOIN's
    * coalesce-0 tf); the per-term ln is floor-scaled to int64 micro-units
    * on an IEEE tree that mirrors RetrievalOps.qlm token for token
    * (μ = 100.0, the same decimal literal). */
  private val qlmOracle: String =
    s"""WITH $bm25BaseCtes,
      |tfq AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tok t
      |        WHERE t.term IN (SELECT DISTINCT term FROM q)
      |        GROUP BY t.doc_id, t.term),
      |cfq AS (SELECT t.term, count(*) AS cf FROM tok t
      |        WHERE t.term IN (SELECT DISTINCT term FROM q)
      |        GROUP BY t.term),
      |tc AS (SELECT CAST(sum(dl) AS BIGINT) AS tot_c FROM dl),
      |cand AS (SELECT DISTINCT q.q_id, tfq.doc_id FROM tfq JOIN q USING (term)),
      |scq AS (SELECT c.q_id, c.doc_id,
      |          CAST(sum(CAST(floor(ln(
      |            (CAST(coalesce(tfq.tf, 0) AS DOUBLE) + 100.0 * cfq.cf / tc.tot_c)
      |            / (dl.dl + 100.0)) * 1000000) AS BIGINT)) AS BIGINT) AS score_micro
      |        FROM cand c JOIN q ON q.q_id = c.q_id
      |             JOIN cfq ON cfq.term = q.term
      |             LEFT JOIN tfq ON tfq.doc_id = c.doc_id AND tfq.term = q.term
      |             JOIN dl ON dl.doc_id = c.doc_id
      |             CROSS JOIN tc
      |        GROUP BY c.q_id, c.doc_id)
      |SELECT q_id, CAST(rn AS INTEGER) AS rank, doc_id, score_micro FROM
      | (SELECT q_id, doc_id, score_micro,
      |         row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) AS rn
      |  FROM scq) WHERE rn <= 10
      |ORDER BY q_id, rank""".stripMargin

  /** RRF hybrid oracle: BM25 lexical top-10 fused with cosine-kNN dense
    * top-10 via exact-integer reciprocal-rank contributions
    * (lcm(61..70) // (60 + rank) — divides evenly for every rank). */
  private val rrfOracle: String =
    s"""WITH $bm25ScoreCtes,
      |lex AS (SELECT q_id, doc_id,
      |          CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
      |        FROM sc QUALIFY lex_rank <= 10),
      |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dq AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
      |ds AS (SELECT q_id, vec_id AS doc_id, list_cosine_similarity(qv, v) AS cos FROM dq, e),
      |dense AS (SELECT q_id, doc_id,
      |            CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS INTEGER) AS dense_rank
      |          FROM ds QUALIFY dense_rank <= 10),
      |fused AS (SELECT coalesce(lex.q_id, dense.q_id) AS q_id,
      |            coalesce(lex.doc_id, dense.doc_id) AS doc_id,
      |            coalesce(CAST(142813628717760 // (60 + lex_rank) AS BIGINT), 0) +
      |            coalesce(CAST(142813628717760 // (60 + dense_rank) AS BIGINT), 0) AS rrf
      |          FROM lex FULL OUTER JOIN dense
      |            ON lex.q_id = dense.q_id AND lex.doc_id = dense.doc_id)
      |SELECT q_id,
      |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank,
      |       doc_id, rrf AS rrf_score
      |FROM fused QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** Ranking-evaluation CTE chain on top of the BM25 scores: the run
    * (top-10), conjunctive qrels (doc holds EVERY query term), cumulative
    * hit counts, and the per-query scaled-integer metrics — mirrors
    * EvalOps.rankingMetrics term for term (2520 = lcm(1..10), so every
    * reciprocal-rank and P@i term is an exact integer; `(2520*h)//rank`
    * is exact because rank divides 2520·h's factor structure the same
    * way EvalOps' double path is exact). */
  /** The run-independent half of the eval chain: given a CTE named
    * `runr` = (q_id, doc_id, rank ≤ 10), derive conjunctive qrels and
    * the per-query scaled-integer metrics (`per`). Parameterized by the
    * run definition so the BM25 run and the RRF hybrid run are judged
    * by ONE metrics SQL — the same single-source rule as the kmeans/PQ
    * CTE builders. */
  private def evalPerQueryCtesFor(runrDef: String): String =
    s"""$bm25ScoreCtes,
      |runr AS ($runrDef),
      |dterm AS (SELECT DISTINCT t.doc_id, t.term FROM tok t
      |          WHERE t.term IN (SELECT DISTINCT term FROM q)),
      |qsize AS (SELECT q_id, count(DISTINCT term) AS n_terms FROM q GROUP BY q_id),
      |qrel AS (SELECT qt.q_id, dt.doc_id
      |         FROM (SELECT DISTINCT q_id, term FROM q) qt
      |         JOIN dterm dt USING (term) JOIN qsize USING (q_id)
      |         GROUP BY qt.q_id, dt.doc_id HAVING count(*) = max(n_terms)),
      |mk AS (SELECT r.q_id, r.rank,
      |         CASE WHEN qr.doc_id IS NULL THEN 0 ELSE 1 END AS rel
      |       FROM runr r LEFT JOIN qrel qr
      |         ON r.q_id = qr.q_id AND r.doc_id = qr.doc_id),
      |cum AS (SELECT q_id, rank, rel,
      |          sum(rel) OVER (PARTITION BY q_id ORDER BY rank) AS hits_at
      |        FROM mk),
      |nrel AS (SELECT q_id, count(*) AS n_rel FROM qrel GROUP BY q_id),
      |pq2 AS (SELECT c.q_id,
      |          CAST(sum(rel) AS INTEGER) AS n_hit,
      |          CAST(coalesce(min(CASE WHEN rel = 1 THEN rank END), 0) AS INTEGER) AS first_rel_rank,
      |          CAST(coalesce(sum(CASE WHEN rel = 1 THEN (2520 * hits_at) // rank END), 0) AS BIGINT) AS ap_scaled
      |        FROM cum c GROUP BY c.q_id),
      |per AS (SELECT p.q_id, CAST(coalesce(n.n_rel, 0) AS INTEGER) AS n_rel,
      |          p.n_hit, p.first_rel_rank,
      |          CAST(CASE WHEN p.first_rel_rank > 0 THEN 2520 // p.first_rel_rank ELSE 0 END AS BIGINT) AS rr_scaled,
      |          p.ap_scaled
      |        FROM pq2 p LEFT JOIN nrel n USING (q_id))""".stripMargin

  /** RBO@10 oracle between the BM25 run and another runr definition:
    * every (q_id, doc_id) match contributes the literal entry weight
    * W(max rank) — the SAME integers EvalOps.RboW carries — summed per
    * query, one division by 2^k·2520; the static query list backfills
    * zero-overlap queries. */
  private def rboOracleFor(runbDef: String): String = {
    val wCase = "CASE greatest(a.rank, b.rank) " +
      graft.ops.EvalOps.RboW.zipWithIndex
        .map { case (v, m) => s"WHEN ${m + 1} THEN $v" }.mkString(" ") +
      " ELSE 0 END"
    val qIds = graft.ops.RetrievalOps.DefaultQueries.map(_._1).mkString(", ")
    s"""WITH $bm25ScoreCtes,
      |runa AS ($bm25RunrDef),
      |runb AS ($runbDef),
      |sq AS (SELECT a.q_id, CAST(sum($wCase) AS BIGINT) AS s_scaled
      |       FROM runa a JOIN runb b ON a.q_id = b.q_id AND a.doc_id = b.doc_id
      |       GROUP BY a.q_id),
      |qs AS (SELECT unnest([$qIds]) AS q_id)
      |SELECT qs.q_id, CAST(coalesce(s_scaled, 0) AS BIGINT) AS s_scaled,
      |       CAST(coalesce(s_scaled, 0) AS DOUBLE) / ${graft.ops.EvalOps.RboDenom}.0 AS rbo
      |FROM qs LEFT JOIN sq ON qs.q_id = sq.q_id ORDER BY qs.q_id""".stripMargin
  }

  /** The BM25 top-10 as the `runr` definition. */
  private val bm25RunrDef: String =
    """SELECT q_id, doc_id,
      |           CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      |         FROM sc QUALIFY rank <= 10""".stripMargin

  /** The RRF hybrid top-10 as the `runr` definition — the same fused
    * ranking rrfOracle serves, restated over the shared `sc` scores
    * plus the dense cosine list. */
  private val rrfRunrDef: String =
    """WITH lex AS (SELECT q_id, doc_id,
      |          CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rank
      |        FROM sc QUALIFY lex_rank <= 10),
      |be2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dq2 AS (SELECT vec_id AS q_id, v AS qv FROM be2 WHERE vec_id < 5),
      |ds2 AS (SELECT q_id, vec_id AS doc_id, list_cosine_similarity(qv, v) AS cos FROM dq2, be2),
      |dense AS (SELECT q_id, doc_id,
      |            CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS INTEGER) AS dense_rank
      |          FROM ds2 QUALIFY dense_rank <= 10),
      |fused AS (SELECT coalesce(lex.q_id, dense.q_id) AS q_id,
      |            coalesce(lex.doc_id, dense.doc_id) AS doc_id,
      |            coalesce(CAST(142813628717760 // (60 + lex_rank) AS BIGINT), 0) +
      |            coalesce(CAST(142813628717760 // (60 + dense_rank) AS BIGINT), 0) AS rrf
      |          FROM lex FULL OUTER JOIN dense
      |            ON lex.q_id = dense.q_id AND lex.doc_id = dense.doc_id)
      |SELECT q_id, doc_id,
      |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS INTEGER) AS rank
      |FROM fused QUALIFY rank <= 10""".stripMargin

  private val evalPerQueryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(bm25RunrDef)}
      |SELECT q_id, n_rel, n_hit, first_rel_rank, rr_scaled, ap_scaled,
      |       CAST(n_hit AS DOUBLE) / 10 AS precision_at_k,
      |       CASE WHEN n_rel > 0 THEN CAST(n_hit AS DOUBLE) / n_rel ELSE 0.0 END AS recall
      |FROM per ORDER BY q_id""".stripMargin

  /** The one-row summary tail shared by every evaluated run. */
  private def evalSummaryTail: String =
    """s AS (SELECT count(*) AS n_queries, sum(n_rel) AS n_rel_total,
      |        sum(n_hit) AS n_hit_total, sum(rr_scaled) AS rr_sum,
      |        sum(CASE WHEN least(n_rel, 10) > 0
      |                 THEN ap_scaled * (2520 // least(n_rel, 10)) ELSE 0 END) AS ap_sum
      |      FROM per)
      |SELECT CAST(n_queries AS INTEGER) AS n_queries,
      |       CAST(n_rel_total AS BIGINT) AS n_rel_total,
      |       CAST(n_hit_total AS BIGINT) AS n_hit_total,
      |       CAST(rr_sum AS DOUBLE) / (2520.0 * n_queries) AS mrr,
      |       CAST(ap_sum AS DOUBLE) / (2520.0 * 2520 * n_queries) AS map_at_k,
      |       CASE WHEN n_rel_total > 0 THEN CAST(n_hit_total AS DOUBLE) / n_rel_total ELSE 0.0 END AS micro_recall,
      |       CAST(n_hit_total AS DOUBLE) / (n_queries * 10) AS micro_precision
      |FROM s""".stripMargin

  private val evalRrfSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(rrfRunrDef)},
      |$evalSummaryTail""".stripMargin

  private val evalSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(bm25RunrDef)},
      |$evalSummaryTail""".stripMargin

  /** Nearest-class-centroid CTE chain (through `ca` = per-vector
    * vec_id, true label, pred, dist): scaled-int64 view, floor-div
    * class means, integer squared distances, argmin ties to the lowest
    * label — mirrors EmbedOps.centroidClassify step for step. Shared by
    * the assignment dump and the confusion-matrix oracle. */
  private def scaledVecCte: String =
    """cu AS (SELECT vec_id, label, pos,
      |         CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS val
      |       FROM (SELECT vec_id, label, unnest(embedding) AS x,
      |                    unnest(generate_series(0, len(embedding) - 1)) AS pos
      |             FROM embeddings))""".stripMargin

  private def classifyCtes: String =
    s"""$scaledVecCte,
      |cc AS (SELECT label AS clabel, pos,
      |         CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |       FROM cu GROUP BY label, pos),
      |cd AS (SELECT u.vec_id, u.label, c.clabel,
      |         sum((u.val - c.cval) * (u.val - c.cval)) AS d
      |       FROM cu u JOIN cc c USING (pos) GROUP BY u.vec_id, u.label, c.clabel),
      |ca AS (SELECT vec_id, label, clabel AS pred, CAST(d AS BIGINT) AS dist FROM
      |        (SELECT vec_id, label, clabel, d,
      |                row_number() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
      |         FROM cd) WHERE rn = 1)""".stripMargin

  /** K-fold CV oracle: per fold, centroids from the complement
    * (vec_id % K ≠ f), argmin assignment on the held-out slice —
    * generated from the SAME fold count the Spark op uses. */
  private def cvAccuracyOracle: String = {
    val k = graft.ops.EmbedOps.CvFolds
    val folds = (0 until k).map { f =>
      s"""cc$f AS (SELECT label AS clabel, pos,
        |         CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
        |       FROM cu WHERE vec_id % $k <> $f GROUP BY label, pos),
        |cd$f AS (SELECT u.vec_id, u.label, c.clabel,
        |         sum((u.val - c.cval) * (u.val - c.cval)) AS d
        |       FROM cu u JOIN cc$f c USING (pos)
        |       WHERE u.vec_id % $k = $f GROUP BY u.vec_id, u.label, c.clabel),
        |ca$f AS (SELECT vec_id, label, clabel AS pred FROM
        |        (SELECT vec_id, label, clabel,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
        |         FROM cd$f) WHERE rn = 1),
        |r$f AS (SELECT CAST($f AS INTEGER) AS fold,
        |          CAST(count(*) AS BIGINT) AS n_test,
        |          CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |        FROM ca$f)""".stripMargin
    }.mkString(",\n")
    val union = (0 until k).map(f => s"SELECT * FROM r$f").mkString(" UNION ALL ")
    s"""WITH $scaledVecCte,
      |$folds
      |SELECT fold, n_test, n_correct,
      |       CAST(n_correct AS DOUBLE) / CAST(n_test AS DOUBLE) AS accuracy
      |FROM ($union) ORDER BY fold""".stripMargin
  }

  /** Content-defined chunking CTE chain (through `s` = per-chunk doc_id,
    * token array `t`, boundary list `ends`, chunk ordinal `j`, start
    * `sp`) — mirrors PretrainOps.cdcChunks' gear rule (boundary after
    * token i ⇔ md5 of the 4-token window ≡ 0 mod 8, last token closes
    * the final chunk). A def, not a val: it is referenced from inside
    * the query-list vals below and defs are initialization-order-proof.
    * Shared by the chunk dump and the chunk-level dedup pair oracle. */
  /** Split-drift count CTEs (through `c` = per-length-bucket train/val
    * counts and `t` = the two totals) — shared by the per-bucket χ²
    * report and its order-independent summary so the two cannot drift.
    * Mirrors SamplingOps.splitDriftCounts step for step. */
  private def driftCountCtes: String =
    s"""s AS (SELECT CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 AS bucket,
      |        CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS INTEGER) AS n_tok
      |      FROM documents),
      |d AS (SELECT CASE WHEN bucket < 90 THEN 'train'
      |                  WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
      |        (n_tok // ${PretrainOps.BucketWidth}) * ${PretrainOps.BucketWidth} AS bucket_lo
      |      FROM s),
      |c AS (SELECT bucket_lo,
      |        sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
      |        sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS n_val
      |      FROM d WHERE split IN ('train', 'val') GROUP BY bucket_lo),
      |t AS (SELECT sum(n_train) AS tt, sum(n_val) AS tv FROM c)""".stripMargin

  /** KS drift CTE chain (through `d` = per-distinct-length cumulative
    * counts per split and the cross-multiplied integer deviation
    * |cum_train·n_val − cum_val·n_train|) — shared by the per-value
    * table and the 1-row verdict. Mirrors SamplingOps.ksOf. */
  private def ksDriftCtes: String =
    """s AS (SELECT n_chars AS value,
      |        CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 AS bucket
      |      FROM documents),
      |f AS (SELECT value,
      |        sum(CASE WHEN bucket < 90 THEN 1 ELSE 0 END) AS f_train,
      |        sum(CASE WHEN bucket >= 90 AND bucket < 95 THEN 1 ELSE 0 END) AS f_val
      |      FROM s WHERE bucket < 95 GROUP BY value),
      |c AS (SELECT value,
      |        CAST(sum(f_train) OVER (ORDER BY value) AS BIGINT) AS cum_train,
      |        CAST(sum(f_val) OVER (ORDER BY value) AS BIGINT) AS cum_val
      |      FROM f),
      |t AS (SELECT CAST(sum(f_train) AS BIGINT) AS n_train,
      |             CAST(sum(f_val) AS BIGINT) AS n_val FROM f),
      |d AS (SELECT value, cum_train, cum_val,
      |        abs(cum_train * n_val - cum_val * n_train) AS d_num
      |      FROM c CROSS JOIN t)""".stripMargin

  /** Gonzalez k-center CTE chain: c1 = smallest vec_id; round r picks
    * the point with the largest min-distance to c1..c(r−1) (ties to the
    * smallest vec_id) and dr carries each point's updated min-distance.
    * Rounds are GENERATED (one template, KCenters instances) so a
    * distance-formula tweak edits one definition — the evalSummaryTail
    * rule. Shared by the centers table and the radius readout. Mirrors
    * EmbedOps.kcenterSelect. */
  private def kcenterCtes: String = {
    def dist(p: String, c: String) =
      s"CAST(list_sum(list_transform(generate_series(1, len($p.v)), " +
        s"i -> ($p.v[i] - $c.v[i]) * ($p.v[i] - $c.v[i]))) AS BIGINT)"
    val head =
      s"""e AS (SELECT vec_id,
        |        list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${EmbedOps.Scale}) AS BIGINT)) AS v
        |      FROM embeddings),
        |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS (SELECT e.vec_id, e.v, ${dist("e", "c1")} AS d FROM e CROSS JOIN c1)""".stripMargin
    val rounds = (2 to EmbedOps.KCenters).map { r =>
      val p = s"d${r - 1}"
      s"""c$r AS (SELECT vec_id, v, d FROM $p ORDER BY d DESC, vec_id LIMIT 1),
        |d$r AS (SELECT $p.vec_id, $p.v, least($p.d, ${dist(p, s"c$r")}) AS d
        |        FROM $p CROSS JOIN c$r)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** Per-source drift CTE chain (through `cells` = the full
    * source × length-bucket grid with observed counts, expectations and
    * χ² terms) — shared by the cell report and the per-source summary.
    * Mirrors SamplingOps.sourceDriftCells step for step. */
  /** Per-(source, value) one-vs-rest deviation grid (`sf` … `d`) —
    * mirrors [[graft.ops.SamplingOps.sourceKsCells]]; shared by the
    * per-source KS verdict and the per-source W₁ magnitude so both
    * judge the same grid definition. */
  private def sourceKsCtes: String =
    """sf AS (SELECT source, n_chars AS value, count(*) AS c
      |            FROM documents GROUP BY 1, 2),
      |vals AS (SELECT value, CAST(sum(c) AS BIGINT) AS cg FROM sf GROUP BY value),
      |g AS (SELECT value, CAST(sum(cg) OVER (ORDER BY value) AS BIGINT) AS cum_g FROM vals),
      |src AS (SELECT DISTINCT source FROM sf),
      |grid AS (SELECT src.source, g.value, g.cum_g,
      |           CAST(coalesce(sf.c, 0) AS BIGINT) AS c
      |         FROM g CROSS JOIN src
      |         LEFT JOIN sf ON sf.source = src.source AND sf.value = g.value),
      |sc AS (SELECT source, value, cum_g,
      |         CAST(sum(c) OVER (PARTITION BY source ORDER BY value) AS BIGINT) AS cum_s
      |       FROM grid),
      |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sf GROUP BY source),
      |gg AS (SELECT CAST(sum(c) AS BIGINT) AS n_g FROM sf),
      |d AS (SELECT sc.source, sc.value, t.n_s, gg.n_g - t.n_s AS n_rest,
      |        abs(cum_s * (gg.n_g - t.n_s) - (cum_g - cum_s) * t.n_s) AS d_num
      |      FROM sc JOIN t USING (source) CROSS JOIN gg)""".stripMargin

  private def sourceDriftCtes: String =
    s"""s AS (SELECT source,
      |        (CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS INTEGER)
      |           // ${PretrainOps.BucketWidth}) * ${PretrainOps.BucketWidth} AS bucket_lo
      |      FROM documents),
      |c AS (SELECT source, bucket_lo, count(*) AS n FROM s GROUP BY source, bucket_lo),
      |bs AS (SELECT source, sum(n) AS tot_source FROM c GROUP BY source),
      |bb AS (SELECT bucket_lo, sum(n) AS n_bucket FROM c GROUP BY bucket_lo),
      |tot AS (SELECT sum(n) AS tot_all FROM c),
      |cells AS (SELECT bs.source, bb.bucket_lo,
      |            coalesce(c.n, 0) AS n_docs, bb.n_bucket,
      |            CAST(bs.tot_source * bb.n_bucket AS DOUBLE) / tot.tot_all AS e_docs,
      |            (CAST(coalesce(c.n, 0) AS DOUBLE) - CAST(bs.tot_source * bb.n_bucket AS DOUBLE) / tot.tot_all)
      |              * (CAST(coalesce(c.n, 0) AS DOUBLE) - CAST(bs.tot_source * bb.n_bucket AS DOUBLE) / tot.tot_all)
      |              / (CAST(bs.tot_source * bb.n_bucket AS DOUBLE) / tot.tot_all) AS chi2_term
      |          FROM bs CROSS JOIN bb CROSS JOIN tot
      |               LEFT JOIN c ON c.source = bs.source AND c.bucket_lo = bb.bucket_lo)""".stripMargin

  /** Q1 pricing-summary oracle — single source shared by the scaled-int64
    * form and the DECIMAL aggregation twin (both produce their output
    * doubles through the identical scaled-integer → double → divide
    * route this SQL spells out). */
  private def q1PricingOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100 AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100 AS sum_base_price,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |         * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000 AS sum_disc_price,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |         * (100 - CAST(round(l_discount*100) AS BIGINT))
      |         * (100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)/1000000 AS sum_charge,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_qty,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_price,
      |  CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100/count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Per-arm Welch moment core (CTE chain ending in `wde`: n0, n1,
    * mean0, mean1, v0, v1) — shared by the t test and the MDE/power
    * readout, mirroring EventOps.welchMomentsOf so both oracles read
    * the SAME variance definition. */
  /** The mean/var/pivot tail over a per-user CTE `pu(<keys,> user_id,
    * y)` — ONE variance definition rendered for the Welch, MDE (Nil
    * keys) AND group-sequential (keyed by look) oracles, mirroring the
    * keyed EventOps.welchMomentsOf seam. Ends in `wde`. */
  private def welchMomentsTail(keys: Seq[String]): String = {
    val kc = keys.map(k => s"$k, ").mkString
    val grpA = (1 to keys.size + 1).mkString(", ")
    val pivotGrp = if (keys.isEmpty) "" else " GROUP BY " + keys.mkString(", ")
    s"""a AS (SELECT ${kc}user_id % 2 AS arm, count(*) AS n, sum(y) AS sy, sum(y * y) AS syy
      |      FROM pu GROUP BY $grpA),
      |m AS (SELECT ${kc}arm, n,
      |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
      |        CASE WHEN n > 1 THEN
      |          (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
      |            / (CAST(n AS DOUBLE) - 1.0) END AS var_y
      |      FROM a),
      |wde AS (SELECT ${kc}max(CASE WHEN arm = 0 THEN n END) AS n0, max(CASE WHEN arm = 1 THEN n END) AS n1,
      |         max(CASE WHEN arm = 0 THEN mean_y END) AS mean0, max(CASE WHEN arm = 1 THEN mean_y END) AS mean1,
      |         max(CASE WHEN arm = 0 THEN var_y END) AS v0, max(CASE WHEN arm = 1 THEN var_y END) AS v1
      |       FROM m$pivotGrp)""".stripMargin
  }

  private val welchMomentsCtes: String =
    s"""pu AS (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      |            FROM events GROUP BY user_id),
      |${welchMomentsTail(Nil)}""".stripMargin

  /** Decontamination oracles — single source shared by the string-keyed
    * operators and their digest-keyed 100 TB twins (the digest re-keys
    * the broadcast index only; output rows are identical barring a
    * ~n²/2¹²⁹ collision, so the twins must not drift apart in SQL). */
  private def decontamOracle: String =
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      |              WHERE len(string_split(text, ' ')) >= ${PretrainOps.ContamGram}),
      |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - ${PretrainOps.ContamGram - 1}),
      |            i -> array_to_string(list_slice(t, i, i + ${PretrainOps.ContamGram - 1}), ' ')))) AS g FROM toks),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % ${PretrainOps.BenchMod} = 0),
      |hits AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_shared
      |         FROM grams JOIN bench USING (g) WHERE doc_id % ${PretrainOps.BenchMod} <> 0 GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id, coalesce(h.n_shared, 0) AS n_shared,
      |       coalesce(h.n_shared, 0) > 0 AS contaminated
      |FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
      |WHERE t.doc_id % ${PretrainOps.BenchMod} <> 0
      |ORDER BY doc_id""".stripMargin

  private def contamScoreOracle: String =
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      |              WHERE len(string_split(text, ' ')) >= ${PretrainOps.ContamGram}),
      |gsets AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - ${PretrainOps.ContamGram - 1}),
      |            i -> array_to_string(list_slice(t, i, i + ${PretrainOps.ContamGram - 1}), ' '))) AS gs FROM toks),
      |grams AS (SELECT doc_id, unnest(gs) AS g FROM gsets),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % ${PretrainOps.BenchMod} = 0),
      |hits AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_shared
      |         FROM grams JOIN bench USING (g) WHERE doc_id % ${PretrainOps.BenchMod} <> 0 GROUP BY doc_id)
      |SELECT s.doc_id AS doc_id, CAST(len(s.gs) AS INTEGER) AS n_grams,
      |       coalesce(h.n_shared, 0) AS n_shared,
      |       CAST(coalesce(h.n_shared, 0) AS DOUBLE) / len(s.gs) AS contam_frac
      |FROM gsets s LEFT JOIN hits h ON s.doc_id = h.doc_id
      |WHERE s.doc_id % ${PretrainOps.BenchMod} <> 0
      |ORDER BY doc_id""".stripMargin

  private def cdcChunkCtes: String =
    """d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |b AS (SELECT doc_id, t, len(t) AS n,
      |        list_filter(generate_series(4, len(t)),
      |          i -> CAST(('0x' || substr(md5(array_to_string(t[i-3:i], ' ')), 1, 5)) AS BIGINT) % 8 = 0) AS cuts
      |      FROM d),
      |e AS (SELECT doc_id, t, n,
      |        CASE WHEN len(cuts) > 0 AND cuts[len(cuts)] = n THEN cuts
      |             ELSE list_append(cuts, n) END AS ends
      |      FROM b),
      |u AS (SELECT doc_id, t, ends, unnest(generate_series(1, len(ends))) AS j FROM e),
      |s AS (SELECT doc_id, t, ends, j,
      |        CASE WHEN j = 1 THEN 1 ELSE ends[CAST(j - 1 AS INTEGER)] + 1 END AS sp
      |      FROM u)""".stripMargin

  /** CDC pair-generation CTE chain on top of [[cdcChunkCtes]] (through
    * `pr` = doc pairs with shared-eligible-chunk counts and `cnt` =
    * per-doc eligible totals) — shared by the pair dump and the
    * survivor oracle. */
  private def cdcPairCtes: String =
    s"""$cdcChunkCtes,
      |ch AS (SELECT DISTINCT doc_id,
      |         md5(array_to_string(t[CAST(sp AS INTEGER):CAST(ends[CAST(j AS INTEGER)] AS INTEGER)], ' ')) AS digest
      |       FROM s),
      |fr AS (SELECT digest, count(*) AS n_docs FROM ch GROUP BY digest),
      |kp AS (SELECT ch.doc_id, ch.digest FROM ch JOIN fr USING (digest)
      |       WHERE fr.n_docs <= 50),
      |cnt AS (SELECT doc_id, count(*) AS n_chunks FROM kp GROUP BY doc_id),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |       FROM kp a JOIN kp b ON a.digest = b.digest AND a.doc_id < b.doc_id
      |       GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** LLM-training-data pipeline extensions (BASELINE.json north star):
    * dedup, similarity search, text analysis, multimodal columns.
    * Engine-internal hashes/heuristics (minhash, simhash, lsh, langid,
    * fingerprint) have no SQL oracle → rows-only driver check; their
    * semantics are pinned by the unit suite instead. */
  /** Mann–Whitney rank-machinery CTE chain (through `a` = the 1-row
    * integer core n0/n1/r1x2/ties) — shared by the U/z test and the
    * Cliff's-delta effect size. Mirrors EventOps.mwAggregates. */
  private def mwCtes: String =
    """pu AS (SELECT user_id % 2 AS arm,
      |              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      |            FROM events GROUP BY user_id),
      |f AS (SELECT y, CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |      FROM pu GROUP BY y),
      |r AS (SELECT c0, c1,
      |        CAST(coalesce(sum(c0 + c1) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
      |      FROM f),
      |a AS (SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
      |        CAST(sum(c1 * (cb * 2 + c0 + c1 + 1)) AS BIGINT) AS r1x2,
      |        CAST(sum((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1)) AS BIGINT) AS ties
      |      FROM r)""".stripMargin

  /** Full monthly-aggregate oracle over the weather fixture — shared
    * verbatim by a1_weather_monthly (in-memory) and a6_weather_overwrite
    * (the twice-written store read back): the idempotence claim IS that
    * both satisfy the same SQL. */
  private def weatherMonthlyOracle: String =
    s"""WITH ${graft.weather.WeatherFidelity.derivedEnrichedSql}
      |SELECT city, date_trunc('month', date) AS month,
      |       CAST(avg(temperatureC) AS REAL) AS avg_temp_c,
      |       CAST(sum(rainfallMm) AS REAL) AS total_rain_mm,
      |       TIMESTAMP '2024-02-01 00:00:00' AS warehouse_load_time,
      |       CAST(count(*) AS INTEGER) AS rows_loaded,
      |       'incremental' AS load_mode,
      |       CAST(0 AS INTEGER) AS sync_interval_min
      |FROM dw GROUP BY city, date_trunc('month', date)
      |ORDER BY month, city""".stripMargin

  /** The serving entries' warehouse-side CTE (`ma`) — the monthly
    * aggregate columns a ServingCache read exposes, shared by the
    * partial-TTL and expired-TTL bindings. */
  private def weatherMaCte: String =
    """ma AS (SELECT city, date_trunc('month', date) AS month,
      |              CAST(avg(temperatureC) AS REAL) AS avg_temp_c,
      |              CAST(sum(rainfallMm) AS REAL) AS total_rain_mm,
      |              TIMESTAMP '2024-02-01 00:00:00' AS warehouse_load_time
      |       FROM dw GROUP BY 1, 2)""".stripMargin

  /** Shared pre/post per-user cent CTE (`pu`) — mirrors
    * `EventOps.prePostPerUser` (one cutoff, one cent currency) so the
    * CUPED and DiD oracles cannot drift on what pre/post mean. */
  private def abPrePostCte: String =
    s"""pu AS (
      |  SELECT user_id,
      |         CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '${EventOps.CupedCutoff}'
      |           THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0) AS BIGINT) AS x,
      |         CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '${EventOps.CupedCutoff}'
      |           THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0) AS BIGINT) AS y
      |  FROM events GROUP BY user_id)""".stripMargin

  /** Shared preference-contest CTE chain (uc → con → rel), generated
    * from PrefOps' static item alphabet so Spark and the oracle can
    * never disagree on the pair list or the fold order. `rel` is the
    * both-orientation decided-pair relation (i, j, w = i's wins, n). */
  private def prefCtes: String = {
    val cnt = PrefOps.Items.map(t =>
      s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS $t")
      .mkString(",\n               ")
    val blocks = PrefOps.Pairs.map { case (a, b) =>
      s"""  SELECT '$a' AS i, '$b' AS j,
         |         CAST(sum(CASE WHEN $a > $b THEN 1 ELSE 0 END) AS BIGINT) AS w_i,
         |         CAST(sum(CASE WHEN $b > $a THEN 1 ELSE 0 END) AS BIGINT) AS w_j
         |  FROM uc""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""uc AS (SELECT user_id, $cnt
       |       FROM events GROUP BY user_id),
       |con AS (
       |$blocks
       |),
       |rel AS (SELECT i, j, w_i AS w, w_i + w_j AS n FROM con WHERE w_i + w_j > 0
       |        UNION ALL
       |        SELECT j, i, w_j, w_i + w_j FROM con WHERE w_i + w_j > 0)""".stripMargin
  }

  /** One Bradley–Terry MM round as a CTE: strengths `prev` → `name`.
    * The denominator is the same fixed left-associated item-order fold
    * the Spark side computes (graft.ops.PrefOps.bradleyTerry). */
  private def btRound(name: String, prev: String): String = {
    val terms = PrefOps.Items.map(t =>
      s"coalesce(max(CASE WHEN r.j = '$t' THEN CAST(r.n AS DOUBLE) / (a.p + b.p) END), 0.0)")
      .mkString("\n            + ")
    s"""$name AS (SELECT r.i AS t,
       |         CAST(w.wins AS DOUBLE) /
       |           ($terms) AS p
       |       FROM rel r JOIN $prev a ON r.i = a.t JOIN $prev b ON r.j = b.t
       |            JOIN w ON r.i = w.i
       |       GROUP BY r.i, w.wins)""".stripMargin
  }

  val extensions: Seq[GraftQuery] = Seq(
    GraftQuery("x_text_tokens", TextOps.tokenStats, Some(
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER) AS n_bpe_tokens,
        |       CAST(length(text) AS INTEGER) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // tokenizer fertility per language: BPE tokens per whitespace word
    // + chars per BPE token — exact sums, two single divisions
    GraftQuery("x_text_fertility", TextOps.tokenizerFertility, Some(
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))) AS BIGINT) AS bpe_tokens,
        |       CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))) AS DOUBLE)
        |         / sum(len(string_split(text, ' '))) AS fertility,
        |       CAST(sum(length(text)) AS DOUBLE)
        |         / sum(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]'))) AS chars_per_bpe
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),
    GraftQuery("x_event_funnel", EventOps.funnelStages, Some(
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT v.user_id,
        |       1 + CAST(c.user_id IS NOT NULL AS INTEGER)
        |         + CAST(p.user_id IS NOT NULL AS INTEGER) AS stage
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin)),
    // Nelson–Aalen cumulative churn hazard over right-censored user
    // lifetimes: hazard increments are floor(1e12·d/n) in INTEGRAL
    // division, the running sum is exact int64 — a value-oracled
    // survival curve (the float KM product never could be)
    GraftQuery("x_event_survival", EventOps.survivalHazard, Some(
      s"""WITH sp AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
        |            FROM events GROUP BY user_id),
        |se AS (SELECT max(last_ts) AS study_end FROM sp),
        |lv AS (SELECT CAST(date_diff('day', CAST(first_ts AS DATE), CAST(last_ts AS DATE)) AS BIGINT) AS t_days,
        |              CASE WHEN last_ts < study_end - INTERVAL ${graft.ops.EventOps.ChurnHorizonDays} DAY
        |                   THEN 1 ELSE 0 END AS churned
        |       FROM sp CROSS JOIN se),
        |fr AS (SELECT t_days, CAST(sum(churned) AS BIGINT) AS d,
        |              CAST(sum(1 - churned) AS BIGINT) AS c
        |       FROM lv GROUP BY t_days),
        |tt AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_total FROM fr),
        |nr AS (SELECT t_days, d, c,
        |         n_total - CAST(coalesce(sum(d + c) OVER (ORDER BY t_days
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |       FROM fr CROSS JOIN tt),
        |hz AS (SELECT t_days, n_risk, d AS d_churn, c AS c_censored,
        |         (d * 1000000000000) // n_risk AS hazard_micro
        |       FROM nr WHERE d > 0)
        |SELECT t_days, n_risk, d_churn, c_censored, hazard_micro,
        |       CAST(sum(hazard_micro) OVER (ORDER BY t_days
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_hazard_micro
        |FROM hz ORDER BY t_days""".stripMargin)),
    GraftQuery("x_event_retention", EventOps.retentionCohorts, Some(
      """WITH um AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS activity_day
        |            FROM events),
        |co AS (SELECT user_id, min(activity_day) AS cohort_day FROM um GROUP BY user_id)
        |SELECT co.cohort_day, um.activity_day,
        |       CAST(date_diff('day', co.cohort_day, um.activity_day) AS INTEGER)
        |         AS day_offset,
        |       count(*) AS n_users
        |FROM um JOIN co USING (user_id)
        |GROUP BY co.cohort_day, um.activity_day
        |ORDER BY cohort_day, activity_day""".stripMargin)),
    // first-order journey transitions: the secondary-sort pass (no
    // per-user window frame), counted over the |types|² pair domain
    GraftQuery("x_event_transitions", EventOps.eventTransitions, Some(
      """WITH s AS (SELECT user_id, event_type,
        |             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |           FROM events)
        |SELECT event_type AS prev_type, nxt AS next_type, count(*) AS n
        |FROM s WHERE nxt IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
    // EWMA recurrence (α = 1/2): every step is one IEEE add + an exact
    // halving, and the oracle's recursive CTE replays the identical
    // operation sequence in the identical per-user order → bit-equal
    // doubles without a decimal detour. Spark side is the secondary-sort
    // pattern: one exchange, O(1) state per partition, no window.
    GraftQuery("x_ts_ewma", EventOps.ewmaSmooth, Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, value, rn, value AS ewma FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.value, e.rn, (e.value + s.ewma) / 2
        |  FROM e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, event_id, value, ewma FROM s
        |ORDER BY user_id, event_id""".stripMargin)),
    // Holt linear smoothing (α = β = 1/2): additions + exact halvings
    // replayed by the recursive CTE in identical order → bit-equal
    GraftQuery("x_ts_holt", EventOps.holtSmooth, Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, value, rn, value AS level,
        |         CAST(0.0 AS DOUBLE) AS trend
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.value, e.rn,
        |         (e.value + (s.level + s.trend)) / 2,
        |         (((e.value + (s.level + s.trend)) / 2 - s.level) + s.trend) / 2
        |  FROM e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, event_id, value, level, trend FROM s
        |ORDER BY user_id, event_id""".stripMargin)),
    // additive Holt-Winters (α = β = γ = 1/2, daily period) over the
    // dense hourly series: the 24-slot seasonal state rides through the
    // recursive CTE as a LIST column, updated by slice-concat — the
    // identical dyadic-halving sequence as the Spark fold → bit-equal
    GraftQuery("x_ts_holt_winters", EventOps.holtWintersHourly, Some(
      s"""WITH RECURSIVE $hwRecursiveCtes
        |SELECT event_type, t, CAST(x AS BIGINT) AS x, level, trend, snew AS seasonal,
        |       pred, resid
        |FROM r ORDER BY event_type, t""".stripMargin)),
    // offline single changepoint (binary-segmentation base step):
    // argmax |S_tau| cross-multiplied to exact int64 |n·P − c·T|,
    // earliest-hour tie-break, segment means in integral micro-units
    GraftQuery("x_ts_changepoint", EventOps.changepointHourly, Some(
      s"""WITH $hourlySpineCtes,
        |pc AS (SELECT event_type, t, x,
        |         CAST(sum(x) OVER (PARTITION BY event_type ORDER BY t) AS BIGINT) AS p,
        |         CAST(count(*) OVER (PARTITION BY event_type ORDER BY t) AS BIGINT) AS c
        |       FROM hs),
        |tt AS (SELECT event_type, CAST(sum(x) AS BIGINT) AS tt,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM hs GROUP BY 1),
        |sc AS (SELECT pc.event_type, t, p, c, tt.tt, tt.n,
        |         abs(n * p - c * tt) AS score
        |       FROM pc JOIN tt ON pc.event_type = tt.event_type
        |       WHERE c < n),
        |top AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |                    ORDER BY score DESC, t) AS rn
        |        FROM sc)
        |SELECT event_type, CAST(t AS BIGINT) AS tau, n AS n_hours, score,
        |       (p * 1000000000000) // c AS mean_before_micro,
        |       ((tt - p) * 1000000000000) // (n - c) AS mean_after_micro,
        |       ((tt - p) * 1000000000000) // (n - c)
        |         - (p * 1000000000000) // c AS shift_micro
        |FROM top WHERE rn = 1 ORDER BY event_type""".stripMargin)),
    // split-conformal band on the Holt-Winters residuals: q_hat is the
    // ceil(0.9·(n_cal+1))-th smallest calibration |resid| (integer rank
    // arithmetic), coverage the exact hold-out fraction inside the band
    GraftQuery("x_ts_conformal", EventOps.conformalCoverage, Some(
      s"""WITH RECURSIVE $hwRecursiveCtes,
        |a AS (SELECT event_type, t, abs(resid) AS s FROM r),
        |cal AS (SELECT event_type, s FROM a WHERE t < ${graft.ops.EventOps.ConformalCalHours}),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1),
        |rk AS (SELECT event_type, s,
        |         row_number() OVER (PARTITION BY event_type ORDER BY s) AS rn
        |       FROM cal),
        |qh AS (SELECT rk.event_type, n.n_cal, rk.s AS q_hat
        |       FROM rk JOIN n ON rk.event_type = n.event_type
        |       WHERE rk.rn = (9 * (n.n_cal + 1) + 9) // 10),
        |ev AS (SELECT a.event_type, qh.n_cal, qh.q_hat,
        |         CAST(count(*) AS BIGINT) AS n_eval,
        |         CAST(sum(CASE WHEN a.s <= qh.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |       FROM a JOIN qh ON a.event_type = qh.event_type
        |       WHERE a.t >= ${graft.ops.EventOps.ConformalCalHours}
        |       GROUP BY a.event_type, qh.n_cal, qh.q_hat)
        |SELECT event_type, n_cal, q_hat, n_eval, n_covered,
        |       CAST(n_covered AS DOUBLE) / CAST(n_eval AS DOUBLE) AS coverage
        |FROM ev ORDER BY event_type""".stripMargin)),
    // interval union (temporal coverage): 30-min event windows merge by
    // the running-max-end sweep; epoch-µs integers end to end
    GraftQuery("x_ts_interval_union", EventOps.intervalUnion, Some(
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |              epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
        |            FROM events),
        |g AS (SELECT user_id, event_id, s, e,
        |        CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             THEN 1 ELSE 0 END AS ng
        |      FROM ev),
        |g2 AS (SELECT user_id, s, e,
        |         sum(ng) OVER (PARTITION BY user_id ORDER BY s, event_id) AS gid
        |       FROM g)
        |SELECT user_id, CAST(gid AS INTEGER) AS interval_idx,
        |       make_timestamp(min(s)) AS start_ts,
        |       make_timestamp(max(e)) AS end_ts,
        |       CAST(count(*) AS INTEGER) AS n_events
        |FROM g2 GROUP BY user_id, gid ORDER BY user_id, interval_idx""".stripMargin)),
    GraftQuery("x_ts_coverage", EventOps.intervalCoverage, Some(
      """WITH ev AS (SELECT user_id, event_id,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |              epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
        |            FROM events),
        |g AS (SELECT user_id, event_id, s, e,
        |        CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |               OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             THEN 1 ELSE 0 END AS ng
        |      FROM ev),
        |g2 AS (SELECT user_id, s, e,
        |         sum(ng) OVER (PARTITION BY user_id ORDER BY s, event_id) AS gid
        |       FROM g),
        |m AS (SELECT user_id, gid, min(s) AS s0, max(e) AS e0, count(*) AS n
        |      FROM g2 GROUP BY user_id, gid)
        |SELECT user_id, CAST(count(*) AS INTEGER) AS n_intervals,
        |       CAST(sum(n) AS INTEGER) AS n_events,
        |       CAST(sum(e0 - s0) // 1000000 AS BIGINT) AS covered_s
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),
    // forecast-based anomaly flags: |one-step-ahead residual| > 3σ from
    // the exact integer moments — sqrt and division are single IEEE ops,
    // so the boolean row set hash-matches
    GraftQuery("x_ts_hw_anomaly", EventOps.hwAnomaly, Some(
      s"""WITH RECURSIVE $hourlySpineCtes,
        |r AS (
        |  SELECT event_type, t, x,
        |         CAST(x AS DOUBLE) AS level,
        |         CAST(0.0 AS DOUBLE) AS trend,
        |         CAST(x AS DOUBLE) AS pred,
        |         CAST(0.0 AS DOUBLE) AS resid,
        |         list_transform(generate_series(1, 24), i -> CAST(0.0 AS DOUBLE)) AS seas
        |  FROM hs WHERE t = 0
        |  UNION ALL
        |  SELECT event_type, t, x, lvl,
        |         ((lvl - plevel) + ptrend) / 2,
        |         (plevel + ptrend) + pseas,
        |         x - ((plevel + ptrend) + pseas),
        |         seas0[1:j-1] || [((x - lvl) + pseas) / 2] || seas0[j+1:24]
        |  FROM (SELECT h.event_type, h.t, h.x,
        |               r.level AS plevel, r.trend AS ptrend, r.seas AS seas0,
        |               (h.t % 24) + 1 AS j,
        |               r.seas[(h.t % 24) + 1] AS pseas,
        |               ((h.x - r.seas[(h.t % 24) + 1]) + (r.level + r.trend)) / 2 AS lvl
        |        FROM hs h JOIN r ON h.event_type = r.event_type AND h.t = r.t + 1)),
        |st AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |              CAST(sum(x*x) AS BIGINT) AS sxx
        |       FROM hs GROUP BY event_type)
        |SELECT r.event_type, r.t, CAST(r.x AS BIGINT) AS x, r.pred, r.resid,
        |       abs(r.resid) > 3.0 * sqrt(CAST(st.n * st.sxx - st.sx * st.sx AS DOUBLE)) / st.n AS is_anomaly
        |FROM r JOIN st ON r.event_type = st.event_type
        |ORDER BY r.event_type, r.t""".stripMargin)),
    // exact lag-k autocorrelation: integer moments over the dense hour
    // spine, Pearson assembled in the same IEEE expression both sides
    GraftQuery("x_ts_acf", EventOps.acfHourly, Some(
      s"""WITH $spineHeadCtes,
        |s AS (SELECT spine.event_type,
        |             CAST(epoch(spine.hour_ts) AS BIGINT) // 3600
        |               - CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT) // 3600 AS t,
        |             coalesce(c.c, 0) AS x
        |      FROM spine LEFT JOIN c ON spine.event_type = c.event_type AND spine.hour_ts = c.h),
        |p AS (SELECT a.event_type, CAST(b.t - a.t AS INTEGER) AS lag, a.x AS xa, b.x AS xb
        |      FROM s a JOIN s b ON a.event_type = b.event_type AND b.t - a.t BETWEEN 1 AND 3),
        |m AS (SELECT event_type, lag, count(*) AS n_pairs,
        |             CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
        |             CAST(sum(xa*xa) AS BIGINT) AS sxx, CAST(sum(xb*xb) AS BIGINT) AS syy,
        |             CAST(sum(xa*xb) AS BIGINT) AS sxy
        |      FROM p GROUP BY 1, 2)
        |SELECT event_type, lag, n_pairs, sx, sy, sxx, syy, sxy,
        |       CASE WHEN n_pairs*sxx - sx*sx > 0 AND n_pairs*syy - sy*sy > 0
        |            THEN CAST(n_pairs*sxy - sx*sy AS DOUBLE) /
        |                 (sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n_pairs*syy - sy*sy AS DOUBLE)))
        |            END AS acf
        |FROM m ORDER BY event_type, lag""".stripMargin)),
    // CUSUM changepoint statistic: exact integer counts, IEEE add/max
    // steps replayed in hour order by the recursive CTE → bit-equal
    GraftQuery("x_ts_cusum", EventOps.cusumCounts, Some(
      s"""WITH RECURSIVE $spineHeadCtes,
        |s AS (SELECT spine.event_type,
        |             CAST(epoch(spine.hour_ts) AS BIGINT) // 3600
        |               - CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT) // 3600 + 1 AS rn,
        |             spine.hour_ts, coalesce(c.c, 0) AS x
        |      FROM spine LEFT JOIN c ON spine.event_type = c.event_type AND spine.hour_ts = c.h),
        |tg AS (SELECT event_type, CAST(sum(x) AS DOUBLE) / 720 AS target FROM s GROUP BY 1),
        |r AS (
        |  SELECT s.event_type, s.rn, s.hour_ts, s.x,
        |         greatest(CAST(0 AS DOUBLE), s.x - tg.target) AS cusum
        |  FROM s JOIN tg USING (event_type) WHERE s.rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.rn, s.hour_ts, s.x,
        |         greatest(CAST(0 AS DOUBLE), r.cusum + (s.x - tg.target))
        |  FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
        |  JOIN tg ON tg.event_type = s.event_type)
        |SELECT r.event_type, r.hour_ts, r.x, r.cusum,
        |       r.cusum > 5 * sqrt(tg.target) AS alarm
        |FROM r JOIN tg USING (event_type)
        |ORDER BY event_type, hour_ts""".stripMargin)),
    // median/MAD robust bands: discrete medians are actual data values,
    // deviations and the flag comparison exact → fully hash-oracled
    GraftQuery("x_event_anomaly_mad", EventOps.anomalyMad, Some(
      """WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS med
        |             FROM events GROUP BY 1),
        |d AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |             abs(e.value - m.med) AS dev
        |      FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, med, quantile_disc(dev, 0.5) AS mad
        |        FROM d GROUP BY 1, 2)
        |SELECT d.event_id, d.event_type, d.value, mad.med, mad.mad,
        |       CASE WHEN mad.mad > 0 THEN d.dev / mad.mad END AS score
        |FROM d JOIN mad ON d.event_type = mad.event_type
        |WHERE d.dev > 5 * mad.mad
        |ORDER BY event_id""".stripMargin)),
    GraftQuery("x_event_anomaly", EventOps.anomalyZscore, Some(
      """WITH s AS (
        |  SELECT event_type AS et,
        |         CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS mean_v,
        |         sqrt((CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |               - CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE))
        |              / (CAST(count(value) AS DOUBLE) - 1.0)) AS stddev_v
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value, (value - mean_v) / stddev_v AS zscore
        |FROM events JOIN s ON event_type = et
        |WHERE abs((value - mean_v) / stddev_v) > 2.0
        |ORDER BY event_id""".stripMargin)),
    GraftQuery("x_event_winsorize", EventOps.winsorize, Some(
      """WITH b AS (
        |  SELECT event_type AS et,
        |         quantile_cont(value, 0.05) AS p_lo,
        |         quantile_cont(value, 0.95) AS p_hi
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value,
        |       least(greatest(value, p_lo), p_hi) AS value_clipped
        |FROM events JOIN b ON event_type = et
        |ORDER BY event_id""".stripMargin)),
    // CUPED variance reduction: per-user pre/post cent sums and the
    // pooled moments are exact int64; θ and the adjusted means are a
    // fixed IEEE double sequence on those integers — replayed verbatim,
    // so the experimentation readout hash-matches (no transcendentals)
    GraftQuery("x_ab_cuped", EventOps.abCuped, headline = true, oracle = Some(
      s"""WITH $abPrePostCte,
        |p AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |             CAST(sum(y) AS BIGINT) AS sy,
        |             CAST(sum(x * x) AS BIGINT) AS sxx,
        |             CAST(sum(x * y) AS BIGINT) AS sxy
        |      FROM pu),
        |t AS (SELECT n, sx,
        |             coalesce((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |                      / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0),
        |                      0.0) AS theta
        |      FROM p),
        |a AS (SELECT user_id % 2 AS arm, count(*) AS n_users,
        |             CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
        |      FROM pu GROUP BY 1)
        |SELECT arm, n_users,
        |       CAST(sya AS DOUBLE) / 100.0 / n_users AS mean_y,
        |       CAST(sya AS DOUBLE) / 100.0 / n_users
        |         - theta * (CAST(sxa AS DOUBLE) / 100.0 / n_users
        |                    - CAST(sx AS DOUBLE) / 100.0 / n) AS mean_y_cuped,
        |       theta
        |FROM a CROSS JOIN t ORDER BY arm""".stripMargin)),
    // Welch t on the per-user metric: exact decimal moments, then a
    // fixed IEEE tree for mean/var/t/df (sqrt is the only root)
    GraftQuery("x_ab_welch", EventOps.abWelch, Some(
      s"""WITH $welchMomentsCtes,
        |s AS (SELECT n0, n1, mean0, mean1,
        |        v0 / CAST(n0 AS DOUBLE) AS se0, v1 / CAST(n1 AS DOUBLE) AS se1 FROM wde)
        |SELECT n0, n1, mean0, mean1, mean0 - mean1 AS diff,
        |       CASE WHEN se0 + se1 > 0 THEN (mean0 - mean1) / sqrt(se0 + se1) END AS t_stat,
        |       CASE WHEN se0 + se1 > 0 THEN ((se0 + se1) * (se0 + se1))
        |         / ((se0 * se0) / (CAST(n0 AS DOUBLE) - 1.0) + (se1 * se1) / (CAST(n1 AS DOUBLE) - 1.0)) END AS df
        |FROM s""".stripMargin)),
    // Minimum detectable effect at (α=0.05 two-sided, 80% power) on
    // the SAME per-arm moment core as the Welch t — exact z literals,
    // staged subexpressions (se_diff → mde_abs) identical in both
    // engines so the powered flag cannot sit on a rounding boundary
    GraftQuery("x_ab_mde", EventOps.abMde, Some(
      s"""WITH $welchMomentsCtes,
        |s AS (SELECT n0, n1, mean0, mean1,
        |        v0 / CAST(n0 AS DOUBLE) AS se0, v1 / CAST(n1 AS DOUBLE) AS se1 FROM wde),
        |t AS (SELECT n0, n1, mean0, mean1, sqrt(se0 + se1) AS se_diff FROM s),
        |u AS (SELECT n0, n1, mean0, mean1, se_diff,
        |        (${EventOps.ZAlphaHalf} + ${EventOps.ZBeta80}) * se_diff AS mde_abs FROM t)
        |SELECT n0, n1, mean0, mean1, se_diff, mde_abs,
        |       CASE WHEN mean0 <> 0.0 THEN mde_abs / abs(mean0) END AS mde_rel,
        |       mean0 - mean1 AS diff,
        |       abs(mean0 - mean1) >= mde_abs AS powered
        |FROM u""".stripMargin)),
    // group-sequential monitor: the Welch z at 5 equally-spaced
    // event-time cuts (exact integer µs arithmetic) vs O'Brien–Fleming
    // boundaries C·√(K/k) — the peeking-corrected early-stop readout;
    // same keyed moment tree as the Welch/MDE seam
    GraftQuery("x_ab_sequential", EventOps.abSequential, Some(
      s"""WITH ev AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |sp AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
        |lk(look) AS (VALUES (1),(2),(3),(4),(5)),
        |pu AS (SELECT look, user_id, CAST(sum(v) AS DECIMAL(18,2)) AS y
        |       FROM ev CROSS JOIN sp CROSS JOIN lk
        |       WHERE us <= t0 + ((t1 - t0) * look) // ${EventOps.SeqLooks}
        |       GROUP BY 1, 2),
        |${welchMomentsTail(Seq("look"))},
        |r AS (SELECT look, n0, n1, mean0 - mean1 AS diff,
        |        CASE WHEN v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE) > 0
        |             THEN (mean0 - mean1)
        |                  / sqrt(v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)) END AS z,
        |        ${EventOps.ObfC} * sqrt(${EventOps.SeqLooks}.0 / look) AS boundary
        |      FROM wde)
        |SELECT look, n0, n1, diff, z, boundary, abs(z) > boundary AS crossed
        |FROM r ORDER BY look""".stripMargin)),
    // Sample-ratio-mismatch guard: χ²(1) on the realized arm split
    GraftQuery("x_ab_srm", EventOps.abSrm, Some(
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM u),
        |e AS (SELECT n0, n1, (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) / 2.0 AS e FROM c),
        |x AS (SELECT n0, n1,
        |        ((CAST(n0 AS DOUBLE) - e) * (CAST(n0 AS DOUBLE) - e)) / e
        |          + ((CAST(n1 AS DOUBLE) - e) * (CAST(n1 AS DOUBLE) - e)) / e AS chi2 FROM e)
        |SELECT n0, n1, chi2, chi2 > 3.841 AS srm_flag FROM x""".stripMargin)),
    // Mann–Whitney U: tied ranks from the value-frequency table (no
    // row-level ranking), exact doubled rank sums, fixed IEEE z
    GraftQuery("x_ab_mannwhitney", EventOps.abMannWhitney, Some(
      s"""WITH $mwCtes,
        |s AS (SELECT n0, n1,
        |        (CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1,
        |        CAST(ties AS DOUBLE) AS tie_d,
        |        CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) AS nd
        |      FROM a)
        |SELECT n0, n1, u1,
        |       (u1 - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
        |         / sqrt((CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0)
        |                * ((nd + 1.0) - tie_d / (nd * (nd - 1.0)))) AS z
        |FROM s""".stripMargin)),
    // Cliff's delta effect size off the SAME rank core: fully-integer
    // numerator (r1x2 − n1(n1+1) − n0·n1), one division; Romano bands
    // as identical decimal literals — the "should anyone care" column
    // next to the z-test's "is it noise"
    GraftQuery("x_ab_cliffs_delta", EventOps.abCliffsDelta, Some(
      s"""WITH $mwCtes,
        |d AS (SELECT n0, n1,
        |        CAST(r1x2 - n1 * (n1 + 1) - n0 * n1 AS DOUBLE)
        |          / CAST(n0 * n1 AS DOUBLE) AS delta
        |      FROM a)
        |SELECT n0, n1, delta,
        |       CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |            WHEN abs(delta) < 0.33 THEN 'small'
        |            WHEN abs(delta) < 0.474 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM d""".stripMargin)),
    // Difference-in-differences on the shared pre/post cent currency
    GraftQuery("x_ab_did", EventOps.abDid, Some(
      s"""WITH $abPrePostCte,
        |a AS (SELECT user_id % 2 AS arm, count(*) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
        |      FROM pu GROUP BY 1),
        |m AS (SELECT arm, CAST(sx AS DOUBLE) / 100.0 / n AS mean_pre,
        |             CAST(sy AS DOUBLE) / 100.0 / n AS mean_post FROM a),
        |w AS (SELECT max(CASE WHEN arm = 0 THEN mean_pre END) AS pre0,
        |             max(CASE WHEN arm = 0 THEN mean_post END) AS post0,
        |             max(CASE WHEN arm = 1 THEN mean_pre END) AS pre1,
        |             max(CASE WHEN arm = 1 THEN mean_post END) AS post1
        |      FROM m)
        |SELECT pre0, post0, post0 - pre0 AS delta0,
        |       pre1, post1, post1 - pre1 AS delta1,
        |       (post1 - pre1) - (post0 - pre0) AS did
        |FROM w""".stripMargin)),
    // Poisson bootstrap CI for the arm-mean difference: deterministic
    // md5-derived Poisson(1) weights per (user, replicate) through the
    // literal integer CDF thresholds — the reshuffle-free bootstrap, and
    // because the draws are content-hashed the whole CI is value-oracled
    GraftQuery("x_ab_bootstrap", EventOps.abBootstrap, Some {
      val wCase = "CASE " + EventOps.PoisCdfMicro.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }.mkString(" ") +
        s" ELSE ${EventOps.PoisCdfMicro.size} END"
      val b = EventOps.BootstrapB
      s"""WITH pu AS (SELECT user_id,
        |              CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
        |            FROM events GROUP BY user_id),
        |r AS (SELECT user_id, y, unnest(range($b)) AS rep FROM pu),
        |h AS (SELECT user_id, y, rep,
        |        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS u
        |      FROM r),
        |p AS (SELECT user_id % 2 AS arm, rep, y, $wCase AS w FROM h),
        |c AS (SELECT rep, arm, CAST(sum(w) AS BIGINT) AS n,
        |             CAST(sum(w * y) AS BIGINT) AS s
        |      FROM p GROUP BY rep, arm),
        |d AS (SELECT rep,
        |        coalesce(CAST(max(CASE WHEN arm = 0 THEN s END) AS DOUBLE)
        |                   / nullif(CAST(max(CASE WHEN arm = 0 THEN n END) AS DOUBLE), 0.0) / 100.0, 0.0)
        |      - coalesce(CAST(max(CASE WHEN arm = 1 THEN s END) AS DOUBLE)
        |                   / nullif(CAST(max(CASE WHEN arm = 1 THEN n END) AS DOUBLE), 0.0) / 100.0, 0.0) AS d
        |      FROM c GROUP BY rep),
        |bt AS (SELECT CAST(count(*) AS INTEGER) AS b, list_sort(list(d)) AS ds FROM d),
        |ea AS (SELECT user_id % 2 AS arm, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
        |       FROM pu GROUP BY 1),
        |e AS (SELECT CAST(coalesce(max(CASE WHEN arm = 0 THEN n END), 0)
        |               + coalesce(max(CASE WHEN arm = 1 THEN n END), 0) AS BIGINT) AS n_users,
        |        coalesce(CAST(max(CASE WHEN arm = 0 THEN sy END) AS DOUBLE)
        |          / nullif(CAST(max(CASE WHEN arm = 0 THEN n END) AS DOUBLE), 0.0) / 100.0, 0.0)
        |      - coalesce(CAST(max(CASE WHEN arm = 1 THEN sy END) AS DOUBLE)
        |          / nullif(CAST(max(CASE WHEN arm = 1 THEN n END) AS DOUBLE), 0.0) / 100.0, 0.0) AS est_diff
        |      FROM ea)
        |SELECT n_users, b, est_diff, ds[2] AS ci_lo, ds[${b - 1}] AS ci_hi,
        |       (ds[2] <= 0.0 AND ds[${b - 1}] >= 0.0) AS covers_zero
        |FROM e CROSS JOIN bt""".stripMargin
    }, headline = true),
    // Quantile treatment effects: exact per-arm discrete quartiles of
    // the per-user metric, double-cast, with arm-difference columns
    GraftQuery("x_ab_qte", EventOps.abQuantileEffect, Some(
      """WITH pu AS (SELECT user_id % 2 AS arm,
        |              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |            FROM events GROUP BY user_id),
        |qa AS (SELECT arm, quantile_disc(y, 0.25) AS p25, quantile_disc(y, 0.5) AS p50,
        |              quantile_disc(y, 0.75) AS p75
        |       FROM pu GROUP BY arm),
        |w AS (SELECT max(CASE WHEN arm = 0 THEN p25 END) AS q25_0, max(CASE WHEN arm = 1 THEN p25 END) AS q25_1,
        |             max(CASE WHEN arm = 0 THEN p50 END) AS q50_0, max(CASE WHEN arm = 1 THEN p50 END) AS q50_1,
        |             max(CASE WHEN arm = 0 THEN p75 END) AS q75_0, max(CASE WHEN arm = 1 THEN p75 END) AS q75_1
        |      FROM qa)
        |SELECT CAST(q25_0 AS DOUBLE) AS p25_0, CAST(q25_1 AS DOUBLE) AS p25_1,
        |       CAST(q25_1 AS DOUBLE) - CAST(q25_0 AS DOUBLE) AS qte25,
        |       CAST(q50_0 AS DOUBLE) AS p50_0, CAST(q50_1 AS DOUBLE) AS p50_1,
        |       CAST(q50_1 AS DOUBLE) - CAST(q50_0 AS DOUBLE) AS qte50,
        |       CAST(q75_0 AS DOUBLE) AS p75_0, CAST(q75_1 AS DOUBLE) AS p75_1,
        |       CAST(q75_1 AS DOUBLE) - CAST(q75_0 AS DOUBLE) AS qte75
        |FROM w""".stripMargin)),
    // Post-stratification: activity-quartile strata (exact discrete
    // percentiles), full-population weights, fixed 4-term IEEE fold
    GraftQuery("x_ab_poststrat", EventOps.abPostStrat, Some(
      """WITH pu AS (SELECT user_id, count(*) AS n_events,
        |              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |            FROM events GROUP BY user_id),
        |q AS (SELECT quantile_disc(n_events, 0.25) AS q1, quantile_disc(n_events, 0.5) AS q2,
        |             quantile_disc(n_events, 0.75) AS q3 FROM pu),
        |st AS (SELECT user_id % 2 AS arm, y,
        |         CASE WHEN n_events <= q1 THEN 0 WHEN n_events <= q2 THEN 1
        |              WHEN n_events <= q3 THEN 2 ELSE 3 END AS stratum
        |       FROM pu CROSS JOIN q),
        |pop AS (SELECT count(*) AS nt,
        |          CAST(sum(CASE WHEN stratum = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ns0,
        |          CAST(sum(CASE WHEN stratum = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ns1,
        |          CAST(sum(CASE WHEN stratum = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ns2,
        |          CAST(sum(CASE WHEN stratum = 3 THEN 1 ELSE 0 END) AS BIGINT) AS ns3
        |        FROM st),
        |a AS (SELECT arm, count(*) AS n_users, sum(y) AS sy,
        |        CAST(sum(CASE WHEN stratum = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, sum(CASE WHEN stratum = 0 THEN y END) AS sy0,
        |        CAST(sum(CASE WHEN stratum = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, sum(CASE WHEN stratum = 1 THEN y END) AS sy1,
        |        CAST(sum(CASE WHEN stratum = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2, sum(CASE WHEN stratum = 2 THEN y END) AS sy2,
        |        CAST(sum(CASE WHEN stratum = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3, sum(CASE WHEN stratum = 3 THEN y END) AS sy3
        |      FROM st GROUP BY arm)
        |SELECT arm, n_users, CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y,
        |       coalesce((CAST(ns0 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 0.0)
        |         + coalesce((CAST(ns1 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 0.0)
        |         + coalesce((CAST(ns2 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE)), 0.0)
        |         + coalesce((CAST(ns3 AS DOUBLE) / CAST(nt AS DOUBLE)) * (CAST(sy3 AS DOUBLE) / CAST(n3 AS DOUBLE)), 0.0) AS mean_y_ps
        |FROM a CROSS JOIN pop ORDER BY arm""".stripMargin)),
    // Pairwise preference mining: exact int64 contest counts from
    // per-judge engagement pivots; Wilson bound is a fixed IEEE tree
    GraftQuery("x_pref_winrate", PrefOps.winrate, Some(
      s"""WITH $prefCtes
        |SELECT i, j, w, n,
        |       CAST(w AS DOUBLE) / CAST(n AS DOUBLE) AS winrate,
        |       ((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) + (1.96 * 1.96) / (CAST(n AS DOUBLE) * 2.0)
        |         - 1.96 * sqrt(((CAST(w AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - (CAST(w AS DOUBLE) / CAST(n AS DOUBLE)))
        |                        + (1.96 * 1.96) / (CAST(n AS DOUBLE) * 4.0)) / CAST(n AS DOUBLE)))
        |         / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_lb
        |FROM rel ORDER BY i, j""".stripMargin)),
    // Bradley–Terry strengths: 3 unrolled MM rounds, each a CTE whose
    // denominator fold order is pinned to the static item order — the
    // one thing IEEE addition is sensitive to — on BOTH engines
    GraftQuery("x_pref_bradley_terry", PrefOps.bradleyTerry, Some(
      s"""WITH $prefCtes,
        |w AS (SELECT i, CAST(sum(w) AS BIGINT) AS wins, CAST(sum(n) AS BIGINT) AS games
        |      FROM rel GROUP BY i),
        |r0 AS (SELECT i AS t, 1.0 AS p FROM w),
        |${btRound("r1", "r0")},
        |${btRound("r2", "r1")},
        |${btRound("r3", "r2")}
        |SELECT w.i AS item, w.games, w.wins, r3.p AS strength
        |FROM w JOIN r3 ON w.i = r3.t ORDER BY item""".stripMargin)),
    GraftQuery("x_event_gapfill", EventOps.gapFillHourly, Some(
      """WITH spine AS (
        |  SELECT user_id, unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |                                         TIMESTAMP '2024-01-30 23:00:00',
        |                                         INTERVAL 1 HOUR)) AS hour_ts
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |hr AS (SELECT user_id AS u, date_trunc('hour', ts) AS hh,
        |              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS v
        |       FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT s.user_id AS user_id, s.hour_ts AS hour_ts,
        |       last_value(hr.v IGNORE NULLS) OVER (
        |         PARTITION BY s.user_id ORDER BY s.hour_ts
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |       hr.v IS NOT NULL AS is_observed
        |FROM spine s LEFT JOIN hr ON s.user_id = hr.u AND s.hour_ts = hr.hh
        |ORDER BY user_id, hour_ts""".stripMargin)),
    GraftQuery("x_text_boilerplate", PretrainOps.boilerplateStrip, Some(
      s"""WITH $paragraphCtes,
        |df AS (SELECT para, count(DISTINCT doc_id) AS df FROM p2 GROUP BY para),
        |kept AS (SELECT p2.* FROM p2 JOIN df USING (para) WHERE df.df < 2),
        |$paragraphRollupSql""".stripMargin)),
    // qvec rendered as CSV for the oracle hash: the driver's value compare
    // is proven on scalars; the operator itself returns the real int array.
    GraftQuery("x_embed_quantize", (s, d) => SimilarityOps.quantizeInt8(s, d)
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("qvec"),
          x => x.cast(org.apache.spark.sql.types.StringType)), ",")
          .as("qvec_csv")), Some(
      """WITH d AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        |           FROM embeddings),
        |s AS (SELECT vec_id, dv,
        |        list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
        |      FROM d)
        |SELECT vec_id, scale,
        |       array_to_string(
        |         CASE WHEN scale = 0
        |              THEN list_transform(dv, x -> 0)
        |              ELSE list_transform(dv, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
        |         END, ',') AS qvec_csv
        |FROM s ORDER BY vec_id""".stripMargin)),
    GraftQuery("x_text_quality_cut", TextOps.qualityCut, Some(
      s"""WITH s AS (SELECT doc_id, lang,
        |             $stopCountSql
        |               / len(string_split(text, ' ')) AS stop_ratio
        |           FROM documents),
        |m AS (SELECT lang, quantile_cont(stop_ratio, 0.5) AS lang_median
        |      FROM s GROUP BY lang)
        |SELECT doc_id, lang, stop_ratio, lang_median
        |FROM s JOIN m USING (lang)
        |WHERE stop_ratio <= lang_median
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_text_df_top", (s, d) => TextOps.termDf(s, d), Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term)
        |SELECT term, CAST(count(*) AS INTEGER) AS df
        |FROM tf GROUP BY term
        |ORDER BY df DESC, term LIMIT 50""".stripMargin)),
    // vocabulary-coverage curve: types kept vs token share per
    // frequency cutoff 2^0..2^10 — cutoff-parameterized so no global
    // vocabulary rank exists; exact int64 counts, one division per row
    GraftQuery("x_text_vocab_curve", TextOps.vocabCoverageCurve, Some(
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM tc),
        |g(theta) AS (VALUES (1),(2),(4),(8),(16),(32),(64),(128),(256),(512),(1024)),
        |a AS (SELECT g.theta,
        |        CAST(sum(CASE WHEN c >= g.theta THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
        |        CAST(coalesce(sum(CASE WHEN c >= g.theta THEN c END), 0) AS BIGINT) AS covered
        |      FROM tc CROSS JOIN g GROUP BY g.theta)
        |SELECT CAST(theta AS BIGINT) AS theta, n_terms, covered,
        |       CAST(covered AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM a CROSS JOIN tot ORDER BY theta""".stripMargin)),
    // token-level F1 over the verified near-dup pair set: clipped
    // overlap shares its numerator between precision and recall, so
    // F1 = 2o/(n_a+n_b) is one exact rational per pair; micro-F1 is
    // integer sums + one division — the SQuAD/generation-eval core
    GraftQuery("x_eval_token_f1", TextOps.pairTokenF1, Some(
      s"""WITH $trigramCtes,
        |$goodPairsCtes,
        |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |        FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |nt AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
        |ov AS (SELECT g.doc_a, g.doc_b, CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS overlap
        |       FROM good g JOIN tf a ON a.doc_id = g.doc_a
        |                   JOIN tf b ON b.doc_id = g.doc_b AND b.term = a.term
        |       GROUP BY 1, 2),
        |o AS (SELECT g.doc_a, g.doc_b, na.n AS n_a, nb.n AS n_b,
        |        coalesce(ov.overlap, 0) AS overlap
        |      FROM good g JOIN nt na ON na.doc_id = g.doc_a
        |                  JOIN nt nb ON nb.doc_id = g.doc_b
        |      LEFT JOIN ov ON ov.doc_a = g.doc_a AND ov.doc_b = g.doc_b),
        |t AS (SELECT CAST(sum(overlap) AS BIGINT) AS so,
        |        CAST(sum(n_a + n_b) AS BIGINT) AS sn FROM o)
        |SELECT doc_a, doc_b, n_a, n_b, overlap,
        |       CAST(overlap AS DOUBLE) / n_a AS p,
        |       CAST(overlap AS DOUBLE) / n_b AS r,
        |       CAST(overlap * 2 AS DOUBLE) / (n_a + n_b) AS f1,
        |       CAST(so * 2 AS DOUBLE) / sn AS micro_f1
        |FROM o CROSS JOIN t ORDER BY doc_a, doc_b""".stripMargin)),
    // vocabulary-richness panel (unigrams + 3-token shingles): TTR, the
    // Chao1 lower bound V + n1(n1−1)/(2(n2+1)) and Good–Turing unseen
    // mass n1/N — integer aggregates of the gram-frequency table, each
    // readout one fixed IEEE tree; both rows from ONE template
    GraftQuery("x_text_richness", TextOps.vocabRichness, Some(richnessOracle)),
    // vocabulary-coverage profile: per-doc OOV occurrences against the
    // deterministic top-V df vocabulary (V=16 bites on the 31-term
    // synthetic vocab; production V ~1e5, same plan)
    GraftQuery("x_text_oov", TextOps.oovProfile, Some(
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term),
        |vocab AS (SELECT term FROM (SELECT term, count(*) AS df FROM tf GROUP BY term
        |                            ORDER BY df DESC, term LIMIT ${TextOps.VocabSize})),
        |flag AS (SELECT t.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        |         FROM tok t LEFT JOIN vocab v ON t.term = v.term)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
        |       CAST(sum(oov) AS INTEGER) AS n_oov,
        |       CAST(sum(oov) AS DOUBLE) / count(*) AS oov_frac
        |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_text_salient", (s, d) => TextOps.salientTerms(s, d), headline = true, oracle = Some(
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS INTEGER) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS INTEGER) AS df FROM tf GROUP BY term)
        |SELECT doc_id,
        |       CAST(row_number() OVER (PARTITION BY doc_id
        |              ORDER BY tf DESC, df ASC, term) AS INTEGER) AS rank,
        |       term, tf, df
        |FROM tf JOIN df USING (term)
        |QUALIFY rank <= 5 ORDER BY doc_id, rank""".stripMargin)),
    GraftQuery("x_text_quality", TextOps.qualityScore, Some(
      s"""SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |       CAST($stopCountSql AS INTEGER) AS n_stopwords,
        |       $stopCountSql / len(string_split(text, ' ')) AS stop_ratio,
        |       (length(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')) AS avg_token_len,
        |       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) AS punct_ratio,
        |       len(string_split(text, ' ')) < 5 AS is_short
        |FROM documents ORDER BY doc_id""".stripMargin)),
    // hashed-linear-classifier inference (fastText shape): the inline
    // expression plan and the broadcast-weight-table plan must both
    // reproduce the same logits — ONE oracle string so the two physical
    // strategies are judged against the identical row set
    GraftQuery("x_quality_classifier", TextOps.qualityClassifier,
      Some(qualityClassifierOracle)),
    GraftQuery("x_quality_classifier_join", TextOps.qualityClassifierJoined,
      Some(qualityClassifierOracle)),
    // reliability bins: does the gold rate rise with the logit bin?
    // Cohen's kappa between the classifier's keep and the stopword
    // gold: integer 2x2 confusion + a fixed IEEE tree (po/pe/kappa)
    // replicated verbatim in SQL
    GraftQuery("x_quality_kappa", TextOps.classifierKappa, Some(
      s"""WITH $confusionCellCtes,
        |m AS (SELECT n, n11, n10, n01, n00,
        |        (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / n AS po,
        |        (CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE)) / n AS p_a,
        |        (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE)) / n AS p_b
        |      FROM cm)
        |SELECT n, n11, n10, n01, n00, po,
        |       p_a * p_b + (1.0 - p_a) * (1.0 - p_b) AS pe,
        |       CASE WHEN p_a * p_b + (1.0 - p_a) * (1.0 - p_b) < 1.0
        |            THEN (po - (p_a * p_b + (1.0 - p_a) * (1.0 - p_b)))
        |                 / (1.0 - (p_a * p_b + (1.0 - p_a) * (1.0 - p_b))) END AS kappa
        |FROM m""".stripMargin)),
    // Matthews correlation over the same 2×2 cells: exact HUGEINT/decimal
    // numerator, double marginal products with sqrt the only root —
    // the balance-robust companion kappa readers ask for
    GraftQuery("x_quality_mcc", TextOps.classifierMcc, Some(
      s"""WITH $confusionCellCtes
        |SELECT n, n11, n10, n01, n00,
        |       CASE WHEN n11 + n10 > 0 AND n11 + n01 > 0
        |             AND n00 + n10 > 0 AND n00 + n01 > 0
        |            THEN CAST(CAST(n11 AS HUGEINT) * n00 - CAST(n10 AS HUGEINT) * n01 AS DOUBLE)
        |                 / sqrt(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
        |                        * CAST(n00 + n10 AS DOUBLE) * CAST(n00 + n01 AS DOUBLE))
        |       END AS mcc
        |FROM cm""".stripMargin)),
    // Fleiss' kappa over three rule annotators: with 3 binary raters
    // the per-doc agreement term is 1 or 1/3, so the mean is exact
    // integers + one division (no order-dependent double fold)
    GraftQuery("x_quality_fleiss", TextOps.fleissKappa, Some(
      s"""WITH $raterVotesCtes,
        |a AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kv,
        |             CAST(sum(CASE WHEN k = 0 OR k = 3 THEN 1 ELSE 0 END) AS BIGINT) AS u
        |      FROM g),
        |m AS (SELECT n, kv, u,
        |        CAST(kv AS DOUBLE) / (n * 3) AS p_keep,
        |        (CAST(n AS DOUBLE) + u * 2) / (n * 3) AS p_bar
        |      FROM a)
        |SELECT n AS n_docs, kv AS keep_votes, u AS n_unanimous, p_keep, p_bar,
        |       p_keep * p_keep + (1.0 - p_keep) * (1.0 - p_keep) AS p_e,
        |       CASE WHEN p_keep * p_keep + (1.0 - p_keep) * (1.0 - p_keep) < 1.0
        |            THEN (p_bar - (p_keep * p_keep + (1.0 - p_keep) * (1.0 - p_keep)))
        |                 / (1.0 - (p_keep * p_keep + (1.0 - p_keep) * (1.0 - p_keep))) END AS kappa
        |FROM m""".stripMargin)),
    // Krippendorff's alpha over the same three raters: per-unit
    // disagreement k(3−k) and pooled votes make α = 1 − D(3N−1)/(2K(3N−K))
    // exact HUGEINT/decimal until ONE division; D_o ≡ 1 − P̄ of fleiss
    GraftQuery("x_quality_krippendorff", TextOps.krippendorffAlpha, Some(
      s"""WITH $raterVotesCtes,
        |a AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kv,
        |             CAST(sum(k * (3 - k)) AS BIGINT) AS d
        |      FROM g)
        |SELECT n AS n_docs, kv AS keep_votes, d AS d_num,
        |       CAST(d AS DOUBLE) / (n * 3) AS d_obs,
        |       CAST(2 * CAST(kv AS HUGEINT) * (n * 3 - kv) AS DOUBLE)
        |         / CAST(CAST(n * 3 AS HUGEINT) * (n * 3 - 1) AS DOUBLE) AS d_exp,
        |       CASE WHEN kv > 0 AND kv < n * 3
        |            THEN 1.0 - CAST(CAST(d AS HUGEINT) * (n * 3 - 1) AS DOUBLE)
        |                       / CAST(2 * CAST(kv AS HUGEINT) * (n * 3 - kv) AS DOUBLE)
        |       END AS alpha
        |FROM a""".stripMargin)),
    GraftQuery("x_quality_calibration", TextOps.classifierCalibration,
      Some(classifierCalibrationOracle)),
    // Isotonic (PAV) recalibration via the exact minimax identity
    // cal(i) = max_{j<=i} min_{k>=i} floor(1e12·gold/docs over [j,k]) —
    // floor commutes with min/max, so the whole monotone fit is exact
    // int64 and the hash equality IS the optimality proof
    GraftQuery("x_quality_isotonic", TextOps.isotonicCalibration,
      Some(isotonicCalibrationOracle)),
    // AUC-ROC of the logit ranking vs the stopword gold — the
    // tie-averaged rank-sum identity (AUC = U/(n0·n1)) on the same
    // de-skewed frequency-table machinery as the Mann–Whitney core;
    // exact int64/decimal until ONE division, gini = 2·AUC − 1 rides
    GraftQuery("x_quality_auc", TextOps.classifierAuc, Some(
      s"""WITH $qualityClassifierCtes,
        |g AS (SELECT logit, $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS gold FROM s),
        |f AS (SELECT logit, CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0,
        |             CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM g GROUP BY logit),
        |r AS (SELECT c0, c1,
        |        coalesce(sum(c0 + c1) OVER (ORDER BY logit ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM f),
        |a AS (SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |             sum(CAST(c1 AS HUGEINT) * (cb * 2 + c0 + c1 + 1)) AS r1x2 FROM r),
        |b AS (SELECT n0, n1,
        |        CASE WHEN n0 > 0 AND n1 > 0
        |             THEN CAST(r1x2 - CAST(n1 AS HUGEINT) * (CAST(n1 AS HUGEINT) + 1) AS DOUBLE)
        |                  / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) END AS auc FROM a)
        |SELECT n0, n1, auc, 2.0 * auc - 1.0 AS gini FROM b""".stripMargin)),
    // ECE/MCE/Brier over the calibration bin table with the
    // clamped-linear confidence numerator conf = clamp(logit,±4e6)+4e6:
    // per-bin L1 gaps collapse to integer |Σconf − 8e6·n_gold|, the
    // Brier expansion is three exact decimal moments — each summary is
    // exact up to ONE final division (MCE: a max of fixed ratios)
    GraftQuery("x_quality_ece", TextOps.calibrationEce, Some(
      s"""WITH $qualityClassifierCtes,
        |g AS (SELECT logit, least(greatest(logit, -4000000), 4000000) + 4000000 AS cnum,
        |        $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS gold FROM s),
        |b AS (SELECT $logitBinSql AS bin, cnum, gold FROM g),
        |bins AS (SELECT bin, count(*) AS n_docs,
        |           CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS n_gold,
        |           CAST(sum(cnum) AS BIGINT) AS sconf,
        |           sum(CAST(cnum AS HUGEINT) * cnum) AS sconf2,
        |           CAST(sum(CASE WHEN gold THEN cnum ELSE 0 END) AS BIGINT) AS sconfgold
        |         FROM b GROUP BY bin),
        |a AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_docs, count(*) AS n_bins,
        |        CAST(sum(abs(sconf - 8000000 * n_gold)) AS BIGINT) AS ece_num,
        |        max(CAST(abs(sconf - 8000000 * n_gold) AS DOUBLE) / (8000000.0 * CAST(n_docs AS DOUBLE))) AS mce,
        |        sum(sconf2) AS sc2, CAST(sum(sconfgold) AS HUGEINT) AS scy,
        |        CAST(sum(n_gold) AS HUGEINT) AS ngold
        |      FROM bins)
        |SELECT n_docs, n_bins,
        |       CAST(ece_num AS DOUBLE) / (8000000.0 * CAST(n_docs AS DOUBLE)) AS ece,
        |       mce,
        |       CAST(sc2 - 16000000 * scy + 64000000000000 * ngold AS DOUBLE)
        |         / (64000000000000.0 * CAST(n_docs AS DOUBLE)) AS brier
        |FROM a""".stripMargin)),
    // Spearman rho between logit and token count (the length-confounder
    // audit): Pearson over exact DOUBLED tie-averaged ranks from two
    // de-skewed frequency tables; moments exact, two sqrt one division
    GraftQuery("x_quality_spearman", TextOps.classifierLengthSpearman, Some(
      s"""WITH $qualityClassifierCtes,
        |p AS (SELECT logit AS x, CAST(n_tokens AS BIGINT) AS y FROM s),
        |fx AS (SELECT x, count(*) AS cnt FROM p GROUP BY x),
        |rx AS (SELECT x, (coalesce(sum(cnt) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt) * 2 - cnt + 1 AS dx FROM fx),
        |fy AS (SELECT y, count(*) AS cnt FROM p GROUP BY y),
        |ry AS (SELECT y, (coalesce(sum(cnt) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt) * 2 - cnt + 1 AS dy FROM fy),
        |j AS (SELECT dx, dy FROM p JOIN rx USING (x) JOIN ry USING (y)),
        |a AS (SELECT count(*) AS n,
        |        sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
        |        sum(CAST(dx AS HUGEINT) * dx) AS sxx, sum(CAST(dy AS HUGEINT) * dy) AS syy,
        |        sum(CAST(dx AS HUGEINT) * dy) AS sxy
        |      FROM j)
        |SELECT n,
        |       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        |             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
        |            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS rho
        |FROM a""".stripMargin)),
    // Kendall tau-b on the bounded (logit bin × length bucket) grid —
    // the O(n²)-free concordance form: one scan to ≤ 9×16 cells, exact
    // C/D/tie integers off the grid self-join, doubled-identity ratio
    GraftQuery("x_quality_kendall", TextOps.classifierLengthKendall, Some(
      s"""WITH $qualityClassifierCtes,
        |q AS (SELECT $logitBinSql AS bx,
        |             least(CAST(n_tokens AS BIGINT) // 16, 15) AS by FROM s),
        |g AS (SELECT bx, by, count(*) AS cnt FROM q GROUP BY bx, by),
        |cd AS (SELECT coalesce(sum(CASE WHEN l.by < r.by THEN CAST(l.cnt AS HUGEINT) * r.cnt END), 0) AS conc,
        |              coalesce(sum(CASE WHEN l.by > r.by THEN CAST(l.cnt AS HUGEINT) * r.cnt END), 0) AS disc
        |       FROM g l JOIN g r ON l.bx < r.bx),
        |tx AS (SELECT sum(CAST(t AS HUGEINT) * (t - 1)) AS tx2 FROM (SELECT sum(cnt) AS t FROM g GROUP BY bx)),
        |ty AS (SELECT sum(CAST(t AS HUGEINT) * (t - 1)) AS ty2 FROM (SELECT sum(cnt) AS t FROM g GROUP BY by)),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |              CAST(sum(cnt) AS HUGEINT) * (CAST(sum(cnt) AS HUGEINT) - 1) AS n0x2 FROM g)
        |SELECT nn.n AS n, CAST(conc AS BIGINT) AS concordant, CAST(disc AS BIGINT) AS discordant,
        |       CASE WHEN CAST(n0x2 AS DOUBLE) - CAST(tx2 AS DOUBLE) > 0.0
        |             AND CAST(n0x2 AS DOUBLE) - CAST(ty2 AS DOUBLE) > 0.0
        |            THEN (2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE)))
        |                 / (sqrt(CAST(n0x2 AS DOUBLE) - CAST(tx2 AS DOUBLE)) * sqrt(CAST(n0x2 AS DOUBLE) - CAST(ty2 AS DOUBLE))) END AS tau_b
        |FROM cd, tx, ty, nn""".stripMargin)),
    // Per-language AUC: the ranking-fairness audit — same rank-sum
    // identity as x_quality_auc with every stage keyed by lang
    GraftQuery("x_quality_auc_by_lang", TextOps.classifierAucByLang, Some(
      s"""WITH $qualityClassifierCtes,
        |g AS (SELECT lang, logit, $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS gold FROM s),
        |f AS (SELECT lang, logit, CAST(sum(CASE WHEN gold THEN 0 ELSE 1 END) AS BIGINT) AS c0,
        |             CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |      FROM g GROUP BY lang, logit),
        |r AS (SELECT lang, c0, c1,
        |        coalesce(sum(c0 + c1) OVER (PARTITION BY lang ORDER BY logit ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM f),
        |a AS (SELECT lang, CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |             sum(CAST(c1 AS HUGEINT) * (cb * 2 + c0 + c1 + 1)) AS r1x2 FROM r GROUP BY lang),
        |b AS (SELECT lang, n0, n1,
        |        CASE WHEN n0 > 0 AND n1 > 0
        |             THEN CAST(r1x2 - CAST(n1 AS HUGEINT) * (CAST(n1 AS HUGEINT) + 1) AS DOUBLE)
        |                  / (2.0 * CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)) END AS auc FROM a)
        |SELECT lang, n0, n1, auc, 2.0 * auc - 1.0 AS gini FROM b ORDER BY lang""".stripMargin)),
    // Disparate-impact (four-fifths) audit of the keep decision by
    // language: integer group counts, rate ratios vs the most-favored
    // group — the curation-governance readout for a biased filter
    GraftQuery("x_quality_disparity", TextOps.classifierDisparity, Some(
      s"""WITH $qualityClassifierCtes,
        |g AS (SELECT lang AS "group", count(*) AS n,
        |             CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |      FROM s GROUP BY lang),
        |r AS (SELECT "group", n, n_keep,
        |             CAST(n_keep AS DOUBLE) / CAST(n AS DOUBLE) AS keep_rate FROM g),
        |m AS (SELECT max(keep_rate) AS max_rate FROM r)
        |SELECT "group", n, n_keep, keep_rate,
        |       CASE WHEN max_rate > 0.0 THEN keep_rate / max_rate END AS impact_ratio,
        |       CASE WHEN max_rate > 0.0 THEN keep_rate / max_rate END < 0.8 AS flagged
        |FROM r, m ORDER BY "group"""".stripMargin)),
    GraftQuery("x_text_repetition", TextOps.repetition, Some(
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(generate_series(1, len(tk) - 1), i -> tk[i] || ' ' || tk[i+1]) AS g2,
        |        list_transform(generate_series(1, len(tk) - 2), i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS g3
        |      FROM t WHERE len(tk) >= 3)
        |SELECT doc_id,
        |       CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) AS dup_2gram_frac,
        |       CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3) AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin)),
    // top-n-gram concentration + immediate repeats (the Gopher signals
    // x_text_repetition doesn't carry): modal-gram count over gram
    // positions, bounded (0,1]; short docs report 0 by definition
    GraftQuery("x_text_top_gram", TextOps.topGramConcentration, Some(
      """WITH t2 AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |base AS (SELECT doc_id, len(tk) AS n,
        |           CASE WHEN len(tk) >= 2
        |                THEN len(list_filter(generate_series(1, len(tk) - 1), i -> tk[i] = tk[i+1]))
        |                ELSE 0 END AS n_imm
        |         FROM t2),
        |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 1),
        |                 i -> tk[i] || ' ' || tk[i+1])) AS g
        |       FROM t2 WHERE len(tk) >= 2),
        |c2 AS (SELECT doc_id, max(c) AS topc
        |       FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY doc_id),
        |g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),
        |                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
        |       FROM t2 WHERE len(tk) >= 3),
        |c3 AS (SELECT doc_id, max(c) AS topc
        |       FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n AS INTEGER) AS n_tokens,
        |       CAST(b.n_imm AS INTEGER) AS n_immediate_repeats,
        |       CAST(coalesce(c2.topc, 0) AS BIGINT) AS top2_count,
        |       CASE WHEN b.n >= 2 THEN CAST(coalesce(c2.topc, 0) AS DOUBLE) / (b.n - 1) ELSE 0.0 END AS top2_frac,
        |       CAST(coalesce(c3.topc, 0) AS BIGINT) AS top3_count,
        |       CASE WHEN b.n >= 3 THEN CAST(coalesce(c3.topc, 0) AS DOUBLE) / (b.n - 2) ELSE 0.0 END AS top3_frac
        |FROM base b LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_text_langid", TextOps.langId, None),
    // gate twins for the engine-internal text signals: one row of
    // oracle-derivable counts + passes=true asserting coverage,
    // determinism (equal texts → equal signal) and bounds — the
    // recall-gate pattern, so every rows-only family contributes a
    // hash-checkable CORRECTNESS row per round
    GraftQuery("x_text_langid_gate", TextOps.langIdGate, Some(
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_texts,
        |       true AS passes FROM documents""".stripMargin)),
    GraftQuery("x_text_pii_scrub", TextOps.scrubPii, Some(
      """SELECT doc_id,
        |       regexp_replace(regexp_replace(regexp_replace(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
        |         '[0-9][0-9][0-9][- .][0-9][0-9][0-9][- .][0-9][0-9][0-9][0-9]', '<PHONE>', 'g'),
        |         '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IPV4>', 'g') AS clean_text,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_email,
        |       CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9][- .][0-9][0-9][0-9][- .][0-9][0-9][0-9][0-9]')) AS INTEGER) AS n_phone,
        |       CAST(len(regexp_extract_all(text, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS INTEGER) AS n_ipv4
        |FROM documents ORDER BY doc_id""".stripMargin)),
    GraftQuery("x_text_fingerprint", TextOps.fingerprint, None),
    // winnowing (MOSS) fingerprint selection: rightmost-min of every
    // w-window over positional k-gram md5 hashes — any shared run of
    // >= k+w-1 tokens shares a selected VALUE; fully value-oracled
    GraftQuery("x_text_winnow", TextOps.winnowFingerprints, Some {
      val k = TextOps.WinnowK
      val w = TextOps.WinnowW
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(generate_series(1, len(tk) - ${k - 1}),
        |          i -> CAST(('0x' || substr(md5(array_to_string(tk[i:i+${k - 1}], ' ')), 1, 15)) AS BIGINT)) AS gs
        |      FROM t WHERE len(tk) >= ${k + w - 1}),
        |sel AS (SELECT doc_id,
        |          CAST(i + ($w - list_position(list_reverse(gs[i:i+${w - 1}]), list_min(gs[i:i+${w - 1}]))) AS INTEGER) AS pos,
        |          list_min(gs[i:i+${w - 1}]) AS fp
        |        FROM g, unnest(generate_series(1, len(gs) - ${w - 1})) AS wi(i))
        |SELECT DISTINCT doc_id, pos, fp FROM sel
        |ORDER BY doc_id, pos, fp""".stripMargin
    }),
    GraftQuery("x_text_fingerprint_gate", TextOps.fingerprintGate, Some(
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_texts,
        |       true AS passes FROM documents""".stripMargin)),
    GraftQuery("x_text_unigram_nll", (s, d) => TextOps.unigramNll(s, d), None),
    GraftQuery("x_text_unigram_nll_gate", TextOps.unigramNllGate, Some(
      """SELECT count(*) AS n_docs, true AS passes FROM documents""")),
    // bigram interpolated-LM perplexity (ln → rows-only); its gate
    // value-checks the exact integer side: corpus-wide Σ(n_tokens − 1)
    // must equal the engine's summed bigram counts, plus bounds
    GraftQuery("x_text_bigram_nll", TextOps.bigramNll, None),
    GraftQuery("x_text_bigram_nll_gate", TextOps.bigramNllGate, Some(
      """SELECT count(*) AS n_docs,
        |       CAST(sum(CASE WHEN len(string_split(text, ' ')) >= 2
        |                     THEN len(string_split(text, ' ')) - 1 ELSE 0 END) AS BIGINT) AS total_bigrams,
        |       true AS passes
        |FROM documents""".stripMargin)),
    // deflate-compressibility quality band (zlib engine-internal →
    // rows-only; ordering + determinism contracts spec-pinned)
    GraftQuery("x_text_compress", TextOps.compressionRatio, None),
    // the raw-byte side of the deflate signal IS oracle-derivable
    // (UTF-8 lengths), so the gate pins it exactly alongside the bounds
    GraftQuery("x_text_compress_gate", TextOps.compressionRatioGate, Some(
      """SELECT count(*) AS n_docs,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       true AS passes FROM documents""".stripMargin)),
    GraftQuery("x_dedup_exact", DedupOps.exact, Some(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),
    GraftQuery("x_dedup_exact_digest", DedupOps.exactDigest, Some(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),
    GraftQuery("x_dedup_quality_survivor", DedupOps.qualitySurvivor, Some(
      s"""WITH s AS (
        |  SELECT doc_id, text,
        |         $stopCountSql
        |           / len(string_split(text, ' ')) AS sr
        |  FROM documents),
        |r AS (SELECT doc_id, sr,
        |        row_number() OVER (PARTITION BY lower(text) ORDER BY sr, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY lower(text)) AS n_copies
        |      FROM s)
        |SELECT doc_id AS keep_id, sr AS stop_ratio, n_copies
        |FROM r WHERE rn = 1 ORDER BY keep_id""".stripMargin)),
    // right-to-be-forgotten readmission: per dup group touched by the
    // deletion request, whether the keeper itself is deleted and who
    // re-enters — one conditional aggregation on the exact-dedup key
    GraftQuery("x_dedup_forget_readmit", DedupOps.forgetReadmit, Some(
      s"""WITH g AS (SELECT text, min(doc_id) AS old_keep_id,
        |             min(CASE WHEN source <> '${DedupOps.ForgetSource}' THEN doc_id END) AS new_keep_id,
        |             CAST(sum(CASE WHEN source = '${DedupOps.ForgetSource}' THEN 1 ELSE 0 END) AS INTEGER) AS n_deleted,
        |             CAST(sum(CASE WHEN source <> '${DedupOps.ForgetSource}' THEN 1 ELSE 0 END) AS INTEGER) AS n_remaining
        |           FROM documents GROUP BY text)
        |SELECT old_keep_id,
        |       new_keep_id IS NULL OR new_keep_id <> old_keep_id AS keeper_deleted,
        |       new_keep_id, n_deleted, n_remaining
        |FROM g WHERE n_deleted > 0 ORDER BY old_keep_id""".stripMargin)),
    GraftQuery("x_dedup_incremental", DedupOps.incremental, Some(
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents b
        |WHERE source = 'src0'
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.source <> 'src0' AND c.text = b.text)
        |GROUP BY b.text
        |ORDER BY keep_id""".stripMargin)),
    GraftQuery("x_dedup_ngram_jaccard", DedupOps.ngramJaccard,
      Some(ngramJaccardOracle), headline = true),
    // directional subset-duplicate pairs (|A∩B|/|A| ≥ 4/5): the oracle
    // recomputes every co-shingled pair and applies the same integer
    // threshold on the contained side's set size — both orientations of
    // an exact dup, one orientation of a true subset
    GraftQuery("x_dedup_containment", DedupOps.containmentPairs, Some(
      s"""WITH $trigramCtes,
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |          FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, n_common, CAST(n_common AS DOUBLE) / ca.n AS containment
        |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id
        |WHERE 5 * n_common >= 4 * ca.n
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // cross-source duplication matrix: the verified near-dup pair set
    // rolled up by endpoint sources (diagonal = within-source dup load,
    // off-diagonal = cross-source mirroring) — the dedup triage table
    GraftQuery("x_dedup_source_profile", DedupOps.sourcePairProfile, Some(
      s"""WITH pr AS ($ngramJaccardOracle),
        |s AS (SELECT doc_id, source FROM documents)
        |SELECT least(sa.source, sb.source) AS source_lo,
        |       greatest(sa.source, sb.source) AS source_hi,
        |       count(*) AS n_pairs,
        |       least(sa.source, sb.source) = greatest(sa.source, sb.source) AS within_source
        |FROM pr JOIN s sa ON pr.doc_a = sa.doc_id
        |        JOIN s sb ON pr.doc_b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY source_lo, source_hi""".stripMargin)),
    GraftQuery("x_dedup_minhash_lsh", DedupOps.minhashLsh, None, headline = true),
    // end-to-end LSH equivalence gate: the banded pair set must be a
    // zero-false-positive subset of the exact Jaccard-threshold pair set
    // (which DuckDB recomputes — same SQL as the ngram oracle) at or
    // above the recall floor; the first value-level proof of the banding
    // pipeline itself (round-9 verdict's top verification gap)
    GraftQuery("x_dedup_minhash_verify_gate", DedupOps.minhashVerifyGate, Some(
      s"""SELECT CAST(count(*) AS BIGINT) AS n_exact,
         |       CAST(0 AS BIGINT) AS false_pos, true AS passes
         |FROM ($ngramJaccardOracle)""".stripMargin)),
    // pigeonhole banding is exhaustive for Hamming <= 3, so the banded
    // set must EQUAL the size-guarded brute-force pair set — signatures
    // are engine-internal, hence the docs-count anchor + literal true
    GraftQuery("x_dedup_simhash_verify_gate", DedupOps.simhashVerifyGate, Some(
      "SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS passes FROM documents")),
    // write-once/probe-many text dedup: crawl batch vs materialized
    // signature index; rows-only (engine-internal hashes), cross-split
    // equality with the full pipeline pinned by spec
    GraftQuery("x_dedup_minhash_probe", DedupOps.minhashProbe, None),
    // hash-green twin for the probe path: probe ≡ inline cross-split
    // slice, jaccard bit-identical; batch-count anchor + literal pins
    // (the simhash gate convention — signatures are engine-internal)
    GraftQuery("x_dedup_minhash_probe_gate", DedupOps.minhashProbeGate, Some(
      """SELECT CAST(count(*) AS BIGINT) AS n_batch_docs,
        |       CAST(0 AS BIGINT) AS mismatches, true AS passes
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin)),
    // component labels are min-reachable doc ids over the (already
    // oracled) ngram-jaccard pair set — value-checkable via DuckDB's
    // recursive CTE transitive closure
    GraftQuery("x_dedup_clusters", ClusterOps.nearDupClusters, Some(
      nearDupClustersCtes +
        """SELECT cluster_id, doc_id FROM cl
          |ORDER BY cluster_id, doc_id""".stripMargin)),
    // per-cluster QUALITY survivor (min stop-ratio, id tie) — the same
    // transitive-closure CTE chain, so the clustering and its decision
    // rule are judged against one definition
    GraftQuery("x_dedup_cluster_survivor", ClusterOps.nearDupQualitySurvivor, Some(
      nearDupClustersCtes +
        s""", s AS (
          |  SELECT doc_id,
          |         $stopCountSql
          |           / len(string_split(text, ' ')) AS sr
          |  FROM documents),
          |r AS (SELECT cluster_id, cl.doc_id, sr,
          |        row_number() OVER (PARTITION BY cluster_id ORDER BY sr, cl.doc_id) AS rn,
          |        count(*) OVER (PARTITION BY cluster_id) AS nm
          |      FROM cl JOIN s ON cl.doc_id = s.doc_id)
          |SELECT cluster_id, doc_id AS keep_id, sr AS keep_stop_ratio,
          |       CAST(nm AS INTEGER) AS n_members
          |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),
    GraftQuery("x_dedup_simhash", DedupOps.simhash, None),
    GraftQuery("x_dedup_embed_cosine", DedupOps.embedCosine, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, list_cosine_similarity(a.v, b.v) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.5
        |ORDER BY vec_a, vec_b""".stripMargin)),
    // edit-distance ≤ 1 ER pairs via wildcard (deletion-neighborhood)
    // hashing — alphabet-bounded buckets; the oracle brute-forces the
    // quadratic pair space the Spark plan never materializes
    GraftQuery("x_dedup_editdist_pairs", DedupOps.editDistPairs, Some(
      """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY key_a, key_b""".stripMargin)),
    GraftQuery("x_sim_topk_brute", SimilarityOps.topkBrute, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos FROM q, e)
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
        |       neighbor_id
        |FROM s QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin), headline = true),
    GraftQuery("x_sim_hard_negatives", SimilarityOps.hardNegatives, Some(
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos
        |      FROM q JOIN e ON e.label <> q.q_label)
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
        |       neighbor_id
        |FROM s QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin)),
    // margin-based bitext mining: mutual-best cross-label pairs scored
    // by the ratio margin; the oracle folds the k neighbor cosines in
    // the same explicit left-associated rank order, so margins (not
    // just ranks) hash bit-for-bit
    GraftQuery("x_sim_bitext_margin", SimilarityOps.bitextMarginMine, Some(
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id AS a_id, v AS av FROM e WHERE label = 0),
        |b AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE label = 1),
        |s AS (SELECT a_id, b_id, list_cosine_similarity(av, bv) AS cos FROM a, b),
        |fr AS (SELECT a_id, b_id, cos,
        |         row_number() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS r FROM s),
        |br AS (SELECT a_id, b_id, cos,
        |         row_number() OVER (PARTITION BY b_id ORDER BY cos DESC, a_id) AS r FROM s),
        |fa AS (SELECT a_id, list(cos ORDER BY r) AS l FROM fr WHERE r <= ${SimilarityOps.MineK} GROUP BY 1),
        |fa2 AS (SELECT a_id, (((l[1] + l[2]) + l[3]) + l[4]) / ${SimilarityOps.MineK} AS favg FROM fa),
        |ba AS (SELECT b_id, list(cos ORDER BY r) AS l FROM br WHERE r <= ${SimilarityOps.MineK} GROUP BY 1),
        |ba2 AS (SELECT b_id, (((l[1] + l[2]) + l[3]) + l[4]) / ${SimilarityOps.MineK} AS bavg FROM ba),
        |f1 AS (SELECT a_id, b_id, cos FROM fr WHERE r = 1),
        |b1 AS (SELECT a_id, b_id FROM br WHERE r = 1),
        |m AS (SELECT f1.a_id, f1.b_id, f1.cos, f1.cos / ((favg + bavg) / 2) AS margin
        |      FROM f1 JOIN b1 ON f1.a_id = b1.a_id AND f1.b_id = b1.b_id
        |      JOIN fa2 ON f1.a_id = fa2.a_id JOIN ba2 ON f1.b_id = ba2.b_id)
        |SELECT a_id, b_id, cos, margin, margin >= ${SimilarityOps.MarginTau} AS accepted
        |FROM m ORDER BY a_id""".stripMargin)),
    // BM25 lexical retrieval: per-term factors floor-scaled to int64 so
    // the per-doc score SUM is order-independent (a raw double sum would
    // be partial-aggregation-order-dependent and unhashable); constants
    // 2.2/1.2/0.25/0.75 are identical decimal literals in both engines
    GraftQuery("x_retrieval_bm25", RetrievalOps.bm25, Some(bm25Oracle),
      headline = true),
    // write-once / probe-many: identical rows served from the
    // materialized term-sorted index (same oracle pins the equivalence;
    // benchPrep builds/refreshes the index untimed so every rep — not
    // just ones after a stamped-cache hit — times the probe regime)
    GraftQuery("x_retrieval_bm25_indexed", RetrievalOps.bm25Indexed,
      Some(bm25Oracle), headline = true,
      benchPrep = Some((s, d) => { RetrievalOps.ensureLexIndex(s, d); () })),
    // incremental maintenance ≡ rebuild: base index + folded crawl batch
    // must satisfy the SAME oracle as the full forms
    GraftQuery("x_retrieval_bm25_incremental", RetrievalOps.bm25Incremental,
      Some(bm25Oracle)),
    // pseudo-relevance feedback (RM3-lite): both rounds share one
    // scoring-SQL source; the expansion choice is exact counts with
    // deterministic ties, so the two-stage retrieval is value-oracled
    GraftQuery("x_retrieval_bm25_prf", RetrievalOps.bm25Prf, Some(bm25PrfOracle)),
    // Dirichlet query-likelihood: the language-modeling scorer beside
    // BM25 — same floor-ln-micro integer-sum trick, absent query terms
    // contribute the background probability (coalesce-0 tf)
    GraftQuery("x_retrieval_qlm", RetrievalOps.qlm, Some(qlmOracle),
      headline = true),
    // write-once / probe-many for the QL scorer: identical rows served
    // from the materialized index's term-pruned tf/cf reads (same
    // oracle pins the equivalence; benchPrep builds the index untimed)
    GraftQuery("x_retrieval_qlm_indexed", RetrievalOps.qlmIndexed,
      Some(qlmOracle), headline = true,
      benchPrep = Some((s, d) => { RetrievalOps.ensureLexIndex(s, d); () })),
    // hybrid RAG-stack retrieval: lexical + dense lists fused by
    // reciprocal rank with exact-integer contributions (lcm-scaled) —
    // both inputs are k-bounded map-side aggregates, so fusion cost is
    // k·|queries| regardless of corpus size
    GraftQuery("x_retrieval_rrf", RetrievalOps.rrfHybrid, Some(rrfOracle)),
    // ranking-quality evaluation of the BM25 run against conjunctive
    // (ALL-terms) relevance: MRR / AP / P@k / recall carried as
    // lcm(1..10)-scaled exact integers per query, divided once in the
    // summary — order-independent, so both surfaces are value-oracled
    GraftQuery("x_eval_retrieval_per_query", EvalOps.bm25EvalPerQuery,
      Some(evalPerQueryOracle)),
    GraftQuery("x_eval_retrieval_summary", EvalOps.bm25EvalSummary,
      Some(evalSummaryOracle)),
    // the RRF hybrid judged by the SAME metrics chain (run definition is
    // the only thing that changes — single-source eval SQL)
    GraftQuery("x_eval_rrf_summary", EvalOps.rrfEvalSummary,
      Some(evalRrfSummaryOracle)),
    GraftQuery("x_eval_prf_summary", EvalOps.prfEvalSummary,
      Some(evalPrfSummaryOracle)),
    // graded-relevance NDCG@10 of the BM25 run: grade = distinct query
    // terms present; DCG/IDCG are exact int64 over literal log2 weights
    // (the one transcendental runs at class load, both engines get the
    // same integers); ideal ranking folds over the per-(query, grade)
    // COUNT table, never sorting documents
    GraftQuery("x_eval_ndcg_per_query", EvalOps.bm25NdcgPerQuery,
      Some(ndcgPerQueryOracle)),
    GraftQuery("x_eval_ndcg_summary", EvalOps.bm25NdcgSummary,
      Some(ndcgSummaryOracle)),
    // the RRF and PRF runs under the SAME graded judgment — the NDCG leg
    // of the three-way serving-path comparison (single-source CTEs)
    GraftQuery("x_eval_ndcg_rrf_summary", EvalOps.rrfNdcgSummary,
      Some(ndcgRrfSummaryOracle)),
    GraftQuery("x_eval_ndcg_prf_summary", EvalOps.prfNdcgSummary,
      Some(ndcgPrfSummaryOracle)),
    // rank-biased overlap (p = 1/2 ⇒ fully dyadic): how far fusion /
    // expansion moved the served list — per-match entry weights are
    // literal integers, per-query s is one combinable sum, rbo one
    // division; identical runs score exactly 1023/1024
    GraftQuery("x_eval_rbo_rrf", EvalOps.bm25RrfRbo, Some(rboOracleFor(rrfRunrDef))),
    GraftQuery("x_eval_rbo_prf", EvalOps.bm25PrfRbo, Some(rboOracleFor(prfRunrDef))),
    GraftQuery("x_sim_ann_lsh", SimilarityOps.annLsh, None),
    GraftQuery("x_sim_knn_join", (s, d) => SimilarityOps.knnJoin(s, d), None,
      headline = true),
    // the write-once / probe-many form: signatures read from the
    // materialized parquet index (built untimed in Bench setup) instead of
    // being recomputed per run — same rows as x_sim_knn_join (spec-pinned)
    GraftQuery("x_sim_knn_indexed", (s, d) => SimilarityOps.knnJoinIndexed(s, d), None,
      headline = true),
    // EXACT all-corpus kNN — the value-checked accuracy anchor for the ANN
    // family (size-gated all-pairs; ranks only, so the oracle's
    // list_cosine_similarity 1-ulp formula difference vs the kernel cannot
    // flip a hash: neighbor cosines are many ulps apart in random data and
    // exact ties break on neighbor_id in both engines)
    GraftQuery("x_sim_knn_exact", (s, d) => SimilarityOps.knnExact(s, d), Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |         list_cosine_similarity(a.v, b.v) AS cos
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id)
        |SELECT q_id,
        |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
        |       neighbor_id
        |FROM s QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin)),
    // MMR diversified re-ranking at λ = 1/2: the doubled objective
    // rel − max_sim is exact int64 on the EmbedOps.Scale grid — DuckDB
    // replays the pool and all greedy rounds, ties to the lower id
    GraftQuery("x_sim_mmr_rerank", (s, d) => SimilarityOps.mmrRerank(s, d),
      Some(mmrOracle)),
    // SemDeDup-style dedup DECISION: cap each near-dup cluster at one
    // representative; same recursive-CTE closure as x_dedup_clusters,
    // ranked and left-joined back onto the corpus
    GraftQuery("x_dedup_cluster_cap", (s, d) => ClusterOps.clusterCapSample(s, d), Some(
      nearDupClustersCtes.stripSuffix("\n") + s""",
        | rk AS (SELECT cluster_id, doc_id,
        |          CAST(row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS INTEGER)
        |            AS rank_in_cluster
        |        FROM cl)
        |SELECT d.doc_id,
        |       coalesce(rk.cluster_id, d.doc_id) AS cluster_id,
        |       coalesce(rk.rank_in_cluster, 1) AS rank_in_cluster,
        |       coalesce(rk.rank_in_cluster, 1) <= 1 AS kept
        |FROM documents d LEFT JOIN rk USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),
    // label propagation over the exact-kNN graph: integer majority votes,
    // ties to lowest label, seeds clamped — 2 unrolled rounds, hash-green
    GraftQuery("x_graph_labelprop", GraphOps.labelProp, Some(
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sc AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |              list_cosine_similarity(a.v, b.v) AS cos
        |       FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |ed AS (SELECT q_id AS node, neighbor_id FROM
        |        (SELECT q_id, neighbor_id,
        |                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
        |         FROM sc) WHERE rn <= 5),
        |s0 AS (SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN label END AS lbl FROM e),
        |v1 AS (SELECT ed.node, l.lbl AS vlbl, count(*) AS c
        |       FROM ed JOIN s0 l ON ed.neighbor_id = l.vec_id AND l.lbl IS NOT NULL
        |       GROUP BY ed.node, l.lbl),
        |w1 AS (SELECT node, vlbl FROM
        |        (SELECT node, vlbl,
        |                row_number() OVER (PARTITION BY node ORDER BY c DESC, vlbl) AS rn
        |         FROM v1) WHERE rn = 1),
        |s1 AS (SELECT e.vec_id,
        |              CASE WHEN e.vec_id % 5 = 0 THEN e.label
        |                   ELSE coalesce(w1.vlbl, s0.lbl) END AS lbl
        |       FROM e JOIN s0 ON s0.vec_id = e.vec_id
        |       LEFT JOIN w1 ON w1.node = e.vec_id),
        |v2 AS (SELECT ed.node, l.lbl AS vlbl, count(*) AS c
        |       FROM ed JOIN s1 l ON ed.neighbor_id = l.vec_id AND l.lbl IS NOT NULL
        |       GROUP BY ed.node, l.lbl),
        |w2 AS (SELECT node, vlbl FROM
        |        (SELECT node, vlbl,
        |                row_number() OVER (PARTITION BY node ORDER BY c DESC, vlbl) AS rn
        |         FROM v2) WHERE rn = 1),
        |s2 AS (SELECT e.vec_id,
        |              CASE WHEN e.vec_id % 5 = 0 THEN e.label
        |                   ELSE coalesce(w2.vlbl, s1.lbl) END AS lbl
        |       FROM e JOIN s1 ON s1.vec_id = e.vec_id
        |       LEFT JOIN w2 ON w2.node = e.vec_id)
        |SELECT vec_id, coalesce(lbl, -1) AS label_pred FROM s2 ORDER BY vec_id""".stripMargin)),
    // nation-assortativity modularity of the purchase graph: per-community
    // numerators e_in2·m2 − d_c² and their total are exact HUGEINT/decimal,
    // Q is ONE division — no order-dependent double sum over communities
    GraftQuery("x_graph_modularity", GraphOps.nationModularity, Some(
      s"""WITH $graphEdgeCtes,
        |lab AS (SELECT s_suppkey*2 AS node, CAST(s_nationkey AS BIGINT) AS community FROM supplier
        |        UNION ALL
        |        SELECT c_custkey*2+1, CAST(c_nationkey AS BIGINT) FROM customer),
        |dg AS (SELECT src AS node, count(*) AS deg FROM e1 GROUP BY src),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM e1),
        |cd AS (SELECT l.community, CAST(count(*) AS BIGINT) AS n_nodes,
        |              CAST(sum(dg.deg) AS BIGINT) AS deg_sum
        |       FROM dg JOIN lab l USING (node) GROUP BY l.community),
        |ei AS (SELECT la.community, CAST(count(*) AS BIGINT) AS e_in2
        |       FROM e1 JOIN lab la ON e1.src = la.node
        |                JOIN lab lb ON e1.dst = lb.node
        |       WHERE la.community = lb.community GROUP BY la.community),
        |pc AS (SELECT cd.community, cd.n_nodes, cd.deg_sum,
        |              coalesce(ei.e_in2, 0) AS e_in2,
        |              CAST(coalesce(ei.e_in2, 0) AS HUGEINT) * m.m2
        |                - CAST(cd.deg_sum AS HUGEINT) * cd.deg_sum AS qn,
        |              m.m2
        |       FROM cd LEFT JOIN ei USING (community) CROSS JOIN m),
        |t AS (SELECT sum(qn) AS qt, max(m2) AS m2t FROM pc)
        |SELECT community, n_nodes, deg_sum, CAST(e_in2 // 2 AS BIGINT) AS e_in,
        |       CAST(qn AS DOUBLE) / CAST(CAST(m2 AS HUGEINT) * m2 AS DOUBLE) AS q_contrib,
        |       CAST(qt AS DOUBLE) / CAST(CAST(m2t AS HUGEINT) * m2t AS DOUBLE) AS q_total
        |FROM pc CROSS JOIN t ORDER BY community""".stripMargin)),
    // degree assortativity: on a symmetrized edge list the Pearson
    // marginals coincide, so r = (m2·Σdxdy − (Σdx)²)/(m2·Σdx² − (Σdx)²)
    // is fully rational — HUGEINT/decimal moments, ONE division
    GraftQuery("x_graph_assortativity", GraphOps.degreeAssortativity, Some(
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src AS node, count(*) AS deg FROM e1 GROUP BY src),
        |x AS (SELECT da.deg AS dx, db.deg AS dy
        |      FROM e1 JOIN d da ON e1.src = da.node JOIN d db ON e1.dst = db.node),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS m2,
        |        sum(CAST(dx AS HUGEINT)) AS sx,
        |        sum(CAST(dx AS HUGEINT) * dx) AS sxx,
        |        sum(CAST(dx AS HUGEINT) * dy) AS sxy FROM x),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM d)
        |SELECT m2 AS n_edges_sym, n_nodes,
        |       CASE WHEN m2 * sxx - sx * sx > 0
        |            THEN CAST(m2 * sxy - sx * sx AS DOUBLE)
        |                 / CAST(m2 * sxx - sx * sx AS DOUBLE)
        |       END AS assortativity
        |FROM a CROSS JOIN n""".stripMargin)),
    // PageRank with integer-exact damping/teleport arithmetic — the
    // kmeans playbook applied to iterative graph analytics: the oracle
    // unrolls the same three rounds, ranks hash-match bit-for-bit
    GraftQuery("x_graph_pagerank", GraphOps.pageRank, headline = true, oracle = Some(
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src),
        |e AS (SELECT e1.src, e1.dst, d.deg FROM e1 JOIN d USING (src)),
        |nn AS (SELECT count(*) AS n FROM d),
        |r0 AS (SELECT d.src AS node, 1000000000000 // nn.n AS rank
        |       FROM d CROSS JOIN nn),
        |c1 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
        |r1 AS (SELECT r0.node,
        |              CAST(1000000000000*15//100//nn.n + 85 * coalesce(c1.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r0 CROSS JOIN nn LEFT JOIN c1 ON c1.dst = r0.node),
        |c2 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
        |r2 AS (SELECT r1.node,
        |              CAST(1000000000000*15//100//nn.n + 85 * coalesce(c2.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r1 CROSS JOIN nn LEFT JOIN c2 ON c2.dst = r1.node),
        |c3 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
        |r3 AS (SELECT r2.node,
        |              CAST(1000000000000*15//100//nn.n + 85 * coalesce(c3.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r2 CROSS JOIN nn LEFT JOIN c3 ON c3.dst = r2.node)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)),
    // personalized PageRank: the same unrolled integer trajectory with
    // teleport AND initial mass restricted to the seed slice (supplier
    // nodes with suppkey % 5 = 0 ⇒ node % 10 = 0), denominator |S|
    GraftQuery("x_graph_ppr", GraphOps.personalizedPageRank, Some(
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src),
        |e AS (SELECT e1.src, e1.dst, d.deg FROM e1 JOIN d USING (src)),
        |ns AS (SELECT count(*) AS n FROM d WHERE src % 10 = 0),
        |r0 AS (SELECT d.src AS node,
        |              CASE WHEN d.src % 10 = 0 THEN 1000000000000 // ns.n ELSE 0 END AS rank
        |       FROM d CROSS JOIN ns),
        |c1 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r0 r ON e.src = r.node GROUP BY e.dst),
        |r1 AS (SELECT r0.node,
        |              CAST(CASE WHEN r0.node % 10 = 0 THEN 1000000000000*15//100//ns.n ELSE 0 END
        |                   + 85 * coalesce(c1.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r0 CROSS JOIN ns LEFT JOIN c1 ON c1.dst = r0.node),
        |c2 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
        |r2 AS (SELECT r1.node,
        |              CAST(CASE WHEN r1.node % 10 = 0 THEN 1000000000000*15//100//ns.n ELSE 0 END
        |                   + 85 * coalesce(c2.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r1 CROSS JOIN ns LEFT JOIN c2 ON c2.dst = r1.node),
        |c3 AS (SELECT e.dst, sum(r.rank // e.deg) AS s
        |       FROM e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
        |r3 AS (SELECT r2.node,
        |              CAST(CASE WHEN r2.node % 10 = 0 THEN 1000000000000*15//100//ns.n ELSE 0 END
        |                   + 85 * coalesce(c3.s, 0) // 100 AS BIGINT) AS rank
        |       FROM r2 CROSS JOIN ns LEFT JOIN c3 ON c3.dst = r2.node)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin)),
    // HITS on the directed (un-symmetrized) half of the purchase graph:
    // hubs = suppliers, authorities = customers; integer mean
    // normalization per half-step (x // max(Σx // 1e9, 1)) keeps every
    // score an exact int64, so two unrolled rounds hash-match
    GraftQuery("x_graph_hits", GraphOps.hits, Some(
      """WITH e0 AS (SELECT DISTINCT l_suppkey*2 AS src, o_custkey*2+1 AS dst
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h0 AS (SELECT DISTINCT src AS node, CAST(1000000000 AS BIGINT) AS h FROM e0),
        |a1 AS (SELECT e0.dst AS node, sum(h0.h) AS a
        |       FROM e0 JOIN h0 ON e0.src = h0.node GROUP BY e0.dst),
        |at1 AS (SELECT sum(a) AS t FROM a1),
        |a1n AS (SELECT node, a // greatest(t // 1000000000, 1) AS a
        |        FROM a1 CROSS JOIN at1),
        |h1 AS (SELECT e0.src AS node, sum(a1n.a) AS h
        |       FROM e0 JOIN a1n ON e0.dst = a1n.node GROUP BY e0.src),
        |ht1 AS (SELECT sum(h) AS t FROM h1),
        |h1n AS (SELECT node, h // greatest(t // 1000000000, 1) AS h
        |        FROM h1 CROSS JOIN ht1),
        |a2 AS (SELECT e0.dst AS node, sum(h1n.h) AS a
        |       FROM e0 JOIN h1n ON e0.src = h1n.node GROUP BY e0.dst),
        |at2 AS (SELECT sum(a) AS t FROM a2),
        |a2n AS (SELECT node, a // greatest(t // 1000000000, 1) AS a
        |        FROM a2 CROSS JOIN at2),
        |h2 AS (SELECT e0.src AS node, sum(a2n.a) AS h
        |       FROM e0 JOIN a2n ON e0.dst = a2n.node GROUP BY e0.src),
        |ht2 AS (SELECT sum(h) AS t FROM h2),
        |h2n AS (SELECT node, h // greatest(t // 1000000000, 1) AS h
        |        FROM h2 CROSS JOIN ht2)
        |SELECT node, role, score FROM (
        |  SELECT node, 'hub' AS role, CAST(h AS BIGINT) AS score FROM h2n
        |  UNION ALL
        |  SELECT node, 'authority' AS role, CAST(a AS BIGINT) AS score FROM a2n)
        |ORDER BY node""".stripMargin)),
    // per-part triangle participation over the thresholded co-purchase
    // graph: Spark enumerates via degree-ordered orientation (wedge work
    // bounded by degeneracy), the oracle by id order — the triangle SET
    // is orientation-independent, so the hashes agree
    GraftQuery("x_graph_triangles", GraphOps.triangleCounts, Some(
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT pa, pb FROM (
        |        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
        |        FROM li a JOIN li b
        |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |        GROUP BY 1, 2) WHERE n >= 2),
        |t AS (SELECT e1.pa AS v1, e1.pb AS v2, e2.pb AS v3
        |      FROM e e1 JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
        |           JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb),
        |x AS (SELECT unnest([v1, v2, v3]) AS l_partkey FROM t)
        |SELECT l_partkey, count(*) AS n_triangles FROM x
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // k-core: iterative degree-threshold peel to the unique fixpoint;
    // the oracle unrolls FOUR rounds (≥ rounds-to-fixpoint at every SF,
    // extra rounds are no-ops on a fixpoint), degrees are exact integer
    // counts so survivors + within-core degrees hash-match
    GraftQuery("x_graph_kcore", GraphOps.kcore, headline = true, oracle = Some(
      s"""WITH $graphEdgeCtes,
        |s0 AS (SELECT DISTINCT src AS node FROM e1),
        |d1 AS (SELECT e1.src AS node, count(*) AS deg FROM e1
        |       JOIN s0 a ON e1.src = a.node JOIN s0 b ON e1.dst = b.node
        |       GROUP BY e1.src),
        |s1 AS (SELECT node FROM d1 WHERE deg >= ${GraphOps.KcoreK}),
        |d2 AS (SELECT e1.src AS node, count(*) AS deg FROM e1
        |       JOIN s1 a ON e1.src = a.node JOIN s1 b ON e1.dst = b.node
        |       GROUP BY e1.src),
        |s2 AS (SELECT node FROM d2 WHERE deg >= ${GraphOps.KcoreK}),
        |d3 AS (SELECT e1.src AS node, count(*) AS deg FROM e1
        |       JOIN s2 a ON e1.src = a.node JOIN s2 b ON e1.dst = b.node
        |       GROUP BY e1.src),
        |s3 AS (SELECT node FROM d3 WHERE deg >= ${GraphOps.KcoreK}),
        |d4 AS (SELECT e1.src AS node, count(*) AS deg FROM e1
        |       JOIN s3 a ON e1.src = a.node JOIN s3 b ON e1.dst = b.node
        |       GROUP BY e1.src)
        |SELECT node, deg FROM d4 WHERE deg >= ${GraphOps.KcoreK}
        |ORDER BY node""".stripMargin)),
    // log2-bucketed degree histogram — the skew diagnostic that sizes
    // the hot-key armor; bucket = |bin(deg)|-1 is an integer formula
    // shared verbatim with the oracle (floating log2 rounds differently
    // across engines at exact powers of two)
    GraftQuery("x_graph_degree_hist", GraphOps.degreeHistogram, Some(
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src)
        |SELECT length(bin(deg)) - 1 AS bucket, count(*) AS n_nodes,
        |       min(deg) AS min_deg, max(deg) AS max_deg,
        |       CAST(sum(deg) AS BIGINT) AS sum_deg
        |FROM d GROUP BY 1 ORDER BY bucket""".stripMargin)),
    // distributed Lloyd's k-means, hash-checked end-to-end: the DuckDB
    // oracle unrolls the same three integer-exact rounds (see kmeansCte)
    GraftQuery("x_cluster_kmeans", KmeansOps.kmeansAssign, Some(
      kmeansCte +
        """SELECT vec_id, CAST(cid AS INTEGER) AS cluster
          |FROM a3 ORDER BY vec_id""".stripMargin)),
    GraftQuery("x_cluster_kmeans_centroids", KmeansOps.kmeansCentroids, Some(
      kmeansCte +
        """SELECT CAST(cid AS INTEGER) AS cluster, CAST(pos AS INTEGER) AS dim,
          |       cval AS coord
          |FROM c2 ORDER BY cluster, dim""".stripMargin)),
    GraftQuery("x_cluster_kmeans_profile", KmeansOps.kmeansProfile, Some(
      kmeansCte +
        """SELECT CAST(cid AS INTEGER) AS cluster, count(*) AS n_vecs,
          |       CAST(sum(d) AS BIGINT) AS inertia
          |FROM a3 GROUP BY cid ORDER BY cluster""".stripMargin)),
    // SemDeDup: pair search bounded by the k-means cells, min-id
    // survivorship; the oracle recomputes within-cell cosine pairs over
    // the SAME unrolled-Lloyd assignment the kmeans queries hash on
    GraftQuery("x_cluster_semdedup", KmeansOps.semDedup, Some(
      kmeansCte +
        s""", e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |sp AS (SELECT y.vec_id AS vec_id, min(x.vec_id) AS witness_id
          |       FROM a3 x JOIN a3 y ON x.cid = y.cid AND x.vec_id < y.vec_id
          |       JOIN e ex ON ex.vec_id = x.vec_id JOIN e ey ON ey.vec_id = y.vec_id
          |       WHERE list_cosine_similarity(ex.v, ey.v) >= ${KmeansOps.SemTau}
          |       GROUP BY 1)
          |SELECT a3.vec_id, CAST(a3.cid AS INTEGER) AS cluster,
          |       sp.vec_id IS NULL AS kept, witness_id
          |FROM a3 LEFT JOIN sp ON a3.vec_id = sp.vec_id
          |ORDER BY a3.vec_id""".stripMargin)),
    GraftQuery("x_cluster_kmeans_balanced", (s, d) => KmeansOps.kmeansBalancedSample(s, d), Some(
      kmeansCte +
        """, sz AS (SELECT cid, count(*) AS n_vecs FROM a3 GROUP BY cid)
          |SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cluster,
          |       CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000 AS bucket,
          |       least(1.0, 64.0 / sz.n_vecs) AS rate
          |FROM a3 a JOIN sz USING (cid)
          |WHERE CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000
          |      < least(1.0, 64.0 / sz.n_vecs) * 1000.0
          |ORDER BY a.vec_id""".stripMargin)),
    // cross-modal curation capstone: text quality cut ∧ embedding
    // cluster balance, joined on the aligned doc/vec id space
    GraftQuery("x_curate_multimodal", KmeansOps.curateMultimodal, Some(
      kmeansCte +
        s""", sz AS (SELECT cid, count(*) AS n_vecs FROM a3 GROUP BY cid),
          |bal AS (SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cluster
          |        FROM a3 a JOIN sz USING (cid)
          |        WHERE CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 4)) AS INTEGER) % 1000
          |              < least(1.0, 64.0 / sz.n_vecs) * 1000.0),
          |s AS (SELECT doc_id, lang,
          |        $stopCountSql
          |          / len(string_split(text, ' ')) AS stop_ratio
          |      FROM documents),
          |m AS (SELECT lang, quantile_cont(stop_ratio, 0.5) AS lang_median
          |      FROM s GROUP BY lang)
          |SELECT s.doc_id, bal.cluster, s.lang, s.stop_ratio
          |FROM s JOIN m USING (lang) JOIN bal ON bal.vec_id = s.doc_id
          |WHERE s.stop_ratio <= m.lang_median
          |ORDER BY s.doc_id""".stripMargin)),
    // Davies–Bouldin (squared-scatter variant): per-cluster worst-neighbor
    // confusability over the SAME unrolled Lloyd trajectory — integral
    // scatter, exact centroid separations, one IEEE division per pair
    GraftQuery("x_cluster_db_index", KmeansOps.kmeansDbIndex, Some(
      kmeansCte +
        """, sc AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
          |           CAST(sum(d) AS BIGINT) // count(*) AS scatter
          |        FROM a3 GROUP BY cid),
          |cd AS (SELECT a.cid AS ci, b.cid AS cj,
          |         CAST(sum((a.cval - b.cval) * (a.cval - b.cval)) AS BIGINT) AS dc
          |       FROM c2 a JOIN c2 b ON a.pos = b.pos AND a.cid <> b.cid
          |       GROUP BY a.cid, b.cid),
          |r AS (SELECT cd.ci, cd.cj,
          |        CAST(si.scatter + sj.scatter AS DOUBLE) / CAST(cd.dc AS DOUBLE) AS rij
          |      FROM cd JOIN sc si ON si.cid = cd.ci JOIN sc sj ON sj.cid = cd.cj),
          |m AS (SELECT ci, max(rij) AS r_max FROM r GROUP BY ci),
          |pick AS (SELECT r.ci, min(r.cj) AS worst_j
          |         FROM r JOIN m ON r.ci = m.ci AND r.rij = m.r_max GROUP BY r.ci)
          |SELECT CAST(sc.cid AS INTEGER) AS cluster, sc.n_vecs, sc.scatter,
          |       CAST(pick.worst_j AS INTEGER) AS worst_j, m.r_max
          |FROM sc JOIN m ON m.ci = sc.cid JOIN pick ON pick.ci = sc.cid
          |ORDER BY cluster""".stripMargin)),
    GraftQuery("x_cluster_kmeans_purity", KmeansOps.kmeansPurity, Some(
      kmeansCte +
        """, l AS (SELECT a.cid, e.label, count(*) AS cnt
          |        FROM a3 a JOIN embeddings e USING (vec_id)
          |        GROUP BY a.cid, e.label),
          |p AS (SELECT cid, label, cnt,
          |             row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS rn,
          |             CAST(sum(cnt) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
          |      FROM l)
          |SELECT CAST(cid AS INTEGER) AS cluster, n_vecs, label AS top_label,
          |       cnt * 1000000 // n_vecs AS top_share_ppm
          |FROM p WHERE rn = 1 ORDER BY cluster""".stripMargin)),
    GraftQuery("x_embed_centroids", (s, d) => SimilarityOps.labelCentroids(s, d), Some(
      """WITH e AS (SELECT label,
        |                  unnest(embedding) AS x,
        |                  unnest(generate_series(0, len(embedding) - 1)) AS dim
        |           FROM embeddings)
        |SELECT label, CAST(dim AS INTEGER) AS dim,
        |       CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
        |         / count(*) / 1000000 AS centroid
        |FROM e GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin)),
    // nearest-class-centroid classification (Rocchio "domain tagger"):
    // floor-div scaled-int centroids per label, integer-exact argmin
    // assignment, and its confusion surface — both value-oracled via the
    // same CTE chain
    GraftQuery("x_embed_centroid_classify", EmbedOps.centroidClassify, Some(
      s"""WITH $classifyCtes
        |SELECT vec_id, label, pred, dist FROM ca ORDER BY vec_id""".stripMargin)),
    GraftQuery("x_eval_confusion", EmbedOps.confusionMatrix, Some(
      s"""WITH $classifyCtes
        |SELECT label, pred, CAST(count(*) AS BIGINT) AS n
        |FROM ca GROUP BY label, pred ORDER BY label, pred""".stripMargin)),
    // k-fold cross-validated accuracy: each fold held OUT of centroid
    // training — generalization, not the confusion matrix's
    // self-consistency; integer-exact end to end, folds by vec_id mod 5
    GraftQuery("x_eval_cv_accuracy", EmbedOps.cvAccuracy, Some(cvAccuracyOracle)),
    // ANN accuracy inside CORRECTNESS: raw recall telemetry (rows-only —
    // DuckDB cannot rerun the LSH side) + a value-checked floor gate (the
    // oracle expects passes=true, so a recall collapse goes red per-round)
    GraftQuery("x_sim_knn_recall", (s, d) => SimilarityOps.knnRecall(s, d), None),
    GraftQuery("x_sim_topk_quantized", SimilarityOps.topkQuantized, Some(
      """WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
        |           FROM embeddings),
        |s0 AS (SELECT vec_id, dv,
        |         list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
        |       FROM d),
        |e AS (SELECT vec_id,
        |        CASE WHEN scale = 0 THEN list_transform(dv, x -> CAST(0 AS DOUBLE))
        |             ELSE list_transform(dv, x -> CAST(CAST(floor(x / scale + 0.5) AS INTEGER) AS DOUBLE))
        |        END AS v
        |      FROM s0),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |s AS (SELECT q_id, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS cos FROM q, e)
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank,
        |       neighbor_id
        |FROM s QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin)),
    // product quantization: the oracle re-runs the SAME grouped Lloyd
    // rounds (subspace m as a grouping column of one CTE — not M copies),
    // so codebooks, codes AND the ADC ranking are all value equalities
    GraftQuery("x_sim_pq_codebooks", PqOps.pqCodebooks, Some(
      pqCte +
        """SELECT m, cid, spos AS dim, cval AS coord
          |FROM c1 ORDER BY m, cid, dim""".stripMargin)),
    GraftQuery("x_sim_pq_encode", PqOps.pqEncode, Some(
      pqCte +
        """SELECT vec_id, m, cid AS code FROM a2 ORDER BY vec_id, m""".stripMargin)),
    GraftQuery("x_sim_topk_pq", PqOps.topkPq, Some(pqTopkSql)),
    // the write-once/probe-many twin serves off the materialized
    // (codebooks, codes) parquet — SAME oracle, so "retrain-inline and
    // probe-from-index agree" is a hash equality; headline so the probe
    // regime's cost (the number a serving tier pays) is the one measured
    GraftQuery("x_sim_topk_pq_indexed", PqOps.topkPqIndexed, Some(pqTopkSql),
      headline = true),
    GraftQuery("x_sim_pq_recall_gate", PqOps.pqRecallGate, Some(
      """SELECT 10 AS n_queries, 10 AS k, true AS passes""")),
    // the composed IVF-PQ serving stack: the oracle chains the kmeans
    // CTE (prefixed k) and the PQ CTE — both single-sourced with their
    // own families — and replays the nprobe-of-K probe rule, so the
    // END-TO-END served ranking is a value equality across engines
    GraftQuery("x_sim_ivfpq_topk", PqOps.ivfPqTopk, Some(
      "WITH " + kmeansCtes("k") + "," + pqCtes("") +
        """, qcd AS (SELECT q.vec_id AS q_id, c.cid, sum((q.val - c.cval) * (q.val - c.cval)) AS d
          |          FROM ku q JOIN kc2 c USING (pos) WHERE q.vec_id < 10
          |          GROUP BY q.vec_id, c.cid),
          |qcell AS (SELECT q_id, cid AS cell FROM
          |           (SELECT q_id, cid, d,
          |                   row_number() OVER (PARTITION BY q_id ORDER BY d, cid) AS rn
          |            FROM qcd) WHERE rn <= 3),
          |cand AS (SELECT qc.q_id, a.vec_id FROM ka3 a JOIN qcell qc ON a.cid = qc.cell),
          |qd AS (SELECT q.vec_id AS q_id, c.m, c.cid, sum((q.val - c.cval) * (q.val - c.cval)) AS td
          |       FROM u q JOIN c1 c ON q.m = c.m AND q.spos = c.spos
          |       WHERE q.vec_id < 10 GROUP BY q.vec_id, c.m, c.cid),
          |adc AS (SELECT cd.q_id, a.vec_id AS neighbor_id, CAST(sum(t.td) AS BIGINT) AS adc_dist
          |        FROM cand cd JOIN a2 a ON cd.vec_id = a.vec_id
          |        JOIN qd t ON a.m = t.m AND a.cid = t.cid AND t.q_id = cd.q_id
          |        GROUP BY cd.q_id, a.vec_id)
          |SELECT q_id, CAST(rn AS INTEGER) AS rank, neighbor_id, adc_dist FROM
          | (SELECT q_id, neighbor_id, adc_dist,
          |         row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, neighbor_id) AS rn
          |  FROM adc) WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin)),
    GraftQuery("x_sim_ivfpq_recall_gate", PqOps.ivfPqRecallGate, Some(
      """SELECT 10 AS n_queries, 10 AS k, true AS passes""")),
    GraftQuery("x_sim_quant_recall_gate", (s, d) => SimilarityOps.quantRecallGate(s, d), Some(annRecallGateOracle("0.9"))),
    // sign-bit binary quantization: the packed code table, the Hamming
    // first-stage ranking AND the two-stage rerank are all deterministic
    // (integer distances, id tie-breaks), so unlike the LSH family the
    // whole binary serving path is value-oracled end-to-end; the recall
    // gate pins its accuracy vs the full-precision anchor on top
    GraftQuery("x_embed_quantize_binary", SimilarityOps.quantizeBinary, Some(
      "WITH " + binaryCtes + "SELECT vec_id, lo, hi FROM bc ORDER BY vec_id")),
    GraftQuery("x_sim_topk_hamming", SimilarityOps.topkHamming,
      Some(binaryTopkSql), headline = true),
    // the write-once/probe-many twin serves off the materialized 8-byte
    // code table — SAME oracle, so "pack-inline and probe-from-index
    // agree" is a hash equality; headline so the probe regime's cost
    // (what a binary-quantized tier pays per workload) is measured
    GraftQuery("x_sim_topk_hamming_indexed", SimilarityOps.topkHammingIndexed,
      Some(binaryTopkSql), headline = true),
    GraftQuery("x_sim_topk_binary_rerank", SimilarityOps.topkBinaryRerank, Some(
      "WITH " + binaryCtes +
        """, bshort AS (SELECT q_id, neighbor_id FROM
          |   (SELECT q_id, neighbor_id,
          |           row_number() OVER (PARTITION BY q_id ORDER BY hamming, neighbor_id) AS rn
          |    FROM bs) WHERE rn <= 64),
          |be AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |br AS (SELECT sh.q_id, sh.neighbor_id,
          |         list_cosine_similarity(qe.v, ne.v) AS cos
          |       FROM bshort sh JOIN be qe ON qe.vec_id = sh.q_id
          |                      JOIN be ne ON ne.vec_id = sh.neighbor_id)
          |SELECT q_id, CAST(rn AS INTEGER) AS rank, neighbor_id FROM
          | (SELECT q_id, neighbor_id, cos,
          |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
          |  FROM br) WHERE rn <= 10 ORDER BY q_id, rank""".stripMargin)),
    GraftQuery("x_sim_binary_recall_gate", SimilarityOps.binaryRecallGate, Some(annRecallGateOracle("0.4"))),
    // value-checked accuracy gates for the three remaining ANN serving
    // paths (previously rows-only): the oracle recomputes the exact-side
    // count and expects passes=true, so a recall collapse goes red
    GraftQuery("x_sim_ann_lsh_gate", SimilarityOps.annLshGate, Some(annRecallGateOracle("0.05"))),
    GraftQuery("x_sim_ann_multiprobe_gate", SimilarityOps.annMultiProbeGate, Some(annRecallGateOracle("0.05"))),
    GraftQuery("x_sim_ann_ivf_gate", SimilarityOps.annIvfGate, Some(annRecallGateOracle("0.30"))),
    GraftQuery("x_sim_knn_recall_gate", (s, d) => SimilarityOps.knnRecallGate(s, d), Some(
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |         list_cosine_similarity(a.v, b.v) AS cos
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |t AS (SELECT q_id,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
        |      FROM s QUALIFY rank <= 5)
        |SELECT CAST(count(*) AS INTEGER) AS n_exact,
        |       CAST(${SimilarityOps.KnnRecallFloor} AS DOUBLE) AS floor,
        |       true AS passes
        |FROM t""".stripMargin)),
    GraftQuery("x_dedup_embed_clusters",
      (s, d) => SimilarityOps.annEmbedClusters(s, d), None),
    // hash-green anchor for the clustering path: components over the exact
    // (gated) all-pairs cosine edge set, recursive-CTE transitive closure
    // as the oracle — same pattern as x_dedup_clusters
    GraftQuery("x_dedup_embed_clusters_exact",
      (s, d) => SimilarityOps.embedClustersExact(s, d), Some(
      """WITH RECURSIVE
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | good AS (SELECT a.vec_id AS va, b.vec_id AS vb
        |          FROM e a JOIN e b ON a.vec_id < b.vec_id
        |          WHERE list_cosine_similarity(a.v, b.v) >= 0.5),
        | edges AS (SELECT va AS src, vb AS dst FROM good
        |           UNION SELECT vb, va FROM good),
        | walk AS (
        |   SELECT src AS id, src AS reach FROM edges
        |   UNION
        |   SELECT w.id, g.dst FROM walk w JOIN edges g ON w.reach = g.src
        | )
        |SELECT min(reach) AS cluster_id, id AS vec_id FROM walk GROUP BY id
        |ORDER BY cluster_id, vec_id""".stripMargin)),
    GraftQuery("x_dedup_paragraph", PretrainOps.paragraphDedup,
      Some(paragraphDedupOracle), headline = true),
    // 100 TB twin of x_dedup_paragraph: the window keys are 128-bit
    // digests (16-byte exchange keys); shares the text-keyed oracle
    // because a digest collision is the only way the outputs can differ
    GraftQuery("x_dedup_paragraph_digest", PretrainOps.paragraphDedupDigest,
      Some(paragraphDedupOracle)),
    GraftQuery("x_decontaminate", PretrainOps.decontaminate,
      Some(decontamOracle), headline = true),
    // 100 TB twin of x_decontaminate: the broadcast gram index and the
    // probe key on 128-bit gram digests (16-byte keys) instead of
    // 8-token strings — output identical barring a digest collision, so
    // it shares the string-keyed oracle (cf. x_dedup_paragraph_digest)
    GraftQuery("x_decontaminate_digest", PretrainOps.decontaminateDigest,
      Some(decontamOracle)),
    // post-broadcast-era twin: a 256 KiB bloom sketch of the benchmark
    // grams prunes the exploded corpus-gram exchange BEFORE the exact
    // shuffle-confirm join — bit-identical output (no false negatives +
    // exact confirm), so it shares the string-keyed oracle
    GraftQuery("x_decontaminate_bloom", PretrainOps.decontaminateBloom,
      Some(decontamOracle)),
    // surgical decontamination: redact exactly the tokens covered by a
    // shared benchmark gram occurrence instead of dropping the doc;
    // oracle replays the covered-set arithmetic with nested lambdas
    GraftQuery("x_decontaminate_redact", PretrainOps.decontaminateRedact, Some(
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
        |                string_split(lower(text), ' ') AS tl FROM documents),
        |bgrams AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(tl) - ${PretrainOps.ContamGram - 1}),
        |             i -> array_to_string(list_slice(tl, i, i + ${PretrainOps.ContamGram - 1}), ' '))) AS g
        |           FROM toks WHERE doc_id % ${PretrainOps.BenchMod} = 0),
        |occ AS (SELECT doc_id, i AS p,
        |          array_to_string(list_slice(tl, i, i + ${PretrainOps.ContamGram - 1}), ' ') AS gram
        |        FROM toks, unnest(generate_series(1, len(tl) - ${PretrainOps.ContamGram - 1})) AS u(i)
        |        WHERE doc_id % ${PretrainOps.BenchMod} <> 0),
        |st AS (SELECT doc_id, list_sort(list(p)) AS starts
        |       FROM occ JOIN bgrams ON occ.gram = bgrams.g GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.t, coalesce(st.starts, CAST([] AS BIGINT[])) AS starts
        |      FROM toks t LEFT JOIN st USING (doc_id)
        |      WHERE t.doc_id % ${PretrainOps.BenchMod} <> 0),
        |f AS (SELECT doc_id, t, starts,
        |        list_filter(generate_series(1, len(t)),
        |          p -> len(list_filter(starts, s -> p >= s AND p <= s + ${PretrainOps.ContamGram - 1})) = 0) AS kept
        |      FROM r)
        |SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
        |       CAST(len(starts) AS INTEGER) AS n_matches,
        |       CAST(len(t) - len(kept) AS INTEGER) AS n_redacted,
        |       coalesce(array_to_string(list_transform(kept, p -> t[CAST(p AS INTEGER)]), ' '), '') AS clean_text
        |FROM f ORDER BY doc_id""".stripMargin)),
    // fuzzy decontamination: near-dup (trigram Jaccard >= 1/2) match of
    // corpus docs against the benchmark set — catches paraphrased eval
    // leakage the exact 8-gram rule misses; oracle recomputes every
    // corpus-vs-bench co-shingled pair and the per-doc rollup
    GraftQuery("x_decontaminate_fuzzy", PretrainOps.decontaminateFuzzy, Some(
      s"""WITH $trigramCtes,
        |prs AS (SELECT a.doc_id AS did, b.doc_id AS bench_id, count(*) AS c
        |        FROM tri a JOIN tri b ON a.sh = b.sh
        |        WHERE a.doc_id % ${PretrainOps.FuzzyBenchMod} <> 0
        |          AND b.doc_id % ${PretrainOps.FuzzyBenchMod} = 0 GROUP BY 1, 2),
        |nd AS (SELECT did, CAST(count(*) AS INTEGER) AS n_bench_nd,
        |              max(CAST(c AS DOUBLE) / (ca.n + cb.n - c)) AS best_jaccard
        |       FROM prs JOIN cnt ca ON did = ca.doc_id JOIN cnt cb ON bench_id = cb.doc_id
        |       WHERE 2 * c >= ca.n + cb.n - c GROUP BY 1)
        |SELECT t.doc_id, coalesce(n_bench_nd, 0) AS n_bench_nd,
        |       coalesce(best_jaccard, 0.0) AS best_jaccard,
        |       coalesce(n_bench_nd, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM cnt WHERE doc_id % ${PretrainOps.FuzzyBenchMod} <> 0) t
        |LEFT JOIN nd ON t.doc_id = nd.did
        |ORDER BY t.doc_id""".stripMargin)),
    GraftQuery("x_contam_score", PretrainOps.contaminationScore,
      Some(contamScoreOracle)),
    GraftQuery("x_contam_score_digest", PretrainOps.contaminationScoreDigest,
      Some(contamScoreOracle)),
    // eval-side novelty: per BENCH doc, the fraction of its grams never
    // seen in the training corpus — the memorization-risk profile an
    // eval release publishes next to the corpus-side report
    GraftQuery("x_bench_novelty", PretrainOps.benchNovelty, Some {
      val k1 = PretrainOps.ContamGram - 1
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - $k1),
        |         i -> array_to_string(list_slice(t, i, i + $k1), ' ')))) AS g
        |       FROM toks WHERE len(t) >= ${PretrainOps.ContamGram} AND doc_id % ${PretrainOps.BenchMod} = 0),
        |cg AS (SELECT DISTINCT unnest(list_distinct(list_transform(generate_series(1, len(t) - $k1),
        |         i -> array_to_string(list_slice(t, i, i + $k1), ' ')))) AS g
        |       FROM toks WHERE len(t) >= ${PretrainOps.ContamGram} AND doc_id % ${PretrainOps.BenchMod} <> 0),
        |sn AS (SELECT DISTINCT bg.g FROM bg JOIN cg USING (g)),
        |p AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_grams,
        |        CAST(count(sn.g) AS INTEGER) AS n_seen
        |      FROM bg LEFT JOIN sn ON bg.g = sn.g GROUP BY 1)
        |SELECT doc_id, n_grams, n_seen,
        |       CAST(1 AS DOUBLE) - CAST(n_seen AS DOUBLE) / n_grams AS novelty_frac
        |FROM p ORDER BY doc_id""".stripMargin
    }),
    GraftQuery("x_text_chunk", PretrainOps.chunkWindows, Some(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (SELECT doc_id, t,
        |        1 + CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS INTEGER) AS nc
        |      FROM toks),
        |e AS (SELECT doc_id,
        |        unnest(list_transform(generate_series(0, nc - 1),
        |          i -> {'chunk_idx': i, 'chunk': array_to_string(list_slice(t, i*24 + 1, i*24 + 32), ' ')})) AS p
        |      FROM c)
        |SELECT doc_id, CAST(p.chunk_idx AS INTEGER) AS chunk_idx, p.chunk AS chunk,
        |       CAST(len(string_split(p.chunk, ' ')) AS INTEGER) AS n_chunk_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin)),
    // content-defined chunking: boundaries are local window hashes, so
    // the oracle recomputes them position-by-position with the same md5
    GraftQuery("x_text_cdc_chunks", PretrainOps.cdcChunks, Some(
      s"""WITH $cdcChunkCtes
        |SELECT doc_id, CAST(j AS INTEGER) AS chunk_idx, CAST(sp AS INTEGER) AS start_pos,
        |       CAST(ends[CAST(j AS INTEGER)] - sp + 1 AS INTEGER) AS n_chunk_tokens,
        |       md5(array_to_string(t[CAST(sp AS INTEGER):CAST(ends[CAST(j AS INTEGER)] AS INTEGER)], ' ')) AS digest
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin)),
    // clamped (FastCDC min/max) variant: boundaries depend on the
    // previous boundary, so the oracle replays the rule chunk-by-chunk
    // with a recursive CTE — next end = first hash cut at least
    // CdcMinChunk past the previous end, force-closed at CdcMaxChunk,
    // capped at n (the final chunk is min-exempt)
    GraftQuery("x_text_cdc_chunks_clamped", PretrainOps.cdcChunksClamped, Some {
      val (mn, mx) = (PretrainOps.CdcMinChunk, PretrainOps.CdcMaxChunk)
      s"""WITH RECURSIVE
        |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |b AS (SELECT doc_id, t, len(t) AS n,
        |        list_filter(generate_series(${PretrainOps.CdcWindow}, len(t)),
        |          i -> CAST(('0x' || substr(md5(array_to_string(t[i-${PretrainOps.CdcWindow - 1}:i], ' ')), 1, 5)) AS BIGINT) % ${PretrainOps.CdcMask} = 0) AS cuts
        |      FROM d),
        |w AS (SELECT doc_id, 1 AS j, 1 AS sp,
        |        least(coalesce(list_min(list_filter(cuts, c -> c >= $mn AND c <= ${mx - 1})), $mx), n) AS ep
        |      FROM b
        |      UNION ALL
        |      SELECT w.doc_id, w.j + 1, w.ep + 1,
        |        least(coalesce(list_min(list_filter(b.cuts,
        |                c -> c >= w.ep + $mn AND c <= w.ep + ${mx - 1})), w.ep + $mx), b.n)
        |      FROM w JOIN b ON w.doc_id = b.doc_id
        |      WHERE w.ep < b.n)
        |SELECT w.doc_id AS doc_id, CAST(w.j AS INTEGER) AS chunk_idx,
        |       CAST(w.sp AS INTEGER) AS start_pos,
        |       CAST(w.ep - w.sp + 1 AS INTEGER) AS n_chunk_tokens,
        |       md5(array_to_string(b.t[CAST(w.sp AS INTEGER):CAST(w.ep AS INTEGER)], ' ')) AS digest
        |FROM w JOIN b ON w.doc_id = b.doc_id
        |ORDER BY doc_id, chunk_idx""".stripMargin
    }),
    // chunk-level near-dup pairs: the capped inverted index over the CDC
    // digests (same CTE chain — the chunking SQL cannot drift between
    // the chunk dump and the pair generator); exact-integer counts, one
    // IEEE division for the Jaccard
    GraftQuery("x_dedup_cdc_pairs", PretrainOps.cdcNearDupPairs, Some(
      s"""WITH $cdcPairCtes
        |SELECT doc_a, doc_b, CAST(n_shared AS INTEGER) AS n_shared,
        |       CAST(ca.n_chunks AS INTEGER) AS n_a, CAST(cb.n_chunks AS INTEGER) AS n_b,
        |       CAST(n_shared AS DOUBLE) / (ca.n_chunks + cb.n_chunks - n_shared) AS jaccard
        |FROM pr JOIN cnt ca ON ca.doc_id = pr.doc_a
        |        JOIN cnt cb ON cb.doc_id = pr.doc_b
        |WHERE n_shared >= 2
        |ORDER BY doc_a, doc_b""".stripMargin)),
    // survivor selection over the CDC graph: components (recursive-CTE
    // closure, the x_dedup_clusters pattern) keep their lowest
    // (stop-ratio, doc_id) member — edit chains collapse transitively
    GraftQuery("x_dedup_cdc_survivor", PretrainOps.cdcSurvivor, Some(
      s"""WITH RECURSIVE $cdcPairCtes,
        |pp AS (SELECT doc_a, doc_b FROM pr WHERE n_shared >= 2),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pp
        |          UNION SELECT doc_b, doc_a FROM pp),
        |walk AS (
        |  SELECT src AS id, src AS reach FROM edges
        |  UNION
        |  SELECT w.id, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
        |comp AS (SELECT min(reach) AS cluster_id, id AS doc_id FROM walk GROUP BY id),
        |qual AS (SELECT doc_id,
        |           $stopCountSql
        |             / len(string_split(text, ' ')) AS sr
        |         FROM documents),
        |rk AS (SELECT c.cluster_id, c.doc_id, q.sr,
        |         row_number() OVER (PARTITION BY c.cluster_id ORDER BY q.sr, c.doc_id) AS rn,
        |         count(*) OVER (PARTITION BY c.cluster_id) AS n_members
        |       FROM comp c JOIN qual q USING (doc_id))
        |SELECT cluster_id, doc_id AS keep_id, sr AS stop_ratio,
        |       CAST(n_members AS INTEGER) AS n_members
        |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),
    GraftQuery("x_pack_sequences", PretrainOps.packSequences, Some(
      """WITH d AS (SELECT source, doc_id,
        |             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d)
        |SELECT source, doc_id, n_tokens,
        |       cum - n_tokens AS tok_offset,
        |       CAST((cum - n_tokens) // 2048 AS INTEGER) AS seq_first,
        |       CAST((cum - 1) // 2048 AS INTEGER) AS seq_last
        |FROM c ORDER BY source, doc_id""".stripMargin)),
    GraftQuery("x_pack_sequences_bpe", PretrainOps.packSequencesBpe, Some(
      """WITH d AS (SELECT source, doc_id,
        |             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER) AS n_tokens
        |           FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d)
        |SELECT source, doc_id, n_tokens,
        |       cum - n_tokens AS tok_offset,
        |       CAST((cum - n_tokens) // 2048 AS INTEGER) AS seq_first,
        |       CAST((cum - 1) // 2048 AS INTEGER) AS seq_last
        |FROM c ORDER BY source, doc_id""".stripMargin)),
    // the trainer-facing inverse of packing: per (sequence, resident
    // doc) the in-sequence fragment offsets cross-doc attention masks
    // cut at; oracle replays the shard running sum + range explode
    GraftQuery("x_pack_boundaries", PretrainOps.packBoundaries, Some(
      s"""WITH d AS (SELECT source, doc_id,
        |             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d),
        |p AS (SELECT source, doc_id, n_tokens, cum - n_tokens AS tok_offset,
        |        CAST((cum - n_tokens) // ${PretrainOps.SeqLen} AS INTEGER) AS seq_first,
        |        CAST((cum - 1) // ${PretrainOps.SeqLen} AS INTEGER) AS seq_last
        |      FROM c),
        |e AS (SELECT source, doc_id, n_tokens, tok_offset, CAST(s AS INTEGER) AS seq_idx
        |      FROM p, unnest(generate_series(seq_first, seq_last)) AS u(s))
        |SELECT source, seq_idx, doc_id,
        |       CAST(greatest(tok_offset - CAST(seq_idx AS BIGINT) * ${PretrainOps.SeqLen}, 0) AS INTEGER) AS start_in_seq,
        |       CAST(least(tok_offset + n_tokens, (CAST(seq_idx AS BIGINT) + 1) * ${PretrainOps.SeqLen})
        |            - greatest(tok_offset, CAST(seq_idx AS BIGINT) * ${PretrainOps.SeqLen}) AS INTEGER) AS span_len
        |FROM e ORDER BY source, seq_idx, start_in_seq""".stripMargin)),
    // packing-regime capacity report: concat-split vs pad-per-doc
    // sequence counts and padding waste per shard, one map-side
    // combinable aggregation
    GraftQuery("x_pack_waste", PretrainOps.packWaste, Some {
      val l = PretrainOps.SeqLen
      s"""WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |g AS (SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
        |        CAST(sum(n) AS BIGINT) AS total_tokens,
        |        CAST(sum((n + ${l - 1}) // $l) AS BIGINT) AS seqs_padded
        |      FROM d GROUP BY 1)
        |SELECT source, n_docs, total_tokens,
        |       (total_tokens + ${l - 1}) // $l AS seqs_concat, seqs_padded,
        |       ((total_tokens + ${l - 1}) // $l) * $l - total_tokens AS waste_concat,
        |       seqs_padded * $l - total_tokens AS waste_padded
        |FROM g ORDER BY source""".stripMargin
    }),
    GraftQuery("x_pack_length_buckets", PretrainOps.lengthBuckets, Some(
      """WITH d AS (SELECT CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS INTEGER) AS n_tokens
        |           FROM documents)
        |SELECT CAST(floor(n_tokens / 16) AS INTEGER) * 16 AS bucket_lo,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |       min(n_tokens) AS min_tokens,
        |       max(n_tokens) AS max_tokens
        |FROM d GROUP BY bucket_lo ORDER BY bucket_lo""".stripMargin)),
    GraftQuery("x_sim_ann_multiprobe", SimilarityOps.annLshMultiProbe, None),
    GraftQuery("x_sim_ann_ivf", (s, d) => SimilarityOps.annIvf(s, d), None),
    GraftQuery("x_split_hash", SamplingOps.splitHash, Some(
      """SELECT doc_id,
        |       CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 AS bucket,
        |       CASE WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 90 THEN 'train'
        |            WHEN CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 100 < 95 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin)),
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
        |       true AS passes FROM documents""".stripMargin)))

  def all: Seq[GraftQuery] = core ++ joins ++ windows ++ sets ++ extensions

  def byName(name: String): GraftQuery =
    all.find(_.name == name).getOrElse(sys.error(s"unknown query: $name"))
}
