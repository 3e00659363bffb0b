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
  private[graft] val stopCountSql: String =
    "len(list_filter(string_split(text, ' '), t -> t IN (" +
      graft.ops.TextOps.stopwords.map(w => s"'$w'").mkString(",") + ")))"

  /** Filter-funnel oracle: rule booleans once in `b`, every readout a
    * conditional sum in `a`, stage rows GENERATED from one template —
    * mirrors CurationOps.filterFunnel/funnelRules (the stopword floor
    * reuses [[stopCountSql]], the punct ceiling the fleiss third
    * rater's expression). */
  private[graft] val filterFunnelOracle: String = {
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
  private[graft] val graphEdgeCtes: String =
    """e0 AS (SELECT DISTINCT l_suppkey*2 AS src, o_custkey*2+1 AS dst
      |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e1 AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin

  /** Support-filtered co-purchase edge set `e` (pa < pb) + id-ordered
    * triangle list `t` (v1, v2, v3) — ONE chain shared by the
    * x_graph_triangles and x_graph_transitivity oracles, mirroring
    * GraphOps.coEdges/trianglesOf (the oracle enumerates by id order;
    * the triangle SET is orientation-independent). */
  private[graft] val coTriangleCtes: String =
    s"""li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT pa, pb FROM (
      |        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
      |        FROM li a JOIN li b
      |          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |        GROUP BY 1, 2) WHERE n >= ${graft.ops.GraphOps.TriMinSupport}),
      |t AS (SELECT e1.pa AS v1, e1.pb AS v2, e2.pb AS v3
      |      FROM e e1 JOIN e e2 ON e2.pa = e1.pa AND e2.pb > e1.pb
      |           JOIN e e3 ON e3.pa = e1.pb AND e3.pb = e2.pb)""".stripMargin

  /** Vocabulary-richness oracle: both gram lengths rendered from ONE
    * panel template over a parameterized gram source (the
    * filterFunnelOracle rule), mirroring TextOps.vocabRichness. */
  private[graft] val richnessOracle: String = {
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
  private[graft] val mmrOracle: String = {
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
  private[graft] def annRecallGateOracle(floorLit: String): String =
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
  private[graft] val revenueSql: String =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** doc → distinct-trigram relation with per-doc counts (toks → tri →
    * cnt) — the shared head of every n-gram near-dup / containment /
    * fuzzy-decontamination / split-leakage oracle. Rendered ONCE (the
    * evalSummaryTail rule applied to the dedup family): a threshold or
    * shingling tweak edits one definition, never a drifted copy. */
  private[graft] val trigramCtes: String =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |tri AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      |        FROM toks WHERE len(t) >= 3),
      |cnt AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id)""".stripMargin

  private[graft] val ngramJaccardOracle: String =
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
  private[graft] val paragraphCtes: String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |paras AS (SELECT doc_id,
      |            unnest(list_transform(generate_series(0, CAST(ceil(len(t) / 16.0) AS INTEGER) - 1),
      |              i -> {'para_idx': i, 'para': array_to_string(list_slice(t, i*16 + 1, i*16 + 16), ' ')})) AS pp
      |          FROM toks),
      |p2 AS (SELECT doc_id, CAST(pp.para_idx AS INTEGER) AS para_idx, pp.para AS para FROM paras)""".stripMargin

  /** Per-doc reassembly rollup over a `kept` paragraph relation — the
    * (n_paras, n_kept, clean_text) readout every sub-doc filter ends
    * in; the chooser of `kept` is the only thing that varies. */
  private[graft] val paragraphRollupSql: String =
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
  private[graft] val paragraphDedupOracle: String =
    s"""WITH $paragraphCtes,
      |kept AS (SELECT * FROM p2
      |         QUALIFY row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) = 1),
      |$paragraphRollupSql""".stripMargin

  /** Shared by x_quality_classifier AND its broadcast-join twin: the
    * hashing trick (md5 → 20-bit bucket) and the pseudo-weight derivation
    * (md5 of 'w'+bucket → [-500000, 500000]) replayed in DuckDB, so both
    * physical plans hash against one logit definition. */
  private[graft] val qualityClassifierCtes: String =
    """d AS (SELECT doc_id, text, lang, string_split(lower(text), ' ') AS t FROM documents),
      |s AS (SELECT doc_id, text, lang, CAST(len(t) AS INTEGER) AS n_tokens,
      |        CAST(list_sum(list_transform(t,
      |          tok -> CAST(('0x' || substr(md5('w' || CAST(CAST(('0x' || substr(md5(tok), 1, 5)) AS BIGINT) % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 1000001 - 500000)) AS BIGINT) AS logit
      |      FROM d)""".stripMargin

  private[graft] val qualityClassifierOracle: String =
    s"""WITH $qualityClassifierCtes
      |SELECT doc_id, n_tokens, logit, logit > 0 AS keep
      |FROM s ORDER BY doc_id""".stripMargin

  /** 2×2 confusion cells (classifier keep vs stopword gold, through
    * `cm`) — shared by the Cohen-kappa and MCC oracles so the cell
    * source cannot drift between agreement metrics. Mirrors
    * TextOps.confusionCells. */
  private[graft] val confusionCellCtes: String =
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
  private[graft] val raterVotesCtes: String =
    s"""$qualityClassifierCtes,
      |g AS (SELECT (CASE WHEN logit > 0 THEN 1 ELSE 0 END)
      |           + (CASE WHEN $stopCountSql / len(string_split(text, ' ')) >= 0.1 THEN 1 ELSE 0 END)
      |           + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) < 0.1 THEN 1 ELSE 0 END) AS k
      |      FROM s)""".stripMargin

  /** The fixed-width clamped logit bin (the calibration bucketing) —
    * one definition shared by the calibration, isotonic, ECE and
    * Kendall oracles. */
  private[graft] val logitBinSql: String =
    "least(greatest(CAST(floor(CAST(logit AS DOUBLE) / 2000000.0) AS BIGINT), -4), 4)"

  /** Calibration oracle: bins over the SAME logit CTE the classifier
    * pair is judged against, gold = the stop-ratio rule shared with
    * x_text_quality — single-source on both signals. */
  private[graft] val classifierCalibrationOracle: String =
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
  private[graft] val spineHeadCtes: String =
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
  private[graft] val hourlySpineCtes: String =
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
  private[graft] val hwRecursiveCtes: String =
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
  private[graft] val isotonicCalibrationOracle: String =
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
  private[graft] val dsirCtes: String =
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
  private[graft] val goodPairsCtes: String =
    """prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |        FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |good AS (SELECT doc_a, doc_b FROM prs
      |         JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
      |         WHERE 3 * n_common >= ca.n + cb.n)""".stripMargin

  /** The per-pair clipped-gram chain (… → CTE `o` carrying len_a/len_b,
    * m1..m4, t1..t4 per verified near-dup pair) — shared by the BLEU
    * and ROUGE oracles, mirroring TextOps.bleuPerPair: one gram
    * currency in SQL too, so the two metrics cannot drift on
    * tokenization or clipping. */
  private[graft] val bleuPairCtes: String =
    s"""$trigramCtes,
      |$goodPairsCtes,
      |mem AS (SELECT doc_a AS doc_id FROM good UNION SELECT doc_b FROM good),
      |tkn AS (SELECT d.doc_id, string_split(lower(d.text), ' ') AS tk
      |        FROM documents d JOIN mem USING (doc_id)),
      |lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM tkn),
      |gr AS (SELECT doc_id, n.n AS n,
      |         unnest(list_transform(generate_series(1, len(tk) - n.n + 1),
      |           i -> array_to_string(tk[i:i+n.n-1], ' '))) AS gram
      |       FROM tkn CROSS JOIN (VALUES (1), (2), (3), (4)) n(n)
      |       WHERE len(tk) >= n.n),
      |gtf AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS tf
      |        FROM gr GROUP BY 1, 2, 3),
      |mm AS (SELECT g.doc_a, g.doc_b,
      |         sum(CASE WHEN a.n = 1 THEN least(a.tf, b.tf) END) AS mm1,
      |         sum(CASE WHEN a.n = 2 THEN least(a.tf, b.tf) END) AS mm2,
      |         sum(CASE WHEN a.n = 3 THEN least(a.tf, b.tf) END) AS mm3,
      |         sum(CASE WHEN a.n = 4 THEN least(a.tf, b.tf) END) AS mm4
      |       FROM good g JOIN gtf a ON a.doc_id = g.doc_a
      |                   JOIN gtf b ON b.doc_id = g.doc_b AND b.n = a.n AND b.gram = a.gram
      |       GROUP BY 1, 2),
      |o AS (SELECT g.doc_a, g.doc_b, la.len AS len_a, lb.len AS len_b,
      |        CAST(coalesce(mm1, 0) AS BIGINT) AS m1, la.len AS t1,
      |        CAST(coalesce(mm2, 0) AS BIGINT) AS m2, CAST(greatest(la.len - 1, 0) AS BIGINT) AS t2,
      |        CAST(coalesce(mm3, 0) AS BIGINT) AS m3, CAST(greatest(la.len - 2, 0) AS BIGINT) AS t3,
      |        CAST(coalesce(mm4, 0) AS BIGINT) AS m4, CAST(greatest(la.len - 3, 0) AS BIGINT) AS t4
      |      FROM good g JOIN lens la ON la.doc_id = g.doc_a
      |                  JOIN lens lb ON lb.doc_id = g.doc_b
      |      LEFT JOIN mm ON mm.doc_a = g.doc_a AND mm.doc_b = g.doc_b)""".stripMargin

  /** Transitive-closure clustering over the exact Jaccard ≥ 1/2 pair set
    * (the ngramJaccardOracle threshold) ending in `cl` = (cluster_id,
    * doc_id) — shared by x_dedup_clusters AND the per-cluster quality
    * survivor so both hash against ONE clustering definition. */
  private[graft] val nearDupClustersCtes: String =
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

  private[graft] val monthlyAggEventsOracle: String =
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
  private[graft] def scaledUnnestCte(p: String): String =
    s"""${p}u AS (
      |  SELECT vec_id, pos, CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS val
      |  FROM (SELECT vec_id, unnest(embedding) AS x,
      |               unnest(generate_series(0, len(embedding) - 1)) AS pos
      |        FROM embeddings))""".stripMargin

  private[graft] def kmeansCtes(p: String): String =
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

  private[graft] val kmeansCte: String = "WITH " + kmeansCtes("")

  /** Grouped-Lloyd CTE for the PQ family — [[graft.ops.PqOps]]'s two
    * integer-exact assignment rounds replayed with the subspace index m
    * as a grouping column (m = pos div 16, spos = pos mod 16): c0 seeds
    * from the first 16 vectors' sub-slices, a1/a2 argmin per (vec_id, m)
    * with ties to the lowest code, s1 floor-div means per (m, cid, spos),
    * empty clusters carry c0. Shared by codebooks / encode / ADC top-k so
    * the three surfaces are judged against ONE training trajectory. */
  private[graft] def pqCtes(p: String): String =
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

  private[graft] val pqCte: String = "WITH " + pqCtes("")

  /** ADC top-k oracle — shared by the retrain-inline and the
    * probe-from-index PQ entries (one SQL so their agreement is a hash
    * equality, the qualityClassifier pattern). */
  private[graft] val pqTopkSql: String =
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
  private[graft] val binaryCtes: String =
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
  private[graft] val binaryTopkSql: String =
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
  private[graft] val bm25BaseCtes: String =
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
  private[graft] def bm25ScoringCtes(qn: String, sfx: String): String =
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

  private[graft] val bm25ScoreCtes: String =
    bm25BaseCtes + ",\n" + bm25ScoringCtes("q", "")

  /** The PRF CTE chain on top of the round-1 scores: top-10 feedback
    * docs → top-3 new terms by in-feedback frequency (original terms
    * anti-joined away, ties on term) → round-2 scoring over
    * q ∪ expansion. Shared by the run dump and the PRF-eval runr. */
  private[graft] val bm25PrfChain: String =
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

  private[graft] val bm25PrfOracle: String =
    s"""WITH $bm25ScoreCtes,
      |$bm25PrfChain
      |SELECT q_id, CAST(rn AS INTEGER) AS rank, doc_id, score FROM
      | (SELECT q_id, doc_id, score,
      |         row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
      |  FROM sc2) WHERE rn <= 10
      |ORDER BY q_id, rank""".stripMargin

  /** The PRF round-2 ranking as a `runr` definition (nested WITH — the
    * inner chain resolves the outer tok/q/sc CTEs). */
  private[graft] val prfRunrDef: String =
    s"""WITH $bm25PrfChain
      |SELECT q_id, doc_id,
      |       CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      |FROM sc2 QUALIFY rank <= 10""".stripMargin

  private[graft] val evalPrfSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(prfRunrDef)},
      |$evalSummaryTail""".stripMargin

  /** Ideal-DCG prefix-sum lookup as a CASE over the literal table
    * generated from EvalOps.NdcgSW — the SAME constants the Spark plan
    * carries, so the one transcendental (log2) never runs in either
    * engine's query. */
  private[graft] def ndcgSwCase(expr: String): String =
    s"CASE least($expr, 10) " +
      graft.ops.EvalOps.NdcgSW.zipWithIndex
        .map { case (v, i) => s"WHEN $i THEN $v" }.mkString(" ") +
      " ELSE 0 END"

  /** NDCG CTE chain over the shared BM25 score CTEs: graded qrels
    * (grade = distinct query terms present), literal-weight DCG, and
    * ideal DCG folded over the per-(query, grade) COUNT table — the
    * frequency-table form the Spark plan uses, mirrored. */
  private[graft] def ndcgCtesFor(runrDef: String): String = {
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

  private[graft] lazy val ndcgPerQueryOracle: String =
    s"""WITH ${ndcgCtesFor(bm25RunrDef)}
      |SELECT q_id, dcg_scaled, idcg_scaled, ndcg FROM nper ORDER BY q_id""".stripMargin

  /** Macro mean folds the per-query ndcg doubles as a LEFT-ASSOCIATED
    * chain in static query order — parenthesized identically to the
    * Spark fold (the Bradley–Terry IEEE-order discipline). */
  private[graft] def ndcgSummaryOracleFor(runrDef: String): String = {
    val chain = graft.ops.RetrievalOps.DefaultQueries.map { case (q, _) =>
      s"coalesce(max(CASE WHEN q_id = $q THEN ndcg END), 0.0)"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH ${ndcgCtesFor(runrDef)}
      |SELECT CAST(${graft.ops.RetrievalOps.DefaultQueries.size} AS INTEGER) AS n_queries,
      |       CAST(count(*) AS INTEGER) AS n_scored,
      |       $chain / ${graft.ops.RetrievalOps.DefaultQueries.size}.0 AS mean_ndcg
      |FROM nper""".stripMargin
  }

  private[graft] lazy val ndcgSummaryOracle: String = ndcgSummaryOracleFor(bm25RunrDef)
  private[graft] lazy val ndcgRrfSummaryOracle: String = ndcgSummaryOracleFor(rrfRunrDef)
  private[graft] lazy val ndcgPrfSummaryOracle: String = ndcgSummaryOracleFor(prfRunrDef)

  /** Shared BM25 oracle (inline and index-probe forms serve identical
    * rows). */
  private[graft] val bm25Oracle: String =
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
  private[graft] val qlmOracle: String =
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
  private[graft] val rrfOracle: String =
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
  private[graft] def evalPerQueryCtesFor(runrDef: String): String =
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
  private[graft] def rboOracleFor(runbDef: String): String = {
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
  private[graft] val bm25RunrDef: String =
    """SELECT q_id, doc_id,
      |           CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank
      |         FROM sc QUALIFY rank <= 10""".stripMargin

  /** The RRF hybrid top-10 as the `runr` definition — the same fused
    * ranking rrfOracle serves, restated over the shared `sc` scores
    * plus the dense cosine list. */
  private[graft] val rrfRunrDef: String =
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

  private[graft] val evalPerQueryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(bm25RunrDef)}
      |SELECT q_id, n_rel, n_hit, first_rel_rank, rr_scaled, ap_scaled,
      |       CAST(n_hit AS DOUBLE) / 10 AS precision_at_k,
      |       CASE WHEN n_rel > 0 THEN CAST(n_hit AS DOUBLE) / n_rel ELSE 0.0 END AS recall
      |FROM per ORDER BY q_id""".stripMargin

  /** The one-row summary tail shared by every evaluated run. */
  private[graft] def evalSummaryTail: String =
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

  private[graft] val evalRrfSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(rrfRunrDef)},
      |$evalSummaryTail""".stripMargin

  private[graft] val evalSummaryOracle: String =
    s"""WITH ${evalPerQueryCtesFor(bm25RunrDef)},
      |$evalSummaryTail""".stripMargin

  /** Nearest-class-centroid CTE chain (through `ca` = per-vector
    * vec_id, true label, pred, dist): scaled-int64 view, floor-div
    * class means, integer squared distances, argmin ties to the lowest
    * label — mirrors EmbedOps.centroidClassify step for step. Shared by
    * the assignment dump and the confusion-matrix oracle. */
  private[graft] def scaledVecCte: String =
    """cu AS (SELECT vec_id, label, pos,
      |         CAST(floor(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS val
      |       FROM (SELECT vec_id, label, unnest(embedding) AS x,
      |                    unnest(generate_series(0, len(embedding) - 1)) AS pos
      |             FROM embeddings))""".stripMargin

  private[graft] def classifyCtes: String =
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
  private[graft] def cvAccuracyOracle: String = {
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
  private[graft] def driftCountCtes: String =
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
  private[graft] def ksDriftCtes: String =
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
  private[graft] def kcenterCtes: String = {
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
  private[graft] def sourceKsCtes: String =
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

  private[graft] def sourceDriftCtes: String =
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
  private[graft] def q1PricingOracle: String =
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
  private[graft] def welchMomentsTail(keys: Seq[String]): String = {
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

  private[graft] val welchMomentsCtes: String =
    s"""pu AS (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
      |            FROM events GROUP BY user_id),
      |${welchMomentsTail(Nil)}""".stripMargin

  /** Decontamination oracles — single source shared by the string-keyed
    * operators and their digest-keyed 100 TB twins (the digest re-keys
    * the broadcast index only; output rows are identical barring a
    * ~n²/2¹²⁹ collision, so the twins must not drift apart in SQL). */
  private[graft] def decontamOracle: String =
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

  private[graft] def contamScoreOracle: String =
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

  private[graft] def cdcChunkCtes: String =
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
  private[graft] def cdcPairCtes: String =
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
  private[graft] def mwCtes: String =
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
  private[graft] def weatherMonthlyOracle: String =
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
  private[graft] def weatherMaCte: String =
    """ma AS (SELECT city, date_trunc('month', date) AS month,
      |              CAST(avg(temperatureC) AS REAL) AS avg_temp_c,
      |              CAST(sum(rainfallMm) AS REAL) AS total_rain_mm,
      |              TIMESTAMP '2024-02-01 00:00:00' AS warehouse_load_time
      |       FROM dw GROUP BY 1, 2)""".stripMargin

  /** Shared pre/post per-user cent CTE (`pu`) — mirrors
    * `EventOps.prePostPerUser` (one cutoff, one cent currency) so the
    * CUPED and DiD oracles cannot drift on what pre/post mean. */
  private[graft] def abPrePostCte: String =
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
  private[graft] def prefCtes: String = {
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
  private[graft] def btRound(name: String, prev: String): String = {
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

  def all: Seq[GraftQuery] = core ++ joins ++ windows ++ sets ++
    RegistryEventsText.entries ++ RegistryDedupSim.entries ++
    RegistryDriftCuration.entries

  def byName(name: String): GraftQuery =
    all.find(_.name == name).getOrElse(sys.error(s"unknown query: $name"))
}
