package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, transform}
import graft.ops._
import graft.Registry._

/** Registry shard: deduplication (exact/digest/near/minhash/semdedup),
  * similarity + ANN (LSH/IVF/PQ/Hamming/kNN), retrieval (BM25/QLM/RRF)
  * and their eval gates, graph analytics, clustering, decontamination,
  * and sequence packing. Pure motion from Registry.scala (round-14
  * decomposition); seams live in [[Registry]]. */
private[graft] object RegistryDedupSim {

  val entries: Seq[GraftQuery] = Seq(
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
    // rich-club curve: φ(k) per fixed threshold — numerators and node
    // counts are exact conditional COUNTS over ONE degree-annotated
    // edge pass (2·E_{>k} IS the symmetrized row count), φ one double
    // division; the per-k rows are GENERATED from GraphOps.RichClubKs
    // so Spark and the oracle can never disagree on the threshold list
    GraftQuery("x_graph_richclub", GraphOps.richClub, Some {
      val sums = GraphOps.RichClubKs.map(k =>
        s"""        sum(CASE WHEN dx > $k AND dy > $k THEN 1 ELSE 0 END) AS e2_$k""")
        .mkString(",\n")
      val nsums = GraphOps.RichClubKs.map(k =>
        s"""        sum(CASE WHEN deg > $k THEN 1 ELSE 0 END) AS n_$k""")
        .mkString(",\n")
      val rows = GraphOps.RichClubKs.map(k =>
        s"""SELECT $k AS k, CAST(n_$k AS BIGINT) AS n_rich,
           |       CAST(e2_$k AS BIGINT) AS e2_rich,
           |       CASE WHEN n_$k >= 2
           |            THEN CAST(e2_$k AS DOUBLE)
           |                 / CAST(n_$k * (n_$k - 1) AS DOUBLE)
           |       END AS phi FROM ea CROSS JOIN na""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src AS node, count(*) AS deg FROM e1 GROUP BY src),
        |x AS (SELECT da.deg AS dx, db.deg AS dy
        |      FROM e1 JOIN d da ON e1.src = da.node JOIN d db ON e1.dst = db.node),
        |ea AS (SELECT
        |$sums
        |       FROM x),
        |na AS (SELECT
        |$nsums
        |       FROM d)
        |SELECT * FROM (
        |$rows
        |) ORDER BY k""".stripMargin
    }),
    // k-hop BFS reach from the max-degree hub: exact frontier/visited
    // SET sizes per hop, the seed a deterministic argmax; hops unrolled
    // from the SAME GraphOps.KhopHops literal into DuckDB CTEs
    GraftQuery("x_graph_khop", GraphOps.khopReach, Some {
      val hops = (1 to GraphOps.KhopHops).map { h =>
        s"""f$h AS (SELECT DISTINCT e1.dst AS node FROM e1 JOIN f${h - 1} f ON e1.src = f.node
           |        WHERE e1.dst NOT IN (SELECT node FROM v${h - 1})),
           |v$h AS (SELECT node FROM v${h - 1} UNION ALL SELECT node FROM f$h)""".stripMargin
      }.mkString(",\n")
      val rows = (0 to GraphOps.KhopHops).map(h =>
        s"""SELECT $h AS hop, (SELECT count(*) FROM f$h) AS frontier_size,
           |       (SELECT count(*) FROM v$h) AS reach_size""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH $graphEdgeCtes,
        |d AS (SELECT src AS node, count(*) AS deg FROM e1 GROUP BY src),
        |f0 AS (SELECT node FROM d ORDER BY deg DESC, node LIMIT 1),
        |v0 AS (SELECT node FROM f0),
        |$hops
        |SELECT * FROM (
        |$rows
        |) ORDER BY hop""".stripMargin
    }),
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
      s"""WITH $coTriangleCtes,
        |x AS (SELECT unnest([v1, v2, v3]) AS l_partkey FROM t)
        |SELECT l_partkey, count(*) AS n_triangles FROM x
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    // global transitivity C = 3T/W on the same co-purchase seams:
    // exact integer triangle/edge counts, HUGEINT/decimal wedge mass
    // Σd(d−1), ONE division (folded to 6T/w2 so the integer currency
    // survives); zero wedges → NULL in both engines
    GraftQuery("x_graph_transitivity", GraphOps.globalTransitivity, Some(
      s"""WITH $coTriangleCtes,
        |d AS (SELECT p, count(*) AS d FROM (SELECT unnest([pa, pb]) AS p FROM e) GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
        |w AS (SELECT sum(CAST(d AS HUGEINT) * (d - 1)) AS w2 FROM d),
        |tc AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM t)
        |SELECT n_edges, n_triangles,
        |       CASE WHEN w2 > 0
        |            THEN CAST(CAST(n_triangles AS HUGEINT) * 6 AS DOUBLE) / CAST(w2 AS DOUBLE)
        |       END AS transitivity
        |FROM a CROSS JOIN w CROSS JOIN tc""".stripMargin)),
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
  )
}
