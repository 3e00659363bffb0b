package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, transform}
import graft.ops._
import graft.Registry._

/** Registry shard: event analytics, time series, experimentation
  * (CUPED/Welch/sequential/MW/DiD), preference data, and the text /
  * quality / classifier-eval panels. Pure motion from Registry.scala
  * (round-14 decomposition) — the oracle seams stay in [[Registry]]
  * (one definition, imported here) so twin SQL cannot drift apart
  * across shards. Aggregated by Registry.all; entry ORDER is
  * load-bearing for round-over-round bench comparability. */
private[graft] object RegistryEventsText {

  val entries: Seq[GraftQuery] = Seq(
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
    // Wilson score interval per event type: the binomial CI that stays
    // inside [0,1] where Wald collapses; exact (n, k) counts into one
    // fixed IEEE tree, z as a string-cast literal (the FDR-boundary
    // one-ulp rule); published bounds clamped to [0,1] in BOTH engines
    // (containment is only algebraic — at p̂ ∈ {0,1} roundings can land
    // one ulp outside; r14 ADVICE)
    GraftQuery("x_event_wilson_ci", EventOps.eventWilsonCi, Some {
      val z = s"CAST('${EventOps.ZAlphaHalf}' AS DOUBLE)"
      s"""WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CASE WHEN value >= ${EventOps.WilsonValueFloor} THEN 1 ELSE 0 END) AS BIGINT) AS k
        |           FROM events GROUP BY 1),
        |p AS (SELECT event_type, n, k,
        |        CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat FROM a)
        |SELECT event_type, n, k, p_hat,
        |       greatest((p_hat + $z * $z / (2.0 * CAST(n AS DOUBLE))
        |         - $z * sqrt(p_hat * (1.0 - p_hat) / CAST(n AS DOUBLE)
        |             + $z * $z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |         / (1.0 + $z * $z / CAST(n AS DOUBLE)), CAST(0.0 AS DOUBLE)) AS wilson_lo,
        |       least((p_hat + $z * $z / (2.0 * CAST(n AS DOUBLE))
        |         + $z * sqrt(p_hat * (1.0 - p_hat) / CAST(n AS DOUBLE)
        |             + $z * $z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |         / (1.0 + $z * $z / CAST(n AS DOUBLE)), CAST(1.0 AS DOUBLE)) AS wilson_hi
        |FROM p ORDER BY event_type""".stripMargin
    }),
    // Cohen's d + Hedges g off the SAME welch moment seam: pooled-SD
    // effect size, the rational Hedges correction 1 − 3/(4n − 9) (the
    // exact J needs a gamma), Cohen band literals; NULL on degenerate
    // cohorts in both engines
    GraftQuery("x_ab_cohens_d", EventOps.abCohensD, Some(
      s"""WITH $welchMomentsCtes,
        |s AS (SELECT n0, n1, mean0 - mean1 AS diff,
        |        (CAST(n0 AS DOUBLE) - 1.0) * v0 + (CAST(n1 AS DOUBLE) - 1.0) * v1 AS ssq,
        |        CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0 AS dof
        |      FROM wde),
        |d AS (SELECT n0, n1, diff,
        |        CASE WHEN dof > 0.0 AND ssq > 0.0
        |             THEN diff / sqrt(ssq / dof) END AS cohens_d,
        |        1.0 - 3.0 / (4.0 * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) - 9.0) AS hedges_j
        |      FROM s)
        |SELECT n0, n1, diff, cohens_d,
        |       cohens_d * hedges_j AS hedges_g,
        |       CASE WHEN cohens_d IS NOT NULL THEN
        |         CASE WHEN abs(cohens_d) < 0.2 THEN 'negligible'
        |              WHEN abs(cohens_d) < 0.5 THEN 'small'
        |              WHEN abs(cohens_d) < 0.8 THEN 'medium'
        |              ELSE 'large' END END AS magnitude
        |FROM d""".stripMargin)),
    // Benjamini–Hochberg step-up over the per-event-type Welch z family:
    // |z| DESC ordering ≡ p ASC, so "p_(i) ≤ α·i/m" is a comparison
    // against the plan-time literal boundary Φ⁻¹(1 − α·i/(2m)) — the
    // (m, rank, boundary) VALUES are rendered from the SAME Scala table
    // the Spark plan broadcasts (EventOps.fdrBoundaries), so no engine
    // ever evaluates a normal CDF at query time
    GraftQuery("x_ab_fdr", EventOps.abFdrByType, Some(
      s"""WITH pu AS (SELECT event_type, user_id,
        |             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |           FROM events GROUP BY 1, 2),
        |${welchMomentsTail(Seq("event_type"))},
        |z0 AS (SELECT event_type, n0, n1, mean0, mean1,
        |        CASE WHEN v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE) > 0
        |             THEN (mean0 - mean1)
        |                  / sqrt(v0 / CAST(n0 AS DOUBLE) + v1 / CAST(n1 AS DOUBLE)) END AS z
        |       FROM wde),
        |zz AS (SELECT * FROM z0 WHERE z IS NOT NULL),
        |rk AS (SELECT event_type, n0, n1, mean0, mean1, z,
        |         count(*) OVER () AS fam,
        |         row_number() OVER (ORDER BY abs(z) DESC, event_type) AS rnk
        |       FROM zz),
        |bd(bm, brank, z_bound) AS (VALUES ${EventOps.fdrBoundarySqlValues}),
        |st AS (SELECT rk.*, bd.z_bound,
        |         abs(rk.z) >= bd.z_bound AS crossed
        |       FROM rk LEFT JOIN bd ON rk.fam = bd.bm AND rk.rnk = bd.brank),
        |ks AS (SELECT *, max(CASE WHEN crossed THEN rnk ELSE 0 END) OVER () AS k_star,
        |         max(CASE WHEN z_bound IS NULL THEN 1 ELSE 0 END) OVER () AS unbounded
        |       FROM st)
        |SELECT event_type, n0, n1, mean0, mean1, z,
        |       CAST(fam AS BIGINT) AS m, CAST(rnk AS BIGINT) AS rank, z_bound,
        |       CASE WHEN unbounded = 0 THEN rnk <= k_star END AS rejected
        |FROM ks ORDER BY rank""".stripMargin)),
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
    // BLEU core over the same pair set (doc_a = candidate): clipped
    // n-gram matches m1..m4 + candidate totals t1..t4 exact int64;
    // p_n one division each; prec_geo4 = ((p1·p2)·p3)·p4 = BLEU⁴/BP⁴
    // (no ln/exp — the transcendentals rule); micro_p_n = Σm/Σt are
    // the corpus-BLEU precisions; bp_clamped/len_ratio carry the
    // brevity-penalty inputs
    GraftQuery("x_eval_bleu", TextOps.pairBleu, Some(
      s"""WITH $bleuPairCtes,
        |t AS (SELECT CAST(sum(m1) AS BIGINT) AS sm1, CAST(sum(t1) AS BIGINT) AS st1,
        |        CAST(sum(m2) AS BIGINT) AS sm2, CAST(sum(t2) AS BIGINT) AS st2,
        |        CAST(sum(m3) AS BIGINT) AS sm3, CAST(sum(t3) AS BIGINT) AS st3,
        |        CAST(sum(m4) AS BIGINT) AS sm4, CAST(sum(t4) AS BIGINT) AS st4,
        |        CAST(sum(len_a) AS BIGINT) AS cla, CAST(sum(len_b) AS BIGINT) AS clb FROM o)
        |SELECT doc_a, doc_b, len_a, len_b, m1, t1, m2, t2, m3, t3, m4, t4,
        |       CASE WHEN t1 > 0 THEN CAST(m1 AS DOUBLE) / t1 END AS p1,
        |       CASE WHEN t2 > 0 THEN CAST(m2 AS DOUBLE) / t2 END AS p2,
        |       CASE WHEN t3 > 0 THEN CAST(m3 AS DOUBLE) / t3 END AS p3,
        |       CASE WHEN t4 > 0 THEN CAST(m4 AS DOUBLE) / t4 END AS p4,
        |       CASE WHEN t1 > 0 AND t2 > 0 AND t3 > 0 AND t4 > 0
        |            THEN (CAST(m1 AS DOUBLE) / t1) * (CAST(m2 AS DOUBLE) / t2)
        |                 * (CAST(m3 AS DOUBLE) / t3) * (CAST(m4 AS DOUBLE) / t4)
        |       END AS prec_geo4,
        |       CAST(len_a AS DOUBLE) / len_b AS len_ratio,
        |       len_a >= len_b AS bp_clamped,
        |       CASE WHEN st1 > 0 THEN CAST(sm1 AS DOUBLE) / st1 END AS micro_p1,
        |       CASE WHEN st2 > 0 THEN CAST(sm2 AS DOUBLE) / st2 END AS micro_p2,
        |       CASE WHEN st3 > 0 THEN CAST(sm3 AS DOUBLE) / st3 END AS micro_p3,
        |       CASE WHEN st4 > 0 THEN CAST(sm4 AS DOUBLE) / st4 END AS micro_p4,
        |       cla AS corpus_len_a, clb AS corpus_len_b
        |FROM o CROSS JOIN t ORDER BY doc_a, doc_b""".stripMargin)),
    // ROUGE-1/2 over the same pair set (doc_b = reference): recall
    // m_n/r_n with r_n = max(len_b − n + 1, 0), F1 = 2m/(t + r) via the
    // shared-numerator harmonic identity — fully rational, every score
    // value-oracled; one gram chain (bleuPairCtes) for both metrics
    GraftQuery("x_eval_rouge", TextOps.pairRouge, Some(
      s"""WITH $bleuPairCtes,
        |rr AS (SELECT o.*, len_b AS r1,
        |         CAST(greatest(len_b - 1, 0) AS BIGINT) AS r2 FROM o),
        |t AS (SELECT CAST(sum(m1) AS BIGINT) AS sm1, CAST(sum(t1) AS BIGINT) AS st1,
        |        CAST(sum(r1) AS BIGINT) AS sr1,
        |        CAST(sum(m2) AS BIGINT) AS sm2, CAST(sum(t2) AS BIGINT) AS st2,
        |        CAST(sum(r2) AS BIGINT) AS sr2 FROM rr)
        |SELECT doc_a, doc_b, len_a, len_b,
        |       m1, t1, r1, m2, t2, r2,
        |       CASE WHEN r1 > 0 THEN CAST(m1 AS DOUBLE) / r1 END AS rouge_1,
        |       CASE WHEN t1 + r1 > 0 THEN CAST(m1 * 2 AS DOUBLE) / (t1 + r1) END AS rouge_f1,
        |       CASE WHEN r2 > 0 THEN CAST(m2 AS DOUBLE) / r2 END AS rouge_2,
        |       CASE WHEN t2 + r2 > 0 THEN CAST(m2 * 2 AS DOUBLE) / (t2 + r2) END AS rouge_f2,
        |       CASE WHEN sr1 > 0 THEN CAST(sm1 AS DOUBLE) / sr1 END AS micro_rouge_1,
        |       CASE WHEN st1 + sr1 > 0 THEN CAST(sm1 * 2 AS DOUBLE) / (st1 + sr1) END AS micro_rouge_f1,
        |       CASE WHEN sr2 > 0 THEN CAST(sm2 AS DOUBLE) / sr2 END AS micro_rouge_2,
        |       CASE WHEN st2 + sr2 > 0 THEN CAST(sm2 * 2 AS DOUBLE) / (st2 + sr2) END AS micro_rouge_f2
        |FROM rr CROSS JOIN t ORDER BY doc_a, doc_b""".stripMargin)),
    // chrF2 over the same pair set: char n-grams 1..6, whitespace
    // stripped, β = 2 — FULLY rational, so unlike BLEU the final score
    // is value-oracled; F_n = 5PR/(4P+R), 0 at m = 0, order excluded
    // when either side has no grams; chrf2 = mean of included orders;
    // micro applies the identical tree to corpus-summed counts
    GraftQuery("x_eval_chrf", TextOps.pairChrf, Some {
      val fSql = (1 to 6).map { k =>
        s"""CASE WHEN tc$k > 0 AND tr$k > 0 THEN
           |  CASE WHEN m$k > 0 THEN (5.0 * ((CAST(m$k AS DOUBLE) / tc$k) * (CAST(m$k AS DOUBLE) / tr$k)))
           |         / (4.0 * (CAST(m$k AS DOUBLE) / tc$k) + (CAST(m$k AS DOUBLE) / tr$k))
           |       ELSE 0.0 END END AS f$k,
           |CASE WHEN stc$k > 0 AND str$k > 0 THEN
           |  CASE WHEN sm$k > 0 THEN (5.0 * ((CAST(sm$k AS DOUBLE) / stc$k) * (CAST(sm$k AS DOUBLE) / str$k)))
           |         / (4.0 * (CAST(sm$k AS DOUBLE) / stc$k) + (CAST(sm$k AS DOUBLE) / str$k))
           |       ELSE 0.0 END END AS mf$k""".stripMargin
      }.mkString(",\n")
      def meanSql(p: String) = {
        val valid = (1 to 6).map(k => s"CASE WHEN $p$k IS NOT NULL THEN 1 ELSE 0 END")
          .mkString(" + ")
        val total = (1 to 6).map(k => s"coalesce($p$k, 0.0)").mkString(" + ")
        s"CASE WHEN ($valid) > 0 THEN ($total) / ($valid) END"
      }
      s"""WITH $trigramCtes,
        |$goodPairsCtes,
        |mem AS (SELECT doc_a AS doc_id FROM good UNION SELECT doc_b FROM good),
        |ch AS (SELECT d.doc_id, replace(lower(d.text), ' ', '') AS s
        |       FROM documents d JOIN mem USING (doc_id)),
        |lens AS (SELECT doc_id, CAST(length(s) AS BIGINT) AS len FROM ch),
        |gr AS (SELECT doc_id, n.n AS n,
        |         unnest(list_transform(generate_series(1, length(s) - n.n + 1),
        |           i -> substring(s, i, n.n))) AS gram
        |       FROM ch CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6)) n(n)
        |       WHERE length(s) >= n.n),
        |gtf AS (SELECT doc_id, n, gram, CAST(count(*) AS BIGINT) AS tf
        |        FROM gr GROUP BY 1, 2, 3),
        |mm AS (SELECT g.doc_a, g.doc_b,
        |${(1 to 6).map(k =>
          s"         sum(CASE WHEN a.n = $k THEN least(a.tf, b.tf) END) AS mm$k")
          .mkString(",\n")}
        |       FROM good g JOIN gtf a ON a.doc_id = g.doc_a
        |                   JOIN gtf b ON b.doc_id = g.doc_b AND b.n = a.n AND b.gram = a.gram
        |       GROUP BY 1, 2),
        |o AS (SELECT g.doc_a, g.doc_b, la.len AS nc, lb.len AS nr,
        |${(1 to 6).map(k =>
          s"""        CAST(coalesce(mm$k, 0) AS BIGINT) AS m$k,
             |        CAST(greatest(la.len - ${k - 1}, 0) AS BIGINT) AS tc$k,
             |        CAST(greatest(lb.len - ${k - 1}, 0) AS BIGINT) AS tr$k""".stripMargin)
          .mkString(",\n")}
        |      FROM good g JOIN lens la ON la.doc_id = g.doc_a
        |                  JOIN lens lb ON lb.doc_id = g.doc_b
        |      LEFT JOIN mm ON mm.doc_a = g.doc_a AND mm.doc_b = g.doc_b),
        |t AS (SELECT
        |${(1 to 6).map(k =>
          s"""        CAST(sum(m$k) AS BIGINT) AS sm$k,
             |        CAST(sum(tc$k) AS BIGINT) AS stc$k,
             |        CAST(sum(tr$k) AS BIGINT) AS str$k""".stripMargin)
          .mkString(",\n")}
        |      FROM o),
        |f AS (SELECT o.*,
        |$fSql
        |      FROM o CROSS JOIN t)
        |SELECT doc_a, doc_b, nc, nr,
        |${(1 to 6).map(k => s"       m$k, tc$k, tr$k").mkString(",\n")},
        |${(1 to 6).map(k => s"       f$k").mkString(",\n")},
        |       ${meanSql("f")} AS chrf2,
        |       ${meanSql("mf")} AS micro_chrf2
        |FROM f ORDER BY doc_a, doc_b""".stripMargin
    }),
    // vocabulary-richness panel (unigrams + 3-token shingles): TTR, the
    // Chao1 lower bound V + n1(n1−1)/(2(n2+1)) and Good–Turing unseen
    // mass n1/N — integer aggregates of the gram-frequency table, each
    // readout one fixed IEEE tree; both rows from ONE template
    // pass@k (Chen et al. 2021 eq. 1): the unbiased at-least-one-success
    // estimator every code-eval harness reports; the combination ratio
    // unrolls to a fixed k-factor product (k literal) rendered by ONE
    // Scala template into both engines, factors clamped at 0 so c > n−k
    // reads exactly 1, n < k reads NULL
    GraftQuery("x_eval_pass_at_k", EventOps.passAtK, Some {
      val passCols = EventOps.PassKs.map { k =>
        val prod = (0 until k).map(i =>
          s"(CAST(greatest(n - c - $i, 0) AS DOUBLE) / CAST(n - $i AS DOUBLE))")
          .mkString(" * ")
        s"CASE WHEN n >= $k THEN 1.0 - $prod END AS pass_$k"
      }.mkString(",\n|       ")
      s"""WITH pp AS (SELECT user_id AS problem_id, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
        |            FROM events GROUP BY 1)
        |SELECT problem_id, n, c,
        |       $passCols
        |FROM pp ORDER BY problem_id""".stripMargin
    }),
    // corpus mean pass@k: per-problem doubles quantized to int64 1e12
    // fixed-point ("pico-units" — a FINER grain than the 1e6 micro-units
    // used elsewhere in this file, deliberate: pass@k ∈ [0,1]) BEFORE
    // the sum (a double Σ is partial-aggregation-order-dependent; floor
    // of the identical IEEE value is not), one division per k
    GraftQuery("x_eval_pass_at_k_summary", EventOps.passAtKSummary, Some {
      val passCols = EventOps.PassKs.map { k =>
        val prod = (0 until k).map(i =>
          s"(CAST(greatest(n - c - $i, 0) AS DOUBLE) / CAST(n - $i AS DOUBLE))")
          .mkString(" * ")
        s"CASE WHEN n >= $k THEN 1.0 - $prod END AS pass_$k"
      }.mkString(",\n|         ")
      val sums = EventOps.PassKs.map { k =>
        s"""CAST(sum(CASE WHEN pass_$k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible_$k,
           |       CASE WHEN sum(CASE WHEN pass_$k IS NOT NULL THEN 1 ELSE 0 END) > 0
           |            THEN CAST(sum(CAST(floor(pass_$k * 1000000000000.0) AS BIGINT)) AS DOUBLE)
           |                 / (1000000000000.0 * CAST(sum(CASE WHEN pass_$k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE))
           |       END AS mean_pass_$k""".stripMargin
      }.mkString(",\n|       ")
      s"""WITH pp AS (SELECT user_id AS problem_id, CAST(count(*) AS BIGINT) AS n,
        |              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c
        |            FROM events GROUP BY 1),
        |pk AS (SELECT problem_id,
        |         $passCols
        |       FROM pp)
        |SELECT CAST(count(*) AS BIGINT) AS n_problems,
        |       $sums
        |FROM pk""".stripMargin
    }),
    GraftQuery("x_text_richness", TextOps.vocabRichness, Some(richnessOracle)),
    // Flesch reading-ease + FK grade: vowel-group syllables, clamped
    // sentence runs, exact counts into two fixed IEEE trees with the
    // published constants as shared literals — the classic rule-based
    // quality feature, fully value-oracled
    GraftQuery("x_text_readability", TextOps.readability, Some(
      """WITH c AS (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
        |        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |      FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch_ease,
        |       0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |         + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
        |         - 15.59 AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin)),
    // top-k collocations by PMI lift = c_xy·N/(c_x·c_y): marginals and
    // total are row sums of the ONE corpus bigram table (self-consistent
    // by construction); lift is exact HUGEINT products into one double
    // division, monotone in PMI so no transcendental; rank ties break
    // by (prev, cur) name
    GraftQuery("x_text_collocations", TextOps.collocations, Some(
      s"""WITH dt AS (SELECT string_split(lower(text), ' ') AS t FROM documents
        |            WHERE len(string_split(lower(text), ' ')) >= 2),
        |bi AS (SELECT t[i] AS prev, t[i + 1] AS cur
        |       FROM dt, unnest(generate_series(1, len(t) - 1)) AS u(i)),
        |cb AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c_xy FROM bi GROUP BY 1, 2),
        |cx AS (SELECT prev, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cb GROUP BY 1),
        |cy AS (SELECT cur, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cb GROUP BY 1),
        |nt AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM cb)
        |SELECT prev, cur, c_xy, c_x, c_y, n_bi,
        |       CAST(CAST(c_xy AS HUGEINT) * n_bi AS DOUBLE)
        |         / CAST(CAST(c_x AS HUGEINT) * c_y AS DOUBLE) AS lift
        |FROM cb JOIN cx USING (prev) JOIN cy USING (cur) CROSS JOIN nt
        |WHERE c_xy >= ${TextOps.CollocMinCount}
        |ORDER BY lift DESC, prev, cur LIMIT ${TextOps.CollocTopK}""".stripMargin)),
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
    // McNemar's paired test on the same cells: the marginal-shift
    // question kappa/MCC can't ask — χ² lives on the discordant cells
    // only (Edwards-corrected, clamped to 0 at n10 = n01), with the
    // discordant odds ratio as the effect size; all guards NULL at
    // empty denominators (the divide-by-zero NULL-vs-Inf seam)
    GraftQuery("x_quality_mcnemar", TextOps.classifierMcnemar, Some(
      s"""WITH $confusionCellCtes,
        |m AS (SELECT n, n11, n10, n01, n00,
        |        CAST(greatest(abs(n10 - n01) - 1, 0) AS DOUBLE) AS g
        |      FROM cm),
        |r AS (SELECT n, n11, n10, n01, n00,
        |        CASE WHEN n10 + n01 > 0
        |             THEN g * g / CAST(n10 + n01 AS DOUBLE) END AS chi2_mcnemar,
        |        CASE WHEN n10 > 0 AND n01 > 0
        |             THEN CAST(CAST(n11 AS HUGEINT) * n00 AS DOUBLE)
        |                  / CAST(CAST(n10 AS HUGEINT) * n01 AS DOUBLE) END AS odds_ratio
        |      FROM m)
        |SELECT n, n11, n10, n01, n00, chi2_mcnemar, odds_ratio,
        |       chi2_mcnemar > 3.841 AS asymmetric
        |FROM r""".stripMargin)),
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
    // confident-learning joint (cleanlab estimator): a doc counts toward
    // C[noisy label][j] when its class-j confidence clears that class's
    // self-confidence MEAN — the threshold cross-multiplies to an exact
    // HUGEINT comparison cnum·n_j ≥ Σcnum_j, so every cell is an integer
    // count; double-qualify breaks to argmax (cnum ≥ 4e6), neither-
    // qualify is excluded; noise rates column-normalize with NULL guards
    GraftQuery("x_quality_confident", TextOps.confidentJoint, Some(
      s"""WITH $qualityClassifierCtes,
        |g AS (SELECT least(greatest(logit, -4000000), 4000000) + 4000000 AS cnum,
        |        $stopCountSql / len(string_split(text, ' ')) >= 0.1 AS gold FROM s),
        |thr AS (SELECT
        |          CAST(sum(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |          CAST(sum(CASE WHEN gold THEN cnum ELSE 0 END) AS BIGINT) AS sc1,
        |          CAST(sum(CASE WHEN NOT gold THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |          CAST(sum(CASE WHEN NOT gold THEN 8000000 - cnum ELSE 0 END) AS BIGINT) AS sc0
        |        FROM g),
        |q AS (SELECT g.gold, g.cnum,
        |        thr.n1 > 0 AND CAST(g.cnum AS HUGEINT) * thr.n1 >= thr.sc1 AS q1,
        |        thr.n0 > 0 AND CAST(8000000 - g.cnum AS HUGEINT) * thr.n0 >= thr.sc0 AS q0,
        |        thr.n1, thr.sc1, thr.n0, thr.sc0
        |      FROM g CROSS JOIN thr),
        |a AS (SELECT gold, n1, sc1, n0, sc0,
        |        CASE WHEN q1 AND q0 THEN (CASE WHEN cnum >= 4000000 THEN 1 ELSE 0 END)
        |             WHEN q1 THEN 1 WHEN q0 THEN 0 END AS j
        |      FROM q),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN j IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
        |        CAST(sum(CASE WHEN gold AND j = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c11,
        |        CAST(sum(CASE WHEN gold AND j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c10,
        |        CAST(sum(CASE WHEN NOT gold AND j = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c01,
        |        CAST(sum(CASE WHEN NOT gold AND j = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c00,
        |        max(n1) AS n1, max(sc1) AS sc1, max(n0) AS n0, max(sc0) AS sc0
        |      FROM a)
        |SELECT n, n_excluded, c11, c10, c01, c00,
        |       c10 + c01 AS n_issues,
        |       CASE WHEN n1 > 0 THEN CAST(sc1 AS DOUBLE) / (8000000.0 * CAST(n1 AS DOUBLE)) END AS t1,
        |       CASE WHEN n0 > 0 THEN CAST(sc0 AS DOUBLE) / (8000000.0 * CAST(n0 AS DOUBLE)) END AS t0,
        |       CASE WHEN c11 + c01 > 0 THEN CAST(c01 AS DOUBLE) / CAST(c11 + c01 AS DOUBLE) END AS noise_to_1,
        |       CASE WHEN c10 + c00 > 0 THEN CAST(c10 AS DOUBLE) / CAST(c10 + c00 AS DOUBLE) END AS noise_to_0
        |FROM c""".stripMargin)),
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
  )
}
