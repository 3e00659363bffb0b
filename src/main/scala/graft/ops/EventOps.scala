package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-sequence analytics over the `events` table — the funnel /
  * journey queries a product-analytics warehouse serves. */
object EventOps {

  /** Ordered funnel (view → click → purchase) per user, with STRICT
    * temporal progression: a click counts only after the user's first
    * view, a purchase only after that qualifying click (min-timestamp
    * semantics at every step, so ties and replays cannot double-count).
    * Output: one row per user who entered the funnel, with the stage
    * reached (1 = view, 2 = view→click, 3 = view→click→purchase).
    *
    * Scale shape: three keyed aggregations on user_id plus two keyed
    * joins — every stage is hash-partitioned by the SAME key, so after
    * the first shuffle the stage chain co-partitions; nothing is ever
    * all-pairs and per-user state is three timestamps. The window-free
    * formulation keeps each stage a partial-aggregatable min. Pure
    * timestamp/int arithmetic → fully value-oracled. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1)
          + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .cast(IntegerType).as("stage"))
      .orderBy("user_id")
  }

  /** Z-score anomaly detection: events whose value sits more than 2
    * sample standard deviations from their type's mean — the outlier
    * screen a weather/metrics warehouse runs before aggregates are
    * trusted (a −40° reading in a Stockton summer is a sensor fault,
    * not climate).
    *
    * Determinism: mean and stddev come from EXACT decimal sums (the
    * a9_stddev_exact formulation — sum, sum-of-squares, count), so both
    * engines compute bit-identical doubles; the per-row z-score is then
    * plain IEEE arithmetic, identical everywhere, and the |z| > 2 cut
    * agrees exactly.
    *
    * Scale shape: the stats table is |event_types| rows — broadcast back
    * over the fact scan, so the ONLY shuffle is the tiny grouped
    * aggregate; the flagging pass is a map over the corpus. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val sx = sum(col("value").cast(DecimalType(28, 2))).cast(DoubleType)
    val sxx = sum(dec2(col("value")) * dec2(col("value"))).cast(DoubleType)
    val n = count(col("value")).cast(DoubleType)
    val ev = Tables(spark, dir, "events")
    // singleton groups have no sample stddev and constant groups a zero
    // one — both guards return null, and a null z-score is never flagged
    // (ANSI mode would otherwise raise on the zero division)
    val stats = ev.groupBy(col("event_type").as("et"))
      .agg((sx / n).as("mean_v"),
        when(n > 1.0, sqrt((sxx - sx * sx / n) / (n - lit(1.0)))).as("stddev_v"))
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .withColumn("zscore",
        when(col("stddev_v") > 0.0,
          (col("value") - col("mean_v")) / col("stddev_v")))
      .filter(abs(col("zscore")) > 2.0)
      .select(col("event_id"), col("event_type"), col("value"), col("zscore"))
      .orderBy("event_id")
  }

  /** Winsorization: clip each value to its event type's [p05, p95]
    * percentile band — the outlier-limiting step a metrics pipeline runs
    * where `anomalyZscore` only FLAGS. Spark's exact `percentile` and
    * DuckDB's `quantile_cont` interpolate identically (IEEE midpoint),
    * so the clip bounds — and therefore every clipped value — are fully
    * value-oracled.
    *
    * Scale shape: same as the anomaly screen — a |types|-row exact
    * percentile aggregate broadcast back over the fact scan; clipping is
    * a pure map. (Exact percentile state is O(group size) on the agg
    * side; at warehouse scale the drop-in is approx_percentile with a
    * documented error bound, same plan.) */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val bounds = ev.groupBy(col("event_type").as("et"))
      .agg(percentile(col("value"), lit(0.05)).as("p_lo"),
        percentile(col("value"), lit(0.95)).as("p_hi"))
    ev.join(broadcast(bounds), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("p_lo")), col("p_hi")).as("value_clipped"))
      .orderBy("event_id")
  }

  /** Hourly gap-fill with forward fill (LOCF): every (user, hour) slot in
    * the month gets the user's most recent observed hourly mean — the
    * time-series regularization step a weather warehouse needs before
    * resampling sparse sensor feeds (the reference stores hourly rows and
    * its dashboard assumes a dense series; this is how a lake makes one).
    *
    * Spine bounds are pinned to the dataset's month so both engines
    * generate identical slots. Observed slots carry the exact-decimal
    * hourly mean; `is_observed` distinguishes carried values.
    *
    * Scale shape: the spine is |users| × |hours| rows generated
    * DISTRIBUTED (sequence+explode per user — no driver loop, no
    * collect); the hourly aggregate collapses the event volume before
    * the join; forward fill is ONE window shuffle on user_id with a
    * running `last(ignoreNulls)` — O(hours) state per user, and at 100 TB
    * the spine join and the window share the user_id distribution. */
  def gapFillHourly(spark: SparkSession, dir: String): DataFrame = {
    val start = lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val end = lit(java.sql.Timestamp.valueOf("2024-01-30 23:00:00"))
    val ev = Tables(spark, dir, "events")
    val spine = ev.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(start, end, expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val hourly = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("u"), date_trunc("hour", col("ts")).as("h"))
      .agg(avgExact(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(hourly, col("user_id") === col("u") && col("hour_ts") === col("h"), "left")
      .select(col("user_id"), col("hour_ts"), col("v"))
      .withColumn("value_filled", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("is_observed", col("v").isNotNull)
      .drop("v")
      .orderBy("user_id", "hour_ts")
  }

  /** Daily cohort retention: cohort = day of the user's FIRST activity;
    * one row per (cohort_day, activity_day) with the distinct-user count
    * and the day offset — the classic retention-triangle query.
    *
    * Scale shape: the (user, day) pairs are distinct-ed FIRST (map-side
    * partial aggregation collapses the event volume to ≤ |users|×|days|
    * before anything shuffles), the cohort min is a keyed aggregate on
    * user_id, and the join back is co-partitioned on the same key. The
    * final aggregate's count(*) is already distinct-by-construction, so
    * no count-distinct state survives to the (tiny) last shuffle. Offsets
    * are exact integer day arithmetic on day-start timestamps. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val um = Tables(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("activity_day"))
      .distinct()
    val cohorts = um.groupBy(col("user_id"))
      .agg(min(col("activity_day")).as("cohort_day"))
    um.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), col("activity_day"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_day"), col("activity_day"),
        datediff(col("activity_day"), col("cohort_day"))
          .cast(IntegerType).as("day_offset"),
        col("n_users"))
      .orderBy("cohort_day", "activity_day")
  }

  /** Exponentially-weighted moving average over each user's value
    * series (α = 1/2): s₁ = x₁, sₜ = (xₜ + sₜ₋₁)/2 — the classic
    * streaming smoother (trend lines, rate limiters, anomaly baselines).
    *
    * Determinism: α = 1/2 makes every recurrence step one IEEE addition
    * followed by an EXACT halving (scaling by 2⁻¹ never rounds), and the
    * DuckDB oracle's recursive CTE evaluates the identical operation
    * sequence in the identical (ts, event_id) order, so the doubles are
    * bit-equal — no decimal detour needed.
    *
    * Scale shape: a recurrence cannot be a hash aggregate, but it needs
    * only SEQUENTIAL access per entity: ONE exchange on user_id, a
    * within-partition secondary sort on (user_id, ts, event_id), then a
    * single O(1)-state pass per partition (the classic secondary-sort
    * pattern — no per-group buffering, no window over an unbounded
    * frame, no driver involvement). Per-user series length never
    * matters: state is one double regardless. */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast(LongType), col("event_id").cast(LongType),
        col("ts"), col("value").cast(DoubleType))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    ev.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var cur = 0L; var first = true; var s = 0.0
        it.map { case (u, id, _, v) =>
          if (first || u != cur) { s = v; cur = u; first = false }
          else s = (v + s) / 2
          (u, id, v, s)
        }
      }
      .toDF("user_id", "event_id", "value", "ewma")
      .orderBy("user_id", "event_id")
  }

  /** Holt linear (double-exponential) smoothing per user — [[ewmaSmooth]]
    * plus a TREND component, the forecasting baseline for metrics that
    * drift (ℓ = level, b = slope; the one-step forecast is ℓ + b):
    * ℓ₁ = x₁, b₁ = 0; ℓₜ = (xₜ + (ℓₜ₋₁ + bₜ₋₁))/2,
    * bₜ = ((ℓₜ − ℓₜ₋₁) + bₜ₋₁)/2 — i.e. α = β = 1/2.
    *
    * Determinism: every step is IEEE additions/subtractions and exact
    * halvings, and the oracle's recursive CTE replays the identical
    * sequence in the identical (ts, event_id) order → bit-equal doubles
    * (the [[ewmaSmooth]] argument, applied to a 2-component state).
    * Scale shape: same secondary-sort pass — one exchange on user_id,
    * two doubles of carry state per partition, series length free. */
  def holtSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast(LongType), col("event_id").cast(LongType),
        col("ts"), col("value").cast(DoubleType))
      .as[(Long, Long, java.sql.Timestamp, Double)]
    ev.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var cur = 0L; var first = true; var l = 0.0; var b = 0.0
        it.map { case (u, id, _, v) =>
          if (first || u != cur) { l = v; b = 0.0; cur = u; first = false }
          else {
            val lPrev = l
            l = (v + (l + b)) / 2
            b = ((l - lPrev) + b) / 2
          }
          (u, id, v, l, b)
        }
      }
      .toDF("user_id", "event_id", "value", "level", "trend")
      .orderBy("user_id", "event_id")
  }

  /** Pinned dense hour spine shared by the series operators: January
    * 2024, 720 hourly slots (the [[gapFillHourly]] window). */
  private val SpineStart = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val SpineEnd = java.sql.Timestamp.valueOf("2024-01-30 23:00:00")
  private val SpineHours = 720L

  /** Per-type hourly count series on the dense spine: (event_type, t,
    * hour_ts, x) with t the hour index 0..719 and x = 0 on silent hours.
    * Integer counts keep every downstream moment exact. */
  private def hourlySeries(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val spine = ev.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(SpineStart), lit(SpineEnd), expr("INTERVAL 1 HOUR")))
          .as("hour_ts"))
    val counts = ev
      .groupBy(col("event_type").as("et"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    spine
      .join(counts, col("event_type") === col("et") && col("hour_ts") === col("h"), "left")
      .select(col("event_type"),
        expr(s"(unix_timestamp(hour_ts) - unix_timestamp(TIMESTAMP '2024-01-01 00:00:00')) div 3600")
          .as("t"),
        col("hour_ts"), coalesce(col("c"), lit(0L)).as("x"))
  }

  /** Seasonal period for [[holtWintersHourly]]: 24 hours — the daily
    * cycle an hourly operational series carries. */
  val HwPeriod = 24

  /** Additive Holt-Winters (triple exponential smoothing) over the
    * per-type hourly count series — the seasonal step up from
    * [[holtSmooth]], with α = β = γ = ½ so every update is IEEE
    * additions and EXACT halvings (the ewma/holt dyadic argument,
    * extended to a 24-slot seasonal state):
    * ℓ₀ = x₀, b₀ = 0, s[·] = 0;
    * ℓₜ = ((xₜ − s[t mod 24]) + (ℓₜ₋₁ + bₜ₋₁))/2,
    * bₜ = ((ℓₜ − ℓₜ₋₁) + bₜ₋₁)/2,
    * s[t mod 24] ← ((xₜ − ℓₜ) + s[t mod 24])/2 (also applied at t = 0,
    * where it is identically 0 — one uniform rule, no warm-up case).
    * The DuckDB oracle replays the identical sequence with the seasonal
    * vector carried as a LIST column through a recursive CTE → bit-equal
    * doubles, hash-green.
    *
    * Scale shape: one exchange on event_type, then a sorted in-partition
    * fold carrying (ℓ, b, s[24]) — constant state per series regardless
    * of length; series count × 720 rows is the whole output. */
  def holtWintersHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = HwPeriod
    val series = hourlySeries(spark, dir)
      .select(col("event_type"), col("t").cast(IntegerType), col("x").cast(LongType))
      .as[(String, Int, Long)]
    series.repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("t"))
      .mapPartitions { it =>
        var cur: String = null; var first = true
        var l = 0.0; var b = 0.0
        var seas: Array[Double] = Array.empty
        it.map { case (et, t, xi) =>
          val x = xi.toDouble
          val j = ((t % m) + m) % m
          // one-step-ahead forecast MADE AT t−1 for t: (ℓ+b) carried
          // forward plus the season slot as it stood — the quantity a
          // monitoring pipeline compares x against. At a series start
          // there is no prior forecast; pred := x (residual 0).
          var pred = x
          if (first || et != cur) {
            cur = et; first = false
            l = x; b = 0.0; seas = Array.fill(m)(0.0)
          } else {
            val sOld = seas(j)
            pred = (l + b) + sOld
            val lPrev = l
            l = ((x - sOld) + (l + b)) / 2
            b = ((l - lPrev) + b) / 2
          }
          val sNew = ((x - l) + seas(j)) / 2
          seas(j) = sNew
          (et, t, xi, l, b, sNew, pred, x - pred)
        }
      }
      .toDF("event_type", "t", "x", "level", "trend", "seasonal", "pred", "resid")
      .orderBy("event_type", "t")
  }

  /** Forecast-based anomaly flags: an hour is anomalous when its
    * one-step-ahead Holt-Winters residual exceeds 3σ of the series'
    * own values (σ from the exact integer moments n·Σx² − (Σx)² — one
    * |types|-row aggregate broadcast back; sqrt and the division are
    * single IEEE ops both engines round identically, so the boolean is
    * deterministic and the whole row set hash-matches). The seasonal
    * model is the point: a daily-periodic series' nightly troughs are
    * EXPECTED (small residuals) where a plain mean-based z-score would
    * flag every quiet hour. */
  def hwAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val hw = holtWintersHourly(spark, dir)
    val stats = hourlySeries(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    hw.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("t"), col("x"), col("pred"), col("resid"),
        (abs(col("resid")) >
          lit(3.0) * sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast(DoubleType)) / col("n")).as("is_anomaly"))
      .orderBy("event_type", "t")
  }

  /** Half-open activity window each event opens: 30 minutes in µs. */
  val IntervalMicros: Long = 1800L * 1000000L

  /** Merged (user, gid, s0, e0, n_events) activity intervals in epoch
    * µs — the classic sweep: an event starts a NEW interval iff its
    * start lies strictly after the running max end of everything
    * earlier in (ts, event_id) order; prefix-summing that flag labels
    * the components, one keyed aggregate merges them. Overlap-or-touch
    * coalesces (strict `>` starts a group). All integer µs — exact. */
  private def mergedIntervals(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + IntervalMicros)
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    ev.withColumn("ng",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("gid", sum(col("ng")).over(w))
      .groupBy(col("user_id"), col("gid"))
      .agg(min(col("s")).as("s0"), max(col("e")).as("e0"),
        count(lit(1)).as("n_events"))
  }

  /** Interval union per user: each event opens a 30-minute half-open
    * activity window; overlapping-or-touching windows merge into
    * maximal intervals — the temporal-coverage primitive behind session
    * stitching, on-call coverage, and dedup of overlapping time grants.
    * One window pass (the sweep) + one keyed aggregate; epoch-µs
    * integer arithmetic end to end, so the merged boundaries are
    * value-equal across engines. */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame =
    mergedIntervals(spark, dir)
      .select(col("user_id"), col("gid").cast(IntegerType).as("interval_idx"),
        timestamp_micros(col("s0")).as("start_ts"),
        timestamp_micros(col("e0")).as("end_ts"),
        col("n_events").cast(IntegerType).as("n_events"))
      .orderBy("user_id", "interval_idx")

  /** Per-user coverage rollup of [[intervalUnion]]: interval count,
    * events absorbed, and total covered seconds (Σ(e−s) of the MERGED
    * set — overlap counted once, the quantity naive per-event sums
    * overstate). Exact integer division by 1e6 via `div`. */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame =
    mergedIntervals(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast(IntegerType).as("n_intervals"),
        sum(col("n_events")).cast(IntegerType).as("n_events"),
        expr("sum(e0 - s0) div 1000000").as("covered_s"))
      .orderBy("user_id")

  /** Max lag for [[acfHourly]]. */
  val AcfMaxLag = 3

  /** Exact lag-1..[[AcfMaxLag]] autocorrelation of each event type's
    * hourly count series — the seasonality/burstiness diagnostic behind
    * capacity planning and anomaly-window choice. Counts are integers,
    * so every moment (Σx, Σx², Σxy and the lagged edge sums) is an exact
    * int64; the Pearson value is assembled from those moments in a
    * handful of IEEE double ops written identically in the oracle —
    * bit-equal (the a14_corr_exact argument, applied to a lagged pair).
    *
    * Scale shape: the series domain is |types|·|hours| — bounded by the
    * calendar, not by event volume; the only scan of the fact table is
    * the map-side-combined hourly count. The lag pairing is a self-join
    * on (type, t+lag) over that bounded series, then one tiny aggregate.
    * No windows, no per-row state. */
  def acfHourly(spark: SparkSession, dir: String): DataFrame = {
    val s = hourlySeries(spark, dir).cache()
    val pairs = s.as("a")
      .join(s.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.t") - col("a.t") >= 1 && col("b.t") - col("a.t") <= AcfMaxLag)
      .select(col("a.event_type"), (col("b.t") - col("a.t")).cast(IntegerType).as("lag"),
        col("a.x").as("xa"), col("b.x").as("xb"))
    val m = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"),
        sum(col("xa") * col("xb")).as("sxy"))
    val vx = m("n_pairs") * m("sxx") - m("sx") * m("sx")
    val vy = m("n_pairs") * m("syy") - m("sy") * m("sy")
    m.select(col("event_type"), col("lag"), col("n_pairs"),
      col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"),
      when(vx > 0 && vy > 0,
        (m("n_pairs") * m("sxy") - m("sx") * m("sy")).cast(DoubleType) /
          (sqrt(vx.cast(DoubleType)) * sqrt(vy.cast(DoubleType))))
        .as("acf"))
      .orderBy("event_type", "lag")
  }

  /** One-sided CUSUM drift detector over each type's hourly count
    * series: sₜ = max(0, sₜ₋₁ + (xₜ − target)) with target the series
    * mean — the classic sequential changepoint statistic (Page 1954); an
    * alarm fires when the cumulative excess clears 5·√target (five
    * Poisson standard deviations). This is the monitor a 100 TB ingest
    * runs per source to catch a rate change the χ² snapshot
    * ([[StatsOps.driftCells]]) only sees after the month closes.
    *
    * Determinism: target is one exact int64÷int64 division; each step is
    * an IEEE add and a max, replayed in the identical hour order by the
    * oracle's recursive CTE → bit-equal (the [[ewmaSmooth]] argument).
    * Scale shape: one fact-table scan (map-side hourly counts), one
    * exchange of the bounded series on event_type, O(1) carry state. */
  def cusumCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val targets = hourlySeries(spark, dir)
      .groupBy(col("event_type").as("tt"))
      .agg((sum(col("x")).cast(DoubleType) / lit(SpineHours.toDouble)).as("target"))
    val s = hourlySeries(spark, dir)
      .join(broadcast(targets), col("event_type") === col("tt"))
      .select(col("event_type"), col("t"), col("hour_ts"), col("x"), col("target"))
      .as[(String, Long, java.sql.Timestamp, Long, Double)]
    s.repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("t"))
      .mapPartitions { it =>
        var cur: String = null; var acc = 0.0
        it.map { case (et, _, h, x, target) =>
          if (et != cur) { cur = et; acc = 0.0 }
          acc = math.max(0.0, acc + (x - target))
          (et, h, x, acc, acc > 5.0 * math.sqrt(target))
        }
      }
      .toDF("event_type", "hour_ts", "x", "cusum", "alarm")
      .orderBy("event_type", "hour_ts")
  }

  /** Robust (median/MAD) anomaly twin of [[anomalyZscore]]: per type,
    * med = discrete median of value, mad = discrete median of
    * |value − med|, and a row is flagged when |value − med| > 5·mad.
    * Mean/stddev bands move when the outlier itself is large (masking);
    * the MAD band has a 50% breakdown point — the estimator monitoring
    * actually wants. Discrete medians are ACTUAL data values (the
    * cume_dist ≥ ½ minimum, the g4c mechanism), so both medians, every
    * deviation, and the flag comparison are exact — fully hash-oracled,
    * score included (one IEEE division, NULL when mad = 0).
    *
    * Scale shape: the discrete medians run over (type, value) FREQUENCY
    * tables, not raw fact rows — the g4cDiscPercentiles de-skew: a
    * cume_dist window keyed by event_type alone would buffer 1/|types|
    * of the fact table per task, while the composite-key frequency
    * aggregate is map-side combinable and the rank arithmetic then
    * touches only the distinct-value table. Plus a broadcast-back of
    * the |types|-row band table; the flagged output is
    * |anomalies|-bounded. */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    // discrete medians via the shared frequency-table core (the
    // bit-for-bit cume_dist equivalence argument lives on
    // StatsOps.discPercentiles)
    val med = StatsOps.discPercentiles(ev, Seq("event_type"), "value",
      Seq(0.5 -> "med"))
      .withColumnRenamed("event_type", "t1")
    val dev = ev.join(broadcast(med), col("event_type") === col("t1"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = StatsOps.discPercentiles(dev, Seq("event_type", "med"), "dev",
      Seq(0.5 -> "mad"))
      .withColumnRenamed("event_type", "t2").withColumnRenamed("med", "med2")
    ev.join(broadcast(mad), col("event_type") === col("t2"))
      .withColumn("dev", abs(col("value") - col("med2")))
      .filter(col("dev") > lit(5.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med2").as("med"), col("mad"),
        when(col("mad") > 0.0, col("dev") / col("mad")).as("score"))
      .orderBy("event_id")
  }

  /** First-order transition counts between consecutive event types in
    * each user's journey — the Markov statistics behind next-action
    * prediction and funnel-drop diagnosis. Output: (prev_type,
    * next_type, n) over all adjacent pairs.
    *
    * Scale shape: the same secondary-sort pass as [[ewmaSmooth]] (one
    * exchange on user_id, O(1) carry state per partition — the previous
    * row's type), then a map-side-combined count over the |types|²
    * pair domain. The window-`lead` formulation the oracle uses would
    * buffer/sort per user inside |users| window groups; the
    * mapPartitions form never materializes a per-user frame. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .select(col("user_id").cast(LongType), col("event_id").cast(LongType),
        col("ts"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)]
    ev.repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var cur = 0L; var first = true; var prev: String = null
        it.flatMap { case (u, _, _, et) =>
          val out =
            if (first || u != cur) Iterator.empty
            else Iterator((prev, et))
          cur = u; prev = et; first = false
          out
        }
      }
      .toDF("prev_type", "next_type")
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** CUPED pre/post cutoff: the experiment "starts" mid-corpus so both
    * periods hold real data at every SF (events span 2024-01-01..30). */
  val CupedCutoff = "2024-01-15 00:00:00"

  /** CUPED (Controlled-experiment Using Pre-Existing Data) variance
    * reduction — the experimentation-platform readout: per experiment
    * arm (user_id parity stands in for assignment), the post-period
    * mean of the metric and its CUPED-adjusted mean
    * ŷᵤ = yᵤ − θ·(xᵤ − x̄) with θ = cov(x,y)/var(x) fitted POOLED over
    * all users' pre-period covariate x. The adjustment shrinks the
    * between-user variance the randomization didn't balance, tightening
    * the readout without biasing it (E[x] is arm-independent).
    *
    * Determinism across engines: per-user pre/post sums are exact int64
    * CENTS (decimal-cast, ×100), the pooled moments (n, Σx, Σy, Σx²,
    * Σxy) are exact int64 sums of those, and θ + the adjusted means are
    * a FIXED sequence of IEEE double ops (cast, ×, −, ÷) on exact
    * integers — each correctly rounded, so DuckDB replays the identical
    * expression tree bit-for-bit. No transcendentals anywhere.
    * θ's denominator is nullif-guarded: a constant covariate yields
    * θ = 0 and the adjusted mean degrades to the raw mean (spec-pinned).
    *
    * Scale shape: ONE map-side-combinable groupBy(user_id) over the
    * event stream, a 1-row pooled-moment aggregate broadcast back
    * (bounded driver bytes), and a tiny per-arm rollup — no window, no
    * per-user state beyond the aggregation. */
  /** Per-user (pre-cutoff, post-cutoff) exact cent totals — the ONE
    * pre/post currency [[abCuped]] and [[abDid]] both read, so the two
    * adjustment methods cannot drift on what "pre" and "post" mean. */
  private def prePostPerUser(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(java.sql.Timestamp.valueOf(CupedCutoff))
    val cents = (dec2(col("value")) * 100).cast(LongType)
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < cut, cents)), lit(0L)).as("x"),
        coalesce(sum(when(col("ts") >= cut, cents)), lit(0L)).as("y"))
  }

  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val perUser = prePostPerUser(spark, dir)
    val dbl = (c: Column) => c.cast(DoubleType)
    val pooled = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
      .select(col("n"), col("sx"),
        coalesce(
          (dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
            nullif(dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")),
              lit(0.0)),
          lit(0.0)).as("theta"))
    perUser.groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n_users"),
        (dbl(col("sya")) / 100.0 / col("n_users")).as("mean_y"),
        (dbl(col("sya")) / 100.0 / col("n_users") -
          col("theta") * (dbl(col("sxa")) / 100.0 / col("n_users") -
            dbl(col("sx")) / 100.0 / col("n"))).as("mean_y_cuped"),
        col("theta"))
      .orderBy("arm")
  }

  /** Welch two-sample t readout on the per-user total metric (arm =
    * user_id parity, the same assignment [[abCuped]] reads out): per-arm
    * user count, mean, the unpooled-variance t statistic and its
    * Welch–Satterthwaite degrees of freedom — the significance surface
    * an experimentation platform serves next to the CUPED point
    * estimate.
    *
    * Determinism: per-user totals are exact decimal cents; the per-arm
    * moments (n, Σy, Σy²) are exact decimal sums of those; mean,
    * variance, t and df are a FIXED sequence of IEEE double ops
    * (+ - * / sqrt, all correctly rounded — no transcendentals) on the
    * exact moments, textually mirrored by the DuckDB oracle.
    *
    * Scale shape: one map-side-combinable groupBy(user_id), a 2-row arm
    * rollup, a 1-row pivot. No window, no collect, nothing grows past
    * the first aggregate. */
  def abWelch(spark: SparkSession, dir: String): DataFrame =
    welchOfPerUser(Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y")))

  /** The Welch tail over any (user_id, y: DECIMAL(18,2)) relation —
    * shared by the batch readout above and the streaming moment-log
    * serve (graft.streaming.StreamingWelch), so the live t statistic is
    * structurally the batch definition, not a reimplementation. */
  def welchOfPerUser(perUser: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    // t and df are guarded NULL when the pooled standard error is not
    // strictly positive (an arm with <2 users already yields NULL var,
    // and two zero-variance arms would divide by zero): Spark's Divide
    // returns NULL on a zero divisor where DuckDB's IEEE division gives
    // Inf/NaN, so the guard is what keeps both engines agreeing that a
    // degenerate cohort has no statistic
    welchMomentsOf(perUser)
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        col("v0"), col("v1"),
        (col("v0") / dbl(col("n0"))).as("se0"),
        (col("v1") / dbl(col("n1"))).as("se1"))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        (col("mean0") - col("mean1")).as("diff"),
        when(col("se0") + col("se1") > 0.0,
          (col("mean0") - col("mean1")) / sqrt(col("se0") + col("se1")))
          .as("t_stat"),
        when(col("se0") + col("se1") > 0.0,
          ((col("se0") + col("se1")) * (col("se0") + col("se1"))) /
          ((col("se0") * col("se0")) / (dbl(col("n0")) - lit(1.0)) +
            (col("se1") * col("se1")) / (dbl(col("n1")) - lit(1.0))))
          .as("df"))
  }

  /** The 1-row per-arm moment core (n, mean, sample variance per arm)
    * behind [[welchOfPerUser]] AND [[mdeOfPerUser]] — one definition so
    * the t test and the power analysis read the SAME variance (the
    * mwAggregates rule applied to the moment seam). Exact decimal
    * sums; mean/var are the fixed IEEE tree the oracle replicates. */
  private def welchMomentsOf(perUser: DataFrame): DataFrame =
    welchMomentsOf(perUser, Nil)

  /** Keyed generalization of the moment seam — `keyCols` carries e.g.
    * the sequential look index; Nil is the original 1-row form. One
    * variance definition for the t test, the MDE, AND the sequential
    * monitor. */
  private def welchMomentsOf(perUser: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val keys = keyCols.map(col)
    val arms = perUser
      .groupBy((keys :+ (col("user_id") % 2).as("arm")): _*)
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      .select((keys :+ col("arm") :+ col("n") :+
        (dbl(col("sy")) / dbl(col("n"))).as("mean_y") :+
        // sample variance is undefined at n = 1 (the n−1 divisor hits
        // zero: Spark's Divide says NULL, DuckDB's IEEE division says
        // Inf/NaN) — the guard makes it NULL in BOTH engines, which the
        // downstream t/z guards then propagate
        when(col("n") > 1,
          (dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")) / dbl(col("n"))) /
            (dbl(col("n")) - lit(1.0))).as("var_y")): _*)
    def pick(c: String, arm: Int) = max(when(col("arm") === arm, col(c)))
    val aggs = Seq(
      pick("n", 0).as("n0"), pick("n", 1).as("n1"),
      pick("mean_y", 0).as("mean0"), pick("mean_y", 1).as("mean1"),
      pick("var_y", 0).as("v0"), pick("var_y", 1).as("v1"))
    if (keyCols.isEmpty) arms.agg(aggs.head, aggs.tail: _*)
    else arms.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Number of equally-spaced interim looks for the group-sequential
    * monitor, and the O'Brien–Fleming constant C_B(5, α=0.05
    * two-sided) = 2.040 (Jennison & Turnbull, Group Sequential Methods,
    * Table 2.1) — boundary_k = C·√(K/k), the early-look-conservative
    * shape that spends almost no α before the data matures. Exact
    * double literals mirrored in the oracle (the Romano-bands
    * convention). */
  val SeqLooks = 5
  val ObfC = 2.040

  /** Group-sequential A/B monitor — the peeking-corrected readout an
    * experimentation platform actually serves: the Welch z statistic
    * recomputed at [[SeqLooks]] equally-spaced event-time cuts, each
    * compared against its O'Brien–Fleming boundary; `crossed` is the
    * "stop early, the effect is real" page. A fixed-horizon t read 5
    * times inflates false positives ~3×; the OF envelope holds overall
    * α at 0.05.
    *
    * Determinism: cuts are exact integer µs arithmetic off the 1-row
    * span (t0 + k·span div K — no double time math); each look's
    * moments ride the SAME keyed [[welchMomentsOf]] seam as the t
    * test/MDE; z and boundary are fixed IEEE trees (sqrt only).
    *
    * Scale shape: ONE event scan fanned ×K by a broadcast 5-row look
    * table (K constant), map-side-combined into per-(look, user)
    * totals, then a 2K-row arm rollup — no window, nothing
    * corpus-sized past the first aggregate. */
  def abSequential(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), dec2(col("value")).as("v"),
        unix_micros(col("ts")).as("us"))
    val span = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
    sequentialReadout(perUserLookOf(ev.crossJoin(broadcast(span))))
  }

  /** Per-(look, user) decimal partials over any (user_id, v, us, t0,
    * t1) relation — the FIRST aggregate of the batch monitor above AND
    * the commit grain of the streaming twin
    * (graft.streaming.StreamingSequential): once the cuts (t0, t1) are
    * fixed, an event's look membership is fixed, and decimal sums are
    * exact and order-free, so any epoch slicing of a user's events
    * reassembles the identical per-look total. */
  private[graft] def perUserLookOf(evSpan: DataFrame): DataFrame = {
    import evSpan.sparkSession.implicits._
    evSpan.crossJoin(broadcast((1 to SeqLooks).toDF("look")))
      .filter(col("us") <= expr(s"t0 + ((t1 - t0) * look) div $SeqLooks"))
      .groupBy(col("look"), col("user_id"))
      .agg(sum(col("v")).cast(Dec2).as("y"))
  }

  /** The z-vs-boundary readout over any per-(look, user_id, y)
    * relation — ONE moment seam ([[welchMomentsOf]] keyed by look) and
    * ONE z tree for the batch monitor and the streaming twin. z is
    * guarded NULL at a degenerate look (an arm with <2 users gives
    * NULL variance; zero pooled variance would divide by zero, where
    * Spark says NULL and DuckDB says Inf/NaN) — a page from one user
    * isn't a statistic, and `crossed` stays NULL rather than paging. */
  private[graft] def sequentialReadout(perUserLook: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val se = col("v0") / dbl(col("n0")) + col("v1") / dbl(col("n1"))
    welchMomentsOf(perUserLook, Seq("look"))
      .select(col("look"), col("n0"), col("n1"),
        (col("mean0") - col("mean1")).as("diff"),
        when(se > 0.0, (col("mean0") - col("mean1")) / sqrt(se)).as("z"),
        (lit(ObfC) * sqrt(lit(SeqLooks.toDouble) / col("look"))).as("boundary"))
      .withColumn("crossed", abs(col("z")) > col("boundary"))
      .orderBy("look")
  }

  /** Two-sided z critical value at α = 0.05 and the 80%-power z — the
    * standard design constants, as exact double literals mirrored in
    * the oracle SQL. */
  val ZAlphaHalf = 1.959963984540054
  val ZBeta80 = 0.8416212335729143

  /** Minimum detectable effect + power readout on the Welch seam — the
    * question an experimenter asks BEFORE reading the t statistic: at
    * this sample size and variance, what's the smallest true lift this
    * test could have detected (α = 0.05 two-sided, 80% power)?
    * mde = (z_{α/2} + z_β)·√(v₀/n₀ + v₁/n₁) over the SAME per-arm
    * moments as [[abWelch]]; mde_rel scales by the control mean, and
    * `powered` says whether the OBSERVED |Δ| clears the bar (an
    * "insignificant" result below MDE is an underpowered design, not
    * evidence of no effect). Fixed IEEE tree over the exact-decimal
    * moment core, staged so the oracle's subexpressions are
    * bit-identical. */
  def abMde(spark: SparkSession, dir: String): DataFrame =
    mdeOfPerUser(Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y")))

  /** The MDE tail over any (user_id, y: DECIMAL(18,2)) relation —
    * shared seam with [[welchOfPerUser]], separated for planted-moment
    * specs. */
  private[ops] def mdeOfPerUser(perUser: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    welchMomentsOf(perUser)
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        (col("v0") / dbl(col("n0"))).as("se0"),
        (col("v1") / dbl(col("n1"))).as("se1"))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        sqrt(col("se0") + col("se1")).as("se_diff"))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"), col("se_diff"),
        ((lit(ZAlphaHalf) + lit(ZBeta80)) * col("se_diff")).as("mde_abs"))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        col("se_diff"), col("mde_abs"),
        when(col("mean0") =!= 0.0, col("mde_abs") / abs(col("mean0")))
          .as("mde_rel"),
        (col("mean0") - col("mean1")).as("diff"),
        (abs(col("mean0") - col("mean1")) >= col("mde_abs")).as("powered"))
  }

  /** Sample-ratio-mismatch guard: the χ² (df = 1) of the realized arm
    * split against the designed 50/50 assignment, with the standard
    * α = 0.05 trip wire (critical value 3.841). An experiment whose
    * traffic split drifted is invalid BEFORE any metric is read — this
    * is the gate that runs first. Counts are exact; χ² is four IEEE
    * ops on them, oracle-mirrored; the flag is a comparison against a
    * literal, so it cannot sit on a rounding boundary differently in
    * the two engines unless χ² itself diverged (which the hash would
    * catch first). */
  def abSrm(spark: SparkSession, dir: String): DataFrame =
    srmOfUsers(Tables(spark, dir, "events").select(col("user_id")))

  /** The SRM core over ANY relation carrying user_id (distinct applied
    * inside) — shared by the batch guard above and the streaming
    * commit-log serve (graft.streaming.StreamingAbGuard), so the two
    * verdicts are structurally one definition. */
  def srmOfUsers(users: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    users.select(col("user_id")).distinct()
      .agg(
        sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n1"))
      .select(col("n0"), col("n1"),
        ((dbl(col("n0")) + dbl(col("n1"))) / lit(2.0)).as("e"))
      .select(col("n0"), col("n1"),
        (((dbl(col("n0")) - col("e")) * (dbl(col("n0")) - col("e"))) / col("e") +
          ((dbl(col("n1")) - col("e")) * (dbl(col("n1")) - col("e"))) / col("e"))
          .as("chi2"))
      .select(col("n0"), col("n1"), col("chi2"),
        (col("chi2") > lit(3.841)).as("srm_flag"))
  }

  /** Post-stratified arm means — the other standard variance/bias
    * repair next to [[abCuped]]: strata are activity quartiles (exact
    * discrete quartiles of the per-user event count via the shared
    * frequency-table core in StatsOps), weights are the FULL-population
    * stratum shares, and each arm's adjusted mean is Σ_s w_s · m_{s,arm}
    * — the estimate that stands when randomization landed unevenly
    * across activity levels (the spec plants a Simpson's-paradox cohort
    * where post-stratification REVERSES the raw readout).
    *
    * Determinism: counts and decimal sums are exact; quartile cuts are
    * exact integers (discrete percentiles); the weighted sum is a fixed
    * left-associated four-term chain on both engines. A stratum absent
    * from one arm contributes 0 (coalesce) — the estimator is then
    * partially weighted, which the per-arm n exposes rather than hides.
    *
    * Scale shape: one map-side-combinable groupBy(user_id); quartiles
    * touch only the distinct-count frequency table; one 2-row arm
    * rollup with conditional per-stratum partials; one 1-row population
    * rollup broadcast back. */
  def abPostStrat(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(Dec2).as("y"))
    val qs = StatsOps.discPercentiles(
      perUser.select(lit(1).as("k"), col("n_events")),
      Seq("k"), "n_events", Seq(0.25 -> "q1", 0.5 -> "q2", 0.75 -> "q3"))
      .drop("k")
    val strat = perUser.crossJoin(broadcast(qs))
      .select((col("user_id") % 2).as("arm"), col("y"),
        when(col("n_events") <= col("q1"), 0L)
          .when(col("n_events") <= col("q2"), 1L)
          .when(col("n_events") <= col("q3"), 2L).otherwise(3L).as("stratum"))
    val strata = 0 to 3
    val popAggs = strata.map(s =>
      sum(when(col("stratum") === s, 1L).otherwise(0L)).as(s"ns$s"))
    val pop = strat.agg(count(lit(1)).as("nt"), popAggs: _*)
    val armAggs = Seq(sum(col("y")).as("sy")) ++ strata.flatMap(s => Seq(
      sum(when(col("stratum") === s, 1L).otherwise(0L)).as(s"n$s"),
      sum(when(col("stratum") === s, col("y"))).as(s"sy$s")))
    val arms = strat.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), armAggs: _*)
    val psTerms = strata.map(s => coalesce(
      (dbl(col(s"ns$s")) / dbl(col("nt"))) *
        (dbl(col(s"sy$s")) / dbl(col(s"n$s"))), lit(0.0)))
    arms.crossJoin(broadcast(pop))
      .select(col("arm"), col("n_users"),
        (dbl(col("sy")) / dbl(col("n_users"))).as("mean_y"),
        psTerms.reduceLeft(_ + _).as("mean_y_ps"))
      .orderBy("arm")
  }

  /** Quantile treatment effects: per-arm exact discrete quartiles of
    * the per-user metric and their arm-1-minus-arm-0 differences — the
    * distributional readout a mean-only t-test misses (a treatment that
    * lifts the p75 while squashing the p25 nets to zero in [[abWelch]]
    * but is NOT a null effect). Quartiles ride the shared
    * frequency-table core; values are exact decimals, diffs a fixed
    * double subtraction. One map-side-combinable per-user aggregate,
    * then only the distinct-value table is touched. */
  def abQuantileEffect(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y"))
      .select((col("user_id") % 2).as("arm"), col("y"))
    val qa = StatsOps.discPercentiles(perUser, Seq("arm"), "y",
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
    def pick(c: String, arm: Int) = max(when(col("arm") === arm, col(c)))
    qa.agg(
      pick("p25", 0).as("q25_0"), pick("p25", 1).as("q25_1"),
      pick("p50", 0).as("q50_0"), pick("p50", 1).as("q50_1"),
      pick("p75", 0).as("q75_0"), pick("p75", 1).as("q75_1"))
      .select(
        dbl(col("q25_0")).as("p25_0"), dbl(col("q25_1")).as("p25_1"),
        (dbl(col("q25_1")) - dbl(col("q25_0"))).as("qte25"),
        dbl(col("q50_0")).as("p50_0"), dbl(col("q50_1")).as("p50_1"),
        (dbl(col("q50_1")) - dbl(col("q50_0"))).as("qte50"),
        dbl(col("q75_0")).as("p75_0"), dbl(col("q75_1")).as("p75_1"),
        (dbl(col("q75_1")) - dbl(col("q75_0"))).as("qte75"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) on the per-user metric — the
    * nonparametric AB readout that survives the heavy-tailed revenue
    * distributions where [[abWelch]]'s normality lean is weakest.
    *
    * Rank machinery WITHOUT ranking rows: the per-user metric collapses
    * to a VALUE-FREQUENCY table (distinct y → per-arm counts), average
    * tied ranks come from the running count before each value
    * (avgRank·2 = 2·cumBefore + t + 1, an integer), and the rank sum
    * doubles into exact int64 (`r1x2`). U, the tie-corrected variance
    * and z are then a fixed IEEE tree (sqrt the only root) on exact
    * integers — oracle-replayed bit-for-bit. The one window runs over
    * the DISTINCT-VALUE table (the discPercentiles de-skew argument),
    * never over users or events. */
  def abMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    mwAggregates(spark, dir).select(col("n0"), col("n1"),
      ((dbl(col("r1x2")) - dbl(col("n1")) * (dbl(col("n1")) + lit(1.0))) / 2.0)
        .as("u1"),
      dbl(col("ties")).as("tie_d"),
      (dbl(col("n0")) + dbl(col("n1"))).as("nd"))
      .select(col("n0"), col("n1"), col("u1"),
        ((col("u1") - dbl(col("n0")) * dbl(col("n1")) / 2.0) /
          sqrt((dbl(col("n0")) * dbl(col("n1")) / 12.0) *
            ((col("nd") + 1.0) - col("tie_d") / (col("nd") * (col("nd") - 1.0)))))
          .as("z"))
  }

  /** The Mann–Whitney rank machinery reduced to its 1-row integer core
    * (n0, n1, r1x2 = doubled tie-averaged arm-1 rank sum, ties = Σt³−t)
    * — ONE definition shared by the U/z test and [[abCliffsDelta]]
    * (the evalSummaryTail rule for the rank arithmetic). Composite-key
    * frequency table, range-partitioned running counts, everything
    * exact int64. */
  private def mwAggregates(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y"))
      .select((col("user_id") % 2).as("arm"), col("y"))
    val freq = perUser.groupBy(col("y"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"))
    val t = col("c0") + col("c1")
    // inclusive global running user count via the range-partitioned
    // prefix-sum core (StatsOps.withRunningCount) — count-BEFORE is
    // then run − t, still exact int64, and no one-task window exists
    // even when distinct totals approach the user count
    StatsOps.withRunningCount(
      freq.withColumn("cnt", t), Nil, "y", "cnt", "run")
      .withColumn("cb", col("run") - t)
      .agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("c1") * (col("cb") * 2 + col("c0") + col("c1") + 1)).as("r1x2"),
        sum(t * t * t - t).as("ties"))
  }

  /** Cliff's delta — the EFFECT SIZE next to [[abMannWhitney]]'s
    * significance: δ = P(Y₁ > Y₀) − P(Y₁ < Y₀) = 2U₁/(n₀n₁) − 1, read
    * directly off the same rank core as the fully-integer numerator
    * (r1x2 − n₁(n₁+1) − n₀n₁) over n₀n₁ — ONE division, hash-oracled.
    * The magnitude band uses Romano et al.'s |δ| thresholds
    * (0.147/0.33/0.474) as identical decimal literals in both engines.
    * A trillion-row test can be "significant" at δ ≈ 0 — this is the
    * column that says whether anyone should care. */
  def abCliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    mwAggregates(spark, dir)
      .select(col("n0"), col("n1"),
        (dbl(col("r1x2") - col("n1") * (col("n1") + 1L) - col("n0") * col("n1"))
          / dbl(col("n0") * col("n1"))).as("delta"))
      .withColumn("magnitude",
        when(abs(col("delta")) < 0.147, "negligible")
          .when(abs(col("delta")) < 0.33, "small")
          .when(abs(col("delta")) < 0.474, "medium")
          .otherwise("large"))
  }

  /** Difference-in-differences on the shared pre/post currency
    * ([[prePostPerUser]] — the same cutoff and cent totals CUPED
    * reads): per-arm pre and post means, each arm's pre→post delta, and
    * DiD = Δ₁ − Δ₀ — the readout when assignment wasn't random and the
    * pre-period gap must be netted out rather than variance-reduced.
    * Exact int64 cent sums; means and differences use the same fixed
    * /100.0/n IEEE form the CUPED oracle already proves green. One
    * per-user aggregate, a 2-row arm rollup, a 1-row pivot. */
  def abDid(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val arms = prePostPerUser(spark, dir)
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      .select(col("arm"),
        (dbl(col("sx")) / 100.0 / col("n")).as("mean_pre"),
        (dbl(col("sy")) / 100.0 / col("n")).as("mean_post"))
    def pick(c: String, arm: Int) = max(when(col("arm") === arm, col(c)))
    arms.agg(
      pick("mean_pre", 0).as("pre0"), pick("mean_post", 0).as("post0"),
      pick("mean_pre", 1).as("pre1"), pick("mean_post", 1).as("post1"))
      .select(col("pre0"), col("post0"),
        (col("post0") - col("pre0")).as("delta0"),
        col("pre1"), col("post1"),
        (col("post1") - col("pre1")).as("delta1"),
        ((col("post1") - col("pre1")) - (col("post0") - col("pre0")))
          .as("did"))
  }

  // ------------------------------------------------------- Poisson bootstrap

  /** Bootstrap replicate count. 64 keeps the replicate fold bounded and
    * the rank-2 / rank-63 order statistics at ≈ the 2.5 / 97.5
    * percentiles (a ~96.9% CI). */
  val BootstrapB = 64

  /** Poisson(1) CDF thresholds in micro-units: P(X ≤ k)·1e6 floored,
    * k = 0..9 (w caps at 10 — P(X ≥ 10) < 1e-7). The ONE transcendental
    * (e^{-1}) runs here at class load; both the Spark plan and the
    * DuckDB oracle receive these as the same integer LITERALS, so the
    * draw w(user, rep) = #{thresholds ≤ u} is pure integer comparison
    * in both engines. */
  val PoisCdfMicro: IndexedSeq[Long] = {
    val pmf = (1 to 9).scanLeft(math.exp(-1.0))((p, k) => p / k)
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 1e6).toLong).toIndexedSeq
  }

  /** Poisson bootstrap CI for the arm-mean difference — the scalable
    * bootstrap: instead of resampling |users| rows B times (impossible
    * at 100 TB), every user carries an independent Poisson(1) weight
    * per replicate, preserving the multinomial resample in
    * distribution. Weights are DETERMINISTIC — the md5 content-hash
    * currency (engine-identical) of (user_id, replicate) mapped through
    * the literal integer CDF thresholds — so the whole CI is
    * value-oracled, which no RNG bootstrap could be.
    *
    * Exactness: per-user totals are exact cents; per-(replicate, arm)
    * Σw and Σw·y are exact int64; each replicate's mean difference is a
    * fixed IEEE tree on those; the CI bounds are order statistics
    * (rank 2 / rank B−1) of the B bit-identical doubles.
    *
    * Scale shape: ONE map-side-combinable groupBy(user_id) over events;
    * the ×B explode runs on the PER-USER table (narrow, no shuffle);
    * the (rep, arm) aggregate is map-side combinable into 2B rows; the
    * final fold sorts B doubles. No window ever touches fact rows, and
    * the driver sees one row. */
  def abBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum((dec2(col("value")) * 100).cast(LongType)).as("y"))
    val u = conv(substring(md5(concat(col("user_id").cast(StringType),
      lit(":"), col("rep").cast(StringType))), 1, 15), 16, 10)
      .cast(LongType) % lit(1000000L)
    val weight = PoisCdfMicro.zipWithIndex.tail
      .foldLeft(when(col("u") < PoisCdfMicro.head, 0L)) {
        case (acc, (t, k)) => acc.when(col("u") < t, k.toLong)
      }
      .otherwise(lit(PoisCdfMicro.size.toLong))
    val reps = perUser
      .withColumn("rep", explode(sequence(lit(0), lit(BootstrapB - 1))))
      .withColumn("u", u)
      .withColumn("w", weight)
    def pick(c: String, arm: Int) = max(when(col("arm") === arm, col(c)))
    val mean = (s: String, n: String) =>
      coalesce(dbl(col(s)) / nullif(dbl(col(n)), lit(0.0)) / lit(100.0),
        lit(0.0))
    val ds = reps
      .groupBy(col("rep"), (col("user_id") % 2).as("arm"))
      .agg(sum(col("w")).as("n"), sum(col("w") * col("y")).as("s"))
      .groupBy(col("rep"))
      .agg(pick("n", 0).as("n0"), pick("n", 1).as("n1"),
        pick("s", 0).as("s0"), pick("s", 1).as("s1"))
      .select(col("rep"), (mean("s0", "n0") - mean("s1", "n1")).as("d"))
    val boot = ds.agg(
      count(lit(1)).cast(IntegerType).as("b"),
      sort_array(collect_list(col("d"))).as("dss"))
      .select(col("b"),
        element_at(col("dss"), 2).as("ci_lo"),
        element_at(col("dss"), BootstrapB - 1).as("ci_hi"))
    // the est leg coalesces exactly like the replicate leg: an
    // all-one-parity store leaves one arm's pick() null, and without
    // the guard n_users/est_diff/covers_zero all go silently null —
    // the empty arm instead contributes mean 0 (degenerate but
    // defined, and consistent with every replicate's treatment)
    val est = perUser
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      .agg(pick("n", 0).as("n0"), pick("n", 1).as("n1"),
        pick("sy", 0).as("sy0"), pick("sy", 1).as("sy1"))
      .select(
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_users"),
        (mean("sy0", "n0") - mean("sy1", "n1")).as("est_diff"))
    est.crossJoin(boot)
      .select(col("n_users"), col("b"), col("est_diff"),
        col("ci_lo"), col("ci_hi"),
        (col("ci_lo") <= 0.0 && col("ci_hi") >= 0.0).as("covers_zero"))
  }

  // --------------------------------------------------- changepoint

  /** Offline single-changepoint detection over the hourly count series
    * (the binary-segmentation base step): τ* = argmax_τ |S_τ| where
    * S_τ = Σ_{t ≤ τ}(x_t − x̄) — the split that most separates the
    * before/after means. The CUSUM op alarms ONLINE against a fixed
    * target; this finds WHERE the level shifted after the fact.
    *
    * Exactness: S_τ involves the non-integer mean, so the score is
    * cross-multiplied to |n·P_τ − c_τ·T| (P = prefix sum, c = prefix
    * count, T = total) — exact int64; the argmax tie-breaks to the
    * earliest hour in both engines. Segment means serve as
    * floor(1e12·sum/count) integral divisions. Headroom: T·1e12 must
    * stay inside int64 (T < 9.2e6 per series here); a larger
    * deployment drops the mean scale to 1e9 or serves the rational
    * (sum, count) pair raw.
    *
    * Scale shape: prefix sums ride ONE window per series over the
    * bounded hourly spine (720 rows/series — the HW argument), the
    * argmax is a rank-1 filter on the same partitioning, and the
    * output is one row per series. */
  def changepointHourly(spark: SparkSession, dir: String): DataFrame = {
    val hs = hourlySeries(spark, dir)
      .select(col("event_type"), col("t").cast(LongType), col("x"))
    val wp = Window.partitionBy(col("event_type")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = hs.groupBy(col("event_type"))
      .agg(sum(col("x")).as("tt"), count(lit(1)).as("n"))
    val scored = hs
      .withColumn("p", sum(col("x")).over(wp))
      .withColumn("c", sum(lit(1L)).over(wp))
      .join(broadcast(tot), Seq("event_type"))
      .filter(col("c") < col("n"))
      .withColumn("score", abs(col("n") * col("p") - col("c") * col("tt")))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("score").desc, col("t"))
    scored.withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("t").as("tau"), col("n").as("n_hours"),
        col("score"),
        expr("(p * 1000000000000) div c").as("mean_before_micro"),
        expr("((tt - p) * 1000000000000) div (n - c)").as("mean_after_micro"))
      .withColumn("shift_micro",
        col("mean_after_micro") - col("mean_before_micro"))
      .orderBy("event_type")
  }

  // --------------------------------------------------- conformal band

  /** Hours 0..479 calibrate the conformal band; the rest are held out. */
  val ConformalCalHours = 480

  /** Split-conformal prediction band on the Holt-Winters one-step
    * residuals (Vovk et al.; the distribution-free finite-sample band):
    * per series, q̂ is the ⌈(n_cal+1)·0.9⌉-th smallest calibration
    * |residual| — computed with INTEGER rank arithmetic
    * (9·(n+1)+9) div 10, so no float ceil sits on a boundary — and the
    * hold-out hours report their exact coverage of |resid| ≤ q̂.
    * Marginal coverage ≥ 90% holds in expectation over calibration
    * draws; the served row is the realized split's audit.
    *
    * Determinism: residuals are the bit-identical doubles the
    * hash-green HW replay pins; an order statistic of them is
    * engine-exact (rank-k VALUE is tie-permutation-invariant), and
    * coverage is counts + one division.
    *
    * Scale shape: rides [[holtWintersHourly]]'s plan (one exchange on
    * event_type, constant fold state); the ranking window orders
    * |calibration hours| rows per series — bounded by the series
    * length, the same argument as the fold itself. Output is one row
    * per series. */
  def conformalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val hw = holtWintersHourly(spark, dir)
      .select(col("event_type"), col("t"), abs(col("resid")).as("s"))
    val cal = hw.filter(col("t") < ConformalCalHours)
    val n = cal.groupBy(col("event_type")).agg(count(lit(1)).as("n_cal"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("s"))
    val qh = cal.withColumn("rn", row_number().over(w))
      .join(broadcast(n), Seq("event_type"))
      .filter(col("rn") === expr("(9 * (n_cal + 1) + 9) div 10"))
      .select(col("event_type"), col("n_cal"), col("s").as("q_hat"))
    hw.filter(col("t") >= ConformalCalHours)
      .join(broadcast(qh), Seq("event_type"))
      .groupBy(col("event_type"), col("n_cal"), col("q_hat"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("s") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("event_type"), col("n_cal"), col("q_hat"),
        col("n_eval"), col("n_covered"),
        (col("n_covered").cast(DoubleType) / col("n_eval").cast(DoubleType))
          .as("coverage"))
      .orderBy("event_type")
  }

  // --------------------------------------------- survival / churn hazard

  /** A user whose last event is ≥ this many days before the corpus'
    * final timestamp is counted as CHURNED (the event of interest);
    * anyone active within the horizon is right-censored. (The synthetic
    * corpus spans one month of hyper-active users, so one inactive day
    * already marks the churn tail; a production deployment would dial
    * this to its own activity cadence.) */
  val ChurnHorizonDays = 1

  /** Nelson–Aalen cumulative-hazard table over user lifetimes — the
    * right-censored churn readout (retention curves without the
    * "active users look churned" bias): lifetime t = days between a
    * user's first and last event; churn is observed only when the last
    * event predates the corpus end by [[ChurnHorizonDays]], otherwise
    * the lifetime is censored at t. Per distinct lifetime with ≥ 1
    * churn event: the at-risk count, churn/censor counts, the hazard
    * increment d/n and its running sum Ĥ(t) = Σ_{s ≤ t} d(s)/n(s).
    * (The Kaplan–Meier survivor is exp(−Ĥ) to first order; serving the
    * hazard keeps the surface transcendental-free.)
    *
    * Exactness: hazard increments are floor(1e12·d/n) in INTEGRAL
    * division (d·1e12 can exceed 2^53, where double `/` rounds), and
    * the cumulative hazard is an exact int64 running sum — value-
    * oracled bit-for-bit, which a float product never could be.
    *
    * Scale shape: one map-side-combinable groupBy(user_id) (min/max
    * ts), a 1-row corpus-end aggregate broadcast back, then ALL
    * remaining work happens on the (lifetime → counts) FREQUENCY
    * table — the discPercentiles argument: windows order |distinct
    * lifetimes| rows (bounded by the observation span in days), never
    * user rows. */
  def survivalHazard(spark: SparkSession, dir: String): DataFrame =
    hazardOfSpans(Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts")))

  /** The hazard tail over any (user_id, first_ts, last_ts) relation —
    * shared by the batch readout above and the streaming span-log serve
    * (graft.streaming.StreamingSurvival), so the live curve is
    * structurally the batch definition. */
  def hazardOfSpans(spans: DataFrame): DataFrame = {
    val end = spans.agg(max(col("last_ts")).as("study_end"))
    val lives = spans.crossJoin(broadcast(end))
      .select(
        datediff(col("last_ts"), col("first_ts")).cast(LongType).as("t_days"),
        when(col("last_ts") < col("study_end") -
          expr(s"INTERVAL $ChurnHorizonDays DAYS"), 1L).otherwise(0L)
          .as("churned"))
    val freq = lives.groupBy(col("t_days"))
      .agg(sum(col("churned")).as("d"),
        sum(lit(1L) - col("churned")).as("c"))
    val w = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = freq.agg(sum(col("d") + col("c")).as("n_total"))
    freq.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("hazard_micro", expr("(d * 1000000000000) div n_risk"))
      .withColumn("cum_hazard_micro",
        sum(col("hazard_micro")).over(
          Window.orderBy(col("t_days"))
            .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t_days"), col("n_risk"), col("d").as("d_churn"),
        col("c").as("c_censored"), col("hazard_micro"),
        col("cum_hazard_micro"))
      .orderBy(col("t_days"))
  }

  /** Cohen's d with the Hedges small-sample correction — the
    * standardized effect size next to [[abWelch]]'s "is it noise": the
    * t test's significance scales with √n, so at production cohort
    * sizes EVERYTHING is significant and d is the number that still
    * means something. Pooled SD uses the SAME [[welchMomentsOf]]
    * variance definition as the t/MDE/sequential family (one seam);
    * d = diff/s_p with s_p² = ((n0−1)v0 + (n1−1)v1)/(n0+n1−2), and
    * Hedges' g = d·(1 − 3/(4(n0+n1) − 9)) — the standard rational
    * approximation of the exact J (which needs a gamma function), so
    * the whole readout stays one sqrt + fixed IEEE arithmetic, fully
    * value-oracled. Cohen's 0.2/0.5/0.8 magnitude bands as shared
    * literals (the Romano-bands convention). Degenerate cohorts (any
    * arm < 2 users, zero pooled variance) read NULL in both engines. */
  def abCohensD(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val m = welchMomentsOf(Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y")))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        ((dbl(col("n0")) - 1.0) * col("v0") + (dbl(col("n1")) - 1.0) * col("v1"))
          .as("ssq"),
        (dbl(col("n0")) + dbl(col("n1")) - 2.0).as("dof"))
      .select(col("n0"), col("n1"),
        (col("mean0") - col("mean1")).as("diff"),
        when(col("dof") > 0.0 && col("ssq") > 0.0,
          (col("mean0") - col("mean1")) / sqrt(col("ssq") / col("dof")))
          .as("cohens_d"),
        (lit(1.0) - lit(3.0) / (lit(4.0) * (dbl(col("n0")) + dbl(col("n1"))) - 9.0))
          .as("hedges_j"))
    m.select(col("n0"), col("n1"), col("diff"), col("cohens_d"),
      (col("cohens_d") * col("hedges_j")).as("hedges_g"),
      when(col("cohens_d").isNotNull,
        when(abs(col("cohens_d")) < 0.2, "negligible")
          .when(abs(col("cohens_d")) < 0.5, "small")
          .when(abs(col("cohens_d")) < 0.8, "medium")
          .otherwise("large")).as("magnitude"))
  }

  // ------------------------------------------------------------------
  // pass@k — the code/agent-eval success estimator
  // ------------------------------------------------------------------

  /** The k values pass@k is served at — fixed literals shared with the
    * oracle (HumanEval's canonical 1/10 plus the mid point). */
  val PassKs: Seq[Int] = Seq(1, 5, 10)

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1): per problem with n samples and c
    * successes, pass@k = 1 − C(n−c,k)/C(n,k) — the probability that a
    * random size-k draw contains at least one success. The naive
    * 1−(1−c/n)^k overestimates; this is the estimator every code-eval
    * harness reports. Problems ride the user axis (user_id = problem,
    * its events = samples, a `purchase` = success).
    *
    * Determinism: the combination ratio unrolls to the fixed product
    * Π_{i<k} (n−c−i)/(n−i) — k is a LITERAL, so this is k exact-int64
    * subtractions, k IEEE divisions and k−1 multiplications in one
    * left-associated tree the oracle replicates textually (no
    * factorials, no gamma). Each factor clamps at 0 (greatest), so
    * c > n−k collapses the product to +0.0 — pass@k exactly 1 — rather
    * than sign-flipping through negative factors. n < k ⇒ NULL in both
    * engines (a size-k draw does not exist).
    *
    * Scale shape: ONE map-side-combinable groupBy(user_id); everything
    * after is per-row literal arithmetic. */
  def passAtK(spark: SparkSession, dir: String): DataFrame =
    passAtKOf(Tables(spark, dir, "events")
      .groupBy(col("user_id").as("problem_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c")))

  /** The estimator tail over any (problem_id, n, c) relation — shared
    * by the batch readout above and the streaming count-log serve
    * (graft.streaming.StreamingPassAtK): one product tree, twin drift
    * impossible. */
  def passAtKOf(perProblem: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val withK = PassKs.foldLeft(perProblem) { (df, k) =>
      val miss = (0 until k).map(i =>
        dbl(greatest(col("n") - col("c") - lit(i.toLong), lit(0L)))
          / dbl(col("n") - lit(i.toLong)))
        .reduce(_ * _)
      df.withColumn(s"pass_$k", when(col("n") >= k.toLong, lit(1.0) - miss))
    }
    withK.orderBy("problem_id")
  }

  /** Corpus mean pass@k over the problems where it is defined — the
    * one-line eval-report readout. Per-problem doubles are quantized to
    * int64 1e12 fixed-point — "pico-units", floor(1e12·p): NOTE this is
    * a deliberately FINER grain than the 1e6 micro-units used elsewhere
    * (RetrievalOps, drift curation), because pass@k lives in [0,1] where
    * 1e12 still fits ~10⁶ problems inside int64 — floor of the identical
    * IEEE value, so both engines quantize identically, BEFORE the sum: a
    * double Σ over problems is partial-aggregation-order-dependent and
    * would hash-flicker at scale, an int64 Σ is permutation-safe (the
    * Cramér's-V χ² trick). One division per k at the end. */
  def passAtKSummary(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val aggs = PassKs.flatMap { k =>
      Seq(
        sum(when(col(s"pass_$k").isNotNull, 1L).otherwise(0L))
          .as(s"n_eligible_$k"),
        sum(floor(col(s"pass_$k") * lit(1000000000000.0)).cast(LongType))
          .as(s"sum_pico_$k"))
    }
    passAtK(spark, dir)
      .agg(count(lit(1)).as("n_problems"), aggs: _*)
      .select(col("n_problems") +: PassKs.flatMap { k =>
        Seq(col(s"n_eligible_$k"),
          when(col(s"n_eligible_$k") > 0L,
            dbl(col(s"sum_pico_$k"))
              / (lit(1000000000000.0) * dbl(col(s"n_eligible_$k"))))
            .as(s"mean_pass_$k"))
      }: _*)
  }

  /** The "high-value event" threshold the Wilson readout counts —
    * fixed literal shared with the oracle. */
  val WilsonValueFloor = 100.0

  /** Wilson score interval per event type — the binomial-proportion CI
    * a dashboard should serve instead of the normal (Wald) interval,
    * which collapses to zero width at p̂ ∈ {0,1} and goes negative at
    * small n (Brown, Cai & DasGupta 2001); Wilson stays inside [0, 1]
    * and behaves at the extremes. Proportion = share of events with
    * value ≥ [[WilsonValueFloor]].
    *
    * Determinism: (n, k) are exact integer counts; the interval
    * (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n) is a fixed
    * IEEE tree with z = [[ZAlphaHalf]] rendered as a string-cast
    * literal (the FDR-boundary rule: DuckDB types a bare numeric
    * literal DECIMAL and its conversion can land one ulp off). The
    * published bounds are CLAMPED to [0, 1] (greatest/least, mirrored
    * in the oracle): containment is only algebraic — at p̂ ∈ {0, 1}
    * the sqrt/divide roundings can land one ulp outside the unit
    * interval, and a CI endpoint of −1e−17 is a presentation bug a
    * dashboard should never see (r14 ADVICE).
    *
    * Scale shape: one map-side-combinable scan into |event types| rows;
    * everything after is per-row literal arithmetic. */
  def eventWilsonCi(spark: SparkSession, dir: String): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val z = lit(ZAlphaHalf)
    val z2 = z * z
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= WilsonValueFloor, 1L).otherwise(0L)).as("k"))
      .select(col("event_type"), col("n"), col("k"),
        (dbl(col("k")) / dbl(col("n"))).as("p_hat"))
      .select(col("event_type"), col("n"), col("k"), col("p_hat"),
        greatest((col("p_hat") + z2 / (lit(2.0) * dbl(col("n")))
          - z * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) / dbl(col("n"))
            + z2 / (lit(4.0) * dbl(col("n")) * dbl(col("n")))))
          / (lit(1.0) + z2 / dbl(col("n"))), lit(0.0)).as("wilson_lo"),
        least((col("p_hat") + z2 / (lit(2.0) * dbl(col("n")))
          + z * sqrt(col("p_hat") * (lit(1.0) - col("p_hat")) / dbl(col("n"))
            + z2 / (lit(4.0) * dbl(col("n")) * dbl(col("n")))))
          / (lit(1.0) + z2 / dbl(col("n"))), lit(1.0)).as("wilson_hi"))
      .orderBy("event_type")
  }

  // ------------------------------------------------------------------
  // Benjamini–Hochberg FDR over the per-metric Welch z family
  // ------------------------------------------------------------------

  /** Two-sided significance level the BH procedure controls FDR at. */
  val FdrAlpha = 0.05
  /** Largest metric-family size the literal boundary table covers —
    * far above the event-type domain. A family larger than this finds
    * no boundary rows, and the procedure reads NULL in `rejected` on
    * EVERY row (the step-up is undefined without its boundaries —
    * spec-pinned; a bare k_star = 0 would silently report "nothing
    * significant"). */
  val FdrMaxM = 32

  /** Φ⁻¹ via Acklam's rational approximation (relative error < 1.15e−9
    * — far below any boundary-crossing z in these families; the same
    * public algorithm behind most statistical libraries). Runs at PLAN
    * time only: the z boundaries it produces are embedded as double
    * LITERALS in both the Spark plan and the oracle SQL, so engine
    * agreement is by construction, not by libm. */
  private def invNorm(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      1.374750420660024e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else -invNorm(1 - p)
  }

  /** The (m, rank, z-boundary) rows BH consults: boundary(m, i) =
    * Φ⁻¹(1 − α·i/(2m)), every m ≤ [[FdrMaxM]]. Computed once at plan
    * time; [[fdrBoundarySqlValues]] renders the SAME doubles into the
    * oracle (Double.toString round-trips, so both engines parse the
    * identical bits). */
  private[graft] lazy val fdrBoundaries: Seq[(Int, Int, Double)] =
    for { m <- 1 to FdrMaxM; i <- 1 to m }
      yield (m, i, invNorm(1.0 - FdrAlpha * i / (2.0 * m)))

  private[graft] lazy val fdrBoundarySqlValues: String =
    // the boundary rides as CAST('<shortest-repr>' AS DOUBLE): a bare
    // numeric literal in a VALUES list is typed DECIMAL by DuckDB and
    // its decimal→double conversion can land one ulp off Java's
    // strtod; the string cast is correctly-rounded in both engines
    fdrBoundaries.map { case (m, i, z) => s"($m, $i, CAST('$z' AS DOUBLE))" }
      .mkString(", ")

  /** Benjamini–Hochberg step-up over the per-event-type Welch z family
    * — the multiplicity correction an experimentation platform MUST
    * apply before reading five metric movements off one experiment
    * (at α=.05, a 5-metric family false-positives ~23% of null
    * experiments uncorrected). Each event type gets the Welch z on its
    * per-user value total (the SAME keyed [[welchMomentsOf]] seam as
    * the t test / MDE / sequential monitor — one variance definition
    * everywhere); p-value ordering is |z| DESCENDING, so BH's
    * "p_(i) ≤ α·i/m" is exactly "|z|_(i) ≥ Φ⁻¹(1 − α·i/(2m))" against
    * the literal boundary table — the procedure runs entirely on
    * comparisons of identically-computed doubles, no runtime CDF.
    *
    * Degenerate metrics (an arm with <2 users, zero pooled variance)
    * read z NULL upstream and are EXCLUDED from the family — m counts
    * only testable metrics, matching the R convention of dropping NA
    * p-values before p.adjust.
    *
    * Scale shape: one map-side-combinable groupBy(event_type, user_id),
    * a per-type arm rollup, then every remaining step (rank, boundary
    * join, step-up max) runs on the BOUNDED metric table (|event
    * types| rows) — window functions included, the bounded-aggregate-
    * table rule. */
  def abFdrByType(spark: SparkSession, dir: String): DataFrame =
    fdrOfPerUser(Tables(spark, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(dec2(col("value"))).cast(Dec2).as("y")))

  /** The BH tail over any (event_type, user_id, y: DECIMAL(18,2))
    * relation — shared by the batch readout above and the streaming
    * moment-log serve (graft.streaming.StreamingFdr), the
    * [[welchOfPerUser]] pattern: one moment definition, one boundary
    * table, twin drift impossible. */
  def fdrOfPerUser(perUser: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val z0 = welchMomentsOf(perUser, Seq("event_type"))
      .select(col("event_type"), col("n0"), col("n1"),
        col("mean0"), col("mean1"),
        (col("v0") / dbl(col("n0"))).as("se0"),
        (col("v1") / dbl(col("n1"))).as("se1"))
      .select(col("event_type"), col("n0"), col("n1"),
        col("mean0"), col("mean1"),
        when(col("se0") + col("se1") > 0.0,
          (col("mean0") - col("mean1")) / sqrt(col("se0") + col("se1")))
          .as("z"))
      .filter(col("z").isNotNull)
    val ranked = z0
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("rank", row_number().over(
        Window.orderBy(abs(col("z")).desc, col("event_type"))))
    val bounds = perUser.sparkSession.createDataFrame(fdrBoundaries)
      .toDF("m", "rank", "z_bound")
    val stepped = ranked
      .join(broadcast(bounds), Seq("m", "rank"), "left")
      .withColumn("crossed", abs(col("z")) >= col("z_bound"))
      .withColumn("k_star",
        max(when(col("crossed"), col("rank")).otherwise(0))
          .over(Window.partitionBy()))
      // a family larger than FdrMaxM has no boundary rows at all; the
      // step-up is then UNDEFINED, and the loud answer is NULL on every
      // row — without this guard k_star = 0 would read as a definite
      // "nothing significant" on a family of wildly significant metrics
      .withColumn("unbounded",
        max(when(col("z_bound").isNull, 1).otherwise(0))
          .over(Window.partitionBy()))
    stepped
      .select(col("event_type"), col("n0"), col("n1"),
        col("mean0"), col("mean1"), col("z"),
        col("m").cast(LongType).as("m"),
        col("rank").cast(LongType).as("rank"), col("z_bound"),
        when(col("unbounded") === 0, col("rank") <= col("k_star"))
          .as("rejected"))
      .orderBy("rank")
  }
}
