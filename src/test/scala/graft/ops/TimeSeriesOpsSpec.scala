package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics tests for the time-series event operators: z-score anomaly
  * detection and hourly gap-fill with forward fill. */
class TimeSeriesOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Planted fixture inside the operator's pinned 2024-01 spine window:
    * user 10 has hourly view means at hours 0 (= 5.0) and 2 (= 7.0);
    * user 20 never views; the error series is tight around 10 except one
    * planted 1000.0 outlier. */
  private lazy val evDir: String = {
    import spark.implicits._
    val rows = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10L, "view", 4.0, "{}"),
      (2L, ts("2024-01-01 00:50:00"), 10L, "view", 6.0, "{}"),
      (3L, ts("2024-01-01 02:15:00"), 10L, "view", 7.0, "{}"),
      (4L, ts("2024-01-05 12:00:00"), 20L, "click", 1.0, "{}"),
      (5L, ts("2024-01-02 00:00:00"), 10L, "error", 10.0, "{}"),
      (6L, ts("2024-01-02 01:00:00"), 10L, "error", 10.2, "{}"),
      (7L, ts("2024-01-02 02:00:00"), 20L, "error", 9.8, "{}"),
      (8L, ts("2024-01-02 03:00:00"), 20L, "error", 10.1, "{}"),
      (9L, ts("2024-01-02 04:00:00"), 20L, "error", 9.9, "{}"),
      (10L, ts("2024-01-02 05:00:00"), 20L, "error", 1000.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("ts_events")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ------------------------------------------------------------- anomaly

  test("ewma: planted recurrence, per-user reset, ts order with event_id tie-break") {
    import spark.implicits._
    // written deliberately OUT of time order; user 1: x=[2,4,8] by ts
    // → s=[2,3,5.5]; the two user-2 rows share a ts, so event_id decides
    val rows = Seq(
      (12L, ts("2024-01-01 02:00:00"), 1L, "view", 8.0, "{}"),
      (10L, ts("2024-01-01 00:00:00"), 1L, "view", 2.0, "{}"),
      (11L, ts("2024-01-01 01:00:00"), 1L, "view", 4.0, "{}"),
      (21L, ts("2024-01-01 00:00:00"), 2L, "view", 10.0, "{}"),
      (20L, ts("2024-01-01 00:00:00"), 2L, "view", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("ewma_events")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.ewmaSmooth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 10L, 2.0), (1L, 11L, 3.0), (1L, 12L, 5.5),
      (2L, 20L, 6.0), (2L, 21L, 8.0))) // (10+6)/2 — 20 first by event_id
  }

  test("anomaly: the planted outlier is flagged, nothing else") {
    val flagged = EventOps.anomalyZscore(spark, evDir).collect()
    assert(flagged.map(_.getAs[Long]("event_id")).toSeq == Seq(10L))
    val z = flagged.head.getAs[Double]("zscore")
    assert(z > 2.0) // a high outlier flags positive
  }

  test("anomaly: every flagged row really deviates > 2 sample stddevs") {
    val flagged = EventOps.anomalyZscore(spark, Sf0001)
    assert(flagged.count() > 0) // the synthetic data has tails
    // recompute the per-type stats independently (Spark's own stddev_samp)
    val stats = Tables(spark, Sf0001, "events")
      .groupBy(col("event_type").as("et"))
      .agg(avg(col("value")).as("m"), stddev_samp(col("value")).as("s"))
    val bad = flagged.join(stats, col("event_type") === col("et"))
      .filter(abs((col("value") - col("m")) / col("s")) <= 2.0 - 1e-9)
    assert(bad.count() == 0)
  }

  // ------------------------------------------------------------- gap-fill

  test("gapfill: planted series forward-fills between observations") {
    val r = EventOps.gapFillHourly(spark, evDir)
    val u10 = r.filter(col("user_id") === 10L).orderBy("hour_ts").collect()
    assert(u10.length == 720) // full January spine
    def filled(i: Int) = Option(u10(i).getAs[java.lang.Double]("value_filled"))
    assert(filled(0).contains(5.0)) // hour 0: mean(4, 6)
    assert(filled(1).contains(5.0)) // hour 1: carried forward
    assert(u10(1).getAs[Boolean]("is_observed") == false)
    assert(filled(2).contains(7.0)) // hour 2: new observation
    assert(filled(719).contains(7.0)) // carried to the end of the month
    assert(u10(0).getAs[Boolean]("is_observed"))
    assert(u10(2).getAs[Boolean]("is_observed"))
  }

  test("gapfill: users with no observations stay null; spine is dense") {
    val r = EventOps.gapFillHourly(spark, evDir)
    val u20 = r.filter(col("user_id") === 20L)
    assert(u20.count() == 720)
    assert(u20.filter(col("value_filled").isNotNull).count() == 0)
    assert(u20.filter(col("is_observed")).count() == 0)
  }

  test("gapfill: spine covers every user exactly once per hour (sf0.001)") {
    val r = EventOps.gapFillHourly(spark, Sf0001)
    val users = Tables(spark, Sf0001, "events")
      .select(col("user_id")).distinct().count()
    assert(r.count() == users * 720)
    // once a user has an observation, the fill never reverts to null
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("hour_ts"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val reverted = r
      .withColumn("seen", max(col("is_observed").cast("int")).over(w))
      .filter(col("seen") === 1 && col("value_filled").isNull)
    assert(reverted.count() == 0)
  }

  test("holt: planted recurrence, trend starts at zero, per-user reset") {
    import spark.implicits._
    // user 1: x=[2,4,8] → l=[2,3,5.75], b=[0,0.5,1.625] by hand:
    //   t2: l=(4+(2+0))/2=3,      b=((3−2)+0)/2=0.5
    //   t3: l=(8+(3+0.5))/2=5.75, b=((5.75−3)+0.5)/2=1.625
    // user 2's single row must reset the carry exactly (l=x, b=0)
    val rows = Seq(
      (12L, ts("2024-01-01 02:00:00"), 1L, "view", 8.0, "{}"),
      (10L, ts("2024-01-01 00:00:00"), 1L, "view", 2.0, "{}"),
      (11L, ts("2024-01-01 01:00:00"), 1L, "view", 4.0, "{}"),
      (20L, ts("2024-01-01 00:00:00"), 2L, "view", 6.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("holt_events")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.holtSmooth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 10L, 2.0, 0.0), (1L, 11L, 3.0, 0.5), (1L, 12L, 5.75, 1.625),
      (2L, 20L, 6.0, 0.0)))
  }

  test("holt: constant-slope series is tracked exactly after convergence") {
    import spark.implicits._
    // on x_t = t the recurrence converges to level=x, trend=1; seed far
    // off and check the planted tail is within numerical snap distance
    val rows = (1 to 40).map(i =>
      (i.toLong, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), 1L, "v", i.toDouble, "{}"))
    val dir = tempDir("holt_slope")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // error contracts by |λ| = √½ per step (complex pair of the 2×2
    // update matrix) → ~0.707³⁹ ≈ 1e-6 of the initial offset
    val last = EventOps.holtSmooth(spark, dir).collect().last
    assert(math.abs(last.getDouble(3) - 40.0) < 1e-4)
    assert(math.abs(last.getDouble(4) - 1.0) < 1e-4)
  }

  // ---------------------------------------------------------- acf/cusum

  /** Period-2 series: hours 0,2,4,… carry two 'tick' events, odd hours
    * none — lag-1 ACF ≈ −1, lag-2 ≈ +1. A second 'step' type runs
    * 1/hour for the first 360 hours then 3/hour — the planted
    * changepoint for CUSUM (target = 2, excess +1/hour after the step). */
  private lazy val acfDir: String = {
    import spark.implicits._
    val tick = (0 until 360).flatMap { k =>
      val h = 2 * k
      Seq((10000L + 2 * k, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:05:00"), 1L, "tick", 1.0, "{}"),
        (10001L + 2 * k, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:35:00"), 1L, "tick", 1.0, "{}"))
    }
    val step = (0 until 720).flatMap { h =>
      val base = Seq((20000L + 3 * h, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:10:00"), 2L, "step", 1.0, "{}"))
      if (h < 360) base
      else base ++ Seq(
        (20001L + 3 * h, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:20:00"), 2L, "step", 1.0, "{}"),
        (20002L + 3 * h, ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:40:00"), 2L, "step", 1.0, "{}"))
    }
    val dir = tempDir("acf_events")
    (tick ++ step).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("acf: planted period-2 series anticorrelates at lag 1, correlates at lag 2") {
    val byLag = EventOps.acfHourly(spark, acfDir).collect()
      .filter(_.getString(0) == "tick")
      .map(r => r.getInt(1) -> r.getDouble(8)).toMap
    assert(byLag(1) < -0.99 && byLag(3) < -0.99)
    assert(byLag(2) > 0.99)
  }

  test("acf: moments are exact integers and r stays in [-1, 1] (sf0.001)") {
    val rows = EventOps.acfHourly(spark, Sf0001).collect()
    val types = Tables(spark, Sf0001, "events")
      .select(col("event_type")).distinct().count()
    assert(rows.length == types * EventOps.AcfMaxLag)
    rows.foreach { r =>
      assert(r.getLong(2) == 720 - r.getInt(1)) // n_pairs = 720 − lag
      if (!r.isNullAt(8)) assert(math.abs(r.getDouble(8)) <= 1.0 + 1e-12)
    }
  }

  test("cusum: flat half stays at zero, step half climbs and alarms") {
    val s = EventOps.cusumCounts(spark, acfDir).collect()
      .filter(_.getString(0) == "step")
    assert(s.length == 720)
    val firstHalf = s.take(360)
    assert(firstHalf.forall(_.getDouble(3) == 0.0), "pre-step CUSUM must sit at 0")
    assert(firstHalf.forall(!_.getBoolean(4)))
    // post-step: +1 excess per hour, exactly 360.0 at the end; the alarm
    // fires once 5·√2 ≈ 7.07 is cleared and never clears again
    assert(s.last.getDouble(3) == 360.0)
    val alarms = s.map(_.getBoolean(4))
    // s at hour 360+j is j+1; first j+1 > 5√2 ≈ 7.07 is s=8 at index 367
    val firstAlarm = alarms.indexOf(true)
    assert(firstAlarm == 367, s"firstAlarm=$firstAlarm")
    assert(alarms.drop(firstAlarm).forall(identity), "alarm must latch while excess persists")
  }

  // --------------------------------------------------------- robust MAD

  test("mad anomaly: zero-MAD type flags only the outlier, score null") {
    import spark.implicits._
    val rows = (Seq.tabulate(4)(i => (100L + i, ts("2024-01-01 00:00:00"), 1L, "flat", 10.0, "{}")) :+
      (104L, ts("2024-01-01 01:00:00"), 1L, "flat", 1000.0, "{}")) ++
      (Seq.tabulate(9)(i => (200L + i, ts("2024-01-01 02:00:00"), 2L, "spread", 1.0 + i, "{}")) :+
        (209L, ts("2024-01-01 03:00:00"), 2L, "spread", 100.0, "{}"))
    val dir = tempDir("mad_events")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.anomalyMad(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(104L, 209L))
    val flat = got(0)
    assert(flat.getDouble(3) == 10.0 && flat.getDouble(4) == 0.0 && flat.isNullAt(5))
    val spread = got(1) // med 5 (lower discrete), devs sorted → mad 2
    assert(spread.getDouble(3) == 5.0 && spread.getDouble(4) == 2.0)
    assert(spread.getDouble(5) == 47.5)
  }

  test("mad anomaly: every flagged row clears 5 MADs (sf0.001)") {
    val got = EventOps.anomalyMad(spark, Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val dev = math.abs(r.getDouble(2) - r.getDouble(3))
      assert(dev > 5.0 * r.getDouble(4))
      if (!r.isNullAt(5)) assert(r.getDouble(5) > 5.0)
    }
  }

  // -------------------------------------------------------- transitions

  test("transitions: planted journeys count adjacent pairs, never cross users") {
    import spark.implicits._
    // user 1: view→click→view ; user 2: click→purchase ; user 3: single
    // event (no pair). Written out of order; the (ts, event_id) sort and
    // per-user reset decide adjacency.
    val rows = Seq(
      (12L, ts("2024-01-01 02:00:00"), 1L, "view", 0.0, "{}"),
      (10L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (11L, ts("2024-01-01 01:00:00"), 1L, "click", 0.0, "{}"),
      (21L, ts("2024-01-01 00:30:00"), 2L, "purchase", 0.0, "{}"),
      (20L, ts("2024-01-01 00:00:00"), 2L, "click", 0.0, "{}"),
      (30L, ts("2024-01-01 00:00:00"), 3L, "error", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tempDir("trans_events")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.eventTransitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("click", "purchase", 1L), ("click", "view", 1L), ("view", "click", 1L)))
  }

  test("transitions: totals balance — pairs = events − users (sf0.001)") {
    val ev = Tables(spark, Sf0001, "events")
    val want = ev.count() - ev.select(col("user_id")).distinct().count()
    val got = EventOps.eventTransitions(spark, Sf0001)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(got == want)
  }

  test("interval union: overlap and touch merge, gaps split, coverage counts once") {
    import spark.implicits._
    val dir = tempDir("iu_fix")
    val base = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // user 1: 0s and 1000s overlap; 1800s touches the first window's end
    // (0+1800) → still merges (strict-> rule); 5000s is past 1800+1800 →
    // new interval. user 2: one event.
    val ev = Seq(
      (1L, 10L, at(0), "view", 1.0), (1L, 11L, at(1000), "view", 1.0),
      (1L, 12L, at(1800), "view", 1.0), (1L, 13L, at(5000), "view", 1.0),
      (2L, 20L, at(0), "view", 1.0))
    ev.toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.intervalUnion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime, r.getInt(4)))
    val b = base.getTime
    assert(got.toSeq == Seq(
      (1L, 1, b, b + 3600000L, 3),          // [0, 1800+1800) absorbs 3 events
      (1L, 2, b + 5000000L, b + 6800000L, 1),
      (2L, 1, b, b + 1800000L, 1)))
    val cov = EventOps.intervalCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(cov(1L) == ((2, 4, 3600L + 1800L))) // overlap counted once
    assert(cov(2L) == ((1, 1, 1800L)))
  }

  test("interval union: real-data intervals are disjoint, ordered, and reconcile") {
    def us(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val ints = EventOps.intervalUnion(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        us(r.getTimestamp(2)), us(r.getTimestamp(3)), r.getInt(4)))
    assert(ints.nonEmpty)
    ints.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      s.foreach { case (_, _, st, en, n) => assert(en > st && n >= 1) }
      s.zip(s.tail).foreach { case ((_, _, _, e1, _), (_, _, s2, _, _)) =>
        assert(s2 > e1, "merged intervals must be strictly disjoint")
      }
    }
    // events absorbed == total events; coverage == Σ lengths
    val nEvents = Tables(spark, Sf0001, "events").count()
    assert(ints.map(_._5.toLong).sum == nEvents)
    val cov = EventOps.intervalCoverage(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // covered_s = (Σ µs-lengths) div 1e6 — sum BEFORE dividing (the
    // op's rule; per-interval div would drop each boundary's sub-second
    // remainder separately)
    ints.groupBy(_._1).foreach { case (u, g) =>
      assert(cov(u) == g.map(i => i._4 - i._3).sum / 1000000L)
    }
  }

  test("holt-winters: bit-equal to a driver-side replay of the recurrence") {
    val rows = EventOps.holtWintersHourly(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getAs[Double]("pred"), r.getAs[Double]("resid"))))
    val types = rows.map(_._1).distinct
    assert(types.nonEmpty && rows.length == types.length * 720)
    // independent replay: hourly counts from the raw events, then the
    // exact fold — every level/trend/seasonal must match bit-for-bit
    val counts = Tables(spark, Sf0001, "events")
      .groupBy(col("event_type"),
        ((unix_timestamp(date_trunc("hour", col("ts"))) -
          unix_timestamp(lit("2024-01-01 00:00:00").cast("timestamp"))) / 3600)
          .cast("int").as("t"))
      .count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    types.foreach { et =>
      var l = 0.0; var b = 0.0; val seas = Array.fill(24)(0.0)
      val got = rows.filter(_._1 == et).sortBy(_._2)
      got.foreach { case (_, t, (x, lv, tr, sn, pd, rs)) =>
        assert(x == counts.getOrElse((et, t), 0L), s"count mismatch at ($et,$t)")
        val xd = x.toDouble; val j = t % 24
        var pred = xd
        if (t == 0) { l = xd; b = 0.0 }
        else {
          pred = (l + b) + seas(j)
          val lPrev = l
          l = ((xd - seas(j)) + (l + b)) / 2
          b = ((l - lPrev) + b) / 2
        }
        val sNew = ((xd - l) + seas(j)) / 2
        seas(j) = sNew
        assert(lv == l && tr == b && sn == sNew, s"state diverged at ($et,$t)")
        assert(pd == pred && rs == xd - pred, s"forecast diverged at ($et,$t)")
      }
    }
  }

  test("changepoint: planted level shift found at the exact boundary hour") {
    import spark.implicits._
    val dir = tempDir("changepoint")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:30:00").getTime
    // hours 0..359 at one event/hour, hours 360..719 at three — the
    // argmax |S| sits on the last low hour (tau = 359)
    val rows = (0 until 720).flatMap { h =>
      val copies = if (h < 360) 1 else 3
      (0 until copies).map { i =>
        (h.toLong * 10 + i, new java.sql.Timestamp(base + h * 3600000L),
          7L, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.changepointHourly(spark, dir).collect()(0)
    assert(r.getAs[String]("event_type") == "view")
    assert(r.getAs[Long]("tau") == 359L, s"got $r")
    assert(r.getAs[Long]("n_hours") == 720L)
    assert(r.getAs[Long]("mean_before_micro") == 1000000000000L)
    assert(r.getAs[Long]("mean_after_micro") == 3000000000000L)
    assert(r.getAs[Long]("shift_micro") == 2000000000000L)
    // score = |n·P − c·T| at the boundary: |720·360 − 360·1440|
    assert(r.getAs[Long]("score") == 259200L)
  }

  test("changepoint: a constant series scores zero everywhere, tau ties to hour 0") {
    import spark.implicits._
    val dir = tempDir("changepoint_const")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:30:00").getTime
    val rows = (0 until 720).map { h =>
      (h.toLong, new java.sql.Timestamp(base + h * 3600000L), 7L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = EventOps.changepointHourly(spark, dir).collect()(0)
    assert(r.getAs[Long]("score") == 0L)
    assert(r.getAs[Long]("tau") == 0L, "all scores tie at 0 → earliest hour wins")
    assert(r.getAs[Long]("shift_micro") == 0L)
  }

  test("conformal: q_hat is exactly the ceil(0.9(n+1))-th calibration residual") {
    val hw = EventOps.holtWintersHourly(spark, Sf0001)
      .select(col("event_type"), col("t"), abs(col("resid")).as("s"))
      .collect()
    val got = EventOps.conformalCoverage(spark, Sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val cal = hw.filter(x => x.getString(0) == et &&
        x.getInt(1) < EventOps.ConformalCalHours).map(_.getDouble(2)).sorted
      val k = ((9L * (cal.length + 1) + 9) / 10).toInt
      assert(r.getAs[Long]("n_cal") == cal.length.toLong)
      assert(r.getAs[Double]("q_hat") == cal(k - 1),
        s"$et: q_hat should be the rank-$k order statistic")
      val eval = hw.filter(x => x.getString(0) == et &&
        x.getInt(1) >= EventOps.ConformalCalHours).map(_.getDouble(2))
      assert(r.getAs[Long]("n_eval") == eval.length.toLong)
      assert(r.getAs[Long]("n_covered") ==
        eval.count(_ <= r.getAs[Double]("q_hat")).toLong)
      val cov = r.getAs[Double]("coverage")
      assert(cov > 0.0 && cov <= 1.0)
    }
  }
}
