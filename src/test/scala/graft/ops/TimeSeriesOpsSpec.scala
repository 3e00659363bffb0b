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
}
