package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window / analytic operators (absent from the reference — SURVEY.md §2 —
  * but required for a complete serving surface: top-N per group, running
  * totals, deltas).
  *
  * Scale note: window partitions shuffle once on the partition key; keys
  * here (priority, user) have bounded per-key cardinality, so no single
  * task sees unbounded state. Unbounded-key running totals at 100 TB would
  * switch to range-bucketed two-pass prefix sums.
  */
object WindowOps {

  /** Top-N per group via row_number — deterministic tie-break on the key. */
  def w1TopNPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast(IntegerType))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Running (cumulative) sum per user over event order — exact via the
    * decimal route so prefix sums are order-stable bit-for-bit. */
  def w2RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables(spark, dir, "events")
      .select(
        col("user_id"), col("event_id"),
        sum(dec2(col("value"))).over(w).cast(DoubleType).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Lag delta per user: value − previous value (null on first row). */
  def w3LagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables(spark, dir, "events")
      .select(
        col("user_id"), col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy("user_id", "event_id")
  }

  /** Gap-based sessionization (30-minute inactivity closes a session):
    * lag → break flag → running sum = session id → per-session metrics.
    * The gap test uses exact interval arithmetic on microsecond
    * timestamps (engine-identical); session metrics use the decimal
    * route. Two window passes + one aggregate, all partitioned by user —
    * state per task is bounded by one user's events, and the streaming
    * twin (graft.streaming.StatefulSessions) holds only the open session. */
  def w4Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = Tables(spark, dir, "events")
      .withColumn("brk",
        when(col("ts") - lag(col("ts"), 1).over(w) > expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(IntegerType))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** W4b — native `session_window` aggregation: the same 30-minute-gap
    * sessions as w4Sessionize but through Spark's built-in session
    * operator (SessionWindow + UpdatingSessionsExec merge — a different
    * physical plan from the lag/cumsum window formulation, and the one
    * that carries over to Structured Streaming unchanged). Boundary
    * semantics differ from w4 at EXACT gap multiples: session_window's
    * end (last event + gap) is EXCLUSIVE, so an event arriving exactly
    * 30 minutes after the last starts a NEW session, where w4's strict
    * `>` break keeps it — the oracle encodes the `>=` rule, and both
    * formulations are kept precisely because the two tie rules are both
    * real (reference analytics vs Spark-native streaming parity). */
  def w4bSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  /** W6 — ROWS-frame moving average: last-4-events mean per user (frame
    * counted in rows, not time — the other frame family). Exact decimal
    * numerator over an integer denominator; count() over the same frame
    * handles the partition head where fewer than 4 rows exist. */
  def w6MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(-3, 0)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        (sum(dec2(col("value"))).over(w).cast(DoubleType) /
          count(col("value")).over(w)).as("mavg_4"))
      .orderBy("user_id", "event_id")
  }

  /** W7 — rank family: dense_rank, percent_rank, cume_dist and ntile(4)
    * over order price per priority class (deterministic total order;
    * percent_rank and cume_dist are exact small-integer divisions,
    * engine-identical). */
  def w7RankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).cast(IntegerType).as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).cast(IntegerType).as("quartile"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** W8 — navigation family over the FULL partition frame: each event
    * annotated with its user's first, last, and second event type
    * (first_value / last_value / nth_value with an explicit
    * unbounded-both-ways ROWS frame — last_value under the default frame
    * is the current row, the classic window gotcha). Deterministic via
    * the unique (ts, event_id) sort; one shuffle on user_id shared by all
    * three measures. */
  def w8FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val full = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(full).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        nth_value(col("event_type"), 2).over(full).as("second_type"))
      .orderBy("user_id", "event_id")
  }

  /** W5 — rolling time-RANGE window: trailing 1-hour sum of value per
    * user. The frame is defined on the time axis (µs since epoch), not on
    * row counts, so it is insensitive to event density — the same frame
    * semantics DuckDB expresses as RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING. Decimal route keeps the moving sums exact; one shuffle on
    * user_id. */
  def w5RollingTime(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000, 0)
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        sum(dec2(col("value"))).over(w).cast(DoubleType).as("roll_1h"))
      .orderBy("user_id", "event_id")
  }
}
