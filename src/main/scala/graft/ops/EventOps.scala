package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
