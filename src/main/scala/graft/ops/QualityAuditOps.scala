package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit (the Deequ/expectations pattern): a
  * fixed rule set evaluated over the warehouse tables into one
  * (rule, violations, passes) report — the gate a 100 TB ingest runs
  * before promoting a snapshot. Every rule is exact integer counting
  * (violation counts, never float scores), so the whole report is
  * value-oracled; `passes` is the literal the oracle expects, the
  * knnRecallGate pattern applied to data quality.
  *
  * Scale shape: each rule is one aggregation or one anti-join —
  * referential integrity is a left-anti count (the j4 shape, corpus
  * never shuffles more than the key column), uniqueness compares
  * count to distinct-count in one pass, range/null rules are pure
  * conditional sums folded into a single scan per table. Rules over
  * the same table share one aggregation (lineitem: 4 rules, 1 scan). */
object QualityAuditOps {

  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val ord = Tables(spark, dir, "orders")

    // 4 lineitem rules in ONE scan: range, range, null, duplicate line key
    val liAgg = li.agg(
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0, 1L)
        .otherwise(0L)).as("qty_range"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
        .otherwise(0L)).as("disc_range"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("shipdate_null"),
      (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
        .as("line_key_dup"))
    // orders primary key uniqueness: one pass
    val ordAgg = ord.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("order_key_dup"))
    // referential integrity: lineitem → orders (anti-join count; only the
    // key columns move)
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lines"))

    val r = liAgg.crossJoin(broadcast(ordAgg)).crossJoin(broadcast(orphans))
      .collect()(0)
    val rules = Seq(
      ("lineitem.discount_in_0_0.1", r.getAs[Long]("disc_range")),
      ("lineitem.line_key_unique", r.getAs[Long]("line_key_dup")),
      ("lineitem.orderkey_in_orders", r.getAs[Long]("orphan_lines")),
      ("lineitem.quantity_in_1_50", r.getAs[Long]("qty_range")),
      ("lineitem.shipdate_not_null", r.getAs[Long]("shipdate_null")),
      ("orders.orderkey_unique", r.getAs[Long]("order_key_dup")))
    rules.map { case (name, v) => (name, v, v == 0L) }
      .toDF("rule", "violations", "passes")
      .orderBy("rule")
  }

  // ------------------------------------------------------------------
  // k-anonymity audit (privacy release gate)
  // ------------------------------------------------------------------

  /** Anonymity floor for [[kAnonymityAudit]]: a quasi-identifier group
    * is releasable only when ≥ K DISTINCT users share it (the privacy
    * unit is the user, not the row — one chatty user in a bucket is
    * still one identifiable person). 15 makes the flag bite in both
    * directions at sf0.1 (hourly groups span ~12–51 users there). */
  val KAnonK = 15

  /** k-anonymity audit over the event stream (Sweeney '02, the release
    * gate form): group by the quasi-identifier (event_type, hour) —
    * the attribute combination an adversary could know from the
    * outside — and flag every group whose distinct-user count is below
    * [[KAnonK]]. Publishing a below-k group's rows (even "anonymized")
    * narrows those users to a set smaller than k; a training-data
    * export over behavioral logs runs exactly this audit before
    * release, alongside the text-side PII scrub (TextOps.scrubPii).
    *
    * Scale shape: ONE exchange keyed by the QID. The row count is
    * map-side combinable; the distinct-user count is Spark's two-phase
    * distinct aggregate (partial distinct per partition before the
    * wire). QID cardinality is bounded (types × hours), so the output
    * is small at any corpus size; the approximate swap at extreme
    * cardinality is the HLL sketch family (SketchOps), same plan. */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    kAnonymityAudit(spark, dir, KAnonK)

  def kAnonymityAudit(spark: SparkSession, dir: String, k: Int): DataFrame =
    kAnonGroups(spark, dir)
      .select(col("event_type"), col("qid_hour"), col("n_rows"), col("n_users"),
        (col("n_users") >= k).as("anonymous"))
      .orderBy("event_type", "qid_hour")

  /** Row-suppression summary — the enforcement half of the audit: per
    * event type, how many rows sit in below-k groups (suppressed on
    * release) vs releasable rows. Derived from the audit's group table
    * (no second event scan): a ~|QID|-row re-aggregation. */
  def kAnonymitySuppress(spark: SparkSession, dir: String): DataFrame =
    kAnonymitySuppress(spark, dir, KAnonK)

  def kAnonymitySuppress(spark: SparkSession, dir: String, k: Int): DataFrame =
    kAnonGroups(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(col("n_rows")).as("n_total"),
        sum(when(col("n_users") < k, col("n_rows")).otherwise(0L)).as("n_suppressed"),
        sum(when(col("n_users") >= k, col("n_rows")).otherwise(0L)).as("n_kept"),
        sum(when(col("n_users") < k, 1L).otherwise(0L)).cast(
          org.apache.spark.sql.types.IntegerType).as("n_groups_suppressed"))
      .orderBy("event_type")

  private def kAnonGroups(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("qid_hour"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).cast(
          org.apache.spark.sql.types.IntegerType).as("n_users"))

  /** Diversity floor for [[lDiversityAudit]]. */
  val LDiversityL = 3

  /** Distinct ℓ-diversity audit (Machanavajjhala et al. '07) — the
    * gap k-anonymity leaves open: a group of ≥ k users whose SENSITIVE
    * attribute is all one value still discloses that value for every
    * member ("homogeneity attack"). Per quasi-identifier group (the
    * [[kAnonymityAudit]] QID: event_type × hour), count distinct
    * sensitive values — here the payload category carried in the JSON
    * props (k mod 10, a 10-ary categorical) — and flag groups below
    * [[LDiversityL]]. A release gate runs BOTH audits: k on who is in
    * the group, ℓ on what the group says about them.
    *
    * Scale shape: identical to the k-audit — ONE exchange keyed by the
    * bounded QID, two-phase distinct aggregate, |types × hours| output
    * rows at any corpus size. */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame =
    lDiversityAudit(spark, dir, LDiversityL)

  def lDiversityAudit(spark: SparkSession, dir: String, l: Int): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("qid_hour"),
        (get_json_object(col("props"), "$.k").cast(
          org.apache.spark.sql.types.IntegerType) % 10).as("sensitive"))
      .groupBy(col("event_type"), col("qid_hour"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("sensitive")).cast(
          org.apache.spark.sql.types.IntegerType).as("n_sensitive"))
      .select(col("event_type"), col("qid_hour"), col("n_rows"),
        col("n_sensitive"), (col("n_sensitive") >= l).as("diverse"))
      .orderBy("event_type", "qid_hour")

  /** GENERALIZATION — the enforcement alternative to suppression: a
    * below-k hourly group is not dropped but released at a coarser
    * time grain (hour → day → month), the classic quasi-identifier
    * generalization hierarchy (Sweeney's k-anonymity via
    * generalization-and-suppression). Per hourly group: the distinct-
    * user count at each grain and the FINEST grain clearing k; groups
    * clearing nothing fall back to `suppress`. Maximizes released
    * detail at a fixed privacy floor — what a real export pipeline
    * ships instead of the blunt suppression rule.
    *
    * Scale shape: three QID-keyed aggregations over the scan (distinct
    * users cannot fold upward from finer grains, so each grain
    * aggregates independently — the grouping-sets EXPAND form is the
    * single-scan swap when the input scan dominates); the two coarser
    * tables are grain-bounded (≤ types × days/months rows) and
    * broadcast into the hourly table. */
  def kAnonymityGeneralize(spark: SparkSession, dir: String): DataFrame =
    kAnonymityGeneralize(spark, dir, KAnonK)

  def kAnonymityGeneralize(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("user_id"))
    def grains(g: String) = ev
      .groupBy(col("event_type"), date_trunc(g, col("ts")).as(s"qid_$g"))
      .agg(countDistinct(col("user_id")).cast(
        org.apache.spark.sql.types.IntegerType).as(s"n_$g"))
    grains("hour")
      .withColumn("qid_day", date_trunc("day", col("qid_hour")))
      .withColumn("qid_month", date_trunc("month", col("qid_hour")))
      .join(broadcast(grains("day")), Seq("event_type", "qid_day"))
      .join(broadcast(grains("month")), Seq("event_type", "qid_month"))
      .select(col("event_type"), col("qid_hour"),
        col("n_hour"), col("n_day"), col("n_month"),
        when(col("n_hour") >= k, "hour")
          .when(col("n_day") >= k, "day")
          .when(col("n_month") >= k, "month")
          .otherwise("suppress").as("release_level"))
      .orderBy("event_type", "qid_hour")
  }
}
