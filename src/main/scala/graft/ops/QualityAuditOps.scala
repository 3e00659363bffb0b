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
}
