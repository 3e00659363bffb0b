package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The grid range join's reason to exist is PLAN SHAPE: a join whose only
  * predicate is a range lands on BroadcastNestedLoopJoin (O(points ×
  * intervals) compares — the 100 TB cliff); the week-cell decomposition
  * must turn it into a hash-shuffled EQUI join. Values are pinned by the
  * DuckDB oracle; this pins the shape and the naive-join equivalence. */
class RangeJoinSpec extends SparkSpec {

  test("j12: equi join on the grid cell, no BroadcastNestedLoopJoin anywhere") {
    val df = JoinOps.j12RangeJoin(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"no equi join in plan:\n$plan")
  }

  test("j12 == the naive range-predicate join, row for row") {
    val got = JoinOps.j12RangeJoin(spark, Sf0001).collect().map(_.toSeq)
    val ord = Tables(spark, Sf0001, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables(spark, Sf0001, "lineitem")
    // the shape j12 refuses to run at scale — fine as a test anchor
    val want = li.join(ord,
        li("l_shipdate") >= ord("o_orderdate") &&
          li("l_shipdate") < ord("o_orderdate") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipments"),
        revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("j13: overlap join stays an equi join; pairs arrive exactly once") {
    val df = JoinOps.j13IntervalOverlap(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join fell back to a nested loop:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exactly-once is structural (overlap-start-cell ownership), so the
    // key pairs must already be unique without any distinct in the plan
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.length == keys.toSet.size, "pair emitted from more than one shared cell")
    assert(!plan.contains("Deduplicate") && !df.queryExecution.logical.toString.contains("Deduplicate"))
  }

  test("j13 == the naive overlap-predicate join, row for row") {
    val got = JoinOps.j13IntervalOverlap(spark, Sf0001).collect().map(_.toSeq)
    def win(mod: Int) = Tables(spark, Sf0001, "orders")
      .filter(col("o_orderkey") % mod === 0)
      .select(col("o_orderkey"), col("o_orderdate"))
    val a = win(97).select(col("o_orderkey").as("campaign_key"), col("o_orderdate").as("sa"))
    val b = win(89).select(col("o_orderkey").as("promo_key"), col("o_orderdate").as("sb"))
    val want = a.join(b,
        col("sa") < col("sb") + expr("INTERVAL 10 DAYS") &&
          col("sb") < col("sa") + expr("INTERVAL 7 DAYS"))
      .select(col("campaign_key"), col("promo_key"),
        (least(col("sa") + expr("INTERVAL 7 DAYS"), col("sb") + expr("INTERVAL 10 DAYS"))
          .cast("long") - greatest(col("sa"), col("sb")).cast("long"))
          .divide(86400L).cast("int").as("overlap_days"))
      .orderBy("campaign_key", "promo_key").collect().map(_.toSeq)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }
}
