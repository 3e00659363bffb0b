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
}
