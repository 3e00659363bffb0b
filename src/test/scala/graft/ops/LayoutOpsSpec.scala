package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-grid layout: the probe must be layout-transparent (same rows as a
  * plain filter), actually prune partition directories, and beat the
  * linear layout on the 2-D rectangle. */
class LayoutOpsSpec extends SparkSpec {

  test("z-probe equals the plain filtered aggregate (layout transparency)") {
    val got = LayoutOps.zProbe(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq

    val li = Tables(spark, Sf0001, "lineitem")
    val m = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).collect()(0)
    val (mp, ms) = (m.getLong(0), m.getLong(1))
    val want = li
      .filter(col("l_partkey") >= mp * 2 / 10 && col("l_partkey") < mp * 4 / 10 &&
        col("l_suppkey") >= ms * 1 / 10 && col("l_suppkey") < ms * 4 / 10)
      .groupBy(col("l_returnflag"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("probe reads strictly fewer partition directories than the lake holds") {
    val (lake, g) = LayoutOps.ensureZLake(spark, Sf0001)
    val all = spark.read.parquet(lake)
    val total = all.select(col("zbucket")).distinct().count()
    val cands = for {
      pc <- (g.p1 / g.wp) to ((g.p2 - 1) / g.wp)
      sc <- (g.s1 / g.ws) to ((g.s2 - 1) / g.ws)
    } yield graft.functions.MortonInterleave.compute(pc, sc)
    val pruned = all.filter(col("zbucket").isin(cands: _*))
    // the partition-column filter must prune at file-listing time:
    // the files actually read are a strict subset of the lake's files
    val readFiles = pruned.select(col("_metadata.file_path")).distinct().count()
    val lakeFiles = all.select(col("_metadata.file_path")).distinct().count()
    assert(readFiles < lakeFiles,
      s"pruning had no effect: $readFiles of $lakeFiles files")
    // and the executed scan's partitionFilters carry the IN list
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zbucket"), plan)
  }

  test("gate: z-grid never scans a larger fraction than the linear layout") {
    val r = LayoutOps.zLayoutGate(spark, Sf0001).collect()(0)
    assert(r.getAs[Boolean]("passes"),
      s"z ${r.getInt(0)}/${r.getInt(1)} vs linear ${r.getInt(2)}/${r.getInt(3)}")
    assert(r.getInt(0) >= 1 && r.getInt(1) >= r.getInt(0))
  }

  // -------------------------------------------------- file-stat skipping

  test("skip probe: equals the plain filtered aggregate (skipping transparency)") {
    val got = LayoutOps.skipProbe(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val lo = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-04-01 00:00:00")
    val want = Tables(spark, Sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") < lit(hi))
      .groupBy(col("l_returnflag"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("skip probe: the stats index admits strictly fewer files than the lake") {
    val lake = LayoutOps.ensureSortedLake(spark, Sf0001)
    val stats = LayoutOps.fileStats(spark, lake)
    val total = stats.count()
    val lo = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-04-01 00:00:00")
    val kept = stats.filter(col("lo") < lit(hi) && col("hi") >= lit(lo)).count()
    // a 3-month probe over a ~7-year domain split into 16 sorted ranges
    // must skip most files — the whole point of the stats index
    assert(kept >= 1 && kept < total, s"kept $kept of $total")
    assert(kept <= total / 2, s"skipping too weak: kept $kept of $total")
  }
}
