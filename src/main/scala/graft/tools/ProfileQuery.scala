package graft.tools

import graft.GraftSession
import graft.ops._
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for operator tuning.
  * Run: sbt "runMain graft.tools.ProfileQuery [sfDir]" */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-profile")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warmup + input cache
    Tables.enableInputCache()
    Tables(spark, dir, "lineitem").queryExecution.toRdd.count()
    Tables(spark, dir, "orders").queryExecution.toRdd.count()
    Tables(spark, dir, "supplier").queryExecution.toRdd.count()
    Tables(spark, dir, "customer").queryExecution.toRdd.count()

    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
    time("join-no-distinct") { joined.queryExecution.toRdd.count() }
    val e0 = joined.distinct()
    time("e0-distinct") { e0.queryExecution.toRdd.count() }
    val e1 = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    time("e1-sym") { e1.queryExecution.toRdd.count() }
    val sup = Tables(spark, dir, "supplier").select(
      (col("s_suppkey") * 2).as("node"),
      col("s_nationkey").cast("long").as("community"))
    val cust = Tables(spark, dir, "customer").select(
      (col("c_custkey") * 2 + 1).as("node"),
      col("c_nationkey").cast("long").as("community"))
    val labels = sup.union(cust)
    val deg = e1.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    time("deg") { deg.queryExecution.toRdd.count() }
    val cd = deg.join(labels, "node").groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    time("cd") { cd.queryExecution.toRdd.count() }
    val ei = e1
      .join(labels.select(col("node").as("src"), col("community").as("ca")), "src")
      .join(labels.select(col("node").as("dst"), col("community").as("cb")), "dst")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_in2"))
    time("ei") { ei.queryExecution.toRdd.count() }
    time("full-op") { GraphOps.nationModularity(spark, dir).queryExecution.toRdd.count() }
    spark.stop()
  }
}
