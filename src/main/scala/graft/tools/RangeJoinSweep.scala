package graft.tools

import graft.GraftSession
import graft.ops.{revenueExact, JoinOps, Tables}
import org.apache.spark.sql.functions._

/** Scaling sweep for the grid-bucketed range join (j12) against its
  * naive non-grid twin — the measured growth curve behind the "no
  * nested loop at any scale" claim. The naive twin expresses the SAME
  * query with the range predicate as the ONLY join condition, which
  * Spark can only plan as a BroadcastNestedLoopJoin:
  * O(|points|·|intervals|) compares, growing ~quadratically with SF,
  * while the grid form shuffles hash(cell) and grows with data volume.
  * Run: sbt "runMain graft.tools.RangeJoinSweep [sfDir...]" */
object RangeJoinSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-rangejoin-sweep")

    def naive(dir: String) = {
      val campaigns = Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_orderdate"))
      val shipments = Tables(spark, dir, "lineitem")
        .select(col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      shipments.join(campaigns,
          col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_shipments"),
          revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("o_orderkey")
    }

    def time(what: String)(body: => Long): Double = {
      // min of 2: same one-GC-pause argument as Bench's min-of-3
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, rows) = (ts.map(_._1).min, ts.head._2)
      println(f"[sweep] $what%-32s $sec%8.2fs  rows=$rows")
      sec
    }

    dirs.foreach { dir =>
      println(s"\n===== $dir =====")
      // warmup scan to absorb classloading/codegen on first dir
      Tables(spark, dir, "lineitem").queryExecution.toRdd.count()
      val grid = time(s"j12 grid")(
        JoinOps.j12RangeJoin(spark, dir).queryExecution.toRdd.count())
      val nv = time(s"naive range (BNLJ)")(
        naive(dir).queryExecution.toRdd.count())
      println(f"[sweep] naive/grid ratio: ${nv / grid}%.1fx")
    }
    spark.stop()
  }
}
