package graft.tools

import graft.GraftSession
import graft.ops._

/** Scratch profiler for operator tuning — point `time` blocks at the
  * op (or a temporary inline decomposition) under investigation. Kept
  * deliberately thin at rest: inline stage copies drift from the real
  * operator the moment it is tuned (the round-13 modularity
  * investigation's stage breakdown was deleted once the scan-twice fix
  * landed), so the committed form times only REAL entry points.
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
    for (t <- Seq("lineitem", "orders", "supplier", "customer"))
      Tables(spark, dir, t).queryExecution.toRdd.count()

    time("modularity") {
      GraphOps.nationModularity(spark, dir).queryExecution.toRdd.count()
    }
    time("assortativity") {
      GraphOps.degreeAssortativity(spark, dir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
