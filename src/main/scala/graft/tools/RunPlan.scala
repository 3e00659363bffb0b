package graft.tools

import graft.{GraftSession, Registry}

/** Execute a registry query and dump the FINAL adaptive physical plan.
  * Static `explain` shows the initial AQE plan only; runtime decisions
  * (ReusedExchange/ReusedStage, broadcast demotion, skew splits,
  * coalesced reads) appear only after execution — this is the tool that
  * verifies they actually happened.
  * Run: sbt "runMain graft.tools.RunPlan [sfDir] [name...]" */
object RunPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Registry.all.filter(_.headline).map(_.name)
    val spark = GraftSession.get("graft-runplan")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = Registry.byName(n).build(spark, dir)
      val t0 = System.nanoTime()
      val rows = df.queryExecution.toRdd.count()
      println(f"rows=$rows  wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      // executedPlan after an action = final adaptive plan
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
