package graft.tools

import graft.{GraftSession, Registry}

/** Dump formatted physical plans for headline queries — the
  * explain-and-iterate loop: verify pushdown/pruning/broadcast/codegen
  * properties hold before trusting a benchmark number.
  * Run: sbt "runMain graft.tools.ExplainPlans [sfDir] [name...]" */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Registry.all.filter(_.headline).map(_.name)
    val spark = GraftSession.get("graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.byName(n).build(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
