package graft.tools

import graft.GraftSession
import graft.ops._
import org.apache.spark.sql.functions._

/** Recall tuner for the multi-table LSH candidate generator: sweeps
  * (tables, probeHamming) and reports threshold-edge counts vs the exact
  * all-pairs pass, plus candidate volume (the cost side of the knob).
  * Run: sbt "runMain graft.tools.TuneLsh [sfDir]" */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-tune-lsh")
    val exact = DedupOps.embedCosine(spark, dir).count()
    println(s"[tune] exact edges >= 0.5: $exact")
    for {
      t <- Seq(4, 8)
      h <- Seq(1, 2)
    } {
      val cfg = SimilarityOps.LshIndexConfig(t, 8, h, 1337)
      val cands = SimilarityOps.knnCandidates(spark, dir, cfg)
      val total = cands.count()
      val edges = cands.filter(col("cos") >= 0.5).count()
      println(s"[tune] tables=$t hamming=$h candidates=$total edges=$edges")
    }
    spark.stop()
  }
}
