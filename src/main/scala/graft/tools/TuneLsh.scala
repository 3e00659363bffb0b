package graft.tools

import graft.GraftSession
import graft.ops._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall/cost tuner for the multi-table LSH candidate generator: sweeps
  * (tables, planes, probeHamming) and reports, per config,
  *  - candidate volume (the cost side: every candidate is one cosine
  *    kernel eval + one shuffled row),
  *  - threshold-edge recall vs the exact all-pairs pass (what the
  *    near-dup CLUSTERING path cares about — a missed edge splits a
  *    cluster), and
  *  - recall@5 vs the exact kNN anchor (what the top-k JOIN path cares
  *    about — a miss only costs rank quality).
  * The measured frontier lives in PLANS.md §x_sim_knn_join and is what
  * KnnJoinConfig / ClusterRecallConfig cite.
  * Run: sbt "runMain graft.tools.TuneLsh [sfDir]" */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-tune-lsh")
    val exactEdges = DedupOps.embedCosine(spark, dir).count()
    val exactTopk = SimilarityOps.knnExact(spark, dir)
      .select(col("q_id"), col("neighbor_id")).cache()
    val nExact = exactTopk.count()
    println(s"[tune] exact: edges>=0.5: $exactEdges  topk rows: $nExact")
    for {
      t <- Seq(2, 4, 8, 16)
      p <- Seq(8, 12, 16)
      h <- Seq(0, 1, 2)
    } {
      val cfg = SimilarityOps.LshIndexConfig(t, p, h, 1337)
      val cands = SimilarityOps.knnCandidates(spark, dir, cfg).cache()
      val total = cands.count()
      val edges = cands.filter(col("cos") >= 0.5).count()
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("neighbor_id"))
      val hits = cands.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select(col("q_id"), col("neighbor_id"))
        .join(exactTopk, Seq("q_id", "neighbor_id"), "left_semi").count()
      cands.unpersist()
      println(f"[tune] tables=$t%2d planes=$p%2d hamming=$h " +
        f"cands=$total%8d edges=$edges%3d/$exactEdges recall@5=${hits.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
