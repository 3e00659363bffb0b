package graft.tools

import graft.GraftSession
import graft.ops.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measure recall@K of each approximate top-k serving path against the
  * exact [[graft.ops.SimilarityOps.topkBrute]] anchor — the numbers the
  * `x_sim_ann_*_gate` floors are derived from.
  * Run: sbt "runMain graft.tools.MeasureAnnRecall [sfDir...]" */
object MeasureAnnRecall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-ann-recall")
    dirs.foreach { dir =>
      val exact = SimilarityOps.topkBrute(spark, dir)
        .select(col("q_id"), col("neighbor_id"))
      def recall(name: String, approx: DataFrame): Unit = {
        val hits = approx.select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
        val r = exact.join(hits, Seq("q_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("h"))
          .head()
        println(f"[ann-recall] $dir $name%-12s recall@10 = ${r.getLong(1).toDouble / r.getLong(0)}%.3f (${r.getLong(1)}/${r.getLong(0)})")
      }
      recall("lsh", SimilarityOps.annLsh(spark, dir))
      recall("multiprobe", SimilarityOps.annLshMultiProbe(spark, dir))
      recall("ivf", SimilarityOps.annIvf(spark, dir))
    }
    spark.stop()
  }
}
