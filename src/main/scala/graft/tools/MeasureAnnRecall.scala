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
      // the ONE recall definition — shared with the gates it calibrates
      def recall(name: String, approx: DataFrame): Unit = {
        val r = SimilarityOps.recallCounts(exact, approx).head()
        val (n, h) = (r.getInt(0).toLong, r.getInt(1).toLong)
        println(f"[ann-recall] $dir $name%-12s recall@10 = ${h.toDouble / n}%.3f ($h/$n)")
      }
      recall("lsh", SimilarityOps.annLsh(spark, dir))
      recall("multiprobe", SimilarityOps.annLshMultiProbe(spark, dir))
      recall("ivf", SimilarityOps.annIvf(spark, dir))
      recall("binary", SimilarityOps.topkBinaryRerank(spark, dir))
    }
    spark.stop()
  }
}
