package graft.tools

import graft.GraftSession
import graft.ops._
import org.apache.spark.sql.functions._

/** Stage profiler for the binary-Hamming serving family — r12 VERDICT
  * flagged x_sim_topk_hamming at +88% round-over-round (0.60→1.13 s,
  * judge-measured) while its indexed twin and every sibling stayed
  * flat, with ZERO code changes to SimilarityOps between the rounds.
  * This times the inline path's stages (pack, score-join, rank) and
  * both full forms with Bench's min-of-3 discipline so the regressing
  * stage — or the absence of one — is measurable in isolation.
  * Run: sbt "runMain graft.tools.ProfileHamming [sfDir]" */
object ProfileHamming {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-profile-hamming")
    Tables.enableInputCache()

    def minOf3(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[profile] $name%-28s min ${ts.map(_._1).min}%6.2fs  " +
        f"reps ${ts.map(t => f"${t._1}%.2f").mkString("/")}  rows=${ts.head._2}")
    }

    // warmup like Bench: small full pipeline + the binary index
    graft.Registry.byName("d4_count").build(spark, dir).count()
    SimilarityOps.ensureKnnIndex(spark, dir)
    SimilarityOps.ensureBinaryIndex(spark, dir)

    minOf3("brute (baseline)") {
      SimilarityOps.topkBrute(spark, dir).queryExecution.toRdd.count()
    }
    minOf3("quantize_binary (pack only)") {
      SimilarityOps.quantizeBinary(spark, dir).queryExecution.toRdd.count()
    }
    minOf3("hamming inline (full)") {
      SimilarityOps.topkHamming(spark, dir).queryExecution.toRdd.count()
    }
    minOf3("hamming indexed (full)") {
      SimilarityOps.topkHammingIndexed(spark, dir).queryExecution.toRdd.count()
    }
    minOf3("binary rerank (full)") {
      SimilarityOps.topkBinaryRerank(spark, dir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
