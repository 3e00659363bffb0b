package graft.tools

import graft.GraftSession
import graft.functions.exprs._
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

    // warmup: absorb codegen/classloading before measuring
    Tables(spark, dir, "documents").queryExecution.toRdd.count()

    val docs = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingle_hashes(split(lower(col("text")), " "), 3).as("shs"))
    time("shingle-hash-arrays") { docs.queryExecution.toRdd.count() }
    val tri = docs.select(col("doc_id"), size(col("shs")).as("n"), explode(col("shs")).as("sh"))
    time("explode") { tri.queryExecution.toRdd.count() }
    val posting = tri.groupBy(col("sh"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
      .filter(size(col("ds")) > 1)
    time("posting-lists") { posting.queryExecution.toRdd.count() }
    time("pair-expansion") {
      posting.select(explode(posting_list_pairs(col("ds"))).as("p"))
        .queryExecution.toRdd.count()
    }
    time("full-ngram-jaccard") { DedupOps.ngramJaccard(spark, dir).queryExecution.toRdd.count() }
    time("full-minhash") { DedupOps.minhashLsh(spark, dir).queryExecution.toRdd.count() }
    time("full-simhash") { DedupOps.simhash(spark, dir).queryExecution.toRdd.count() }
    time("full-topk-brute") { SimilarityOps.topkBrute(spark, dir).queryExecution.toRdd.count() }
    spark.stop()
  }
}
