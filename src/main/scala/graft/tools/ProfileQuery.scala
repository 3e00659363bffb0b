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

    import org.apache.spark.sql.types.IntegerType
    val docs = Tables.parallel(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingle_hashes(split(lower(col("text")), " "), 3).as("shs"))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("n", size(col("shs")))
    time("shingle-hash-arrays") { docs.queryExecution.toRdd.count() }
    // the REAL prefix pipeline stages (mirrors DedupOps.ngramJaccard)
    val pre = docs.select(col("doc_id"), col("n"),
      posexplode(slice(col("shs"), lit(1), (col("n") / lit(2)).cast(IntegerType) + lit(1))).as(Seq("p0", "sh")))
    time("prefix-explode") { pre.queryExecution.toRdd.count() }
    val posting = pre.groupBy(col("sh"))
      .agg(collect_list(struct(col("doc_id"), col("n"),
        (col("p0") + lit(1)).cast(IntegerType).as("pos"))).as("ds"))
      .filter(size(col("ds")) > 1)
    time("prefix-posting") { posting.queryExecution.toRdd.count() }
    time("ppjoin-cands") {
      posting.select(explode(prefix_candidate_pairs(col("ds"), 1, 2)).as("p"))
        .queryExecution.toRdd.count()
    }
    time("ppjoin-cands-distinct") {
      posting.select(explode(prefix_candidate_pairs(col("ds"), 1, 2)).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
        .queryExecution.toRdd.count()
    }
    time("full-ngram-jaccard") { DedupOps.ngramJaccard(spark, dir).queryExecution.toRdd.count() }
    time("full-minhash") { DedupOps.minhashLsh(spark, dir).queryExecution.toRdd.count() }
    time("full-simhash") { DedupOps.simhash(spark, dir).queryExecution.toRdd.count() }
    time("full-topk-brute") { SimilarityOps.topkBrute(spark, dir).queryExecution.toRdd.count() }
    spark.stop()
  }
}
