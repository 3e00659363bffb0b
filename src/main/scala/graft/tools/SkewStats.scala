package graft.tools

import graft.GraftSession
import graft.functions.exprs._
import graft.ops._
import org.apache.spark.sql.functions._

/** Skew diagnostic: distribution of posting-list / bucket sizes in the
  * near-dup pipelines — the d that drives the d(d−1)/2 pair blowup a
  * single task absorbs. Validates that `DedupOps.MaxBucket` sits far above
  * the corpus's organic maximum (so the cap changes nothing here) while
  * bounding the adversarial case.
  * Run: sbt "runMain graft.tools.SkewStats [sfDir]" */
object SkewStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-skew")

    def stats(name: String, sizes: org.apache.spark.sql.DataFrame): Unit = {
      val r = sizes.agg(
        count(lit(1)).as("n_keys"), max(col("d")).as("max_d"),
        expr("percentile(d, 0.999)").as("p999"),
        sum(when(col("d") > DedupOps.MaxBucket, 1).otherwise(0)).as("over_cap")).collect()(0)
      println(s"[skew] $name: keys=${r.get(0)} max_d=${r.get(1)} p99.9=${r.get(2)} " +
        s"over_cap(${DedupOps.MaxBucket})=${r.get(3)}")
    }

    val docs = Tables.parallel(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), shingle_hashes(split(lower(col("text")), " "), 3).as("shs"))
    stats("ngram-shingle-df",
      docs.select(explode(col("shs")).as("sh")).groupBy("sh").agg(count(lit(1)).as("d")))

    val sig = docs.select(col("doc_id"), minhash_signature(col("shs"), 64).as("sig"))
    stats("lsh-band-buckets",
      sig.select(posexplode(chunk_hashes(col("sig"), 4)).as(Seq("band", "bh")))
        .groupBy("band", "bh").agg(count(lit(1)).as("d")))

    val sims = Tables.parallel(spark, dir, "documents")
      .select(simhash64(token_hashes(split(lower(col("text")), " "))).as("simhash"))
    stats("simhash-chunk-buckets",
      sims.select(explode(array((0 until 4).map(c =>
          struct(lit(c).as("chunk"),
            shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))): _*)).as("ck"))
        .groupBy("ck.chunk", "ck.cv").agg(count(lit(1)).as("d")))

    spark.stop()
  }
}
