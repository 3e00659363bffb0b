package graft.tools
import graft.GraftSession
import graft.ops._
object RowCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-rowcheck")
    val lsh = DedupOps.minhashLsh(spark, dir).collect()
    val ngram = DedupOps.ngramJaccard(spark, dir).collect()
    println(s"[rowcheck] lsh=${lsh.length} ngram=${ngram.length}")
    println(s"[rowcheck] lsh pairs: ${lsh.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted.take(30)}")
    // duplicate check: first-agreeing-band must make pairs globally unique
    val dupes = lsh.map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).filter(_._2.length > 1)
    println(s"[rowcheck] duplicate pairs: ${dupes.size}")
    spark.stop()
  }
}
