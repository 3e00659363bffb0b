package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based upsert (MERGE) into a partitioned parquet lake — the
  * transaction-log-free form: updates replace current rows by key,
  * inserts land, untouched PARTITIONS are never read or rewritten.
  *
  * Plan per call:
  *   1. partition pruning: only partitions containing an updated key's
  *      partition value are read (broadcast semi-join on the partition
  *      column → prunes at the scan);
  *   2. anti-join current⟕updates by key keeps survivors, union adds the
  *      updates (insert + replace in one pass);
  *   3. dynamic partition overwrite rewrites exactly the touched
  *      partitions.
  * The merged slice is localCheckpoint-ed before the overwrite because
  * the write targets the same directory being read (classic
  * read-overwrite hazard); a production deployment swaps this seam for a
  * table format with a transaction log (Delta/Iceberg) and keeps the
  * same merge plan. */
object UpsertOps {

  def upsertByKey(
      spark: SparkSession, targetDir: String, updates: DataFrame,
      key: String, partCol: String): Unit = {
    val current = spark.read.parquet(targetDir)
    val touched = updates.select(partCol).distinct()
    val survivors = current
      .join(broadcast(touched), Seq(partCol), "left_semi") // prune to touched partitions
      .join(updates.select(key), Seq(key), "left_anti") // drop rows being replaced
    val merged = survivors.unionByName(updates.select(survivors.columns.map(col): _*))
      .localCheckpoint(true)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.partitionBy(partCol).mode("overwrite").parquet(targetDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }
}
