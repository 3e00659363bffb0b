package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-based upsert (MERGE) into a partitioned parquet lake — the
  * transaction-log-free form: updates replace current rows by key,
  * inserts land, untouched PARTITIONS are never read or rewritten.
  *
  * Plan per call:
  *   1. locate the partitions to rewrite: those NAMED by an update row,
  *      plus — because a key's partition value may CHANGE across updates —
  *      any partition currently holding an updated key. The latter is a
  *      column-pruned scan of (key, partCol) only (two thin parquet
  *      columns, no payload I/O) semi-joined against the broadcast update
  *      keys; skippable via `keysArePartitionStable = true` when the
  *      caller guarantees keys never move partitions (e.g. the partition
  *      column is derived from the key).
  *   2. anti-join current⟕updates by key over the touched slice keeps
  *      survivors, union adds the updates (insert + replace in one pass);
  *      because every partition holding an updated key is in the touched
  *      set, a moved key's stale row is read and anti-joined away — no
  *      duplicate keys after the merge.
  *   3. dynamic partition overwrite rewrites exactly the touched
  *      partitions; a touched partition left with ZERO rows (its only
  *      keys moved away) is absent from the output and explicitly
  *      deleted afterwards — dynamic overwrite alone would leave the
  *      stale directory in place.
  * The merged slice is localCheckpoint-ed before the overwrite because
  * the write targets the same directory being read (classic
  * read-overwrite hazard); a production deployment swaps this seam for a
  * table format with a transaction log (Delta/Iceberg) and keeps the
  * same merge plan. */
object UpsertOps {

  def upsertByKey(
      spark: SparkSession, targetDir: String, updates: DataFrame,
      key: String, partCol: String, keysArePartitionStable: Boolean = false): Unit = {
    val current = spark.read.parquet(targetDir)
    val updKeys = updates.select(key).distinct()
    val named = updates.select(partCol).distinct()
    val touched =
      if (keysArePartitionStable) named
      else named.union(
        current.select(col(key), col(partCol)) // column-pruned: 2 cols read
          .join(broadcast(updKeys), Seq(key), "left_semi")
          .select(col(partCol)))
        .distinct()
    val survivors = current
      .join(broadcast(touched), Seq(partCol), "left_semi") // prune to touched partitions
      .join(updKeys, Seq(key), "left_anti") // drop rows being replaced
    val merged = survivors.unionByName(updates.select(survivors.columns.map(col): _*))
      .localCheckpoint(true)
    // a touched partition can DRAIN: a moved key's old partition may have
    // zero rows in `merged`, and dynamic overwrite only rewrites
    // partitions PRESENT in the output — the stale directory would
    // survive. Both sides of the diff are bounded by |touched| (small by
    // construction), so the set difference is a safe driver-side step.
    val drained = touched.collect().map(_.get(0)).toSet --
      merged.select(partCol).distinct().collect().map(_.get(0)).toSet
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.partitionBy(partCol).mode("overwrite").parquet(targetDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if (drained.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(targetDir).getFileSystem(conf)
      drained.foreach { v =>
        val dir = new org.apache.hadoop.fs.Path(targetDir,
          s"$partCol=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .escapePathName(String.valueOf(v)))
        fs.delete(dir, true)
      }
    }
  }
}
