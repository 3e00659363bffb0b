package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory: every entry point (Verify, Bench, tests)
  * gets identical, scale-minded settings.
  *
  *  - shuffle.partitions defaults to the local core count (driver passes
  *    SPARK_GRAFT_CPUS); on a real cluster this would be ~2-3× total cores
  *    and AQE coalesces the rest.
  *  - AQE on: runtime re-planning (partition coalescing, skew-join
  *    splitting, broadcast demotion/promotion) is the main lever that makes
  *    the same plans survive a 100× scale-up.
  *  - nanosAsLong: the driver's events table stores TIMESTAMP(NANOS),
  *    which Spark's vectorized reader refuses; read as long and convert
  *    at the loader (Tables) so plans see a proper timestamp column.
  *  - session timezone pinned UTC for oracle parity.
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    // At bench SFs, partitions = cores is right (AQE coalesces the
    // rest). At the third-decade SFs the same setting makes each
    // external-sort task hold GBs — guaranteed spill on a fixed-memory
    // box — so the scale sweeps raise it (more, smaller tasks ⇒ sorts
    // fit execution memory; exactly what a real cluster's 2-3× total
    // cores setting does) without touching parallelism.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // ObjectHashAggregate (every typed-UDAF aggregation: the k-bounded
      // top-k family, Misra-Gries, CMS) falls back to SORT-based
      // aggregation after 128 distinct keys per task — absurdly low for
      // bounded-state aggregators, and the fallback SORTS THE ENTIRE
      // input stream: the exact-kNN anchor spilled 20.6 GB at sf1 and
      // ran 2.7× slower (23.3 s → 8.6 s, r15 ledger) purely from this.
      // 1M keys covers the anchor at its require-gate bound (≤ 1M
      // vectors; k-bounded buffers ≈ 140 MB/task worst-case there),
      // while corpus-scale collect_list builds (shingle posting lists:
      // tens of millions of keys per task at sf100) still exceed it and
      // keep the spillable sort path — unbounded-state aggregations
      // must be able to spill, bounded-state ones must not have to.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed twins are written one-file-per-bucket + sortBy, so the
      // scan's output order IS the sort order; default-off since 3.0,
      // without it every bucketed SMJ re-sorts every bucket on every query
      // (Spark still only reports the order when files-per-bucket == 1,
      // so this cannot mis-claim sortedness on multi-file buckets)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // fresh per-JVM warehouse: the in-memory catalog dies with the JVM,
      // so a persistent ./spark-warehouse would orphan managed-table dirs
      // and break the next saveAsTable with LOCATION_ALREADY_EXISTS
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
  }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
