package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional data layout for scan pruning — the z-order story
  * at directory granularity: lineitem is laid out once into partitions
  * keyed by the Morton interleave of a (partkey, suppkey) GRID CELL, so
  * a rectangle predicate over BOTH dimensions prunes to the candidate
  * cells before a single byte of data is read (Spark partition pruning
  * on the bucket column). A linear layout can prune only its leading
  * key; the gate quantifies exactly that gap.
  *
  * The grid is derived from the data (max key per dimension over a
  * fixed cell count), so the same operator serves every scale factor;
  * the probe rectangle is likewise relative ([20%,40%) × [10%,40%)).
  * Cell ids are small, so the Morton code is a single long — the
  * [[graft.functions.MortonInterleave]] codegen expression.
  *
  * 100 TB notes: the write is one repartition-by-bucket pass (pay once,
  * prune forever — the bucketed-join economics applied to scans); the
  * candidate-bucket enumeration is |cells(rectangle)| on the driver —
  * the classic z-range decomposition collapses to a cell-grid product
  * because buckets ARE aligned z-squares (dropping low bits of the
  * interleave = interleaving the high bits). Within each partition a
  * production table would additionally sort by the full Morton code so
  * parquet row-group min/max stats prune sub-file — same technique one
  * level down. */
object LayoutOps {

  /** Grid resolution: 16×8 = 128 directories, cell width adapts to the
    * key domain. */
  val PCells = 16L
  val SCells = 8L

  final case class Grid(wp: Long, ws: Long, p1: Long, p2: Long, s1: Long, s2: Long)

  /** Bounded driver scalars: two maxes → cell widths + the relative
    * probe rectangle (integer arithmetic, oracle-reproducible). */
  private def gridOf(spark: SparkSession, dir: String): Grid = {
    val r = Tables(spark, dir, "lineitem")
      .agg(max(col("l_partkey")).as("mp"), max(col("l_suppkey")).as("ms"))
      .collect()(0)
    val mp = r.getLong(0); val ms = r.getLong(1)
    Grid(mp / PCells + 1, ms / SCells + 1,
      mp * 2 / 10, mp * 4 / 10, ms * 1 / 10, ms * 4 / 10)
  }

  import graft.functions.zorder.morton

  /** Build the z-grid lake iff absent (stamped + completion-checked,
    * the materialized-index discipline). Partition dirs are the Morton
    * codes of (partkey cell, suppkey cell). */
  def ensureZLake(spark: SparkSession, dir: String): (String, Grid) = {
    val g = gridOf(spark, dir)
    val lake = stampedIndexDir("graft_zlake_v1_", dir, "lineitem.parquet")
    if (!new java.io.File(s"$lake/_SUCCESS").exists()) {
      Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_returnflag"),
          col("l_extendedprice"), col("l_discount"))
        .withColumn("zbucket",
          morton(expr(s"l_partkey div ${g.wp}"), expr(s"l_suppkey div ${g.ws}")))
        .write.mode("overwrite").partitionBy("zbucket").parquet(lake)
    }
    (lake, g)
  }

  /** Rectangle probe over the z-grid lake: enumerate the candidate
    * cells (driver-side, |cells| ≤ 128), prune partitions via an IN
    * list on the bucket column, then apply the exact predicate and
    * aggregate. Result is layout-independent — the oracle runs the
    * plain filter over raw lineitem — while the plan reads only the
    * intersecting directories (spec-pinned via the files-read census). */
  def zProbe(spark: SparkSession, dir: String): DataFrame = {
    val (lake, g) = ensureZLake(spark, dir)
    val cands = for {
      pc <- (g.p1 / g.wp) to ((g.p2 - 1) / g.wp)
      sc <- (g.s1 / g.ws) to ((g.s2 - 1) / g.ws)
    } yield graft.functions.MortonInterleave.compute(pc, sc)
    spark.read.parquet(lake)
      .filter(col("zbucket").isin(cands: _*))
      .filter(col("l_partkey") >= g.p1 && col("l_partkey") < g.p2 &&
        col("l_suppkey") >= g.s1 && col("l_suppkey") < g.s2)
      .groupBy(col("l_returnflag"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Pruning-benefit gate: partitions touched by the rectangle under
    * the z-grid layout vs a LINEAR layout with the same directory
    * budget (128 partkey-range cells — which can prune only the
    * partkey dimension). All counts are exact integers over the same
    * grid arithmetic the oracle reproduces; passes ⇔ the z-grid scans
    * no greater a fraction: z_touched·linear_total ≤
    * linear_touched·z_total. */
  def zLayoutGate(spark: SparkSession, dir: String): DataFrame = {
    val g = gridOf(spark, dir)
    val li = Tables(spark, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val mp = li.agg(max(col("l_partkey"))).collect()(0).getLong(0)
    val wLin = mp / (PCells * SCells) + 1
    // (pc, sc) folded to one integer key (sc < 2^20 by construction) so
    // both engines count pair-distincts identically
    val cells = li.select(
      (expr(s"l_partkey div ${g.wp}") * lit(1048576L) +
        expr(s"l_suppkey div ${g.ws}")).as("zc"),
      expr(s"l_partkey div $wLin").as("lc"),
      col("l_partkey"), col("l_suppkey"))
    val inRect = col("l_partkey") >= g.p1 && col("l_partkey") < g.p2 &&
      col("l_suppkey") >= g.s1 && col("l_suppkey") < g.s2
    val inP = col("l_partkey") >= g.p1 && col("l_partkey") < g.p2
    cells.agg(
      countDistinct(when(inRect, col("zc"))).cast(IntegerType).as("z_touched"),
      countDistinct(col("zc")).cast(IntegerType).as("z_total"),
      countDistinct(when(inP, col("lc"))).cast(IntegerType).as("linear_touched"),
      countDistinct(col("lc")).cast(IntegerType).as("linear_total"))
      .select(col("z_touched"), col("z_total"),
        col("linear_touched"), col("linear_total"),
        (col("z_touched") * col("linear_total") <=
          col("linear_touched") * col("z_total")).as("passes"))
  }

  // ------------------------------------------------------------------
  // File-level data skipping: the min/max stats index
  // ------------------------------------------------------------------

  /** Build the range-clustered lake iff absent: lineitem range-
    * partitioned AND sorted by l_shipdate, so each file covers a tight
    * shipdate interval — the precondition that makes min/max stats
    * selective (a randomly-laid-out file spans the whole domain and
    * skips nothing). */
  def ensureSortedLake(spark: SparkSession, dir: String): String = {
    val lake = stampedIndexDir("graft_sorted_lake_v1_", dir, "lineitem.parquet")
    if (!new java.io.File(s"$lake/_SUCCESS").exists()) {
      Tables(spark, dir, "lineitem")
        .select(col("l_shipdate"), col("l_returnflag"),
          col("l_extendedprice"), col("l_discount"))
        .repartitionByRange(16, col("l_shipdate"))
        .sortWithinPartitions(col("l_shipdate"))
        .write.mode("overwrite").parquet(lake)
    }
    lake
  }

  /** Per-file (min, max) shipdate statistics — the catalog a production
    * writer materializes from parquet footers at commit time; rebuilt
    * here with one column-pruned scan. |files|-bounded. */
  def fileStats(spark: SparkSession, lake: String): DataFrame =
    spark.read.parquet(lake)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"))

  private val SkipLo = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
  private val SkipHi = java.sql.Timestamp.valueOf("1995-04-01 00:00:00")

  /** Range probe through the stats index: consult the |files|-bounded
    * stats table on the driver, read ONLY the files whose [lo, hi]
    * interval intersects the predicate range, then apply the exact
    * filter. Result is skipping-independent (the oracle runs the plain
    * filter); the file census is spec-pinned. At 100 TB the stats table
    * is itself a parquet table probed with a broadcast join — the
    * driver collect here is |files|, the same bound Spark's own
    * file-listing pays. */
  def skipProbe(spark: SparkSession, dir: String): DataFrame = {
    val lake = ensureSortedLake(spark, dir)
    val keep = fileStats(spark, lake)
      .filter(col("lo") < lit(SkipHi) && col("hi") >= lit(SkipLo))
      .collect().map(_.getString(0))
    spark.read.parquet(keep.toIndexedSeq: _*)
      .filter(col("l_shipdate") >= lit(SkipLo) && col("l_shipdate") < lit(SkipHi))
      .groupBy(col("l_returnflag"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }
}
