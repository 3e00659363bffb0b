package graft.functions

import graft.SparkSpec
import graft.functions.zorder.morton
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the interleave, and the measurable
  * pruning property — a z-sorted layout bounds BOTH dimensions per file,
  * where a linear sort bounds only its leading key. File-level min/max
  * overlap is the same statistic parquet row-group pruning uses. */
class ZOrderSpec extends SparkSpec {

  test("MortonInterleave: exact bit interleave, monotone in tiles") {
    import spark.implicits._
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("x", "y")
      .select(morton(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    assert(r(0) == 0L && r(1) == 1L && r(2) == 2L)
    // 3 = 0b11, 5 = 0b101 → interleave(y,x): 1_0_0_1_1_1? check directly
    assert(r(3) == (MortonInterleave.spread(3L) | (MortonInterleave.spread(5L) << 1)))
    assert(MortonInterleave.spread(0xFFFFFFFFL) == 0x5555555555555555L)
  }

  /** Per-file [min,max] of a column across a written layout. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
  }

  test("z-order layout prunes on BOTH dims; linear layout only on its sort key") {
    import spark.implicits._
    val n = 1 << 16
    val data = spark.range(n).select(
      (col("id") % 1024).as("x"),
      ((col("id") * 2654435761L) % 1024).as("y")) // decorrelated second dim
    val linDir = tempDir("layout_lin") + "/t"
    val zDir = tempDir("layout_z") + "/t"
    data.repartitionByRange(64, col("x"))
      .sortWithinPartitions("x").write.parquet(linDir)
    data.repartitionByRange(64, morton(col("x"), col("y")))
      .sortWithinPartitions(morton(col("x"), col("y"))).write.parquet(zDir)

    def overlapping(dir: String, c: String, lo: Long, hi: Long): Int =
      fileRanges(dir, c).count { case (mn, mx) => mx >= lo && mn <= hi }

    // filter on the leading/linear key: both layouts prune well
    val linX = overlapping(linDir, "x", 100, 150)
    val zX = overlapping(zDir, "x", 100, 150)
    assert(linX <= 8, s"linear x-pruning $linX")
    assert(zX <= 24, s"z x-pruning $zX") // coarser than linear, still far below 64
    // filter on the SECOND dim: linear layout cannot prune at all
    val linY = overlapping(linDir, "y", 100, 150)
    val zY = overlapping(zDir, "y", 100, 150)
    assert(linY > 56, s"linear y-pruning should be ~none, got $linY of 64")
    assert(zY <= 24, s"z y-pruning $zY of 64")
    assert(zY < linY / 2)
  }
}
