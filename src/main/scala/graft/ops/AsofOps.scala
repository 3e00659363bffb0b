package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward AS-OF join as a library operator: every left row is
  * kept exactly once and enriched with the payload of the latest right
  * row whose time is at-or-before the left row's time, within key groups.
  *
  * Spark has no native ASOF operator, and an inequality join degenerates
  * to per-key cartesian work; this uses the union+window formulation —
  * both inputs interleave on one timeline (right rows sort before left
  * rows at equal times, so "at or before" includes equality), ONE shuffle
  * on the keys, and the payload is carried forward with
  * `last(..., ignoreNulls = true)`. O(n log n) per key group, zero pair
  * blowup, the same plan shape at any scale.
  *
  * Contract: `right` must be unique per (keys, rightTime) — pre-aggregate
  * upstream to pick the winner among same-timestamp rows (as the DuckDB
  * ASOF oracle for `j6_asof_join` does with max(event_id)); left and
  * right non-key column names must not collide.
  */
object AsofOps {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq // incl. rightTime
    val overlap = payload.intersect(left.columns.toSeq)
    require(overlap.isEmpty, s"left/right non-key columns collide: $overlap")

    val lhs = payload.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__is_l", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val rhs = leftOnly.foldLeft(
      right.withColumn("__t", col(rightTime)).withColumn("__is_l", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lhs.select(lhs.columns.map(col).toIndexedSeq: _*)
      .unionByName(rhs.select(lhs.columns.map(col).toIndexedSeq: _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all carries in one projection → a single Window operator (one sort,
    // one pass), not one per payload column
    val outCols = unioned.columns.map {
      case c if payload.contains(c) =>
        last(when(col("__is_l") === 0, col(c)), ignoreNulls = true).over(w).as(c)
      case c => col(c)
    }
    unioned.select(outCols.toIndexedSeq: _*)
      .filter(col("__is_l") === 1).drop("__t", "__is_l")
  }
}
