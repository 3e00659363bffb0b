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
  *
  * The whole right payload is carried as ONE struct through a single
  * `last(..., ignoreNulls = true)`: right rows always contribute a
  * non-null struct (even when individual payload FIELDS are null), so a
  * null field inside the latest right row stays null in the output
  * instead of being back-filled from an older right row — per-column
  * carries would tear the matched row across right rows. Left rows with
  * no preceding right row get a null struct → all-null payload columns
  * (the LEFT-join shape, matching ASOF LEFT JOIN).
  */
object AsofOps {

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(keys.contains).toSeq // incl. rightTime
    val overlap = payload.intersect(left.columns.toSeq)
    require(overlap.isEmpty, s"left/right non-key columns collide: $overlap")

    // right rows: keys + event time + the payload as one non-null struct
    val rhs = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__is_l"),
        struct(payload.map(col): _*).as("__p")): _*)
    val payloadType = rhs.schema("__p").dataType
    val lhs = left.withColumn("__t", col(leftTime)).withColumn("__is_l", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val rhsAligned = leftOnly.foldLeft(rhs) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lhs.select(lhs.columns.map(col).toIndexedSeq: _*)
      .unionByName(rhsAligned.select(lhs.columns.map(col).toIndexedSeq: _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one carried column → a single Window operator (one sort, one pass)
    unioned.withColumn("__pc", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(c => col("__pc").getField(c).as(c)): _*)
  }
}
