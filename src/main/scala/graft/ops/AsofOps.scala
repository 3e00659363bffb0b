package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic AS-OF joins as library operators, all three directions:
  * BACKWARD (`asofJoin` — latest right at-or-before, the default
  * everywhere as-of joins exist), FORWARD (`asofJoinForward` — earliest
  * right at-or-after) and NEAREST (`asofJoinNearest` — closest either
  * side, ties backward). Every left row is kept exactly once and
  * enriched with the matched right row's payload, within key groups.
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

  /** Shared union plumbing for every direction: both inputs interleaved
    * on one timeline, the right payload as one non-null struct. */
  private def unionParts(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): (DataFrame, Seq[String]) = {
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
    (lhs.select(lhs.columns.map(col).toIndexedSeq: _*)
      .unionByName(rhsAligned.select(lhs.columns.map(col).toIndexedSeq: _*)),
      payload)
  }

  private def emit(df: DataFrame, left: DataFrame, payload: Seq[String],
      carried: Column): DataFrame =
    df.filter(col("__is_l") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(c => carried.getField(c).as(c)): _*)

  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val (unioned, payload) = unionParts(left, right, keys, leftTime, rightTime)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one carried column → a single Window operator (one sort, one pass)
    emit(unioned.withColumn("__pc", last(col("__p"), ignoreNulls = true).over(w)),
      left, payload, col("__pc"))
  }

  /** Forward AS-OF: every left row enriched with the EARLIEST right row
    * whose time is at-or-after the left time (the mirror direction —
    * "what happened next"). Same one-shuffle union+window plan; right
    * rows sort AFTER left rows at equal times (`__is_l` desc), so
    * "at or after" includes equality, and the payload is pulled backward
    * with `first(..., ignoreNulls)` over the following frame. */
  def asofJoinForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val (unioned, payload) = unionParts(left, right, keys, leftTime, rightTime)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    emit(unioned.withColumn("__pc", first(col("__p"), ignoreNulls = true).over(w)),
      left, payload, col("__pc"))
  }

  /** Nearest AS-OF: the right row closest in time, either side; exact
    * ties (equidistant before and after) resolve BACKWARD, and an
    * equal-time right row is distance 0 so it always wins. One union,
    * ONE shuffle and ONE sort: both window frames share the backward
    * ordering (right before left at equal times), so the backward carry
    * (`last` over preceding — includes equal-time rights) and the
    * forward carry (`first` over following — equal-time rights sorted
    * before the current left row, hence strictly-after) evaluate in a
    * single Window operator. Distances compare in microseconds —
    * the engines' common timestamp resolution. */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val (unioned, payload) = unionParts(left, right, keys, leftTime, rightTime)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_l"))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBoth = unioned
      .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__pf", first(col("__p"), ignoreNulls = true).over(wf))
    // timestamps measure in µs (both engines' common resolution); plain
    // numeric time axes subtract directly
    val asMicros: Column => Column =
      unioned.schema("__t").dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(_)
        case _ => _.cast(org.apache.spark.sql.types.LongType)
      }
    val db = asMicros(col("__t")) - asMicros(col("__pb").getField(rightTime))
    val df2 = asMicros(col("__pf").getField(rightTime)) - asMicros(col("__t"))
    val chosen = when(col("__pb").isNull, col("__pf"))
      .when(col("__pf").isNull, col("__pb"))
      .otherwise(when(db <= df2, col("__pb")).otherwise(col("__pf")))
    emit(withBoth.withColumn("__pc", chosen), left, payload, col("__pc"))
  }
}
