package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory top-k aggregate (typed `Aggregator`, registered through
  * `functions.udaf`): keeps the k largest values per group in a buffer
  * that never exceeds k elements — reduce inserts, merge merges two
  * k-buffers — so partial aggregation works map-side and the shuffle
  * carries at most k doubles per (partition, group).
  *
  * This is the scale-correct alternative to the window row_number top-n
  * (`w1_topn_per_group`) when only the VALUES are needed: the window form
  * sorts every group's full row set; this form is one pass, O(k) state,
  * mergeable in any order (max-multiset semantics are associative and
  * commutative, so salting/AQE re-partitioning cannot change the result).
  * It also demonstrates the UDAF escalation tier: typed Aggregator >
  * untyped UDAF, used when no built-in aggregate (max_by, collect_list +
  * slice, …) gives bounded per-group state. */
case class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k >= 1)

  override def zero: Seq[Double] = Nil

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    if (buf.length < k) (v +: buf).sorted(Ordering[Double].reverse)
    else if (v > buf.last) (v +: buf.init).sorted(Ordering[Double].reverse)
    else buf

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sorted(Ordering[Double].reverse).take(k)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: ExpressionEncoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[Double]] = ExpressionEncoder()
}
