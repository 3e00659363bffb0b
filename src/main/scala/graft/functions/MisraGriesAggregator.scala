package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed, MERGEABLE aggregate:
  * one pass, at most `k` counters of state, and the mergeable-summaries
  * combine rule (Agarwal et al., TODS 2013) — sum the two counter maps,
  * and if more than `k` survive, subtract the (k+1)-th largest count
  * from every counter and drop the non-positive ones.
  *
  * Guarantee (what the registry gate checks): for a stream of n items,
  * every item with true frequency > n/(k+1) is PRESENT in the sketch,
  * and each reported count underestimates the true count by at most
  * n/(k+1). The exact equivalent (`TextOps.termDf`-style full group-by)
  * shuffles the whole |vocab|; this shuffles ≤ k counters per partition
  * — the shape that survives a 100 TB corpus with unbounded vocabulary.
  *
  * Determinism: counts and survivor sets are deterministic for a given
  * partitioning (decrement totals depend only on multiset content, not
  * arrival order, because reduce-phase decrements always remove exactly
  * (count sum − kept sum) mass); the registry entry is rows-only and
  * the CORRECTNESS signal is the value-oracled coverage gate. */
case class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < k => buf.updated(term, 1L)
      case None =>
        // decrement-all: the new item and one unit of every counter cancel
        buf.iterator
          .map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L)
          .toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.iterator
        .map { case (t, c) => (t, c - cut) }
        .filter(_._2 > 0L)
        .toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: ExpressionEncoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Map[String, Long]] = ExpressionEncoder()
}
