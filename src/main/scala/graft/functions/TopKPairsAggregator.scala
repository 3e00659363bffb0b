package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate of a top-k query: ordering is (cos DESC,
  * neighborId ASC) — exactly the `row_number` window ordering the top-k
  * operators previously used, so swapping the window for this aggregate
  * cannot change a single output row. */
case class ScoredNeighbor(cos: Double, neighborId: Long)

/** Bounded-memory top-k (score, id) pairs per group — the pair-valued
  * sibling of [[TopKAggregator]], built for the similarity top-k path:
  * a `row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, id)`
  * window shuffles EVERY scored row into |q_id| reducers (at 100 TB,
  * each reducer absorbs the whole scored corpus for its query); this
  * aggregate keeps an O(k) buffer per (partition, group) map-side, so
  * the exchange carries at most k pairs per partition per query —
  * shuffle volume k·|partitions|·|queries| instead of
  * |corpus|·|queries|.
  *
  * Merge is associative and commutative over the (cos desc, id asc)
  * total order, so partial aggregation, AQE re-planning, and salting
  * all preserve the exact result; ties break on neighborId exactly as
  * the window form did, keeping the DuckDB oracle hash bit-identical. */
case class TopKPairsAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  require(k >= 1)

  // NOT Ordering.by(-cos, id): negating a Double flips NaN from
  // "greatest" to "sorts worst", which would rank a NaN score (e.g. a
  // zero-norm embedding's cosine) LAST where the SQL window — and the
  // DuckDB oracle — rank it FIRST. java.lang.Double.compare keeps
  // Spark's total order (NaN greatest, -0.0 < 0.0) under descending.
  private val ord: Ordering[ScoredNeighbor] = new Ordering[ScoredNeighbor] {
    def compare(a: ScoredNeighbor, b: ScoredNeighbor): Int = {
      val c = java.lang.Double.compare(b.cos, a.cos)
      if (c != 0) c else java.lang.Long.compare(a.neighborId, b.neighborId)
    }
  }

  override def zero: Seq[ScoredNeighbor] = Nil

  override def reduce(buf: Seq[ScoredNeighbor], v: ScoredNeighbor): Seq[ScoredNeighbor] =
    if (buf.length < k) (v +: buf).sorted(ord)
    else if (ord.lt(v, buf.last)) (v +: buf.init).sorted(ord)
    else buf

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = buf

  override def bufferEncoder: ExpressionEncoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
}
