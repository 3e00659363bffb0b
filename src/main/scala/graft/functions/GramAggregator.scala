package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact second-moment accumulator over int64-scaled vectors:
  * buffer = [ n, s_0 … s_{d-1}, q_{00}, q_{01} … q_{0,d-1}, q_{11} … ]
  * (count, first moments, upper-triangle Gram), length 1 + d + d(d+1)/2.
  *
  * This is the scale-correct way to get a covariance/Gram matrix out of
  * a 100 TB vector store: a typed `Aggregator` whose reduce folds one
  * vector's outer product into O(d²) local state and whose merge is
  * elementwise addition — fully mergeable, so Spark runs it as a partial
  * aggregate with map-side combine and the shuffle carries ONE
  * ~d²/2-long buffer per partition instead of the n·d² row explosion a
  * self-join-on-dimension plan would shuffle. All arithmetic is int64:
  * with |x| ≤ 6e4 after the 1e5 scale-floor, each product ≤ 3.6e9 and
  * the sums stay exact to n ≈ 2.5e9 rows (per-entry headroom documented
  * at the call sites).
  *
  * Associative + commutative (integer sums), so AQE/salting cannot
  * change a bit — the property that lets the downstream entries be
  * value-oracled against DuckDB's self-join formulation. */
case class GramAggregator(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(d >= 1)
  private val len = 1 + d + d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    require(v.length == d, s"expected $d dims, got ${v.length}")
    val a = v.toArray
    buf(0) += 1L
    var i = 0
    var k = 1 + d
    while (i < d) {
      buf(1 + i) += a(i)
      var j = i
      while (j < d) {
        buf(k) += a(i) * a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Seq[Long]] = ExpressionEncoder()
}
