package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * typed, MERGEABLE aggregate — the point-frequency complement of
  * [[MisraGriesAggregator]]: MG answers "which items are heavy" with
  * k counters but forgets everything below the survival cut; CMS
  * answers "how often did THIS item occur" for ANY item, with a fixed
  * depth×width counter matrix and one-sided error.
  *
  * Guarantees (what the registry gate checks): estimates NEVER
  * underestimate (every occurrence lands in all `depth` counted cells),
  * and each row's excess is collision mass only, so
  * est(t) ≤ true(t) + colliding mass; the gate enforces the loose
  * deterministic band est ≤ true + depth·n/width, far wider than the
  * expected n/width per row yet still ~n/256 at the shipped shape.
  *
  * Merge is elementwise addition — associative, commutative, and
  * partition-count-independent, so the sketch is safe under partial
  * aggregation, AQE re-planning, and stream-batch union (the mergeable-
  * summaries property that lets 1000 executors each ship 32 KB instead
  * of their local vocabularies).
  *
  * Hashing: FNV-1a over UTF-8 bytes, then a splitmix64 finalizer salted
  * per row — fully deterministic across JVMs (no String.hashCode, no
  * seed from the environment). */
case class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 1)

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], term: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.cell(term, d, width)) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: ExpressionEncoder[Array[Long]] = ExpressionEncoder()
}

object CountMinAggregator {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L
  private val Golden = 0x9e3779b97f4a7c15L

  private def fnv64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  private def splitmix(z0: Long): Long = {
    var z = z0 + Golden
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Row `d`'s cell index for `term` — shared by update and query. */
  def cell(term: String, d: Int, width: Int): Int =
    java.lang.Math.floorMod(splitmix(fnv64(term) ^ (d * Golden)), width)

  /** Join-size (inner-product) estimate from two same-shape sketches
    * (Cormode & Muthukrishnan §4.2): row d's dot product
    * Σ_j A_d[j]·B_d[j] equals the true join size Σ_k n_A(k)·n_B(k) plus
    * non-negative collision mass, so min over rows is one-sided —
    * `est ≥ true` always, with excess the colliding cross mass
    * (expected |A|·|B|/width per row). Self-join size (the F2 moment
    * that drives aggregate/join cardinality planning) is the a == b
    * case. */
  def innerProduct(a: Array[Long], b: Array[Long], depth: Int, width: Int): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      var dot = 0L
      var j = d * width
      val end = j + width
      while (j < end) { dot += a(j) * b(j); j += 1 }
      if (dot < est) est = dot
      d += 1
    }
    est
  }

  /** Point-frequency estimate: min over the `depth` counted cells. */
  def estimate(sketch: Array[Long], term: String, depth: Int, width: Int): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + cell(term, d, width))
      if (c < est) est = c
      d += 1
    }
    est
  }
}
