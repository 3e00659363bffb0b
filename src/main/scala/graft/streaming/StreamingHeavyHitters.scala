package graft.streaming

import graft.functions.MisraGriesAggregator
import graft.ops.SketchOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming heavy hitters: the Misra–Gries sketch over an unbounded
  * token stream. The SAME typed aggregator the batch path uses doubles
  * as the streaming state — its buffer is the mergeable MG summary, so
  * Spark's stateful aggregation carries ≤ k counters per group across
  * micro-batches (complete output mode re-emits the current sketch each
  * trigger). This is the property that makes MG the right monitoring
  * sketch for an ingest firehose: state is O(k) FOREVER, no watermark
  * needed, and the n/(k+1) coverage guarantee holds over the whole
  * stream prefix because the per-batch updates and cross-batch merges
  * are the same two operations the batch gate proves.
  *
  * The spec pins stream-vs-batch agreement: streaming the corpus through
  * in micro-batches must reproduce the batch sketch's guarantees (same
  * aggregator, same rules — only the arrival granularity differs). */
object StreamingHeavyHitters {

  /** Sketch aggregation over a streaming (term) DataFrame — one global
    * group, ≤ [[SketchOps.SketchK]] counters of state. Run with
    * `outputMode("complete")`. */
  def sketchStream(tokens: DataFrame, k: Int = SketchOps.SketchK): DataFrame = {
    val mg = udaf(MisraGriesAggregator(k))
    tokens.agg(mg(col("term")).as("sketch"))
  }
}
