package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's native (codegen'd) bloom-filter
  * expressions — the same kernels Catalyst's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) injects, exposed here so
  * an operator can build/apply a filter explicitly when the optimizer's
  * injection heuristics can't see the opportunity (e.g. the build side is
  * only known after a prior aggregate).
  *
  * `might_contain` requires a CONSTANT filter, so the build side is
  * aggregated to its one-row binary sketch and inlined as a literal: the
  * driver holds `numBits/8` bytes, never the keys themselves — that bound
  * is what makes the pattern safe when the dim side is too large to
  * broadcast row-wise at 100 TB.
  */
object BloomFunctions {

  /** Aggregate a key column into a serialized bloom filter (BinaryType,
    * one row). Keys are xxhash64-folded first, matching what
    * [[mightContain]] probes with. */
  def bloomFilterAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      BloomFilterAggregate(
        new XxHash64(Seq(ColumnBridge.expression(key))),
        Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Probe a serialized bloom filter: true if `key` MIGHT be in the set
    * (no false negatives; false-positive rate set by the build sizing).
    * `bloom` is inlined as a foldable literal — `might_contain` rejects
    * non-constant filter expressions. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        new XxHash64(Seq(ColumnBridge.expression(key)))))
}
