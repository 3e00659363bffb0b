package graft.streaming

import graft.ops.PretrainOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming decontamination: an unbounded stream of incoming documents
  * checked against the STATIC benchmark n-gram set — the ingestion-time
  * form of the batch `PretrainOps.decontaminate`, for pipelines that gate
  * documents as they land instead of sweeping the lake afterwards.
  *
  * The check is per-document (no cross-document state), so each
  * micro-batch runs the exact batch plan via `foreachBatch`: explode
  * distinct n-grams, broadcast-join the (small, fixed) benchmark gram
  * set, aggregate per doc. Stream-vs-batch agreement is pinned by spec.
  * At scale the benchmark set is an eval suite — KBs to MBs — so the
  * broadcast is cheap and the stream side never shuffles wider than its
  * own per-batch doc-id aggregation. */
object StreamingDecontaminate {

  /** Gate a document stream ((doc_id, text) schema) against a benchmark
    * gram set into an append parquet sink. */
  def serve(
      benchGrams: DataFrame, docStream: DataFrame,
      sinkDir: String, k: Int = PretrainOps.ContamGram): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        PretrainOps.checkAgainst(batch, benchGrams, k)
          .write.mode("append").parquet(sinkDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
