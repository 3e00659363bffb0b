package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Surfaces named observed metrics (`Dataset.observe`) after each query —
  * the consumer of the dedup pipelines' `ngram_df_cap` /
  * `lsh_bucket_cap` / `simhash_bucket_cap` drop counters, so capped hot
  * keys are reported per run instead of sitting silently in the plan.
  * Register once per session (`ObservedMetricsListener.install`); the
  * callback also feeds any sink handed in (tests pass a buffer). */
class ObservedMetricsListener(sink: (String, String) => Unit)
    extends QueryExecutionListener {

  private def report(qe: QueryExecution): Unit =
    qe.observedMetrics.foreach { case (name, row) =>
      sink(name, row.schema.fieldNames.map(f => s"$f=${row.getAs[Any](f)}").mkString(", "))
    }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    report(qe)
  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}

object ObservedMetricsListener {
  /** Default install: log at WARN through slf4j. */
  def install(spark: SparkSession): ObservedMetricsListener = {
    val logger = org.slf4j.LoggerFactory.getLogger(classOf[ObservedMetricsListener])
    val listener = new ObservedMetricsListener((name, kv) =>
      logger.warn(s"[observed-metric] $name: $kv"))
    spark.listenerManager.register(listener)
    listener
  }
}
