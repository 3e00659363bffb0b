package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming twin of the
  * batch `graft.ops.JoinOps.j7RangeJoin`: error events matched to the
  * same user's purchases in the trailing 30 minutes.
  *
  * Scale shape: both streams shuffle on user_id; each side buffers rows
  * in join state only until the other side's watermark passes the end of
  * the interval, so state is bounded by (event rate × watermark delay ×
  * interval width), independent of stream length. The time-bound
  * condition on BOTH join columns is what lets Spark derive the state
  * eviction horizon — an interval join without it would buffer forever.
  */
object IntervalJoin {

  def errorsWithRecentPurchases(
      errors: DataFrame, purchases: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val e = errors
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    e.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("error_ts") - expr("INTERVAL 30 MINUTES") &&
          col("purchase_ts") <= col("error_ts"))
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** LEFT OUTER variant: every error emits — matched rows eagerly, like
    * the inner join; UNMATCHED errors with null purchase columns only
    * once the purchase-side watermark passes the error's interval end
    * (before that, a matching purchase could still arrive — the
    * null-extension is a state-TIMEOUT decision, not a per-batch one).
    * This is the semantics gap between the inner twin and batch left
    * joins: correctness depends on the engine holding the error row in
    * state until its horizon provably closes. State stays bounded by the
    * same eviction math as the inner join. */
  def errorsWithRecentPurchasesLeftOuter(
      errors: DataFrame, purchases: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val e = errors
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    e.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("error_ts") - expr("INTERVAL 30 MINUTES") &&
          col("purchase_ts") <= col("error_ts"),
        "leftOuter")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("purchase_id"), col("purchase_ts"))
  }
}
