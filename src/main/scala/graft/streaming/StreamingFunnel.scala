package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming funnel — the custom-state counterpart of the batch
  * `graft.ops.EventOps.funnelStages` (same strict temporal progression:
  * a click counts only after the user's first view, a purchase only
  * after that qualifying click).
  *
  * State per user is three optional event-time instants — O(1) regardless
  * of stream length. A row `(user_id, stage)` is emitted every time the
  * user's stage ADVANCES (monotone, Append mode); the reader keeps the
  * max per user. Within a micro-batch the slice is sorted by event time
  * (arrival order is not event-time order); across batches the fold
  * assumes the source is event-time ordered up to the watermark — the
  * same contract as [[StatefulSessions]]. Stage transitions are invariant
  * to ordering within equal timestamps because every qualification is a
  * STRICT inequality (a click at exactly the first-view instant never
  * counts, in either engine).
  */
object StreamingFunnel {

  final case class Ev(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class FunnelState(
      tView: Option[Long], tClick: Option[Long], tPurchase: Option[Long]) {
    def stage: Int =
      (if (tView.isDefined) 1 else 0) +
        (if (tClick.isDefined) 1 else 0) +
        (if (tPurchase.isDefined) 1 else 0)
  }
  final case class Stage(user_id: Long, stage: Int)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + t.getNanos / 1000 % 1000

  /** Fold one user's (batch-sorted) slice into the funnel state, emitting
    * a Stage row per advance. In event-time order the FIRST qualifying
    * click/purchase is also the minimum qualifying one, so the fold
    * reproduces the batch min-timestamp semantics exactly. */
  def updateUser(
      userId: Long, events: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Stage] = {
    var s = state.getOption.getOrElse(FunnelState(None, None, None))
    val before = s.stage
    val advances = scala.collection.mutable.ArrayBuffer.empty[Stage]
    events.toSeq.sortBy(e => (micros(e.ts), e.event_type)).foreach { e =>
      val m = micros(e.ts)
      val prev = s.stage
      e.event_type match {
        case "view" if s.tView.isEmpty =>
          s = s.copy(tView = Some(m))
        case "click" if s.tClick.isEmpty && s.tView.exists(m > _) =>
          s = s.copy(tClick = Some(m))
        case "purchase" if s.tPurchase.isEmpty && s.tClick.exists(m > _) =>
          s = s.copy(tPurchase = Some(m))
        case _ => ()
      }
      if (s.stage > prev) advances += Stage(userId, s.stage)
    }
    if (s.stage > before) state.update(s)
    advances.iterator
  }

  /** Stage-advance stream: one row per user per stage reached (Append
    * mode; take max per user for the current funnel position). */
  def stageAdvances(events: Dataset[Ev]): Dataset[Stage] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Stage](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateUser)
  }
}
