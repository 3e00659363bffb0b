package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state counterpart of the
  * batch `WindowOps.w4Sessionize` (same 30-minute gap semantics), built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState`.
  *
  * State per user is ONE open session (start, last-seen, count, decimal
  * cents total) — bounded regardless of stream length; closed sessions are
  * emitted as soon as a gap is observed, and event-time timeout with a
  * watermark would expire idle users' state on an unbounded stream. Value
  * totals accumulate in integer cents so the streaming and batch paths
  * agree exactly.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startMicros: Long, lastMicros: Long, n: Int, totalCents: Long)
  final case class Session(
      user_id: Long, session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long, total_value: Double)

  val GapMicros: Long = 30L * 60 * 1000000

  private def micros(t: java.sql.Timestamp): Long = t.getTime * 1000 + t.getNanos / 1000 % 1000
  private def ts(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(m / 1000)
    t.setNanos(((m % 1000000) * 1000).toInt)
    t
  }
  private def cents(v: Double): Long = math.round(v * 100)

  /** Fold a user's (batch-sorted) events into the open-session state,
    * emitting every closed session. The sort materializes ONE user's ONE
    * micro-batch slice on the heap — bounded by the trigger interval ×
    * that user's event rate, not by stream length (cross-batch state is
    * only the O(1) OpenSession); it exists because arrival order within a
    * batch is not event-time order. */
  def updateUser(
      userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var open = state.getOption
    sorted.foreach { e =>
      val m = micros(e.ts)
      open match {
        case Some(s) if m - s.lastMicros > GapMicros =>
          closed += Session(userId, ts(s.startMicros), ts(s.lastMicros), s.n, s.totalCents / 100.0)
          open = Some(OpenSession(m, m, 1, cents(e.value)))
        case Some(s) =>
          open = Some(OpenSession(s.startMicros, m, s.n + 1, s.totalCents + cents(e.value)))
        case None =>
          open = Some(OpenSession(m, m, 1, cents(e.value)))
      }
    }
    open.foreach(state.update)
    closed.iterator
  }

  /** Closed sessions of an event stream (Append mode; the final open
    * session per user stays in state — bounded-input form, finalized via
    * `finalOpenSessions`. For unbounded streams use
    * `closedSessionsWithTimeout`, which expires idle users' state). */
  def closedSessions(events: Dataset[Ev]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(updateUser)
  }

  /** Timeout-aware update: on an event-time timeout the watermark has
    * passed lastSeen + gap, so the open session can never be extended —
    * emit it and FREE the state (this is what bounds state size on an
    * unbounded stream: idle users cost nothing after one gap). Otherwise
    * fold normally and re-arm the timeout at lastSeen + gap (clamped just
    * above the current watermark — a group revived by an allowed late
    * event may already sit behind it). */
  def updateUserWithTimeout(
      userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, ts(s.startMicros), ts(s.lastMicros), s.n, s.totalCents / 100.0))
    } else {
      val out = updateUser(userId, events, state)
      state.getOption.foreach { s =>
        val fireAtMs = s.lastMicros / 1000 + GapMicros / 1000
        state.setTimeoutTimestamp(math.max(fireAtMs, state.getCurrentWatermarkMs() + 1))
      }
      out
    }
  }

  /** Unbounded-stream sessionizer: watermark + event-time timeout. Late
    * events within `watermarkDelay` still extend their session; once the
    * watermark passes an open session's gap horizon the session is emitted
    * by timeout and its state removed. */
  def closedSessionsWithTimeout(
      events: Dataset[Ev], watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUserWithTimeout)
  }

  /** Drain the per-user open sessions (bounded-input finalization — the
    * batch twin's last session per user). */
  def finalOpenSessions(events: Dataset[Ev]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        var open: Option[OpenSession] = None
        val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
        sorted.foreach { e =>
          val m = micros(e.ts)
          open = open match {
            case Some(s) if m - s.lastMicros > GapMicros => Some(OpenSession(m, m, 1, cents(e.value)))
            case Some(s) => Some(OpenSession(s.startMicros, m, s.n + 1, s.totalCents + cents(e.value)))
            case None => Some(OpenSession(m, m, 1, cents(e.value)))
          }
        }
        val s = open.get
        Session(uid, ts(s.startMicros), ts(s.lastMicros), s.n, s.totalCents / 100.0)
      }
  }
}
