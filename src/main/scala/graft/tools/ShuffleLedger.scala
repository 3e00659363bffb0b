package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** The task-metrics work ledger shared by [[ShuffleStats]] (the scale
  * sweeps' solo instrument) and [[graft.Bench]] (per-headline records in
  * the round artifact): total shuffle records/bytes, spill, and input
  * records accumulated off the TaskEnd stream. Shuffle records are the
  * PLAN'S OWN work measure — immune to box contention and cache
  * prestate, so a plan regression shows as a records jump even when
  * wall-clock is noisy (and a wall-clock phantom shows flat records).
  *
  * Listener delivery is ASYNC: readers MUST [[drain]] before [[reset]]
  * (or stale events leak into the next window) and again before reading
  * (or the window's tail tasks are missed). private[spark] compiles to
  * public bytecode, so plain reflection reaches
  * LiveListenerBus.waitUntilEmpty; if a Spark upgrade moves the API the
  * sleep fallback bounds the race but cannot GUARANTEE the tail landed —
  * so a fallback drain is loud on stderr and latches [[drainFellBack]],
  * which every consumer stamps into its printed line: an under-counted
  * ledger must never be indistinguishable from a clean one (r14 ADVICE).
  */
final class ShuffleLedger private (spark: SparkSession) {
  private val recW = new LongAdder
  private val bytW = new LongAdder
  private val memSpill = new LongAdder
  private val diskSpill = new LongAdder
  private val inRec = new LongAdder
  @volatile private var fellBack = false

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recW.add(m.shuffleWriteMetrics.recordsWritten)
        bytW.add(m.shuffleWriteMetrics.bytesWritten)
        memSpill.add(m.memoryBytesSpilled)
        diskSpill.add(m.diskBytesSpilled)
        inRec.add(m.inputMetrics.recordsRead)
      }
    }
  })

  /** Block until every queued listener event is delivered (reflective
    * LiveListenerBus.waitUntilEmpty; loud 2s-sleep fallback). */
  def drain(): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case e: Throwable =>
      fellBack = true
      System.err.println("[ledger] WARN: listenerBus drain reflection " +
        s"failed (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}); " +
        "falling back to a 2s sleep — readings may UNDER-COUNT tail " +
        "TaskEnd events")
      Thread.sleep(2000)
    }

  /** Zero the counters. Callers drain first so queued events from the
    * previous window cannot leak into the new one. */
  def reset(): Unit = {
    recW.reset(); bytW.reset(); memSpill.reset(); diskSpill.reset()
    inRec.reset()
  }

  def records: Long = recW.sum
  def bytes: Long = bytW.sum
  def memSpilled: Long = memSpill.sum
  def diskSpilled: Long = diskSpill.sum
  def inputRecords: Long = inRec.sum

  /** True once ANY drain took the sleep fallback — the ledger's numbers
    * are then lower bounds, not exact, and must be labeled as such. */
  def drainFellBack: Boolean = fellBack
}

object ShuffleLedger {
  def attach(spark: SparkSession): ShuffleLedger = new ShuffleLedger(spark)
}
