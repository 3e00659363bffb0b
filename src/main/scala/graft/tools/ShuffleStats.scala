package graft.tools

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shuffle/spill forensics for the scale sweeps: runs one registry
  * entry and prints its TOTAL shuffle records/bytes and spill bytes
  * from the task-metrics stream. The third-decade question is "did the
  * WORK grow ~linearly while the WALL grew faster?" — wall-clock alone
  * cannot answer it on a fixture box whose cores/RAM/disk stay constant
  * while the data grows 1000×; shuffle records are the plan's own
  * work ledger (a quadratic plan shows quadratic records; a spill-bound
  * linear plan shows linear records and a spill column that explains
  * the wall).
  *
  * Usage: runMain graft.tools.ShuffleStats <sfDir> <entry> */
object ShuffleStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val entry = args(1)
    val spark = graft.GraftSession.get("graft-shuffle-stats")
    graft.ops.Tables.enableInputCache()
    val (recW, bytW, memSpill, diskSpill, inRec) =
      (new LongAdder, new LongAdder, new LongAdder, new LongAdder, new LongAdder)
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
    // listener delivery is ASYNC: without a bus drain, the warmup's
    // queued TaskEnd events leak into the reset ledger and the timed
    // entry's last tasks can be missed at print time — the exact
    // numbers PLANS.md adjudicates scale linearity with. private[spark]
    // compiles to public bytecode, so plain reflection reaches
    // LiveListenerBus.waitUntilEmpty; the fallback sleep bounds the
    // race when the API moves.
    def drainBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(2000) }
    // untimed warmup per the TimeEntries discipline (pays the input
    // cache load so its shuffle-free scan doesn't pollute the ledger
    // only marginally — the warmup's own metrics are EXCLUDED by
    // draining the bus, then resetting)
    graft.Registry.byName("d4_count").build(spark, dir).count()
    drainBus()
    recW.reset(); bytW.reset(); memSpill.reset(); diskSpill.reset(); inRec.reset()
    val q = graft.Registry.byName(entry)
    q.benchPrep.foreach(p => try p(spark, dir) catch { case _: Throwable => })
    val t0 = System.nanoTime()
    val n = q.build(spark, dir).queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    drainBus()
    println(f"[shuffle] $entry sec=$sec%.2f rows=$n " +
      s"shuffle_records=${recW.sum} shuffle_bytes=${bytW.sum} " +
      s"mem_spill=${memSpill.sum} disk_spill=${diskSpill.sum} " +
      s"input_records=${inRec.sum} sf=$dir")
    spark.stop()
  }
}
