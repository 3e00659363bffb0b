package graft.tools

/** Shuffle/spill forensics for the scale sweeps: runs one registry
  * entry and prints its TOTAL shuffle records/bytes and spill bytes
  * from the task-metrics stream ([[ShuffleLedger]]). The third-decade
  * question is "did the WORK grow ~linearly while the WALL grew
  * faster?" — wall-clock alone cannot answer it on a fixture box whose
  * cores/RAM/disk stay constant while the data grows 1000×; shuffle
  * records are the plan's own work ledger (a quadratic plan shows
  * quadratic records; a spill-bound linear plan shows linear records
  * and a spill column that explains the wall).
  *
  * Usage: runMain graft.tools.ShuffleStats <sfDir> <entry> */
object ShuffleStats {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val entry = args(1)
    val spark = graft.GraftSession.get("graft-shuffle-stats")
    graft.ops.Tables.enableInputCache()
    val ledger = ShuffleLedger.attach(spark)
    // untimed warmup per the TimeEntries discipline (pays the input
    // cache load so its shuffle-free scan doesn't pollute the ledger
    // only marginally — the warmup's own metrics are EXCLUDED by
    // draining the bus, then resetting; listener delivery is ASYNC,
    // see ShuffleLedger)
    graft.Registry.byName("d4_count").build(spark, dir).count()
    val q = graft.Registry.byName(entry)
    // fixture prep (e.g. re-fragmenting the compaction lake) runs
    // BEFORE the reset: the ledger reads the operator's work, not its
    // fixture's write cost — the same boundary Bench draws with its
    // timer
    q.benchPrep.foreach(p => try p(spark, dir) catch { case _: Throwable => })
    ledger.drain()
    ledger.reset()
    val t0 = System.nanoTime()
    val n = q.build(spark, dir).queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    ledger.drain()
    println(f"[shuffle] $entry sec=$sec%.2f rows=$n " +
      s"shuffle_records=${ledger.records} shuffle_bytes=${ledger.bytes} " +
      s"mem_spill=${ledger.memSpilled} disk_spill=${ledger.diskSpilled} " +
      s"input_records=${ledger.inputRecords} " +
      s"drain=${if (ledger.drainFellBack) "fallback" else "clean"} sf=$dir")
    spark.stop()
  }
}
