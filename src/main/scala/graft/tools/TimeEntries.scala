package graft.tools

/** Per-entry timing sweep at a small SF — the cheap detector for
  * plan-level pathologies (alias-inlining recomputes, accidental
  * cartesians) that hide inside a passing correctness run: any entry
  * whose cost is wildly out of family at 500 rows is broken SHAPE, not
  * load. Prints one line per entry, slowest last.
  *
  * Usage: runMain graft.tools.TimeEntries [sfDir] [minSecToPrint] [namesCsv]
  * (namesCsv restricts the sweep — the scale-ratio workflow times a
  * handful of entries at two SFs and diffs.)
  */
object TimeEntries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val minSec = if (args.length > 1) args(1).toDouble else 0.5
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = graft.GraftSession.get("graft-time-entries")
    graft.ops.Tables.enableInputCache()
    val times = graft.Registry.all.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))
      .flatMap { q =>
      q.benchPrep.foreach(p => try p(spark, sfDir) catch { case _: Throwable => })
      val t0 = System.nanoTime()
      try {
        q.build(spark, sfDir).queryExecution.toRdd.count()
        Some(q.name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          println(f"[time] ${q.name}%-40s FAILED ${e.getClass.getSimpleName}")
          None
      }
    }
    times.filter(_._2 >= minSec).sortBy(_._2).foreach { case (n, t) =>
      println(f"[time] $n%-40s $t%8.2f s")
    }
    println(f"[time] TOTAL ${times.map(_._2).sum}%.1f s over ${times.length} entries")
    // Bench-compatible JSON line (ALL entries, one rep each) so
    // tools/scale_ratios.py can diff two sweeps directly — the r12
    // verdict's full-registry scale-ratio demand runs on this
    val failed = graft.Registry.all
      .count(q => only.forall(_.contains(q.name))) - times.length
    val qs = times.map { case (n, t) => "\"" + n + "\":" + t }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${times.map(_._2).sum},"unit":"sec","failed":$failed,"canary":{"start":0,"end":0},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
