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
    // Untimed warmups, mirroring Bench: the first timed entry otherwise
    // pays the parquet input-cache load, and the write-once index/layout
    // builds otherwise land inside whichever indexed entry runs first —
    // both manufactured warm-vs-cold "super-linear" flags at the bigger
    // SF (r13's x_retrieval_bm25_incremental read 20.7× until re-measured
    // warm; adjudicated phantom). Failures are logged, never silent.
    def warmup(what: String)(body: => Any): Unit =
      try { body; () }
      catch { case e: Throwable =>
        System.err.println(s"[time] warmup '$what' failed: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
      }
    warmup("d4_count")(graft.Registry.byName("d4_count").build(spark, sfDir).count())
    // index/layout builds only for the FULL sweep: a filtered spot-check
    // (e.g. the sf100 third-decade run) shouldn't pay a PQ codebook
    // train for six entries that never probe it; filtered indexed
    // entries still get their own benchPrep per the loop below
    if (only.isEmpty) {
      warmup("knn_index")(graft.ops.SimilarityOps.ensureKnnIndex(spark, sfDir))
      warmup("lex_index")(graft.ops.RetrievalOps.ensureLexIndex(spark, sfDir))
      warmup("pq_index")(graft.ops.PqOps.ensurePqIndex(spark, sfDir))
      warmup("bin_index")(graft.ops.SimilarityOps.ensureBinaryIndex(spark, sfDir))
      warmup("bucketed_tables")(graft.ops.JoinOps.ensureBucketedTables(spark, sfDir))
    }
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
