package graft.tools

/** Min-of-N timer for a NAMED list of registry entries — the A/B
  * instrument for optimization work: Bench times the whole headline
  * suite (3+ minutes per data point); this times just the entries under
  * investigation with the same methodology (benchPrep outside the
  * timer, `queryExecution.toRdd.count()` as the action, min-of-N), so a
  * before/after comparison of one operator costs seconds.
  * Usage: runMain graft.tools.TimeNames [sfDir] [reps] name[,name...] */
object TimeNames {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args(2).split(",").toSeq else Seq("d4_count")
    val spark = graft.GraftSession.get("graft-time-names")
    // same untimed warmups as Bench so indexed entries measure probes
    def warmup(what: String)(body: => Any): Unit =
      try { body; () }
      catch { case e: Throwable =>
        System.err.println(s"[timenames] warmup '$what' failed: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
      }
    warmup("d4_count")(graft.Registry.byName("d4_count").build(spark, dir).count())
    val needIdx = names.exists(n => n.contains("indexed") || n.contains("bucket"))
    if (needIdx) {
      warmup("knn_index")(graft.ops.SimilarityOps.ensureKnnIndex(spark, dir))
      warmup("lex_index")(graft.ops.RetrievalOps.ensureLexIndex(spark, dir))
      warmup("pq_index")(graft.ops.PqOps.ensurePqIndex(spark, dir))
      warmup("bin_index")(graft.ops.SimilarityOps.ensureBinaryIndex(spark, dir))
      warmup("bucketed_tables")(graft.ops.JoinOps.ensureBucketedTables(spark, dir))
    }
    names.foreach { n =>
      val q = graft.Registry.byName(n)
      val samples = (1 to reps).flatMap { _ =>
        q.benchPrep.foreach(p => warmup(s"$n prep")(p(spark, dir)))
        val t0 = System.nanoTime()
        try {
          q.build(spark, dir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[timenames] $n failed: ${e.getMessage}"); None
        }
      }
      val minS = if (samples.nonEmpty) samples.min else -1.0
      println(f"[timenames] $n%-36s min=$minS%7.3f  all=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
