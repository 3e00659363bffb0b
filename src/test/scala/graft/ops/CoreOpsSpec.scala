package graft.ops

import graft.{Registry, SparkEntry, SparkSpec}

/** Per-operator spot checks on sf0.001 (the deep value-level gate is the
  * DuckDB oracle at sf0.01; these pin semantics and catch regressions
  * fast). */
class CoreOpsSpec extends SparkSpec {

  test("every registry query runs and is non-degenerate on sf0.001") {
    Registry.all.foreach { q =>
      val df = q.build(spark, Sf0001)
      val n = df.count()
      assert(n >= 0, q.name)
      assert(df.columns.nonEmpty, q.name)
    }
  }

  test("registry names are unique and oracle keys ⊆ query keys") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns the flagship aggregate with rows > 0") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet ==
      Set("event_type", "month", "avg_value", "total_value", "rows_loaded"))
  }

  test("a1 aggregate: groups × counts reconcile with the raw table") {
    val events = Tables(spark, Sf0001, "events")
    val agg = CoreOps.a1MonthlyAggEvents(spark, Sf0001)
    assert(agg.agg(org.apache.spark.sql.functions.sum("rows_loaded")).collect()(0).getLong(0)
      == events.count())
  }

  test("rollup grand total equals table count") {
    val roll = SetOps.g1Rollup(spark, Sf0001).filter("flag = 'ALL' AND status = 'ALL'").collect()
    assert(roll.length == 1)
    assert(roll(0).getAs[Long]("n") == Tables(spark, Sf0001, "lineitem").count())
  }

  test("w1 top-n: every group has ranks 1..3 with descending prices") {
    val rows = WindowOps.w1TopNPerGroup(spark, Sf0001).collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    rows.values.foreach { grp =>
      assert(grp.map(_.getAs[Int]("rn")).sorted.toSeq == Seq(1, 2, 3))
      val prices = grp.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice")).toSeq
      assert(prices == prices.sorted.reverse)
    }
  }

  test("c2: Catalyst pushes the post-sort filter into the scan") {
    val plan = CoreOps.c2PushdownFilter(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), plan)
  }

  test("j1: dimension join is planned as a broadcast hash join") {
    val plan = JoinOps.j1BroadcastDimJoin(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q6: every predicate reaches the parquet scan") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000") // PushedFilters untruncated
    val plan = JoinOps.q6FilteredAgg(spark, Sf0001)
      .queryExecution.executedPlan.toString
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)").foreach { f =>
      assert(plan.contains(f), s"missing pushed filter $f in:\n$plan")
    }
  }

  test("a1 salted == a1 unsalted, bit for bit") {
    val a = CoreOps.a1MonthlyAggEvents(spark, Sf0001).collect()
    val b = CoreOps.a1SaltedAgg(spark, Sf0001).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("TopKAggregator: equals sort-based top-3, invariant to partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = (1 to 500).map(i => ((i % 4).toString, ((i * 37) % 101).toDouble))
    val topk = udaf(graft.functions.TopKAggregator(3))
    def run(parts: Int) = vals.toDF("g", "v").repartition(parts)
      .groupBy(col("g")).agg(topk(col("v")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val r1 = run(1); val r8 = run(8); val r32 = run(32)
    assert(r1 == r8 && r8 == r32, "merge order must not change the result")
    val expect = vals.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted(Ordering[Double].reverse).take(3).toSeq).toMap
    assert(r1 == expect)
  }

  test("j6 as-of: matched purchase is at-or-before the error; null before any purchase") {
    val rows = JoinOps.j6AsofJoin(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(3)).foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("last_purchase_ts")
        .after(r.getAs[java.sql.Timestamp]("error_ts")))
    }
    assert(rows.exists(_.isNullAt(3))) // early errors precede any purchase
    // row identity: exactly one output row per error event
    val nErrors = Tables(spark, Sf0001, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "error").count()
    assert(rows.length.toLong == nErrors)
  }

  test("g4b approx percentiles: sketch within tight error of exact per group") {
    val exact = SetOps.g4Percentiles(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = SetOps.g4bApproxPercentiles(spark, Sf0001).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (p50, p90, p99) = exact(r.getString(0))
      // accuracy=10000 → rank error ≤ n/10000; on these group sizes the
      // sketch lands within one quantity step (values are in [1, 50])
      assert(math.abs(r.getDouble(1) - p50) <= 1.0, s"p50 ${r.getDouble(1)} vs $p50")
      assert(math.abs(r.getDouble(2) - p90) <= 1.0, s"p90 ${r.getDouble(2)} vs $p90")
      assert(math.abs(r.getDouble(3) - p99) <= 1.0, s"p99 ${r.getDouble(3)} vs $p99")
    }
  }

  /** Manufactured power-law skew: 90% of rows in ONE (key, month) group.
    * The salted plan must (a) agree bit-for-bit with the unsalted plan and
    * (b) split the hot group across all 16 salt shards in stage 1, which
    * is what bounds a single reducer's share of a hot key to ~1/16 at any
    * scale. (Wall-clock advantage only materializes when one reducer's
    * group dominates a stage — at spec scale on a noisy box it isn't
    * assertable, so the spec pins the structure instead.) */
  test("salted agg under 90%-one-key skew: equal results, hot key split across shards") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 200000
    val dir = tempDir("skewed_events")
    spark.range(n.toLong)
      .select(
        col("id").as("event_id"),
        (col("id") % 997).as("user_id"),
        when(col("id") % 10 < 9, "hot").otherwise(concat(lit("cold"), col("id") % 7)).as("event_type"),
        to_timestamp(lit("2024-03-15 12:00:00")).as("ts"),
        (col("id") % 200).cast("double").as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val unsalted = CoreOps.a1MonthlyAggEvents(spark, dir).collect()
    val salted = CoreOps.a1SaltedAgg(spark, dir).collect()
    assert(unsalted.length == salted.length)
    unsalted.zip(salted).foreach { case (x, y) => assert(x == y) }
    val hot = salted.find(_.getString(0) == "hot").get
    assert(hot.getAs[Long]("rows_loaded") == (n * 9L) / 10)

    // stage-1 structure: the hot key occupies 16 independent shard groups
    val shardCounts = Tables(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
      .filter(col("event_type") === "hot")
      .groupBy(col("salt")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Long]("c"))
    assert(shardCounts.length == 16, s"hot key split across ${shardCounts.length} shards")
    // shards are hash-balanced: no shard owns more than 2× its fair share
    assert(shardCounts.max <= 2L * (n * 9L / 10) / 16, shardCounts.mkString(","))
  }
}
