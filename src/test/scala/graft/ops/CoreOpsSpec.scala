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
}
