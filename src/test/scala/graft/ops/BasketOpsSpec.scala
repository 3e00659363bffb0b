package graft.ops

import graft.SparkSpec

/** Association statistics on a planted basket set where every count and
  * lift is hand-computable; the Registry oracle pins the real-data
  * top-50 at three SFs. */
class BasketOpsSpec extends SparkSpec {
  import spark.implicits._

  test("planted baskets: pair counts, supports, and lift are exact") {
    // orders: 1=(10,20,30)  2=(10,20)  3=(10,30)  4=(40)
    val rows = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 40L))
    val dir = tempDir("baskets")
    rows.toDF("l_orderkey", "l_partkey").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = BasketOps.basketAffinity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set((10L, 20L), (10L, 30L), (20L, 30L)))
    assert(got((10L, 20L)) == ((2L, 3L, 2L, 2.0 * 4 / (3 * 2))))
    assert(got((10L, 30L)) == ((2L, 3L, 2L, 2.0 * 4 / (3 * 2))))
    assert(got((20L, 30L)) == ((1L, 2L, 2L, 1.0 * 4 / (2 * 2))))
    // the singleton order contributes no pair
    assert(!got.keySet.exists(p => p._1 == 40L || p._2 == 40L))

    // also-bought on the same baskets: 10's partners ranked (20,30 tie at
    // 2 -> lower id first); 40 never appears; plan must stay windowless
    val recs = BasketOps.alsoBought(spark, dir)
    val plan = recs.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkpairsaggregator") && !plan.contains("Window"))
    val byPart = recs.collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq)
      .toMap
    assert(byPart(10L) == Seq((20L, 2L), (30L, 2L)))
    assert(byPart(20L).head == ((10L, 2L)))
    assert(!byPart.contains(40L))
  }
}
