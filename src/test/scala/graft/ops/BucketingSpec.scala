package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioning both sides of a recurring join on its key
  * removes the per-query shuffle entirely — the co-location strategy for
  * repeated fact-fact joins at 100 TB (pay one shuffle at write time,
  * join shuffle-free forever after). */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables(spark, Sf0001, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables(spark, Sf0001, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")

    // force the non-broadcast path: at test scale everything fits a
    // broadcast, which would bypass the bucketed co-location under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // no shuffle on either join key (the post-join agg exchange on
      // o_orderpriority is expected and unrelated)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), s"shuffle on left:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), s"shuffle on right:\n$plan")

      // and it computes the same result as the unbucketed join
      val want = JoinOps.j2FactJoinAgg(spark, Sf0001)
        .select(col("o_orderpriority"), col("n_items")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("j11_bucket_join: zero exchanges below the join, rows match j2") {
    val plan = JoinOps.j11BucketJoin(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"join shuffled the lineitem side — bucketing not picked up:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join shuffled the orders side — bucketing not picked up:\n$plan")
    // single-file buckets were written sorted and GraftSession enables
    // legacy.bucketedTableScan.outputOrdering, so the SMJ needs no
    // per-bucket re-sort on EITHER scan
    assert(!plan.contains("Sort [l_orderkey"), s"unexpected lineitem re-sort:\n$plan")
    assert(!plan.contains("Sort [o_orderkey"), s"unexpected orders re-sort:\n$plan")

    val got = JoinOps.j11BucketJoin(spark, Sf0001).collect().map(_.toSeq)
    val want = JoinOps.j2FactJoinAgg(spark, Sf0001).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  /** The other half of the skew story (a1_salted_agg covers single-key
    * aggregation): for JOINS, AQE's runtime skew handling splits an
    * oversized shuffle partition into parallel sub-tasks. Manufacture a
    * 90%-one-key join at low thresholds and assert the final adaptive
    * plan actually marked and split the skew. */
  test("AQE splits the skewed join partition at runtime (skew=true)") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val left = spark.range(200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      // no downstream operator reuses the join partitioning, so AQE is
      // free to split the hot partition (it skips the rewrite when a
      // split would force an extra shuffle for a dependent stage)
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan a separate one and
      // leave this adaptive plan unfinalized)
      val n = joined.queryExecution.toRdd.count()
      assert(n == 180100L, s"join cardinality $n") // 180000 hot + 100 cold matches
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
