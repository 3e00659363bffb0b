package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TpchOps: semantic-rewrite equivalence and plan-shape pins for the
  * extended TPC-H family. Values are oracle-checked by the driver; these
  * tests pin the properties the oracle can't see — that the scalable
  * rewrite equals the textbook formulation, and that the plans broadcast
  * what must broadcast. */
class TpchOpsSpec extends SparkSpec {

  test("q21 single-reduction form == literal EXISTS / NOT EXISTS form") {
    // the textbook double-correlated form, as Spark SQL over temp views —
    // correct by construction, quadratic-ish by construction (two extra
    // correlated semi joins); q21WaitingSupplier must match it exactly
    Tables(spark, Sf0001, "lineitem").createOrReplaceTempView("t_li")
    Tables(spark, Sf0001, "orders").createOrReplaceTempView("t_o")
    Tables(spark, Sf0001, "supplier").createOrReplaceTempView("t_s")
    val literal = spark.sql(
      """SELECT s_name, count(*) AS numwait
        |FROM t_s, t_li l1, t_o
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAYS
        |  AND EXISTS (SELECT 1 FROM t_li l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM t_li l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAYS)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin).collect()
    val reduced = TpchOps.q21WaitingSupplier(spark, Sf0001).collect()
    assert(reduced.nonEmpty, "q21 is vacuous at sf0.001")
    assert(reduced.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      literal.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("q13 left join keeps zero-order customers; histogram covers all") {
    val rows = TpchOps.q13CustDistribution(spark, Sf0001).collect()
    val totalCustomers = rows.map(_.getAs[Long]("custdist")).sum
    assert(totalCustomers == Tables(spark, Sf0001, "customer").count(),
      "every customer appears in exactly one count bucket")
  }

  test("q15 ties: every returned supplier has exactly the max revenue") {
    val rows = TpchOps.q15TopSupplier(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"non-max rows leaked: ${revs.toSeq}")
  }

  test("q17 integer-cents threshold == decimal-exact threshold") {
    // the filter qc·5·n < Σqc must equal l_quantity < 0.2·avg computed
    // in exact decimal (the float formulation it replaces)
    val li = Tables(spark, Sf0001, "lineitem")
    val exact = li.groupBy(col("l_partkey").as("k"))
      .agg(avg(col("l_quantity").cast("decimal(18,6)")).as("avg_qty"))
    val viaDecimal = li
      .join(Tables(spark, Sf0001, "part").filter(col("p_brand") === "Brand#3"),
        col("l_partkey") === col("p_partkey"))
      .join(exact, col("l_partkey") === col("k"))
      .filter(col("l_quantity").cast("decimal(18,6)") <
        col("avg_qty") * lit(BigDecimal("0.2")))
      .count()
    val got = TpchOps.q17SmallQty(spark, Sf0001)
      .collect()(0).getAs[Long]("n_lines")
    assert(got == viaDecimal)
  }

  test("q16 NOT IN plans as a null-aware anti join and excludes the blocklist") {
    val df = TpchOps.q16SupplierVariety(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    // values: no blocklisted supplier survives the NOT IN
    val blocked = Tables(spark, Sf0001, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val survivors = Tables(spark, Sf0001, "lineitem")
      .join(Tables(spark, Sf0001, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#5" && !col("l_suppkey").isInCollection(blocked))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      .collect()
    assert(df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ==
      survivors.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("q7/q9: dims broadcast, the fact edge is the only non-broadcast join") {
    Seq(
      TpchOps.q7VolumeShipping(spark, Sf0001),
      TpchOps.q9ProductProfit(spark, Sf0001)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      val nonBroadcastJoins =
        "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(plan).length
      assert(nonBroadcastJoins <= 1,
        s"more than one shuffled join — a dim lost its broadcast:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("q19: part predicates prune the broadcast side before the join") {
    val df = TpchOps.q19Disjunctive(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the brand disjunction must filter the part scan, not the joined rows
    assert(plan.contains("Brand#1"), plan)
    val n = df.collect()(0).getAs[Long]("n_lines")
    assert(n > 0, "q19 is vacuous at sf0.001")
  }
}
