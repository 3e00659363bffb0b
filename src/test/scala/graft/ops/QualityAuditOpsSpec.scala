package graft.ops

import graft.SparkSpec

/** The audit must FAIL correctly: a planted-violation lake flips exactly
  * the right rules with exact violation counts. (The Registry oracle
  * pins the all-green report on the real tables at three SFs.) */
class QualityAuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("planted violations: each broken rule reports its exact count, clean rules pass") {
    val dir = tempDir("dq_lake")
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // violations: one orphan line (orderkey 99), one duplicated line key,
    // one quantity out of range, one null shipdate; discounts clean
    Seq(
      (1L, 1, 10.0, 0.05, ts),
      (1L, 1, 12.0, 0.05, ts),                       // dup (orderkey, line)
      (1L, 2, 99.0, 0.05, ts),                       // quantity > 50
      (2L, 1, 5.0, 0.00, null.asInstanceOf[java.sql.Timestamp]), // null date
      (99L, 1, 7.0, 0.10, ts))                       // orphan order
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L, 2L).toDF("o_orderkey")               // dup order key
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = QualityAuditOps.dqAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("lineitem.discount_in_0_0.1") == ((0L, true)))
    assert(got("lineitem.line_key_unique") == ((1L, false)))
    assert(got("lineitem.orderkey_in_orders") == ((1L, false)))
    assert(got("lineitem.quantity_in_1_50") == ((1L, false)))
    assert(got("lineitem.shipdate_not_null") == ((1L, false)))
    assert(got("orders.orderkey_unique") == ((1L, false)))
  }
}
