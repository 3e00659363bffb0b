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

  test("k-anonymity: the flag counts USERS not rows; suppression mass follows the flag") {
    val dir = tempDir("kanon_events")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hour H1 of 'view': 3 distinct users, one row each → anonymous at k=3
    // hour H2 of 'view': ONE user posting 5 rows → row count clears k but
    //   user count doesn't — the flag must fire (the privacy unit test)
    // hour H1 of 'click': 2 users → below k
    val rows = Seq(
      (1L, ts("2024-03-01 10:05:00"), 11L, "view", 1.0, "{}"),
      (2L, ts("2024-03-01 10:15:00"), 12L, "view", 1.0, "{}"),
      (3L, ts("2024-03-01 10:45:00"), 13L, "view", 1.0, "{}"),
      (4L, ts("2024-03-01 11:01:00"), 11L, "view", 1.0, "{}"),
      (5L, ts("2024-03-01 11:02:00"), 11L, "view", 1.0, "{}"),
      (6L, ts("2024-03-01 11:03:00"), 11L, "view", 1.0, "{}"),
      (7L, ts("2024-03-01 11:04:00"), 11L, "view", 1.0, "{}"),
      (8L, ts("2024-03-01 11:05:00"), 11L, "view", 1.0, "{}"),
      (9L, ts("2024-03-01 10:20:00"), 21L, "click", 1.0, "{}"),
      (10L, ts("2024-03-01 10:40:00"), 22L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val audit = QualityAuditOps.kAnonymityAudit(spark, dir, 3).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1).toString),
        (r.getLong(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(audit(("view", "2024-03-01 10:00:00.0")) == ((3L, 3, true)))
    assert(audit(("view", "2024-03-01 11:00:00.0")) == ((5L, 1, false)),
      "5 rows from one user must NOT count as anonymous")
    assert(audit(("click", "2024-03-01 10:00:00.0")) == ((2L, 2, false)))
    val sup = QualityAuditOps.kAnonymitySuppress(spark, dir, 3).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(sup("view") == ((8L, 5L, 3L, 1)))
    assert(sup("click") == ((2L, 2L, 0L, 1)))
  }

  test("l-diversity: a k-anonymous homogeneous group still fails the diversity floor") {
    val dir = tempDir("ldiv_events")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def k(v: Int) = s"""{"k": $v}"""
    // hour 10 of 'view': 4 users, ALL with sensitive category 7 —
    //   k-anonymous at k=3 yet discloses the category (homogeneity)
    // hour 11 of 'view': 3 users with categories 1, 2, 3 → diverse
    val rows = Seq(
      (1L, ts("2024-03-01 10:05:00"), 11L, "view", 1.0, k(7)),
      (2L, ts("2024-03-01 10:15:00"), 12L, "view", 1.0, k(17)),
      (3L, ts("2024-03-01 10:25:00"), 13L, "view", 1.0, k(27)),
      (4L, ts("2024-03-01 10:35:00"), 14L, "view", 1.0, k(97)),
      (5L, ts("2024-03-01 11:05:00"), 11L, "view", 1.0, k(1)),
      (6L, ts("2024-03-01 11:15:00"), 12L, "view", 1.0, k(2)),
      (7L, ts("2024-03-01 11:25:00"), 13L, "view", 1.0, k(3)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val kAudit = QualityAuditOps.kAnonymityAudit(spark, dir, 3).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(4))).toMap
    assert(kAudit("2024-03-01 10:00:00.0"), "hour 10 IS k-anonymous")
    val lAudit = QualityAuditOps.lDiversityAudit(spark, dir, 3).collect()
      .map(r => (r.getTimestamp(1).toString,
        (r.getLong(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(lAudit("2024-03-01 10:00:00.0") == ((4L, 1, false)),
      "k mod 10 = 7 for all four rows: one sensitive value, not diverse")
    assert(lAudit("2024-03-01 11:00:00.0") == ((3L, 3, true)))
  }

  test("l-diversity: real corpus — the floor bites in both directions") {
    val rows = QualityAuditOps.lDiversityAudit(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("diverse") ==
        (r.getAs[Int]("n_sensitive") >= QualityAuditOps.LDiversityL))
      assert(r.getAs[Int]("n_sensitive") <= 10)
    }
    assert(rows.exists(_.getAs[Boolean]("diverse")) &&
      rows.exists(!_.getAs[Boolean]("diverse")),
      "the floor should separate sparse hours from busy ones at sf0.001")
  }

  test("k-anonymity generalization: every rung of the ladder — hour, day, month, suppress") {
    val dir = tempDir("kanon_gen_events")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // view/Mar-01 10:00 — 3 users: releasable hourly.
    // view/Mar-01 11:00 — 1 user, but the DAY holds {11,12,13}: day rung.
    // view/Mar-02 09:00 — 1 new user, day has 1, MONTH holds 4: month rung.
    // click — 2 users total at every grain: suppressed.
    val rows = Seq(
      (1L, ts("2024-03-01 10:05:00"), 11L, "view", 1.0, "{}"),
      (2L, ts("2024-03-01 10:15:00"), 12L, "view", 1.0, "{}"),
      (3L, ts("2024-03-01 10:45:00"), 13L, "view", 1.0, "{}"),
      (4L, ts("2024-03-01 11:30:00"), 11L, "view", 1.0, "{}"),
      (5L, ts("2024-03-02 09:00:00"), 21L, "view", 1.0, "{}"),
      (6L, ts("2024-03-05 14:00:00"), 31L, "click", 1.0, "{}"),
      (7L, ts("2024-03-05 14:20:00"), 32L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = QualityAuditOps.kAnonymityGeneralize(spark, dir, 3).collect()
      .map(x => ((x.getString(0), x.getTimestamp(1).toString),
        (x.getInt(2), x.getInt(3), x.getInt(4), x.getString(5)))).toMap
    assert(r(("view", "2024-03-01 10:00:00.0")) == ((3, 3, 4, "hour")))
    assert(r(("view", "2024-03-01 11:00:00.0")) == ((1, 3, 4, "day")),
      "one user in the hour, three in the day: must escalate exactly one rung")
    assert(r(("view", "2024-03-02 09:00:00.0")) == ((1, 1, 4, "month")))
    assert(r(("click", "2024-03-05 14:00:00.0")) == ((2, 2, 2, "suppress")))
  }
}
