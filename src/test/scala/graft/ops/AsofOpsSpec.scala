package graft.ops

import graft.SparkSpec

/** Property check of the generic as-of join against a brute-force
  * latest-at-or-before computation on seeded random data. */
class AsofOpsSpec extends SparkSpec {

  test("asofJoin == brute-force latest-at-or-before (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(2024)
    val leftRows = (1 to 300).map(i => (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(1000)))
    // right unique per (key, time) per the operator contract
    val right = (1 to 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000), i.toLong))
      .groupBy(r => (r._1, r._2))
      .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq
    val got = AsofOps.asofJoin(
        leftRows.toDF("k", "lid", "lt"), right.toDF("k", "rt", "rid"),
        Seq("k"), "lt", "rt")
      .collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("lid")) ->
        (Option(x.getAs[Any]("rid")), Option(x.getAs[Any]("rt")))).toMap
    assert(got.size == leftRows.size) // every left row exactly once
    leftRows.foreach { case (k, lid, lt) =>
      val cand = right.filter(r => r._1 == k && r._2 <= lt)
      if (cand.isEmpty) assert(got((k, lid))._1.isEmpty, s"k=$k lid=$lid expected no match")
      else {
        val best = cand.maxBy(_._2)
        assert(got((k, lid)) == ((Some(best._3), Some(best._2))), s"k=$k lid=$lid")
      }
    }
  }

  test("asofJoinForward == brute-force earliest-at-or-after (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(2025)
    val leftRows = (1 to 300).map(i => (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(1000)))
    val right = (1 to 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000), i.toLong))
      .groupBy(r => (r._1, r._2))
      .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq
    val got = AsofOps.asofJoinForward(
        leftRows.toDF("k", "lid", "lt"), right.toDF("k", "rt", "rid"),
        Seq("k"), "lt", "rt")
      .collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("lid")) ->
        (Option(x.getAs[Any]("rid")), Option(x.getAs[Any]("rt")))).toMap
    assert(got.size == leftRows.size)
    leftRows.foreach { case (k, lid, lt) =>
      val cand = right.filter(r => r._1 == k && r._2 >= lt)
      if (cand.isEmpty) assert(got((k, lid))._1.isEmpty, s"k=$k lid=$lid expected no match")
      else {
        val best = cand.minBy(_._2)
        assert(got((k, lid)) == ((Some(best._3), Some(best._2))), s"k=$k lid=$lid")
      }
    }
  }

  test("asofJoinNearest == brute-force closest either side, ties backward (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    val leftRows = (1 to 300).map(i => (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(1000)))
    val right = (1 to 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000), i.toLong))
      .groupBy(r => (r._1, r._2))
      .map { case ((k, t), rows) => (k, t, rows.map(_._3).max) }.toSeq
    val got = AsofOps.asofJoinNearest(
        leftRows.toDF("k", "lid", "lt"), right.toDF("k", "rt", "rid"),
        Seq("k"), "lt", "rt")
      .collect()
      .map(x => (x.getAs[Long]("k"), x.getAs[Long]("lid")) ->
        (Option(x.getAs[Any]("rid")), Option(x.getAs[Any]("rt")))).toMap
    assert(got.size == leftRows.size)
    leftRows.foreach { case (k, lid, lt) =>
      val back = right.filter(r => r._1 == k && r._2 <= lt)
        .sortBy(_._2).lastOption
      val fwd = right.filter(r => r._1 == k && r._2 > lt)
        .sortBy(_._2).headOption
      val want = (back, fwd) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          if (lt - b._2 <= f._2 - lt) Some(b) else Some(f)
      }
      assert(got((k, lid)) == ((want.map(_._3), want.map(_._2))), s"k=$k lid=$lid lt=$lt")
    }
  }

  test("asofJoin: null payload FIELD in the matched right row stays null (no torn rows)") {
    import spark.implicits._
    // right at t=1 has a=A1,b=B1; right at t=2 has a=null,b=B2.
    // A left row at t=3 matches t=2: a must be null — a per-column carry
    // would tear the row by back-filling a=A1 from t=1.
    val left = Seq((1L, 3L, 100L)).toDF("k", "lt", "lid")
    val right = Seq(
      (1L, 1L, Option("A1"), Option("B1")),
      (1L, 2L, None: Option[String], Option("B2"))).toDF("k", "rt", "a", "b")
    val row = AsofOps.asofJoin(left, right, Seq("k"), "lt", "rt").collect()(0)
    assert(row.getAs[Long]("rt") == 2L)
    assert(row.isNullAt(row.fieldIndex("a")), "null field must not be back-filled")
    assert(row.getAs[String]("b") == "B2")
    // and a left row BEFORE any right row gets an all-null payload
    val early = AsofOps.asofJoin(Seq((1L, 0L, 7L)).toDF("k", "lt", "lid"),
      right, Seq("k"), "lt", "rt").collect()(0)
    assert(early.isNullAt(early.fieldIndex("rt")) && early.isNullAt(early.fieldIndex("a"))
      && early.isNullAt(early.fieldIndex("b")))
  }
}
