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
}
