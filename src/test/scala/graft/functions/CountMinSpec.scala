package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch semantics: never undercounts, partitioning-
  * invariant (mergeable), and tight on a small planted stream. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private def sketchOf(terms: Seq[String], parts: Int): Array[Long] = {
    val cms = udaf(CountMinAggregator(D, W))
    terms.toDF("term").repartition(parts)
      .agg(cms(col("term")).as("sk"))
      .collect()(0).getAs[scala.collection.Seq[Long]]("sk").toArray
  }

  test("planted counts: estimates exact when no collisions, never below truth") {
    val stream = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val sk = sketchOf(stream, 3)
    val est = Map(
      "alpha" -> CountMinAggregator.estimate(sk, "alpha", D, W),
      "beta" -> CountMinAggregator.estimate(sk, "beta", D, W),
      "gamma" -> CountMinAggregator.estimate(sk, "gamma", D, W))
    assert(est("alpha") >= 5 && est("beta") >= 3 && est("gamma") >= 1)
    // 3 distinct terms in 4×1024 cells: collision-free in at least one
    // row with overwhelming margin — estimates are exact here
    assert(est == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
    // total mass per row is the stream length
    for (d <- 0 until D)
      assert(sk.slice(d * W, (d + 1) * W).sum == stream.length.toLong)
  }

  test("mergeable: estimates independent of partitioning") {
    val stream = (1 to 400).map(i => s"t${i % 37}")
    val a = sketchOf(stream, 1)
    val b = sketchOf(stream, 8)
    assert(a.toSeq == b.toSeq, "elementwise-sum merge must be partition-count-invariant")
  }

  test("inner product: exact join size when collision-free, never below truth") {
    // A = {a×3, b×2, c×1}, B = {b×4, c×5, d×7} → true join size
    // Σ n_A(k)·n_B(k) = 2·4 + 1·5 = 13; 4 distinct terms in 4×1024
    // cells → some row is collision-free and min() recovers it exactly
    val a = sketchOf(Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c"), 2)
    val b = sketchOf(Seq.fill(4)("b") ++ Seq.fill(5)("c") ++ Seq.fill(7)("d"), 3)
    assert(CountMinAggregator.innerProduct(a, b, D, W) == 13L)
    // self-join size (F2): 9 + 4 + 1 = 14
    assert(CountMinAggregator.innerProduct(a, a, D, W) == 14L)
  }

  test("join-size gate: both bounds hold on the real tables at sf0.001") {
    val rows = graft.ops.SketchOps.joinSizeGate(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("l_partkey_self", "lineitem_orders"))
    rows.foreach(r => assert(r.getAs[Boolean]("passes"), r.getString(0)))
  }

  test("gate passes on the real corpus at sf0.001") {
    val rows = graft.ops.SketchOps.cmsGate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("overestimates"), s"undercount at ${r.getString(0)}")
      assert(r.getAs[Boolean]("within_bound"), s"excess blown at ${r.getString(0)}")
    }
  }
}
