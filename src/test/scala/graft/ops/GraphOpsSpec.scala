package graft.ops

import graft.SparkSpec

/** PageRank semantics on planted graphs where the stationary structure
  * is known, plus conservation/determinism invariants. The Registry hash
  * oracle pins the exact integer arithmetic; these pin WHY. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = pairs ++ pairs.map(_.swap)
    GraphOps.pageRankOf(sym.distinct.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star graph: the hub dominates, leaves tie exactly") {
    val star = (1L to 8L).map(l => (0L, l))
    val r = ranksOf(star)
    val leaves = (1L to 8L).map(r)
    assert(leaves.distinct.size == 1, "leaves must be symmetric-identical")
    assert(r(0L) > leaves.head * 3, s"hub ${r(0L)} must dominate leaf ${leaves.head}")
  }

  test("regular ring: perfect symmetry, ranks all equal, mass conserved") {
    val n = 10L
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    val r = ranksOf(ring)
    assert(r.values.toSeq.distinct.size == 1, "regular graph must be uniform")
    val total = r.values.sum
    // floor losses: <= 1 unit per node and per edge per iteration
    val slack = GraphOps.Iters * (n + 2 * n) + n
    assert(total <= GraphOps.RankScale && total >= GraphOps.RankScale - slack,
      s"mass $total strayed from ${GraphOps.RankScale}")
  }

  test("two disconnected components: per-component mass tracks component size") {
    // K3 (nodes 0-2) plus an isolated edge pair (10-11)
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L))
    val r = ranksOf(g)
    val k3 = Seq(0L, 1L, 2L).map(r).sum
    val pair = Seq(10L, 11L).map(r).sum
    // 3/5 vs 2/5 of the mass, up to floor slack
    assert(math.abs(k3 - GraphOps.RankScale * 3 / 5) < 1000)
    assert(math.abs(pair - GraphOps.RankScale * 2 / 5) < 1000)
  }

  test("real purchase graph: deterministic, node ids partition by parity") {
    val a = GraphOps.pageRank(spark, Sf0001).collect()
    val b = GraphOps.pageRank(spark, Sf0001).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
    val (supp, cust) = a.partition(_.getLong(0) % 2 == 0)
    assert(supp.nonEmpty && cust.nonEmpty)
  }
}
