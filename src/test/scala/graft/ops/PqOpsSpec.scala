package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization semantics: structural invariants on the real
  * store, exact recovery on a planted fixture whose sub-vectors lie ON
  * a small pattern set (so Lloyd's converges immediately and ADC
  * distances have known zeros), and the accuracy gate. */
class PqOpsSpec extends SparkSpec {

  test("pq: codebook and code tables have the full (m, cid) x dim domain") {
    val cb = PqOps.pqCodebooks(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(cb.length == PqOps.M * PqOps.Ksub * PqOps.SubDim)
    assert(cb.map(c => (c._1, c._2)).distinct.length == PqOps.M * PqOps.Ksub)
    val codes = PqOps.pqEncode(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every vector carries exactly M codes, each in [0, Ksub)
    assert(codes.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == (0 until PqOps.M)))
    assert(codes.forall(c => c._3 >= 0 && c._3 < PqOps.Ksub))
  }

  /** 24 vectors over 2 exact patterns per subspace: seeds 0..15 cover
    * all 4-bit pattern combinations, 16..23 repeat seed (i-16)'s
    * combination. Every sub-cluster is a set of IDENTICAL points, so
    * centroids equal the patterns, quantization error is zero, and ADC
    * distance between same-pattern vectors is exactly 0. */
  private lazy val plantedPqDir: String = {
    import spark.implicits._
    def sub(bit: Int): Seq[Float] =
      Seq.fill(PqOps.SubDim)(if (bit == 0) 0.1f else 0.9f)
    def vecOf(i: Int): Seq[Float] =
      (0 until PqOps.M).flatMap(m => sub((i >> m) & 1))
    val rows = (0 until 24).map(i => (i.toLong, vecOf(i % 16), i % 10))
    val dir = tempDir("planted_pq")
    rows.toDF("vec_id", "embedding", "label")
      .repartition(3).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("pq planted: identical sub-patterns share codes and ADC distance 0") {
    val codes = PqOps.pqEncode(spark, plantedPqDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    // vector 16 repeats vector 0's patterns, 21 repeats 5's: same codes
    for (m <- 0 until PqOps.M) {
      assert(codes((16L, m)) == codes((0L, m)))
      assert(codes((21L, m)) == codes((5L, m)))
    }
    // with zero quantization error, ADC distance is 0 exactly for
    // same-pattern pairs and > 0 otherwise
    val topk = PqOps.topkPq(spark, plantedPqDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val zeroOf = topk.filter(_._3 == 0L).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(zeroOf(0L) == Set(0L, 16L))
    assert(zeroOf(5L) == Set(5L, 21L))
    // cross-pattern distances differ in >= 1 subspace: strictly positive
    assert(topk.filter(t => t._1 == 0L && !zeroOf(0L).contains(t._2)).forall(_._3 > 0L))
  }

  test("pq: ADC recall@10 against exact scaled-L2 clears the gate floor with margin") {
    val pq = PqOps.topkPq(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // exact scaled-L2 top-10 via the same integer currency
    val exact = exactTopkPairs(Sf0001)
    val recallPpm = pq.intersect(exact).size.toLong * 1000000L / exact.size
    info(s"PQ ADC recall@10 = ${recallPpm / 10000.0}%")
    assert(recallPpm >= PqOps.PqRecallFloorPpm,
      s"measured $recallPpm ppm under floor ${PqOps.PqRecallFloorPpm}")
    // and the served gate row agrees
    val gate = PqOps.pqRecallGate(spark, Sf0001).collect()(0)
    assert(gate.getInt(0) == 10 && gate.getInt(1) == 10 && gate.getBoolean(2))
  }

  test("ivf-pq: probed ranking is ADC-consistent with the unprobed ranking and clears its floor") {
    val ivf = PqOps.ivfPqTopk(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // shape: K ranked rows per query (nprobe 3 of 8 cells leaves ≥ K
    // candidates on this store), ranks dense from 1, distances ascend
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      val s = rows.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length) && s.length == 10)
      assert(s.sliding(2).forall {
        case Array(a, b) => a._4 < b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      })
    }
    // the ADC distance of a pair is probe-independent: pairs served by
    // both rankings carry the identical integer distance
    val full = PqOps.topkPq(spark, Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val shared = ivf.filter(t => full.contains((t._1, t._3)))
    assert(shared.nonEmpty)
    shared.foreach(t => assert(full((t._1, t._3)) == t._4))
    // measured end-to-end recall vs exact scaled-L2, then the served gate
    val served = ivf.map(t => (t._1, t._3)).toSet
    val exact = exactTopkPairs(Sf0001)
    val recallPpm = served.intersect(exact).size.toLong * 1000000L / exact.size
    info(s"IVF-PQ (nprobe ${PqOps.NProbe}/8) recall@10 = ${recallPpm / 10000.0}%")
    assert(recallPpm >= PqOps.IvfPqRecallFloorPpm)
    val gate = PqOps.ivfPqRecallGate(spark, Sf0001).collect()(0)
    assert(gate.getInt(0) == 10 && gate.getInt(1) == 10 && gate.getBoolean(2))
  }

  test("pq index: probe-from-index equals retrain-inline row-for-row") {
    val inline = PqOps.topkPq(spark, Sf0001).collect().toSeq
    val probed = PqOps.topkPqIndexed(spark, Sf0001).collect().toSeq
    assert(inline == probed)
    // second probe serves the already-built index (idempotent ensure)
    val again = PqOps.topkPqIndexed(spark, Sf0001).collect().toSeq
    assert(again == probed)
  }

  /** Exact scaled-L2 top-10 pair set — the accuracy anchor both recall
    * measurements in this suite compare against. */
  private def exactTopkPairs(dir: String): Set[(Long, Long)] = {
    val scaled = graft.ops.Tables.parallel(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 100000).cast("long")).as("fv"))
    val q = scaled.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("fv").as("qv"))
    scaled.join(broadcast(q))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        aggregate(zip_with(col("fv"), col("qv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d"), col("neighbor_id"))))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }
}
