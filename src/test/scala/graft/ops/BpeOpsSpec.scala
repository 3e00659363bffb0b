package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer semantics on a planted corpus with hand-computable merge
  * order (the hug/pug/pun/bun/hugs fixture), plus encode/compression
  * invariants on real test data. */
class BpeOpsSpec extends SparkSpec {

  /** Word frequencies hug:10 pug:5 pun:12 bun:4 hugs:5 →
    * pair freqs (u,g):20 (p,u):17 (u,n):16 (h,u):15 (g,s):5 (b,u):4.
    * Merge 1 must be (u,g); after it (p,u) drops to 12 (pug now p·ug),
    * so merge 2 is (u,n) 16, merge 3 (h,ug) 15, and with pun now p·un
    * merge 4 is (p,un) 12. */
  private lazy val bpeDir: String = {
    import spark.implicits._
    val words =
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val docs = Seq((0L, words.mkString(" "), "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("bpe_docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pair stats: weighted adjacent char-pair frequencies are exact") {
    val p = BpeOps.pairStats(spark, bpeDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(p(("u", "g")) == 20L) // hug 10 + pug 5 + hugs 5
    assert(p(("p", "u")) == 17L) // pug 5 + pun 12
    assert(p(("u", "n")) == 16L)
    assert(p(("h", "u")) == 15L)
    assert(p(("g", "s")) == 5L)
    assert(p(("b", "u")) == 4L)
    assert(p.size == 6)
  }

  test("trainer learns the hand-computed merge sequence with exact pair counts") {
    val m = BpeOps.trainMerges(spark, bpeDir, nMerges = 4)
    assert(m.map(x => (x.l, x.r, x.pairFreq)) == Seq(
      ("u", "g", 20L), ("u", "n", 16L), ("h", "ug", 15L), ("p", "un", 12L)))
    assert(m.map(_.rank) == Seq(1, 2, 3, 4))
  }

  test("training is deterministic across runs") {
    assert(BpeOps.trainMerges(spark, bpeDir, 4) == BpeOps.trainMerges(spark, bpeDir, 4))
  }

  test("encode: zero merges = char count; each planted merge shrinks known words") {
    val zero = BpeOps.encodeCounts(spark, bpeDir, Nil).collect()(0)
    // 10*3 + 5*3 + 12*3 + 4*3 + 5*4 = 113 chars
    assert(zero.getLong(1) == 113L && zero.getLong(2) == 113L)
    val four = BpeOps.encodeCounts(spark, bpeDir,
      BpeOps.trainMerges(spark, bpeDir, 4)).collect()(0)
    // hug→[hug]:1, hugs→[hug,s]:2, pug→[p,ug]:2, pun→[pun]:1, bun→[b,un]:2
    assert(four.getLong(2) == 10 * 1 + 5 * 2 + 5 * 2 + 12 * 1 + 4 * 2)
  }

  test("greedy fold application handles overlapping repeats like the scan form") {
    import spark.implicits._
    val df = Seq((0L, "aaaa aaa", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("bpe_aa")
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val enc = BpeOps.encodeCounts(spark, dir,
      Seq(BpeOps.Merge(1, "a", "a", 0L))).collect()(0)
    // aaaa → [aa][aa] = 2; aaa → [aa][a] = 2
    assert(enc.getLong(1) == 7L && enc.getLong(2) == 4L)
  }

  test("compression gate passes on the real corpus and no document grows") {
    val g = BpeOps.compressionGate(spark, Sf0001).collect()(0)
    assert(g.getBoolean(1))
    val e = BpeOps.encode(spark, Sf0001)
    assert(e.filter(col("n_bpe_tokens") > col("n_char_tokens")).count() == 0)
    assert(e.filter(col("n_bpe_tokens") <= 0).count() == 0)
  }

  test("encode gate: every word round-trips byte-identically through the trained merges") {
    val g = BpeOps.encodeGate(spark, Sf0001).collect()(0)
    assert(g.getBoolean(1), s"round-trip failed: $g")
    assert(g.getLong(0) > 0L)
  }
}
