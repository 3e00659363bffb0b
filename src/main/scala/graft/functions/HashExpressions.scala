package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup/similarity hot paths.
  *
  * Why custom: Spark's higher-order functions (transform/aggregate/
  * zip_with) evaluate their lambda per element, interpreted and boxed —
  * a MinHash signature via `transform` costs ~64 × |shingles| closure
  * invocations per document. Each expression below does the same math in
  * one `eval` call per row with tight primitive JVM loops (the loop body
  * JIT-compiles), which is the recommended escalation path when
  * `functions._` can't express the kernel: native Expression > UDF.
  * CodegenFallback only affects the per-ROW call boundary — negligible
  * next to the per-element work these kernels absorb.
  *
  * All hashing is seed-fixed and engine-internal (no SQL oracle);
  * determinism is pinned by the unit suite.
  */
object Mix {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a over bytes + splitmix finalizer. */
  def hashUtf8(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < b.length) { h ^= b(i); h *= 0x100000001B3L; i += 1 }
    mix64(h)
  }

  /** Sorted-distinct copy of a long buffer prefix. */
  def sortedDistinct(buf: Array[Long], len: Int): Array[Long] = {
    java.util.Arrays.sort(buf, 0, len)
    var out = 0
    var i = 0
    while (i < len) {
      if (out == 0 || buf(i) != buf(out - 1)) { buf(out) = buf(i); out += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(buf, out)
  }
}

private[functions] trait LongArrayResult { self: Expression =>
  final val resultType: DataType = ArrayType(LongType, containsNull = false)
}

/** Analysis-time input typing: every eval path below reads its inputs
  * with `asInstanceOf` (ArrayData element accessors, primitive casts), so
  * a wrong argument type arriving from the SQL-string surface must be
  * rejected at analysis with a readable message — not explode with a
  * per-row ClassCastException mid-query. Struct-array inputs (posting
  * lists, buckets) are excluded: their field NAMES vary by construction
  * site, so they stay structurally checked by eval. */
private[functions] trait StrictInputs { self: Expression =>
  /** (argument description, expected type) per child, in child order. */
  protected def expectedInputs: Seq[(String, DataType)]
  private def matches(actual: DataType, expected: DataType): Boolean =
    (actual, expected) match {
      case (ArrayType(a, _), ArrayType(b, _)) => matches(a, b)
      case (a, b) => a == b // nullability-insensitive for the array case above
    }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    children.zip(expectedInputs).find { case (c, (_, t)) => !matches(c.dataType, t) } match {
      case Some((c, (what, t))) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$what must be ${t.sql}, got ${c.dataType.sql}")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
}

/** array<string> tokens → sorted-distinct array<long> of token hashes. */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback with LongArrayResult with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("token_hashes tokens", ArrayType(StringType)))
  override def dataType: DataType = resultType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new Array[Long](n)
    var i = 0
    var len = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        buf(len) = Mix.hashUtf8(arr.getUTF8String(i)); len += 1
      }
      i += 1
    }
    new GenericArrayData(Mix.sortedDistinct(buf, len))
  }
  override protected def withNewChildInternal(c: Expression): TokenHashes = copy(c)
}

/** array<string> tokens → sorted-distinct array<long> of k-token shingle
  * hashes (combined from per-token hashes — shingle strings are never
  * materialized). Documents shorter than k hash their full token list. */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with LongArrayResult with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("shingle_hashes tokens", ArrayType(StringType)))
  require(k >= 1)
  override def dataType: DataType = resultType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 0L else Mix.hashUtf8(arr.getUTF8String(i))
      i += 1
    }
    val m = math.max(1, n - k + 1)
    val buf = new Array[Long](m)
    var s = 0
    while (s < m) {
      var h = 0x9E3779B97F4A7C15L
      var j = s
      val end = math.min(n, s + k)
      while (j < end) { h = Mix.mix64(h ^ th(j)); j += 1 }
      buf(s) = h
      s += 1
    }
    new GenericArrayData(Mix.sortedDistinct(buf, m))
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(c)
}

/** array<long> element hashes → array<long> MinHash signature of length k:
  * sig[i] = min over h of mix64(h ^ seed_i). One pass, k×n integer mixes. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback with LongArrayResult with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("minhash_signature hashes", ArrayType(LongType)))
  require(k >= 1)
  private lazy val seeds: Array[Long] = Array.tabulate(k)(i => Mix.mix64(0x5EED0000L + i))
  override def dataType: DataType = resultType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val v = Mix.mix64(h ^ seeds(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
}

/** array<long> signature → array<long> of per-chunk hashes (LSH bands):
  * band b = mix-combine of elements [b*chunk, (b+1)*chunk). */
case class ChunkHashes(child: Expression, chunk: Int)
    extends UnaryExpression with CodegenFallback with LongArrayResult with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("chunk_hashes signature", ArrayType(LongType)))
  require(chunk >= 1)
  override def dataType: DataType = resultType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bands = n / chunk
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xC0FFEEL + b
      var j = b * chunk
      val end = j + chunk
      while (j < end) { h = Mix.mix64(h ^ arr.getLong(j)); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): ChunkHashes = copy(c)
}

/** array<long> element hashes → 64-bit SimHash: bit b set iff more
  * elements have bit b set than clear. One pass, n×64 adds. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("simhash64 hashes", ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      j += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sim |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sim)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** array<struct<doc_id:long, n:int>> posting list → array of all
  * unordered pairs struct<doc_a,na,doc_b,nb> with doc_a < doc_b, built in
  * one tight loop (the equivalent nested transform/slice SQL allocates
  * O(d²) array copies, interpreted per element). */
case class PostingListPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("na", IntegerType, nullable = false),
      StructField("doc_b", LongType, nullable = false),
      StructField("nb", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val ns = new Array[Int](d)
    var i = 0
    while (i < d) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0); ns(i) = row.getInt(1)
      i += 1
    }
    val out = new Array[Any](d * (d - 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        out(k) =
          if (ids(i) < ids(j))
            org.apache.spark.sql.catalyst.InternalRow(ids(i), ns(i), ids(j), ns(j))
          else
            org.apache.spark.sql.catalyst.InternalRow(ids(j), ns(j), ids(i), ns(i))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PostingListPairs = copy(c)
}

/** PPJoin candidate expansion with in-loop filtering (Xiao et al., WWW'08
  * §3): array<struct<doc_id:long, n:int, pos:int>> posting list of a
  * PREFIX-index shingle (pos = the shingle's 1-based position in the
  * doc's sorted shingle set) → array<struct<doc_a,doc_b>> of candidate
  * pairs for Jaccard ≥ num/den, applying BOTH
  *  - the length filter: den·min(na,nb) ≥ num·max(na,nb), and
  *  - the positional overlap upper bound: a qualifying pair needs
  *    c ≥ α = ⌈num·(na+nb)/(num+den)⌉ common shingles, and at a common
  *    shingle sitting at positions (pa, pb) at most min(pa−1, pb−1)
  *    common shingles can precede it and at most min(na−pa+1, nb−pb+1)
  *    can follow (sets are sorted) — so pairs with
  *    min(pa−1,pb−1) + min(na−pa+1,nb−pb+1) < α are pruned.
  * The bound holds at EVERY common shingle of a qualifying pair, so
  * pruning per posting list never loses a pair that another list would
  * keep — downstream `distinct` semantics (and recall) are exact.
  * Filtering inside the loop means pruned pairs are never materialized:
  * at threshold 1/2 this cuts candidate volume ~3–4× on top of the
  * prefix filter, before the distinct-pairs shuffle. */
case class PrefixCandidatePairs(child: Expression, num: Int, den: Int)
    extends UnaryExpression with CodegenFallback {
  require(num >= 1 && den > num, s"threshold must be in (0,1): $num/$den")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val ns = new Array[Int](d)
    val ps = new Array[Int](d)
    var i = 0
    while (i < d) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0); ns(i) = row.getInt(1); ps(i) = row.getInt(2)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](d)
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        val na = ns(i); val nb = ns(j)
        val mn = math.min(na, nb); val mx = math.max(na, nb)
        if (den.toLong * mn >= num.toLong * mx) {
          val alpha = (num.toLong * (na + nb) + num + den - 1) / (num + den)
          val pa = ps(i); val pb = ps(j)
          val ubound = math.min(pa - 1, pb - 1).toLong +
            math.min(na - pa + 1, nb - pb + 1).toLong
          if (ubound >= alpha) {
            out += (if (ids(i) < ids(j))
              org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j))
            else
              org.apache.spark.sql.catalyst.InternalRow(ids(j), ids(i)))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): PrefixCandidatePairs = copy(c)
}

/** Candidate expansion for the ASYMMETRIC containment test
  * |A ∩ B| / |A| ≥ num/den (A the contained doc) — the subset-duplicate
  * relation Jaccard misses: a snippet quoted whole inside a much larger
  * document has tiny Jaccard but containment ≈ 1. Input is the FULL
  * posting list of one shingle, array<struct<doc_id:long, n:int, pos:int>>
  * (pos = the shingle's 1-based position in the doc's sorted shingle
  * set); output is array<struct<doc_a,doc_b>> of DIRECTIONAL candidates
  * (doc_a = contained side). Pruning, all inside the loop so rejected
  * pairs never materialize:
  *  - prefix filter on the CONTAINED side only: a qualifying A shares
  *    ≥ α = ⌈num·n_a/den⌉ shingles with B, so among A's first
  *    n_a − α + 1 sorted shingles at least one is common — a pair is
  *    kept only where this shingle sits inside A's containment prefix.
  *    The container side has no prefix condition (its size is
  *    unconstrained — that is the asymmetry).
  *  - length filter: n_b ≥ α (B cannot hold α common shingles otherwise).
  *  - positional upper bound (the PPJoin argument, containment form):
  *    at a common shingle at (pa, pb), commons ≤ min(pa−1, pb−1) + 1 +
  *    min(n_a−pa, n_b−pb); prune when that bound < α. The bound holds at
  *    EVERY common shingle of a qualifying pair, so per-list pruning
  *    never loses a pair globally — recall is exact.
  * Both orientations of every (i, j) are tested: exact duplicates emit
  * both directions, true subsets only one. */
case class ContainmentCandidatePairs(child: Expression, num: Int, den: Int)
    extends UnaryExpression with CodegenFallback {
  require(num >= 1 && den >= num, s"threshold must be in (0,1]: $num/$den")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val ns = new Array[Int](d)
    val ps = new Array[Int](d)
    var i = 0
    while (i < d) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0); ns(i) = row.getInt(1); ps(i) = row.getInt(2)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](d)
    // directional test: can doc a (index ai) be contained in doc b (bi)?
    def consider(ai: Int, bi: Int): Unit = {
      val na = ns(ai); val nb = ns(bi)
      val alpha = (num.toLong * na + den - 1) / den
      val pa = ps(ai); val pb = ps(bi)
      if (nb >= alpha && pa <= na - alpha + 1) {
        val ubound = math.min(pa - 1, pb - 1).toLong + 1L +
          math.min(na - pa, nb - pb).toLong
        if (ubound >= alpha)
          out += org.apache.spark.sql.catalyst.InternalRow(ids(ai), ids(bi))
      }
    }
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        consider(i, j); consider(j, i)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): ContainmentCandidatePairs = copy(c)
}

/** Jaccard of two SORTED long arrays (as produced by TokenHashes /
  * ShingleHashes) via linear merge — one pass, no hashing, no boxing.
  * Returns struct(n_common, n_union). */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("sorted_jaccard left", ArrayType(LongType)),
      ("sorted_jaccard right", ArrayType(LongType)))
  override def dataType: DataType = StructType(Seq(
    StructField("n_common", IntegerType, nullable = false),
    StructField("n_union", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(common, na + nb - common)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard =
    copy(left = l, right = r)
}

/** (array<struct<doc_id:long, simhash:long>> bucket, chunk id) → array of
  * pairs struct<doc_a,doc_b,hamming> with doc_a < doc_b and hamming ≤ max.
  * The Hamming filter runs inside the expansion loop (popcount of xor),
  * so only matching pairs are ever materialized — and each pair is
  * emitted ONLY from the FIRST chunk on which its two signatures agree
  * (decidable locally from the two signatures), so the global pair set is
  * duplicate-free by construction: no cross-bucket dropDuplicates shuffle
  * is needed afterwards. A clustered bucket of size d costs d²/2
  * popcounts but emits only true, unique neighbors. */
case class SimHashPairs(left: Expression, right: Expression, maxHamming: Int)
    extends BinaryExpression with CodegenFallback {
  // Pigeonhole precondition: 4 chunks of 16 bits can only guarantee an
  // agreeing chunk for pairs within Hamming distance 3. At maxHamming ≥ 4
  // a pair may agree on NO chunk, and the first-agreeing-chunk ownership
  // rule would have no owner (and an unbounded scan would spin forever on
  // the Long shift wrap x >>> 64 == x). Enforced here, and the scan below
  // is bounded to 4 regardless.
  require(maxHamming >= 0 && maxHamming < 4,
    s"SimHashPairs: 4-chunk pigeonhole banding requires 0 <= maxHamming <= 3, got $maxHamming")
  // the chunk id is read with asInstanceOf[Int] — reject a BIGINT (or
  // anything else) at analysis time instead of a per-row ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_pairs chunk id must be INT, got ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(ms: Any, chunk: Any): Any = {
    val arr = ms.asInstanceOf[ArrayData]
    val chunkId = chunk.asInstanceOf[Int]
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val sigs = new Array[Long](d)
    var i = 0
    while (i < d) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0); sigs(i) = row.getLong(1)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) {
        val x = sigs(i) ^ sigs(j)
        val h = java.lang.Long.bitCount(x)
        if (h <= maxHamming) {
          // first 16-bit chunk where the signatures agree — the one
          // bucket allowed to emit this pair (bounded scan; first == 4
          // would mean no agreeing chunk and emits nowhere)
          var first = 0
          while (first < 4 && (x >>> (first * 16) & 0xFFFFL) != 0L) first += 1
          if (first == chunkId) {
            out += (if (ids(i) < ids(j))
              org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), h)
            else
              org.apache.spark.sql.catalyst.InternalRow(ids(j), ids(i), h))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashPairs =
    copy(left = l, right = r)
}

/** (array<struct<doc_id:long, hs:array<long>, bhs:array<long>>> LSH
  * bucket, band id) → array of VERIFIED near-dup pairs
  * struct<doc_a,doc_b,jaccard> with doc_a < doc_b and
  * jaccard ≥ thresholdNum/thresholdDen.
  *
  * Pair expansion and the sorted-merge Jaccard verification run inside
  * one eval: the hash arrays are read in place (no per-pair struct/array
  * copies — the equivalent nested transform/slice SQL allocates O(d²) of
  * them, interpreted), and only passing pairs are ever materialized, so
  * the downstream shuffle carries ids + one double. Threshold test is
  * integer (common·den ≥ union·num) — no float boundary.
  *
  * Ownership rule (the SimHashPairs trick): each member row carries its
  * full band-hash vector `bhs`, so "does any band BEFORE this one also
  * put these two docs in a shared bucket?" is locally decidable — a pair
  * is emitted only by the FIRST band on which its two band-hash vectors
  * agree. The global pair set is therefore duplicate-free by
  * construction: no cross-bucket dropDuplicates shuffle, and each
  * candidate pair pays the O(|hs|) verification merge exactly once
  * instead of once per agreeing band. The ownership scan runs BEFORE the
  * verification merge and costs at most `band` long-compares.
  *
  * Cap interaction (documented approximation, same as SimHashPairs): if
  * the first-agreeing band's bucket was dropped by the bucket-size cap,
  * the pair is not emitted anywhere — even when a later agreeing band's
  * bucket survives — because ownership is decided from the signatures
  * alone, not from which buckets survived. Recall loss is therefore
  * bounded by the capped buckets (observable via the `lsh_bucket_cap`
  * metric: loss is possible only when dropped_hot_buckets > 0); a key
  * that hot is near-contentless boilerplate, which is what the df-cap
  * approximation deliberately discards. */
case class MinHashBucketPairs(left: Expression, right: Expression,
    thresholdNum: Int, thresholdDen: Int)
    extends BinaryExpression with CodegenFallback {
  require(thresholdNum >= 0 && thresholdDen >= 1)
  // the band id is read with asInstanceOf[Int] — reject a BIGINT (or
  // anything else) at analysis time instead of a per-row ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_bucket_pairs band id must be INT, got ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("doc_a", LongType, nullable = false),
      StructField("doc_b", LongType, nullable = false),
      StructField("jaccard", DoubleType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(ms: Any, band: Any): Any = {
    val arr = ms.asInstanceOf[ArrayData]
    val bandId = band.asInstanceOf[Int]
    val d = arr.numElements()
    val ids = new Array[Long](d)
    val hss = new Array[ArrayData](d)
    val bhss = new Array[ArrayData](d)
    var i = 0
    while (i < d) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0); hss(i) = row.getArray(1); bhss(i) = row.getArray(2)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < d) {
      val a = hss(i)
      val na = a.numElements()
      val ba = bhss(i)
      var j = i + 1
      while (j < d) {
        // ownership first (cheap): skip unless this is the pair's first
        // agreeing band — both docs are in this bucket, so band `bandId`
        // is known to agree; any earlier agreement disowns the pair here
        val bb = bhss(j)
        var earlier = false
        var b = 0
        while (!earlier && b < bandId) {
          if (ba.getLong(b) == bb.getLong(b)) earlier = true
          b += 1
        }
        if (!earlier) {
          val c = hss(j)
          val nb = c.numElements()
          var p = 0; var q = 0; var common = 0
          while (p < na && q < nb) {
            val x = a.getLong(p); val y = c.getLong(q)
            if (x == y) { common += 1; p += 1; q += 1 }
            else if (x < y) p += 1
            else q += 1
          }
          val union = na + nb - common
          if (common.toLong * thresholdDen >= union.toLong * thresholdNum && union > 0) {
            val jac = common.toDouble / union
            out += (if (ids(i) < ids(j))
              org.apache.spark.sql.catalyst.InternalRow(ids(i), ids(j), jac)
            else
              org.apache.spark.sql.catalyst.InternalRow(ids(j), ids(i), jac))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashBucketPairs =
    copy(left = l, right = r)
}

/** Cosine similarity of two array<double> in one pass — dot, |a|², |b|²
  * accumulated left-to-right, result dot/(√|a|²·√|b|²): bit-identical to
  * the equivalent fold-based SQL (and to DuckDB's list_cosine_similarity),
  * so it can sit under oracle-checked queries.
  *
  * Fully code-generated (no CodegenFallback): this kernel runs
  * |corpus| × |queries| times under the brute-force top-k scan, and real
  * codegen keeps the whole stage — scan, join, this kernel, the window's
  * input — in one generated loop with no InternalRow boxing at the call
  * boundary. The generated code calls the static `compute` below (same
  * JIT-compiled tight loop the interpreted path uses). */
object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with StrictInputs {
  override protected def expectedInputs: Seq[(String, DataType)] =
    Seq(("cosine_similarity left", ArrayType(DoubleType)),
      ("cosine_similarity right", ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(
      CosineSimilarity.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSimilarity.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Column-API wrappers. */
object exprs {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def token_hashes(tokens: Column): Column = c(TokenHashes(e(tokens)))
  def shingle_hashes(tokens: Column, k: Int): Column = c(ShingleHashes(e(tokens), k))
  def minhash_signature(hashes: Column, k: Int): Column = c(MinHashSignature(e(hashes), k))
  def chunk_hashes(sig: Column, chunk: Int): Column = c(ChunkHashes(e(sig), chunk))
  def simhash64(hashes: Column): Column = c(SimHash64(e(hashes)))
  def posting_list_pairs(ds: Column): Column = c(PostingListPairs(e(ds)))
  def prefix_candidate_pairs(ds: Column, num: Int, den: Int): Column =
    c(PrefixCandidatePairs(e(ds), num, den))
  def containment_candidate_pairs(ds: Column, num: Int, den: Int): Column =
    c(ContainmentCandidatePairs(e(ds), num, den))
  def simhash_pairs(ms: Column, chunk: Column, maxHamming: Int): Column =
    c(SimHashPairs(e(ms), e(chunk), maxHamming))
  def minhash_bucket_pairs(ms: Column, band: Column, num: Int, den: Int): Column =
    c(MinHashBucketPairs(e(ms), e(band), num, den))
  def sorted_jaccard(a: Column, b: Column): Column = c(SortedJaccard(e(a), e(b)))
  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
}
