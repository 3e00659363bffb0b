package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-up fixture generator: deterministically tiles an existing
  * test-data directory FACTOR× so the headline plans can be measured at
  * 10× the bench SF (the round-11 verdict's "scale-out proof" demand —
  * every 'survives 100×' claim was argued from plan shape but measured
  * only at sf0.1).
  *
  * The tiling preserves per-replica STRUCTURE and cross-replica
  * INDEPENDENCE, so operator output densities stay constant and a
  * linear-time plan should cost ≈ FACTOR×:
  *  - TPC-H entity keys shift by a replica stride above the source max
  *    (FK relations hold within each replica); nation/region stay fixed
  *    (dimension tables don't grow with SF).
  *  - documents: every token gets a replica suffix (r ≥ 1), so replicas
  *    share ZERO shingles — near-dup/pair density per replica is
  *    unchanged instead of every doc gaining 9 exact clones (which
  *    would quadratically inflate dedup outputs and measure output
  *    explosion, not plan scaling). Sources keep their names: each
  *    source grows 10×, exactly the skew the packing/window de-skews
  *    must absorb.
  *  - embeddings: a replica-specific md5-derived ±1 sign mask flips
  *    half the dimensions — an ISOMETRY within the replica (distances
  *    and cosines exactly preserved) while cross-replica cosines of
  *    identical vectors land near 0, keeping ANN neighbor densities
  *    constant.
  *  - events keep their time window (more events per hour, like the
  *    driver's own SF scaling) with user/event ids strided.
  *
  * Usage: runMain graft.tools.GenScaledData [srcDir] [outDir] [factor]
  * (defaults /root/testdata/sf0.1 → target/sf1 ×10).
  */
object GenScaledData {

  private def replicaSigns(r: Int, dims: Int): Seq[Float] = {
    if (r == 0) Seq.fill(dims)(1.0f)
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until dims).map { i =>
        val hex = md.digest(s"sf1:$r:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0f else -1.0f
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession.get("graft-gen-scaled")
    import spark.implicits._

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // many output files per table: a 100 TB table is NEVER one file, and
    // a single-file fixture serializes every narrow plan onto one core —
    // the first sf1 validation run measured the fixture, not the engine
    // (x_text_winnow sat on one interpreted-eval task for 30+ minutes)
    def write(df: DataFrame, name: String): Unit = {
      val parts = if (Seq("region", "nation").contains(name)) 1 else 32
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // replica index as a small crossJoin fan-out (runs distributed)
    val reps = (0 until factor).toDF("__r")
    // repartition the SOURCE before the fan-out: the sf0.1 parquet files
    // are single-digit MB = ONE input split, so without this the whole
    // factor× row generation runs as a single task (the factor-1000
    // lineitem tile sat on one core for 35+ minutes writing nothing);
    // spread across 32 tasks the same tile is I/O-bound, not core-bound
    def tiled(df: DataFrame): DataFrame =
      df.repartition(32).crossJoin(broadcast(reps))
    def strided(c: String, stride: Long) =
      (col(c) + col("__r") * stride).as(c)

    // key strides: round decimal powers above each source max, so
    // replica key ranges never collide and stay human-readable
    val OrderS = 1000000L; val CustS = 100000L; val SuppS = 10000L
    val PartS = 100000L; val DocS = 10000000L; val VecS = 10000000L
    val EventS = 1000000L; val UserS = 10000L

    // dimension tables pass through unchanged (like TPC-H, they don't
    // scale with SF)
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    write(tiled(tbl("customer")).select(
      strided("c_custkey", CustS), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer")
    write(tiled(tbl("supplier")).select(
      strided("s_suppkey", SuppS), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), "supplier")
    write(tiled(tbl("part")).select(
      strided("p_partkey", PartS), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")), "part")
    write(tiled(tbl("orders")).select(
      strided("o_orderkey", OrderS), strided("o_custkey", CustS),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")
    write(tiled(tbl("lineitem")).select(
      strided("l_orderkey", OrderS), strided("l_partkey", PartS),
      strided("l_suppkey", SuppS), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem")
    write(tiled(tbl("events")).select(
      strided("event_id", EventS), col("ts"), strided("user_id", UserS),
      col("event_type"), col("value"), col("props")), "events")

    // documents: replica-suffixed tokens (r >= 1) → zero shared
    // shingles across replicas; n_chars recomputed to stay truthful
    val docText = when(col("__r") === 0, col("text"))
      .otherwise(array_join(transform(split(col("text"), " "),
        t => concat(t, col("__r").cast(StringType))), " "))
    write(tiled(tbl("documents")).select(
      strided("doc_id", DocS),
      docText.as("text"), col("lang"), col("source"),
      length(docText).cast(LongType).as("n_chars")), "documents")

    // embeddings: per-replica ±1 sign mask (isometry inside a replica,
    // ~orthogonal across replicas)
    val dims = tbl("embeddings").select(size(col("embedding")))
      .first().getInt(0)
    val signLits = (0 until factor).map(r =>
      typedLit(replicaSigns(r, dims)))
    val signsByR = element_at(array(signLits: _*), col("__r") + 1)
    write(tiled(tbl("embeddings")).select(
      strided("vec_id", VecS),
      zip_with(col("embedding"), signsByR, (x, s) => x * s).as("embedding"),
      col("label")), "embeddings")

    spark.stop()
  }
}
