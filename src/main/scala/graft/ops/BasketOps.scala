package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Market-basket affinity over the order/lineitem fact: which parts are
  * co-purchased, with the standard association-rule statistics (pair
  * support count, per-item supports, lift). The reference has no
  * analytics of this family; it belongs to the warehouse-completeness
  * surface next to the TPC-H shapes.
  *
  * Scale shape: the pair generator is a SELF-JOIN ON THE ORDER KEY —
  * co-partitioned on the join key, and the per-order fan-out is bounded
  * by (max order size choose 2) (TPC-H orders hold ≤ 7 lines, so ≤ 21
  * pairs per order; a retail basket cap plays the MaxBucket role on
  * real data). Pair counts hash-aggregate with map-side combine; item
  * supports are a second keyed aggregate joined back onto the pairs
  * (keyed joins, broadcastable when the item dimension is small). The
  * only scalar on the driver is the order count. Lift is a single
  * IEEE division of exact int64 products (n ≤ 2^53), so the double
  * hashes identically in both engines. */
object BasketOps {

  val TopPairs = 50

  def basketAffinity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = li.select(col("l_orderkey")).distinct().count()
    val pc = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val pairs = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(pc.select(col("l_partkey").as("part_a"), col("c").as("c_a")), Seq("part_a"))
      .join(pc.select(col("l_partkey").as("part_b"), col("c").as("c_b")), Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab") * lit(nOrders)).cast(DoubleType) / (col("c_a") * col("c_b")))
          .as("lift"))
      .orderBy(col("c_ab").desc, col("part_a"), col("part_b"))
      .limit(TopPairs)
  }

  /** Item-to-item recommendations ("customers also bought"): for every
    * part, its [[RecK]] strongest co-purchase partners by pair count
    * (ties to the lowest partner id). Ranking goes through the bounded
    * [[graft.functions.TopKPairsAggregator]] — k rows per part per
    * partition cross the exchange, never a part's full partner list, and
    * never a row_number window over |parts| (the guarded anti-pattern).
    * Counts ≤ |orders| ≪ 2^53, so the double ride through the pair
    * aggregator is exact. */
  val RecK = 3

  def alsoBought(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val counts = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part"), col("b.l_partkey").as("rec"))
      .agg(count(lit(1)).as("together"))
    val topk = udaf(graft.functions.TopKPairsAggregator(RecK))
    counts.groupBy(col("part"))
      .agg(topk(col("together").cast(DoubleType), col("rec")).as("top"))
      .select(col("part"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("part"), (col("pos") + 1).cast(IntegerType).as("rank"),
        col("p.neighborId").as("rec"), col("p.cos").cast(LongType).as("together"))
      .orderBy("part", "rank")
  }
}
