package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StructField, StructType, TimestampType}

/** Join operators. The reference has no joins (SURVEY.md §2, "What the
  * reference does NOT have"), but a complete analytics engine over its
  * warehouse schema needs them; these are the star-schema shapes its
  * fact/aggregate tables invite.
  *
  * Scale strategy (100 TB): dimension tables (region/nation/customer at
  * warehouse scale) are broadcast — no shuffle of the fact side; fact-fact
  * joins shuffle on the join key and rely on AQE for skew splitting. Each
  * join is immediately followed by a reducing aggregate so the shuffle
  * width stays |groups|, not |rows|.
  */
object JoinOps {

  /** Broadcast dimension join: orders ⋈ customer → revenue per market
    * segment. BroadcastHashJoinExec: the fact scan never shuffles. */
  def j1BroadcastDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sumExact(col("o_totalprice")).as("total_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** Fact-fact shuffle join: lineitem ⋈ orders on orderkey → revenue per
    * order priority. Both sides hash-partition on the key; AQE coalesces
    * post-shuffle partitions and splits skewed ones. */
  def j2FactJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue
    * by nation (TPC-H Q5 shape). Dims broadcast; only the li⋈orders edge
    * shuffles. */
  def j3StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    // Revenue rolls up per CUSTOMER before any dimension join: lineitem
    // ⋈ orders is the only fact-sized join (co-keyed shuffle, linear),
    // and the exact-decimal partial shrinks the probe into customer
    // from |lineitem| rows to ≤|customer| rows. customer is a GROWING
    // dimension (∝ SF — 1.5M rows at the sf10 fixture, billions at
    // 100 TB), so it is NOT broadcast: the r13 sf10 spot-check measured
    // the old broadcast(customer) plan at 52× per 10× data, dominated
    // by the per-task hash build of the 1.5M-row broadcast. nation and
    // region stay broadcast — they are the FIXED dims. Decimal partials
    // re-aggregate exactly (no rounding until the final double cast),
    // so the result is bit-identical to the single-level aggregate.
    val perCust = li
      .join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        sum(dec2(col("l_extendedprice")) *
          (lit(BigDecimal(1)).cast(Dec2) - dec2(col("l_discount")))).as("rev_part"),
        count(lit(1)).as("n_part"))
    perCust
      .join(customer, col("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("rev_part")).cast(DoubleType).as("revenue"),
        sum(col("n_part")).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Anti join: customers with no orders (NOT EXISTS). BroadcastHashJoin
    * (left_anti) when the subquery side is small; shuffle-hash otherwise. */
  def j4AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Semi join: parts that appear in some lineitem (EXISTS). */
  def j5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
    val li = Tables(spark, dir, "lineitem")
    part
      .join(li, part("p_partkey") === li("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q6 shape: tight-range filtered aggregate — the pushdown
    * showcase (every predicate reaches the parquet scan; row-group stats
    * skip cold months entirely at scale). */
  def q6FilteredAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  /** TPC-H Q3 shape: segment-filtered 3-way join, grouped revenue, top-10
    * by revenue. The revenue sort key is an exact decimal→double, so the
    * ordering is engine-stable; ties broken by orderkey. */
  def q3TopUnshipped(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val customer = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val li = Tables(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** J8 — FULL OUTER join: per-user error vs purchase activity, keeping
    * users present on either side only (both null-extension directions
    * exercised). Both sides pre-aggregate before the join, so the shuffle
    * carries |users|, not |events| — reduce-then-join, the cheap order. */
  def j8FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    def side(t: String, out: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(count(lit(1)).as(out))
    val e = side("error", "n_err")
    val p = side("purchase", "n_pur").withColumnRenamed("user_id", "p_user_id")
    e.join(p, col("user_id") === col("p_user_id"), "full_outer")
      .select(
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        coalesce(col("n_err"), lit(0L)).as("n_err"),
        coalesce(col("n_pur"), lit(0L)).as("n_pur"))
      .orderBy("user_id")
  }

  /** J6 — AS-OF join: each error event paired with the same user's most
    * recent purchase at or before it. Spark has no native ASOF operator;
    * rather than an inequality join (which degenerates to per-key
    * cartesian work), this uses the union+window formulation: interleave
    * both sides on one timeline, one shuffle on user_id, and carry the
    * last purchase forward with `last(..., ignoreNulls)` — O(n log n)
    * per user, no pair blowup, the standard scalable as-of plan for dense
    * timelines. Tie rule (oracle-matched): purchases sort before errors
    * at the same timestamp (at-or-before includes equality), max event_id
    * wins among same-timestamp purchases. */
  def j6AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    // unique per (user, ts): same-timestamp purchases resolve to max id,
    // the same tie rule as the DuckDB ASOF oracle's pre-aggregation
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("last_purchase_id"))
      .select(col("user_id"), col("ts").as("last_purchase_ts"), col("last_purchase_id"))
    AsofOps.asofJoin(errors, purchases, Seq("user_id"), "error_ts", "last_purchase_ts")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("last_purchase_id"), col("last_purchase_ts"))
      .orderBy("user_id", "error_id")
  }

  /** J6c — FORWARD as-of: each error enriched with the NEXT purchase
    * (earliest at-or-after) — "did the user recover", the mirror of
    * j6's "what preceded the error". Same tie rule (max event_id among
    * same-timestamp purchases), same one-shuffle union+window plan;
    * DuckDB's ASOF accepts `<=` so the oracle is native. */
  def j6cAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("next_purchase_id"))
      .select(col("user_id"), col("ts").as("next_purchase_ts"), col("next_purchase_id"))
    AsofOps.asofJoinForward(errors, purchases, Seq("user_id"), "error_ts", "next_purchase_ts")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("next_purchase_id"), col("next_purchase_ts"))
      .orderBy("user_id", "error_id")
  }

  /** J6d — NEAREST as-of: each error paired with its temporally closest
    * purchase either side (µs distances; exact ties and equal-time
    * matches resolve backward). DuckDB has no nearest ASOF — the oracle
    * composes a backward (`>=`) and a strictly-forward (`<`) ASOF join
    * and picks by epoch_us distance with the same tie rule. */
  def j6dAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("near_purchase_id"))
      .select(col("user_id"), col("ts").as("near_purchase_ts"), col("near_purchase_id"))
    AsofOps.asofJoinNearest(errors, purchases, Seq("user_id"), "error_ts", "near_purchase_ts")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("near_purchase_id"), col("near_purchase_ts"))
      .orderBy("user_id", "error_id")
  }

  /** J6b — AS-OF join carrying a MULTI-COLUMN payload with nullable
    * fields: the torn-row hazard case. `p_big_value` is null on most
    * purchase rows (value ≤ 100), so a per-column carry would back-fill
    * it from an OLDER purchase while p_id/p_ts come from the newest —
    * AsofOps carries the whole payload as one struct, so the matched
    * right row arrives intact (nulls included). Verified against DuckDB's
    * native ASOF LEFT JOIN. Winner among same-timestamp purchases is the
    * max-event_id ROW (row_number, not per-column max — same reason). */
  def j6bAsofPayload(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"),
        when(col("value") > 100, col("value")).as("p_big_value"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("p_k"))
    AsofOps.asofJoin(errors, purchases, Seq("user_id"), "error_ts", "p_ts")
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("p_ts"), col("p_id"), col("p_big_value"), col("p_k"))
      .orderBy("user_id", "error_id")
  }

  /** J7 — range (interval) join: error events matched to the same user's
    * purchases in the trailing 30 minutes. Planned as an equi-join on
    * user_id with the interval as a residual predicate — the shuffle is
    * keyed, never cartesian; per-user match work is bounded by the
    * interval width. The streaming twin (graft.streaming.IntervalJoin)
    * runs the same predicate with watermark-bounded state. */
  def j7RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    errors.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("error_ts") - expr("INTERVAL 30 MINUTES") &&
          col("purchase_ts") <= col("error_ts"))
      .select(col("user_id"), col("error_id"), col("error_ts"),
        col("purchase_id"), col("purchase_ts"))
      .orderBy("user_id", "error_id", "purchase_id")
  }

  /** J9 — bloom-pruned semi join: lineitem rows whose order is in the
    * high-value order set. The build side's keys are aggregated into a
    * serialized bloom filter (one 64 KiB row on the driver — bounded by
    * the sizing, never by |orders|), the probe side is pre-filtered with
    * the codegen'd `might_contain` kernel, and an exact semi join removes
    * the false positives.
    *
    * Scale rationale: when the filtered dim outgrows the broadcast
    * threshold, a plain semi join shuffles the FULL fact table; the bloom
    * prunes the fact to ~|matching| × (1 + fpp) rows BEFORE that shuffle,
    * so the exchange shrinks by the filter's selectivity (~10× here).
    * This is Catalyst's own runtime row-level filtering pattern, applied
    * explicitly because the build side is only selective after a
    * predicate the injection heuristics don't size. Results are exact —
    * the oracle is the plain semi join. */
  def j9BloomSemi(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions
    val hot = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
    val bloom = hot
      .agg(BloomFunctions
        .bloomFilterAgg(col("o_orderkey"), 100000L, 8L * 64 * 1024).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    Tables(spark, dir, "lineitem")
      .filter(BloomFunctions.mightContain(bloom, col("l_orderkey")))
      .join(hot, col("l_orderkey") === hot("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Skew-salted shuffle join — the fallback when BOTH join sides exceed
    * the broadcast threshold AND the key distribution is skewed (here:
    * events keyed by event_type, FIVE distinct values — a naive shuffle
    * join lands the entire fact table on five reducers). The fact side
    * gets a deterministic 16-way salt (xxhash64 of its unique id, the
    * a1SaltedAgg currency); the dim side replicates ×16 via
    * explode(sequence); the join key becomes (event_type, salt), fanning
    * each hot key across 16 partitions. Replication cost is
    * 16·|dim| — the knob trades dim duplication for reducer fan-out and
    * only pays on the keys that need it when combined with AQE skew
    * stats; here it is applied uniformly for determinism.
    *
    * The dim is derived small (per-type totals), so Spark would
    * BROADCAST it and no skew would exist — the `shuffle_hash` hint pins
    * the shuffled plan this operator exists to demonstrate (at 100 TB
    * the dim is past the broadcast threshold and the hint is the
    * planner's own choice). The salt never reaches the output; the
    * oracle is the plain unsalted join — salting is plan-level only. */
  def j10SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 16
    val fact = Tables(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)))
    val dim = Tables(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("type_n"))
      .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
    fact.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
      .groupBy(col("event_type"), col("type_n"))
      .agg(sumExact(col("value")).as("total_value"), count(lit(1)).as("n_rows"))
      .orderBy("event_type")
  }

  /** TPC-H Q1 shape (pricing summary): one filtered scan, eight aggregate
    * measures per (returnflag, linestatus) — including the three-factor
    * charge term price·(1−disc)·(1+tax). All measures run in SCALED INT64
    * (inputs are exact 2-decimal values, so ×100 + round is lossless):
    * the per-row product is ≤ ~1.2e11 and the sums stay far inside int64
    * at bench scale, giving bit-identical results in any engine and any
    * partitioning. The warehouse-scale DECIMAL(38,x) swap is served as
    * [[q1PricingSummaryDecimal]] (same plan shape, same oracle). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    def c100(c: Column): Column = round(c * 100).cast(LongType)
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .select(col("l_returnflag"), col("l_linestatus"),
        c100(col("l_quantity")).as("qty_c"),
        c100(col("l_extendedprice")).as("price_c"),
        c100(col("l_discount")).as("disc_c"),
        c100(col("l_tax")).as("tax_c"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(col("qty_c")).cast(DoubleType) / 100).as("sum_qty"),
        (sum(col("price_c")).cast(DoubleType) / 100).as("sum_base_price"),
        (sum(col("price_c") * (lit(100L) - col("disc_c"))).cast(DoubleType) / 10000)
          .as("sum_disc_price"),
        (sum(col("price_c") * (lit(100L) - col("disc_c")) * (lit(100L) + col("tax_c")))
          .cast(DoubleType) / 1000000).as("sum_charge"),
        (sum(col("qty_c")).cast(DoubleType) / 100 / count(lit(1))).as("avg_qty"),
        (sum(col("price_c")).cast(DoubleType) / 100 / count(lit(1))).as("avg_price"),
        (sum(col("disc_c")).cast(DoubleType) / 100 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** DECIMAL-path twin of [[q1PricingSummary]] — the warehouse-scale
    * arithmetic its Scaladoc promises, served and value-verified rather
    * than only spec-asserted: every measure aggregates in EXACT DECIMAL
    * (inputs at (12,2); the three-factor charge product lands exactly
    * on the (38,6) cap — 2+2+2 fractional digits, nothing rounds).
    * Output doubles are produced through the SAME scaled-integer →
    * double → divide route as the int64 form: the decimal sums are
    * exact, so multiplying out the scale and casting through long is
    * lossless integer extraction, and the remaining double divisions
    * are the identical IEEE operations the int64 form and the DuckDB
    * oracle perform — bit-for-bit agreement is structural, which is
    * what lets this entry share q1's oracle. Plan shape is unchanged:
    * partial+final hash aggregate over the pushed-down scan, ~6 rows. */
  def q1PricingSummaryDecimal(spark: SparkSession, dir: String): DataFrame = {
    def d2(c: Column): Column = c.cast(DecimalType(12, 2))
    // exact decimal sum (scale s) → the oracle's double: extract the
    // scaled integer losslessly, then divide in double like everyone else
    def asOracleDouble(sumDec: Column, scale: Int): Column = {
      val m = math.pow(10, scale).toLong
      (sumDec * m).cast(LongType).cast(DoubleType) / m
    }
    val price = d2(col("l_extendedprice"))
    val disc = d2(col("l_discount"))
    val tax = d2(col("l_tax"))
    val qty = d2(col("l_quantity"))
    val one = lit(1).cast(DecimalType(3, 2))
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asOracleDouble(sum(qty), 2).as("sum_qty"),
        asOracleDouble(sum(price), 2).as("sum_base_price"),
        asOracleDouble(sum(price * (one - disc)), 4).as("sum_disc_price"),
        asOracleDouble(sum(price * (one - disc) * (one + tax)), 6).as("sum_charge"),
        (asOracleDouble(sum(qty), 2) / count(lit(1))).as("avg_qty"),
        (asOracleDouble(sum(price), 2) / count(lit(1))).as("avg_price"),
        (asOracleDouble(sum(disc), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q4 shape (order-priority checking): EXISTS over a correlated
    * inequality — orders in a window having at least one lineitem shipped
    * more than 90 days after the order date (the dataset has no
    * commit/receipt dates; shipped-late carries the same plan). The semi
    * join keys on orderkey with the date comparison as a residual — one
    * keyed exchange, no pair blowup, count per priority after the
    * existence test collapses duplicates. */
  def q4PriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5 shape (local supplier volume): the full six-table join with
    * the LOCAL-supplier condition c_nationkey = s_nationkey — the edge j3
    * (plain star) lacks. That condition is what keeps Q5 interesting: the
    * supplier side cannot be folded into the star, it joins the fact on
    * l_suppkey AND constrains against the customer branch.
    *
    * Scale shape: supplier/customer/nation/region all broadcast (dims);
    * lineitem⋈orders is the ONE fact shuffle, on orderkey. The nation
    * equality is applied as a residual on the broadcast rows, so no
    * second fact exchange appears. Revenue sums in exact decimal; the
    * revenue-desc output order is tie-broken by n_name. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val customer = Tables(spark, dir, "customer")
    val supplier = Tables(spark, dir, "supplier")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(supplier),
        li("l_suppkey") === supplier("s_suppkey") &&
          customer("c_nationkey") === supplier("s_nationkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 shape (returned-item reporting): customers ranked by
    * revenue lost to returns in a quarter. Customer is the dimension that
    * at warehouse scale may NOT broadcast — here it does (AQE would pick
    * shuffle-hash past the threshold; the plan is the same shape either
    * way); the fact shuffle is lineitem⋈orders on orderkey, then ONE
    * reduce on custkey before the dim join — reduce-then-join keeps the
    * customer exchange at |customers with returns|, not |return rows|.
    * Top-20 by exact-decimal revenue, custkey tiebreak → deterministic. */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val orders = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val lost = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"))
    lost
      .join(broadcast(customer), lost("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape (large-volume orders): aggregate-then-join-back —
    * a HAVING subquery feeding a join, the reporting pattern the
    * monthly_agg table invites. The per-order quantity aggregate reduces
    * lineitem to |orders| rows BEFORE any join (reduce-then-join, one
    * fact shuffle on the group key); AQE picks broadcast for the
    * post-HAVING survivor set when it fits, a shuffle join when it
    * doesn't. Sort keys (price desc, date, orderkey) end unique → the
    * LIMIT is deterministic. */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sumExact(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders.join(big, orders("o_orderkey") === big("l_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  // ------------------------------------------------------------------
  // Bucketed co-location: pay the join shuffle ONCE, at write time
  // ------------------------------------------------------------------

  /** Bucket count for the co-located twins. Buckets are the scan's task
    * granularity (bucketed files don't split), so the count must be ≥ the
    * available cores or the layout CAPS parallelism — r8 shipped 8 buckets
    * on a 32-core box and the "shuffle-free" join ran 9× slower than its
    * shuffling twin. Locally: the core count. At 100 TB: thousands, sized
    * so each bucket file lands in the hundreds of MB; the mechanism under
    * test — hash-aligned layouts joined without an exchange — is
    * bucket-count-invariant, the throughput is not. */
  val JoinBuckets: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(math.max(8, Runtime.getRuntime.availableProcessors()))

  /** Session-catalog names for the bucketed twins, tagged per source dir
    * so a multi-SF test session cannot cross-serve layouts. */
  private def bucketedNames(dir: String): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]+", "_")
    (s"b_lineitem_$tag", s"b_orders_$tag")
  }

  /** Materialize orders and lineitem as co-bucketed catalog tables
    * (`bucketBy(JoinBuckets, key)`), iff absent — the write-once half of
    * the recurring-join contract. The `repartition(JoinBuckets, key)`
    * ahead of the bucketed write uses the SAME murmur3-pmod placement as
    * bucketBy, so every bucket is exactly ONE file: the scan then also
    * satisfies the sort order (`sortBy`) and the downstream sort-merge
    * join needs neither an Exchange NOR a per-bucket re-sort. On a lake
    * this is the nightly-compaction layout for every fact table that
    * joins on its key more than once. */
  def ensureBucketedTables(spark: SparkSession, dir: String): (String, String) = {
    val (liName, ordName) = bucketedNames(dir)
    if (!spark.catalog.tableExists(liName))
      Tables(spark, dir, "lineitem")
        .repartition(JoinBuckets, col("l_orderkey"))
        .write.bucketBy(JoinBuckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(liName)
    if (!spark.catalog.tableExists(ordName))
      Tables(spark, dir, "orders")
        .repartition(JoinBuckets, col("o_orderkey"))
        .write.bucketBy(JoinBuckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ordName)
    (liName, ordName)
  }

  /** The probe-many half: j2's fact-fact join over the co-bucketed
    * layout. The `merge` hint pins sort-merge (a broadcast at test scale
    * would silently bypass the co-location under test); because both
    * scans report hash-aligned bucket partitioning on the join key, the
    * executed plan has ZERO exchanges below the join — the only shuffle
    * left is the reducing aggregate's |groups|-wide one. Identical
    * output to [[j2FactJoinAgg]] (same oracle), which is the point:
    * bucketing changes the layout, never the answer, and the per-query
    * saving is the entire lineitem+orders shuffle. Plan shape pinned by
    * BucketingSpec. */
  def j11BucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val (liName, ordName) = ensureBucketedTables(spark, dir)
    val li = spark.table(liName)
    val ord = spark.table(ordName)
    li.hint("merge")
      .join(ord.hint("merge"), li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  // ------------------------------------------------------------------
  // Grid-bucketed range join: point-in-interval without a nested loop
  // ------------------------------------------------------------------

  /** Grid cell width in seconds (one week) — equal to the interval
    * length, so every interval covers at most TWO cells and the
    * per-interval emission is O(1) by construction. */
  private val RangeGridSec = 7L * 86400L

  /** Point-in-interval range join: shipments that fall inside a 7-day
    * campaign window starting at an order's date (every 97th orderkey
    * hosts a campaign — a deterministic, modulo-expressible sample so
    * the DuckDB oracle can re-derive the interval set exactly).
    *
    * A join whose ONLY predicate is a range lands on
    * BroadcastNestedLoopJoin — O(|points|·|intervals|) compares, the
    * classic 100 TB cliff. The grid decomposition makes it an EQUI join:
    * each interval explodes into the (≤ 2) week cells it overlaps, each
    * point maps to exactly ONE cell, the shuffle is hash(cell), and the
    * exact [start, start+7d) predicate filters inside the matched cell.
    * Compares drop from |points|·|intervals| to Σ_cell points(cell) ·
    * intervals(cell); because a point owns one cell, no (point,interval)
    * pair can meet twice — no post-join dedup. Cell skew is bounded by
    * intervals-per-week, a data property the campaign sample fixes at
    * ~|orders|/97/|weeks| here; a skewed production calendar would salt
    * the hot cells (the j10 pattern composes). */
  def j12RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // epoch seconds via CAST(ts AS TIMESTAMP AS LONG), not
    // unix_timestamp(ts): the NTZ→timestamp cast is free under the
    // pinned-UTC session and timestamp→long is a bare integer divide
    // inside codegen, while unix_timestamp routes through the
    // format-string code path — on the full-fact probe side that is
    // the difference between the scan being compute-bound and not
    def epochS(c: Column): Column =
      c.cast(TimestampType).cast(LongType)
    val campaigns = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), epochS(col("o_orderdate")).as("start_s"))
      .withColumn("cell",
        // integer `div`, never `/`: float division + cast truncates wrong
        // for values this large only by luck; div is exact by contract
        explode(sequence(expr(s"start_s div $RangeGridSec"),
          expr(s"(start_s + ${RangeGridSec - 1L}) div $RangeGridSec"))))
    // SAME epochS on both sides — point cells and interval cells must
    // come from one definition or an edit to either silently breaks the
    // grid-coverage invariant the join depends on. Tables.parallel: the
    // probe side is the narrow-pipeline shape (per-row cast + div, then
    // the partial agg IN THE SCAN TASK — no exchange that would
    // re-parallelize a single-row-group test file; the documented
    // Tables.parallel trade).
    //
    // The probe side rolls up to DAY grain BEFORE the grid join:
    // l_shipdate is a date, so ship_s already has day granularity and
    // the residual predicate depends on ship_s ALONE — count and the
    // exact-decimal revenue are associative partials, so joining the
    // (ship_s, day_n, day_rev) rollup is bit-identical to joining the
    // raw fact. This changes the candidate-pair count from
    // |campaigns|·|shipments-per-cell| (which grows ∝ SF² when the date
    // DOMAIN is fixed and the data densifies — the r13 sf10 spot-check
    // measured the raw form at 94× per 10× data) to
    // |campaigns|·|days-per-window| (≤ 7 rows per campaign, ∝ SF).
    // The rollup itself is a map-side-combinable aggregate on a
    // bounded-domain key (|distinct ship days|, independent of SF).
    val shipDays = Tables.parallel(spark, dir, "lineitem")
      .select(col("l_extendedprice"), col("l_discount"),
        epochS(col("l_shipdate")).as("ship_s"))
      .groupBy(col("ship_s"))
      .agg(
        count(lit(1)).as("day_n"),
        sum(dec2(col("l_extendedprice")) *
          (lit(BigDecimal(1)).cast(Dec2) - dec2(col("l_discount")))).as("day_rev"))
      .withColumn("cell", expr(s"ship_s div $RangeGridSec"))
    campaigns
      // the day table is bounded by the TIME domain, never by SF —
      // broadcast it so the campaign side (∝ SF) needs no exchange
      .join(broadcast(shipDays), Seq("cell"))
      // residual on the ALREADY-COMPUTED epoch longs: two integer
      // compares per candidate pair instead of re-deriving
      // timestamp-vs-(timestamp + INTERVAL) arithmetic; [start, start+7d)
      // at second precision is exactly [start_s, start_s + RangeGridSec)
      .filter(col("ship_s") >= col("start_s") &&
        col("ship_s") < col("start_s") + lit(RangeGridSec))
      .groupBy(col("o_orderkey"))
      .agg(
        sum(col("day_n")).as("n_shipments"),
        sum(col("day_rev")).cast(DoubleType).as("revenue"))
      .orderBy("o_orderkey")
  }

  /** Campaign (7-day) / promo (10-day) window lengths for the
    * interval-overlap join — two deterministic modulo samples of orders
    * so the DuckDB oracle re-derives both interval sets exactly. */
  private val CampaignSec = 7L * 86400L
  private val PromoSec = 10L * 86400L

  /** Interval×interval OVERLAP join — the general form of [[j12RangeJoin]]
    * (point-in-interval is the zero-length special case): which promo
    * windows overlap which campaign windows, with the exact overlap
    * length. Same cliff, same cure: a bare overlap predicate
    * (`a.start < b.end AND b.start < a.end`) is a
    * BroadcastNestedLoopJoin; decomposing BOTH interval sets into the
    * week cells they cover turns it into a hash equi join on the cell
    * (≤ 2 cells per campaign, ≤ ⌈10/7⌉+1 = 3 per promo — O(1) emission
    * either side).
    *
    * Exactly-once without a dedup shuffle: two intervals can now share
    * SEVERAL cells, so unlike j12 the pair needs an owner — the cell
    * containing `greatest(a_start, b_start)`. That instant lies in both
    * intervals (it is where the overlap begins), so both sides exploded
    * its cell and the pair is guaranteed to meet there; every other
    * shared cell drops the pair via the ownership filter. The same rule
    * an interval join in any shared-nothing engine uses (cf. the
    * overlap-interval joins in Flink/Trino docs), and the reason no
    * `distinct` appears below. */
  def j13IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    def epochS(c: Column): Column = c.cast(TimestampType).cast(LongType)
    def windows(mod: Int, lenSec: Long, keyName: String, startName: String) =
      Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % mod === 0)
        .select(col("o_orderkey").as(keyName),
          epochS(col("o_orderdate")).as(startName))
        .withColumn("cell",
          explode(sequence(expr(s"$startName div $RangeGridSec"),
            expr(s"($startName + ${lenSec - 1L}) div $RangeGridSec"))))
    val camp = windows(97, CampaignSec, "campaign_key", "a_start")
    val promo = windows(89, PromoSec, "promo_key", "b_start")
    camp.join(promo, Seq("cell"))
      // half-open overlap on the epoch longs (midnight-aligned dates, so
      // second-precision arithmetic is exact)
      .filter(col("a_start") < col("b_start") + lit(PromoSec) &&
        col("b_start") < col("a_start") + lit(CampaignSec))
      // ownership: only the cell where the overlap BEGINS emits the pair
      .filter(col("cell") ===
        expr(s"greatest(a_start, b_start) div $RangeGridSec"))
      .select(col("campaign_key"), col("promo_key"),
        // integer `div`: starts and lengths are whole days, so the
        // overlap is an exact multiple of 86400 — no float division
        expr(s"CAST((least(a_start + $CampaignSec, b_start + $PromoSec) - " +
          s"greatest(a_start, b_start)) div 86400 AS INT)").as("overlap_days"))
      .orderBy("campaign_key", "promo_key")
  }
}
