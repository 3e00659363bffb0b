package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Set / grouping-set operators (absent from the reference — SURVEY.md §2 —
  * included for engine completeness). */
object SetOps {

  /** UNION DISTINCT of two name domains. */
  def set1UnionDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "region").select(col("r_name").as("name"))
      .union(Tables(spark, dir, "nation").select(col("n_name").as("name")))
      .distinct()
      .orderBy("name")

  /** EXCEPT (distinct): customer keys with no orders, set-wise. */
  def set2Except(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(col("c_custkey").as("custkey"))
      .except(Tables(spark, dir, "orders").select(col("o_custkey").as("custkey")))
      .orderBy("custkey")

  /** INTERSECT (distinct): users seen in both error and purchase events. */
  def set3Intersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.filter(col("event_type") === "error").select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy("user_id")
  }

  /** EXCEPT ALL (bag semantics): per-user error events minus a matching
    * COUNT of purchase events — multiplicities subtract instead of the
    * set collapse of [[set2Except]]. Spark plans both bag variants as a
    * single hash aggregation on the value with a count-difference
    * generator — one shuffle, no join. */
  def set4ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.filter(col("event_type") === "error").select(col("user_id"))
      .exceptAll(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("surplus_errors"))
      .orderBy("user_id")
  }

  /** INTERSECT ALL (bag semantics): min(multiplicity) per user across the
    * error and purchase event streams. */
  def set5IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.filter(col("event_type") === "error").select(col("user_id"))
      .intersectAll(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_common"))
      .orderBy("user_id")
  }

  /** ROLLUP over (returnflag, linestatus) with exact sums; null grouping
    * keys are folded to 'ALL' so the sort order is engine-independent
    * (Spark sorts nulls first ASC, DuckDB last). */
  def g1Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sumExact(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))
      .orderBy("flag", "status")

  /** Exact COUNT DISTINCT (the scalable twin below is rows-only). */
  def g2CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))

  /** Exact linear-interpolation percentiles per group (Spark `percentile`
    * ≡ DuckDB `quantile_cont`). Exact percentile needs the sorted group in
    * memory — fine per (flag) group; at 100 TB the approx_percentile
    * sketch (t-digest-style, mergeable) replaces it. */
  def g4Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.99)").as("p99"))
      .orderBy("l_returnflag")

  /** Discrete-percentile twin of `g4Percentiles`: the value RETURNED is
    * always an actual data point (quantile_disc semantics — what SLO/tail
    * reporting wants, where an interpolated latency that nobody observed
    * is misleading). Spark has no percentile_disc; the textbook
    * formulation is cume_dist over the RAW rows per group — which at
    * 100 TB buffers a third of the fact table in each of three window
    * tasks (3 returnflags). This plan instead runs the shared
    * frequency-table core `StatsOps.discPercentiles` (~50 quantity
    * levels per flag after the map-side composite-key aggregate; the
    * bit-for-bit cume_dist equivalence argument lives there).
    * Value-oracled against DuckDB quantile_disc (identical "lowest
    * value at cumulative rank ≥ p" definition). */
  def g4cDiscPercentiles(spark: SparkSession, dir: String): DataFrame =
    StatsOps.discPercentiles(
      Tables(spark, dir, "lineitem").select(col("l_returnflag"), col("l_quantity")),
      Seq("l_returnflag"), "l_quantity",
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99"))
      .orderBy("l_returnflag")

  /** Approx-percentile sketch twin of `g4Percentiles` — the form that
    * survives 100 TB: a bounded-memory mergeable sketch (Greenwald-Khanna
    * style) built in one pass with map-side partials, where the exact
    * percentile materializes each sorted group. accuracy=10000 → rank
    * error ≤ n/10000; pinned against the exact values by spec. Sketch
    * internals are engine-specific → rows-only oracle (same split as
    * g2/g3 for distinct counts). */
  val PercentileAccuracy = 10000

  def g4bApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_quantity, array(0.5, 0.9, 0.99), $PercentileAccuracy)").as("ps"))
      .select(
        col("l_returnflag"),
        col("ps")(0).as("p50"), col("ps")(1).as("p90"), col("ps")(2).as("p99"))
      .orderBy("l_returnflag")

  /** CUBE over two dimensions — all 4 grouping sets; null keys folded to
    * 'ALL' for engine-independent ordering (as in g1Rollup). */
  def g5Cube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sumExact(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total"), col("n"))
      .orderBy("status", "priority")

  /** A14 — correlation + covariance from EXACT decimal moments: built-in
    * corr/covar merge running moments in floating point (merge-order-
    * dependent bits, like built-in stddev), so this assembles the closed
    * forms from exact decimal sums instead — deterministic under any
    * partitioning. The moments cross into double through an exact scaled
    * BIGINT (not a decimal→double cast, whose tie-rounding differs
    * between engines by 1 ulp at boundary values); int64→double is
    * IEEE-specified and engine-identical. quantity(2dp) × discount(2dp)
    * keeps every scaled moment far inside int64 at any scale factor. */
  def a14CorrExact(spark: SparkSession, dir: String): DataFrame = {
    val Dec4 = DecimalType(38, 4)
    val x = col("l_quantity").cast(Dec4)
    val y = col("l_discount").cast(Dec4)
    def m(c: Column): Column = (sum(c) * lit(10000)).cast(LongType).cast(DoubleType) / 10000.0
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        m(x).as("sx"), m(y).as("sy"),
        m(x * x).as("sxx"), m(y * y).as("syy"), m(x * y).as("sxy"))
      .select(col("l_returnflag"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0)).as("covar_s"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_xy"))
      .orderBy("l_returnflag")
  }

  /** A16 — deterministic OLS regression (slope + intercept) of discount
    * on quantity per return flag, assembled from the SAME exact scaled-
    * int64 moments as a14CorrExact: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),
    * intercept = (Σy − slope·Σx)/n. Built-in regr_slope/regr_intercept
    * merge partial float states in partition order — not reproducible
    * across partitionings; this closed form is, and matches any engine's
    * bits. The regression triple completes the two-variable statistics
    * family (corr, covar, slope, intercept) on one partial+final hash
    * aggregate — a single fact shuffle of 6 scaled-int64 moments. */
  def a16RegressionExact(spark: SparkSession, dir: String): DataFrame = {
    val Dec4 = DecimalType(38, 4)
    val x = col("l_quantity").cast(Dec4)
    val y = col("l_discount").cast(Dec4)
    def m(c: Column): Column = (sum(c) * lit(10000)).cast(LongType).cast(DoubleType) / 10000.0
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast(DoubleType).as("n"),
        m(x).as("sx"), m(y).as("sy"),
        m(x * x).as("sxx"), m(x * y).as("sxy"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("l_returnflag"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"))
      .orderBy("l_returnflag")
  }

  /** A15 — deterministic mode: most frequent quantity per flag, ties
    * resolved to the smallest value (argmax over (count, -value) structs
    * — one extra reduce, no window sort). */
  def a15Mode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(max(struct(col("cnt"), (-col("l_quantity")).as("nq"))).as("m"))
      .select(col("l_returnflag"), (-col("m.nq")).as("mode_qty"), col("m.cnt").as("n_occur"))
      .orderBy("l_returnflag")

  /** Ordered string aggregation per group: names joined in sorted order —
    * Spark `concat_ws(sort_array(collect_list(...)))` ≡ DuckDB
    * `string_agg(... ORDER BY ...)`; the explicit sort is what makes the
    * concatenation order (and thus the oracle hash) partition-invariant. */
  def a13StringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
      .orderBy("n_regionkey")

  /** Bounded-memory top-k values per group via the custom typed
    * `TopKAggregator` (O(k) state, map-side partials, merge-order
    * invariant) — exploded to (group, rank, value) rows. Deterministic
    * under value ties because only the value multiset is emitted. */
  def a12TopkAgg(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(graft.functions.TopKAggregator(3))
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(topk(col("l_quantity")).as("v"))
      .select(col("l_returnflag"), posexplode(col("v")).as(Seq("pos", "qty")))
      .select(col("l_returnflag"), (col("pos") + 1).cast(IntegerType).as("rank"), col("qty"))
      .orderBy("l_returnflag", "rank")
  }

  /** Arbitrary GROUPING SETS (beyond rollup/cube's fixed lattices):
    * per-flag and per-status marginals in one pass — Spark expands to a
    * single Expand + hash aggregate, one shuffle for all sets. Null keys
    * folded to 'ALL' as in g1Rollup. */
  def g6GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("g6_lineitem")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n
        |FROM g6_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin)
  }

  /** HyperLogLog++ approximate distinct — the form that survives 100 TB
    * (constant sketch memory, one pass, mergeable partials) where exact
    * distinct shuffles every key. rsd 1%; accuracy pinned by spec against
    * the exact count. Sketch internals differ per engine → rows-only. */
  def g3ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))

  /** Value-oracled accuracy gate for [[g3ApproxDistinct]] (the recall-gate
    * pattern): ONE pass computes both the HLL++ sketches and the exact
    * distinct counts (the validation anchor, affordable at oracle scale),
    * and `passes` asserts each approximation within 5× the configured
    * 1% rsd — a ≥5σ bound the deterministic sketch clears with room. The
    * comparison is pure int64 arithmetic (|approx−exact|·100 ≤ exact·5),
    * and the oracle recomputes the exact counts independently and expects
    * the literal passes=true — HLL accuracy becomes a per-round hash
    * CORRECTNESS signal instead of a spec-only claim. */
  def g3ApproxDistinctGate(spark: SparkSession, dir: String): DataFrame = {
    def inBound(approx: Column, exact: Column): Column =
      abs(approx - exact) * 100L <= exact * 5L
    // The exact and approximate counts run as SEPARATE aggregations,
    // cross-joined (two 1-row sides). Mixing countDistinct with
    // approx_count_distinct in ONE agg plans the HLL as a
    // non-distinct aggregate inside the distinct-expand's sort-based
    // aggregation, where every input row MERGES a full 2^p-register
    // sketch instead of updating one register — O(rows · registers)
    // work that the round-12 sf1 validation caught live (the one query
    // in the registry that went super-linear at 10×: minutes of CPU on
    // 6M rows). Split, the approx pass is a plain partial-aggregated
    // HLL update per row and the exact pass is the standard two-phase
    // distinct.
    val approx = Tables(spark, dir, "lineitem")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
    val exact = Tables(spark, dir, "lineitem")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    exact.crossJoin(broadcast(approx))
      .select(col("n_parts"), col("n_orders"),
        (inBound(col("ap"), col("n_parts")) &&
          inBound(col("ao"), col("n_orders"))).as("passes"))
  }

  /** Value-oracled rank-error gate for [[g4bApproxPercentiles]]: the
    * Greenwald–Khanna contract is that the returned value's rank is
    * within n/accuracy of the target rank p·n. For each group and each
    * p ∈ {.5, .9, .99} the gate recounts the approx value's true rank
    * interval [#{x < v}+1, #{x ≤ v}] over the SAME scan (broadcast-back
    * of the |groups|-row sketch output — the winsorize shape) and
    * `passes` asserts the interval intersects [p·n − ε, p·n + ε],
    * ε = n/accuracy + 1. Oracle recomputes per-group n independently and
    * expects the literal passes=true per group. */
  def g4bApproxPercentileGate(spark: SparkSession, dir: String): DataFrame = {
    val ap = g4bApproxPercentiles(spark, dir)
    def lo(v: Column): Column = sum(when(col("l_quantity") < v, 1L).otherwise(0L)) + 1L
    def hi(v: Column): Column = sum(when(col("l_quantity") <= v, 1L).otherwise(0L))
    val agg = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .join(broadcast(ap), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        lo(col("p50")).as("lo50"), hi(col("p50")).as("hi50"),
        lo(col("p90")).as("lo90"), hi(col("p90")).as("hi90"),
        lo(col("p99")).as("lo99"), hi(col("p99")).as("hi99"))
    // rank interval [lo, hi] must touch [p·n − ε, p·n + ε]
    def ok(p: Double, l: Column, h: Column): Column = {
      val target = col("n_rows") * p
      val eps = col("n_rows") / PercentileAccuracy + 1.0
      l.cast(DoubleType) <= target + eps && h.cast(DoubleType) >= target - eps
    }
    agg.select(col("l_returnflag"), col("n_rows"),
      (ok(0.5, col("lo50"), col("hi50")) && ok(0.9, col("lo90"), col("hi90")) &&
        ok(0.99, col("lo99"), col("hi99"))).as("passes"))
      .orderBy(col("l_returnflag"))
  }
}
