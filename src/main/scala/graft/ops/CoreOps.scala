package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operators — the full SURVEY.md §2 inventory of the
  * reference (`iDarshanaPatil/Weather-Database-System`) re-expressed as
  * declarative Spark plans over the driver's test tables.
  *
  * Each method is one operator family; the id prefix (f2, a1, …) matches
  * SURVEY.md §2's operator ids and the reference file:line cited there.
  * All plans are Catalyst-friendly: filters/projections sit directly over
  * the parquet scan (pushdown + pruning), aggregates use partial+final
  * hash aggregation, and nothing collects to the driver.
  */
object CoreOps {

  /** F2 — struct-of-arrays → rows (reference `fetchStocktonWeather.js:77-105`
    * zips 6 parallel hourly arrays). Generalized: tokenize + posexplode.
    * Scale note: explode is narrow (no shuffle); output is ~100× input rows,
    * so never follow it with a wide op before reducing. */
  def f2ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "token")
      .orderBy("doc_id", "pos")

  /** F3 — null-coercion scalar (`fetchStocktonWeather.js:73-75`): non-usable
    * value → fallback. JSON field extract + nullif + coalesce. */
  def f3NullCoerce(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(DoubleType)
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        coalesce(when(k === 0.0, lit(null)).otherwise(k), lit(-1.0)).as("k_coerced"))
      .orderBy("event_id")
  }

  /** F4 — derived unit-conversion column, null-propagating
    * (`fetchStocktonWeather.js:97`: F = C*9/5+32). Per-row IEEE double math. */
  def f4UnitConvert(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        col("value").as("temp_c"),
        (col("value") * lit(9) / lit(5) + lit(32)).as("temp_f"))
      .orderBy("event_id")

  /** A5/F5 — literal audit columns (`etlToClickHouse.js:167-168`,
    * `fetchStocktonWeather.js:148-155`). */
  def a5LiteralColumns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        lit("incremental").as("load_mode"),
        lit(0).as("sync_interval_min"),
        lit("Stockton").as("city"))
      .orderBy("event_id")

  /** F6 — date formatting scalar (`fetchStocktonWeather.js:27`). */
  def f6DateFormat(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("day_str"))
      .orderBy("event_id")

  /** E4 — substring-of-timestamp → date (`etlToClickHouse.js:100`
    * `timestamp.slice(0,10)`). */
  def e4SubstrToDate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        // date kept as midnight timestamp in the output: parquet DATE vs
        // DuckDB DATE surface differently to the driver's comparator.
        to_date(substring(col("l_shipdate").cast(StringType), 1, 10))
          .cast(TimestampType).as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "ship_day")

  /** E5 — timestamp normalization (`etlToClickHouse.js:82-97`: ISO →
    * "yyyy-MM-dd HH:mm:ss"). */
  def e5TsNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_norm"))
      .orderBy("event_id")

  /** E6 — null-safe access with default (`etlToClickHouse.js:111-116`
    * `?? ""`). */
  def e6NullDefault(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        coalesce(when(col("source") === "src0", lit(null)).otherwise(col("source")), lit(""))
          .as("source_id"))
      .orderBy("doc_id")

  /** E2 — nested-field equality filter (`etlToClickHouse.js:74` filters
    * `metadata.author`). Builds a struct then filters through it; Catalyst
    * collapses the struct access so the parquet scan still gets a flat
    * pushed filter. */
  def e2NestedFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(struct(col("lang"), col("source")).as("meta"), col("doc_id"), col("n_chars"))
      .filter(col("meta.lang") === "en")
      .select(col("doc_id"), col("n_chars"))
      .orderBy("doc_id")

  /** A1 — THE core query (`etlToClickHouse.js:157-173`): group by key ×
    * month, avg/sum/count, ordered. Partial+final HashAggregate; the
    * decimal route keeps the sums exact at any partition count — the same
    * plan holds at 100 TB (shuffle width = |groups|, not |rows|). */
  def a1MonthlyAggEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("month", col("ts")).as("month"))
      .agg(
        avgExact(col("value")).as("avg_value"),
        sumExact(col("value")).as("total_value"),
        count(lit(1)).as("rows_loaded"))
      .orderBy("event_type", "month")

  /** A1 on the fact table: returnflag × ship-month with the TPC-H revenue
    * term — exercises exact decimal product+sum. */
  def a1MonthlyAggLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")).as("month"))
      .agg(
        avgExact(col("l_quantity")).as("avg_qty"),
        sumExact(col("l_quantity")).as("sum_qty"),
        revenueExact(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "month")

  /** A1 under key skew: salted two-stage aggregation. Stage 1 splits each
    * (key, month) group across 16 salt shards (partial sums per shard);
    * stage 2 merges shards. With decimal sums the result is bit-identical
    * to the unsalted plan — same oracle — while no single reducer ever
    * owns a whole hot key. This is the pattern for power-law keys at
    * 100 TB where AQE skew handling isn't enough (single-key groups). */
  def a1SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val shards = Tables(spark, dir, "events")
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
      .groupBy(col("event_type"), date_trunc("month", col("ts")).as("month"), col("salt"))
      .agg(
        sum(dec2(col("value"))).as("psum"),
        count(col("value")).as("pcnt"),
        count(lit(1)).as("pn"))
    shards
      .groupBy(col("event_type"), col("month"))
      .agg(
        (sum(col("psum")).cast(DoubleType) / sum(col("pcnt"))).as("avg_value"),
        sum(col("psum")).cast(DoubleType).as("total_value"),
        sum(col("pn")).as("rows_loaded"))
      .orderBy("event_type", "month")
  }

  /** A2 — date truncation at week grain (ISO Monday in both engines). */
  def a2WeekTrunc(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n"))
      .orderBy("week")

  /** A4/D4 — full count (`diagnostics.js:80-100`). */
  def d4Count(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").agg(count(lit(1)).as("total"))

  /** C1 — full-table multi-key sort (`clickhouseToRedis.js:27-46`
    * ORDER BY city, month). Range-partitioned SortExec; at scale this is
    * the one intentionally global shuffle in the serving path. */
  def c1SortMultikey(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    // (orderkey, linenumber) is NOT unique in the synthetic data — sort on
    // every column so the layout is a deterministic multiset order.
    val keys = Seq("l_returnflag", "l_shipdate") ++
      li.columns.filterNot(Set("l_returnflag", "l_shipdate"))
    li.orderBy(keys.map(col): _*)
  }

  /** C2 — the reference's scan-all-then-filter cache bug
    * (`clickhouseToRedis.js:55`): filter written *after* the sort; Catalyst
    * pushes it below the sort and into the scan — the optimization the
    * reference leaves on the table. */
  def c2PushdownFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .orderBy("l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_shipdate"))

  /** S2 — parameterized filter + sort, the serving read path
    * (`backend/routes/monthly.js:58-77`). Bound parameter, not string SQL. */
  def s2ParamFilterSort(spark: SparkSession, dir: String, eventType: String = "purchase"): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type") === eventType)
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .agg(avgExact(col("value")).as("avg_value"), sumExact(col("value")).as("total_value"))
      .orderBy("month")

  /** S3 — projection + cast + null guard (`monthly.js:27-33,90-96`). */
  def s3CastProject(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_totalprice").cast(DoubleType).as("total_price"),
        col("o_custkey").cast(IntegerType).as("cust_id"))
      .orderBy("o_orderkey")

  /** S4 — staleness classification CASE over a TTL fraction
    * (`monthly.js:37-42`: <0.2 out-of-sync, <0.6 partial, else full). */
  def s4StalenessCase(spark: SparkSession, dir: String): DataFrame = {
    val frac = col("value") / lit(200.0)
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        frac.as("ttl_frac"),
        when(frac < 0.2, "out-of-sync").when(frac < 0.6, "partial").otherwise("full")
          .as("sync_status"))
      .orderBy("event_id")
  }

  /** D5 — filtered limit-1 sample (`diagnostics.js:102-121`), made
    * deterministic with a total order. CollectLimitExec. */
  def d5FilteredLimit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("event_type") === "error")
      .orderBy("event_id")
      .limit(1)

  /** D6 — table profile: the one-pass data-quality scan a lake runs
    * before trusting a table (row/null counts, value and time ranges,
    * key cardinality). All aggregates reduce map-side; one tiny shuffle;
    * decimal route keeps the sum exact. */
  def d6Profile(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast(LongType)).as("n_null_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sumExact(col("value")).as("sum_value"),
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts")).as("ts_min"),
        max(col("ts")).as("ts_max"))

  /** F8 — debug sample `slice(0,3)` (`fetchStocktonWeather.js:170`). */
  def f8LimitSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
      .limit(3)

  /** U1 — month label formatting (`dashboard.js:91-94`) over DISTINCT
    * months. */
  def u1MonthLabel(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(date_trunc("month", col("l_shipdate")).as("month"))
      .distinct()
      .select(col("month"), date_format(col("month"), "MMM yyyy").as("label"))
      .orderBy("month")

  /** String scalar family: case, replace, substring, pad, trim, LIKE —
    * the serving layer's formatting toolbox in one projection. */
  def f9StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        upper(col("source")).as("src_up"),
        expr("replace(lang, 'e', 'E')").as("lang_r"),
        substring(col("text"), 1, 20).as("prefix"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        length(trim(col("text"))).as("len_t"),
        col("source").like("src%").as("is_src"))
      .orderBy("doc_id")

  /** Argmax per group without a window: max over a comparable struct
    * (price, key) — one aggregate pass, no shuffle beyond the group-by,
    * deterministic because the key breaks price ties. The scalable
    * "top-1 per group" (row_number top-N generalizes, this is cheaper). */
  def a7ArgmaxStruct(spark: SparkSession, dir: String): DataFrame = {
    val m = max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(m.as("m"))
      .select(
        col("o_orderpriority"),
        col("m.p").as("top_price"),
        col("m.k").as("top_orderkey"))
      .orderBy("o_orderpriority")
  }

  /** Conditional aggregation: filtered counts and CASE-routed exact sums. */
  def a8ConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(when(col("value") > 100, 1)).as("n_big"),
        sum(when(col("value") > 100, dec2(col("value")))
          .otherwise(lit(BigDecimal(0)).cast(Dec2))).cast(DoubleType).as("big_total"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Schema-on-read JSON: from_json with an explicit schema (the engine's
    * PERMISSIVE parse of the reference's dynamic documents). */
  def f10FromJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .orderBy("event_id")

  /** Math scalar family — restricted to IEEE-754-exact operations
    * (add/sub/mul/sqrt/compare), which are bit-identical in any engine.
    * Transcendentals (exp/ln/pow) are correctly-rounded only to ±1 ulp
    * per libm and are exercised in specs, not the value-hash oracle. */
  def f11MathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        abs(col("value") - 100).as("dev"),
        sqrt(col("value")).as("root"),
        (col("value") * col("value")).as("sq"),
        greatest(col("value"), lit(50.0)).as("hi"),
        least(col("value"), lit(50.0)).as("lo"))
      .orderBy("event_id")

  /** Date arithmetic family: day difference, day add, extraction. */
  def f12DateArith(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(
        col("o_orderkey"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), col("o_orderdate")).as("days_to"),
        date_add(col("o_orderdate").cast(DateType), 30).cast(TimestampType).as("due"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"))
      .orderBy("o_orderkey")

  /** Array function family, reduced to scalars for stable comparison:
    * size, first/last element, membership, distinct count. */
  def f13ArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).as("n"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "the").as("has_the"),
        size(array_distinct(toks)).as("n_distinct"),
        array_min(toks).as("min_tok"),
        array_max(toks).as("max_tok"))
      .orderBy("doc_id")
  }

  /** Map-column function family: per-source language histograms BUILT as
    * map columns (`map_from_entries` over collected entries), extended
    * with a computed entry (`map_concat` of a single-entry map holding
    * the source total), thresholded per-entry (`map_filter`), and
    * EXPLODED back to rows — which is also how a map column is
    * value-checked at all: hash gates cannot compare raw maps (entry
    * order is unspecified), so the exploded (key, value) form is the
    * map's canonical oracle surface. The collected entry list is
    * sort_array-ed first purely so the intermediate is deterministic
    * under any partitioning; map semantics never depend on it. Two small
    * keyed aggregations on already-reduced rows — the map assembly adds
    * no exchange. */
  def f14MapFuncs(spark: SparkSession, dir: String): DataFrame = {
    // '__total' is a RESERVED key (the rollup sentinel merged in below);
    // a lang literally named '__total' would make map_concat throw a
    // duplicate-key error under Spark's default EXCEPTION policy, so it
    // is excluded from the per-lang domain up front
    val perLang = Tables(spark, dir, "documents")
      .filter(col("lang") =!= "__total")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    perLang
      .groupBy(col("source"))
      .agg(
        map_from_entries(sort_array(collect_list(struct(col("lang"), col("n")))))
          .as("m"),
        sum(col("n")).as("total"))
      .select(col("source"),
        map_concat(col("m"), map(lit("__total"), col("total"))).as("m"))
      .select(col("source"),
        explode(map_filter(col("m"), (_, v) => v >= 2)).as(Seq("key", "value")))
      .orderBy("source", "key")
  }

  /** Deterministic standard deviation: assembled from exact decimal
    * sums (Σx, Σx²) in the closed form √((Σx² − (Σx)²/n)/(n−1)) — the
    * same double arithmetic in any engine, unlike built-in stddev whose
    * merge order varies with partitioning. */
  def a9StddevExact(spark: SparkSession, dir: String): DataFrame = {
    val sx = sum(col("value").cast(DecimalType(28, 2))).cast(DoubleType)
    val sxx = sum((col("value").cast(DecimalType(18, 2)) * col("value").cast(DecimalType(18, 2))))
      .cast(DoubleType)
    val n = count(col("value")).cast(DoubleType)
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        sqrt((sxx - sx * sx / n) / (n - lit(1.0))).as("stddev_v"),
        (sx / n).as("mean_v"))
      .orderBy("event_type")
  }

  /** Pivot: months × event types → one exact-sum column per type. The
    * value list is explicit, so the output schema is static and the plan
    * is a single hash aggregate (no two-phase distinct-values scan). */
  def a10Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(date_trunc("month", col("ts")).as("month"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum(dec2(col("value"))).cast(DoubleType))
      .orderBy("month")

  /** Unpivot (melt): wide metric columns → (metric, value) rows. */
  def a11Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "metric_value")
      .orderBy("l_orderkey", "l_linenumber", "metric", "metric_value")

  /** SQL surface: the same A1 aggregate as literal Spark SQL over a
    * registered view — the reference ships its one analytical query as a
    * SQL string (`etlToClickHouse.js:157-173`); this engine accepts both
    * the DataFrame and SQL forms with identical plans. */
  def sqlMonthlyAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events").createOrReplaceTempView("graft_events")
    spark.sql(
      """SELECT event_type, date_trunc('MONTH', ts) AS month,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       count(*) AS rows_loaded
        |FROM graft_events
        |GROUP BY event_type, date_trunc('MONTH', ts)
        |ORDER BY event_type, month""".stripMargin)
  }

  /** Custom kernels reached from the SQL-string surface: the
    * `cosine_similarity` name resolves through GraftExtensions'
    * injectFunction to the same codegen'd Catalyst expression the Column
    * API uses — cosine of every embedding against query vector 0, fully
    * value-oracled (the kernel is formula-identical to DuckDB's
    * list_cosine_similarity). */
  def sqlKernelCosine(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
    spark.sql(
      """WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM graft_embeddings),
        |     q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, cosine_similarity(e.v, q.qv) AS cos
        |FROM e CROSS JOIN q ORDER BY vec_id""".stripMargin)
  }

  /** The exact n-gram near-dup pipeline written as ONE SQL string — the
    * query surface the reference's users live in — with `shingle_hashes`
    * and `posting_list_pairs` resolving through
    * GraftExtensions.injectFunction to the same Catalyst kernels the
    * DataFrame twin (DedupOps.ngramJaccard) uses. This twin deliberately
    * keeps the FULL-index count-based formulation (the DataFrame twin is
    * PPJoin-prefix-filtered), so their row-for-row equality — asserted by
    * spec and by the shared oracle — cross-checks the prefix filter's
    * exactness from an independent plan. The df-cap is interpolated from
    * `DedupOps.MaxBucket` so the twins cannot drift apart. */
  def sqlKernelDedup(spark: SparkSession, dir: String): DataFrame = {
    Tables.parallel(spark, dir, "documents").createOrReplaceTempView("graft_documents")
    spark.sql(
      s"""WITH docs AS (SELECT doc_id, shingle_hashes(split(lower(text), ' '), 3) AS shs
        |              FROM graft_documents WHERE size(split(text, ' ')) >= 3),
        |     tri AS (SELECT doc_id, size(shs) AS n, explode(shs) AS sh FROM docs),
        |     posting AS (SELECT sh, collect_list(struct(doc_id, n)) AS ds
        |                 FROM tri GROUP BY sh
        |                 HAVING size(ds) BETWEEN 2 AND ${graft.ops.DedupOps.MaxBucket}),
        |     pairs AS (SELECT explode(posting_list_pairs(ds)) AS p FROM posting),
        |     agg AS (SELECT p.doc_a AS doc_a, p.na AS na, p.doc_b AS doc_b, p.nb AS nb,
        |                    count(1) AS n_common
        |             FROM pairs GROUP BY p.doc_a, p.na, p.doc_b, p.nb)
        |SELECT doc_a, doc_b, CAST(n_common AS DOUBLE) / (na + nb - n_common) AS jaccard
        |FROM agg WHERE 3 * n_common >= na + nb
        |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** U2 — fixed-decimal rounding + null→0 (`dashboard.js:96-97`).
    * Implemented as floor(x*10+0.5)/10 — pure IEEE double ops, identical
    * in any engine (library `round` implementations differ in how they
    * resolve binary-vs-decimal halfway cases). */
  def u2RoundCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val x = col("value") / lit(3.0)
    Tables(spark, dir, "events")
      .select(
        col("event_id"),
        coalesce(floor(x * lit(10.0) + lit(0.5)) / lit(10.0), lit(0.0)).as("value_r"))
      .orderBy("event_id")
  }
}
