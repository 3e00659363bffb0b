package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style statistics collection — the table/column stats a
  * cost-based optimizer (and a 100 TB lake's data-skipping layer) feeds
  * on: per-column row/null/distinct counts and min/max, plus equi-width
  * value histograms. The reference has no optimizer surface; this is
  * engine-completeness the brief's "think like an engine" mandate
  * implies — Spark itself materializes exactly these via ANALYZE TABLE
  * ... COMPUTE STATISTICS FOR COLUMNS.
  *
  * Scale shape: [[analyzeLineitem]] is ONE aggregation pass producing a
  * single row of 4×5 measures, unpivoted to long form afterwards (the
  * multi-countDistinct expands map-side; at petabyte scale the exact
  * ndv swaps for approx_count_distinct — the g3 gate pattern — with the
  * plan otherwise unchanged). [[histogramQuantity]] is the broadcast-
  * back two-pass shape shared with winsorize: a 1-row min/max aggregate
  * rides a broadcast cross join back over the scan, bucket assignment
  * is a pure projection, and the final count is one |buckets|-row
  * hash aggregate. */
object StatsOps {

  /** Global-order inclusive running counts over a frequency table
    * WITHOUT a one-task window — the range-partitioned prefix-sum
    * shape: range-repartition by (keys, value) so each task holds a
    * contiguous, sampled-balanced slice of the value domain, roll each
    * (key group, slice) to one partial count, prefix those partials
    * with a TINY window (|key groups| × |slices| rows — driver-scale),
    * broadcast the offsets back, and finish with a within-slice window
    * whose partitions are the balanced slices. Exact integers at every
    * step, so the result is bit-identical to the textbook global
    * window — but a value domain as large as the user base (per-user
    * revenue totals, distinct document lengths) no longer lands in one
    * task. Shared by [[discPercentiles]] and the Mann–Whitney rank
    * machinery (`EventOps.abMannWhitney`). */
  private[ops] def withRunningCount(freq: DataFrame, keyCols: Seq[String],
      valueCol: String, cntCol: String, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val ranged = freq
      .repartitionByRange((keys :+ col(valueCol)): _*)
      .withColumn("__pid", spark_partition_id())
    val wOff = Window.partitionBy(keys: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy((keys :+ col("__pid")): _*)
      .agg(sum(col(cntCol)).as("__ppart"))
      .withColumn("__off", coalesce(sum(col("__ppart")).over(wOff), lit(0L)))
      .select((keys :+ col("__pid") :+ col("__off")): _*)
    val wIn = Window.partitionBy((keys :+ col("__pid")): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), keyCols :+ "__pid")
      .withColumn(outCol, col("__off") + sum(col(cntCol)).over(wIn))
      .drop("__pid", "__off")
  }

  /** Global-order `lead(value)` over a frequency table WITHOUT a
    * one-task window — [[withRunningCount]]'s sibling primitive: range-
    * repartition by (keys, value), take each slice's in-partition lead,
    * and stitch slice boundaries by broadcasting every slice's FIRST
    * value back as the previous slice's boundary successor (a TINY
    * |key groups| × |slices| relation). The last row per key group gets
    * NULL, exactly like the textbook window. Needed wherever consecutive
    * distinct values pair up (CDF gap lengths, equi-depth bin edges). */
  private[ops] def withNextValue(freq: DataFrame, keyCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val ranged = freq
      .repartitionByRange((keys :+ col(valueCol)): _*)
      .withColumn("__pid", spark_partition_id())
    val wHead = Window.partitionBy(keys: _*).orderBy(col("__pid"))
    val heads = ranged.groupBy((keys :+ col("__pid")): _*)
      .agg(min(col(valueCol)).as("__head"))
      .withColumn("__next_head", lead(col("__head"), 1).over(wHead))
      .select((keys :+ col("__pid") :+ col("__next_head")): _*)
    val wIn = Window.partitionBy((keys :+ col("__pid")): _*)
      .orderBy(col(valueCol))
    ranged.join(broadcast(heads), keyCols :+ "__pid")
      .withColumn(outCol,
        coalesce(lead(col(valueCol), 1).over(wIn), col("__next_head")))
      .drop("__pid", "__next_head")
  }

  /** Discrete percentiles over a (keys, value) relation via the
    * VALUE-FREQUENCY-TABLE cume_dist replication — the shared de-skew
    * core of `SetOps.g4cDiscPercentiles`, `EventOps.anomalyMad`'s
    * median/MAD passes and the AB family's quartiles (hoisted so the
    * subtle equivalence argument lives once): the textbook cume_dist
    * over raw rows partitioned by a low-cardinality key buffers
    * 1/|keys| of the fact table per window task, while the
    * composite-key frequency aggregate is map-side combinable and the
    * rank arithmetic touches only the distinct-value table — and that
    * table's own running count rides [[withRunningCount]]'s
    * range-partitioned prefix sums, so even a value domain as large as
    * the user base never concentrates in one task. The running row
    * count divided by the group total is EXACTLY the cume_dist of a
    * value's last tied row (ties carry the high count in both
    * formulations, and the division is the same double op), so
    * `min value with cd ≥ p` is unchanged value-for-value.
    * Returns one row per key group with one column per requested
    * (p, outputName). */
  private[ops] def discPercentiles(rows: DataFrame, keyCols: Seq[String],
      valueCol: String, ps: Seq[(Double, String)]): DataFrame = {
    val keys = keyCols.map(col)
    val counts = rows.groupBy(keys :+ col(valueCol): _*)
      .agg(count(lit(1)).as("cnt"))
    val run = withRunningCount(counts, keyCols, valueCol, "cnt", "__run")
    val totals =
      if (keyCols.isEmpty)
        counts.agg(sum(col("cnt")).as("__tot"))
      else counts.groupBy(keys: _*).agg(sum(col("cnt")).as("__tot"))
    val joined =
      if (keyCols.isEmpty) run.crossJoin(broadcast(totals))
      else run.join(broadcast(totals), keyCols)
    val ranked = joined.withColumn("cd",
      col("__run").cast(DoubleType) / col("__tot"))
    def disc(p: Double, out: String): Column =
      min(when(col("cd") >= p, col(valueCol))).as(out)
    ranked.groupBy(keys: _*)
      .agg(disc(ps.head._1, ps.head._2),
        ps.tail.map { case (p, out) => disc(p, out) }: _*)
  }

  private val Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** (column, n_rows, n_null, n_distinct, min_v, max_v) per tracked
    * numeric column — exact, one scan. */
  def analyzeLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val aggs = Cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}_rows"), count(col(c)).as(s"${c}_n"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val row = li.agg(aggs.head, aggs.tail: _*)
    val entries = Cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}_rows").as("n_rows"),
        (col(s"${c}_rows") - col(s"${c}_n")).as("n_null"),
        col(s"${c}_ndv").as("n_distinct"),
        col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"))
    }
    row.select(explode(array(entries: _*)).as("s"))
      .select(col("s.*"))
      .orderBy("column")
  }

  /** 10-bucket equi-width histogram of l_quantity: bucket =
    * min(9, floor((x − mn)·10 / (mx − mn))) — every step the same IEEE
    * op sequence in both engines, so the integer buckets hash exactly.
    * The min/max row broadcasts back over the scan (winsorize shape). */
  def histogramQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select(col("l_quantity"))
    val bounds = li.agg(min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
    li.crossJoin(broadcast(bounds))
      .select(least(lit(9L), floor((col("l_quantity") - col("mn")) * 10.0
        / (col("mx") - col("mn")))).cast(IntegerType).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** 8-bucket EQUI-DEPTH histogram of l_quantity — the optimizer
    * histogram that stays informative under skew (equi-width buckets
    * collapse when mass concentrates). A value lands in the bucket of
    * its first row's rank: bucket(v) = min(B−1, (cum(v) − cnt(v))·B / N)
    * — pure integer arithmetic, so the report hashes exactly.
    *
    * Scale shape: the heavy pass is the per-VALUE count (one map-side-
    * combined hash aggregate over the scan); the prefix sum then runs
    * over |distinct values| rows, not |rows| — for a discrete column
    * that stays tiny at any scale (l_quantity: 50 values at 100 TB as
    * at sf0.001). The unpartitioned window is therefore bounded by the
    * value domain, never the table; a continuous column (prices) routes
    * through the GK sketch instead (g4b) — that pair of paths is
    * exactly how warehouse ANALYZE implementations split the problem. */
  def histogramEquiDepth(spark: SparkSession, dir: String): DataFrame = {
    val B = 8L
    val counts = Tables(spark, dir, "lineitem")
      .groupBy(col("l_quantity")).agg(count(lit(1)).as("cnt"))
    val n = counts.agg(sum(col("cnt")).as("n"))
    // inclusive running count via the range-partitioned prefix-sum core:
    // l_quantity's domain is tiny, but the op is the template for ANY
    // column — a per-user-revenue equi-depth must not own one task
    withRunningCount(counts, Nil, "l_quantity", "cnt", "cum")
      .crossJoin(broadcast(n))
      .select(
        least(lit(B - 1), expr(s"((cum - cnt) * $B) div n"))
          .cast(IntegerType).as("bucket"),
        col("l_quantity"), col("cnt"))
      .groupBy(col("bucket"))
      .agg(min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"),
        sum(col("cnt")).as("n_rows"))
      .orderBy("bucket")
  }

  /** Distribution-drift monitor: each month's event-type mix tested
    * against the all-time mix, reported as per-cell χ² contributions
    * (observed, expected = n_month · p_overall, (o−e)²/e) — the
    * detector a 100 TB ingest runs on every new partition to catch a
    * source going sideways before it poisons training mix ratios.
    *
    * Scale shape: two integer aggregates over the |months|·|types| cell
    * domain (one shuffle on the fact table) and a broadcast of the
    * |types|-row overall mix; all double arithmetic is per-row and
    * correctly rounded (counts → one division, one multiply, one
    * square), so no cross-row float summation order exists and the
    * DuckDB oracle is bit-identical. The χ² total is left to the
    * consumer (or a decimal sum) precisely to keep that property. */
  def driftCells(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("month", col("ts")).as("month"), col("event_type"))
    val cells = ev.groupBy(col("month"), col("event_type"))
      .agg(count(lit(1)).as("observed"))
    val monthTotals = ev.groupBy(col("month")).agg(count(lit(1)).as("n_month"))
    val typeTotals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
    val grandTotal = ev.agg(count(lit(1)).as("n_all"))
    cells
      .join(broadcast(monthTotals), Seq("month"))
      .join(broadcast(typeTotals), Seq("event_type"))
      .crossJoin(broadcast(grandTotal))
      .withColumn("expected",
        col("n_month").cast(DoubleType) * col("n_type") / col("n_all"))
      .select(col("month"), col("event_type"), col("observed"),
        col("expected"),
        ((col("observed") - col("expected")) * (col("observed") - col("expected"))
          / col("expected")).as("chi2_cell"))
      .orderBy("month", "event_type")
  }

  /** Month-over-month movers: per return-flag segment (A/N/R — the
    * categorical dimension the lineitem testdata actually carries), the
    * monthly line count, its absolute and percent change vs the previous
    * month, and the top-3 movers per month by |Δ| — the "what changed in
    * the mix this month" dashboard query every warehouse serves. First
    * months (no predecessor) are excluded, zero-base percent changes are
    * NULL.
    *
    * Scale shape: ONE map-side-combined shuffle of the fact table down
    * to the |months|·|types| cell domain; the lag and rank windows then
    * run over that bounded aggregate — window-over-aggregate is fine at
    * any scale precisely because the domain is calendar-bounded, the
    * anti-pattern is windows over raw fact rows. Counts are integers
    * and pct is one IEEE division → fully hash-oracled. */
  def momMovers(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables(spark, dir, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"),
        col("l_returnflag").as("segment"))
      .agg(count(lit(1)).as("n"))
    val lagW = Window.partitionBy(col("segment")).orderBy(col("month"))
    val withDelta = monthly
      .withColumn("prev_n", lag(col("n"), 1).over(lagW))
      .filter(col("prev_n").isNotNull)
      .withColumn("delta", col("n") - col("prev_n"))
      .withColumn("pct_change",
        when(col("prev_n") > 0, col("delta").cast(DoubleType) / col("prev_n")))
    val rankW = Window.partitionBy(col("month"))
      .orderBy(abs(col("delta")).desc, col("segment"))
    withDelta
      .withColumn("mover_rank", row_number().over(rankW).cast(IntegerType))
      .filter(col("mover_rank") <= 3)
      .select(col("month"), col("mover_rank"), col("segment"),
        col("n"), col("prev_n"), col("delta"), col("pct_change"))
      .orderBy("month", "mover_rank")
  }

  /** Order-independent, ENGINE-PORTABLE table fingerprint: per source,
    * the row count plus the bigint sum of each row's canonical-string
    * md5 prefix (first 8 hex chars → 32-bit value). Commutative sum ⇒
    * partitioning/ordering cannot change it; md5 over a '|'-joined
    * canonical form ⇒ any engine (DuckDB, Trino, a Python validator)
    * reproduces it byte-for-byte — the cross-system replication check
    * you run after copying 100 TB between lakes, at the cost of one
    * map-side-combined scan. (Spark's own `hash`/`xxhash64` are faster
    * but engine-private — useless as a cross-system invariant.) */
  /** Row-level diff between two snapshots of the same keyed table —
    * what [[tableChecksum]] escalates to once a source's checksum
    * mismatches: WHICH rows were added / removed / changed. Digests are
    * the same engine-portable md5 canonical form, so any system can
    * reproduce the verdicts.
    *
    * Scale shape: each side folds to (key, digest) in its scan — 16-ish
    * bytes per row cross the wire — then ONE co-partitioned full outer
    * join on the key; output is bounded by |changes|, never |table|.
    * The registry entry derives "revision 2" deterministically from the
    * base snapshot (drops, amendments, inserts below) so the oracle can
    * replay it; production passes two real snapshot dirs. */
  def diffSnapshots(base: DataFrame, revised: DataFrame): DataFrame = {
    def keyed(df: DataFrame, side: String): DataFrame = df.select(
      col("doc_id").as(s"${side}_id"), col("source").as(s"${side}_src"),
      md5(concat_ws("|", col("doc_id").cast(StringType), col("text"),
        col("lang"), col("source"), col("n_chars").cast(StringType)))
        .as(s"${side}_dg"))
    keyed(base, "b").join(keyed(revised, "r"), col("b_id") === col("r_id"), "full_outer")
      .filter(col("b_id").isNull || col("r_id").isNull || col("b_dg") =!= col("r_dg"))
      .select(coalesce(col("b_id"), col("r_id")).as("doc_id"),
        coalesce(col("b_src"), col("r_src")).as("source"),
        when(col("b_id").isNull, "added")
          .when(col("r_id").isNull, "removed")
          .otherwise("changed").as("change"))
      .orderBy("change", "doc_id")
  }

  /** Deterministic "revision 2" of the documents snapshot: every
    * doc_id ≡ 0 (mod 97) dropped, ≡ 0 (mod 101) amended, and for each
    * ≡ 0 (mod 103) a new row inserted under key doc_id + 10⁷ — a
    * replayable stand-in for a day of lake churn. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents")
    val revised = base.filter(col("doc_id") % 97 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 101 === 0, concat(col("text"), lit(" (rev2)")))
          .otherwise(col("text")))
      .unionAll(base.filter(col("doc_id") % 103 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L))
    diffSnapshots(base, revised)
  }

  def tableChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("source"),
        conv(substring(md5(concat_ws("|",
          col("doc_id").cast(StringType), col("text"), col("lang"),
          col("n_chars").cast(StringType))), 1, 8), 16, 10)
          .cast(LongType).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
      .orderBy("source")

  /** Exact 10%-trimmed and winsorized MEANS per return-flag segment over
    * `l_quantity` — the robust aggregates a metrics pipeline serves where
    * `EventOps.winsorize` clips individual ROWS: trimming drops the k
    * lowest and k highest observations (k = ⌊n/10⌋), winsorizing replaces
    * them with the surviving boundary values.
    *
    * Both are rank statistics, so the textbook form is a per-group sort —
    * the one-task-per-group shape. This implementation never sorts rows:
    * the composite-key VALUE-FREQUENCY table (map-side combinable) plus
    * [[withRunningCount]]'s range-partitioned running counts give each
    * distinct value its inclusive rank interval (cum_lo, cum_hi]; the
    * mass a value contributes to the trimmed interior [k+1, n−k] is then
    * pure interval arithmetic — max(0, min(cum_hi, n−k) − max(cum_lo, k))
    * — and the boundary values v_low (rank k+1) and v_high (rank n−k) are
    * conditional min/max over the same table. Sums ride DECIMAL (2-dp
    * inputs → exact, order-independent); each mean is ONE double
    * division. Fully hash-oracled. */
  def trimmedMeans(spark: SparkSession, dir: String): DataFrame =
    trimmedOf(Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("key"), col("l_quantity").as("value")))

  private[graft] def trimmedOf(rows: DataFrame): DataFrame = {
    val freq = rows.groupBy("key", "value").agg(count(lit(1)).as("cnt"))
    val run = withRunningCount(freq, Seq("key"), "value", "cnt", "cum_hi")
      .withColumn("cum_lo", col("cum_hi") - col("cnt"))
    val totals = freq.groupBy("key").agg(sum(col("cnt")).as("n"))
      .withColumn("k", expr("n div 10"))
    val j = run.join(broadcast(totals), Seq("key"))
      .withColumn("inc", greatest(lit(0L),
        least(col("cum_hi"), col("n") - col("k")) -
          greatest(col("cum_lo"), col("k"))))
    val agg = j.groupBy("key").agg(
      max(col("n")).as("n"), max(col("k")).as("k"),
      min(when(col("cum_hi") >= col("k") + 1L, col("value"))).as("v_low"),
      max(when(col("cum_lo") < col("n") - col("k"), col("value"))).as("v_high"),
      sum(dec2(col("value")) * col("inc")).as("tsum"))
    agg.select(col("key"), col("n"), col("k"), col("v_low"), col("v_high"),
        (col("tsum").cast(DoubleType) / (col("n") - lit(2L) * col("k")))
          .as("trimmed_mean"),
        ((col("tsum") + col("k") * (dec2(col("v_low")) + dec2(col("v_high"))))
          .cast(DoubleType) / col("n")).as("winsor_mean"))
      .orderBy("key")
  }

  /** Spearman rank correlation over any (x: int64, y: int64) pair
    * relation — Pearson on DOUBLED tie-averaged ranks, so every rank is
    * an exact integer (a value with count t and count-before cb has
    * doubled average rank 2·cb + t + 1 = 2·run − t + 1) and every
    * moment is an exact DECIMAL(38,0) sum. Both rank tables ride
    * [[withRunningCount]]'s range-partitioned prefix sums (never a
    * one-task window, even when the value domain is corpus-sized);
    * ranks join back to rows by value (two co-keyed shuffles), and the
    * correlation is ONE map-side-combinable aggregate finished by the
    * a14-style fixed IEEE tree — two sqrt, one division. Doubling
    * cancels in the ratio, so rho is the textbook Spearman exactly.
    * Headroom: Σ(2r)² ≤ 4n³ holds in 38 digits to n ≈ 2.9e9 rows per
    * call; beyond that the moments need a (38,6)-scaled cast. */
  private[graft] def spearmanOf(pairs: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    def doubledRanks(c: String, out: String): DataFrame = {
      val freq = pairs.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      withRunningCount(freq, Nil, c, "cnt", "run")
        .select(col(c), (col("run") * 2 - col("cnt") + 1).as(out))
    }
    val ranked = pairs
      .join(doubledRanks("x", "dx"), Seq("x"))
      .join(doubledRanks("y", "dy"), Seq("y"))
    val a = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("dx").cast(d38)).as("sx"),
      sum(col("dy").cast(d38)).as("sy"),
      sum(col("dx").cast(d38) * col("dx").cast(d38)).as("sxx"),
      sum(col("dy").cast(d38) * col("dy").cast(d38)).as("syy"),
      sum(col("dx").cast(d38) * col("dy").cast(d38)).as("sxy"))
    val db = (c: String) => col(c).cast(DoubleType)
    a.select(col("n"),
      when(db("n") * db("sxx") - db("sx") * db("sx") > 0.0 &&
           db("n") * db("syy") - db("sy") * db("sy") > 0.0,
        (db("n") * db("sxy") - db("sx") * db("sy")) /
          (sqrt(db("n") * db("sxx") - db("sx") * db("sx")) *
            sqrt(db("n") * db("syy") - db("sy") * db("sy")))).as("rho"))
  }

  /** Kendall's tau-b over a BOUNDED joint frequency grid (bx, by, cnt)
    * — the 100 TB shape for rank concordance: exact tau is O(n log n)
    * sequential (inversion counting) and O(n²) distributed, so the
    * corpus quantizes into ≤ |bx|·|by| cells first (ONE map-side
    * combinable scan) and the concordant/discordant mass comes off the
    * grid's broadcast self-join — constant work at any corpus size.
    * Everything before the final tree is exact: C and D are
    * DECIMAL(38,0) sums of cell-count products (each unordered pair
    * counted once via the bx1 < bx2 join), ties come off the integer
    * marginals, and the tau-b ratio uses the DOUBLED identities
    * (2C − 2D) / (√(n(n−1) − Σtx(tx−1)) · √(n(n−1) − Σty(ty−1))) so no
    * integer halving (and no decimal-scale drift) ever happens. */
  private[graft] def kendallOfGrid(grid: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val g = grid.select(col("bx"), col("by"), col("cnt").cast(LongType).as("cnt"))
    val l = g.select(col("bx").as("bx1"), col("by").as("by1"), col("cnt").as("c1"))
    val r = g.select(col("bx").as("bx2"), col("by").as("by2"), col("cnt").as("c2"))
    val cd = broadcast(l).join(broadcast(r), col("bx1") < col("bx2"))
      .agg(
        coalesce(sum(when(col("by1") < col("by2"),
          col("c1").cast(d38) * col("c2").cast(d38))), lit(0).cast(d38)).as("conc"),
        coalesce(sum(when(col("by1") > col("by2"),
          col("c1").cast(d38) * col("c2").cast(d38))), lit(0).cast(d38)).as("disc"))
    def tiePairsX2(c: String, out: String): DataFrame =
      g.groupBy(col(c)).agg(sum(col("cnt")).as("t"))
        .agg(sum(col("t").cast(d38) * (col("t").cast(d38) - 1)).as(out))
    val tot = g.agg(sum(col("cnt")).as("n"))
      .select(col("n"), (col("n").cast(d38) * (col("n").cast(d38) - 1)).as("n0x2"))
    val a = cd.crossJoin(broadcast(tiePairsX2("bx", "tx2")))
      .crossJoin(broadcast(tiePairsX2("by", "ty2")))
      .crossJoin(broadcast(tot))
    val db = (c: String) => col(c).cast(DoubleType)
    a.select(col("n"),
      col("conc").cast(LongType).as("concordant"),
      col("disc").cast(LongType).as("discordant"),
      when(db("n0x2") - db("tx2") > 0.0 && db("n0x2") - db("ty2") > 0.0,
        (lit(2.0) * (db("conc") - db("disc"))) /
          (sqrt(db("n0x2") - db("tx2")) * sqrt(db("n0x2") - db("ty2"))))
        .as("tau_b"))
  }
}
