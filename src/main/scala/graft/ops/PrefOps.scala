package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pairwise-preference mining and Bradley–Terry strength fitting — the
  * preference-data-prep surface of a training pipeline (reward-model /
  * RLHF corpora are built from exactly this shape: derive pairwise
  * "A beat B" contests from interaction logs, audit the win-rate matrix
  * with a confidence bound, fit a global strength ordering).
  *
  * Contest derivation here: each user is one judge; item i beats item j
  * for that judge when the user's engagement count with i exceeds their
  * count with j (ties abstain). The item alphabet is the static
  * event-type list, so every pivot below has a fixed schema and the
  * pairwise relation is at most |Items|² rows — driver-bounded by
  * construction, never by data volume.
  *
  * Determinism across engines: win/game counts are exact int64; every
  * double that follows (win rate, Wilson bound, Bradley–Terry strengths)
  * is a FIXED sequence of IEEE ops (+ - * / sqrt, each correctly
  * rounded) on those integers, textually mirrored by the DuckDB
  * oracles. Sums over items are written as left-associated chains in a
  * fixed item order on BOTH sides (never a data-ordered SUM of doubles),
  * so the fold order — the one thing IEEE addition is sensitive to — is
  * pinned by the expression tree itself.
  *
  * Scale shape: ONE map-side-combinable groupBy(user_id) pivot over the
  * event stream (hot users collapse in the partial aggregate), a
  * per-user explode into |Items|²/2 fixed pair rows, and a second
  * map-side-combinable groupBy(pair). The Bradley–Terry rounds run on
  * the |Items|-row strength table via broadcast joins — no shuffle
  * grows with the corpus, only the first aggregate scans it. */
object PrefOps {

  /** The static contest alphabet (events.event_type), in the fixed
    * fold order every cross-item sum uses. */
  val Items: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Unordered item pairs (i < j alphabetically) — the 10 contests. */
  val Pairs: Seq[(String, String)] =
    for { a <- Items; b <- Items if a < b } yield (a, b)

  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** Per-user engagement counts pivoted to one fixed-width row per
    * judge; absent items count 0 (an abstention-capable judge, not a
    * dropped row). */
  private def perUserCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Items)
      .agg(count(lit(1)))
      .na.fill(0L, Items)

  /** The contest relation: per unordered pair (i < j), how many judges
    * preferred i (`w_i`), how many preferred j (`w_j`), and the decided
    * total `n` (ties abstain, so n ≤ judges). */
  def pairContests(spark: SparkSession, dir: String): DataFrame = {
    val u = perUserCounts(spark, dir)
    val stacked = Pairs.map { case (a, b) =>
      struct(lit(a).as("i"), lit(b).as("j"),
        col(a).as("ci"), col(b).as("cj"))
    }
    u.select(explode(array(stacked: _*)).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        col("c.ci").as("ci"), col("c.cj").as("cj"))
      .groupBy(col("i"), col("j"))
      .agg(
        sum(when(col("ci") > col("cj"), 1L).otherwise(0L)).as("w_i"),
        sum(when(col("cj") > col("ci"), 1L).otherwise(0L)).as("w_j"))
  }

  /** Both-orientation view of [[pairContests]]: one row per ORDERED
    * pair with i's wins and the decided count, decided pairs only. */
  private def orientedRel(spark: SparkSession, dir: String): DataFrame = {
    val c = pairContests(spark, dir)
    c.select(col("i"), col("j"), col("w_i").as("w"),
        (col("w_i") + col("w_j")).as("n"))
      .unionByName(c.select(col("j").as("i"), col("i").as("j"),
        col("w_j").as("w"), (col("w_i") + col("w_j")).as("n")))
      .filter(col("n") > 0)
  }

  /** Win-rate matrix with the Wilson lower confidence bound (z = 1.96):
    * per ordered pair, wins, decided games, raw win rate, and the
    * score-interval lower bound — the release gate preference data
    * ships with (a 9/10 win rate with 10 judges is NOT a 90% item;
    * Wilson says ≥ 60%, and that is the number downstream should see).
    * sqrt is the only root; every op is IEEE-exact and oracle-mirrored. */
  def winrate(spark: SparkSession, dir: String): DataFrame = {
    val nD = dbl(col("n"))
    val p = dbl(col("w")) / nD
    val zz = lit(1.96) * lit(1.96)
    orientedRel(spark, dir).select(col("i"), col("j"), col("w"), col("n"),
      p.as("winrate"),
      ((p + zz / (nD * lit(2.0)) -
        lit(1.96) * sqrt((p * (lit(1.0) - p) + zz / (nD * lit(4.0))) / nD)) /
        (lit(1.0) + zz / nD)).as("wilson_lb"))
      .orderBy("i", "j")
  }

  /** Bradley–Terry strengths by three unrolled minorization-maximization
    * rounds from the uniform start p⁰ = 1:
    *   pᵢ ← Wᵢ / Σ_j nᵢⱼ / (pᵢ + pⱼ)
    * (Hunter 2004's MM update, guaranteed monotone in likelihood). The
    * contest matrix is ONE distributed scan collapsing to ≤ |Items|²
    * bounded rows; the K×K solve then runs on the driver (the PqOps
    * precedent: driver math over statically-bounded scalars), with the
    * per-item denominator written as a left fold in the static item
    * order — the identical IEEE tree the oracle's unrolled CTEs replay.
    * Three rounds is the served report (rank order stabilizes
    * immediately on decided data; the spec pins monotonicity against a
    * planted total order), not a convergence claim. All-loss items keep
    * strength exactly 0 through every round (Wᵢ = 0). */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rel = orientedRel(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val items = Items.filter(t => rel.exists(_._1 == t))
    val wins = items.map(t => t -> rel.filter(_._1 == t).map(_._3).sum).toMap
    val games = items.map(t => t -> rel.filter(_._1 == t).map(_._4).sum).toMap
    val nOf = rel.map { case (i, j, _, n) => (i, j) -> n }.toMap
    var p = items.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      p = items.map { i =>
        val denom = Items.map(j =>
          nOf.get((i, j)).fold(0.0)(n => n.toDouble / (p(i) + p(j))))
          .reduceLeft(_ + _)
        i -> wins(i).toDouble / denom
      }.toMap
    }
    items.sorted.map(i => (i, games(i), wins(i), p(i)))
      .toDF("item", "games", "wins", "strength")
  }
}
