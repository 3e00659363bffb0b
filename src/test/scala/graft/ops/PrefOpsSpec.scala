package graft.ops

import graft.SparkSpec

/** Pairwise-preference mining + Bradley–Terry: planted-judge fixtures
  * with hand-computed contests, Wilson bounds, and strength orderings. */
class PrefOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val t0 = ts("2024-01-05 00:00:00")

  /** Write an events fixture from (user, event_type, repeat) triples. */
  private def plant(name: String, rows: Seq[(Long, String, Int)]): String = {
    import spark.implicits._
    val fix = tempDir(name)
    rows.flatMap { case (u, t, k) => Seq.fill(k)((u, t0, t, 1.0)) }
      .toDF("user_id", "ts", "event_type", "value").repartition(3)
      .write.mode("overwrite").parquet(s"$fix/events.parquet")
    fix
  }

  test("pair contests: counts decide, ties abstain, absent types count 0") {
    // u1: click 2 view 1 → click beats view; u2: click 1 view 1 → abstains;
    // u3: view 3 only → view beats click (absent = 0); all three judges
    // decide click vs error (0) except u3 (0 = 0 tie).
    val fix = plant("pref_contests", Seq(
      (1L, "click", 2), (1L, "view", 1),
      (2L, "click", 1), (2L, "view", 1),
      (3L, "view", 3)))
    val got = PrefOps.pairContests(spark, fix).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("click", "view")) == ((1L, 1L)), s"got $got")  // u1 → click, u2 ties, u3 → view
    assert(got(("click", "error")) == ((2L, 0L)), s"got $got") // u1, u2 decide; u3 ties 0=0
    assert(got(("signup", "view")) == ((0L, 3L)), s"got $got") // view>0 beats absent signup for all three? u2 has view 1 yes
  }

  test("winrate: Wilson lower bound matches an independent double replay") {
    // 10 judges on (click, view): 8 prefer click, 2 prefer view
    val fix = plant("pref_wilson",
      (1 to 8).map(u => Seq((u.toLong, "click", 2), (u.toLong, "view", 1))).flatten ++
        Seq(9L, 10L).map(u => Seq((u, "click", 1), (u, "view", 2))).flatten)
    val row = PrefOps.winrate(spark, fix).collect()
      .find(r => r.getString(0) == "click" && r.getString(1) == "view").get
    assert(row.getLong(2) == 8L && row.getLong(3) == 10L)
    assert(row.getDouble(4) == 0.8)
    // independent replay of the fixed expression tree in plain doubles
    val n = 10.0; val p = 8.0 / n; val zz = 1.96 * 1.96
    val lb = (p + zz / (n * 2.0) -
      1.96 * math.sqrt((p * (1.0 - p) + zz / (n * 4.0)) / n)) / (1.0 + zz / n)
    assert(row.getDouble(5) == lb, s"got ${row.getDouble(5)} want $lb")
    assert(lb > 0.47 && lb < 0.51) // the 8-of-10 lesson: 80% raw → ~49% floor
  }

  test("bradley-terry: planted total order yields strictly ordered strengths") {
    // every judge: click(3) > error(2) > purchase(1) > signup = view (absent)
    val fix = plant("pref_bt_order", (1L to 6L).flatMap(u =>
      Seq((u, "click", 3), (u, "error", 2), (u, "purchase", 1))))
    val s = PrefOps.bradleyTerry(spark, fix).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(s("click") > s("error") && s("error") > s("purchase"),
      s"strengths not ordered: $s")
    // all-loss items: zero wins pin strength to exactly 0 through every round
    assert(s("signup") == 0.0 && s("view") == 0.0, s"got $s")
    assert(s("purchase") > 0.0)
  }

  test("bradley-terry: symmetric evidence yields equal strengths") {
    // two judges with opposite click/error preferences — 1 win each
    val fix = plant("pref_bt_sym", Seq(
      (1L, "click", 2), (1L, "error", 1),
      (2L, "click", 1), (2L, "error", 2)))
    val s = PrefOps.bradleyTerry(spark, fix).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(s("click") == s("error"), s"asymmetric strengths: $s")
  }
}
