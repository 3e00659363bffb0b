package graft.functions

import graft.SparkSpec
import graft.ops.SketchOps
import org.apache.spark.sql.functions._

/** Misra–Gries sketch guarantees: planted zipf-ish stream with known
  * heavy hitters, adversarial partitioning, and the coverage/error
  * theorems on real corpus data via the registry gate. */
class MisraGriesSpec extends SparkSpec {

  test("planted stream: every heavy hitter surfaces, estimates are in-bound lower bounds") {
    import spark.implicits._
    // n = 1000: "alpha" 400, "beta" 250, "gamma" 150, 200 singletons
    val stream = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++
      Seq.fill(150)("gamma") ++ (1 to 200).map(i => s"rare$i")
    val k = 9 // floor n/(k+1) = 100 -> alpha/beta/gamma are guaranteed
    val mg = udaf(MisraGriesAggregator(k))
    // adversarial: many partitions, shuffled arrival order
    val sketch = new scala.util.Random(7).shuffle(stream).toDF("term")
      .repartition(13)
      .agg(mg(col("term")).as("s"))
      .select(explode(col("s")).as(Seq("term", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k)
    val truth = Map("alpha" -> 400L, "beta" -> 250L, "gamma" -> 150L)
    truth.foreach { case (t, f) =>
      assert(sketch.contains(t), s"heavy hitter $t missing")
      assert(sketch(t) <= f, s"$t overestimated")
      assert(f - sketch(t) <= 1000L / (k + 1), s"$t error out of bound")
    }
  }

  test("merge is the mergeable-summaries rule: k-bounded and count-conservative") {
    val agg = MisraGriesAggregator(3)
    val a = Map("x" -> 10L, "y" -> 5L, "z" -> 3L)
    val b = Map("x" -> 2L, "w" -> 6L, "v" -> 1L)
    val m = agg.merge(a, b)
    assert(m.size <= 3)
    // summed: x 12, w 6, y 5, z 3, v 1; 4th largest = 3 -> subtract 3
    assert(m == Map("x" -> 9L, "w" -> 3L, "y" -> 2L))
  }

  test("registry gate holds on the real corpus (coverage + error bound)") {
    val g = SketchOps.heavyHittersGate(spark, Sf0001).collect()(0)
    assert(g.getBoolean(2), "MG guarantee violated on corpus")
    assert(g.getInt(1) >= 1, "fixture should have at least one heavy hitter")
  }
}
