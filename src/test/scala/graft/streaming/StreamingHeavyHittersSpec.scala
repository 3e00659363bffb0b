package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming Misra–Gries sketch must keep its coverage guarantee
  * over a stream delivered in adversarial micro-batch order. */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("streamed sketch surfaces every heavy hitter with in-bound estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // n = 1000 split across 4 skewed micro-batches: alpha 400, beta 250,
    // gamma 150, 200 singletons; k = 9 -> floor n/10 = 100
    val input = MemoryStream[String]
    val sketchDf = StreamingHeavyHitters.sketchStream(
      input.toDF().select(col("value").as("term")), k = 9)

    val q = sketchDf.writeStream.format("memory")
      .queryName("hh_sketch").outputMode("complete").start()
    try {
      // batch 1: rare terms only — the sketch fills with noise first
      input.addData((1 to 200).map(i => s"rare$i"): _*)
      q.processAllAvailable()
      // batches 2-4: the heavy mass arrives after the noise
      input.addData(Seq.fill(400)("alpha"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(250)("beta"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(150)("gamma"): _*)
      q.processAllAvailable()

      val sketch = spark.table("hh_sketch")
        .select(explode(col("sketch")).as(Seq("term", "est")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sketch.size <= 9)
      Map("alpha" -> 400L, "beta" -> 250L, "gamma" -> 150L).foreach {
        case (t, f) =>
          assert(sketch.contains(t), s"heavy hitter $t missing after streaming")
          assert(sketch(t) <= f && f - sketch(t) <= 1000L / 10,
            s"$t estimate ${sketch.get(t)} out of bound for true $f")
      }
    } finally q.stop()
  }
}
