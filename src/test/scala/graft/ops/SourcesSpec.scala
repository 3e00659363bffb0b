package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink round-trips beyond parquet (the reference's at-rest hops —
  * SURVEY.md §2 sources inventory): JSON and CSV read/write preserve the
  * serving-layer schema, and approximate distinct stays within its rsd. */
class SourcesSpec extends SparkSpec {

  test("JSON and CSV sinks/sources round-trip the monthly aggregate") {
    val agg = CoreOps.a1MonthlyAggEvents(spark, Sf0001)
      .withColumn("month", date_format(col("month"), "yyyy-MM-dd HH:mm:ss"))

    val jsonDir = tempDir("agg_json") + "/out"
    agg.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.json(jsonDir)
    assert(fromJson.count() == agg.count())
    assert(fromJson.columns.sorted.toSeq == agg.columns.sorted.toSeq)

    val csvDir = tempDir("agg_csv") + "/out"
    agg.write.mode("overwrite").option("header", true).csv(csvDir)
    val fromCsv = spark.read.option("header", true).option("inferSchema", true).csv(csvDir)
    assert(fromCsv.count() == agg.count())
    assert(fromCsv.columns.sorted.toSeq == agg.columns.sorted.toSeq)
    // values survive the text round-trip
    val a = agg.orderBy("event_type", "month").collect()
    val b = fromCsv.orderBy("event_type", "month").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("event_type") == y.getAs[String]("event_type"))
      assert(math.abs(x.getAs[Double]("total_value") - y.getAs[Double]("total_value")) < 1e-6)
    }
  }

  test("approx_count_distinct within 5% of exact at rsd 1%") {
    val approx = SetOps.g3ApproxDistinct(spark, Sf0001).collect()(0)
    val exact = SetOps.g2CountDistinct(spark, Sf0001).collect()(0).getAs[Long]("n_parts")
    val got = approx.getAs[Long]("approx_parts")
    assert(math.abs(got - exact).toDouble / exact < 0.05, s"approx=$got exact=$exact")
  }

  test("digest-based exact dedup equals text-based exact dedup") {
    val a = DedupOps.exact(spark, Sf0001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = DedupOps.exactDigest(spark, Sf0001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
  }
}
