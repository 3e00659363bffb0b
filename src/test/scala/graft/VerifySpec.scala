package graft

import java.nio.file.Files

/** The Verify dump's no-silent-absence contract: a registered query that
  * THROWS must still leave a parquet behind (the `__graft_error` marker),
  * so the driver's correctness gate records a red row instead of simply
  * omitting the entry — the hole that hid a dead query for a full round. */
class VerifySpec extends SparkSpec {

  test("a throwing query writes the __graft_error marker, a good one writes rows") {
    val out = Files.createTempDirectory("verify_spec").toString

    val err = Verify.dumpOne(spark, "boom",
      (_, _) => throw new IllegalStateException("planted failure"),
      Sf0001, out)
    assert(err.exists(_.contains("planted failure")))
    val marker = spark.read.parquet(s"$out/boom")
    assert(marker.columns.toSeq == Seq("__graft_error"))
    assert(marker.count() == 1)
    assert(marker.head().getString(0).contains("planted failure"))

    val ok = Verify.dumpOne(spark, "d4_count",
      Registry.byName("d4_count").build, Sf0001, out)
    assert(ok.isEmpty)
    assert(spark.read.parquet(s"$out/d4_count").count() > 0)
  }
}
