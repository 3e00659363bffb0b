package graft.streaming

import graft.SparkSpec
import graft.ops.{Tables, UpsertOps}
import org.apache.spark.sql.functions._

/** The streamed delta-log MV must serve exactly the batch view: decimal
  * partials are order-free, so epoch slicing cannot change the rows. */
class StreamingMvJoinSpec extends SparkSpec {

  private def liCols = Seq("l_orderkey", "l_extendedprice")

  test("streamed commits serve the same view as the batch IVM and the recompute") {
    val orders = Tables(spark, Sf0001, "orders")
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Tables(spark, Sf0001, "lineitem").select(liCols.head, liCols.tail: _*)

    val srcDir = tempDir("mvj_src") + "/li"
    li.repartition(4).write.parquet(srcDir)
    val sinkDir = tempDir("mvj_sink") + "/out"

    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1) // several epochs, not one
      .schema(li.schema).parquet(srcDir)
    StreamingMvJoin.maintain(orders, stream, sinkDir).awaitTermination()

    // more than one commit landed (the point is merging across epochs)
    val nCommits = new java.io.File(sinkDir).listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(nCommits > 1, s"need several epochs, got $nCommits")

    def fmt(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getLong(3))).toSeq
    val served = fmt(StreamingMvJoin.readMv(spark, sinkDir).collect())
    // batch IVM (which is itself oracle-pinned to the plain recompute)
    val batch = fmt(UpsertOps.mvJoinIncremental(spark, Sf0001).collect())
    assert(served.nonEmpty && served == batch)

  }

  test("a replayed epoch replaces its commit — the served view cannot double-fold") {
    val orders = Tables(spark, Sf0001, "orders")
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Tables(spark, Sf0001, "lineitem").select(liCols.head, liCols.tail: _*)
    val sinkDir = tempDir("mvj_replay") + "/out"
    val sliceA = li.filter(col("l_orderkey") % 3 === 0)
    val sliceB = li.filter(col("l_orderkey") % 3 =!= 0)
    StreamingMvJoin.writeBatch(orders, sliceA, 0L, sinkDir)
    StreamingMvJoin.writeBatch(orders, sliceB, 1L, sinkDir)
    val before = StreamingMvJoin.readMv(spark, sinkDir).collect().toSeq
    // at-least-once delivery re-runs epoch 0 with the same rows: the
    // overwrite replaces the commit instead of appending a second copy
    StreamingMvJoin.writeBatch(orders, sliceA, 0L, sinkDir)
    assert(StreamingMvJoin.readMv(spark, sinkDir).collect().toSeq == before)
  }
}
