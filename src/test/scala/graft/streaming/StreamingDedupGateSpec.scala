package graft.streaming

import graft.SparkSpec
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** The streaming dedup gate must agree with the batch index probe
  * document-for-document on the same materialized index. */
class StreamingDedupGateSpec extends SparkSpec {
  import spark.implicits._

  test("stream gate verdicts == batch probe; clean docs pass, dups flag their twin") {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val near = base.replace("dog", "cat")
    val corpus = Seq(
      (0L, base, "en", "s", base.length.toLong),
      (3L, "completely different words about spark query engines and shuffles everywhere", "en", "s", 78L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val idxDir = tempDir("gate_idx") + "/idx"
    DedupOps.buildMinhashIndexOf(corpus, idxDir)

    val batch = Seq(
      (10L, near, "en", "s", near.length.toLong),       // near-dup of 0
      (11L, base, "en", "s", base.length.toLong),       // exact dup of 0
      (12L, "entirely novel content discussing window functions and watermarks", "en", "s", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val srcDir = tempDir("gate_src") + "/q"
    batch.write.parquet(srcDir)
    val sinkDir = tempDir("gate_sink") + "/out"

    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)
    StreamingDedupGate.serve(idxDir, stream, sinkDir).awaitTermination()

    def readSink() = spark.read.parquet(sinkDir).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getBoolean(2))).toSeq
    val got = readSink()
    assert(got == Seq((10L, Some(0L), true), (11L, Some(0L), true), (12L, None, false)),
      s"unexpected verdicts: $got")
    // at-least-once replay must replace, not append
    StreamingDedupGate.writeBatch(idxDir, batch, 0L, sinkDir)
    assert(readSink() == got, "replayed batch must not duplicate the sink")
  }
}
