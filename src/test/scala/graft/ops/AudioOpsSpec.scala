package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAV container + PCM frame-analysis semantics: the synthetic clips
  * must be REAL WAV files (javax.sound agrees), the RIFF walker must
  * tolerate spec-legal layouts and reject malformed ones, and the frame
  * energies must match a sample-level recompute. */
class AudioOpsSpec extends SparkSpec {
  import MultimodalOps._

  test("synthWav is a valid WAV: javax.sound and the existing decode path agree") {
    val docId = 7L
    val bytes = synthWav(docId)
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(aff.getFormat.getSampleRate == 16000f)
    assert(aff.getFormat.getChannels == 1)
    assert(aff.getFrameLength == synthSampleCount(docId))
    // the corpus decode dispatcher routes it through the audio branch
    val meta = decode(docId, bytes)
    assert(meta == MediaMeta(docId, "wav", 16000, 1, synthSampleCount(docId)))
  }

  test("parseWav: chunk walk skips extras, honors odd padding, rejects malformed") {
    val base = synthWav(3L)
    val info = parseWav(base).get
    assert(info == WavInfo(16000, 1, 16, 44, synthSampleCount(3L) * 2))
    // inject a 5-byte junk chunk (odd size → 1 pad byte) between WAVE and fmt
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val padded = base.take(12) ++ junk ++ base.drop(12)
    val bb = java.nio.ByteBuffer.wrap(padded).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, padded.length - 8) // fix RIFF size
    val shifted = parseWav(padded).get
    assert(shifted.copy(dataOffset = shifted.dataOffset - junk.length) == info)
    // truncated data chunk → None
    assert(parseWav(base.dropRight(10)).isEmpty)
    // non-PCM format tag → None
    val float = base.clone()
    java.nio.ByteBuffer.wrap(float).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3)
    assert(parseWav(float).isEmpty)
    assert(parseWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audioFrames: energies equal a sample-level recompute, silent frames land on idx % 4 == 3") {
    import spark.implicits._
    val dir = tempDir("audio_docs")
    Seq((0L, "a", "en", "src0", 1L), (2L, "b", "en", "src0", 1L), (4L, "c", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = audioFrames(spark, dir).collect()
    for (docId <- Seq(0L, 2L, 4L)) {
      val n = synthSampleCount(docId)
      val frames = got.filter(_.getLong(0) == docId)
      assert(frames.length == (n + AudioFrameSize - 1) / AudioFrameSize)
      frames.foreach { r =>
        val f = r.getInt(1)
        val lo = f * AudioFrameSize; val hi = math.min(lo + AudioFrameSize, n)
        val samples = (lo until hi).map(synthSample(docId, _))
        assert(r.getLong(2) == hi - lo)
        assert(r.getLong(3) == samples.map(s => s.toLong * s).sum)
        assert(r.getInt(4) == samples.map(math.abs).max)
        assert(r.getBoolean(5) == (f % 4 == 3))
      }
    }
  }

  test("audioStats: header fields survive the round-trip; silence ratio by clip class") {
    val rows = audioStats(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docId = r.getLong(0)
      val n = synthSampleCount(docId)
      assert(r.getInt(1) == 16000 && r.getInt(2) == 1 && r.getInt(3) == 16)
      assert(r.getLong(4) == n)
      assert(r.getLong(5) == n.toLong * 1000 / 16000)
      val nFrames = (n + AudioFrameSize - 1) / AudioFrameSize
      val nSilent = (0 until nFrames).count(_ % 4 == 3)
      assert(r.getLong(6) == nFrames && r.getLong(7) == nSilent)
      assert(r.getDouble(8) == nSilent.toDouble / nFrames)
    }
  }
}
