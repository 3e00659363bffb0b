package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract plumbing.
  *
  * The image, audio and video-CONTAINER paths are REAL: magic bytes are
  * sniffed and PNG/JPEG/GIF/BMP headers are decoded with `javax.imageio`,
  * WAV/AIFF headers with `javax.sound.sampled` (JDK built-ins), and MP4
  * track dimensions / frame counts with the in-repo ISO-BMFF box parser
  * (`Mp4Parser`) — all header-plane reads, no pixel/sample decode. Only
  * video FRAME decode remains out of scope (the JDK ships no video
  * codec): bytes matching no known signature fall back to a
  * deterministic fake that derives pseudo-dimensions from the raw bytes,
  * which is also what keeps the synthetic text-bytes corpus
  * oracle-expressible in SQL.
  *
  * The Spark-side shape is what matters at scale either way: binary
  * column + metadata struct schema, partition-parallel `mapPartitions`
  * batch decode (the Scala analogue of `mapInPandas` — codec state is
  * per-partition, never per row), and pushdown-friendly metadata
  * filtering *before* any decode touches bytes.
  */
object MultimodalOps {

  /** A decoded media record. `format`/`width`/`height`/`n_frames` are the
    * typed metadata a real decoder fills from the container header. */
  final case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int, n_frames: Int)

  /** Container sniffing on magic bytes — the cheap dispatch a mixed-media
    * lake needs before any codec runs. */
  def sniffImage(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) Some("png")
    else if (bytes.length >= 3 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte &&
        bytes(2) == 0xFF.toByte) Some("jpeg")
    else if (bytes.length >= 6 && bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte) Some("gif")
    else if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) Some("bmp")
    else None

  /** WAV (RIFF/WAVE) and AIFF (FORM/AIFF) magic — parseable with the
    * JDK's `javax.sound.sampled`. */
  def sniffAudio(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 12 && bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
        bytes(8) == 'W'.toByte && bytes(9) == 'A'.toByte &&
        bytes(10) == 'V'.toByte && bytes(11) == 'E'.toByte) Some("wav")
    else if (bytes.length >= 12 && bytes(0) == 'F'.toByte && bytes(1) == 'O'.toByte &&
        bytes(2) == 'R'.toByte && bytes(3) == 'M'.toByte &&
        bytes(8) == 'A'.toByte && bytes(9) == 'I'.toByte && bytes(10) == 'F'.toByte)
      Some("aiff")
    else None

  /** Real audio-header decode via `javax.sound.sampled` (JDK): sample
    * rate, channel count and frame length from the container header.
    * Audio has no pixel box, so the metadata struct is reused as
    * width = sample rate (Hz), height = channels, n_frames = PCM frames
    * (documented convention, pinned by spec). */
  private def decodeAudioHeader(docId: Long, fmt: String, bytes: Array[Byte]): MediaMeta =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      MediaMeta(docId, fmt,
        width = aff.getFormat.getSampleRate.toInt,
        height = aff.getFormat.getChannels,
        n_frames = aff.getFrameLength)
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => decodeStub(docId, bytes)
    }

  /** Real image-header decode: width/height via an ImageReader positioned
    * on the header — pixel planes are never materialized, so the cost per
    * blob is parsing a few dozen bytes. Falls back to the stub if no
    * reader claims the stream (truncated/corrupt container). */
  private def decodeImageHeader(docId: Long, fmt: String, bytes: Array[Byte]): MediaMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          MediaMeta(docId, fmt, r.getWidth(0), r.getHeight(0), 1)
        } finally r.dispose()
      } else decodeStub(docId, bytes)
    } finally iis.close()
  }

  /** Bytes → typed metadata. Dispatch: real `javax.imageio` header decode
    * for recognized image containers, real `javax.sound.sampled` header
    * decode for WAV/AIFF; deterministic stub only for everything else
    * (video codecs don't exist in the JDK — see object doc). */
  def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
    sniffImage(bytes) match {
      case Some(fmt) => decodeImageHeader(docId, fmt, bytes)
      case None => sniffAudio(bytes) match {
        case Some(fmt) => decodeAudioHeader(docId, fmt, bytes)
        case None if Mp4Parser.isMp4(bytes) =>
          Mp4Parser.parse(bytes)
            .map(v => MediaMeta(docId, "mp4", v.width, v.height, v.nFrames))
            .getOrElse(decodeStub(docId, bytes))
        case None => decodeStub(docId, bytes)
      }
    }

  /** Non-image fallback. STUB: derives deterministic pseudo-dimensions
    * from byte 0 and the length so tests and oracles can pin the plumbing
    * on the synthetic (text-bytes) corpus. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val n = bytes.length
    MediaMeta(
      doc_id = docId,
      format = (n % 3) match { case 0 => "img"; case 1 => "audio"; case _ => "video" },
      width = 16 * (1 + b0 % 32),
      height = 16 * (1 + n % 32),
      n_frames = n % 7)
  }

  /** Binary column + metadata projection: text bytes stand in for media
    * blobs. Pure column ops → oracle-able. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast(BinaryType)
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(blob).as("n_bytes"),
        when(octet_length(blob) % 3 === 0, "img")
          .when(octet_length(blob) % 3 === 1, "audio")
          .otherwise("video").as("media_format"))
      .orderBy("doc_id")
  }

  /** Partition-parallel batch decode over any (doc_id, blob) dataset —
    * the reusable kernel entry; codec dispatch per blob, zero shuffle. */
  def decodeBlobs(blobs: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      // codec/reader state is per-partition here; decode() sniffs and
      // dispatches per blob
      it.map { case (id, bytes) => decode(id, bytes) }
    }
  }

  /** Driver-contract form: documents.text bytes as the blob column. The
    * synthetic corpus never matches an image signature, so this path is
    * the stub's pure byte math and stays SQL-expressible for the oracle;
    * real PNG/JPEG blobs through the same plumbing are pinned by spec. */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeBlobs(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
        .as[(Long, Array[Byte])])
      .toDF()
      .orderBy("doc_id")
  }

  /** A "resized" media record: target box + thumbnail byte count. */
  final case class Resized(doc_id: Long, out_w: Int, out_h: Int, n_thumb_bytes: Int)

  /** Aspect-preserving fit of (w, h) into maxW×maxH (never upscale). */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
  }

  /** Real image thumbnail: full decode, bilinear scale into the fit box,
    * re-encode as PNG — all `javax.imageio`/`Graphics2D` (JDK). */
  private def thumbnail(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }

  /** Resize kernel over any (doc_id, blob) dataset: real decode + scale +
    * PNG re-encode for image containers; for non-image blobs the geometry
    * runs on the stub dimensions and the thumbnail payload is stubbed as a
    * truncated byte count (audio/video caveat, see object doc). */
  def resizeBlobs(blobs: Dataset[(Long, Array[Byte])], maxW: Int, maxH: Int): Dataset[Resized] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { case (id, bytes) =>
      val m = decode(id, bytes)
      val (w, h) = fitBox(m.width, m.height, maxW, maxH)
      val nThumb =
        if (sniffImage(bytes).isDefined) thumbnail(bytes, w, h).length
        else math.min(bytes.length, w * h / 8)
      Resized(id, w, h, nThumb)
    })
  }

  /** Driver-contract form of resize on the documents table. */
  def resize(spark: SparkSession, dir: String, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    import spark.implicits._
    resizeBlobs(
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
        .as[(Long, Array[Byte])],
      maxW, maxH)
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling: one row per (stub-)decoded frame — the explode shape
    * a video pipeline fans out before per-frame feature extraction. Pure
    * arithmetic on the byte length → oracle-able. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val blob = col("text").cast(BinaryType)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), (octet_length(blob) % 7).as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }

  // ------------------------------------------------------------------
  // Perceptual image hashing + near-dup pairs (the image-modality dedup)
  // ------------------------------------------------------------------

  /** 64-bit average-hash: decode, area-sample to an 8×8 integer
    * luminance grid, threshold each cell against the grid mean. Small
    * pixel perturbations and re-encodes move few cells across the mean →
    * small Hamming distance; distinct images diverge. All integer
    * arithmetic after decode (sums, floor means), so the hash is
    * deterministic per JVM — engine-internal, rows-only territory, with
    * real planted-PNG behavior pinned by spec. Non-image blobs fall back
    * to a byte-plane hash through the SAME grid math (64 evenly-spaced
    * byte samples as luminance), keeping the operator total. */
  def aHash64(bytes: Array[Byte]): Long = {
    val cells: Array[Long] =
      if (sniffImage(bytes).isDefined) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) byteCells(bytes)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          Array.tabulate(64) { i =>
            val (cx, cy) = (i % 8, i / 8)
            // integer area sample: average the cell's pixel block
            val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
            val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
            var s = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                // integer Rec.601 luma: (299R + 587G + 114B) / 1000
                s += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                  114L * (rgb & 0xff)) / 1000L
                n += 1; x += 1
              }
              y += 1
            }
            s / n
          }
        }
      } else byteCells(bytes)
    val mean = cells.sum / 64
    cells.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > mean) acc | (1L << i) else acc
    }
  }

  private def byteCells(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) Array.fill(64)(0L)
    else Array.tabulate(64) { i =>
      val idx = (i.toLong * bytes.length / 64).toInt
      bytes(idx).toLong & 0xffL
    }

  /** Per-image perceptual hashes over any (doc_id, blob) dataset —
    * narrow mapPartitions kernel (codec dispatch), zero shuffle. */
  def imageHashes(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.map { case (id, b) => (id, aHash64(b)) })
      .toDF("doc_id", "ahash")
  }

  /** Near-duplicate image pairs at Hamming ≤ maxDist: the SimHash
    * pigeonhole pipeline applied to the image modality — the 64-bit hash
    * splits into 4 16-bit bands (d ≤ 3 ⇒ some band is untouched), pairs
    * meet in a (band, value) bucket join, FIRST-AGREEING-BAND ownership
    * emits each pair exactly once (no dedup shuffle), and the exact
    * Hamming check runs in-kernel on the pair. One narrow hash pass +
    * one keyed self-join on 16-bit buckets — never all-pairs. */
  def imageNearDupPairs(blobs: Dataset[(Long, Array[Byte])],
      maxDist: Int = 3): DataFrame = {
    val hashes = imageHashes(blobs)
    val banded = hashes.select(col("doc_id"), col("ahash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bval")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
        col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.band") === array_position(
        zip_with(
          array((0 until 4).map(k => shiftright(col("a.ahash"), k * 16)
            .bitwiseAND(lit(0xffffL))): _*),
          array((0 until 4).map(k => shiftright(col("b.ahash"), k * 16)
            .bitwiseAND(lit(0xffffL))): _*),
          (x, y) => x === y),
        true) - 1)
      .filter(bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))) <= maxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
  }

  /** Driver-contract form over documents.text bytes: per-document
    * perceptual hashes (the synthetic corpus routes through the
    * byte-plane fallback — same plumbing the planted-PNG spec drives
    * with real pixels; its closest byte-plane pair sits at Hamming 7,
    * so the PAIRS form is exercised by the spec, not the corpus).
    * Rows-only: the hash is engine-internal. */
  def imageHashCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageHashes(
      Tables.parallel(spark, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
        .as[(Long, Array[Byte])])
      .orderBy("doc_id")
  }

  /** Value-checked gate for the perceptual-hash kernel (the recall-gate
    * pattern): full corpus coverage, every hash non-null, and
    * blob-functionality — identical payloads hash identically (the
    * first thing a partitioning or kernel-state regression breaks; the
    * aHash is integer-exact, so bitwise equality is the contract). The
    * oracle recomputes the doc/text counts from the input and expects
    * passes = true. */
  def imageHashGate(spark: SparkSession, dir: String): DataFrame =
    TextOps.coverageFunctionalityGate(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")),
      imageHashCorpus(spark, dir),
      col("ahash"),
      col("ahash").isNull)

  // ------------------------------------------------------------------
  // Audio: RIFF/WAVE parsing and PCM frame analysis
  // ------------------------------------------------------------------

  /** PCM frame length for [[audioFrames]]: 160 samples = 10 ms at the
    * 16 kHz synthetic rate — the VAD-standard hop. */
  val AudioFrameSize = 160

  /** Canonical synthetic clip shape: 400 + (doc_id mod 5)·80 mono
    * 16-bit samples at 16 kHz. */
  def synthSampleCount(docId: Long): Int = 400 + (docId % 5).toInt * 80

  /** Sample t of clip docId: every 4th 160-sample frame is digital
    * silence (the planted VAD target); the rest is a full-scale
    * deterministic sawtooth ((docId·31 + t·17) mod 2¹⁶ − 2¹⁵). The
    * closed form is what lets DuckDB re-derive frame energies without
    * parsing a byte — the Spark side must go bytes → RIFF walk → PCM. */
  def synthSample(docId: Long, t: Int): Int =
    if ((t / AudioFrameSize) % 4 == 3) 0
    else (java.lang.Math.floorMod(docId * 31L + t.toLong * 17L, 65536L) - 32768L).toInt

  /** A complete PCM WAV container for the synthetic clip: 44-byte
    * canonical header (RIFF/WAVE, fmt 16-byte PCM block, data chunk)
    * plus little-endian 16-bit samples — byte-valid for any WAV reader
    * including `javax.sound.sampled` (spec-pinned). */
  def synthWav(docId: Long): Array[Byte] = {
    val n = synthSampleCount(docId)
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(16000).putInt(16000 * 2) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var t = 0
    while (t < n) { bb.putShort(synthSample(docId, t).toShort); t += 1 }
    bb.array()
  }

  /** Parsed WAV layout: format fields from the fmt chunk plus the data
    * chunk's position — enough to slice PCM without copying. */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataOffset: Int, dataBytes: Int)

  /** RIFF chunk walk (not a fixed 44-byte assumption): scans the chunk
    * list for `fmt ` (must be PCM format 1) and `data`, tolerating
    * extra chunks and odd-size padding per the RIFF spec. Returns None
    * on anything malformed — truncated header, non-PCM, missing
    * chunks — so corrupt blobs degrade to a skipped row, never a task
    * failure (the decodeStub discipline). */
  def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 12 || sniffAudio(bytes) != Some("wav")) return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = bb.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(pos + 8).toInt
        if (audioFormat != 1) return None // PCM only
        fmt = Some((bb.getShort(pos + 10).toInt, bb.getInt(pos + 12), bb.getShort(pos + 22).toInt))
      } else if (id == "data") data = Some((pos + 8, size))
      pos += 8 + size + (size & 1) // RIFF pads odd chunks
    }
    for ((channels, rate, bits) <- fmt; (off, len) <- data)
      yield WavInfo(rate, channels, bits, off, len)
  }

  /** Per-frame PCM analysis over parsed WAV blobs: exact int64 energy
    * (Σ s²), peak amplitude, and a VAD silence flag (mean square < 1).
    * The synthetic corpus is generated in-flight from doc_id — the
    * REAL work this op demonstrates is the byte-level path every
    * audio-curation pipeline needs: container walk → PCM slice →
    * windowed integer reduction, all inside one mapPartitions with no
    * shuffle (frames inherit the scan's partitioning).
    *
    * All outputs are integers (counts, Σ s², max |s|) → fully
    * hash-oracled: DuckDB re-derives them from the closed-form sample
    * generator, never seeing a byte — agreement proves the parser. */
  def audioFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.parallel(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .flatMap { docId =>
        val bytes = synthWav(docId)
        parseWav(bytes).toSeq.flatMap { info =>
          val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = info.dataBytes / 2
          (0 until (n + AudioFrameSize - 1) / AudioFrameSize).map { f =>
            val lo = f * AudioFrameSize
            val hi = math.min(lo + AudioFrameSize, n)
            var energy = 0L; var peak = 0; var t = lo
            while (t < hi) {
              val s = bb.getShort(info.dataOffset + 2 * t).toInt
              energy += s.toLong * s
              if (math.abs(s) > peak) peak = math.abs(s)
              t += 1
            }
            (docId, f, (hi - lo).toLong, energy, peak,
              energy < (hi - lo).toLong)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_samples", "energy", "peak", "silent")
      .orderBy("doc_id", "frame_idx")
  }

  /** Clip-level rollup: header fields (from the PARSE, proving the
    * container round-trip), duration, and the silence ratio — the
    * audio-curation quality signals (trim candidates, dead-air cut).
    * One aggregate over [[audioFrames]]'s shuffle-free output. */
  def audioStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = Tables.parallel(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .flatMap { docId =>
        parseWav(synthWav(docId)).map(i =>
          (docId, i.sampleRate, i.channels, i.bitsPerSample, (i.dataBytes / 2).toLong))
      }
      .toDF("doc_id", "sample_rate", "channels", "bits", "n_samples")
    val frames = audioFrames(spark, dir)
      .groupBy(col("doc_id").as("fd"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"))
    meta.join(frames, col("doc_id") === col("fd"))
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_samples"),
        (col("n_samples") * 1000L / lit(16000L)).cast(LongType).as("duration_ms"),
        col("n_frames"), col("n_silent"),
        (col("n_silent").cast(DoubleType) / col("n_frames")).as("silence_ratio"))
      .orderBy("doc_id")
  }
}
