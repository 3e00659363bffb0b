package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract plumbing.
  *
  * No real media libraries exist in this container (and none of the test
  * tables carry real media), so the DECODE KERNEL IS A STUB — a
  * deterministic fake that derives "dimensions" from the raw bytes. The
  * Spark-side plumbing is real and is what matters at scale: binary
  * column + metadata struct schema, partition-parallel `mapPartitions`
  * batch decode (the Scala analogue of `mapInPandas` — one kernel call
  * per partition batch, not per row), and pushdown-friendly metadata
  * filtering *before* any decode touches bytes.
  */
object MultimodalOps {

  /** A decoded media record. `format`/`width`/`height`/`n_frames` are the
    * typed metadata; real decoders would fill them from the container
    * header. */
  final case class MediaMeta(doc_id: Long, format: String, width: Int, height: Int, n_frames: Int)

  /** Bytes → fake metadata. STUB: a real implementation would hand the
    * byte buffer to an image/audio codec; this derives deterministic
    * pseudo-dimensions from byte 0 and the length so tests and oracles
    * can pin the plumbing. */
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

  /** Partition-parallel batch "decode": binary blobs → typed metadata via
    * mapPartitions (kernel amortized per batch, never per row; zero
    * shuffle). The stub's outputs are pure functions of the bytes, so the
    * same result is SQL-expressible for the oracle. */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[(Long, Array[Byte])] = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]
    blobs
      .mapPartitions { it =>
        // real pipeline: init codec once per partition here, decode in
        // batches; stub: per-record pure function
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** A "resized" media record: target box + stub thumbnail bytes. */
  final case class Resized(doc_id: Long, out_w: Int, out_h: Int, n_thumb_bytes: Int)

  /** Resize-to-fit plumbing: aspect-preserving fit into maxW×maxH computed
    * from the (stub-)decoded dimensions, thumbnail payload STUBBED as a
    * truncated copy of the source bytes. The geometry math is real. */
  def resizeStub(spark: SparkSession, dir: String, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = decodeStub(id, bytes)
        val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
        val w = math.max(1, (m.width * scale).toInt)
        val h = math.max(1, (m.height * scale).toInt)
        Resized(id, w, h, math.min(bytes.length, w * h / 8))
      })
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
}
