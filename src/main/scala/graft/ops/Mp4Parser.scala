package graft.ops

/** Minimal ISO-BMFF (MP4) box parser — container METADATA without any
  * codec: track pixel dimensions from `tkhd`, movie duration from
  * `mvhd`, and the video frame count from the sample table's `stts`
  * entries. Box layout is the published ISO/IEC 14496-12 structure:
  * each box is [size:u32be][type:4cc][payload], children nest inside
  * container boxes (`moov`, `trak`, `mdia`, `minf`, `stbl`).
  *
  * This is header-plane work, same discipline as the image/audio paths:
  * a few hundred bytes touched per blob regardless of media size.
  * Decoding actual frames would need a codec the JDK doesn't ship —
  * that (and only that) remains out of scope. */
object Mp4Parser {

  final case class VideoMeta(width: Int, height: Int, nFrames: Int, durationSec: Double)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Top-level sniff: an ftyp box in leading position. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Find each direct child box [type → (payloadStart, payloadEnd)) in
    * [start, end). */
  private def children(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = start
    while (o + 8 <= end) {
      val size = be32(b, o)
      if (size < 8 || o + size > end) return out.result() // malformed: stop cleanly
      out += ((fourcc(b, o + 4), o + 8, o + size.toInt))
      o += size.toInt
    }
    out.result()
  }

  private def find(b: Array[Byte], start: Int, end: Int, tpe: String): Option[(Int, Int)] =
    children(b, start, end).collectFirst { case (t, s, e) if t == tpe => (s, e) }

  def parse(b: Array[Byte]): Option[VideoMeta] =
    if (!isMp4(b)) None
    else find(b, 0, b.length, "moov").flatMap { case (ms, me) =>
      val duration = find(b, ms, me, "mvhd").flatMap { case (s, e) =>
        val v = b(s) & 0xff
        // v0: timescale@s+12, duration:u32@s+16; v1: 8-byte times → @s+20/+24
        if (v == 0 && e - s >= 20) Some(be32(b, s + 16).toDouble / be32(b, s + 12).toDouble)
        else if (v == 1 && e - s >= 32)
          Some(((be32(b, s + 24) << 32) | be32(b, s + 28)).toDouble / be32(b, s + 20).toDouble)
        else None
      }
      val track = children(b, ms, me).collect { case ("trak", ts, te) =>
        val dims = find(b, ts, te, "tkhd").flatMap { case (s, e) =>
          val v = b(s) & 0xff
          val wOff = if (v == 1) s + 88 else s + 76 // matrix end → 16.16 width, height
          if (e - wOff >= 8) Some(((be32(b, wOff) >> 16).toInt, (be32(b, wOff + 4) >> 16).toInt))
          else None
        }
        val frames = for {
          (mds, mde) <- find(b, ts, te, "mdia")
          (mns, mne) <- find(b, mds, mde, "minf")
          (sts, ste) <- find(b, mns, mne, "stbl")
          (ss, se) <- find(b, sts, ste, "stts")
        } yield {
          val n = be32(b, ss + 4).toInt // entry count after version/flags
          (0 until n).foldLeft(0L) { (acc, i) =>
            val off = ss + 8 + i * 8
            if (off + 8 <= se) acc + be32(b, off) else acc // entry = (count, delta)
          }
        }
        (dims, frames)
      }.collectFirst { case (Some((w, h)), f) if w > 0 && h > 0 => (w, h, f.getOrElse(0L)) }
      track.map { case (w, h, f) =>
        VideoMeta(w, h, f.toInt, duration.getOrElse(0.0))
      }
    }
}
