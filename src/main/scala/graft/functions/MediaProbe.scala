package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Audio/video container probes over raw `binary` columns — the
  * companions to [[ImageHeader]] that complete the multimodal family's
  * REAL byte kernels across all three modalities (q226 image, q229
  * audio, q230 video). Both are chunk/box walks over public container
  * specs: the probe reads the first kilobyte of metadata a planning pass
  * needs (sample rate, channel layout, duration) and never touches the
  * payload — at 100 TB the codec only ever sees media the plan admitted.
  *
  * WAV (RIFF, little-endian): "RIFF" <size:LE32> "WAVE", then chunks of
  * [id:4][size:LE32][data (word-aligned: odd sizes pad one byte)]. The
  * "fmt " chunk carries format(2) channels(2) sampleRate(4) byteRate(4)
  * blockAlign(2) bitsPerSample(2); the "data" chunk's SIZE is the
  * payload byte count. Note LITTLE-endian throughout — the opposite of
  * PNG/JPEG/MP4, a classic parser trap pinned by the property spec.
  *
  * MP4 (ISO BMFF, big-endian): a sequence of boxes [size:BE32][type:4];
  * size includes the 8-byte header; size==1 switches to a 64-bit
  * largesize, size==0 means to-end-of-file. Movie metadata lives in
  * `moov`, whose CHILD boxes are walked to `mvhd`: version(1) flags(3),
  * then v0: ctime(4) mtime(4) timescale(4) duration(4) — v1 widens the
  * times and duration to 8 bytes but NOT timescale.
  */
case class WavHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_header expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WavHeader.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.WavHeader.parse($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavHeader {
  /** Unparseable sentinel (a real probe never packs all-zero fields:
    * sample_rate >= 1 is enforced below). */
  final val Unknown = 0L

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  @inline private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    u8(b, i) == s.charAt(0) && u8(b, i + 1) == s.charAt(1) &&
      u8(b, i + 2) == s.charAt(2) && u8(b, i + 3) == s.charAt(3)

  /** rate(20 bits) | channels(4) | bitsPerSample(6) | dataBytes(32) —
    * 62 bits; dataBytes' 32-bit width matches RIFF's own size field. */
  def pack(rate: Long, ch: Long, bits: Long, dataBytes: Long): Long =
    (rate << 42) | (ch << 38) | (bits << 32) | dataBytes

  /** One definition of truth for interpreted eval AND codegen. */
  def parse(b: Array[Byte]): Long = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return Unknown
    var rate = -1L; var ch = -1L; var bits = -1L; var data = -1L
    var i = 12
    while (i + 8 <= b.length && (rate < 0 || data < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return Unknown
        ch = le16(b, i + 10).toLong
        rate = le32(b, i + 12)
        bits = le16(b, i + 22).toLong
      } else if (tag(b, i, "data")) {
        data = size
      }
      // chunks are WORD-aligned: an odd size pads one byte. Advance in
      // Long space: `size` is an unsigned 32-bit value, and a .toInt
      // truncation (e.g. size 0xFFFFFFF8 => step 0) would stall the walk
      // forever on crafted input. Clamping the overshoot to b.length
      // keeps strict forward progress AND ends the loop.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next >= b.length.toLong) b.length else next.toInt
    }
    if (rate < 1 || rate >= (1L << 20) || ch < 1 || ch > 15 ||
        bits < 1 || bits > 63 || data < 0) Unknown
    else pack(rate, ch, bits, data)
  }
}

case class Mp4Mvhd(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mp4_mvhd expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Mp4Mvhd.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.Mp4Mvhd.parse($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Mvhd {
  final val Unknown = 0L

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  @inline private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    u8(b, i) == s.charAt(0) && u8(b, i + 1) == s.charAt(1) &&
      u8(b, i + 2) == s.charAt(2) && u8(b, i + 3) == s.charAt(3)

  /** timescale(32 bits) | duration(31 bits). A v0 mvhd duration is
    * 32-bit unsigned; values >= 2^31 (and v1 64-bit durations past it)
    * return Unknown rather than silently truncating. */
  def pack(timescale: Long, duration: Long): Long =
    (timescale << 31) | duration

  /** One definition of truth for interpreted eval AND codegen. */
  def parse(b: Array[Byte]): Long = {
    // top-level box walk to moov
    var i = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i)
      if (size == 1 || size == 0)
        return Unknown // largesize / to-EOF: valid MP4, out of probe scope
      if (size < 8) return Unknown
      if (tag(b, i + 4, "moov")) {
        // child box walk to mvhd, bounded by moov's own extent
        val end = math.min(i + size, b.length.toLong).toInt
        var j = i + 8
        while (j + 8 <= end) {
          val csize = be32(b, j)
          if (csize < 8) return Unknown
          if (tag(b, j + 4, "mvhd")) {
            val v = if (j + 8 < end) u8(b, j + 8) else return Unknown
            if (v == 0) {
              // version(1) flags(3) ctime(4) mtime(4) timescale(4) dur(4)
              if (j + 8 + 20 > end) return Unknown
              val ts = be32(b, j + 20)
              val dur = be32(b, j + 24)
              if (ts < 1 || dur >= (1L << 31)) return Unknown
              return pack(ts, dur)
            } else if (v == 1) {
              // v1: ctime(8) mtime(8) timescale(4) duration(8)
              if (j + 8 + 32 > end) return Unknown
              val ts = be32(b, j + 28)
              val durHi = be32(b, j + 32)
              val durLo = be32(b, j + 36)
              if (ts < 1 || durHi != 0 || durLo >= (1L << 31)) return Unknown
              return pack(ts, durLo)
            } else return Unknown
          }
          // Long-space advance: csize is unsigned 32-bit; a .toInt
          // truncation of csize >= 2^31 steps BACKWARD and two crafted
          // boxes can cycle between offsets forever. A child that
          // overruns its parent's extent is malformed => Unknown.
          val nextJ = j.toLong + csize
          if (nextJ > end.toLong) return Unknown
          j = nextJ.toInt
        }
        return Unknown // moov without mvhd
      }
      // Long-space advance (same crafted-input trap as the child walk):
      // a top-level box that overruns the buffer means no moov follows.
      val next = i.toLong + size
      if (next > b.length.toLong) return Unknown
      i = next.toInt
    }
    Unknown
  }
}
