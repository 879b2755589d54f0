package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Mp4Mvhd, WavHeader}

/** Property tests for the WAV/MP4 probe kernels over synthesized
  * containers — adversarial layouts the corpus-derived q229/q230 cannot
  * force: random chunk/box walks, ODD RIFF chunk sizes (word-alignment),
  * mvhd v0 vs v1 layouts, mvhd at random child positions, truncations,
  * and size-field lies. Pure JVM (the kernels' shared parse methods are
  * the single definition of truth for eval and codegen; q226's spec
  * already pins codegen==interpreted for this expression family). */
class MediaProbePropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default

  private def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long) = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def be32(v: Long) = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes ++ le32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])

  private def wav(rate: Long, ch: Int, bits: Int, dataBytes: Long,
      pre: Seq[Array[Byte]], withPayload: Boolean): Array[Byte] = {
    val fmt = le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
    val data = "data".getBytes ++ le32(dataBytes) ++
      (if (withPayload) new Array[Byte](dataBytes.toInt) else Array.empty[Byte])
    val body = "WAVE".getBytes ++ pre.flatten ++ chunk("fmt ", fmt) ++ data
    "RIFF".getBytes ++ le32(body.length.toLong) ++ body
  }

  test("property: 150 random WAVs with odd-sized pre-chunks parse exactly") {
    val gen = Gen.listOfN(150, for {
      rate <- Gen.oneOf(8000L, 16000L, 22050L, 44100L, 48000L, 96000L)
      ch <- Gen.choose(1, 8)
      bits <- Gen.oneOf(8, 16, 24, 32)
      nData <- Gen.choose(0L, 100000L)
      nPre <- Gen.choose(0, 3)
      pres <- Gen.listOfN(nPre, for {
        id <- Gen.oneOf("LIST", "bext", "junk", "fact")
        n <- Gen.choose(0, 41) // odd sizes included — the alignment trap
        d <- Gen.listOfN(n, Gen.choose(0, 255))
      } yield (id, d.map(_.toByte).toArray))
      payload <- Gen.oneOf(true, false)
    } yield (rate, ch, bits, nData, pres, payload))
    gen.pureApply(params, Seed(17L)).zipWithIndex.foreach {
      case ((rate, ch, bits, nData, pres, payload), i) =>
        val b = wav(rate, ch, bits, nData,
          pres.map(p => chunk(p._1, p._2)), payload && nData < 4096)
        val got = WavHeader.parse(b)
        assert(got == WavHeader.pack(rate, ch, bits, nData),
          s"case $i (rate=$rate ch=$ch bits=$bits data=$nData " +
            s"pre=${pres.map(_._2.length)}): odd-size padding desync?")
    }
  }

  test("WAV adversarial streams are unknown, truncations never throw") {
    assert(WavHeader.parse(Array.empty) == WavHeader.Unknown)
    assert(WavHeader.parse("RIFFxxxxAVI ".getBytes) == WavHeader.Unknown)
    // fmt chunk that claims 16 bytes but the buffer ends early
    val lying = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2)
    assert(WavHeader.parse(lying) == WavHeader.Unknown)
    // data chunk but no fmt: geometry unavailable
    val noFmt = "RIFF".getBytes ++ le32(16) ++ "WAVE".getBytes ++
      chunk("data", new Array[Byte](4))
    assert(WavHeader.parse(noFmt) == WavHeader.Unknown)
    val full = wav(44100L, 2, 16, 1000L,
      Seq(chunk("LIST", new Array[Byte](7))), withPayload = false)
    (0 until full.length).foreach { n =>
      WavHeader.parse(full.take(n)) // must not throw
    }
  }

  test("WAV crafted chunk sizes near 2^32 terminate (no zero-step stall)") {
    // ADVICE r10: size 0xFFFFFFF8 truncated to Int makes the walk step
    // exactly 0 (8 + (-8) + 0); 0xFFFFFFF7 steps 0 via the odd-pad
    // (8 + (-9) + 1). Both previously hung the executor thread forever.
    Seq(0xFFFFFFF8L, 0xFFFFFFF7L, 0xFFFFFFFFL, 0x80000000L).foreach { sz =>
      val b = "RIFF".getBytes ++ le32(0x10000L) ++ "WAVE".getBytes ++
        "junk".getBytes ++ le32(sz)
      assert(WavHeader.parse(b) == WavHeader.Unknown, f"size=0x$sz%08X")
    }
    // a fmt already parsed, then a crafted huge trailing chunk: the walk
    // must still terminate (data never found => Unknown)
    val fmt = le16(1) ++ le16(2) ++ le32(44100L) ++
      le32(44100L * 2 * 16 / 8) ++ le16(2 * 16 / 8) ++ le16(16)
    val b2 = "RIFF".getBytes ++ le32(0x10000L) ++ "WAVE".getBytes ++
      chunk("fmt ", fmt) ++ "junk".getBytes ++ le32(0xFFFFFFF8L)
    assert(WavHeader.parse(b2) == WavHeader.Unknown)
  }

  private def box(tpe: String, content: Array[Byte]): Array[Byte] =
    be32(content.length + 8L) ++ tpe.getBytes ++ content

  private def mvhd(v: Int, ts: Long, dur: Long): Array[Byte] = {
    val body =
      if (v == 0) Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(ts) ++ be32(dur) ++ new Array[Byte](80)
      else Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(ts) ++ be32(dur >> 32) ++ be32(dur & 0xFFFFFFFFL) ++
        new Array[Byte](80)
    box("mvhd", body)
  }

  test("property: 150 random MP4 box walks (v0/v1, mvhd at any child slot)") {
    val gen = Gen.listOfN(150, for {
      ts <- Gen.oneOf(600L, 1000L, 25L, 48000L, 90000L, 1L)
      dur <- Gen.choose(0L, (1L << 31) - 1)
      v <- Gen.oneOf(0, 1)
      nTop <- Gen.choose(0, 2) // boxes before moov
      tops <- Gen.listOfN(nTop, Gen.choose(0, 50))
      nKids <- Gen.choose(0, 3) // children before mvhd inside moov
      kids <- Gen.listOfN(nKids, Gen.choose(0, 30))
      kidsAfter <- Gen.choose(0, 20)
    } yield (ts, dur, v, tops, kids, kidsAfter))
    gen.pureApply(params, Seed(19L)).zipWithIndex.foreach {
      case ((ts, dur, v, tops, kids, kidsAfter), i) =>
        val pre = tops.map(n => box("free", new Array[Byte](n)))
          .flatten.toArray
        val moovKids = kids.map(n => box("udta", new Array[Byte](n)))
          .flatten.toArray ++ mvhd(v, ts, dur) ++
          box("trak", new Array[Byte](kidsAfter))
        val b = box("ftyp", "isom".getBytes ++ be32(0x200) ++
          "isomiso2".getBytes) ++ pre ++ box("moov", moovKids)
        assert(Mp4Mvhd.parse(b) == Mp4Mvhd.pack(ts, dur),
          s"case $i (v=$v ts=$ts dur=$dur kids=${kids.size})")
    }
  }

  test("MP4 adversarial streams are unknown, truncations never throw") {
    assert(Mp4Mvhd.parse(Array.empty) == Mp4Mvhd.Unknown)
    assert(Mp4Mvhd.parse("nota realmp4file".getBytes) == Mp4Mvhd.Unknown)
    // moov without mvhd
    val noMvhd = box("moov", box("udta", new Array[Byte](4)))
    assert(Mp4Mvhd.parse(noMvhd) == Mp4Mvhd.Unknown)
    // v1 duration past 2^31 must refuse, not truncate
    val big = box("moov", mvhd(1, 600L, (1L << 31) + 5))
    assert(Mp4Mvhd.parse(big) == Mp4Mvhd.Unknown)
    // largesize (size==1) is out of probe scope, not garbage
    val largesize = be32(1) ++ "mdat".getBytes ++ new Array[Byte](16)
    assert(Mp4Mvhd.parse(largesize) == Mp4Mvhd.Unknown)
    // size field smaller than a header (would walk backwards)
    val tiny = be32(3) ++ "free".getBytes
    assert(Mp4Mvhd.parse(tiny) == Mp4Mvhd.Unknown)
    val full = box("ftyp", "isom".getBytes) ++
      box("moov", box("udta", new Array[Byte](3)) ++ mvhd(0, 600L, 1234L))
    (0 until full.length).foreach { n =>
      Mp4Mvhd.parse(full.take(n)) // must not throw
    }
  }

  test("MP4 crafted box sizes >= 2^31 terminate (no offset cycling)") {
    // ADVICE r10: size.toInt truncation of sizes >= 2^31 steps the walk
    // BACKWARD — two crafted boxes could cycle between offsets forever.
    // Top-level: one box whose size wraps negative when truncated.
    val top = be32(0xFFFFFFCEL) ++ "free".getBytes ++ new Array[Byte](120)
    assert(Mp4Mvhd.parse(top) == Mp4Mvhd.Unknown)
    // The exact two-box cycle from the advisory: a box at offset 100
    // stepping back to 50, the box at 50 stepping forward to 100.
    val cyc = new Array[Byte](160)
    def put(i: Int, a: Array[Byte]): Unit =
      System.arraycopy(a, 0, cyc, i, a.length)
    put(0, be32(50) ++ "free".getBytes)           // 0 -> 50
    put(50, be32(50) ++ "free".getBytes)          // 50 -> 100
    put(100, be32(0xFFFFFFCEL) ++ "free".getBytes) // 100 -> (toInt) 50: cycle
    assert(Mp4Mvhd.parse(cyc) == Mp4Mvhd.Unknown)
    // Child walk: moov whose first child declares a size >= 2^31.
    val kid = be32(0x80000010L) ++ "udta".getBytes ++ new Array[Byte](40)
    val m = box("moov", kid ++ mvhd(0, 600L, 77L))
    assert(Mp4Mvhd.parse(m) == Mp4Mvhd.Unknown)
  }

  // ----- EBML (vint-walk) kernel ---------------------------------------

  /** Size vint of an EXPLICIT width w (EBML allows non-minimal widths —
    * a 1-value may legally ride an 8-byte vint; the kernel must read the
    * width from the leading zeros, not assume minimal encoding). */
  private def vint(v: Long, w: Int): Array[Byte] = {
    val out = new Array[Byte](w)
    var x = v | (1L << (7 * w)) // set the marker bit above the value bits
    var i = w - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    out
  }

  private def elem(id: Array[Byte], body: Array[Byte], szW: Int = 1) =
    id ++ vint(body.length.toLong, szW) ++ body

  private def ebml(children: Array[Byte], rootSzW: Int = 2): Array[Byte] =
    Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
      vint(children.length.toLong, rootSzW) ++ children

  private val IdVersion = Array(0x42, 0x86).map(_.toByte)
  private val IdDocType = Array(0x42, 0x82).map(_.toByte)
  private val IdDocTypeV = Array(0x42, 0x87).map(_.toByte)
  private val IdVoid = Array(0xEC.toByte)

  test("property: 150 random EBML headers with non-minimal vint widths, " +
      "shuffled junk elements, and multi-byte uints parse exactly") {
    import graft.functions.EbmlHeader
    val gen = Gen.listOfN(150, for {
      dt <- Gen.oneOf("matroska", "webm", "mkv", "x", "webmm", "matroskaa")
      ev <- Gen.choose(1, 255)
      dtv <- Gen.choose(0, 255)
      evW <- Gen.choose(1, 2)   // uint payload widths (leading 0x00 legal)
      dtvW <- Gen.choose(1, 3)
      szW <- Gen.choose(1, 8)   // non-minimal SIZE vint widths
      rootW <- Gen.choose(1, 2)
      // bounded so the worst-case children total stays under 126 bytes —
      // the most a 1-byte root vint can declare (127 is the unknown-size
      // sentinel)
      nVoid <- Gen.choose(0, 2)
      voids <- Gen.listOfN(nVoid, Gen.choose(0, 20))
      pos <- Gen.choose(0, nVoid)
    } yield (dt, ev, dtv, evW, dtvW, szW, rootW, voids, pos))
    gen.pureApply(params, Seed(23L)).foreach {
      case (dt, ev, dtv, evW, dtvW, szW, rootW, voids, pos) =>
        def uint(v: Int, w: Int) =
          (w - 1 to 0 by -1).map(s => ((v >> (8 * s)) & 0xFF).toByte).toArray
        val vs = voids.map(n => elem(IdVoid, Array.fill(n)(0x55.toByte)))
        val core = elem(IdVersion, uint(ev, evW)) ++
          elem(IdDocType, dt.getBytes, szW) ++
          elem(IdDocTypeV, uint(dtv, dtvW))
        val (pre, post) = vs.splitAt(pos)
        val b = ebml(pre.flatten.toArray ++ core ++ post.flatten.toArray, rootW)
        val expClass = dt match {
          case "matroska" => EbmlHeader.DocMatroska
          case "webm" => EbmlHeader.DocWebm
          case _ => EbmlHeader.DocOther
        }
        assert(EbmlHeader.parse(b) ==
          EbmlHeader.pack(expClass, ev.toLong, dtv.toLong, b.length.toLong),
          s"dt=$dt ev=$ev dtv=$dtv szW=$szW rootW=$rootW")
    }
  }

  test("EBML refusal semantics: unknown-size vints, truncation, missing " +
      "fields, and out-of-range versions all return Unknown") {
    import graft.functions.EbmlHeader
    val core = elem(IdVersion, Array(1.toByte)) ++
      elem(IdDocType, "webm".getBytes) ++ elem(IdDocTypeV, Array(2.toByte))
    val good = ebml(core)
    assert(EbmlHeader.parse(good) != EbmlHeader.Unknown)
    // all-ones size vint = "unknown size": valid EBML, out of probe scope
    val unkRoot = Array(0x1A, 0x45, 0xDF, 0xA3, 0xFF).map(_.toByte) ++ core
    assert(EbmlHeader.parse(unkRoot) == EbmlHeader.Unknown)
    val unkChild = ebml(IdVoid ++ Array(0xFF.toByte) ++ core)
    assert(EbmlHeader.parse(unkChild) == EbmlHeader.Unknown)
    // every strict prefix of a good header refuses rather than mis-parses
    (0 until good.length).foreach { n =>
      assert(EbmlHeader.parse(good.take(n)) == EbmlHeader.Unknown, s"len $n")
    }
    // missing DocType / missing versions
    assert(EbmlHeader.parse(ebml(elem(IdVersion, Array(1.toByte)) ++
      elem(IdDocTypeV, Array(2.toByte)))) == EbmlHeader.Unknown)
    assert(EbmlHeader.parse(ebml(elem(IdDocType, "webm".getBytes))) ==
      EbmlHeader.Unknown)
    // uint wider than 8 bytes / version past the packed 8-bit field
    assert(EbmlHeader.parse(ebml(elem(IdVersion, new Array[Byte](9)) ++
      core.drop(4))) == EbmlHeader.Unknown)
    assert(EbmlHeader.parse(ebml(elem(IdVersion, Array(1.toByte, 0.toByte)) ++
      elem(IdDocType, "webm".getBytes) ++
      elem(IdDocTypeV, Array(2.toByte)))) == EbmlHeader.Unknown,
      "EBMLVersion 256 must refuse, not truncate into the packed field")
  }

  test("EBML crafted sizes terminate: 8-byte vints near 2^56, child " +
      "overrun, and zero first bytes cannot stall or cycle the walk") {
    import graft.functions.EbmlHeader
    // child size of 2^56-2 (max non-unknown 8-byte vint value): the
    // Long-space bound check must refuse before any offset arithmetic
    val huge = ebml(IdVoid ++ vint((1L << 56) - 2, 8) ++ new Array[Byte](64))
    assert(EbmlHeader.parse(huge) == EbmlHeader.Unknown)
    // a child whose size overruns its parent's extent by one byte
    val over = ebml(IdVoid ++ vint(6, 1) ++ new Array[Byte](5))
    assert(EbmlHeader.parse(over) == EbmlHeader.Unknown)
    // a zero byte where a vint width marker must live (width > 8: invalid)
    val zeroW = ebml(IdVoid ++ Array(0x00.toByte) ++ new Array[Byte](8))
    assert(EbmlHeader.parse(zeroW) == EbmlHeader.Unknown)
    val zeroId = ebml(Array(0x00.toByte) ++ vint(3, 1) ++ new Array[Byte](3))
    assert(EbmlHeader.parse(zeroId) == EbmlHeader.Unknown)
    // adversarial soup: no crafted byte string may hang the walk (strict
    // forward progress is structural — idw + cw >= 2 every iteration)
    val gen = Gen.listOfN(200, for {
      n <- Gen.choose(0, 64)
      bs <- Gen.listOfN(n, Gen.choose(0, 255))
    } yield bs.map(_.toByte).toArray)
    gen.pureApply(params, Seed(29L)).foreach { soup =>
      val b = Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++
        vint(soup.length.toLong, 1) ++ soup
      EbmlHeader.parse(b) // must return, any value
    }
  }

  // ----- FLAC (bit-packed fields) kernel --------------------------------

  private def be24(v: Int) = Array(
    ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  /** Spec-conformant FLAC header: STREAMINFO first (as required), then
    * optional extra metadata blocks, the last one flagged. */
  private def flac(rate: Long, ch: Int, bps: Int, samples: Long,
      extras: Seq[Array[Byte]]): Array[Byte] = {
    val word = (rate << 44) | ((ch - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | samples
    val si = Array(0x10, 0x00, 0x10, 0x00).map(_.toByte) ++ // block sizes
      new Array[Byte](6) ++ // frame sizes
      (7 to 0 by -1).map(s => ((word >> (8 * s)) & 0xFF).toByte).toArray ++
      new Array[Byte](16) // md5
    val blocks = extras.zipWithIndex.map { case (p, i) =>
      val lastFlag = if (i == extras.length - 1) 0x80 else 0x00
      Array((lastFlag | 0x01).toByte) ++ be24(p.length) ++ p
    }
    "fLaC".getBytes ++
      Array((if (extras.isEmpty) 0x80 else 0x00).toByte) ++ be24(34) ++ si ++
      blocks.flatten
  }

  test("property: 150 random FLAC headers round-trip the bit-packed " +
      "fields exactly (boundary-crossing rates, channels, sample counts)") {
    import graft.functions.FlacStreaminfo
    val gen = Gen.listOfN(150, for {
      rate <- Gen.choose(1L, (1L << 20) - 1) // any 20-bit rate incl. odd ones
      ch <- Gen.choose(1, 8)
      bps <- Gen.choose(1, 32)
      samples <- Gen.choose(0L, (1L << 33) - 1)
      nExtra <- Gen.choose(0, 3)
      extras <- Gen.listOfN(nExtra, Gen.choose(0, 40)
        .map(n => Array.fill(n)(0x55.toByte)))
    } yield (rate, ch, bps, samples, extras))
    gen.pureApply(params, Seed(37L)).foreach {
      case (rate, ch, bps, samples, extras) =>
        val b = flac(rate, ch, bps, samples, extras)
        assert(FlacStreaminfo.parse(b) ==
          FlacStreaminfo.pack(rate, ch.toLong, bps.toLong, samples),
          s"rate=$rate ch=$ch bps=$bps samples=$samples")
    }
  }

  test("FLAC refusal semantics: not-first STREAMINFO, zero rate, 36-bit " +
      "counts past the packed field, truncation, and block overrun") {
    import graft.functions.FlacStreaminfo
    val good = flac(44100L, 2, 16, 1234567L, Seq(Array.fill(7)(0.toByte)))
    assert(FlacStreaminfo.parse(good) ==
      FlacStreaminfo.pack(44100L, 2L, 16L, 1234567L))
    // every strict prefix refuses rather than mis-parses
    (0 until good.length).foreach { n =>
      assert(FlacStreaminfo.parse(good.take(n)) == FlacStreaminfo.Unknown,
        s"len $n")
    }
    // a PADDING block first violates the STREAMINFO-first rule
    val notFirst = "fLaC".getBytes ++
      Array(0x01.toByte) ++ be24(4) ++ new Array[Byte](4) ++ good.drop(4)
    assert(FlacStreaminfo.parse(notFirst) == FlacStreaminfo.Unknown)
    // rate 0 is invalid per spec
    assert(FlacStreaminfo.parse(flac(0L, 2, 16, 10L, Nil)) ==
      FlacStreaminfo.Unknown)
    // a 36-bit sample count past 2^33 must refuse, not truncate: build
    // the word by hand since the builder itself packs 33 bits
    val big = flac(44100L, 2, 16, 0L, Nil)
    big(4 + 4 + 13) = ((big(4 + 4 + 13) & 0xF0) | 0x08).toByte // bit 35 set
    assert(FlacStreaminfo.parse(big) == FlacStreaminfo.Unknown)
    // a trailing block whose declared length overruns the buffer
    val over = flac(44100L, 2, 16, 10L, Nil).clone()
    over(4) = 0x00.toByte // clear the last flag: a block must follow
    assert(FlacStreaminfo.parse(over ++ Array(0x01.toByte) ++ be24(99)) ==
      FlacStreaminfo.Unknown)
  }
}
