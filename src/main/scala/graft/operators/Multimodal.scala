package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * extracted metadata.
  *
  * The Spark-side machinery is real — binary column, typed Dataset,
  * partition-wise decode via mapPartitions (the shape a JNI/FFmpeg/JPEG
  * decoder plugs into: per-partition iterator, no per-row setup cost, no
  * driver involvement). Two layers:
  *  - q24/q39/q59: the PIPELINE shapes over a clearly-marked
  *    deterministic stub decode (this container has no codec libraries;
  *    payload decode derives fake geometry arithmetically, which is
  *    precisely what makes the op oracle-checkable);
  *  - q226/q229/q230: REAL byte-level container-header kernels for all
  *    three modalities (PNG/JPEG, RIFF/WAVE, ISO-BMFF) as codegen'd
  *    Catalyst expressions — the header walk IS the planning pass a
  *    100 TB media pipeline runs before any codec, and needs no library.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, header_hex: String)

  /** STUB decode — stands in for a real image/video decoder. Deterministic
    * arithmetic on byte length + an 8-byte header peek; swap the body for
    * a real codec without touching the pipeline around it. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = n % 64 + 1,
      height = n / 64 + 1,
      n_frames = n / 100 + 1,
      header_hex = bytes.take(8).map("%02X".format(_)).mkString)
  }

  // ---------------------------------------------------------------------
  // q24 — binary media pipeline: text bytes stand in for media payloads.
  // ---------------------------------------------------------------------
  def q24MultimodalStub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("media"))
      .as[MediaRow]
      .mapPartitions(_.map(r => stubDecode(r.doc_id, r.media)))
      .toDF()
      .orderBy("doc_id")
  }

  val q24Sql: String =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |       CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
      |       CAST(octet_length(encode(text)) // 64 + 1 AS INTEGER) AS height,
      |       CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames,
      |       substr(hex(encode(text)), 1, 16) AS header_hex
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q39 — frame sampling + resize planning: every SampleStep-th frame of
  // each media payload becomes its own row with its timestamp and the
  // post-resize dimensions.
  //
  // Ordering matters at 100 TB: sampling happens BEFORE decode — the
  // sampled (doc, frame_idx) plan is a pure codegen'd projection over
  // metadata (explode of a sequence), and only the sampled frames would
  // ever reach the per-partition decoder (the q24 mapPartitions shape).
  // Decoding everything and then discarding 4/5 of it would quintuple
  // the most expensive stage of a real video pipeline. The per-frame
  // "feature" is the same deterministic stub arithmetic q24 uses
  // (oracle-checkable; swap for the real extractor output downstream).
  // ---------------------------------------------------------------------
  private val SampleStep = 5
  private val FrameMs    = 100 // stub: 10 fps

  def q39FrameSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        length(encode(col("text"), "utf-8")).as("n_bytes"))
      .select(col("doc_id"),
        (col("n_bytes") % 64 + 1).as("width"),
        (col("n_bytes") / 64 + 1).cast("int").as("height"),
        (col("n_bytes") / 100 + 1).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        (col("width") / 2 + 1).cast("int").as("out_w"),
        (col("height") / 2 + 1).cast("int").as("out_h"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(SampleStep)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * FrameMs).cast("long").as("ts_ms"),
        col("out_w"), col("out_h"),
        ((col("doc_id") * 31 + col("frame_idx")) % 1000000007L).as("feat"))
      .orderBy("doc_id", "frame_idx")

  val q39Sql: String =
    s"""SELECT doc_id,
       |       CAST(frame_idx AS INTEGER) AS frame_idx,
       |       CAST(frame_idx * $FrameMs AS BIGINT) AS ts_ms,
       |       CAST((n_bytes % 64 + 1) // 2 + 1 AS INTEGER) AS out_w,
       |       CAST((n_bytes // 64 + 1) // 2 + 1 AS INTEGER) AS out_h,
       |       (doc_id * 31 + frame_idx) % 1000000007 AS feat
       |FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       |             unnest(range(0, octet_length(encode(text)) // 100 + 1, $SampleStep)) AS frame_idx
       |      FROM documents)
       |ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q59 — audio chunk planning: the ASR/audio-tokenization prep step —
  // long audio split into fixed windows with overlap (the Whisper-style
  // 30 s window, 5 s overlap so no utterance is cut at a hard boundary),
  // boundaries expressed in SAMPLES so a downstream decoder seeks
  // exactly. Same 100 TB ordering argument as q39: the chunk plan is a
  // pure projection + explode over METADATA — only planned chunk byte
  // ranges would ever reach a real decoder, so the most expensive stage
  // touches no discarded audio. The stub "probe" derives sample count
  // arithmetically from payload length (sample_rate fixed at 16 kHz;
  // swap for a real container probe without touching the plan around
  // it). The last chunk reports its padding — what an ASR batcher needs
  // to mask.
  // ---------------------------------------------------------------------
  private val SampleRate    = 16000
  private val SamplesPerByte = 3200            // stub probe arithmetic
  private val ChunkSamples  = 30 * SampleRate  // 30 s window
  private val HopSamples    = 25 * SampleRate  // 25 s hop = 5 s overlap

  def q59AudioChunks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (length(encode(col("text"), "utf-8")).cast("long") * SamplesPerByte)
          .as("n_samples"))
      .select(col("doc_id"), col("n_samples"),
        explode(sequence(lit(0),
          // chunk count: 1 + ceil(max(n - win, 0) / hop) starts
          ((greatest(col("n_samples") - ChunkSamples, lit(0L))
            + (HopSamples - 1)) / HopSamples).cast("long"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        col("n_samples"),
        (col("chunk_idx") * HopSamples).as("start_sample"),
        least(col("chunk_idx") * HopSamples + ChunkSamples, col("n_samples"))
          .as("end_sample"))
      .select(col("doc_id"), col("chunk_idx"),
        col("start_sample"), col("end_sample"),
        (col("start_sample") * 1000L / SampleRate).cast("long").as("start_ms"),
        (col("end_sample") - col("start_sample")).as("chunk_samples"),
        (lit(ChunkSamples.toLong) - (col("end_sample") - col("start_sample")))
          .as("pad_samples"))
      .orderBy("doc_id", "chunk_idx")

  // ---------------------------------------------------------------------
  // q226 — the multimodal family's first REAL byte-level kernel: PNG IHDR
  // / JPEG SOFn header parsing over a genuine `binary` column.
  //
  // Each document synthesizes a spec-conformant container — even doc_id
  // a PNG (8-byte signature + IHDR with BE32 width/height), odd doc_id a
  // JPEG (SOI, APP0/JFIF, a VARIABLE-LENGTH COM segment so the SOF0
  // offset differs per row and a fixed-offset "parser" would fail, then
  // SOF0 carrying BE16 HEIGHT-then-WIDTH, SOS, EOI) — entirely with
  // codegen'd built-ins (hex assembly + one unhex). The
  // [[graft.functions.ImageHeader]] expression then walks the real bytes
  // back out: one packed long per row serves the format, dimension, and
  // resize-plan columns. The oracle recomputes every output (dimensions
  // from the same arithmetic that sized the construction, container byte
  // count from the container layout, the 224-box fit in exact integer
  // division), so a parse that read the wrong offsets, wrong endianness,
  // or transposed JPEG height/width goes board-red; the adversarial
  // byte-level cases (fill bytes, truncation, missing SOF, RSTn
  // markers) are pinned by ImageHeaderPropertySpec.
  //
  // 100 TB shape: a pure projection — scan, no shuffle, no UDF; the
  // header walk touches ~64 bytes per blob regardless of payload size,
  // which is the planning pass a real image pipeline runs BEFORE any
  // codec (q24/q39's ordering argument, now with the real kernel).
  // ---------------------------------------------------------------------
  private val FitBox = 224L

  /** Append the q226 synthesized-container construction columns (w, h,
    * com_len and the container bytes as "img") to a frame carrying
    * "doc_id" and "nb" — shared by q226 and the q233 streaming media
    * admission, so both paths probe byte-identical containers. */
  private[graft] def withSynthImg(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("w", col("nb") % 1905 + 16)
      .withColumn("h", (col("nb") * 7) % 1064 + 16)
      .withColumn("com_len", col("nb") % 37 + 3) // COM length field >= 3
    val pngHex = concat(
      // signature | IHDR len 13 | "IHDR" | w BE32 | h BE32 |
      // bit depth 8, color RGBA, default compression/filter/interlace |
      // CRC (not validated by header walks)
      lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      lpad(hex(col("w")), 8, "0"), lpad(hex(col("h")), 8, "0"),
      lit("0806000000" + "00000000"))
    val jpegHex = concat(
      // SOI | APP0 len 16: "JFIF\0", v1.1, dpi units, 1x1 density, no thumb
      lit("FFD8" + "FFE00010" + "4A46494600010100000100010000"),
      // COM with per-row length -> SOF0 sits at a per-row offset
      lit("FFFE"), lpad(hex(col("com_len")), 4, "0"),
      expr("repeat('78', CAST(com_len AS INT) - 2)"),
      // SOF0 len 17: precision 8 | HEIGHT BE16 | WIDTH BE16 | 3 components
      lit("FFC00011" + "08"), lpad(hex(col("h")), 4, "0"),
      lpad(hex(col("w")), 4, "0"), lit("03" + "011100" + "021101" + "031101"),
      // SOS + EOI so the container is complete
      lit("FFDA0008" + "010100003F00" + "FFD9"))
    base.withColumn("img",
      unhex(when(pmod(col("doc_id"), lit(2)) === 0, pngHex).otherwise(jpegHex)))
  }

  def q226ImageHeader(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val nb = length(encode(col("text"), "utf-8")).cast("long")
    withSynthImg(Tables.documents(spark, sfDir)
        .select(col("doc_id"), nb.as("nb")))
      .withColumn("packed", GraftFunctions.imageHeader(col("img")))
      .withColumn("fmt_code", shiftright(col("packed"), 48))
      .withColumn("width",
        expr("CAST(shiftright(packed, 24) & 16777215 AS BIGINT)"))
      .withColumn("height", expr("CAST(packed & 16777215 AS BIGINT)"))
      .withColumn("m", greatest(col("width"), col("height")))
      .select(
        col("doc_id"),
        when(col("fmt_code") === ImgFmtPng, "png")
          .when(col("fmt_code") === ImgFmtJpeg, "jpeg")
          .otherwise("unknown").as("fmt"),
        col("width"), col("height"),
        expr(s"CAST(octet_length(img) AS BIGINT)").as("img_bytes"),
        when(col("m") <= FitBox, col("width"))
          .otherwise(expr(s"width * $FitBox div m")).as("out_w"),
        when(col("m") <= FitBox, col("height"))
          .otherwise(expr(s"height * $FitBox div m")).as("out_h"))
      .orderBy("doc_id")
  }

  private val ImgFmtPng  = graft.functions.ImageHeader.FmtPng
  private val ImgFmtJpeg = graft.functions.ImageHeader.FmtJpeg

  /** Little-endian hex render of a 32-bit value column (RIFF fields are
    * LE — byte-swap the BE lpad(hex) render). */
  private def le32hex(c: org.apache.spark.sql.Column) = {
    val h = lpad(hex(c), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le16hex(c: org.apache.spark.sql.Column) = {
    val h = lpad(hex(c), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  // ---------------------------------------------------------------------
  // q229 — REAL audio container probe: the RIFF/WAVE chunk walk
  // ([[graft.functions.WavHeader]]) replaces q59's stub arithmetic with
  // byte-level fmt/data parsing, then feeds the SAME 30 s / 25 s-hop
  // chunk plan — audio now mirrors the image story (synthesize a
  // spec-conformant container per row, parse it back with the codegen
  // kernel, recompute every output from first principles in the oracle).
  //
  // The synthesized WAV carries a variable-length LIST chunk BEFORE
  // "fmt " (odd sizes included — RIFF chunks are word-aligned, so the
  // walk must pad odd chunk sizes or desync: the classic RIFF bug, also
  // pinned by MediaProbePropertySpec), and a "data" header with no
  // payload appended — a probe must plan from metadata alone.
  //
  // 100 TB shape: pure projection, ~60 header bytes walked per blob.
  // ---------------------------------------------------------------------
  /** Append the q229 synthesized-WAV construction columns (rate, ch,
    * bits, data_bytes, jl, jl_pad and the container bytes as "wav") to a
    * frame carrying "nb" — shared by q229 and the q233 streaming media
    * admission. */
  private[graft] def withSynthWav(df: DataFrame): DataFrame = {
    val base = df
      .withColumn("rate", expr(
        "element_at(array(16000L, 22050L, 44100L, 48000L), CAST(nb % 4 AS INT) + 1)"))
      .withColumn("ch", col("nb") % 2 + 1)
      .withColumn("bits", lit(16L))
      // clamp to the LE32 container width: lpad(hex) silently TRUNCATES
      // values wider than the field, so an unclamped nb*100 would desync
      // construction vs oracle for documents over ~43 MB (ADVICE r10)
      .withColumn("data_bytes", expr("(nb * 100) % 2147483648"))
      .withColumn("jl", col("nb") % 21 + 1) // LIST chunk payload (odd sizes too)
      .withColumn("jl_pad", col("jl") + col("jl") % 2)
    val wavHex = concat(
      lit("52494646"), // "RIFF"
      le32hex(lit(4L) + (lit(8L) + col("jl_pad")) + lit(8L + 16L) + lit(8L) +
        col("data_bytes")),
      lit("57415645"), // "WAVE"
      lit("4C495354"), le32hex(col("jl")), // "LIST" with UNPADDED size...
      expr("repeat('4A', CAST(jl AS INT))"),
      expr("repeat('00', CAST(jl % 2 AS INT))"), // ...but padded body
      lit("666D7420"), le32hex(lit(16L)), // "fmt " size 16
      le16hex(lit(1L)), le16hex(col("ch")), le32hex(col("rate")),
      le32hex(expr("rate * ch * bits div 8")), // byte rate
      le16hex(expr("ch * bits div 8")), le16hex(col("bits")),
      lit("64617461"), le32hex(col("data_bytes"))) // "data", no payload
    base.withColumn("wav", unhex(wavHex))
  }

  def q229AudioProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val nb = length(encode(col("text"), "utf-8")).cast("long")
    withSynthWav(Tables.documents(spark, sfDir)
        .select(col("doc_id"), nb.as("nb")))
      .withColumn("p", GraftFunctions.wavHeader(col("wav")))
      .withColumn("sample_rate", shiftright(col("p"), 42))
      .withColumn("channels", expr("CAST(shiftright(p, 38) & 15 AS BIGINT)"))
      .withColumn("bps", expr("CAST(shiftright(p, 32) & 63 AS BIGINT)"))
      .withColumn("pcm_bytes", expr("CAST(p & 4294967295 AS BIGINT)"))
      .withColumn("n_samples",
        expr("pcm_bytes * 8 div (channels * bps)"))
      .select(col("doc_id"), col("sample_rate"), col("channels"), col("bps"),
        col("pcm_bytes"),
        expr("CAST(octet_length(wav) AS BIGINT)").as("wav_bytes"),
        col("n_samples"),
        expr("n_samples * 1000 div sample_rate").as("duration_ms"),
        // q59's chunk plan on the PROBED geometry: 30 s windows, 25 s hop
        expr("(greatest(n_samples - 30 * sample_rate, 0)" +
          " + 25 * sample_rate - 1) div (25 * sample_rate) + 1").as("n_chunks"))
      .orderBy("doc_id")
  }

  /** Geometry from the construction arithmetic; wav_bytes from the RIFF
    * layout (12 RIFF/WAVE + 8 + padded LIST + 24 fmt + 8 data header). */
  val q229Sql: String =
    """SELECT doc_id, rate AS sample_rate, ch AS channels, 16 AS bps,
      |       db AS pcm_bytes,
      |       52 + jl + jl % 2 AS wav_bytes,
      |       db * 8 // (ch * 16) AS n_samples,
      |       (db * 8 // (ch * 16)) * 1000 // rate AS duration_ms,
      |       (greatest(db * 8 // (ch * 16) - 30 * rate, 0)
      |         + 25 * rate - 1) // (25 * rate) + 1 AS n_chunks
      |FROM (SELECT doc_id, nb,
      |             [16000, 22050, 44100, 48000][CAST(nb % 4 AS INT) + 1] AS rate,
      |             nb % 2 + 1 AS ch, nb % 21 + 1 AS jl,
      |             (nb * 100) % 2147483648 AS db
      |      FROM (SELECT doc_id,
      |                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q230 — REAL video container probe: the ISO-BMFF box walk
  // ([[graft.functions.Mp4Mvhd]]) to moov/mvhd for timescale + duration,
  // completing real header kernels across all three modalities. The
  // synthesized MP4 is ftyp | variable-length free box | moov( udta junk
  // child | mvhd ) — the mvhd is NOT the first child and its offset
  // varies per row, so only a genuine nested box walk finds it; docs
  // alternate mvhd VERSION 0 (32-bit times) and VERSION 1 (64-bit times,
  // 32-bit timescale) — the v1 layout widens times but not timescale,
  // the classic off-by-layout trap. Downstream: q39's sample-before-
  // decode frame plan on the probed duration.
  // ---------------------------------------------------------------------
  def q230VideoProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val nb = length(encode(col("text"), "utf-8")).cast("long")
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), nb.as("nb"))
      .withColumn("ts", expr(
        "element_at(array(600L, 1000L, 48000L, 90000L), CAST(nb % 4 AS INT) + 1)"))
      // clamp to the packed-duration width (31 bits): past 2^31 the
      // kernel correctly returns Unknown while the oracle computes real
      // values — a board-red that would look like a kernel bug
      .withColumn("dur", expr("(nb * 37) % 2147483648"))
      .withColumn("v1", pmod(col("doc_id"), lit(2)) === 1)
      .withColumn("jl", col("nb") % 19 + 1)  // free-box payload
      .withColumn("cl", col("nb") % 13)      // udta junk-child payload
    val mvhdHex = when(!col("v1"), concat(
        be32hex(lit(108L)), lit("6D766864"), // size 108, "mvhd"
        lit("00000000"), // version 0, flags
        lit("00000000" + "00000000"), // ctime, mtime
        lpad(hex(col("ts")), 8, "0"), lpad(hex(col("dur")), 8, "0"),
        expr(s"repeat('00', 80)"))) // rate/volume/matrix/next_track
      .otherwise(concat(
        be32hex(lit(120L)), lit("6D766864"),
        lit("01000000"), // version 1, flags
        lit("0000000000000000" + "0000000000000000"), // 64-bit ctime, mtime
        lpad(hex(col("ts")), 8, "0"),
        lit("00000000"), lpad(hex(col("dur")), 8, "0"), // 64-bit duration
        expr(s"repeat('00', 80)")))
    val mp4Hex = concat(
      lit("00000018" + "66747970" + "69736F6D" + "00000200" +
        "69736F6D69736F32"), // ftyp(24): major isom, minor, compat
      be32hex(col("jl") + 8), lit("66726565"), // "free" + junk
      expr("repeat('4B', CAST(jl AS INT))"),
      be32hex(col("cl") + 8 + when(col("v1"), 120L).otherwise(108L) + 8),
      lit("6D6F6F76"), // "moov"
      be32hex(col("cl") + 8), lit("75647461"), // "udta" junk child first
      expr("repeat('4C', CAST(cl AS INT))"),
      mvhdHex)
    base
      .withColumn("mp4", unhex(mp4Hex))
      .withColumn("p", GraftFunctions.mp4Mvhd(col("mp4")))
      .withColumn("timescale", shiftright(col("p"), 31))
      .withColumn("duration", expr("CAST(p & 2147483647 AS BIGINT)"))
      .withColumn("duration_ms", expr("duration * 1000 div timescale"))
      .withColumn("n_frames", expr("1 + duration_ms div 100")) // 10 fps plan
      .select(col("doc_id"),
        col("v1").cast("boolean").as("mvhd_v1"),
        col("timescale"), col("duration"),
        expr("CAST(octet_length(mp4) AS BIGINT)").as("mp4_bytes"),
        col("duration_ms"), col("n_frames"),
        expr(s"(n_frames + ${SampleStep - 1}) div $SampleStep").as("n_sampled"))
      .orderBy("doc_id")
  }

  /** Duration geometry from the construction arithmetic; mp4_bytes from
    * the box layout (24 ftyp + 8+jl free + 8 moov hdr + 8+cl udta +
    * 108/120 mvhd). */
  val q230Sql: String =
    s"""SELECT doc_id, doc_id % 2 = 1 AS mvhd_v1,
       |       ts AS timescale, dur AS duration,
       |       24 + 8 + jl + 8 + 8 + cl
       |         + CASE WHEN doc_id % 2 = 1 THEN 120 ELSE 108 END AS mp4_bytes,
       |       dur * 1000 // ts AS duration_ms,
       |       1 + dur * 1000 // ts // 100 AS n_frames,
       |       (1 + dur * 1000 // ts // 100 + ${SampleStep - 1}) // $SampleStep
       |         AS n_sampled
       |FROM (SELECT doc_id, nb,
       |             [600, 1000, 48000, 90000][CAST(nb % 4 AS INT) + 1] AS ts,
       |             (nb * 37) % 2147483648 AS dur,
       |             nb % 19 + 1 AS jl, nb % 13 AS cl
       |      FROM (SELECT doc_id,
       |                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
       |            FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Big-endian 32-bit hex render (MP4 box sizes). */
  private def be32hex(c: org.apache.spark.sql.Column) =
    lpad(hex(c), 8, "0")


  /** Every column recomputed from first principles: dimensions from the
    * construction arithmetic, img_bytes from the container layouts
    * (PNG = 8 sig + 25 IHDR-chunk = 33; JPEG = 2 SOI + 18 APP0 +
    * (2 + com_len) COM + 19 SOF0 + 10 SOS + 2 EOI = 53 + com_len),
    * the 224 fit in exact integer division. */
  val q226Sql: String =
    s"""SELECT doc_id,
       |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       |       w AS width, h AS height,
       |       CAST(CASE WHEN doc_id % 2 = 0 THEN 33
       |            ELSE 53 + (nb % 37 + 3) END AS BIGINT) AS img_bytes,
       |       CASE WHEN greatest(w, h) <= $FitBox THEN w
       |            ELSE w * $FitBox // greatest(w, h) END AS out_w,
       |       CASE WHEN greatest(w, h) <= $FitBox THEN h
       |            ELSE h * $FitBox // greatest(w, h) END AS out_h
       |FROM (SELECT doc_id,
       |             CAST(octet_length(encode(text)) AS BIGINT) AS nb,
       |             CAST(octet_length(encode(text)) AS BIGINT) % 1905 + 16 AS w,
       |             (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 1064 + 16 AS h
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  val q59Sql: String =
    s"""SELECT doc_id, chunk_idx,
       |       chunk_idx * $HopSamples AS start_sample,
       |       least(chunk_idx * $HopSamples + $ChunkSamples, n_samples) AS end_sample,
       |       chunk_idx * $HopSamples * 1000 // $SampleRate AS start_ms,
       |       least(chunk_idx * $HopSamples + $ChunkSamples, n_samples)
       |         - chunk_idx * $HopSamples AS chunk_samples,
       |       $ChunkSamples - (least(chunk_idx * $HopSamples + $ChunkSamples, n_samples)
       |         - chunk_idx * $HopSamples) AS pad_samples
       |FROM (SELECT doc_id,
       |             CAST(octet_length(encode(text)) AS BIGINT) * $SamplesPerByte AS n_samples,
       |             unnest(range(0, (greatest(CAST(octet_length(encode(text)) AS BIGINT)
       |               * $SamplesPerByte - $ChunkSamples, 0) + $HopSamples - 1)
       |               // $HopSamples + 1)) AS chunk_idx
       |      FROM documents)
       |ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q242 — EBML/Matroska container probe ([[graft.functions.EbmlHeader]]):
  // the FOURTH container family (after PNG/JPEG, RIFF, ISO-BMFF) and the
  // one with a genuinely different length discipline — VARIABLE-length
  // integers whose first byte's leading-zero count declares their width.
  // The synthesized header exercises it honestly: a 2-byte root-size
  // vint, 1-byte vint sizes on the children, a Void padding element
  // BEFORE DocType so the DocType offset varies per row (only a real
  // element walk finds it), and three doctype classes (matroska / webm /
  // other). Admission = recognized doctype at a supported version — the
  // webm-vs-mkv triage a video-ingest planning pass runs on the first
  // kilobyte before any demuxer spins up.
  // ---------------------------------------------------------------------
  def q242EbmlProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val nb = length(encode(col("text"), "utf-8")).cast("long")
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), nb.as("nb"))
      .withColumn("dlen", expr(
        "element_at(array(8L, 4L, 6L), CAST(doc_id % 3 AS INT) + 1)"))
      .withColumn("dt_hex", expr(
        "element_at(array('6D6174726F736B61', '7765626D', '637573746F6D'), " +
          "CAST(doc_id % 3 AS INT) + 1)")) // matroska | webm | custom
      .withColumn("dtv", col("nb") % 4 + 1)
      .withColumn("padlen", col("nb") % 19)
      // children: EBMLVersion(4) + Void(2+padlen) + DocType(3+dlen)
      //           + DocTypeVersion(4)
      .withColumn("sz", lit(13L) + col("dlen") + col("padlen"))
    val ebmlHex = concat(
      lit("1A45DFA3"),                           // EBML magic
      lpad(hex(lit(0x4000L) + col("sz")), 4, "0"), // 2-byte root size vint
      lit("428681" + "01"),                      // EBMLVersion = 1
      lit("EC"), lpad(hex(lit(0x80L) + col("padlen")), 2, "0"), // Void
      expr("repeat('55', CAST(padlen AS INT))"),
      lit("4282"), lpad(hex(lit(0x80L) + col("dlen")), 2, "0"), // DocType
      col("dt_hex"),
      lit("428781"), lpad(hex(col("dtv")), 2, "0")) // DocTypeVersion
    base
      .withColumn("ebml", unhex(ebmlHex))
      .withColumn("p", GraftFunctions.ebmlHeader(col("ebml")))
      .withColumn("dclass", shiftright(col("p"), 32))
      .withColumn("ebml_version",
        expr("CAST(shiftright(p, 24) & 255 AS BIGINT)"))
      .withColumn("doctype_version",
        expr("CAST(shiftright(p, 16) & 255 AS BIGINT)"))
      .withColumn("hdr_bytes", expr("CAST(p & 65535 AS BIGINT)"))
      .select(col("doc_id"), col("dclass"), col("ebml_version"),
        col("doctype_version"), col("hdr_bytes"),
        expr("CAST(octet_length(ebml) AS BIGINT)").as("blob_bytes"),
        expr("dclass IN (1, 2) AND doctype_version <= 4").as("admitted"))
      .orderBy("doc_id")
  }

  /** Every field from the construction arithmetic (q229/q230's pattern):
    * class from doc_id mod 3, versions from nb, header length from the
    * element layout (4 magic + 2 root vint + 4 EBMLVersion +
    * (2 + padlen) Void + (3 + dlen) DocType + 4 DocTypeVersion);
    * blob_bytes must equal hdr_bytes — the probe walked the whole blob. */
  val q242Sql: String =
    """SELECT doc_id, dclass, CAST(1 AS BIGINT) AS ebml_version,
      |       dtv AS doctype_version,
      |       19 + dlen + padlen AS hdr_bytes,
      |       19 + dlen + padlen AS blob_bytes,
      |       dclass IN (1, 2) AND dtv <= 4 AS admitted
      |FROM (SELECT doc_id,
      |             CAST([1, 2, 3][CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
      |               AS dclass,
      |             CAST([8, 4, 6][CAST(doc_id % 3 AS INT) + 1] AS BIGINT)
      |               AS dlen,
      |             nb % 4 + 1 AS dtv, nb % 19 AS padlen
      |      FROM (SELECT doc_id,
      |                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q249 — FLAC STREAMINFO probe ([[graft.functions.FlacStreaminfo]]):
  // the FIFTH container family, exercising the third length discipline —
  // SUB-BYTE bit-packed fields (20-bit rate / 3-bit channels / 5-bit bps
  // / 36-bit sample count, all crossing byte boundaries) after the
  // byte-aligned chunk walks and EBML's vints. The synthesized file
  // carries a trailing PADDING metadata block of per-row-varying length
  // so the block walk (and the probe's whole-header accounting) is
  // genuinely exercised; the probed total-sample count feeds the q73/
  // q229-style chunk plan a lossless-audio ingest runs before any
  // decode.
  // ---------------------------------------------------------------------
  def q249FlacProbe(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.GraftFunctions
    val nb = length(encode(col("text"), "utf-8")).cast("long")
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), nb.as("nb"))
      .withColumn("rate", expr(
        "element_at(array(8000L, 44100L, 48000L, 96000L), " +
          "CAST(nb % 4 AS INT) + 1)"))
      .withColumn("ch", col("nb") % 2 + 1)
      .withColumn("bps", lit(16L))
      // clamp to the packed 33-bit sample-count field (the ADVICE-r10
      // hex-render lesson: construction and probe must share the bound)
      .withColumn("samples", expr("(nb * 441) % 8589934592"))
      .withColumn("pl", col("nb") % 29) // PADDING block payload
    // the 8-byte bit-packed parameter word, assembled as ONE integer:
    // rate[20] ch-1[3] bps-1[5] samples[36] — fits well under 2^63 at
    // our rates, so hex() renders it without sign trouble
    val word = expr(
      "shiftleft(rate, 44) + shiftleft(ch - 1, 41) + " +
        "shiftleft(bps - 1, 36) + samples")
    val flacHex = concat(
      lit("664C6143"),           // "fLaC"
      lit("00" + "000022"),      // block 0: STREAMINFO, not last, len 34
      lit("1000" + "1000"),      // min/max block size
      lit("000000" + "000000"),  // min/max frame size (0 = unknown)
      lpad(hex(word), 16, "0"),
      expr("repeat('AB', 16)"),  // payload MD5 (opaque to the probe)
      lit("81"), lpad(hex(col("pl")), 6, "0"), // block 1: PADDING, LAST
      expr("repeat('00', CAST(pl AS INT))"))
    base
      .withColumn("flac", unhex(flacHex))
      .withColumn("p", GraftFunctions.flacStreaminfo(col("flac")))
      .withColumn("sample_rate", shiftright(col("p"), 43))
      .withColumn("channels", expr("CAST(shiftright(p, 39) & 15 AS BIGINT)"))
      .withColumn("bits_per_sample",
        expr("CAST(shiftright(p, 33) & 63 AS BIGINT)"))
      .withColumn("total_samples",
        expr("CAST(p & 8589934591 AS BIGINT)"))
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("bits_per_sample"), col("total_samples"),
        expr("CAST(octet_length(flac) AS BIGINT)").as("flac_bytes"),
        expr("total_samples * 1000 div sample_rate").as("duration_ms"))
      .orderBy("doc_id")
  }

  /** Every field from the construction arithmetic; flac_bytes from the
    * layout (4 magic + 4 + 34 STREAMINFO + 4 + pl PADDING). */
  val q249Sql: String =
    """SELECT doc_id, rate AS sample_rate, ch AS channels,
      |       CAST(16 AS BIGINT) AS bits_per_sample,
      |       samples AS total_samples,
      |       46 + pl AS flac_bytes,
      |       samples * 1000 // rate AS duration_ms
      |FROM (SELECT doc_id,
      |             CAST([8000, 44100, 48000, 96000][CAST(nb % 4 AS INT) + 1]
      |                  AS BIGINT) AS rate,
      |             nb % 2 + 1 AS ch,
      |             (nb * 441) % 8589934592 AS samples,
      |             nb % 29 AS pl
      |      FROM (SELECT doc_id,
      |                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin
}
