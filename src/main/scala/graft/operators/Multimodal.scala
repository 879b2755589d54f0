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
  * driver involvement). The decoder itself is a clearly-marked
  * deterministic STUB: this container has no image/audio libraries, so
  * "decode" derives fake dimensions/frame counts arithmetically from the
  * byte length — which is precisely what makes the op oracle-checkable.
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
}
