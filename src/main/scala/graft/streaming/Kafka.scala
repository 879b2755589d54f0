package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka source/sink option builders mapping the reference's offset modes
  * (`rlink-connectors/connector-kafka/src/source/input_format.rs:76-170`,
  * `offset_range.rs:30`) onto Spark's kafka data source options:
  *
  *  - `OffsetRange::None`     → resume from checkpoint (Spark default when
  *    `checkpointLocation` is set; cold start via `startingOffsets`)
  *  - `OffsetRange::Direct`   → `startingOffsets` / `endingOffsets`
  *    per-partition JSON (bounded replay, FIXTURES.md §4)
  *  - `OffsetRange::Timestamp`→ `startingOffsetsByTimestamp` /
  *    `endingOffsetsByTimestamp`
  *
  * Pure option construction — unit-testable without a broker; `read` wires
  * them onto `spark.readStream.format("kafka")`.
  */
object Kafka {

  sealed trait OffsetRange
  /** Resume from checkpoint; `cold` applies only on first start. */
  final case class FromCheckpoint(cold: String = "latest") extends OffsetRange
  /** Bounded per-partition replay: topic -> partition -> offset. */
  final case class Direct(begin: Map[Int, Long], end: Option[Map[Int, Long]])
      extends OffsetRange
  /** Offsets-for-times lookup. */
  final case class Timestamp(beginMs: Map[Int, Long], endMs: Option[Map[Int, Long]])
      extends OffsetRange

  private def offsetsJson(topic: String, m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }
      .mkString(s"""{"$topic": {""", ", ", "}}")

  def sourceOptions(bootstrap: String, topic: String,
      range: OffsetRange): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic)
    range match {
      case FromCheckpoint(cold) => base + ("startingOffsets" -> cold)
      case Direct(begin, end) =>
        base + ("startingOffsets" -> offsetsJson(topic, begin)) ++
          end.map(e => "endingOffsets" -> offsetsJson(topic, e))
      case Timestamp(begin, end) =>
        base + ("startingOffsetsByTimestamp" -> offsetsJson(topic, begin)) ++
          end.map(e => "endingOffsetsByTimestamp" -> offsetsJson(topic, e))
    }
  }

  def read(spark: SparkSession, bootstrap: String, topic: String,
      range: OffsetRange): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(bootstrap, topic, range)).load()

  /** Multi-topic bounded replay ≙ the reference's multi-topic offset maps
    * (`offset_range.rs` `properties_convert_test`: topic -> [(partition,
    * offset)]). Subscribes all topics; per-topic-partition start/end
    * offsets in one JSON document each. */
  def sourceOptionsMulti(bootstrap: String,
      begin: Map[String, Map[Int, Long]],
      end: Option[Map[String, Map[Int, Long]]]): Map[String, String] = {
    def json(m: Map[String, Map[Int, Long]]): String =
      m.toSeq.sortBy(_._1).map { case (t, pm) =>
        pm.toSeq.sortBy(_._1)
          .map { case (p, o) => s""""$p": $o""" }
          .mkString(s""""$t": {""", ", ", "}")
      }.mkString("{", ", ", "}")
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> begin.keys.toSeq.sorted.mkString(","),
      "startingOffsets" -> json(begin)) ++
      end.map(e => "endingOffsets" -> json(e))
  }

  def readMulti(spark: SparkSession, bootstrap: String,
      begin: Map[String, Map[Int, Long]],
      end: Option[Map[String, Map[Int, Long]]]): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptionsMulti(bootstrap, begin, end)).load()

  def sinkOptions(bootstrap: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrap, "topic" -> topic)

  /** `KafkaOutputFormat` analog: wires the sink options + checkpoint onto
    * a streaming writer (`connector-kafka/src/sink/output_format.rs`).
    * The input must carry a `value` column (binary/string), optionally
    * `key`/`topic`/`partition` — Spark's kafka sink contract. */
  def write(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .options(sinkOptions(bootstrap, topic))
      .option("checkpointLocation", checkpoint)
}
