package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broker-side test double for the Kafka facade: a file-backed partitioned
  * log plus an offset resolver that consumes the EXACT option maps
  * `Kafka.sourceOptions` / `sourceOptionsMulti` emit and applies Kafka's
  * documented seek semantics
  * (reference `connector-kafka/src/source/offset_range.rs:30`,
  * `input_format.rs:76-170`; Spark kafka source option contract):
  *
  *  - `startingOffsets`/`endingOffsets`: "earliest" | "latest" | per-
  *    partition JSON, with Kafka's -2 (earliest) and -1 (latest)
  *    sentinels; a partition absent from the JSON defaults to earliest
  *    (start) / latest (end) — Spark's newly-discovered-partition rule.
  *  - `startingOffsetsByTimestamp`/`endingOffsetsByTimestamp`: per-
  *    partition `offsetsForTimes` — the earliest offset whose record
  *    timestamp is >= the requested ms; log-end when no such record.
  *  - checkpointed resume (`OffsetRange::None`): a committed next-offset
  *    map overrides the cold `startingOffsets`; `commit()` advances it —
  *    the `FromCheckpoint` contract without a broker.
  *
  * Batches are the half-open range [start, end) per partition, like the
  * real source. This exercises the facade end-to-end: case class → JSON
  * options → (this) broker-side resolution → record batch.
  */
object MockKafkaBroker {

  private val logSchema = StructType(Seq(
    StructField("partition", IntegerType), StructField("offset", LongType),
    StructField("ts", LongType), StructField("key", StringType),
    StructField("value", StringType)))

  /** Append records (partition, offset, tsMs, key, value) to a topic log. */
  def append(spark: SparkSession, logDir: String, topic: String,
      records: Seq[(Int, Long, Long, String, String)]): Unit = {
    val rows = records.map { case (p, o, t, k, v) => Row(p, o, t, k, v) }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), logSchema)
      .repartition(1)
      .write.mode("append").parquet(s"$logDir/$topic")
  }

  private def log(spark: SparkSession, logDir: String, topic: String): DataFrame =
    spark.read.schema(logSchema).parquet(s"$logDir/$topic")

  /** (earliest, logEnd) per partition — logEnd is max(offset)+1, Kafka's
    * "latest". */
  private def bounds(l: DataFrame): Map[Int, (Long, Long)] =
    l.groupBy("partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2) + 1)).toMap

  private def parseJsonOffsets(json: String): Map[String, Map[Int, Long]] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    scala.jdk.CollectionConverters.IteratorHasAsScala(root.fields()).asScala
      .map { e =>
        val pm = scala.jdk.CollectionConverters
          .IteratorHasAsScala(e.getValue.fields()).asScala
          .map(pe => pe.getKey.toInt -> pe.getValue.asLong()).toMap
        e.getKey -> pm
      }.toMap
  }

  /** offsetsForTimes: earliest offset in `l` whose ts >= tsMs, else log end. */
  private def offsetForTime(l: DataFrame, logEnd: Map[Int, (Long, Long)],
      tsMs: Map[Int, Long]): Map[Int, Long] = {
    val found = l.join(
        l.sparkSession.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(
            tsMs.toSeq.map { case (p, t) => Row(p, t) }).asJava,
          StructType(Seq(StructField("partition", IntegerType),
            StructField("t", LongType)))), Seq("partition"))
      .filter(col("ts") >= col("t"))
      .groupBy("partition").agg(min("offset").as("o"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    tsMs.map { case (p, _) =>
      p -> found.getOrElse(p, logEnd.get(p).map(_._2).getOrElse(0L)) }
  }

  /** Resolve one topic's [start, end) from the facade's option map (plus
    * an optional committed-offset map for checkpoint resume) and return
    * the record batch in the Kafka source column shape. */
  def resolve(spark: SparkSession, logDir: String,
      options: Map[String, String],
      committed: Map[String, Map[Int, Long]] = Map.empty): DataFrame = {
    val topics = options("subscribe").split(",").toSeq
    val batches = topics.map { topic =>
      val l = log(spark, logDir, topic).cache()
      val b = bounds(l)
      def sentinel(raw: Long, p: Int): Long = raw match {
        case -2L => b.get(p).map(_._1).getOrElse(0L)
        case -1L => b.get(p).map(_._2).getOrElse(0L)
        case o   => o
      }
      def named(key: String, dflt: Int => Long): Map[Int, Long] =
        options.get(key) match {
          case Some("earliest") => b.map { case (p, (lo, _)) => p -> lo }
          case Some("latest")   => b.map { case (p, (_, hi)) => p -> hi }
          case Some(json)       =>
            val m = parseJsonOffsets(json).getOrElse(topic, Map.empty)
            b.map { case (p, _) =>
              p -> m.get(p).map(sentinel(_, p)).getOrElse(dflt(p)) }
          case None => b.map { case (p, _) => p -> dflt(p) }
        }
      val start: Map[Int, Long] = committed.get(topic) match {
        // A committed offset beats the cold startingOffsets — the
        // FromCheckpoint resume rule.
        case Some(m) if m.nonEmpty => b.map { case (p, (lo, _)) =>
          p -> m.getOrElse(p, lo) }
        case _ => options.get("startingOffsetsByTimestamp") match {
          case Some(json) => offsetForTime(l, b,
            parseJsonOffsets(json).getOrElse(topic, Map.empty))
          case None => named("startingOffsets", p => b(p)._1)
        }
      }
      val end: Map[Int, Long] = options.get("endingOffsetsByTimestamp") match {
        case Some(json) => offsetForTime(l, b,
          parseJsonOffsets(json).getOrElse(topic, Map.empty))
        case None => named("endingOffsets", p => b(p)._2)
      }
      val rangeRows = (start.keySet ++ end.keySet).toSeq.map(p =>
        Row(p, start.getOrElse(p, 0L), end.getOrElse(p, Long.MaxValue)))
      val ranges = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rangeRows).asJava,
        StructType(Seq(StructField("partition", IntegerType),
          StructField("lo", LongType), StructField("hi", LongType))))
      val out = l.join(broadcast(ranges), Seq("partition"))
        .filter(col("offset") >= col("lo") && col("offset") < col("hi"))
        .select(col("key").cast("binary").as("key"),
          col("value").cast("binary").as("value"),
          lit(topic).as("topic"), col("partition"), col("offset"),
          timestamp_millis(col("ts")).as("timestamp"))
      l.unpersist()
      out
    }
    batches.reduce(_.unionByName(_))
  }

  /** The sink's committed offsets after a batch: next offset = log-end of
    * every partition the batch touched (what the source's checkpoint
    * records after a successful trigger). */
  def commit(batch: DataFrame): Map[String, Map[Int, Long]] =
    batch.groupBy("topic", "partition").agg(max("offset").as("hi"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (t, rows) =>
        t -> rows.map(r => r.getInt(1) -> (r.getLong(2) + 1)).toMap }
}
