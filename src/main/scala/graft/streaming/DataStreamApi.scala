package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.functions.GraftFunctions

/** Thin typed facade mirroring the reference's DataStream builder API
  * (`rlink/src/core/data_stream.rs:17-71`), compiled 1:1 to
  * DataFrame / Structured Streaming operations. Works identically over
  * batch and streaming DataFrames — the plan is declarative either way,
  * and Catalyst/the streaming engine own execution.
  *
  * Reference surface → here:
  *  - `register_source`                → `StreamExecutionEnvironment.fromDataFrame / memorySource`
  *  - `flat_map` (`core/function.rs:185-195`) → `flatMap` (typed 1→N) / `map` (projection)
  *  - `filter` (`core/function.rs:197-207`)   → `filter`
  *  - `assign_timestamps_and_watermarks` (bounded out-of-orderness,
  *    `functions/watermark/bounded_out_of_orderness_watermarks.rs`)
  *                                      → `assignTimestampsAndWatermarks`
  *  - `key_by` (`schema_key_selector.rs`)      → `keyBy`
  *  - `window(SlidingEventTimeWindows)` (`functions/window/mod.rs:27-78`)
  *                                      → `window` (incl. offset)
  *  - `reduce(sum/max/min/count/pct)` (`schema_reduce.rs`) → `reduce(Agg.*)`
  *  - `connect` + CoProcess (`core/data_stream.rs:143-148`) → `connect`
  *    (broadcast enrichment) / `CoProcess.apply` (general stateful form)
  *  - `add_sink` (print / kafka)        → `addSink(Sinks.*)`
  */
object api {

  /** Duration helper mirroring the reference's ms-based window params. */
  final case class Time(ms: Long) {
    def spec: String = s"$ms milliseconds"
  }
  object Time {
    def milliseconds(n: Long): Time = Time(n)
    def seconds(n: Long): Time = Time(n * 1000L)
    def minutes(n: Long): Time = Time(n * 60000L)
  }

  /** Event-time window assigners (`rlink/src/functions/window/mod.rs`).
    * Tumbling = size == slide, exactly as the reference builds it. */
  sealed trait WindowAssigner {
    def size: Time; def slide: Time; def offset: Time
    /** Spark's startTime must be in [0, slide); the reference allows
      * back/forward offsets (`functions/window/mod.rs:8-24`) — identical
      * bucketing after normalization mod slide. */
    private[streaming] def normalizedOffset: Time =
      Time(((offset.ms % slide.ms) + slide.ms) % slide.ms)
  }
  final case class SlidingEventTimeWindows(size: Time, slide: Time, offset: Time)
      extends WindowAssigner
  object SlidingEventTimeWindows {
    def of(size: Time, slide: Time): SlidingEventTimeWindows =
      SlidingEventTimeWindows(size, slide, Time(0))
  }
  final case class TumblingEventTimeWindows(size: Time, offset: Time)
      extends WindowAssigner { def slide: Time = size }
  object TumblingEventTimeWindows {
    def of(size: Time): TumblingEventTimeWindows =
      TumblingEventTimeWindows(size, Time(0))
  }
  /** Gap-based session windows — not in the reference (SURVEY §2.5);
    * Spark's session_window makes them part of our surface. */
  final case class SessionEventTimeWindows(gap: Time) extends WindowAssigner {
    def size: Time = gap; def slide: Time = gap; def offset: Time = Time(0)
  }
  object SessionEventTimeWindows {
    def withGap(gap: Time): SessionEventTimeWindows = SessionEventTimeWindows(gap)
  }

  /** Aggregation descriptors (`schema_reduce.rs:11-29`); output column
    * names follow the reference convention `agg(col)`. */
  sealed trait Agg { def column: Column; def name: String }
  object Agg {
    final case class Sum(col: String) extends Agg {
      def column: Column = sum(col); def name = s"sum($col)"
    }
    final case class Max(col: String) extends Agg {
      def column: Column = max(col); def name = s"max($col)"
    }
    final case class Min(col: String) extends Agg {
      def column: Column = min(col); def name = s"min($col)"
    }
    final case class Count() extends Agg {
      def column: Column = count(lit(1)); def name = "count"
    }
    final case class Pct(col: String, scale: Array[Double], p: Int) extends Agg {
      def column: Column =
        GraftFunctions.pct(org.apache.spark.sql.functions.col(col), p, scale)
      def name = s"pct($col,$p)"
    }
  }

  final class StreamExecutionEnvironment(val spark: SparkSession) {
    def fromDataFrame(df: DataFrame): DataStream = new DataStream(df, this)
    /** Bounded in-memory source ≙ `vec_source`
      * (`functions/source/vec_input_format.rs`). */
    def fromRows(rows: Seq[Row], schema: StructType): DataStream =
      new DataStream(spark.createDataFrame(
        spark.sparkContext.parallelize(rows), schema), this)
    /** Unbounded rate source ≙ `RandInputFormat`. */
    def rateSource(rowsPerSecond: Int): DataStream =
      new DataStream(spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load(), this)
  }
  object StreamExecutionEnvironment {
    def apply(spark: SparkSession) = new StreamExecutionEnvironment(spark)
  }

  final class DataStream(val df: DataFrame, env: StreamExecutionEnvironment,
      private[streaming] val idlenessMax: Boolean = false) {
    private def next(d: DataFrame) = new DataStream(d, env, idlenessMax)

    /** Starts a query with this stream's watermark-policy choice scoped
      * to THE QUERY, not the session: Spark captures
      * `multipleWatermarkPolicy` into the query's OffsetSeqMetadata at
      * start, so set-start-restore means a second query started later in
      * the same session still sees the session default (`min`) unless it
      * called [[withIdleness]] itself. */
    private[streaming] def startScoped(
        w: DataStreamWriter[Row]): StreamingQuery =
      if (!idlenessMax) w.start()
      else {
        val conf = env.spark.conf
        val key = "spark.sql.streaming.multipleWatermarkPolicy"
        val prev = conf.getOption(key)
        conf.set(key, "max")
        try w.start() finally prev.fold(conf.unset(key))(conf.set(key, _))
      }

    /** 1→N row transform — the reference's whole UDF/UDTF surface. */
    def flatMap(schema: StructType)(f: Row => IterableOnce[Row]): DataStream = {
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      next(df.flatMap(f)(enc).toDF())
    }
    /** Declarative projection (preferred: stays in codegen). */
    def map(cols: Column*): DataStream = next(df.select(cols: _*))
    def filter(cond: Column): DataStream = next(df.filter(cond))

    /** `SchemaTimestampAssigner` + `BoundedOutOfOrdernessWatermarks`:
      * `tsCol` holds epoch millis (reference convention) or a timestamp;
      * produces/overwrites an `eventTime` TimestampType column and, on
      * streaming inputs, registers the watermark. */
    def assignTimestampsAndWatermarks(tsCol: String, maxOutOfOrderness: Time): DataStream = {
      val ts = df.schema(tsCol).dataType match {
        case org.apache.spark.sql.types.TimestampType => col(tsCol)
        case _ => timestamp_millis(col(tsCol).cast("long"))
      }
      val withTs = df.withColumn("eventTime", ts)
      next(if (withTs.isStreaming)
        withTs.withWatermark("eventTime", maxOutOfOrderness.spec)
      else withTs)
    }

    /** `WatermarksWithIdleness` ≙ reference
      * `rlink/src/functions/watermark/watermarks_with_idleness.rs:13-90`:
      * a source that stops producing is marked idle after `timeout` and
      * removed from watermark alignment
      * (`runtime/worker/runnable/source_runnable.rs:635-659`), so one
      * stalled Kafka partition cannot freeze every downstream window.
      *
      * Spark mapping: the micro-batch engine tracks one watermark per
      * `withWatermark` operator and combines them with
      * `spark.sql.streaming.multipleWatermarkPolicy`. The default `min`
      * reproduces the reference's *aligned* behavior — and its stall.
      * `max` is the idleness behavior: a source with no new data simply
      * stops contributing to the global watermark, and windows keep
      * closing off the live sources. Spark re-evaluates per batch, so no
      * explicit timeout is needed; `timeout` is accepted for API parity
      * and documents the intent (the effective idle latency in Spark is
      * one trigger interval).
      *
      * Scope: the choice rides on THIS stream and is applied only around
      * its own query start ([[startScoped]]) — it never leaks into other
      * queries of the session. */
    def withIdleness(timeout: Time): DataStream = {
      require(timeout.ms >= 0)
      new DataStream(df, env, idlenessMax = true)
    }

    /** Multi-source merge (the reference wires several sources into one
      * DAG; Spark unions the streams). Each side keeps its own watermark
      * assigner — combine with [[withIdleness]] when one side can idle. */
    def union(other: DataStream): DataStream = new DataStream(
      df.unionByName(other.df), env, idlenessMax || other.idlenessMax)

    def keyBy(keys: String*): KeyedStream =
      new KeyedStream(df, keys, env, idlenessMax)

    /** Exact deduplication on key columns. On a watermarked stream the
      * engine keeps one state row per key and evicts it once the
      * watermark passes (`withinWatermark = true` uses
      * dropDuplicatesWithinWatermark — state bounded by the watermark
      * delay, the only scalable mode for unbounded key spaces). */
    def deduplicate(withinWatermark: Boolean, keys: String*): DataStream =
      next((withinWatermark && df.isStreaming, keys.isEmpty) match {
        // no keys = dedup on ALL columns (dropDuplicates(Seq.empty) would
        // instead collapse everything to one arbitrary row)
        case (true, true)   => df.dropDuplicatesWithinWatermark()
        case (true, false)  => df.dropDuplicatesWithinWatermark(keys)
        case (false, true)  => df.dropDuplicates()
        case (false, false) => df.dropDuplicates(keys)
      })

    /** Round-robin redistribution ≙ `RoundRobinFlagMapFunction`
      * (`functions/flat_map/round_robin_flat_map.rs`). Spark round-robins
      * per partition batch rather than per record — equivalent for load
      * balancing (SURVEY §7 risk register). */
    def rebalance(parallelism: Int): DataStream = next(df.repartition(parallelism))

    /** Hash-partition by key columns ≙ the keyBy partition routing
      * (`runtime/worker/runnable/key_by_runnable.rs:77-85`) when an
      * explicit co-location is wanted before several same-key stages. */
    def partitionByKey(parallelism: Int, keys: String*): DataStream =
      next(df.repartition(parallelism, keys.map(col): _*))

    /** Broadcast dimension enrichment — the reference's dominant
      * connect/CoProcess use (`example/example-connect/src/app.rs:36-77`).
      * Stream-static broadcast join: the dimension never shuffles the
      * fact side. */
    def connect(dim: DataFrame, cond: Column): DataStream =
      next(df.join(broadcast(dim), cond))

    /** Slowly-changing dimension enrichment ≙ `ConfigInputFormat`'s
      * periodic re-emit (`example/example-utils/src/config_input_format.rs:16`):
      * the reference re-reads its config source on an interval and
      * broadcasts updates into the operator. Spark shape: `foreachBatch`
      * re-evaluates `dim()` at every micro-batch boundary, so each batch
      * joins against a FRESH snapshot of the dimension (a new read ⇒ a
      * new file listing ⇒ updated/compacted dimension files are picked
      * up). The dimension is broadcast per batch — the fact side never
      * shuffles. `write` receives each enriched micro-batch. */
    def connectRefreshing(dim: () => DataFrame, cond: Column)(
        write: DataFrame => Unit): StreamingQuery =
      startScoped(df.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          write(batch.join(broadcast(dim()), cond))
        })

    def addSink(sink: DataStream => Either[Unit, StreamingQuery]): Either[Unit, StreamingQuery] =
      sink(this)
  }

  final class KeyedStream(df: DataFrame, keys: Seq[String],
      env: StreamExecutionEnvironment, idlenessMax: Boolean = false) {
    def window(assigner: WindowAssigner): WindowedStream =
      new WindowedStream(df, keys, assigner, env, idlenessMax)
    /** Unwindowed keyed reduce (batch only — streaming needs a window). */
    def reduce(aggs: Agg*): DataStream = {
      val cols = aggs.map(a => a.column.as(a.name))
      new DataStream(
        df.groupBy(keys.map(col): _*).agg(cols.head, cols.tail: _*), env,
        idlenessMax)
    }
  }

  final class WindowedStream(df: DataFrame, keys: Seq[String],
      assigner: WindowAssigner, env: StreamExecutionEnvironment,
      idlenessMax: Boolean = false) {
    /** Incremental windowed aggregation ≙ WindowBaseReduceFunction
      * (`functions/system/window_base_reduce.rs`): state keyed by
      * (window, key), merged per-record, emitted when the watermark
      * passes window end (append mode) — all engine-internal in Spark. */
    def reduce(aggs: Agg*): DataStream = {
      val w = assigner match {
        case SessionEventTimeWindows(gap) =>
          session_window(col("eventTime"), gap.spec).as("window")
        case a =>
          window(col("eventTime"), a.size.spec, a.slide.spec, a.normalizedOffset.spec)
      }
      val cols = aggs.map(a => a.column.as(a.name))
      new DataStream(
        df.groupBy((w +: keys.map(col)): _*).agg(cols.head, cols.tail: _*), env,
        idlenessMax)
    }
  }

  /** Sink constructors (`print_sink`, kafka/memory equivalents).
    *
    * Every streaming sink takes an optional `trigger` interval ≙ the
    * reference's `TimePeriodicWatermarks` emit cadence
    * (`functions/watermark/time_periodic_watermarks.rs:12-70`): in Spark
    * the watermark is re-computed and published once per micro-batch, so
    * the micro-batch trigger interval IS the periodic-watermark knob. */
  object Sinks {
    private def withTrigger(w: DataStreamWriter[Row],
        trigger: Option[Time]): DataStreamWriter[Row] =
      trigger.fold(w)(t => w.trigger(Trigger.ProcessingTime(t.ms)))

    /** Print sink ≙ `functions/sink/print.rs:51-103`, format-faithful
      * (periodic header + `task, [start, end], fields` rows). */
    def print(trigger: Option[Time] = None): DataStream => Either[Unit, StreamingQuery] = s =>
      if (s.df.isStreaming)
        Right(s.startScoped(withTrigger(
          s.df.writeStream.outputMode("append")
            .foreach(new PrintSink.Writer(s.df.schema)), trigger)))
      else Left(PrintSink.printBatch(s.df))
    /** Named in-memory table (streaming) / temp view (batch). */
    def memory(name: String, trigger: Option[Time] = None): DataStream => Either[Unit, StreamingQuery] = s =>
      if (s.df.isStreaming)
        Right(s.startScoped(withTrigger(
          s.df.writeStream.outputMode("append").format("memory")
            .queryName(name), trigger)))
      else Left(s.df.createOrReplaceTempView(name))
    /** Parquet sink with checkpoint — the durable path. */
    def parquet(path: String, checkpoint: String,
        trigger: Option[Time] = None): DataStream => Either[Unit, StreamingQuery] = s =>
      if (s.df.isStreaming)
        Right(s.startScoped(withTrigger(
          s.df.writeStream.outputMode("append").format("parquet")
            .option("path", path).option("checkpointLocation", checkpoint),
          trigger)))
      else Left(s.df.write.mode("append").parquet(path))
  }
}

/** Reference-format print rendering (`functions/sink/print.rs:51-103`):
  * a header `task_number|window[start,end]|0:f0|1:f1|...` re-printed when
  * more than 3 s elapsed since the last row, then per-row
  * `task_number, [HH:MM:SS, HH:MM:SS], v0, v1, ...` — the window rendered
  * from the `window` struct column (the reference carries the window as
  * element metadata; our window is a column, excluded from the field
  * list), empty when absent. Times are UTC `%T`, like the reference's
  * `fmt_date_time(.., "%T")`. */
object PrintSink {
  import org.apache.spark.sql.types.StructType
  import org.apache.spark.sql.ForeachWriter

  private val tfmt = java.time.format.DateTimeFormatter
    .ofPattern("HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private def fmtT(ts: java.sql.Timestamp): String = tfmt.format(ts.toInstant)

  private def dataFields(schema: StructType): Seq[Int] =
    schema.fields.indices.filterNot(i => schema(i).name == "window")

  def header(schema: StructType): String =
    "task_number|window[start,end]|" + dataFields(schema).zipWithIndex
      .map { case (fi, i) => s"$i:${schema(fi).name}" }.mkString("|")

  def formatRow(taskNumber: Int, schema: StructType, row: Row): String = {
    val wIdx = schema.fields.indexWhere(_.name == "window")
    val windowStr =
      if (wIdx >= 0 && !row.isNullAt(wIdx)) {
        val w = row.getStruct(wIdx)
        s"[${fmtT(w.getAs[java.sql.Timestamp]("start"))}, ${fmtT(w.getAs[java.sql.Timestamp]("end"))}]"
      } else ""
    val fields = dataFields(schema)
      .map(i => if (row.isNullAt(i)) "null" else row.get(i).toString)
    s"$taskNumber, $windowStr, ${fields.mkString(", ")}"
  }

  /** Streaming side: per-partition writer, partition id = task_number
    * (the reference's `task_id.task_number`). */
  final class Writer(schema: StructType, headerEveryMs: Long = 3000)
      extends ForeachWriter[Row] {
    private var task = 0
    private var lastPrint = 0L
    override def open(partitionId: Long, epochId: Long): Boolean = {
      task = partitionId.toInt; true
    }
    override def process(row: Row): Unit = {
      val now = System.currentTimeMillis()
      if (now - lastPrint > headerEveryMs) println(header(schema))
      lastPrint = now
      println(formatRow(task, schema, row))
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** Batch side: same rendering via foreachPartition (executor stdout). */
  def printBatch(df: DataFrame): Unit = {
    val schema = df.schema
    val h = header(schema)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val task = org.apache.spark.TaskContext.getPartitionId()
      if (rows.hasNext) println(h)
      rows.foreach(r => println(formatRow(task, schema, r)))
    }
  }
}
