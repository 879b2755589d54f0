package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Streaming/batch parity: the flagship sliding-window aggregation run
  * through the REAL Structured Streaming engine (MemoryStream source,
  * watermark, append-mode windowed state, memory sink) over the same
  * events table — its result must equal the batch q01 and therefore the
  * same DuckDB oracle.
  *
  * End-of-stream flush: the reference emits `MAX_WATERMARK` on stream
  * termination so all open windows close
  * (`rlink/src/runtime/worker/runnable/watermark_assigner_runnable.rs:125-128`).
  * Spark's append mode has no termination flush, so we replay the same
  * trick explicitly: a sentinel event 1 hour past the last real event
  * advances the watermark beyond every real window; sentinel-keyed rows
  * are filtered from the result.
  *
  * Bounded replay through MemoryStream collects the input to the driver —
  * acceptable for the correctness gate only; unbounded production paths
  * use Kafka/file sources (`graft.streaming.Kafka`) where data never
  * touches the driver.
  */
object StreamParity {

  final case class Ev(ts: Timestamp, event_type: String, value: Double)

  private val runId = new AtomicInteger(0)

  def q25StreamBatchParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .as[Ev].collect()
    val maxTsMs = rows.iterator.map(_.ts.getTime).max

    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "60 seconds", "20 seconds"), col("event_type"))
      .agg(
        sum(col("value").cast(DecimalType(25, 6))).cast("double").as("sum_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("cnt"))

    val table = s"q25_parity_${runId.incrementAndGet()}"
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName(table).start()
    try {
      source.addData(rows.toIndexedSeq)
      query.processAllAvailable()
      // end-of-stream: MAX_WATERMARK analog
      source.addData(Ev(new Timestamp(maxTsMs + 3600 * 1000L), "zzz_sentinel", 0.0))
      query.processAllAvailable()
    } finally query.stop()

    spark.table(table)
      .filter(col("event_type") =!= "zzz_sentinel")
      .select(
        col("window.start").cast("long").as("window_start"),
        col("event_type"), col("sum_value"), col("max_value"),
        col("min_value"), col("cnt"))
      .orderBy("window_start", "event_type")
  }
}
