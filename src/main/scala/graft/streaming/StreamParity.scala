package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming/batch parity: the flagship sliding-window aggregation run
  * through the REAL Structured Streaming engine (file source, watermark,
  * append-mode windowed state, memory sink) over the same events table —
  * its result must equal the batch q01 and therefore the same DuckDB
  * oracle.
  *
  * The data path is fully distributed: the events table is consumed by
  * the parquet file-stream source (executors read the files directly;
  * the driver only lists them), unlike a MemoryStream gate, which would
  * round-trip every row through the driver. The only driver-side values
  * are the max timestamp (a column-pruned one-row aggregate, needed to
  * place the sentinel) and the final windowed result.
  *
  * End-of-stream flush: the reference emits `MAX_WATERMARK` on stream
  * termination so all open windows close
  * (`rlink/src/runtime/worker/runnable/watermark_assigner_runnable.rs:125-128`).
  * Spark's append mode has no termination flush, so we replay the same
  * trick: a one-row sentinel FILE, 1 hour past the last real event, sits
  * alongside the real table in the streamed directory. After the batch
  * containing it commits, the watermark passes every real window end and
  * the engine's no-data micro-batch emits all remaining windows
  * (`processAllAvailable` blocks until that quiesces). Sentinel-keyed
  * rows are filtered from the result.
  */
object StreamParity {

  private val runId = new AtomicInteger(0)

  def q25StreamBatchParity(spark: SparkSession, sfDir: String): DataFrame = {
    // Raw schema: ts stays a nanos Long (legacy conf) so the sentinel file
    // and the real table are schema-identical for the file source.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val schema = raw.schema
    val maxTsNanos = raw.agg(max("ts")).head().getLong(0)

    // Stream directory: symlink the real table + write the sentinel file.
    val dir = Files.createTempDirectory("q25_parity")
    Files.createSymbolicLink(
      dir.resolve("events.parquet"), Paths.get(s"$sfDir/events.parquet"))
    val sentinelVals = schema.fields.map { f =>
      f.name match {
        case "ts"         => maxTsNanos + 3600L * 1000 * 1000 * 1000 // +1 hour
        case "event_type" => "zzz_sentinel"
        case "value"      => 0.0
        case _            => null
      }
    }
    val sentinelDir = Files.createTempDirectory("q25_sentinel")
    spark.createDataFrame(
        java.util.Arrays.asList(Row(sentinelVals.toIndexedSeq: _*)), schema)
      .coalesce(1).write.mode("overwrite").parquet(sentinelDir.toString)
    Files.list(sentinelDir).filter(_.toString.endsWith(".parquet"))
      .forEach(p => Files.copy(p, dir.resolve("zz_sentinel.parquet")))

    val agg = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("ts"), col("event_type"), col("value"))
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
    try query.processAllAvailable()
    finally query.stop()

    spark.table(table)
      .filter(col("event_type") =!= "zzz_sentinel")
      .select(
        col("window.start").cast("long").as("window_start"),
        col("event_type"), col("sum_value"), col("max_value"),
        col("min_value"), col("cnt"))
      .orderBy("window_start", "event_type")
  }

  /** q49 — streaming exact dedup: the q15 md5-keyed dedup aggregation
    * run through the REAL streaming engine with state carried ACROSS
    * micro-batches. The documents table is re-laid-out as four files and
    * streamed with maxFilesPerTrigger=1, so the aggregation state (one
    * entry per distinct text hash) is built incrementally over four
    * micro-batches — the unbounded-keyed-state shape of the reference's
    * KeyedStateFlatMapFunction, held to the BATCH q15 oracle (complete
    * mode's final table is split-invariant by construction).
    *
    * Scale notes: the group key is md5(text) — 16 bytes per distinct
    * document in the state store, never the text. Complete mode is
    * correct here because the OUTPUT is aggregate-sized (one row per
    * distinct hash), not corpus-sized; a pipeline materializing the kept
    * documents themselves would switch to update mode with a
    * downstream idempotent sink keyed on text_hash. */
  def q49StreamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val schema = docs.schema
    val dir = Files.createTempDirectory("q49_docs")
    docs.repartition(4).write.mode("overwrite").parquet(dir.toString)

    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

    val table = s"q49_dedup_${runId.incrementAndGet()}"
    val query = agg.writeStream.outputMode("complete")
      .format("memory").queryName(table).start()
    try query.processAllAvailable()
    finally query.stop()

    spark.table(table).orderBy("keep_id")
  }
}
