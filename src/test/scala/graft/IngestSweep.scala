package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scratch sweep for the flagship streaming-ingest config (run manually:
  * `sbt "Test/runMain graft.IngestSweep"`). Mirrors Bench's ingest path
  * (file source -> watermark -> sliding window -> noop, AvailableNow)
  * under different state-store/trigger configs; each config runs in a
  * fresh session on the same warmed JVM, best of 2.
  */
object IngestSweep {
  private val sfDir = "/root/testdata/sf0.1"

  private def run(spark: SparkSession): Double = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("sweep_events")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val agg = Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(dir.toString))
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "60 seconds", "20 seconds"), col("event_type"))
      .agg(sum("value").as("sum_value"), max("value").as("max_value"),
        min("value").as("min_value"), count(lit(1)).as("cnt"))
    val t0 = System.nanoTime()
    val q = agg.writeStream.outputMode("append").format("noop")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val base = TestSpark.spark
    val configs: Seq[(String, Map[String, String])] = Seq(
      "baseline p8 hdfs" -> Map(
        "spark.sql.shuffle.partitions" -> "8"),
      "p4 hdfs" -> Map(
        "spark.sql.shuffle.partitions" -> "4"),
      "p8 hdfs noDataBatch=off" -> Map(
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false"),
      "p8 rocksdb" -> Map(
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "p8 rocksdb changelog" -> Map(
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"),
      "p8 hdfs zstd" -> Map(
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.streaming.stateStore.compression.codec" -> "zstd"),
    )
    // warm the JVM once (codegen, parquet reader, streaming machinery)
    run(base.newSession())
    for ((name, conf) <- configs) {
      val t = (1 to 2).map { _ =>
        val s = base.newSession()
        conf.foreach { case (k, v) => s.conf.set(k, v) }
        run(s)
      }.min
      println(f"$name%-28s $t%.2f s  ${100000 / t}%.0f rows/s")
    }
    base.stop()
  }
}
