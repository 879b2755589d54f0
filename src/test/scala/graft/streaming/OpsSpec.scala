package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.BatchedSinks._

/** Operational parity: checkpoint/recovery (SURVEY §2.9), connector-shaped
  * sinks (K3/K4), metrics (reference Prometheus registry), redistribution.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed file-stream restart loses and duplicates nothing") {
    val inDir = Files.createTempDirectory("ck_in")
    val ckDir = Files.createTempDirectory("ck_state")
    val outDir = Files.createTempDirectory("ck_out")

    val all = Fixtures.genRecords()
    // three time-ordered input files + a far-future sentinel file (flushes
    // all windows); time-ordered so no file arrives behind the watermark
    val parts = all.sortBy(_.timestamp).grouped(15).toSeq
    def writeFile(rows: Seq[Fixtures.Model], name: String): Unit =
      rows.toDF("timestamp", "name", "value").coalesce(1)
        .write.parquet(s"$inDir/$name")
    writeFile(parts(0), "f0")
    writeFile(parts(1), "f1")

    val schema = spark.read.parquet(s"$inDir/f0").schema
    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*/")
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "1 second")
      .groupBy(window(col("eventTime"), "60 seconds"), col("name"))
      .agg(sum("value").as("s"), count(lit(1)).as("c"))
      .select(col("window.start").cast("long").as("ws"), col("name"),
        col("s"), col("c"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckDir.toString)
      .start()

    // phase 1: consume the first two files, then stop (simulated failure)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // phase 2: more data arrives while down; restart from the checkpoint
    writeFile(parts(2), "f2")
    writeFile(Seq(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L)), "f3")
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir.toString)
      .filter(col("name") =!= "zzz")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
    // exactly-once across the restart: each window emitted exactly once
    assert(got.length === got.map(_._1).distinct.length)
    val expected = Fixtures.expectedWindows(all, 60, 60)
      .map { case (k, (s, _, _, c)) => k -> (s, c) }
    assert(got.toMap === expected)
  }

  test("flagship streaming agg runs on the RocksDB state store (spillable state)") {
    // At 100 TB window state outgrows the in-heap HDFSBacked provider;
    // RocksDB spills to local disk with incremental checkpointing. Same
    // results, swap-in config.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Fixtures.Model]
      val q = source.toDF()
        .withColumn("eventTime", timestamp_millis(col("timestamp")))
        .withWatermark("eventTime", "1 second")
        .groupBy(window(col("eventTime"), "60 seconds", "20 seconds"), col("name"))
        .agg(sum("value").as("s"), max("value").as("mx"),
          min("value").as("mn"), count(lit(1)).as("c"))
        .writeStream.outputMode("append").format("memory")
        .queryName("rocksdb_probe").start()
      source.addData(Fixtures.genRecords())
      q.processAllAvailable()
      source.addData(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("rocksdb_probe")
        .filter(col("name") =!= "zzz")
        .select(col("window.start").cast("long").as("ws"), col("name"),
          col("s"), col("mx"), col("mn"), col("c"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      assert(got === Fixtures.expectedWindows(Fixtures.genRecords(), 60, 20))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("BatchedJdbcShapedSink: batch_size flush + round-robin endpoints, no loss") {
    OpsSpec.inserted.clear()
    val sink = new BatchedJdbcShapedSink(
      Seq("ch://a", "ch://b"), batchSize = 7,
      (url, rows) => OpsSpec.inserted.add(url -> rows.size))
    val df = spark.range(100).repartition(4).toDF("id")
    sink.write(df)
    import scala.jdk.CollectionConverters._
    val batches = OpsSpec.inserted.asScala.toSeq
    assert(batches.map(_._2).sum === 100)          // nothing lost
    assert(batches.forall(_._2 <= 7))              // flush at batch_size
    assert(batches.map(_._1).toSet === Set("ch://a", "ch://b")) // RR by task
  }

  test("BulkIndexShapedSink: converter + bulk grouping delivers every action") {
    OpsSpec.bulks.clear()
    val sink = new BulkIndexShapedSink(
      r => IndexAction("idx", r.getLong(0).toString, s"""{"v":${r.getLong(0)}}"""),
      bulkSize = 10,
      actions => OpsSpec.bulks.add(actions.size))
    sink.write(spark.range(35).repartition(2).toDF("id"))
    import scala.jdk.CollectionConverters._
    assert(OpsSpec.bulks.asScala.sum === 35)
    assert(OpsSpec.bulks.asScala.forall(_ <= 10))
  }

  test("metrics listener reports input rows and window state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    try {
      val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Fixtures.Model]
      val q = source.toDF()
        .withColumn("eventTime", timestamp_millis(col("timestamp")))
        .withWatermark("eventTime", "1 second")
        .groupBy(window(col("eventTime"), "60 seconds"), col("name"))
        .agg(count(lit(1)).as("c"))
        .writeStream.outputMode("append").format("memory")
        .queryName("metrics_probe").start()
      source.addData(Fixtures.genRecords())
      q.processAllAvailable()
      q.stop()
      val m = listener.snapshot("metrics_probe")
      assert(m.inputRows === 45)
      assert(m.batches >= 1)
      assert(m.stateRows > 0)
    } finally spark.streams.removeListener(listener)
  }

  test("rebalance and partitionByKey control partitioning") {
    val env = api.StreamExecutionEnvironment(spark)
    val ds = env.fromDataFrame(spark.range(100).toDF("id"))
    assert(ds.rebalance(5).df.rdd.getNumPartitions === 5)
    val byKey = ds.partitionByKey(4, "id").df
    assert(byKey.rdd.getNumPartitions === 4)
  }

  test("transformWithState survives a kill+restart exactly once (RocksDB)") {
    // §2.9 F1-F3 for the NEW typed-state API: the q126 ValueState fold,
    // killed mid-stream and restarted from its checkpoint — no event
    // lost, none double-counted, per-user counters continue where the
    // failed run's last committed batch left them.
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val inDir = Files.createTempDirectory("tws_in")
    val ckDir = Files.createTempDirectory("tws_ck")
    val outDir = Files.createTempDirectory("tws_out")

    val evs = (0 until 40).map { i =>
      StreamParity.SeqEv(user_id = i % 4, ts_us = 1000000L * i,
        event_id = i.toLong,
        event_type = if (i % 5 == 0) "purchase" else "click")
    }
    def writeFile(rows: Seq[StreamParity.SeqEv], name: String): Unit = {
      rows.toDF().coalesce(1).write.parquet(s"$inDir/$name")
      // replay order across the restart follows the PART FILES' mod-times
      // (the source orders by file, not directory, timestamps)
      new java.io.File(s"$inDir/$name").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => require(f.setLastModified(
          System.currentTimeMillis() - 3600000L + name.last.toInt * 10000L)))
    }
    val parts = evs.grouped(10).toSeq
    writeFile(parts(0), "f0")
    writeFile(parts(1), "f1")

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$inDir/f0").schema
      def startQuery() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*/")
        .as[StreamParity.SeqEv]
        .groupByKey(_.user_id)
        .transformWithState(new StreamParity.RunningSeqProcessor,
          TimeMode.None(), OutputMode.Append())
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckDir.toString)
        .start()

      val q1 = startQuery()
      q1.processAllAvailable()
      q1.stop() // simulated failure after 2 committed batches

      writeFile(parts(2), "f2") // arrives while down
      writeFile(parts(3), "f3")
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
    }

    val got = spark.read.parquet(outDir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length === 40, "no loss, no duplication across the restart")
    assert(got.map(_._1).distinct.length === 40)
    // the fold continued across the restart: full expected trajectory
    val expected = evs.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      es.sortBy(_.ts_us).zipWithIndex.map { case (e, i) =>
        (e.event_id, u, i + 1L,
          es.sortBy(_.ts_us).take(i + 1).count(_.event_type == "purchase").toLong)
      }
    }.sortBy(_._1)
    assert(got.toSeq === expected)
  }
}

object OpsSpec {
  val inserted = new ConcurrentLinkedQueue[(String, Int)]()
  val bulks = new ConcurrentLinkedQueue[Int]()
}
