package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.SparkSpec
import graft.streaming.api._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val env = StreamExecutionEnvironment(spark)

  private def fixtureDf = Fixtures.genRecords()
    .toDF("timestamp", "name", "value")

  // -------------------------------------------------------------------
  // Facade: the reference example-simple pipeline, batch mode, checked
  // against an independent brute-force window computation.
  // -------------------------------------------------------------------
  test("facade flagship: sliding 60/20 window agg matches brute force on gen_records fixture") {
    val out = env.fromDataFrame(fixtureDf)
      .filter(col("value") > 0)
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(1))
      .keyBy("name")
      .window(SlidingEventTimeWindows.of(Time.seconds(60), Time.seconds(20)))
      .reduce(Agg.Sum("value"), Agg.Max("value"), Agg.Min("value"), Agg.Count())
      .df
      .select(col("window.start").cast("long").as("ws"), col("name"),
        col("sum(value)"), col("max(value)"), col("min(value)"), col("count"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    val expected = Fixtures.expectedWindows(Fixtures.genRecords(), 60, 20)
    assert(out === expected)
    // spot value from the reference example: window [12:01:00, 12:02:00)
    // holds values 1..9 per key
    val w = Fixtures.BaseTs / 1000
    assert(out((w, "A-key-0")) === ((45L, 9L, 1L, 9L)))
  }

  test("facade window offset: bucketing shifts by normalized offset") {
    val out = env.fromDataFrame(fixtureDf)
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(1))
      .keyBy("name")
      .window(SlidingEventTimeWindows(Time.seconds(60), Time.seconds(20),
        Time.seconds(-15))) // reference allows back offsets
      .reduce(Agg.Count())
      .df.select(col("window.start").cast("long").as("ws")).distinct()
      .collect().map(_.getLong(0))
    // -15 mod 20 = 5: all starts ≡ 5 (mod 20)
    assert(out.nonEmpty && out.forall(s => ((s % 20) + 20) % 20 === 5))
  }

  // -------------------------------------------------------------------
  // True streaming execution: same pipeline through MemoryStream +
  // watermark + append sink equals the batch result.
  // -------------------------------------------------------------------
  test("streaming flagship equals batch result (sentinel end-of-stream flush)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val agg = env.fromDataFrame(source.toDF())
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(1))
      .keyBy("name")
      .window(SlidingEventTimeWindows.of(Time.seconds(60), Time.seconds(20)))
      .reduce(Agg.Sum("value"), Agg.Max("value"), Agg.Min("value"), Agg.Count())

    val query = agg.df.writeStream.outputMode("append")
      .format("memory").queryName("flagship_stream").start()
    try {
      source.addData(Fixtures.genRecords())
      query.processAllAvailable()
      // MAX_WATERMARK analog: flush all windows
      source.addData(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("flagship_stream")
      .filter(col("name") =!= "zzz")
      .select(col("window.start").cast("long").as("ws"), col("name"),
        col("sum(value)"), col("max(value)"), col("min(value)"), col("count"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got === Fixtures.expectedWindows(Fixtures.genRecords(), 60, 20))
  }

  // -------------------------------------------------------------------
  // Watermark late-data semantics (E7: drop records older than the
  // watermark at the stateful aggregation).
  // -------------------------------------------------------------------
  test("late record behind the watermark is dropped from closed windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val agg = source.toDF()
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "1 second")
      .groupBy(window(col("eventTime"), "60 seconds"), col("name"))
      .agg(sum("value").as("s"), count(lit(1)).as("c"))

    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_drop").start()
    try {
      val base = Fixtures.BaseTs
      source.addData(Fixtures.Model(base, "k", 1))
      source.addData(Fixtures.Model(base + 600 * 1000, "k", 2)) // advance wm far
      query.processAllAvailable()
      // late: 10 minutes behind the watermark, its window already closed
      source.addData(Fixtures.Model(base + 1000, "k", 100))
      // flush
      source.addData(Fixtures.Model(base + 7200 * 1000, "zzz", 0))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.table("late_drop").filter(col("name") === "k")
      .select(col("window.start").cast("long"), col("s"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the late value=100 must not appear anywhere
    assert(rows === Set(
      (Fixtures.BaseTs / 1000 / 60 * 60, 1L, 1L),
      ((Fixtures.BaseTs / 1000 + 600) / 60 * 60, 2L, 1L)))
  }

  // -------------------------------------------------------------------
  // Facade session windows (superset op) — streaming equals batch.
  // -------------------------------------------------------------------
  test("facade session windows: streaming result equals batch result") {
    def pipeline(ds: DataStream): DataStream = ds
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(1))
      .keyBy("name")
      .window(SessionEventTimeWindows.withGap(Time.seconds(8)))
      .reduce(Agg.Sum("value"), Agg.Count())

    val batch = pipeline(env.fromDataFrame(fixtureDf)).df
      .select(col("window.start").cast("long"), col("name"),
        col("sum(value)"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty)
    // fixture gaps: offsets 0,5 then 15,20,25 then 35,... — an 8s gap
    // splits sessions at every 10s jump: multiple sessions per key
    assert(batch.count(_._2 == "A-key-0") > 1)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val query = pipeline(env.fromDataFrame(source.toDF())).df
      .writeStream.outputMode("append")
      .format("memory").queryName("session_stream").start()
    try {
      source.addData(Fixtures.genRecords())
      query.processAllAvailable()
      source.addData(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("session_stream")
      .filter(col("name") =!= "zzz")
      .select(col("window.start").cast("long"), col("name"),
        col("sum(value)"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
  }

  // -------------------------------------------------------------------
  // Pct aggregate through the facade — streaming equals batch, values
  // are scale boundaries.
  // -------------------------------------------------------------------
  test("facade Agg.Pct: streaming percentile equals batch percentile") {
    val scale = graft.functions.GraftFunctions.leveldbScale90
    def pipeline(ds: DataStream): DataStream = ds
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(1))
      .keyBy("name")
      .window(TumblingEventTimeWindows.of(Time.seconds(60)))
      .reduce(Agg.Pct("value", scale, 90), Agg.Count())

    val batch = pipeline(env.fromDataFrame(fixtureDf)).df
      .select(col("window.start").cast("long"), col("name"),
        col("pct(value,90)"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty)
    assert(batch.forall(t => scale.contains(t._3)))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val query = pipeline(env.fromDataFrame(source.toDF())).df
      .writeStream.outputMode("append")
      .format("memory").queryName("pct_stream").start()
    try {
      source.addData(Fixtures.genRecords())
      query.processAllAvailable()
      source.addData(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L))
      query.processAllAvailable()
    } finally query.stop()

    val streamed = spark.table("pct_stream")
      .filter(col("name") =!= "zzz")
      .select(col("window.start").cast("long"), col("name"),
        col("pct(value,90)"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
  }

  // -------------------------------------------------------------------
  // CoProcess: general tagged-union stateful correlation.
  // -------------------------------------------------------------------
  test("CoProcess.connect enriches a fact side with config-side state") {
    import StreamingSpec.{Config, Fact}
    val facts   = Seq(Fact("a", 1), Fact("a", 2), Fact("b", 10)).toDS()
    val configs = Seq(Config("a", 3), Config("b", 5)).toDS()

    val out = CoProcess.connect(facts, configs)(_.k, _.k) {
      (k: String, it: Iterator[Either[Fact, Config]], _: GroupState[Long]) =>
        val (fs, cs) = it.toSeq.partition(_.isLeft)
        val mult = cs.collectFirst { case Right(c) => c.mult }.getOrElse(1L)
        fs.iterator.collect { case Left(f) => (k, f.v * mult) }
    }.collect().toSet

    assert(out === Set(("a", 3L), ("a", 6L), ("b", 50L)))
  }

  test("streaming deduplicate drops cross-micro-batch duplicates, state bounded by watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val dedup = env.fromDataFrame(source.toDF())
      .assignTimestampsAndWatermarks("timestamp", Time.seconds(10))
      .deduplicate(withinWatermark = true, "name", "value")

    val query = dedup.df.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      val t0 = Fixtures.BaseTs
      source.addData(Fixtures.Model(t0, "k", 1), Fixtures.Model(t0, "k", 1))
      query.processAllAvailable()
      // same key+value again in a later micro-batch, still inside the
      // watermark window -> deduplicated against state
      source.addData(Fixtures.Model(t0 + 1000, "k", 1), Fixtures.Model(t0 + 1000, "k", 2))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("dedup_stream")
      .select("name", "value").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sorted.toSeq === Seq(("k", 1L), ("k", 2L)))
  }

  test("deduplicate with no keys dedups full rows, not collapse-to-one") {
    val ds = env.fromDataFrame(
      Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("k", "v"))
    assert(ds.deduplicate(withinWatermark = false).df.count() === 2)
  }

  test("CoProcess over streams: operator state persists across micro-batches") {
    import StreamingSpec.{Config, Fact}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val facts = MemoryStream[Fact]
    val configs = MemoryStream[Config]

    val out = CoProcess.connect(facts.toDS(), configs.toDS())(_.k, _.k) {
      (k: String, it: Iterator[Either[Fact, Config]], state: GroupState[Long]) =>
        var mult = state.getOption.getOrElse(1L)
        val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        it.foreach {
          case Right(c) => mult = c.mult; state.update(mult)
          case Left(f)  => emitted += ((k, f.v * mult))
        }
        emitted.iterator
    }

    val query = out.toDF().writeStream.outputMode("append")
      .format("memory").queryName("coprocess_stream").start()
    try {
      // micro-batch 1: config side only -> stored in operator state
      configs.addData(Config("a", 3))
      query.processAllAvailable()
      // micro-batch 2: facts arrive later, enriched from persisted state
      facts.addData(Fact("a", 2), Fact("b", 10))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("coprocess_stream").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // key "a" uses the batch-1 config (2*3); key "b" saw none (10*1)
    assert(got === Set(("a", 6L), ("b", 10L)))
  }

  // -------------------------------------------------------------------
  // Stream-stream interval join: the general two-stream correlation the
  // reference's CoProcess covers, as a first-class watermarked join —
  // both sides' state is evicted by watermark + range bound, so state
  // stays O(window), not O(stream).
  // -------------------------------------------------------------------
  test("stream-stream interval join with watermarks matches expected pairs") {
    import StreamingSpec.{Click, Imp}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]

    val joined = imps.toDF()
      .withColumn("its", timestamp_millis(col("impTs"))).drop("impTs")
      .withWatermark("its", "10 seconds")
      .join(
        clicks.toDF()
          .withColumn("cts", timestamp_millis(col("clickTs"))).drop("clickTs")
          .withWatermark("cts", "10 seconds"),
        expr("impId = clickImpId AND cts >= its AND cts <= its + interval 60 seconds"))

    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      val t0 = Fixtures.BaseTs
      imps.addData(Imp("i1", t0), Imp("i2", t0 + 5000))
      clicks.addData(
        Click("i1", t0 + 30 * 1000),   // inside the 60s bound -> joins
        Click("i2", t0 + 120 * 1000),  // outside the bound -> dropped
        Click("i9", t0 + 10 * 1000))   // no matching impression
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("ss_join")
      .select("impId", "clickImpId").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("i1", "i1")))
  }

  // -------------------------------------------------------------------
  // Kafka offset-mode mapping (FIXTURES.md §4 bounded-replay shape).
  // -------------------------------------------------------------------
  test("Kafka Direct offset range maps to starting/endingOffsets JSON") {
    val opts = Kafka.sourceOptions("broker:9092", "t",
      Kafka.Direct(Map(0 -> 121L, 1 -> 71L, 2 -> 78L),
        Some(Map(0 -> 137L, 1 -> 84L, 2 -> 94L))))
    assert(opts("startingOffsets") === """{"t": {"0": 121, "1": 71, "2": 78}}""")
    assert(opts("endingOffsets") === """{"t": {"0": 137, "1": 84, "2": 94}}""")
    assert(opts("subscribe") === "t")
  }

  test("Kafka Timestamp offset range maps to startingOffsetsByTimestamp") {
    val opts = Kafka.sourceOptions("b:9092", "t",
      Kafka.Timestamp(Map(0 -> 1500000000000L), None))
    assert(opts("startingOffsetsByTimestamp") === """{"t": {"0": 1500000000000}}""")
    assert(!opts.contains("endingOffsetsByTimestamp"))
  }

  test("Kafka FromCheckpoint falls back to cold-start offsets") {
    val opts = Kafka.sourceOptions("b:9092", "t", Kafka.FromCheckpoint("earliest"))
    assert(opts("startingOffsets") === "earliest")
  }
}

object StreamingSpec {
  final case class Fact(k: String, v: Long)
  final case class Config(k: String, mult: Long)
  final case class Imp(impId: String, impTs: Long)
  final case class Click(clickImpId: String, clickTs: Long)
}
