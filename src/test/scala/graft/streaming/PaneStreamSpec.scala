package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Chained stateful windowed aggregation (window-of-window, the pane
  * decomposition of batch q01 expressed in Structured Streaming):
  * correctness gate for multi-stateful-operator pipelines — Spark assigns
  * the 60/20 sliding window of a 20s pane from the pane's time range, and
  * append-mode emission across TWO state stores still matches batch.
  *
  * Measured tradeoff (sf0.1, local[32], AvailableNow): pane-decomposed
  * streaming runs 6.3 s vs 3.9 s direct — the second stateful operator
  * adds a shuffle + per-partition state-commit round, and this pipeline
  * is commit-bound, not update-bound. So batch q01 USES panes (3x less
  * aggregation work per row, smaller shuffle) while the streaming
  * flagship deliberately does NOT; this suite keeps the capability
  * correct for pipelines that need chained windowed aggs (e.g.
  * per-minute rollups of per-second aggregates at high input rates,
  * where update cost dominates commit cost).
  */
class PaneStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming pane-decomposed 60/20 agg equals batch result on the fixture") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[Fixtures.Model]
    val panes = source.toDF()
      .withColumn("eventTime", timestamp_millis(col("timestamp")))
      .withWatermark("eventTime", "1 second")
      .groupBy(window(col("eventTime"), "20 seconds"), col("name"))
      .agg(sum(col("value").cast(DecimalType(25, 6))).as("psum"),
        max("value").as("pmax"), min("value").as("pmin"),
        count(lit(1)).as("pcnt"))
    val agg = panes
      .groupBy(window(col("window"), "60 seconds", "20 seconds"), col("name"))
      .agg(sum(col("psum")).cast("double").as("sum_value"),
        max("pmax").as("max_value"), min("pmin").as("min_value"),
        sum("pcnt").as("cnt"))

    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("pane_stream").start()
    try {
      source.addData(Fixtures.genRecords())
      query.processAllAvailable()
      source.addData(Fixtures.Model(Fixtures.BaseTs + 7200 * 1000L, "zzz", 0L))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("pane_stream")
      .filter(col("name") =!= "zzz")
      .select(col("window.start").cast("long").as("ws"), col("name"),
        col("sum_value"), col("max_value"), col("min_value"), col("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    val expected = Fixtures.expectedWindows(Fixtures.genRecords(), 60, 20)
      .map { case (k, (s, mx, mn, c)) => k -> (s.toDouble, mx, mn, c) }
    assert(got === expected)
  }
}
