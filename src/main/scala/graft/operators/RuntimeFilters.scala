package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.Tables

/** Explicit runtime-filter (semi-join reduction) operator.
  *
  * q84 — Bloom-filter semi-join: `orders` rows restricted to customers in
  * one market segment. The naive plan shuffles EVERY probe-side row to
  * the join; at 100 TB the probe shuffle dominates the query. The
  * semi-join-reduction plan is the classic fix (Bloom-join; Spark itself
  * applies the same idea adaptively via
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, here surfaced as a
  * deterministic operator the user controls):
  *
  *   1. BUILD (distributed): aggregate the build-side keys into ONE
  *      Bloom filter via `BloomFilterAggregate` — a TypedImperative
  *      aggregate whose partial states (the filters themselves) OR
  *      together associatively on the map side, so the shuffle carries
  *      one ~100 KB..MB sketch per partition, never the keys. The final
  *      sketch is the only thing the driver sees: its size is
  *      O(distinct build keys), independent of probe size — bounded by
  *      the same broadcast-ability assumption any semi-join reduction
  *      needs (here sized for 1% false positives).
  *   2. PROBE: `BloomFilterMightContain(lit(sketch), key)` evaluates
  *      INSIDE the probe-side scan stage, before any exchange — false
  *      positives only, so the ~99% of probe rows with no build match
  *      are dropped pre-shuffle.
  *   3. EXACT: a left-semi join against the real build keys removes the
  *      false positives; it shuffles only the pre-filtered survivors.
  *
  * The result is therefore EXACTLY the plain semi-join (the oracle), with
  * probe shuffle volume cut to (selectivity + fpp) of the input.
  *
  * Reference context: rlink's broadcast flag-map
  * (`rlink/src/functions/flat_map/broadcast_flat_map.rs`) solves the
  * same problem by broadcasting the whole dimension; the Bloom variant
  * is the shape that still works when the build side's KEYS fit in a
  * sketch but the rows themselves are too wide/many to broadcast.
  */
object RuntimeFilters {

  private val Segment = "BUILDING"

  /** Distributed build: one binary Bloom sketch over `keys` (LongType). */
  private def bloomSketch(build: DataFrame, key: String,
                          expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(col(key).cast("long")),
      Literal(expectedItems),
      // ~9.6 bits/item = 1% fpp (BloomFilter.optimalNumOfBits)
      Literal(math.max(expectedItems * 10L, 1024L))).toAggregateExpression()
    build.agg(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Probe-side pre-filter predicate: might_contain(sketch, key). */
  private def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(sketch)),
      ColumnBridge.expression(key.cast("long"))))

  def q84BloomSemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val build = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === Segment)
      .select(col("c_custkey"))

    // Expected-items estimate: exact count of the (small) build side —
    // one job over the dimension. At 100 TB the dimension count is still
    // cheap relative to the probe scan this sketch is about to prune;
    // an approx_count_distinct pre-pass works when even that is too much.
    val sketch = bloomSketch(build, "c_custkey", math.max(build.count(), 1L))

    val probe = Tables.orders(spark, sfDir)
      .filter(mightContain(sketch, col("o_custkey")))   // pre-shuffle prune

    probe.join(build, probe("o_custkey") === build("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")
  }

  val q84Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
       |FROM orders
       |WHERE o_custkey IN (SELECT c_custkey FROM customer
       |                    WHERE c_mktsegment = '$Segment')
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Exposed for specs: the probe-side survivor count with and without
    * the sketch, to assert the pre-filter actually prunes. */
  private[graft] def probeStats(spark: SparkSession, sfDir: String): (Long, Long, Long) = {
    val build = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === Segment)
      .select(col("c_custkey"))
    val sketch = bloomSketch(build, "c_custkey", math.max(build.count(), 1L))
    val orders = Tables.orders(spark, sfDir)
    val total = orders.count()
    val afterBloom = orders.filter(mightContain(sketch, col("o_custkey"))).count()
    val exact = orders.join(build, orders("o_custkey") === build("c_custkey"),
      "left_semi").count()
    (total, afterBloom, exact)
  }
}
