package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal joins — as-of and range — the two join shapes streaming/
  * time-series engines need that plain equi-joins don't express well.
  * The reference's only multi-stream operator is connect/CoProcess
  * (`rlink/src/core/data_stream.rs:143-148`), whose enrichment use case
  * q06 covers; these generalize it to time-indexed enrichment.
  *
  * Scale design:
  *  - q28 as-of is NOT implemented as join-then-rank (which materializes
  *    |events| x |orders-per-customer| rows before pruning). It is the
  *    sort-merge as-of: union both sides, one hash shuffle on the key,
  *    per-key time sort, and a running `last(..., ignoreNulls)` window —
  *    linear in input, zero row explosion, one shuffle total. This is the
  *    plan that survives 100 TB.
  *  - q29 range join buckets time into window-width bins and equi-joins
  *    on (key, bin) with the left side exploded to its two candidate
  *    bins, then filters the exact range. The shuffle carries only
  *    same-key-same-bin candidates — never the per-key cross product.
  */
object TemporalJoins {

  // ---------------------------------------------------------------------
  // q28 — as-of join: each event matched to the latest order with
  // o_orderdate <= event ts for the same customer (ties broken by max
  // o_orderkey); events with no prior order keep NULLs.
  // ---------------------------------------------------------------------
  def q28AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts"), col("event_id"),
      lit(null).cast("long").as("o_key"),
      lit(null).cast("double").as("o_price"),
      lit(1).as("side"))
    val ord = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("o_key"),
      col("o_totalprice").as("o_price"),
      lit(0).as("side"))
    // Orders sort before events at equal ts (side 0 < 1): "at or before"
    // is inclusive. Among equal-ts orders, ascending o_key makes
    // `last` pick the max orderkey — the deterministic tie-break.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof_orderkey", last(col("o_key"), ignoreNulls = true).over(w))
      .withColumn("asof_price", last(col("o_price"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        col("asof_orderkey"), col("asof_price"))
      .orderBy("event_id")
  }

  val q28Sql: String =
    """SELECT event_id, user_id, asof_orderkey, asof_price FROM (
      |  SELECT e.event_id, e.user_id,
      |         o.o_orderkey AS asof_orderkey,
      |         o.o_totalprice AS asof_price,
      |         ROW_NUMBER() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q29 — range (interval) join: for each 'error' event, the number of
  // 'purchase' events by the same user in the preceding 6 h
  // [ts - 21600 s, ts).
  // ---------------------------------------------------------------------
  private val RangeSec = 21600L

  private def bin(ts: org.apache.spark.sql.Column) =
    floor(ts.cast("double") / lit(RangeSec.toDouble))

  def q29RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts").as("e_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), bin(col("ts")).as("bin"))
    // A window of width RangeSec spans at most two RangeSec bins.
    val eb = errors.withColumn("bin",
      explode(array(bin(col("e_ts")), bin(col("e_ts")) - 1)))
    val matches = eb.join(purchases, Seq("user_id", "bin"))
      .filter(col("p_ts") >= col("e_ts") - expr(s"INTERVAL $RangeSec SECONDS") &&
        col("p_ts") < col("e_ts"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_matched"))
    errors.select(col("event_id"))
      .join(matches, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_purchases"))
      .orderBy("event_id")
  }

  val q29Sql: String =
    s"""SELECT e.event_id, COUNT(p.ts) AS n_purchases
       |FROM events e LEFT JOIN events p
       |  ON e.user_id = p.user_id AND p.event_type = 'purchase'
       | AND p.ts >= e.ts - INTERVAL '$RangeSec seconds' AND p.ts < e.ts
       |WHERE e.event_type = 'error'
       |GROUP BY e.event_id
       |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q117 — as-of join with a STALENESS TOLERANCE: q28's "latest order at
  // or before the event" match, nulled out when that order is older
  // than 30 days — the feature-freshness contract of every feature
  // store (a stale feature is worse than no feature) and the `asof
  // join ... tolerance` of kdb/pandas/QuestDB.
  //
  // Same single-window shape as q28 — the union trick needs NO second
  // pass for the bound: the matched order's OWN timestamp rides along
  // as one more last(_, ignoreNulls) column, and the tolerance check is
  // a projection over (event ts, matched ts). One shuffle on the key,
  // no join node at all, no row explosion — vs the naive
  // events x orders range join this plan never materializes.
  // ---------------------------------------------------------------------
  private[graft] val AsofToleranceSec = 30L * 86400

  def q117AsofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts"), col("event_id"),
      lit(null).cast("long").as("o_key"),
      lit(null).cast("double").as("o_price"),
      lit(null).cast("timestamp").as("o_ts"),
      lit(1).as("side"))
    val ord = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("ts"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("o_key"),
      col("o_totalprice").as("o_price"),
      col("o_orderdate").as("o_ts"),
      lit(0).as("side"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = unix_timestamp(col("ts")) -
      unix_timestamp(col("m_ts")) <= AsofToleranceSec
    ev.unionByName(ord)
      .withColumn("m_key", last(col("o_key"), ignoreNulls = true).over(w))
      .withColumn("m_price", last(col("o_price"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(col("o_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        when(fresh, col("m_key")).as("asof_orderkey"),
        when(fresh, col("m_price")).as("asof_price"),
        when(fresh,
          unix_timestamp(col("ts")) - unix_timestamp(col("m_ts")))
          .as("staleness_sec"))
      .orderBy("event_id")
  }

  val q117Sql: String =
    s"""SELECT event_id, user_id,
       |       CASE WHEN fresh THEN asof_orderkey END AS asof_orderkey,
       |       CASE WHEN fresh THEN asof_price END AS asof_price,
       |       CASE WHEN fresh THEN staleness END AS staleness_sec
       |FROM (
       |  SELECT event_id, user_id, asof_orderkey, asof_price, staleness,
       |         staleness <= $AsofToleranceSec AS fresh
       |  FROM (
       |    SELECT e.event_id, e.user_id,
       |           o.o_orderkey AS asof_orderkey,
       |           o.o_totalprice AS asof_price,
       |           CAST(FLOOR(epoch(e.ts)) AS BIGINT)
       |             - CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) AS staleness,
       |           ROW_NUMBER() OVER (PARTITION BY e.event_id
       |                              ORDER BY o.o_orderdate DESC,
       |                                       o.o_orderkey DESC) AS rn
       |    FROM events e LEFT JOIN orders o
       |      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
       |  WHERE rn = 1)
       |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // q150 — NEAREST-direction as-of join (pandas merge_asof
  // direction='nearest', kdb nearest-aj): each event matches the order
  // with the smallest |Δt| on either side, ties to the backward match —
  // the sensor/trade alignment primitive where the closest reading, not
  // the last one, is truth. q28/q117 are the backward-only family; this
  // adds the forward sweep and the comparison.
  //
  // Shape: the SAME single union + user_id window exchange as q28 — the
  // backward candidate is last(non-null) over the ascending frame, the
  // forward candidate first(non-null) over the descending-remainder
  // frame, both riding ONE sort of one exchange. No join node, no row
  // explosion; tie conventions (backward at equal |Δt|; max key among
  // equal backward ts, min key among equal forward ts) are pinned in
  // both engines.
  // ---------------------------------------------------------------------
  def q150AsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id").as("k"), col("ts"), col("event_id"),
      lit(null).cast("long").as("o_key"),
      lit(null).cast("double").as("o_price"),
      lit(null).cast("timestamp").as("o_ts"),
      lit(1).as("side"))
    val ord = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("k"), col("o_orderdate").cast("timestamp").as("ts"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("o_key"),
      col("o_totalprice").as("o_price"),
      col("o_orderdate").cast("timestamp").as("o_ts"),
      lit(0).as("side"))
    val wB = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("o_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("o_key"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bdt = unix_timestamp(col("ts")) - unix_timestamp(col("b_ts"))
    val fdt = unix_timestamp(col("f_ts")) - unix_timestamp(col("ts"))
    val takeB = col("f_key").isNull ||
      (col("b_key").isNotNull && bdt <= fdt)
    ev.unionByName(ord)
      .withColumn("b_key", last(col("o_key"), ignoreNulls = true).over(wB))
      .withColumn("b_price", last(col("o_price"), ignoreNulls = true).over(wB))
      .withColumn("b_ts", last(col("o_ts"), ignoreNulls = true).over(wB))
      .withColumn("f_key", first(col("o_key"), ignoreNulls = true).over(wF))
      .withColumn("f_price", first(col("o_price"), ignoreNulls = true).over(wF))
      .withColumn("f_ts", first(col("o_ts"), ignoreNulls = true).over(wF))
      .filter(col("side") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        when(takeB, col("b_key")).otherwise(col("f_key")).as("near_orderkey"),
        when(takeB, col("b_price")).otherwise(col("f_price")).as("near_price"),
        when(takeB, bdt).otherwise(-fdt).as("signed_dt_sec"),
        when(col("b_key").isNull && col("f_key").isNull, lit(null))
          .otherwise(when(takeB, lit("b")).otherwise(lit("f")))
          .cast("string").as("direction"))
      .orderBy("event_id")
  }

  val q150Sql: String =
    """SELECT event_id, user_id, near_orderkey, near_price, signed_dt_sec,
      |       direction
      |FROM (
      |  SELECT e.event_id, e.user_id,
      |         o.o_orderkey AS near_orderkey,
      |         o.o_totalprice AS near_price,
      |         CAST(FLOOR(epoch(e.ts)) AS BIGINT)
      |           - CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT)
      |           AS signed_dt_sec,
      |         CASE WHEN o.o_orderkey IS NULL THEN NULL
      |              WHEN o.o_orderdate <= e.ts THEN 'b' ELSE 'f' END
      |           AS direction,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY e.event_id
      |           ORDER BY abs(CAST(FLOOR(epoch(e.ts)) AS BIGINT)
      |                        - CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT)),
      |                    CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END,
      |                    CASE WHEN o.o_orderdate <= e.ts
      |                         THEN -o.o_orderkey ELSE o.o_orderkey END)
      |           AS rn
      |  FROM events e LEFT JOIN orders o ON e.user_id = o.o_custkey)
      |WHERE rn = 1
      |ORDER BY event_id""".stripMargin
}
