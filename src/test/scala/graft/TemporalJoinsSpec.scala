package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Cross-checks the scale-path temporal joins against naive reference
  * formulations (join-then-rank / unbucketed range join) on sf0.001. */
class TemporalJoinsSpec extends SparkSpec {

  test("q28 as-of (union+window) equals naive join-then-rank") {
    val got = TemporalJoins.q28AsofJoin(spark, sf)

    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sf)
    val joined = e.join(o,
        e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_id"))
          .orderBy(col("o_orderdate").desc_nulls_last, col("o_orderkey").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_price"))
      .orderBy("event_id")

    assert(got.collect().toSeq == joined.collect().toSeq)
  }

  test("q28 matches are at-or-before the event time") {
    val matched = TemporalJoins.q28AsofJoin(spark, sf)
      .filter(col("asof_orderkey").isNotNull)
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("asof_orderkey"), col("o_orderdate"))
    val e = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val bad = matched.join(o, "asof_orderkey").join(e, "event_id")
      .filter(col("o_orderdate") > col("ts"))
    assert(bad.count() == 0)
    assert(matched.count() > 0)
  }

  test("q29 bucketed range join equals naive range join") {
    val got = TemporalJoins.q29RangeJoin(spark, sf)

    val ev = Tables.events(spark, sf)
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts").as("e_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val naive = e.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("e_ts") - expr("INTERVAL 21600 SECONDS") &&
          col("p_ts") < col("e_ts"), "left")
      .groupBy(col("event_id"))
      .agg(count(col("p_ts")).as("n_purchases"))
      .orderBy("event_id")

    assert(got.collect().toSeq == naive.collect().toSeq)
    // the corpus actually exercises both matched and unmatched cases
    assert(got.filter(col("n_purchases") > 0).count() > 0)
    assert(got.filter(col("n_purchases") === 0).count() > 0)
  }

  test("q117 tolerance as-of equals q28 where fresh, nulls where stale") {
    val base = TemporalJoins.q28AsofJoin(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3)))))
      .toMap
    val tol = TemporalJoins.q117AsofTolerance(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getDouble(3))),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(tol.map(_._1).toSet === base.keySet)
    var stale = 0
    tol.foreach { case (eid, m, s) =>
      (m, s) match {
        case (Some(match_), Some(age)) =>
          assert(base(eid) === Some(match_), s"fresh match must equal q28 at $eid")
          assert(age >= 0 && age <= TemporalJoins.AsofToleranceSec)
        case (None, None) =>
          // either no prior order at all (q28 null too) or a stale one
          if (base(eid).isDefined) stale += 1
        case other => fail(s"match and staleness must be null together: $other")
      }
    }
    assert(stale > 0, "the 30-day bound must actually null out stale matches")
  }

  test("q150: the chosen order really is the nearest, ties go backward") {
    val got = TemporalJoins.q150AsofNearest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        Option(r.getString(5))))
    val ordersByUser = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toEpochSecond(
          java.time.ZoneOffset.UTC)))
      .groupBy(_._1)
    val evTs = Tables.events(spark, sf)
      .selectExpr("event_id", "CAST(FLOOR(unix_micros(ts) / 1e6) AS LONG)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (eid, u, key, dt, dir) =>
      val orders = ordersByUser.getOrElse(u, Array.empty)
      if (orders.isEmpty) assert(key.isEmpty && dt.isEmpty && dir.isEmpty)
      else {
        val t = evTs(eid)
        val best = orders.map { case (_, ok, ots) =>
          (math.abs(t - ots), if (ots <= t) 0 else 1,
            if (ots <= t) -ok else ok, ok, t - ots)
        }.minBy(x => (x._1, x._2, x._3))
        assert(key.contains(best._4), s"event $eid nearest key")
        assert(dt.contains(best._5), s"event $eid dt")
        assert(dir.contains(if (best._5 >= 0) "b" else "f"), s"event $eid dir")
      }
    }
  }
}
