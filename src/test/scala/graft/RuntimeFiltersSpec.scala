package graft

import org.apache.spark.sql.functions._

import graft.operators._

class RuntimeFiltersSpec extends SparkSpec {

  test("q84 bloom pre-filter prunes the probe side but never drops a match") {
    val (total, afterBloom, exact) = RuntimeFilters.probeStats(spark, sf)
    // No false negatives: every true semi-join row survives the sketch.
    assert(afterBloom >= exact)
    // It actually prunes: the BUILDING segment is ~1/5 of customers, the
    // sketch is sized for 1% fpp — survivors must be well under half the
    // probe (generous bound; measured ~0.21 * total).
    assert(afterBloom < total / 2,
      s"bloom pre-filter did not prune: $afterBloom of $total survived")
    assert(exact > 0)
  }

  test("q84 equals the plain (no-sketch) semi-join aggregate") {
    val got = RuntimeFilters.q84BloomSemiJoin(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val build = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables.orders(spark, sf)
    val exp = orders
      .join(build, orders("o_custkey") === build("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Relational.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === exp.toSeq)
  }
}
