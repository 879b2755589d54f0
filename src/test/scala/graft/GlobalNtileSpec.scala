package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TwoPass

/** [[TwoPass.globalNtile]] must reproduce SQL `ntile(k) OVER (ORDER BY
  * keys)` bit-for-bit — it is the shipped scale form behind q151, q220,
  * and q224, so a divergence here is a silent oracle red three queries
  * wide. The sweep crosses the arithmetic's edge regions: n < k (q = 0,
  * the ELSE branch must stay unreached), k | n (r = 0, the THEN branch
  * must stay unreached), ragged n, heavy key ties (rank decided by the
  * tiebreaker), near-unique keys, and parts both below and above the
  * row count (empty range partitions).
  */
class GlobalNtileSpec extends SparkSpec {

  private def check(n: Int, k: Int, parts: Int, keyOf: Int => Long): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (keyOf(i), i.toLong, s"p$i"))
      .toDF("metric", "id", "payload")
    val expected = df.withColumn("bucket",
      ntile(k).over(Window.orderBy(col("metric"), col("id"))).cast("long"))
      .select(col("id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TwoPass.globalNtile(df,
      Seq(col("metric"), col("id")), k, "bucket", parts)
      .select(col("id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"n=$n k=$k parts=$parts: ${got.toSeq.sorted.take(20)} vs " +
        s"${expected.toSeq.sorted.take(20)}")
  }

  test("globalNtile == window ntile across n/k/parts edge regions") {
    check(0, 3, 4, _.toLong)           // empty frame
    check(2, 5, 4, _.toLong)           // n < k: bucket = rank, q = 0
    check(12, 4, 4, _.toLong)          // k | n: r = 0, ELSE-only
    check(13, 4, 4, _.toLong)          // ragged: first bucket one wider
    check(100, 7, 8, i => (i % 3).toLong) // 3 fat key ties span partitions
    check(100, 7, 8, i => i.toLong * 7 % 101) // near-unique shuffled keys
    check(5, 3, 16, _.toLong)          // more partitions than rows
    check(64, 10, 1, i => (i / 10).toLong) // single partition degenerate
  }

  test("globalNtile keeps every window partitioned (no single-task sort)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (0 until 50).map(i => (i.toLong % 5, i.toLong)).toDF("m", "id")
    // inspect the PRE-checkpoint pipeline: the public result's eager
    // localCheckpoint hides the decomposition's plan behind a LogicalRDD
    val (ranked, frozen) = TwoPass.globalNtileLazy(
      df, Seq(col("m"), col("id")), 3, "b", 4)
    try {
      val global = ranked.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(global.isEmpty,
        "the decomposed rank must never plan an unpartitioned window")
      val partitioned = ranked.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.nonEmpty => w }
      assert(partitioned.nonEmpty,
        "the within-partition row_number window should be present")
      val physical = ranked.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin") ||
        physical.contains("BroadcastNestedLoopJoin"),
        "the P-row offset frame must ride back as a broadcast")
    } finally frozen.unpersist()
  }
}
