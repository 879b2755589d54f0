package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The frozen-layout two-pass prefix-sum scaffold — the scalable
  * replacement for an ORDER BY-without-PARTITION window (which Catalyst
  * executes as a SINGLE task holding the whole corpus):
  *
  *   pass 1: range-partition by the order keys, count/sum per partition
  *           (aggregate-sized result to the driver: ≤ parts rows);
  *   pass 2: the caller broadcasts the exclusive prefix offsets and each
  *           partition combines offset + local running value.
  *
  * Correctness hinges on BOTH passes seeing the SAME partition
  * boundaries. `repartitionByRange` samples its bounds per job with a
  * seed derived from the materialized RDD's id — two separate actions
  * re-sample and can split differently (observed at sf0.1 in q95's
  * development: boundaries shifted by a few rows between the count pass
  * and the assignment pass, corrupting every downstream offset). The
  * layout is therefore FROZEN by caching the range-partitioned frame:
  * pass 1 materializes the blocks, pass 2 reads the identical cached
  * partitions. Any fix to this hazard lives HERE, once — q95, q113,
  * q177, and q183 all run through it.
  *
  * The caller must materialize pass 2's result (`localCheckpoint(true)`)
  * BEFORE unpersisting the returned frame.
  */
object TwoPass {

  /** Range-partition `df` by `keys`, freeze the layout, and aggregate
    * `weights` (long-valued aggregate expressions, e.g. `count(lit(1))`
    * or `sum(col("w"))`) per partition.
    *
    * @return (frozen cached frame sorted by `keys` within partitions,
    *         exclusive prefix offsets per partition id — one slot per
    *         weight, partitions with no rows simply absent (contribute
    *         zero), grand totals per weight)
    */
  def frozenPrefix(df: DataFrame, parts: Int, keys: Seq[Column],
      weights: Seq[Column]): (DataFrame, Map[Int, Array[Long]], Array[Long]) = {
    val frozen = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
      .cache() // freeze the sampled range boundaries across both passes
    val aggs = weights.zipWithIndex.map { case (w, i) => w.as(s"w$i") }
    // pass 1 — materializes the cache, pinning the layout pass 2 reads
    val rows = frozen.groupBy(spark_partition_id().as("pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        weights.indices.map(i => r.getLong(i + 1)).toArray)
      .sortBy(_._1)
    val acc = Array.fill(weights.length)(0L)
    val offsets = rows.map { case (pid, ws) =>
      val o = pid -> acc.clone()
      var i = 0
      while (i < ws.length) { acc(i) += ws(i); i += 1 }
      o
    }.toMap
    (frozen, offsets, acc)
  }

  /** Exact SQL `ntile(k) OVER (ORDER BY keys)` with NO single-task global
    * window — the shipped form of the sketch-cutpoint/prefix-decomposition
    * scale note the global-ntile queries used to carry. Every row's exact
    * global rank decomposes as range-partition prefix offset +
    * within-partition row_number (both passes read the frozen layout);
    * the bucket is ntile's closed form: with n rows, q = n div k,
    * r = n mod k, the first r buckets hold q+1 rows, so
    * bucket(rank) = (rank + q) div (q+1) while rank <= r*(q+1), else
    * r + (rank - r*(q+1) + q - 1) div q. The only window in the plan is
    * PARTITIONED by the range-partition id — no task ever holds more
    * than ~n/parts rows, and `parts` scales with the cluster at 100 TB.
    *
    * `keys` must end in a per-row-unique tiebreaker (the ntile-parity
    * queries all order by (metric, id)): uniqueness makes the rank — and
    * therefore the bucket — deterministic across engines, and guarantees
    * range-partition boundaries cannot make two engines disagree on
    * order within a tie.
    *
    * Returns `df` + `bucketName` (LongType), materialized (eager
    * localCheckpoint, q95's discipline) before the frozen cache is
    * released — callers get a plain frame with no layout obligations.
    */
  def globalNtile(df: DataFrame, keys: Seq[Column], k: Int,
      bucketName: String, parts: Int = 8): DataFrame = {
    val (lazyOut, frozen) = globalNtileLazy(df, keys, k, bucketName, parts)
    val out = lazyOut.localCheckpoint(true)
    frozen.unpersist()
    out
  }

  /** The un-materialized pipeline behind [[globalNtile]], exposed so the
    * plan-shape spec can assert the decomposition's windows are all
    * PARTITIONED (the eager localCheckpoint hides the plan from the
    * public result). Callers must materialize the first element before
    * unpersisting the second. */
  private[graft] def globalNtileLazy(df: DataFrame, keys: Seq[Column],
      k: Int, bucketName: String, parts: Int): (DataFrame, DataFrame) = {
    // The decomposition builds through fixed working columns; a caller
    // column with one of these names would be silently overwritten by
    // withColumn and then dropped from the result — refuse instead.
    val clash = df.columns.toSet &
      Set("gnt_pid", "gnt_off", "gnt_rank")
    require(clash.isEmpty,
      s"globalNtile: input already has working column(s) ${clash.mkString(", ")} — rename them before calling")
    val (frozen, offsets, totals) =
      frozenPrefix(df, parts, keys, Seq(count(lit(1))))
    val n = totals(0)
    val q = n / k
    val r = n % k
    val offDf = df.sparkSession.createDataFrame(
      offsets.toSeq.map { case (pid, a) => (pid, a(0)) })
      .toDF("gnt_pid", "gnt_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gnt_pid")).orderBy(keys: _*)
    // When q == 0 (n < k) every rank satisfies rank <= n = r*(q+1), so
    // the ELSE branch (div by q) is unreached — and Spark's integral
    // div yields null rather than throwing, so the dead branch is safe.
    val bucket = expr(
      s"CASE WHEN gnt_rank <= ${r * (q + 1)}L " +
        s"THEN (gnt_rank + ${q}L) div ${q + 1}L " +
        s"ELSE ${r}L + (gnt_rank - ${r * (q + 1)}L + ${q}L - 1L) div ${q}L " +
        "END")
    val out = frozen
      .withColumn("gnt_pid", spark_partition_id())
      .join(broadcast(offDf), Seq("gnt_pid"))
      .withColumn("gnt_rank", col("gnt_off") + row_number().over(w))
      .withColumn(bucketName, bucket)
      .drop("gnt_pid", "gnt_off", "gnt_rank")
    (out, frozen)
  }
}
