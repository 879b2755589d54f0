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
}
