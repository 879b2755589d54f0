package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch (Misra & Gries 1982) as a MERGEABLE
  * Spark Aggregator, following the summary-merge rule of Agarwal et al.,
  * "Mergeable Summaries" (PODS 2012): combine counter maps by addition,
  * then subtract the k-th largest counter from every entry and drop the
  * non-positive ones — the count error stays bounded by n/k through any
  * merge tree, which is exactly what Spark's partial aggregation needs
  * (the reference-engine analogue, a single reduce step, never merges;
  * same deviation story as PercentileHistogram's carry-correct merge).
  *
  * GUARANTEE (what makes the q61 gate oracle-EXACT): every item with
  * true frequency > n/k survives in the sketch — its estimate is at
  * least freq − n/k > 0. The sketch output is therefore a SUPERSET of
  * the true heavy hitters; one exact counting pass over just the
  * candidates (a broadcast semi-join, never a full-vocabulary shuffle)
  * turns the superset into the exact answer. Shuffle volume of the
  * sketch pass is O(partitions × k) — constant in corpus size, where an
  * exact groupBy shuffles the full distinct-token table.
  *
  * The decrement-all path on a full-buffer miss is O(k); the classic
  * constant-amortized variant keeps a global offset instead. At k ≤ a
  * few hundred the simple form is already far from the hot-path cost.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 2, "need at least 2 counters")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k - 1 => b.updated(x, 1L)
      case None =>
        // decrement every counter; drop zeros (the new item is "absorbed")
        b.iterator.map { case (t, c) => (t, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k - 1) combined
    else {
      // subtract the k-th largest counter from all, drop non-positive
      val kth = combined.values.toArray.sortBy(-_).apply(k - 1)
      combined.iterator.map { case (t, c) => (t, c - kth) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Candidate keys only (sorted for determinism of the downstream
    * explode); estimated counts are deliberately not exposed — the gate
    * re-counts candidates exactly, so estimates would only invite use. */
  override def finish(b: Map[String, Long]): Array[String] =
    b.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
