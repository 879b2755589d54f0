package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Misra-Gries sketch: the superset guarantee in the LOSSY regime (k far
  * below the vocabulary), plus the oracle-exact q61 gate behavior. */
class FrequentItemsSpec extends SparkSpec {

  test("MG superset guarantee holds with k far below the vocabulary") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import spark.implicits._
    // Zipf-ish synthetic stream: item i appears ~1000/i times over a
    // 200-item vocabulary; k = 8 counters, so all but the very top items
    // must be evicted constantly.
    val k = 8
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"tok_$i"))
    val df = rows.toDF("tok").repartition(8) // force partial-aggregate merges
    val mg = udaf(new MisraGries(k), ExpressionEncoder[String]())
    val cands = df.agg(mg(col("tok"))).head().getSeq[String](0).toSet
    assert(cands.size <= k - 1, "sketch must never exceed k-1 counters")

    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.filter { case (_, c) => c > n.toDouble / k }.keySet
    assert(trueHH.nonEmpty, "the synthetic stream must have heavy hitters")
    assert(trueHH.subsetOf(cands),
      s"every true heavy hitter must survive the sketch; missing ${trueHH -- cands}")
  }

  test("q61 equals the exact full group-by (sketch-then-verify is lossless)") {
    val got = graft.operators.TextAnalysis.q61HeavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
    val n = tokens.count()
    val exact = tokens.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > n.toDouble / 256).toMap
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("cross-batch sketch folding keeps the superset guarantee (lossy regime)") {
    import scala.collection.mutable
    // q66's shape, modeled directly: the Zipf stream is split into 4
    // "micro-batches", each sketched independently (with internal merges),
    // then folded into one running sketch by the same merge rule.
    val k = 8
    val rows = new scala.util.Random(42).shuffle(
      (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"tok_$i")).toVector)
    val mg = new MisraGries(k)
    val running = mutable.HashMap.empty[String, Long]
    rows.grouped(rows.size / 4 + 1).foreach { batch =>
      // each batch sketched as two merged halves (partial-aggregate shape)
      val halves = batch.grouped(batch.size / 2 + 1).map { half =>
        half.foldLeft(mg.zero)((b, x) => mg.reduce(b, x))
      }.toSeq
      val batchSketch = halves.reduce(mg.merge)
      mg.merge(running, batchSketch)
    }
    assert(running.size <= k - 1)
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHH = exact.filter { case (_, c) => c > n.toDouble / k }.keySet
    assert(trueHH.nonEmpty)
    assert(trueHH.subsetOf(running.keySet),
      s"fold across batches lost ${trueHH -- running.keySet}")
  }
}
