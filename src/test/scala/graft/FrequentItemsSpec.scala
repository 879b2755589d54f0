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
}
