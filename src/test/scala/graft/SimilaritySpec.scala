package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Skew}

/** IVF ANN recall + salted-join equivalence. */
class SimilaritySpec extends SparkSpec {

  test("q30 IVF ANN: top-10 per query, recall@10 vs brute force is useful") {
    val ivf = Similarity.q30AnnIvf(spark, sf)
    val exact = Similarity.q22AnnBruteForce(spark, sf)

    val perQuery = ivf.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach(r => assert(r.getLong(1) == 10L))

    val hits = ivf.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    info(f"IVF recall@10 = $recall%.2f")
    assert(recall > 0.3)
  }

  test("salted join equals the plain shuffle join bit-for-bit") {
    val ev = Tables.events(spark, sf)
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))

    val salted = Skew.saltedJoin(ev, "user_id", cust, "c_custkey", salts = 8)
      .select("event_id", "user_id", "c_custkey", "c_mktsegment")
      .collect().toSet
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .select("event_id", "user_id", "c_custkey", "c_mktsegment")
      .collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted join tolerates map-typed fact columns (salt skips maps)") {
    val f = spark.range(10).toDF("k")
      .withColumn("m", map(lit("a"), col("k")))
    val d = spark.range(10).toDF("dk")
    assert(Skew.saltedJoin(f, "k", d, "dk", salts = 4).count() === 10)
  }

  test("q31 salted aggregation equals q06 broadcast aggregation") {
    val a = Skew.q31SaltedJoin(spark, sf).collect().toSeq
    val b = graft.operators.Relational.q06BroadcastEnrich(spark, sf).collect().toSeq
    assert(a == b)
  }
}
