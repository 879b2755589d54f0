package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch sweep harness for the q30 IVF config (run manually:
  * `sbt "Test/runMain graft.IvfSweep"`). Reports recall@10 vs brute
  * force and the scored candidate fraction per (probeFrac, delta) at
  * each SF — K itself is corpus-derived (max(24, sqrt(n))).
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = Tables.embeddings(spark, sf).count()
      val exact = Similarity.q22AnnBruteForce(spark, sf)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"=== $sf  n=$n  k=${math.max(24, math.ceil(math.sqrt(n.toDouble)).toInt)} ===")
      // The Int.MaxValue rows use the natural (uncapped-at-this-SF)
      // sample; the 512 rows force a BINDING training-sample cap (well
      // below every corpus here) to confirm the recall floor survives
      // capping — the evidence behind Similarity.TrainSampleCap.
      // r13 additions isolate the two knobs at the gate SF: pf 0.30 at
      // k=24 is nprobe 8 (emulating a probe FLOOR of 8, which leaves
      // the sf0.1 nprobe=9 untouched), crossed with delta 0.18/0.22.
      for ((pf, d, cap) <- Seq(
          (0.20, 0.15, Int.MaxValue), (0.20, 0.18, Int.MaxValue),
          (0.30, 0.18, Int.MaxValue), (0.20, 0.22, Int.MaxValue),
          (0.25, 0.20, Int.MaxValue), (0.30, 0.22, Int.MaxValue),
          (0.20, 0.22, 512), (0.30, 0.22, 512))) {
        val cands = Similarity.ivfCandidates(spark, sf, pf, d, cap)
        val nCands = cands.count()
        val frac = nCands.toDouble / (n * 5)
        val approx = cands
          .select(col("query_id"), col("neighbor_id"),
            (graft.functions.GraftFunctions.dot(col("qe"), col("embedding"))
              / (col("qnorm") * col("norm"))).as("cosine"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
              .orderBy(col("cosine").desc, col("neighbor_id"))))
          .filter(col("rank") <= 10)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val recall = (exact & approx).size.toDouble / exact.size
        val capTag = if (cap == Int.MaxValue) "natural" else s"cap=$cap"
        println(f"probeFrac=$pf%.2f delta=$d%.2f [$capTag]  recall@10=$recall%.3f  frac=$frac%.3f")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
