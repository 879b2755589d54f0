package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch sweep harness for the q23 multiprobe config (run manually:
  * `sbt "Test/runMain graft.LshSweep"`). Reports recall@10 vs brute
  * force and the scored candidate fraction per (tables, bits, probes).
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = Tables.embeddings(spark, sf).count()
      val exact = Similarity.q22AnnBruteForce(spark, sf)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      println(s"=== $sf  n=$n ===")
      for ((t, b, p) <- Seq((8, 6, 7), (8, 6, 10), (8, 6, 13), (12, 6, 7),
          (16, 6, 7), (12, 6, 10), (12, 8, 17), (16, 8, 25))) {
        val cands = Similarity.lshCandidates(spark, sf, t, b, p)
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
        println(f"tables=$t%2d bits=$b%2d probes=$p%2d  recall@10=$recall%.3f  frac=$frac%.3f")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
