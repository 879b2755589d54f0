package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Scratch stage-timing probe for q50 SemDeDup at sf0.1 (run manually:
  * `sbt "Test/runMain graft.Q50Probe"`). Times the end-to-end key the
  * way Bench does (min-of-2 warm) and, separately, the build phases, so
  * a constant-cut lands on the stage that actually costs.
  */
object Q50Probe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.1"
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm the scan path once
    spark.read.parquet(s"$sf/embeddings.parquet").count()
    for (i <- 1 to 3) {
      time(s"q50 end-to-end run$i") {
        Clustering.q50SemDedup(spark, sf).count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    // stage split: the parts call runs sample+coarse+subs-init+Lloyd
    // eagerly (per-round localCheckpoint); memberships.count() is the
    // final assignment; the end-to-end delta is pairs+verdict.
    for (i <- 1 to 2) {
      val p = time(s"parts (train+lloyd) run$i") {
        Clustering.semDedupParts(spark, sf)
      }
      time(s"final assignment run$i") { p.memberships.count() }
      time(s"primary count run$i") { p.primary.count() }
      p.release()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
