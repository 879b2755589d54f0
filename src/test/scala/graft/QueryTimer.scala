package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing outside the full Bench loop (run manually:
  * `sbt "Test/runMain graft.QueryTimer q82_stream_interval_join ..."`).
  * Bench-shaped session (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS, defaults
  * sf0.1/16), q03 warmup, then each named query twice (cold + warm, the
  * Bench discipline) with the cache cleared between queries.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTimer <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // SPARK_GRAFT_SHUFFLE decouples shuffle/state partitions from core
    // count — the knob behind the stream-query state-store sizing
    // experiments (stateful queries pay a per-partition store commit per
    // trigger; see Bench's 4/8/16/32 sweep note)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("q03_filter_project") // warmup
    args.foreach { n =>
      val t1 = time(n); val t2 = time(n)
      spark.sharedState.cacheManager.clearCache()
      println(f"[timer] $n%-28s $t1%6.2f s / $t2%6.2f s")
    }
    spark.stop()
  }
}
