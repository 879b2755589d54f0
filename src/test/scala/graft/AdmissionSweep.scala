package graft

/** Scratch timing for q58's foreachBatch machinery (run manually:
  * `sbt "Test/runMain graft.AdmissionSweep"`). The per-batch data is
  * tiny (~25 incoming rows against a 4/5-corpus index probe), so trigger
  * cost is task-count-dominated: this sweeps the shuffle-partition
  * setting the per-batch joins inherit, the same state-volume-vs-width
  * tradeoff Bench documents for the streaming paths.
  */
object AdmissionSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.1"
    // Count Spark jobs per run: the sweep's original finding was that the
    // per-trigger JOB count (not task width) is the local cost floor, so
    // report it directly — the union-write rewrite is done iff this drops.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    for (parts <- Seq("16", "8", "4"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamParity.q58StreamAdmission(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nj = jobs.get() - j0
      println(f"partitions=$parts%3s run$rep  $dt%6.2f s  ($n verdicts, $nj jobs)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
