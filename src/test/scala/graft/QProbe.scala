package graft

/** Times named SparkEntry queries (noop sink, warm min-of-N in one JVM)
  * for quick per-key A/Bs across worktrees.
  *
  * Usage: Test/runMain graft.QProbe <sfDir> <reps> <name>[,<name>...]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, reps, names) = (args(0), args(1).toInt, args(2).split(",").toSeq)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(",")}")
    val spark = TestSpark.spark
    names.foreach { n => // warm the scan paths once per query
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    val mins = names.map { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"[qprobe] $n%-28s min ${ts.min}%6.2f s  (${ts.map(t => f"$t%.2f").mkString("/")})")
      n -> ts.min
    }
    println("[qprobe] total-of-mins %.2f s".format(mins.map(_._2).sum))
    spark.stop()
  }
}
