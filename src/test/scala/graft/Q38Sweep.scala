package graft

import org.apache.spark.sql.SparkSession

/** q38 board-outlier diagnosis (round-8 verdict item 4: the r08 driver
  * board showed q38_repetition at 5.6 s while the r07 board and eleven
  * local r08 sessions all measured 0.53–0.79 s, with the operator —
  * a pure projection (TextAnalysis.scala) — unchanged).
  *
  * Hypothesis to kill: the board number is POSITION-dependent (q38 pays
  * for some neighbor query's GC/cache debris at its alphabetical slot in
  * the bench loop). Test: one fresh Bench-shaped JVM runs q38 at three
  * session positions — directly after warmup, after a mixed 12-query
  * batch (including the heavy dedup/windowing neighbors), and after a
  * second heavy batch — and prints all three times plus a repeat at each
  * position. Flat ≈0.6 s everywhere ⇒ the 5.6 s sample was one-off
  * session noise at the driver (GC or IO coincidence), not interference
  * reproducible from query ordering; the numbers land in BASELINE.md.
  *
  * Run manually: `sbt "Test/runMain graft.Q38Sweep"` (env
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench; defaults sf0.1/16).
  */
object Q38Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    def batch(names: Seq[String]): Unit = {
      names.foreach(time)
      spark.sharedState.cacheManager.clearCache()
    }

    time("q03_filter_project") // JVM/codegen warmup, as in Bench
    val report = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def probe(pos: String): Unit = {
      report += s"$pos/cold" -> time("q38_repetition")
      report += s"$pos/warm" -> time("q38_repetition")
      spark.sharedState.cacheManager.clearCache()
    }

    probe("first")
    // q38's board neighbors plus the heaviest batch operators — the mix
    // that precedes/follows it in Bench's alphabetical loop.
    batch(Seq("q36_hash_split", "q37_tfidf", "q39_frame_sample",
      "q40_ngram_jaccard", "q20_minhash_dedup", "q26_embedding_dedup",
      "q16_token_stats", "q17_quality_score", "q54_substring_runs",
      "q55_bigram_lm", "q46_dedup_components", "q34_approx_distinct"))
    probe("middle")
    batch(Seq("q88_length_buckets", "q95_contiguous_ids", "q113_weighted_sample",
      "q96_scd2", "q115_quality_rank", "q121_session_concurrency",
      "q110_sliding_distinct", "q151_quantile_norm"))
    probe("last")

    report.foreach { case (k, v) => println(f"q38 @ $k%-12s $v%6.2f s") }
    spark.stop()
  }
}
