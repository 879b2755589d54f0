package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved warm A/B of two co-purchase edge-build shapes at sf0.1
  * (BASELINE noise-protocol item 6: J A J A ..., min-of-N per arm):
  *
  *  J (shipped): po self-join on orderkey (exchange reused across both
  *    sides) + pair-level distinct — two exchanges, SMJ/SHJ merge
  *    generates the basket² fan-out.
  *  A (candidate): ONE exchange of po (groupBy orderkey, collect_set) +
  *    map-side per-basket pair generation (sorted set, i<j slices) +
  *    the same pair-level distinct.
  *
  * Identical output SET by construction (same (u,v) u<v pairs from each
  * basket; the distinct collapses cross-order repeats in both shapes);
  * the probe also asserts count equality per run.
  *
  * Usage: Test/runMain graft.EdgeBuildProbe [sfDir]
  */
object EdgeBuildProbe {
  private def po(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))

  def joinShape(spark: SparkSession, sfDir: String): DataFrame = {
    val t = po(spark, sfDir)
    t.as("a").join(t.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
  }

  def aggShape(spark: SparkSession, sfDir: String): DataFrame =
    po(spark, sfDir)
      .groupBy("o").agg(array_sort(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps,
          |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS u, y AS v))))""".stripMargin)).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = TestSpark.spark
    def once(tag: String, f: => DataFrame): (Double, Long) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      println(f"  $tag%-6s $dt%6.2f s  ($n edges)")
      (dt, n)
    }
    // warm the scan once
    po(spark, sf).count()
    val (js, as) = (Array.newBuilder[Double], Array.newBuilder[Double])
    var (jn, an) = (-1L, -1L)
    for (i <- 1 to 3) {
      val (jt, jc) = once(s"join$i", joinShape(spark, sf)); js += jt; jn = jc
      val (at, ac) = once(s"agg$i", aggShape(spark, sf)); as += at; an = ac
    }
    require(jn == an, s"edge counts differ: join=$jn agg=$an")
    // One-shot SET equality outside the timed loop (ADVICE r13): equal
    // counts alone do not prove equal pair sets.
    val (j, a) = (joinShape(spark, sf), aggShape(spark, sf))
    require(j.except(a).isEmpty && a.except(j).isEmpty,
      "edge SETS differ between the join and agg shapes")
    println("edge sets identical (except() empty both ways)")
    println(f"join min ${js.result().min}%6.2f s   agg min ${as.result().min}%6.2f s   (counts equal: $jn)")
    spark.stop()
  }
}
