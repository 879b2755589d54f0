package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Scratch measurement for the Misra-Gries per-token cost in k (run
  * manually: `sbt "Test/runMain graft.MgSweep"`). The round-6 advice
  * flagged the immutable-Map buffer's O(k) allocation on every evicting
  * token; the mutable in-place buffer should hold per-token cost flat as
  * k grows (eviction work is amortized O(1): every count unit removed
  * was added by exactly one arrival). Stream: Zipf-ish 200k-token draw
  * over a 20k vocabulary — deep in the lossy regime for every k tested,
  * so the eviction path runs constantly.
  */
object MgSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 20000).flatMap(i => Seq.fill(200000 / (i * 10) max 1)(s"tok_$i"))
    println(s"stream length ${rows.size}, vocab 20000")
    val df = rows.toDF("tok").repartition(8).cache()
    df.count()
    for (k <- Seq(64, 256, 1024, 4096); rep <- 1 to 2) {
      val mg = udaf(new MisraGries(k), ExpressionEncoder[String]())
      val t0 = System.nanoTime()
      val n = df.agg(mg(col("tok"))).head().getSeq[String](0).size
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"k=$k%5d run$rep  ${dt}%6.2f s  (${rows.size / dt / 1e6}%.1f M tok/s, $n candidates)")
    }
    spark.stop()
  }
}
