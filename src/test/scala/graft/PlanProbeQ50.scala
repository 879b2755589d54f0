package graft

import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

import graft.operators.Clustering

/** Dumps the formatted plans of q50 SemDeDup's INTERNAL frames (the
  * declared query's final DF is a lineage-truncated localCheckpoint, so
  * the plan evidence for the Lloyd-loop claims — broadcast of the K-row
  * sub-centroid side, codegen'd UnitNormalize on the corpus side — lives
  * on the intermediates SemParts exposes).
  *
  * Usage: Test/runMain graft.PlanProbeQ50 <sfDir> <outDir>
  */
object PlanProbeQ50 {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = TestSpark.spark
    new java.io.File(outDir).mkdirs()
    val parts = Clustering.semDedupParts(spark, sfDir)
    def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/q50_$tag.txt"), txt)
      println(s"[q50-plan] wrote $tag (${txt.length} chars)")
    }
    dump("scored", parts.scored)
    dump("memberships", parts.memberships)
    parts.release()
    spark.stop()
  }
}
