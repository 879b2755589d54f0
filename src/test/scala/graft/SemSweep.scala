package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Scratch sweep harness for the q50 two-level SemDeDup (run manually:
  * `sbt "Test/runMain graft.SemSweep"`). The ClusteringSpec brute-force
  * recall gate runs at sf0.001 only (driver-side all-pairs); this sweep
  * validates the two-level shape at sf0.1 with a DISTRIBUTED brute force
  * (Spark self-join — the oracle-style cross product a sweep can afford
  * once), reporting recall/precision of the drop set plus the
  * scored-centroid statistics the two-level claim rests on.
  */
object SemSweep {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.functions.GraftFunctions.dot
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val p = Clustering.semDedupParts(spark, sf)
      val perVec = p.scored.groupBy("vec_id").agg(count(lit(1)).as("m")).cache()
      val mx = perVec.agg(max(col("m"))).head().getLong(0)
      val avg = p.scored.count().toDouble / p.n
      val mult = p.memberships.count().toDouble / p.n
      println(s"=== $sf  n=${p.n}  kCoarse=${p.kCoarse}  totalSubs=${p.totalSubs} ===")
      println(f"scored/vec avg=$avg%.1f max=$mx (flat would be ${p.totalSubs}); membership multiplicity=$mult%.2f")

      val gotDrop = Clustering.q50SemDedup(spark, sf)
        .filter(!col("is_kept")).select("vec_id").as[Long].collect().toSet
      // distributed brute force: any smaller-id near-dup anywhere
      val u = p.units.select(col("vec_id"), col("unit"))
      val expectedDrop = u.as("l").join(u.as("r"),
          col("l.vec_id") > col("r.vec_id") &&
            dot(col("l.unit"), col("r.unit")) >= 0.8)
        .select(col("l.vec_id")).distinct().as[Long].collect().toSet
      val recall = (gotDrop & expectedDrop).size.toDouble / expectedDrop.size
      val falseDrops = gotDrop -- expectedDrop
      println(f"drops: got=${gotDrop.size} true=${expectedDrop.size} recall=$recall%.4f falseDrops=${falseDrops.size}")
      perVec.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
