package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Histogram-percentile over the event stream — reference `pct(col, scale)`
  * aggregate (`rlink/src/functions/reduce/schema_reduce.rs:27-29,416-485`)
  * with the example 90-bucket LevelDB scale.
  *
  * The oracle reformulates the reference's top-down bucket scan
  * (`percentile/mod.rs:171-211`) as "the pos-th largest bucketized value":
  * cumulative bucket counts from the top cross `pos` exactly at the bucket
  * containing the pos-th largest element, so both formulations return the
  * same boundary. pos = trunc(count * (100-p)/100) clamped to [1, count].
  */
object Percentiles {

  def q07PctHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val blob = pctHist(col("value"), leveldbScale90)
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(blob.as("hist"), count(lit(1)).as("cnt"))
      .select(
        col("event_type"),
        col("cnt"),
        pctResult(col("hist"), 90, leveldbScale90).as("p90"),
        pctResult(col("hist"), 99, leveldbScale90).as("p99"))
      .orderBy("event_type")
  }

  private val scaleValues: String =
    leveldbScale90.map(v => s"(${v.toLong}.0)").mkString(", ")

  val q07Sql: String =
    s"""WITH scale(b) AS (SELECT * FROM (VALUES $scaleValues) s(b)),
       |bv AS (
       |  SELECT event_type,
       |         CASE WHEN value >= 1000000.0 THEN 1000000.0
       |              WHEN value <= 1.0 THEN 1.0
       |              ELSE (SELECT MIN(b) FROM scale WHERE b >= value) END AS b
       |  FROM events),
       |r AS (
       |  SELECT event_type, b,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b DESC) AS rn,
       |         COUNT(*) OVER (PARTITION BY event_type) AS cnt
       |  FROM bv)
       |SELECT event_type, MAX(cnt) AS cnt,
       |       MAX(CASE WHEN rn = GREATEST(1, LEAST(cnt, CAST(trunc(cnt * (CAST(10 AS DOUBLE)/100)) AS BIGINT))) THEN b END) AS p90,
       |       MAX(CASE WHEN rn = GREATEST(1, LEAST(cnt, CAST(trunc(cnt * (CAST(1 AS DOUBLE)/100)) AS BIGINT))) THEN b END) AS p99
       |FROM r
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
}
