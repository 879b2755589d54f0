package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pipeline observability: data-quality rule counters riding the query
  * itself via `Dataset.observe` — Spark's native side-channel metrics
  * (named accumulators evaluated per-row during whatever action runs,
  * surfaced through `observedMetrics` / `QueryExecutionListener` /
  * streaming progress). This is the Spark-first equivalent of the
  * reference's operator metrics registry
  * (`rlink/src/metrics/metric.rs:74-108` — per-operator counters/gauges
  * published to a Prometheus endpoint): user-defined counters attached
  * to the dataflow, collected by the engine, with NO extra pass over
  * the data.
  *
  * q105 exposes the rule counters as a first-class result (one row per
  * rule, oracle-checkable) AND tags the scan with an `observe` node
  * carrying the same aggregates — so a production pipeline that runs
  * ANY action over the returned frame gets the quality metrics for free
  * on its listener; the spec asserts the observed values equal the
  * result rows.
  *
  * Scale: the rule predicates are codegen'd boolean projections; the
  * explode fans each row into (rule, flag) pairs BEFORE the partial
  * aggregate, so the shuffle carries |rules| x |partitions| partial
  * counts, never rows. The observe node is an unshuffled accumulator —
  * zero plan cost beyond the per-row predicate evaluation.
  */
object Observability {

  /** (rule name, violation predicate) — evaluated over `events`. */
  private[graft] def rules: Seq[(String, Column)] = Seq(
    "value_out_of_range" -> (col("value") < lit(0.05) || col("value") > lit(400.0)),
    "error_event"        -> (col("event_type") === "error"),
    "props_key_missing"  -> get_json_object(col("props"), "$.k").isNull,
    "props_key_high"     -> (get_json_object(col("props"), "$.k").cast("long") > lit(90L)))

  /** The events frame with quality counters observed onto it: any action
    * a caller runs over this frame reports the counters on its
    * QueryExecutionListener without a second scan. */
  def observedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    } :+ count(lit(1)).as("n_rows")
    Tables.events(spark, sfDir).observe("graft_quality", aggs.head, aggs.tail: _*)
  }

  def q105ObserveQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val flagged = observedEvents(spark, sfDir).select(
      explode(array(rules.map { case (name, pred) =>
        struct(lit(name).as("rule"), when(pred, 1L).otherwise(0L).as("bad"))
      }: _*)).as("r"))
    flagged
      .groupBy(col("r.rule").as("rule"))
      .agg(sum(col("r.bad")).as("n_bad"), count(lit(1)).as("n_rows"))
      .withColumn("bad_frac",
        round(col("n_bad").cast("double") / col("n_rows"), 9))
      .orderBy("rule")
  }

  val q105Sql: String = {
    val cases = Seq(
      "value_out_of_range" -> "value < 0.05 OR value > 400.0",
      "error_event"        -> "event_type = 'error'",
      "props_key_missing"  -> "json_extract(props, '$.k') IS NULL",
      "props_key_high"     -> "CAST(json_extract_string(props, '$.k') AS BIGINT) > 90")
    cases.map { case (name, pred) =>
      s"""SELECT '$name' AS rule,
         |       CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
         |       COUNT(*) AS n_rows,
         |       ROUND(CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS DOUBLE)
         |             / COUNT(*), 9) AS bad_frac
         |FROM events""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }
}
