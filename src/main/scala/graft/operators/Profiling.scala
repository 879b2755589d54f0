package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling: the ANALYZE-style per-column statistics collector
  * that feeds a cost-based layer (join-side selection, bucketing
  * decisions, skew detection) and the data-quality dashboard a curation
  * pipeline watches.
  *
  * The reference has no profiler (it is a stream runtime), but every
  * production deployment of it fronts one — and Spark itself consumes
  * exactly these stats via `ANALYZE TABLE ... COMPUTE STATISTICS FOR
  * COLUMNS` into the catalog. This operator computes the same shape as
  * a reusable DataFrame op with an exact oracle.
  *
  * Scale design:
  *  - ALL per-column stats (count/nulls/min/max/ndv) evaluate in ONE
  *    aggregate over ONE scan. Exact multi-column count(DISTINCT x)
  *    compiles to a single Expand node (one input row -> one row per
  *    distinct-column) feeding one partial aggregate — the standard
  *    exact-NDV cost: shuffle volume is ~(#ndv-columns x distinct
  *    values), not #rows, because Expand feeds a partial-aggregate that
  *    dedups map-side before the exchange.
  *  - At 100 TB one would swap exact NDV for approx_count_distinct
  *    (HLL, q34's territory) per column — a one-line change here; the
  *    exact version is what the oracle can verify.
  *  - The wide 1-row aggregate is pivoted to one-row-per-column with a
  *    driver-free explode of an aggregate-sized array literal.
  */
object Profiling {

  /** One stats row per requested numeric column of `df`:
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__ndv").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("s"))
      .select(col("s.col_name"), col("s.n_rows"), col("s.n_nulls"),
        col("s.n_distinct"), col("s.min_val"), col("s.max_val"))
      .orderBy("col_name")
  }

  private[graft] val StatCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount")

  def q100TableStats(spark: SparkSession, sfDir: String): DataFrame =
    columnStats(Tables.lineitem(spark, sfDir), StatCols)

  val q100Sql: String = StatCols.map { c =>
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |       SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS n_nulls,
       |       COUNT(DISTINCT $c) AS n_distinct,
       |       CAST(MIN($c) AS DOUBLE) AS min_val,
       |       CAST(MAX($c) AS DOUBLE) AS max_val
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // ---------------------------------------------------------------------
  // q109 — join/partition-key skew profiler: for each candidate key
  // column of lineitem, the statistics that decide a shuffle strategy
  // at 100 TB — distinct-key count, the heaviest key's absolute and
  // relative weight, and the mean rows-per-key. A key whose max_share
  // dwarfs 1/ndv is the key you salt (q31) or let AQE skew-split;
  // a near-uniform key can hash-partition plainly. This is the operator
  // that turns "the job is stuck on one task" into a measurement.
  //
  // Shape: per key column, ONE partial-aggregable count per key value
  // (shuffle carries |keys| partial counts), then a second aggregate of
  // that |keys|-sized frame down to one profile row; the per-column
  // profiles union into the report. All arithmetic is exact (counts;
  // shares rounded from one deterministic double division).
  // ---------------------------------------------------------------------
  private[graft] val SkewCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")

  def q109SkewProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    SkewCols.map { c =>
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_rows"))
        .select(
          lit(c).as("key_col"), col("n_distinct"), col("n_rows"),
          col("max_rows"),
          round(col("max_rows").cast("double") / col("n_rows"), 9)
            .as("max_share"),
          round(col("n_rows").cast("double") / col("n_distinct"), 6)
            .as("mean_rows_per_key"))
    }.reduce(_.unionAll(_)).orderBy("key_col")
  }

  val q109Sql: String = SkewCols.map { c =>
    s"""SELECT '$c' AS key_col, COUNT(*) AS n_distinct,
       |       SUM(cnt) AS n_rows, MAX(cnt) AS max_rows,
       |       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 9) AS max_share,
       |       ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6)
       |         AS mean_rows_per_key
       |FROM (SELECT $c, COUNT(*) AS cnt FROM lineitem GROUP BY $c)""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
}
