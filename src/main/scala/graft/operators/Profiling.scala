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
       |       CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_nulls,
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
       |       CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_rows,
       |       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 9) AS max_share,
       |       ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6)
       |         AS mean_rows_per_key
       |FROM (SELECT $c, COUNT(*) AS cnt FROM lineitem GROUP BY $c)""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col")

  // ---------------------------------------------------------------------
  // q139 — foreign-key / join-cardinality profile: for each declared FK
  // edge, the referential-integrity verdict (orphan child rows) plus the
  // join-planning statistics (distinct child keys, referenced parent
  // keys, average fanout). The audit a migration/replication pipeline
  // runs before trusting a join, and the cardinality input a cost-based
  // join-order/broadcast decision consumes (q109 profiles one table's
  // skew; this profiles the EDGES between tables).
  //
  // Shape per edge: the child aggregates to |child keys| partial counts
  // (map-side combined), then ONE left join against the parent's
  // distinct-key frame classifies matched/orphan and folds to a 1-row
  // profile — shuffle volume is |keys|, never |rows|. Edges union into
  // the report. On clean data orphans are zero by construction — the
  // spec proves the detector fires by mutating a key (q132's pattern).
  // ---------------------------------------------------------------------
  private[graft] def fkEdges(spark: SparkSession, sfDir: String)
      : Seq[(String, DataFrame, String, DataFrame, String)] = Seq(
    ("lineitem.l_orderkey->orders",
      Tables.lineitem(spark, sfDir), "l_orderkey",
      Tables.orders(spark, sfDir), "o_orderkey"),
    ("orders.o_custkey->customer",
      Tables.orders(spark, sfDir), "o_custkey",
      Tables.customer(spark, sfDir), "c_custkey"),
    ("events.user_id->customer",
      Tables.events(spark, sfDir), "user_id",
      Tables.customer(spark, sfDir), "c_custkey"),
    ("lineitem.l_suppkey->supplier",
      Tables.lineitem(spark, sfDir), "l_suppkey",
      Tables.supplier(spark, sfDir), "s_suppkey"))

  def q139FkProfile(spark: SparkSession, sfDir: String): DataFrame =
    fkEdges(spark, sfDir).map { case (name, child, ck, parent, pk) =>
      fkProfileEdge(name, child, ck, parent, pk)
    }.reduce(_.unionAll(_)).orderBy("edge")

  /** One edge's profile — split out so a spec can profile a mutated
    * child and assert the orphan detector fires. */
  private[graft] def fkProfileEdge(name: String, child: DataFrame,
      ck: String, parent: DataFrame, pk: String): DataFrame = {
    val ckeys = child.groupBy(col(ck).as("k")).agg(count(lit(1)).as("cnt"))
    val pkeys = parent.select(col(pk).as("k")).distinct()
      .withColumn("matched", lit(1))
    ckeys.join(pkeys, Seq("k"), "left")
      .agg(count(lit(1)).as("n_child_keys"),
        sum(col("cnt")).as("n_child_rows"),
        sum(when(col("matched").isNull, col("cnt")).otherwise(0L))
          .as("n_orphan_rows"),
        sum(when(col("matched").isNull, 1L).otherwise(0L))
          .as("n_orphan_keys"),
        sum(when(col("matched").isNotNull, 1L).otherwise(0L))
          .as("n_ref_parent_keys"))
      .select(lit(name).as("edge"), col("n_child_rows"),
        col("n_child_keys"), col("n_orphan_rows"), col("n_orphan_keys"),
        col("n_ref_parent_keys"),
        round(col("n_child_rows").cast("double") /
          col("n_ref_parent_keys"), 6).as("avg_fanout"))
  }

  private val fkEdgeSqls = Seq(
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("events.user_id->customer", "events", "user_id",
      "customer", "c_custkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"))

  val q139Sql: String = fkEdgeSqls.map { case (name, ct, ck, pt, pk) =>
    s"""SELECT '$name' AS edge,
       |       CAST(SUM(cnt) AS BIGINT) AS n_child_rows,
       |       COUNT(*) AS n_child_keys,
       |       CAST(SUM(CASE WHEN p.k IS NULL THEN cnt ELSE 0 END) AS BIGINT)
       |         AS n_orphan_rows,
       |       CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_orphan_keys,
       |       CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_ref_parent_keys,
       |       round(CAST(SUM(cnt) AS DOUBLE) /
       |             SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END), 6)
       |         AS avg_fanout
       |FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $ct GROUP BY 1) c
       |LEFT JOIN (SELECT DISTINCT $pk AS k FROM $pt) p USING (k)""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")
}
