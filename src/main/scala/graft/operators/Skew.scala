package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew handling for shuffle joins — the 100 TB failure mode where one
  * hot key (a viral user, a default value) lands an entire shuffle
  * partition on one executor.
  *
  * Two complementary mechanisms:
  *  1. AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  *     default with AQE): splits oversized partitions at runtime —
  *     zero code, the first line of defense. Bench/Verify sessions run
  *     with AQE on.
  *  2. Explicit salting (this file) for when the skewed side must join a
  *     non-broadcastable dim and the plan must be fixed up front (e.g.
  *     streaming joins where AQE doesn't apply): fact rows get a salt in
  *     [0, salts); the dim side is replicated `salts` ways; the join key
  *     becomes (key, salt), spreading each hot key over `salts` reducers.
  *     Replication cost: |dim| x salts rows through the shuffle — chosen
  *     per-join, worth it iff the dim is small relative to the hot-key
  *     mass.
  *
  * Result is provably identical to the unsalted join: every fact row
  * meets exactly the one dim replica carrying its salt.
  */
object Skew {

  /** Inner equi-join of a skewed `fact` to a small-but-not-broadcastable
    * `dim`, salted `salts` ways. Key columns must exist on the respective
    * sides; output columns = fact ++ dim (join keys from both retained,
    * as with a plain column-condition join). */
  def saltedJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // Salt derives from the full row content, NOT the key — rows of the
    // same hot key spread across salt values — and NOT from
    // monotonically_increasing_id(), which changes on task recompute and
    // would duplicate/drop rows if a map stage is retried mid-join
    // (SPARK-23207 class). Deterministic per row content: a retried task
    // re-derives the same salt. (Fully identical duplicate rows share a
    // salt — residual skew only if a hot key's rows are also identical.)
    // xxhash64 rejects MapType columns — hash only the hashable ones.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType    => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType  => containsMap(a.elementType)
      case _             => false
    }
    val hashable = fact.schema.fields.toSeq
      .filterNot(f => containsMap(f.dataType)).map(f => fact(f.name))
    require(hashable.nonEmpty, "fact must have at least one non-map column")
    val sf = fact.withColumn("__graft_salt",
      pmod(xxhash64(struct(hashable: _*)), lit(salts.toLong)).cast("int"))
    val sd = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd,
        sf(factKey) === sd(dimKey) && sf("__graft_salt") === sd("__graft_salt"))
      .drop("__graft_salt")
  }

  // ---------------------------------------------------------------------
  // q31 — the q06 enrichment computed through the salted shuffle join
  // (as if customer were too big to broadcast and user_id skewed): same
  // oracle as q06, different physical plan — proves salting preserves
  // results exactly.
  // ---------------------------------------------------------------------
  def q31SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(ev, "user_id", cust, "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), Relational.dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment")
  }

  val q31Sql: String = Relational.q06Sql
}
