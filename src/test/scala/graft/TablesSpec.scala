package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}

/** The events loader must accept every ts storage type the driver's
  * testdata generator has shipped (nanos Long, TIMESTAMP_NTZ, TIMESTAMP)
  * and normalize all of them to the same session-TZ TimestampType wall
  * clock — a regeneration between rounds changed the type once already
  * and silently broke every committed events path. */
class TablesSpec extends SparkSpec {

  private val micros = 1704067200000000L // 2024-01-01T00:00:00Z

  private def roundTrip(writer: org.apache.spark.sql.DataFrame): Long = {
    val dir = java.nio.file.Files.createTempDirectory("tables_ts").toString
    writer.coalesce(1).write.mode("overwrite").parquet(dir)
    val raw = spark.read.parquet(dir)
    val norm = Tables.normalizeTs(raw)
    assert(norm.schema("ts").dataType === TimestampType)
    // tsMicrosCol must agree with the normalized column on the raw frame
    val viaCol = raw.select(Tables.tsMicrosCol(raw).as("m")).head.getLong(0)
    val viaNorm = norm.select(unix_micros(col("ts"))).head.getLong(0)
    assert(viaCol === viaNorm)
    viaNorm
  }

  test("normalizeTs: nanos-Long storage (legacy TIMESTAMP(NANOS) reading)") {
    import spark.implicits._
    val df = Seq(micros * 1000L).toDF("ts") // nanos
    assert(df.schema("ts").dataType === LongType)
    assert(roundTrip(df) === micros)
  }

  test("normalizeTs: TIMESTAMP_NTZ storage (round-8 regeneration)") {
    import spark.implicits._
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(roundTrip(df) === micros)
  }

  test("normalizeTs: plain TIMESTAMP storage is a no-op") {
    import spark.implicits._
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType === TimestampType)
    assert(roundTrip(df) === micros)
  }
}
