package graft

import org.apache.spark.sql.functions._

/** [[Tables.events]] ts-normalization contract: both driver generations
  * (INT64 TIMESTAMP(NANOS) surfaced as long, TIMESTAMP(MICROS)) land on
  * TIMESTAMP_NTZ µs, and any OTHER parquet type fails fast instead of
  * silently coercing to nulls (schema-drift tripwire).
  */
class TablesSpec extends SparkSpec {

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tables").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events: long (nanosAsLong) and timestamp generations both normalize to ntz µs") {
    val asLong = writeEvents(spark.range(3).selectExpr(
      "id AS event_id", "(1700000000000000000 + id * 1000) AS ts"))
    val fromLong = Tables.events(spark, asLong)
    assert(fromLong.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // ns → µs truncates: 1700000000000000000 ns = 1700000000.000000 s
    val first = fromLong.orderBy("event_id").select("ts").head().getAs[java.time.LocalDateTime](0)
    assert(first == java.time.LocalDateTime.ofEpochSecond(1700000000L, 0, java.time.ZoneOffset.UTC))

    val asTs = writeEvents(spark.range(3).selectExpr(
      "id AS event_id", "timestamp_micros(1700000000000000 + id) AS ts"))
    val fromTs = Tables.events(spark, asTs)
    assert(fromTs.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(fromTs.count() == 3)
  }

  test("events: an unexpected ts parquet type fails fast, never coerces") {
    val asString = writeEvents(spark.range(1).selectExpr(
      "id AS event_id", "'2024-01-01 00:00:00' AS ts"))
    val e = intercept[IllegalArgumentException](Tables.events(spark, asString))
    assert(e.getMessage.contains("unsupported parquet type"))
  }
}
