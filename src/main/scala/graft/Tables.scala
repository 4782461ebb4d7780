package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders for the driver-generated TPC-H-ish parquet data
  * (TESTDATA.md). One quirk: `events.ts` is written as parquet
  * INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects outright —
  * all sessions therefore set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see [[Sessions.config]]) and [[Tables.events]] converts the raw
  * nanosecond long to a microsecond TimestampType (`ts div 1000`,
  * truncation — identical to DuckDB's ns→us cast).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      // ntz: DuckDB timestamps are naive; with session tz UTC the cast is a
      // pure type-tag change, values identical.
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
}

object Sessions {
  /** Configs every session needs; call on a SparkSession.Builder. */
  val config: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // µs parquet timestamps (not INT96) so outputs compare equal to DuckDB's
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    // native kernels as SQL functions (simhash64, cosine_similarity, …)
    "spark.sql.extensions" -> "graft.GraftExtensions")
}
