package graft.relation

import org.apache.spark.sql.SparkSession

import graft.core.{Examples, Schema}

/** Catalog-facing operations — the counterpart of the reference's
  * `patito.duckdb.Database` (src/patito/duckdb.py:2352): the SparkSession IS
  * the connection+catalog, so this is a thin veneer over `spark.catalog` and
  * `spark.sql`.
  *
  * The reference's DuckDB ENUM machinery (`CREATE TYPE enum__<md5>`,
  * duckdb.py:2762-2800) intentionally drops out: enum fields collapse to
  * StringType and the domain is enforced by the validator (SURVEY §7
  * hard-part 2). `createEnumTypes` remains as an idempotent no-op that
  * records the md5-style names for `types`-surface parity.
  */
final class Database(val spark: SparkSession) {

  /** md5-named enum type registry, mirroring `Database.enum_types`. */
  private val enumTypes = scala.collection.mutable.Set.empty[String]

  def table(name: String): Relation = Relation(spark.table(name))
  def view(name: String): Relation = table(name)

  /** Arbitrary SELECT → aliased relation (duckdb.py:2576-2615). */
  def query(sql: String, alias: String = "query_relation"): Relation =
    Relation(spark.sql(sql), None, Some(alias))

  /** Any statement; each vararg is one SET of positional `?` params and the
    * prepared statement executes once per set, in order — the reference's
    * `execute(query, *parameters)` / `executemany` semantics
    * (duckdb.py:2489-2574; doctest at :2540-2553). No sets → execute once
    * with no parameters. Spark's parameterized SQL does the binding.
    */
  def execute(sql: String, paramSets: Seq[Any]*): Unit = {
    if (paramSets.isEmpty) spark.sql(sql)
    else paramSets.foreach(ps => spark.sql(sql, ps.toArray))
    ()
  }

  /** DDL from a model: `col TYPE [NOT NULL]` per field (duckdb.py:2716-2760).
    * Spark does not enforce NOT NULL on write — the validator enforces it.
    */
  def createTable(name: String, schema: Schema): Unit = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${f.dataType.sql}$nn"
    }.mkString(", ")
    spark.sql(s"CREATE TABLE $name ($cols) USING parquet")
  }

  def createView(name: String, rel: Relation): Unit =
    rel.df.createOrReplaceTempView(name)

  /** Idempotent registration of md5-named enum types for surface parity with
    * `Database.create_enum_types` (duckdb.py:2762-2800); enforcement happens
    * in the validator, not the catalog.
    */
  def createEnumTypes(schema: Schema): Unit =
    schema.fields.foreach { f =>
      f.enumValues.foreach { vals =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(vals.map(_.toString).sorted.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        enumTypes += s"enum__$digest"
      }
    }

  def enumTypeNames: Set[String] = enumTypes.toSet

  /** Write a relation as a bucketed + sorted table: two tables bucketed the
    * same way join on their bucket keys WITHOUT a shuffle (the scan is
    * already hash-partitioned by bucket). This is the storage-level
    * co-location lever for repeated big-big joins — pay one write-side
    * shuffle once instead of an exchange per query.
    */
  def createBucketedTable(
      name: String,
      rel: Relation,
      keys: Seq[String],
      buckets: Int,
      mode: String = "errorifexists"): Unit =
    rel.df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode(mode)
      .saveAsTable(name)

  /** Table-existence test (duckdb.py:2810-2830). */
  def contains(name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Typed empty relation from a model (duckdb.py:2617-2654). */
  def emptyRelation(schema: Schema): Relation =
    Relation(Examples.emptyFrame(spark, schema), Some(schema))

  /** Source → relation dispatch on this database's session, mirroring
    * `Database.to_relation` (duckdb.py:2444-2487): SQL string, parquet or
    * CSV path.
    */
  def toRelation(source: String): Relation = Relation(spark, source)
}

object Database {
  /** Database on the active (else default) SparkSession — the counterpart
    * of the reference's process-wide `Database.default()`
    * (duckdb.py:2396-2420).
    */
  def default(): Database = new Database(SparkSession.active)
}
