package graft.core

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dummy-data generation: fabricate valid rows/frames from a [[Schema]].
  *
  * Mirrors the reference's `Model.example_value` / `example` / `examples`
  * (src/patito/pydantic.py:718-1042): const > default > null-if-nullable >
  * enum-first > bounds-aware numeric > type default; missing *unique* columns
  * become an ordinal counter cast to the field type (pydantic.py:1024-1027).
  *
  * Scale note: the n-rows path is `spark.range(n)` + literal/counter columns —
  * one narrow stage, no shuffle, no driver materialization — so
  * `examples(schema, n = 10_000_000_000L)` is a legitimate way to fabricate a
  * 100 TB-scale valid table for testing downstream pipelines.
  */
object Examples {

  /** One valid scalar for a field (pure function of the spec). */
  def exampleValue(f: FieldSpec): Any = {
    if (f.pattern.isDefined && f.bounds.const.isEmpty && f.default.isEmpty)
      throw new IllegalArgumentException(
        s"Field ${f.name}: can not generate dummy data for regex-constrained " +
          "field without const/default")
    f.bounds.const
      .orElse(f.default)
      .getOrElse {
        if (f.nullable) null
        else f.enumValues.map(_.head).getOrElse(typedExample(f))
      }
  }

  private def typedExample(f: FieldSpec): Any = {
    val b = f.bounds
    def numeric: Double = (b.gt, b.ge, b.lt, b.le) match {
      case (None, None, None, None) =>
        b.multipleOf.getOrElse(0.0)
      case (lo1, lo2, hi1, hi2) =>
        val lo = lo1.map(_ + 1e-9).orElse(lo2)
        val hi = hi1.map(_ - 1e-9).orElse(hi2)
        (lo, hi) match {
          case (Some(l), Some(h)) => (l + h) / 2
          case (Some(l), None)    => l + 1
          case (None, Some(h))    => h - 1
          case _                  => 0.0
        }
    }
    f.dataType match {
      case LongType             => numeric.toLong
      case IntegerType          => numeric.toInt
      case ShortType            => numeric.toShort
      case ByteType             => numeric.toByte
      case DoubleType           => numeric
      case FloatType            => numeric.toFloat
      case _: DecimalType       => BigDecimal(numeric)
      case BooleanType          => false
      case StringType           => "a" * f.minLength.getOrElse(5)
      case DateType             => Date.valueOf("1970-01-01")
      case TimestampType        => new Timestamp(0L)
      case BinaryType           => Array.empty[Byte]
      case ArrayType(et, _)     => Seq(typedExample(f.copy(dataType = et)))
      case other =>
        throw new IllegalArgumentException(
          s"Field ${f.name}: no example value for type ${other.simpleString}")
    }
  }

  /** One valid row as a name→value map (analogue of `Model.example`). */
  def example(schema: Schema, overrides: Map[String, Any] = Map.empty): Map[String, Any] = {
    val unknown = overrides.keys.filterNot(schema.contains)
    require(unknown.isEmpty, s"Invalid fields: ${unknown.mkString(", ")}")
    schema.fields.map(f => f.name -> overrides.getOrElse(f.name, exampleValue(f))).toMap
  }

  /** A valid DataFrame: provided columns verbatim, missing unique columns as
    * a distinct counter, everything else as typed example literals.
    *
    * @param data  provided columns; all Seqs must share one length.
    * @param n     row count when no data column is provided (range-based).
    */
  def examples(
      spark: SparkSession,
      schema: Schema,
      data: Map[String, Seq[Any]] = Map.empty,
      n: Long = 1L): DataFrame = {
    val unknown = data.keys.filterNot(schema.contains)
    require(unknown.isEmpty, s"Invalid fields: ${unknown.mkString(", ")}")

    val base: DataFrame =
      if (data.isEmpty) spark.range(n).toDF("__rid")
      else {
        val sizes = data.values.map(_.size).toSet
        require(sizes.size == 1, s"provided columns differ in length: $sizes")
        val cols = data.keys.toSeq
        val rows = (0 until sizes.head).map { i =>
          Row.fromSeq(i.toLong +: cols.map(c => coerce(data(c)(i), schema(c).dataType)))
        }
        val st = StructType(
          StructField("__rid", LongType, nullable = false) +:
            cols.map(c => schema(c).structField.copy(nullable = true)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq), st)
      }

    val out = schema.fields.foldLeft(base) { (df, f) =>
      if (data.contains(f.name)) df
      else if (f.unique) df.withColumn(f.name, counterColumn(f, col("__rid")))
      else df.withColumn(f.name, exampleLit(exampleValue(f), f.dataType))
    }
    out.select(schema.columns.map(col): _*)
  }

  /** Literal column for an example value. Scala Seq needs Literal.create
    * (Spark's `lit` only accepts Array/ArraySeq for array literals — a
    * plain `lit(Seq(...))` throws UNSUPPORTED_LITERAL_TYPE).
    */
  private def exampleLit(v: Any, t: DataType): Column = v match {
    case null      => lit(null).cast(t)
    case s: Seq[_] => org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(s, t))
    case other     => lit(other).cast(t)
  }

  /** Typed empty frame (`Database.empty_relation`, duckdb.py:2617-2654). */
  def emptyFrame(spark: SparkSession, schema: Schema): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](), schema.structType)

  /** Distinct per-row value of the field's type from an ordinal id column. */
  private def counterColumn(f: FieldSpec, id: Column): Column = f.dataType match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType | FloatType |
        _: DecimalType =>
      id.cast(f.dataType)
    case StringType    => id.cast(StringType)
    case DateType      => date_add(to_date(lit("1970-01-01")), id.cast(IntegerType))
    case TimestampType => timestamp_seconds(id)
    case BooleanType   => id % 2 === 0 // only 2 distinct values exist
    case other =>
      throw new IllegalArgumentException(
        s"Field ${f.name}: cannot generate unique values of ${other.simpleString}")
  }

  /** Driver-side literal coercion so `Seq(1, 2)` satisfies a LongType field. */
  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                   => null
    case (i: Int, LongType)          => i.toLong
    case (i: Int, DoubleType)        => i.toDouble
    case (l: Long, DoubleType)       => l.toDouble
    case (f: Float, DoubleType)      => f.toDouble
    case (s: String, DateType)       => Date.valueOf(s)
    case (s: String, TimestampType)  => Timestamp.valueOf(s)
    case (x, _)                      => x
  }
}
