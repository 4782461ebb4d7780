package graft.frame

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._

/** Model-aware DataFrame operations — the Spark counterpart of the
  * reference's `patito.DataFrame` subclass (src/patito/polars.py:102): a
  * plain wrapper pairing a `DataFrame` with a bound [[Schema]]. Spark
  * DataFrames are already lazy, so one wrapper covers both the reference's
  * eager `DataFrame` and `LazyFrame` (polars.py:35-99).
  */
final case class ModeledFrame(df: DataFrame, model: Schema) {

  /** Throw a single aggregated [[ValidationError]] on any violation
    * (polars.py `validate`, delegating to validators.py:298-318).
    */
  def validate(): ModeledFrame = { Validator.validate(df, model); this }

  def errors(): Seq[ErrorDetail] = Validator.findErrors(df, model)

  /** Cast model columns to their declared types. `strict = false` leaves
    * columns whose current type is already in the valid set untouched;
    * `strict = true` forces the default type (polars.py:243-293).
    * Non-model columns pass through unchanged.
    */
  def cast(strict: Boolean = false): ModeledFrame = {
    val out = df.columns.foldLeft(df) { (d, c) =>
      if (!model.contains(c)) d
      else {
        val f = model(c)
        val cur = d.schema(c).dataType
        val keep = if (strict) cur == f.dataType else f.validTypes.contains(cur)
        if (keep) d else d.withColumn(c, col(c).cast(f.dataType))
      }
    }
    copy(df = out)
  }

  /** Materialize `derivedFrom` columns in field order, cast to the field type
    * (polars.py:389-441). A derived column may reference earlier derived ones.
    */
  def derive(): ModeledFrame = {
    val out = model.fields.foldLeft(df) { (d, f) =>
      f.derivedFrom match {
        case None => d
        case Some(src) =>
          val e = src.fold(col, identity)
          d.withColumn(f.name, e.cast(f.dataType))
      }
    }
    copy(df = out)
  }

  /** Fill nulls of defaultable columns with the model default
    * (`fill_null(strategy="defaults")`, polars.py:443-510).
    */
  def fillNullDefaults(): ModeledFrame = {
    val out = model.fields.foldLeft(df) { (d, f) =>
      f.default match {
        case Some(v) if d.columns.contains(f.name) =>
          d.withColumn(f.name, coalesce(col(f.name), lit(v).cast(f.dataType)))
        case _ => d
      }
    }
    copy(df = out)
  }

  /** Add model columns missing from the frame: defaultable ones as typed
    * default literals, nullable ones as typed nulls
    * (duckdb.py:1945-2119). No-op for columns already present.
    */
  def withMissingColumns(): ModeledFrame = {
    val have = df.columns.toSet
    val out = model.fields.foldLeft(df) { (d, f) =>
      if (have(f.name)) d
      else f.default match {
        case Some(v)            => d.withColumn(f.name, lit(v).cast(f.dataType))
        case None if f.nullable => d.withColumn(f.name, lit(null).cast(f.dataType))
        case None               => d
      }
    }
    copy(df = out)
  }

  /** Keep only model columns, in model order (drops superfluous). */
  def selectModel(): ModeledFrame = {
    val have = df.columns.toSet
    copy(df = df.select(model.columns.filter(have).map(col): _*))
  }

  /** Exactly-one-row fetch (polars.py:512-592 / duckdb.py:969-1055): filter,
    * `take(2)` (never a full collect — SURVEY §7 hard-part 4), and demand
    * arity exactly 1.
    */
  def get(predicates: Column*): Row = {
    val filtered = predicates.foldLeft(df)(_ where _)
    filtered.take(2) match {
      case Array(row) => row
      case Array()    =>
        throw new RowDoesNotExist(s"${model.name}.get() yielded 0 rows.")
      case _          =>
        throw new MultipleRowsReturned(s"${model.name}.get() yielded 2 or more rows.")
    }
  }
}

object ModeledFrame {

  /** Model-driven CSV read (polars.py:614-679): schema comes from the model
    * — never inferSchema — and for headerless files the model's field order
    * names the columns; `derivedFrom` columns materialize afterwards.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      model: Schema,
      header: Boolean = true): ModeledFrame = {
    val reader = spark.read.option("header", header.toString)
    val plain = model.fields.filter(_.derivedFrom.isEmpty)
    val frame =
      if (header) {
        // Read raw with header, then cast the model columns.
        ModeledFrame(reader.csv(path), model).cast().df
      } else {
        reader.schema(StructType(plain.map(f =>
          f.structField.copy(nullable = true)))).csv(path)
      }
    ModeledFrame(frame, model).derive()
  }

  object syntax {
    implicit final class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {
      def withModel(m: Schema): ModeledFrame = ModeledFrame(df, m)
      def validateAgainst(m: Schema): DataFrame = { Validator.validate(df, m); df }
    }
  }
}
