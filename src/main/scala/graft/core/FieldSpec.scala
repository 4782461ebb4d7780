package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Numeric / const bounds on a field.
  *
  * Mirrors the reference's `Field(gt/ge/lt/le/multiple_of/const)` surface
  * (reference: src/patito/pydantic.py:1420-1491) without porting any code:
  * these are plain value-level constraints evaluated by [[Validator]] in a
  * single Spark aggregate pass.
  */
final case class Bounds(
    gt: Option[Double] = None,
    ge: Option[Double] = None,
    lt: Option[Double] = None,
    le: Option[Double] = None,
    multipleOf: Option[Double] = None,
    const: Option[Any] = None) {
  def isEmpty: Boolean =
    gt.isEmpty && ge.isEmpty && lt.isEmpty && le.isEmpty &&
      multipleOf.isEmpty && const.isEmpty
}

object Bounds { val none: Bounds = Bounds() }

/** Declarative per-column spec: name, type, nullability, and the constraint
  * metadata the reference attaches via `patito.Field(...)`
  * (reference: src/patito/pydantic.py:1420-1491).
  *
  * Value-level by design — Scala cannot create classes at runtime the way
  * pydantic's `create_model` does (reference: src/patito/pydantic.py:1375-1417),
  * so the schema algebra ([[Schema]]) operates on `Seq[FieldSpec]`.
  *
  * @param validTypes the set of physical Spark types the validator accepts for
  *   this column; head is the default cast target. Empty ⇒ `Seq(dataType)`.
  * @param constraints arbitrary Column predicates; `col("_")` inside them is
  *   rewritten to this column at validation time (the reference's `pt.field`
  *   placeholder, src/patito/validators.py:276-280).
  * @param derivedFrom source column name (Left) or expression (Right) used by
  *   `derive()` (reference: src/patito/polars.py:389-441).
  */
final case class FieldSpec(
    name: String,
    dataType: DataType,
    nullable: Boolean = false,
    validTypesOpt: Seq[DataType] = Nil,
    unique: Boolean = false,
    default: Option[Any] = None,
    enumValues: Option[Seq[Any]] = None,
    bounds: Bounds = Bounds.none,
    pattern: Option[String] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    constraints: Seq[Column] = Nil,
    derivedFrom: Option[Either[String, Column]] = None) {

  /** Accepted physical types; defaults to the canonical widening family for
    * the declared type (mirrors `valid_dtypes`, pydantic.py:142-201; Spark has
    * no unsigned ints so the UInt* members collapse into the signed family —
    * SURVEY §7 hard-part 1).
    */
  def validTypes: Seq[DataType] =
    if (validTypesOpt.nonEmpty) validTypesOpt
    else FieldSpec.defaultValidTypes(dataType)

  def withName(n: String): FieldSpec = copy(name = n)

  def structField: StructField = StructField(name, dataType, nullable)

  def hasDefault: Boolean = default.isDefined

  /** True when any data-level check applies (drives the validator plan). */
  def hasRowChecks: Boolean =
    !bounds.isEmpty || pattern.isDefined || minLength.isDefined ||
      maxLength.isDefined || enumValues.isDefined
}

object FieldSpec {

  /** Canonical accepted-type family per declared type (SURVEY §1.2). */
  def defaultValidTypes(dt: DataType): Seq[DataType] = dt match {
    case LongType =>
      Seq(LongType, IntegerType, ShortType, ByteType)
    case IntegerType => Seq(IntegerType, ShortType, ByteType)
    case DoubleType  => Seq(DoubleType, FloatType)
    case ArrayType(inner, n) =>
      defaultValidTypes(inner).map(ArrayType(_, n))
    case other => Seq(other)
  }

  /** Convenience constructors mirroring the annotation→type table. */
  def long(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, LongType, nullable)
  def int(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, IntegerType, nullable)
  def double(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, DoubleType, nullable)
  def string(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, StringType, nullable)
  def bool(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, BooleanType, nullable)
  def date(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, DateType, nullable)
  def timestamp(name: String, nullable: Boolean = false): FieldSpec =
    FieldSpec(name, TimestampType, nullable)
  def enum(name: String, values: Seq[Any], nullable: Boolean = false): FieldSpec =
    FieldSpec(name, StringType, nullable, enumValues = Some(values))
}
