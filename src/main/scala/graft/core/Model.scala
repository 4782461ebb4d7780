package graft.core

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Typed facade over the value-level [[Schema]]: the reference's `Model` is a
  * *class* whose annotated fields define the schema and whose instances are
  * single rows (src/patito/pydantic.py:527-608). Scala can't create classes
  * at runtime, so the engine's core is value-level — but a case class gives
  * the same declare-once experience: the schema derives from the product
  * encoder (field order, types, Option ⇒ nullable), constraint metadata is
  * layered on per field with [[refine]], and rows materialize as `T` via the
  * `Dataset[T]` machinery (`from_row`/`get`/`__iter__`,
  * pydantic.py:562-668 / duckdb.py:969-1055, 2191-2236).
  *
  * {{{
  * case class Person(id: Long, name: String, age: Option[Int])
  * val model = Model[Person]()
  *   .refine("id")(_.copy(unique = true))
  *   .refine("age")(_.copy(bounds = Bounds(ge = Some(0), le = Some(130))))
  * val people: Dataset[Person] = model.validate(df)   // throws on violations
  * val one: Person = model.get(df, col("id") === 42)
  * }}}
  */
final case class Model[T <: Product] private (
    name: String,
    refinements: Seq[(String, FieldSpec => FieldSpec)])(
    implicit tt: TypeTag[T]) {

  lazy val encoder: Encoder[T] = Encoders.product[T]

  /** Schema derived from the case class, with refinements applied in order.
    * Nullability follows the reference's rule — `Option[_]` fields are
    * nullable, everything else required (pydantic "required" set,
    * pydantic.py:454-475) — NOT the encoder's, which marks every AnyRef
    * field nullable.
    */
  lazy val schema: Schema = {
    import scala.reflect.runtime.universe._
    val optional: Set[String] = tt.tpe.decls.collect {
      case m: MethodSymbol
          if m.isCaseAccessor &&
            m.returnType.typeConstructor =:= typeOf[Option[Any]].typeConstructor =>
        m.name.decodedName.toString
    }.toSet
    val base = Schema(name, encoder.schema.fields.toSeq.map(f =>
      FieldSpec(f.name, f.dataType, nullable = optional(f.name))))
    refinements.foldLeft(base) { case (s, (field, f)) =>
      require(s.contains(field), s"Field $field not in model $name")
      Schema(s.name, s.fields.map(fs => if (fs.name == field) f(fs) else fs))
    }
  }

  /** Layer constraint metadata onto one derived field. */
  def refine(field: String)(f: FieldSpec => FieldSpec): Model[T] =
    copy(refinements = refinements :+ (field -> f))

  /** Validate and return the typed view; throws [[ValidationError]]. */
  def validate(df: DataFrame): Dataset[T] = {
    Validator.validate(df, schema)
    df.as[T](encoder)
  }

  def errors(df: DataFrame): Seq[ErrorDetail] = Validator.findErrors(df, schema)

  /** Exactly-one-row fetch as a model instance (take(2), never a collect). */
  def get(df: DataFrame, predicates: org.apache.spark.sql.Column*): T = {
    val filtered = predicates.foldLeft(df)(_ where _)
    filtered.as[T](encoder).take(2) match {
      case Array(t) => t
      case Array()  => throw new RowDoesNotExist(s"$name.get() yielded 0 rows.")
      case _        => throw new MultipleRowsReturned(s"$name.get() yielded 2 or more rows.")
    }
  }

  /** Single-row frame → model instance (`Model.from_row`). */
  def fromRow(df: DataFrame): T = get(df)

  /** Stream rows as model instances (`Relation.__iter__`). */
  def iterator(df: DataFrame): Iterator[T] = {
    import scala.jdk.CollectionConverters._
    df.as[T](encoder).toLocalIterator().asScala
  }

  /** Typed dummy data (`Model.examples`). */
  def examples(spark: SparkSession, n: Long = 1L): Dataset[T] =
    Examples.examples(spark, schema, n = n).as[T](encoder)

  /** Typed empty frame. */
  def empty(spark: SparkSession): Dataset[T] =
    Examples.emptyFrame(spark, schema).as[T](encoder)
}

object Model {
  /** Derive a model from a case class; name defaults to the class name. */
  def apply[T <: Product]()(implicit tt: TypeTag[T]): Model[T] =
    Model[T](tt.tpe.typeSymbol.name.decodedName.toString, Nil)

  def apply[T <: Product](name: String)(implicit tt: TypeTag[T]): Model[T] =
    Model[T](name, Nil)
}
