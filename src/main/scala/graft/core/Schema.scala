package graft.core

import org.apache.spark.sql.types._

/** Join kinds recognized by the schema algebra (the reference's
  * `Model.join(other, how)` accepts all seven even though its execution layer
  * only runs inner/left — reference: src/patito/pydantic.py:1044-1116). Our
  * execution layer ([[graft.relation.Relation]]) runs all of them.
  */
sealed abstract class JoinKind(val sparkName: String)
object JoinKind {
  case object Inner extends JoinKind("inner")
  case object Left  extends JoinKind("left")
  case object Outer extends JoinKind("outer")
  case object AsOf  extends JoinKind("asof")
  case object Cross extends JoinKind("cross")
  case object Semi  extends JoinKind("left_semi")
  case object Anti  extends JoinKind("left_anti")

  def fromString(s: String): JoinKind = s.toLowerCase match {
    case "inner"               => Inner
    case "left"                => Left
    case "outer" | "full"      => Outer
    case "asof"                => AsOf
    case "cross"               => Cross
    case "semi" | "left_semi"  => Semi
    case "anti" | "left_anti"  => Anti
    case other => throw new IllegalArgumentException(s"unknown join kind: $other")
  }
}

/** Value-level model: an ordered set of [[FieldSpec]]s plus a name.
  *
  * This is the Spark-native replacement for the reference's `patito.Model`
  * metaclass (reference: src/patito/pydantic.py:527): pure metadata, never
  * holds bulk data. All the introspection properties and the schema algebra
  * (select/drop/rename/prefix/suffix/with_fields/join —
  * pydantic.py:1044-1328) live here as plain value transformations.
  */
final case class Schema(name: String, fields: Seq[FieldSpec]) {
  require(
    fields.map(_.name).distinct.size == fields.size,
    s"duplicate field names in schema $name")

  private lazy val byName: Map[String, FieldSpec] =
    fields.map(f => f.name -> f).toMap

  def apply(field: String): FieldSpec =
    byName.getOrElse(
      field,
      throw new IllegalArgumentException(s"Field $field not in schema $name"))

  def contains(field: String): Boolean = byName.contains(field)

  // ---- introspection (pydantic.py:94-524) -------------------------------

  def columns: Seq[String] = fields.map(_.name)
  def dtypes: Map[String, DataType] = fields.map(f => f.name -> f.dataType).toMap
  def validDtypes: Map[String, Seq[DataType]] =
    fields.map(f => f.name -> f.validTypes).toMap
  def defaults: Map[String, Any] =
    fields.collect { case f if f.default.isDefined => f.name -> f.default.get }.toMap
  def nonNullableColumns: Set[String] =
    fields.filterNot(_.nullable).map(_.name).toSet
  def nullableColumns: Set[String] =
    fields.filter(_.nullable).map(_.name).toSet
  def uniqueColumns: Set[String] =
    fields.filter(_.unique).map(_.name).toSet

  /** Spark StructType for reads/casts/empty frames. */
  def structType: StructType = StructType(fields.map(_.structField))

  /** SQL DDL type per column (Spark dialect), mirroring `Model.sql_types`. */
  def sqlTypes: Map[String, String] =
    fields.map(f => f.name -> f.dataType.sql).toMap

  // ---- algebra (pydantic.py:1118-1328) ----------------------------------

  def select(names: Seq[String]): Schema = {
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"Fields ${unknown.mkString(", ")} not in schema $name")
    Schema(name, names.map(byName))
  }

  def drop(names: Seq[String]): Schema = {
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"Fields ${unknown.mkString(", ")} not in schema $name")
    Schema(name, fields.filterNot(f => names.contains(f.name)))
  }

  def rename(mapping: Map[String, String]): Schema = {
    val unknown = mapping.keys.filterNot(byName.contains)
    require(unknown.isEmpty, s"Fields ${unknown.mkString(", ")} not in schema $name")
    Schema(name, fields.map(f => f.withName(mapping.getOrElse(f.name, f.name))))
  }

  def prefix(p: String): Schema =
    Schema(name, fields.map(f => f.withName(p + f.name)))

  def suffix(s: String): Schema =
    Schema(name, fields.map(f => f.withName(f.name + s)))

  def withFields(extra: Seq[FieldSpec]): Schema =
    Schema(name, fields ++ extra)

  /** Nullability-correct joined schema for all seven join kinds
    * (pydantic.py:1044-1116): left/asof make right-side fields nullable,
    * outer makes both sides nullable, semi/anti return the left schema
    * unchanged, inner/cross concatenate as-is. Right-side fields whose names
    * collide with left-side ones are dropped (left wins).
    */
  def join(other: Schema, how: JoinKind): Schema = how match {
    case JoinKind.Semi | JoinKind.Anti => this
    case JoinKind.Outer =>
      val l = fields.map(_.copy(nullable = true))
      val r = rightOf(other).map(_.copy(nullable = true))
      Schema(name, l ++ r)
    case JoinKind.Left | JoinKind.AsOf =>
      Schema(name, fields ++ rightOf(other).map(_.copy(nullable = true)))
    case JoinKind.Inner | JoinKind.Cross =>
      Schema(name, fields ++ rightOf(other))
  }

  private def rightOf(other: Schema): Seq[FieldSpec] =
    other.fields.filterNot(f => byName.contains(f.name))
}

object Schema {
  def apply(fields: FieldSpec*): Schema = Schema("schema", fields)

  /** Infer a constraint-free schema from a Spark StructType (the analogue of
    * the reference's dynamic `UntypedRow` model, src/patito/polars.py:594-612).
    */
  def fromStructType(name: String, st: StructType): Schema =
    Schema(name, st.fields.toSeq.map(f => FieldSpec(f.name, f.dataType, f.nullable)))
}
