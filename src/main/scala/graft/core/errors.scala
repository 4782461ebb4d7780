package graft.core

/** One validation failure, in the reference's pydantic-style error shape
  * (loc, msg, type) — reference: src/patito/exceptions.py:6-43.
  */
final case class ErrorDetail(loc: String, msg: String, errType: String)

object ErrorTypes {
  val MissingColumns    = "type_error.missingcolumns"
  val SuperfluousColumns = "type_error.superfluouscolumns"
  val MissingValues     = "value_error.missingvalues"
  val ColumnDType       = "type_error.columndtype"
  val RowValue          = "value_error.rowvalue"
}

/** Aggregated validation failure: every check's violations in one exception,
  * like the reference's single `ValidationError`
  * (src/patito/validators.py:298-318).
  */
final class ValidationError(val errors: Seq[ErrorDetail], val modelName: String)
    extends RuntimeException(
      s"${errors.size} validation error${if (errors.size == 1) "" else "s"} for $modelName\n" +
        errors.map(e => s"${e.loc}\n  ${e.msg} (type=${e.errType})").mkString("\n"))

/** Row-arity failures for `get` (reference: src/patito/exceptions.py:38-43). */
final class RowDoesNotExist(msg: String) extends RuntimeException(msg)
final class MultipleRowsReturned(msg: String) extends RuntimeException(msg)
