package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Literal-map CASE expression builder — the Spark-native port of the
  * reference's `patito.sql.Case` string builder (src/patito/sql.py:22-89) and
  * `Relation.case` (src/patito/duckdb.py:499-570): maps literal→literal with
  * an optional default, null-safe on both sides (sql.py's `sql_repr` renders
  * python None as SQL null, sql.py:9-19 — here `lit(null)` / `isNull`).
  *
  * Instead of string-assembling SQL, this folds `when(col === key, value)`
  * chains — fully codegen'd by Catalyst, no parsing step.
  */
object CaseBuilder {

  def caseWhen(from: Column, mapping: Seq[(Any, Any)], default: Any = null): Column = {
    val start: Option[Column] = None
    val folded = mapping.foldLeft(start) { case (acc, (k, v)) =>
      val cond = if (k == null) from.isNull else from === lit(k)
      val value = lit(v)
      Some(acc.fold(when(cond, value))(_.when(cond, value)))
    }
    folded.fold(lit(default))(_.otherwise(lit(default)))
  }
}
