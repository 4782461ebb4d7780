package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Port of the reference's sql.Case semantics (src/patito/sql.py:22-89):
  * literal→literal mapping, default, null-safe keys (sql_repr of None).
  */
class CaseBuilderSpec extends SparkSpec {

  test("maps literals, applies default, handles null keys") {
    val df = frame(struct("shelf" -> StringType),
      Row("A"), Row("B"), Row("C"), Row(null))
    val out = df.select(
      col("shelf"),
      CaseBuilder.caseWhen(col("shelf"),
        Seq("A" -> "fruit", "B" -> "veg", (null, "unknown-shelf")),
        default = "misc").as("c"))
    val got = out.collect().map(r => Option(r.getString(0)).getOrElse("∅") -> r.getString(1)).toMap
    assert(got == Map("A" -> "fruit", "B" -> "veg", "C" -> "misc", "∅" -> "unknown-shelf"))
  }

  test("empty mapping yields the default") {
    val df = frame(struct("x" -> LongType), Row(1L))
    assert(df.select(CaseBuilder.caseWhen(col("x"), Nil, default = 9L))
      .head().getLong(0) == 9L)
  }
}
