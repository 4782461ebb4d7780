package graft.frame

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core._

/** Model-aware frame ops — mirrors reference tests/test_polars.py
  * (cast :109, derive :201, model-driven CSV read :157, fill_null,
  * get :512-592).
  */
class ModeledFrameSpec extends SparkSpec {

  test("cast: lax leaves valid dtypes, strict forces defaults") {
    val m = Schema("M", Seq(FieldSpec.long("i"), FieldSpec.double("d")))
    val df = frame(struct("i" -> IntegerType, "d" -> FloatType), Row(1, 1.5f))
    val lax = ModeledFrame(df, m).cast()
    // int and float are in the valid families -> untouched
    assert(lax.df.schema("i").dataType == IntegerType)
    assert(lax.df.schema("d").dataType == FloatType)
    val strict = ModeledFrame(df, m).cast(strict = true)
    assert(strict.df.schema("i").dataType == LongType)
    assert(strict.df.schema("d").dataType == DoubleType)
  }

  test("derive materializes derived_from columns in field order") {
    val m = Schema("D", Seq(
      FieldSpec.long("base"),
      FieldSpec.long("copied").copy(derivedFrom = Some(Left("base"))),
      FieldSpec.long("doubled").copy(derivedFrom = Some(Right(col("copied") * 2)))))
    val df = frame(struct("base" -> LongType), Row(21L))
    val out = ModeledFrame(df, m).derive().df
    assert(out.select("base", "copied", "doubled").head() == Row(21L, 21L, 42L))
  }

  test("fillNullDefaults fills only defaultable columns") {
    val m = Schema("F", Seq(
      FieldSpec.long("a", nullable = true).copy(default = Some(42L)),
      FieldSpec.string("b", nullable = true)))
    val df = frame(struct("a" -> LongType, "b" -> StringType),
      Row(null, null), Row(1L, "x"))
    val out = ModeledFrame(df, m).fillNullDefaults().df
    assert(collectSorted(out, "a") == Seq(Row(1L, "x"), Row(42L, null)))
  }

  test("withMissingColumns adds defaults and typed nulls") {
    val m = Schema("W", Seq(
      FieldSpec.long("present"),
      FieldSpec.string("dflt").copy(default = Some("d")),
      FieldSpec.double("nul", nullable = true)))
    val df = frame(struct("present" -> LongType), Row(7L))
    val out = ModeledFrame(df, m).withMissingColumns().selectModel().df
    assert(out.columns.toSeq == Seq("present", "dflt", "nul"))
    assert(out.head() == Row(7L, "d", null))
    assert(out.schema("nul").dataType == DoubleType)
  }

  test("get: exactly-one-row semantics") {
    val m = Schema("G", Seq(FieldSpec.long("x")))
    val df = frame(struct("x" -> LongType), Row(1L), Row(2L))
    val mf = ModeledFrame(df, m)
    assert(mf.get(col("x") === 2L) == Row(2L))
    intercept[RowDoesNotExist](mf.get(col("x") === 99L))
    intercept[MultipleRowsReturned](mf.get(col("x") > 0L))
  }

  test("model-driven CSV read: headerless names+types from model, then derive") {
    val m = Schema("Csv", Seq(
      FieldSpec.double("a", nullable = true),
      FieldSpec.string("b", nullable = true),
      FieldSpec.string("b2", nullable = true).copy(derivedFrom = Some(Left("b")))))
    val dir = Files.createTempDirectory("graftcsv")
    val f = dir.resolve("data.csv")
    Files.writeString(f, "1,x\n2,y\n")
    val out = ModeledFrame.readCsv(spark, f.toString, m, header = false).df
    assert(out.schema("a").dataType == DoubleType)
    assert(collectSorted(out.select("a", "b", "b2"), "a") ==
      Seq(Row(1.0, "x", "x"), Row(2.0, "y", "y")))
  }

  test("validateAgainst syntax returns the frame on success") {
    import ModeledFrame.syntax._
    val m = Schema("S", Seq(FieldSpec.long("x")))
    val df = frame(struct("x" -> LongType), Row(1L))
    assert(df.validateAgainst(m).count() == 1)
    assert(df.withModel(m).errors().isEmpty)
  }
}
