package graft.core

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Dummy-data generation — mirrors reference tests/test_dummy_data.py
  * (unique-data generation :84-98) and example_value semantics
  * (pydantic.py:718-821).
  */
class ExamplesSpec extends SparkSpec {

  test("examples synthesizes ArrayType fields (Seq literals need Literal.create)") {
    val m = Schema("A", Seq(
      FieldSpec.long("id").copy(unique = true),
      FieldSpec("tags", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))))
    val df = Examples.examples(spark, m, n = 3L)
    assert(df.count() == 3)
    assert(df.select("tags").head().getSeq[Long](0) == Seq(0L))
    assert(Validator.findErrors(df, m).isEmpty)
  }

  test("exampleValue honors const > default > nullable > enum > bounds") {
    assert(Examples.exampleValue(
      FieldSpec.double("c").copy(bounds = Bounds(const = Some(3.14)))) == 3.14)
    assert(Examples.exampleValue(
      FieldSpec.double("d").copy(default = Some(1.5))) == 1.5)
    assert(Examples.exampleValue(FieldSpec.string("n", nullable = true)) == null)
    assert(Examples.exampleValue(
      FieldSpec.enum("e", Seq("a", "b"))) == "a")
    // bounds midpoint
    val mid = Examples.exampleValue(
      FieldSpec.double("m").copy(bounds = Bounds(ge = Some(10), le = Some(20))))
    assert(mid == 15.0)
    // only-lower / only-upper
    assert(Examples.exampleValue(
      FieldSpec.long("lo").copy(bounds = Bounds(ge = Some(10)))) == 11L)
    // string respects minLength
    assert(Examples.exampleValue(
      FieldSpec.string("s").copy(minLength = Some(3))) == "aaa")
    // pattern without const/default is not generatable
    intercept[IllegalArgumentException](
      Examples.exampleValue(FieldSpec.string("p").copy(pattern = Some("x+"))))
  }

  test("F5: unique columns get distinct values per row") {
    val m = Schema("U", Seq(
      FieldSpec.bool("bool_column", nullable = true),
      FieldSpec.string("string_column").copy(unique = true),
      FieldSpec.long("int_column").copy(unique = true),
      FieldSpec.double("float_column").copy(unique = true),
      FieldSpec.date("date_column").copy(unique = true),
      FieldSpec.timestamp("datetime_column").copy(unique = true)))
    val df = Examples.examples(spark, m,
      data = Map("bool_column" -> Seq(true, false)))
    for (c <- Seq("string_column", "int_column", "float_column",
        "date_column", "datetime_column")) {
      assert(df.select(c).distinct().count() == 2, c)
    }
  }

  test("examples(n) is range-based and validates against its own model") {
    val m = Schema("R", Seq(
      FieldSpec.long("id").copy(unique = true),
      FieldSpec.enum("status", Seq("a", "b")),
      FieldSpec.double("score").copy(default = Some(0.5))))
    val df = Examples.examples(spark, m, n = 1000L)
    assert(df.count() == 1000)
    assert(Validator.findErrors(df, m).isEmpty)
  }

  test("emptyFrame is typed and empty") {
    val m = Schema("E", Seq(FieldSpec.long("x"), FieldSpec.string("s", nullable = true)))
    val df = Examples.emptyFrame(spark, m)
    assert(df.count() == 0)
    assert(df.schema("x").dataType == LongType)
  }

  test("provided columns of mismatched lengths are rejected") {
    val m = Schema("P", Seq(FieldSpec.long("a"), FieldSpec.long("b")))
    intercept[IllegalArgumentException](
      Examples.examples(spark, m, data = Map("a" -> Seq(1, 2), "b" -> Seq(1))))
    intercept[IllegalArgumentException](
      Examples.examples(spark, m, data = Map("zz" -> Seq(1))))
  }
}
