package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema algebra — mirrors reference tests/test_model.py (select/drop/
  * rename/prefix/suffix/with_fields at pydantic.py:1118-1328, join
  * nullability at pydantic.py:1044-1116 / tests/test_model.py:273-318).
  */
class SchemaSpec extends AnyFunSuite {

  private val a = Schema("A", Seq(FieldSpec.long("a"), FieldSpec.string("s")))
  private val b = Schema("B", Seq(FieldSpec.long("b")))

  test("introspection properties") {
    val m = Schema("M", Seq(
      FieldSpec.long("id").copy(unique = true),
      FieldSpec.string("name", nullable = true).copy(default = Some("x"))))
    assert(m.columns == Seq("id", "name"))
    assert(m.dtypes == Map("id" -> LongType, "name" -> StringType))
    assert(m.uniqueColumns == Set("id"))
    assert(m.nonNullableColumns == Set("id"))
    assert(m.nullableColumns == Set("name"))
    assert(m.defaults == Map("name" -> "x"))
    assert(m.validDtypes("id").contains(IntegerType)) // widened family
    assert(m.structType == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true))))
  }

  test("select subset and unknown-field error") {
    assert(a.select(Seq("s")).columns == Seq("s"))
    val e = intercept[IllegalArgumentException](a.select(Seq("nope")))
    assert(e.getMessage.contains("nope"))
  }

  test("drop / rename / prefix / suffix / withFields") {
    assert(a.drop(Seq("s")).columns == Seq("a"))
    intercept[IllegalArgumentException](a.drop(Seq("zz")))
    assert(a.rename(Map("a" -> "a2")).columns == Seq("a2", "s"))
    intercept[IllegalArgumentException](a.rename(Map("zz" -> "x")))
    assert(a.prefix("p_").columns == Seq("p_a", "p_s"))
    assert(a.suffix("_x").columns == Seq("a_x", "s_x"))
    assert(a.withFields(Seq(FieldSpec.bool("f"))).columns == Seq("a", "s", "f"))
  }

  test("join nullability for all seven kinds (F7)") {
    // left/asof: right side becomes nullable
    for (k <- Seq(JoinKind.Left, JoinKind.AsOf)) {
      val j = a.join(b, k)
      assert(j.columns == Seq("a", "s", "b"))
      assert(!j("a").nullable && j("b").nullable, k)
    }
    // outer: both sides nullable
    val o = a.join(b, JoinKind.Outer)
    assert(o("a").nullable && o("s").nullable && o("b").nullable)
    // inner/cross: nullability unchanged
    for (k <- Seq(JoinKind.Inner, JoinKind.Cross)) {
      val j = a.join(b, k)
      assert(j.columns == Seq("a", "s", "b") && !j("b").nullable, k)
    }
    // semi/anti: left schema unchanged
    for (k <- Seq(JoinKind.Semi, JoinKind.Anti))
      assert(a.join(b, k) == a, k)
  }

  test("join drops colliding right-side fields (left wins)") {
    val c = Schema("C", Seq(FieldSpec.long("a"), FieldSpec.long("c")))
    assert(a.join(c, JoinKind.Inner).columns == Seq("a", "s", "c"))
  }

  test("duplicate field names rejected") {
    intercept[IllegalArgumentException](
      Schema("D", Seq(FieldSpec.long("x"), FieldSpec.string("x"))))
  }

  test("fromStructType round-trip") {
    val st = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("arr", ArrayType(LongType, containsNull = true), nullable = true)))
    val m = Schema.fromStructType("T", st)
    assert(m.structType == st)
  }
}
