package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

case class Person(id: Long, name: String, age: Option[Int])

/** Typed Model facade: case-class-derived schemas + Dataset[T] row access. */
class ModelSpec extends SparkSpec {

  private val model = Model[Person]()
    .refine("id")(_.copy(unique = true))
    .refine("age")(_.copy(bounds = Bounds(ge = Some(0), le = Some(130))))

  private def people(rows: (Long, String, Any)*) =
    frame(
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("age", IntegerType, nullable = true))),
      rows.map { case (i, n, a) => Row(i, n, a) }: _*)

  test("schema derives from the case class: names, types, Option ⇒ nullable") {
    assert(model.schema.columns == Seq("id", "name", "age"))
    assert(model.schema.dtypes == Map(
      "id" -> LongType, "name" -> StringType, "age" -> IntegerType))
    assert(model.schema.nonNullableColumns == Set("id", "name"))
    assert(model.schema.nullableColumns == Set("age"))
    assert(model.schema.uniqueColumns == Set("id"))
    assert(model.name == "Person")
  }

  test("validate returns a typed Dataset on success, throws on violations") {
    val ok = model.validate(people((1L, "ada", 36), (2L, "bo", null)))
    assert(ok.collect().toSet == Set(Person(1L, "ada", Some(36)), Person(2L, "bo", None)))

    val err = intercept[ValidationError] {
      model.validate(people((1L, "ada", 36), (1L, null, 200)))
    }
    val locs = err.errors.map(d => (d.loc, d.errType)).toSet
    assert(locs.contains(("name", ErrorTypes.MissingValues)))
    assert(locs.contains(("age", ErrorTypes.RowValue)))   // 200 out of bounds
    assert(locs.contains(("id", ErrorTypes.RowValue)))    // duplicated
  }

  test("get / fromRow enforce exactly-one-row arity and return T") {
    val df = people((1L, "ada", 36), (2L, "bo", null))
    assert(model.get(df, col("id") === 2L) == Person(2L, "bo", None))
    intercept[RowDoesNotExist] { model.get(df, col("id") === 99L) }
    intercept[MultipleRowsReturned] { model.get(df) }
    assert(model.fromRow(df.where(col("id") === 1L)) == Person(1L, "ada", Some(36)))
  }

  test("iterator streams model instances; examples fabricates valid typed rows") {
    val df = people((1L, "ada", 36), (2L, "bo", null))
    assert(model.iterator(df.orderBy("id")).toSeq.head == Person(1L, "ada", Some(36)))

    val fab = model.examples(spark, n = 7L)
    assert(fab.count() == 7L)
    assert(fab.select("id").distinct().count() == 7L) // unique refinement
    Validator.validate(fab.toDF(), model.schema)      // round-trips validation
    assert(model.empty(spark).count() == 0L)
  }
}
