package graft.core

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.relation.Relation

/** ScalaCheck properties the reference's test suite lacks (SURVEY §5 port
  * plan): generated schemas exercise combinations of type / nullability /
  * enum / bounds / uniqueness that hand-written fixtures would miss.
  *
  * Runs as a plain ScalaCheck `Properties` (sbt's scalacheck framework) with
  * a reduced trial count — every trial runs real Spark jobs.
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val genType: Gen[DataType] =
    Gen.oneOf(LongType, IntegerType, DoubleType, StringType, BooleanType)

  /** Fields constrained to combinations the dummy-data generator can always
    * satisfy: enum on strings, bounds on non-unique numerics, uniqueness on
    * non-nullable longs/strings (counter stays distinct and in-domain).
    */
  private def genField(name: String): Gen[FieldSpec] = for {
    tpe <- genType
    nullable <- Gen.oneOf(true, false)
    flavor <- Gen.choose(0, 3)
  } yield {
    val base = FieldSpec(name, tpe, nullable)
    flavor match {
      case 1 if tpe == StringType =>
        base.copy(enumValues = Some(Seq("a", "b", "c")))
      case 2 if Seq(LongType, IntegerType, DoubleType).contains(tpe) =>
        base.copy(bounds = Bounds(ge = Some(0), le = Some(1000)))
      case 3 if !nullable && Seq(LongType, StringType).contains(tpe) =>
        base.copy(unique = true)
      case _ => base
    }
  }

  private val genSchema: Gen[Schema] = for {
    k <- Gen.choose(1, 6)
    fields <- Gen.sequence[List[FieldSpec], FieldSpec](
      (0 until k).map(i => genField(s"f$i")).toList)
  } yield Schema("P", fields)

  // validate ∘ examples ≡ ok — the generator only emits satisfiable specs,
  // so fabricated frames must pass their own schema's validation.
  property("examples validate against their own schema") =
    forAll(genSchema, Gen.choose(1, 40)) { (schema, n) =>
      Validator.findErrors(
        Examples.examples(spark, schema, n = n.toLong), schema).isEmpty
    }

  property("cast to the model is idempotent on schema and data") =
    forAll(genSchema) { schema =>
      val r = Relation(Examples.examples(spark, schema, n = 5L))
      val once = r.cast(schema, strict = true)
      val twice = once.cast(schema, strict = true)
      once.df.schema == twice.df.schema && once.sameAs(twice)
    }

  property("union reorders the right side by column name") =
    forAll(genSchema) { schema =>
      val df = Examples.examples(spark, schema, n = 4L)
      val reversed = df.select(df.columns.reverse.map(col): _*)
      val u = Relation(df).union(Relation(reversed))
      u.df.columns.sameElements(df.columns) && u.count() == 8L
    }

  property("select and drop partition the schema") =
    forAll(genSchema) { schema =>
      val keep = schema.columns.zipWithIndex.collect {
        case (c, i) if i % 2 == 0 => c
      }
      val rest = schema.columns.filterNot(keep.contains)
      (schema.select(keep).columns == keep) &&
      (schema.drop(keep).columns == rest) &&
      (schema.select(keep).fields ++ schema.drop(keep).fields)
        .map(_.name).toSet == schema.columns.toSet
    }

  property("prefix/rename round-trip preserves specs") =
    forAll(genSchema) { schema =>
      val back = schema.prefix("x_").rename(
        schema.columns.map(c => s"x_$c" -> c).toMap)
      back.fields == schema.fields
    }

  property("examples of a unique column are distinct at any n") =
    forAll(Gen.choose(2, 60)) { n =>
      val schema = Schema("U", Seq(
        FieldSpec.long("id").copy(unique = true),
        FieldSpec.string("tag", nullable = true)))
      val df = Examples.examples(spark, schema, n = n.toLong)
      df.select("id").distinct().count() == n.toLong
    }

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 30)
    words <- Gen.listOfN(n, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
  } yield words.mkString(" ")

  // banded range join ≡ raw theta join for arbitrary intervals (empty,
  // edge-aligned, overlapping) and bucket widths
  property("rangeJoin equals the raw range predicate") =
    forAll(
      Gen.listOfN(12, Gen.choose(0.0, 40.0)),
      Gen.listOfN(6, for {
        lo <- Gen.choose(0.0, 35.0)
        span <- Gen.choose(-2.0, 12.0) // negative → empty interval
      } yield (lo, lo + span)),
      Gen.oneOf(1.0, 3.0, 5.0, 8.0)) { (points, intervals, bucket) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val pdf = Relation(spark.createDataFrame(
        spark.sparkContext.parallelize(points.zipWithIndex.map {
          case (x, i) => Row(i.toLong, x) }),
        StructType(Seq(StructField("pid", LongType), StructField("x", DoubleType)))))
      val idf = Relation(spark.createDataFrame(
        spark.sparkContext.parallelize(intervals.zipWithIndex.map {
          case ((lo, hi), i) => Row(i.toLong, lo, hi) }),
        StructType(Seq(StructField("iid", LongType),
          StructField("lo", DoubleType), StructField("hi", DoubleType)))))
      val banded = pdf.rangeJoin(idf, "x", "lo", "hi", bucket)
        .apply("pid", "iid")
      val naive = pdf.join(idf, "x >= lo AND x < hi").apply("pid", "iid")
      banded.sameAs(naive)
    }

  // connected components ≡ driver-side union-find on random pair graphs
  property("dedupClusters matches union-find closure") =
    forAll(
      Gen.choose(3, 12),
      Gen.listOf(Gen.zip(Gen.choose(0, 11), Gen.choose(0, 11)))) { (n, rawEdges) =>
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      import graft.ops.Dedup
      val edges = rawEdges.map { case (a, b) => (a % n, b % n) }
        .filter { case (a, b) => a < b }.distinct
      val nodes = spark.createDataFrame(
        spark.sparkContext.parallelize((0 until n).map(i => Row(i.toLong))),
        StructType(Seq(StructField("id", LongType))))
      val pairs = spark.createDataFrame(
        spark.sparkContext.parallelize(edges.map { case (a, b) => Row(a.toLong, b.toLong) }),
        StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
      // maxDriverEdges = 0 pins the DISTRIBUTED propagation rounds — the
      // subject of this property; these tiny graphs would otherwise ride
      // the driver union-find fast path, which shares the reference
      // implementation's algorithm
      val got = Dedup.dedupClusters(nodes, "id", pairs, maxIters = n + 1,
        maxDriverEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // and the fast path labels identically on the same graph
      val fast = Dedup.dedupClusters(nodes, "id", pairs, maxIters = n + 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (0 until n).map { i =>
        val members = (0 until n).filter(j => find(j) == find(i))
        i.toLong -> members.min.toLong
      }.toMap
      got == expect && fast == expect
    }

  // the fused threshold predicate must make the SAME decision as computing
  // the exact jaccard and comparing — for any arrays and any threshold,
  // including boundary-exact pairs
  property("jaccardSortedGE decision-identical to jaccardSorted >= t") =
    forAll(
      Gen.listOf(Gen.choose(0L, 40L)),
      Gen.listOf(Gen.choose(0L, 40L)),
      Gen.oneOf(0.1, 0.25, 0.5, 2.0 / 3.0, 0.9, 1.0)) { (rawA, rawB, t) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import graft.functions.SetMath
      val a = new GenericArrayData(rawA.distinct.sorted.toArray)
      val b = new GenericArrayData(rawB.distinct.sorted.toArray)
      SetMath.jaccardSortedGE(a, b, t) == (SetMath.jaccardSorted(a, b) >= t)
    }

  // the hashed-set verification kernel must agree exactly with string-set
  // Jaccard on arbitrary token streams (duplicate shingles, short docs,
  // empty docs)
  property("hashed-set jaccard equals string-set jaccard") =
    forAll(genDoc, genDoc, Gen.choose(1, 4)) { (ta, tb, k) =>
      import org.apache.spark.sql.functions.{col, lit}
      import graft.functions.native
      import graft.ops.{Dedup, TextOps}
      val df = spark.createDataFrame(Seq((ta, tb))).toDF("a", "b")
      val row = df.select(
        native.jaccard(
          Dedup.shingles(col("a"), k), Dedup.shingles(col("b"), k)).as("strs"),
        native.jaccardSorted(
          native.hashedShingleSet(TextOps.wsTokens(col("a")), k),
          native.hashedShingleSet(TextOps.wsTokens(col("b")), k)).as("hashed"))
        .head()
      row.getDouble(0) == row.getDouble(1)
    }
}
