package graft.relation

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core._

/** Fluent relation surface — mirrors reference
  * tests/test_duckdb/test_relation.py (F6 fixtures: select variants :18-60,
  * joins duckdb.py:1160-1208, union reorder :428, case :377, aggregate :325,
  * insert_into :734, cast :920).
  */
class RelationSpec extends SparkSpec {

  private def t1: Relation = Relation(frame(
    struct("column_1" -> LongType, "column_2" -> StringType),
    Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))

  test("select star-expansion lets named projections overwrite in place") {
    val out = t1.selectNamed("column_1" -> "column_1 * 10").toDF
    assert(out.columns.toSeq == Seq("column_1", "column_2"))
    assert(collectSorted(out, "column_1") ==
      Seq(Row(10L, "a"), Row(20L, "b"), Row(30L, "c")))
  }

  test("select with kwarg-style computed column (F6 column_3)") {
    val out = t1.select(
      Seq("*"), Seq("column_3" -> "cast(column_1 as string) || column_2")).toDF
    assert(collectSorted(out.select("column_3"), "column_3").map(_.getString(0)) ==
      Seq("1a", "2b", "3c"))
  }

  test("filter fragments AND + filterEq + all()") {
    assert(t1.filter("column_1 > 1", "column_2 != 'c'").count() == 1)
    assert(t1.filterEq("column_2" -> "b").toDF.head().getLong(0) == 2L)
    assert(t1.all("column_1 >= 1"))
    assert(!t1.all("column_1 >= 2"))
  }

  test("rename overwrites colliding target and errors on missing source") {
    val out = t1.rename("column_1" -> "column_2").toDF
    assert(out.columns.toSeq == Seq("column_2"))
    val e = intercept[IllegalArgumentException](t1.rename("zz" -> "x"))
    assert(e.getMessage.contains("zz"))
  }

  test("prefix/suffix with include/exclude") {
    assert(t1.addPrefix("p_").columns == Seq("p_column_1", "p_column_2"))
    assert(t1.addSuffix("_s", include = Seq("column_1")).columns ==
      Seq("column_1_s", "column_2"))
    assert(t1.addPrefix("p_", exclude = Seq("column_1")).columns ==
      Seq("column_1", "p_column_2"))
    intercept[IllegalArgumentException](
      t1.addPrefix("p_", include = Seq("a"), exclude = Seq("b")))
  }

  test("caseColumn maps literals with default (sql.Case port)") {
    val out = t1.caseColumn("column_2", "mapped",
      Seq("a" -> 1L, "b" -> 2L), default = -1L).toDF
    assert(collectSorted(out.select("mapped"), "mapped").map(_.getLong(0)) ==
      Seq(-1L, 1L, 2L))
  }

  test("coalesceColumns replaces nulls per column") {
    val r = Relation(frame(struct("a" -> LongType, "b" -> StringType),
      Row(null, "x"), Row(2L, null)))
    val out = r.coalesceColumns("a" -> 0L, "b" -> "?").toDF
    assert(collectSorted(out, "a") == Seq(Row(0L, "x"), Row(2L, "?")))
  }

  test("aggregate with groupBy and named expressions") {
    val out = t1.aggregate(
      Seq("cast(sum(column_1) as bigint) as s"),
      groupBy = Seq("column_2"),
      named = Seq("n" -> "count(*)")).toDF
    assert(out.columns.toSeq == Seq("column_2", "s", "n"))
    assert(out.count() == 3)
    // global aggregate when groupBy empty
    assert(t1.aggregate(Seq("cast(sum(column_1) as bigint) as s")).toDF
      .head().getLong(0) == 6L)
  }

  test("joins: products/suppliers inner and left (F6)") {
    val products = Relation(frame(
      struct("product_name" -> StringType, "supplier_id" -> LongType),
      Row("apple", 1L), Row("banana", 1L), Row("oatmeal", 2L), Row("pear", 3L)))
    val suppliers = Relation(frame(
      struct("id" -> LongType, "supplier_name" -> StringType),
      Row(1L, "Aplico"), Row(2L, "Amazon")))
    val inner = products.innerJoin(suppliers, "supplier_id = id").toDF
    assert(inner.count() == 3)
    val left = products.leftJoin(suppliers, "supplier_id = id").toDF
    assert(left.count() == 4)
    assert(left.where("supplier_name is null").count() == 1)
    // semi / anti / cross
    assert(products.semiJoin(suppliers, "supplier_id = id").count() == 3)
    assert(products.antiJoin(suppliers, "supplier_id = id").count() == 1)
    assert(products.crossJoin(suppliers).count() == 8)
  }

  test("join propagates model nullability when both sides are bound") {
    val pm = Schema("P", Seq(FieldSpec.string("product_name"), FieldSpec.long("supplier_id")))
    val sm = Schema("S", Seq(FieldSpec.long("id"), FieldSpec.string("supplier_name")))
    val products = Relation(frame(
      struct("product_name" -> StringType, "supplier_id" -> LongType),
      Row("apple", 1L))).setModel(pm)
    val suppliers = Relation(frame(
      struct("id" -> LongType, "supplier_name" -> StringType),
      Row(1L, "Aplico"))).setModel(sm)
    val joined = products.join(suppliers, "supplier_id = id", "left")
    assert(joined.model.get("supplier_name").nullable)
    assert(!joined.model.get("product_name").nullable)
  }

  test("asofJoin: most recent right row at or before each left time") {
    val quotes = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "px" -> DoubleType),
      Row("A", 1L, 10.0), Row("A", 5L, 11.0), Row("B", 3L, 20.0)))
    val trades = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "qty" -> LongType),
      Row("A", 0L, 1L), Row("A", 5L, 2L), Row("A", 7L, 3L), Row("B", 2L, 4L)))
    val out = trades.asofJoin(quotes, by = Seq("sym"), leftOn = "t", rightOn = "t")
      .toDF
    val rows = collectSorted(out.select("sym", "t", "qty", "px"), "sym", "t")
    assert(rows == Seq(
      Row("A", 0L, 1L, null), // no quote yet
      Row("A", 5L, 2L, 11.0), // inclusive at equal time
      Row("A", 7L, 3L, 11.0), // carries forward
      Row("B", 2L, 4L, null)))
  }

  test("asofJoin: forward, nearest, and tolerance variants") {
    val quotes = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "px" -> DoubleType),
      Row("A", 1L, 10.0), Row("A", 5L, 11.0)))
    val trades = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "qty" -> LongType),
      Row("A", 0L, 1L), Row("A", 2L, 2L), Row("A", 4L, 3L), Row("A", 7L, 4L)))

    val fwd = collectSorted(
      trades.asofJoin(quotes, Seq("sym"), "t", "t", direction = "forward")
        .toDF.select("t", "px"), "t")
    assert(fwd == Seq(
      Row(0L, 10.0), // next quote at 1
      Row(2L, 11.0), // next quote at 5
      Row(4L, 11.0),
      Row(7L, null))) // nothing after

    val near = collectSorted(
      trades.asofJoin(quotes, Seq("sym"), "t", "t", direction = "nearest")
        .toDF.select("t", "px"), "t")
    assert(near == Seq(
      Row(0L, 10.0), // 1 is closest
      Row(2L, 10.0), // dist 1 back vs 3 fwd
      Row(4L, 11.0), // dist 3 back vs 1 fwd
      Row(7L, 11.0)))

    val tol = collectSorted(
      trades.asofJoin(quotes, Seq("sym"), "t", "t",
        direction = "backward", toleranceSeconds = Some(1.0))
        .toDF.select("t", "px"), "t")
    assert(tol == Seq(
      Row(0L, null),  // no quote before
      Row(2L, 10.0),  // quote at 1, dist 1 ≤ tol
      Row(4L, null),  // quote at 1, dist 3 > tol
      Row(7L, null))) // quote at 5, dist 2 > tol
  }

  test("source dispatch reads JSONL paths") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.jsonl"),
      """{"id": 1, "name": "a"}
        |{"id": 2, "name": "b"}
        |""".stripMargin)
    val rel = Relation(spark, s"$dir/part.jsonl")
    val rows = collectSorted(rel.toDF.select("id", "name"), "id")
    assert(rows == Seq(Row(1L, "a"), Row(2L, "b")))
  }

  test("asofJoin ignores null right timestamps identically in both paths") {
    // a null-ts quote can never satisfy an as-of predicate (DuckDB/polars
    // drop it); grouped and global paths must agree on that
    val quotes = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "px" -> DoubleType),
      Row("A", null, 99.0), Row("A", 5L, 11.0)))
    val trades = Relation(frame(
      struct("sym" -> StringType, "t" -> LongType, "qty" -> LongType),
      Row("A", 3L, 1L), Row("A", 6L, 2L)))
    val grouped = collectSorted(
      trades.asofJoin(quotes, by = Seq("sym"), leftOn = "t", rightOn = "t")
        .toDF.select("t", "px"), "t")
    val global = collectSorted(
      trades.select("t", "qty")
        .asofJoin(quotes.select("t", "px"), by = Nil, leftOn = "t", rightOn = "t")
        .toDF.select("t", "px"), "t")
    assert(grouped == Seq(Row(3L, null), Row(6L, 11.0)),
      "the null-ts quote must never be a match")
    assert(global == grouped)
  }

  test("asofJoin without by keys: backward / forward / nearest over the whole timeline") {
    val quotes = Relation(frame(
      struct("t" -> LongType, "px" -> DoubleType),
      Row(1L, 10.0), Row(5L, 11.0)))
    val trades = Relation(frame(
      struct("t" -> LongType, "qty" -> LongType),
      Row(0L, 1L), Row(2L, 2L), Row(4L, 3L), Row(7L, 4L)))

    val bwd = collectSorted(
      trades.asofJoin(quotes, leftOn = "t", rightOn = "t").toDF.select("t", "px"), "t")
    assert(bwd == Seq(Row(0L, null), Row(2L, 10.0), Row(4L, 10.0), Row(7L, 11.0)))

    val fwd = collectSorted(
      trades.asofJoin(quotes, leftOn = "t", rightOn = "t", direction = "forward")
        .toDF.select("t", "px"), "t")
    assert(fwd == Seq(Row(0L, 10.0), Row(2L, 11.0), Row(4L, 11.0), Row(7L, null)))

    val near = collectSorted(
      trades.asofJoin(quotes, leftOn = "t", rightOn = "t", direction = "nearest")
        .toDF.select("t", "px"), "t")
    assert(near == Seq(Row(0L, 10.0), Row(2L, 10.0), Row(4L, 11.0), Row(7L, 11.0)))

    val tol = collectSorted(
      trades.asofJoin(quotes, leftOn = "t", rightOn = "t",
        toleranceSeconds = Some(1.0)).toDF.select("t", "px"), "t")
    assert(tol == Seq(Row(0L, null), Row(2L, 10.0), Row(4L, null), Row(7L, null)))
  }

  test("asofJoin without by keys: carry crosses range-bucket boundaries") {
    // One early quote, left rows far later: with 32 shuffle partitions the
    // quantile boundaries put most left rows in buckets holding NO right
    // row, so every match must arrive via the broadcast carry-in.
    val quotes = Relation(frame(
      struct("t" -> LongType, "px" -> DoubleType), Row(1L, 10.0)))
    val trades = Relation(frame(
      struct("t" -> LongType, "qty" -> LongType),
      (1L to 60L).map(i => Row(i * 100L, i)): _*))
    val out = trades.asofJoin(quotes, leftOn = "t", rightOn = "t").toDF
    assert(out.where("px = 10.0").count() == 60)
    // and forward across buckets: a late quote matches all earlier trades
    val lateQ = Relation(frame(
      struct("t" -> LongType, "px" -> DoubleType), Row(99999L, 42.0)))
    val f = trades.asofJoin(lateQ, leftOn = "t", rightOn = "t",
      direction = "forward").toDF
    assert(f.where("px = 42.0").count() == 60)
  }

  test("asofJoin without by keys equals the grouped path on a constant key") {
    // The grouped path (single group = one window partition) is the
    // semantic oracle; the global path must produce identical rows via
    // its bucketed plan. Deterministic pseudo-random times via hashing.
    val n = 200
    val lts = (1 to n).map(i => Row((i * 2654435761L) % 10000L, i.toLong))
    val rts = (1 to 37).map(i => Row((i * 40503L * 7919L) % 10000L, i * 1.0))
    val left  = Relation(frame(struct("t" -> LongType, "qty" -> LongType), lts: _*))
    val right = Relation(frame(struct("t" -> LongType, "px" -> DoubleType), rts: _*))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val global = left.asofJoin(right, leftOn = "t", rightOn = "t", direction = dir)
      val grouped = left.withColumns("g" -> "1")
        .asofJoin(right.withColumns("g" -> "1"), by = Seq("g"), leftOn = "t", rightOn = "t",
          direction = dir)
        .drop("g")
      assert(global.sameAs(grouped), s"direction $dir diverged from grouped oracle")
    }
  }

  test("saltedJoin equals the plain equi-join") {
    val nations = Relation(frame(
      struct("rkey" -> LongType, "n_name" -> StringType),
      Row(0L, "ALG"), Row(0L, "MOR"), Row(1L, "FRA"), Row(2L, "USA")))
    val regions = Relation(frame(
      struct("rkey" -> LongType, "r_name" -> StringType),
      Row(0L, "AFRICA"), Row(1L, "EUROPE")))
    val salted = nations.saltedJoin(regions, "rkey", salt = 4)
    val plain = nations.join(regions.rename("rkey" -> "rk2"), "rkey = rk2")
      .apply("rkey", "n_name", "r_name")
    assert(salted.apply("rkey", "n_name", "r_name").sameAs(plain))
  }

  test("asofJoin: a matched right row with a NULL value yields that null, not an older value") {
    val clicks = Relation(frame(
      struct("sym" -> StringType, "t" -> DoubleType),
      Row("A", 7.0)))
    val quotes = Relation(frame(
      struct("sym" -> StringType, "qt" -> DoubleType, "px" -> DoubleType,
        "venue" -> StringType),
      Row("A", 1.0, 10.0, "X"),
      Row("A", 5.0, null, "Y"))) // nearest match holds a null px
    val out = clicks.asofJoin(quotes, by = Seq("sym"), leftOn = "t", rightOn = "qt")
      .toDF.head()
    // px must be the t=5 row's null — NOT 10.0 from t=1 — and venue must
    // come from the SAME matched row
    assert(out.isNullAt(out.fieldIndex("px")), s"pulled stale px: $out")
    assert(out.getString(out.fieldIndex("venue")) == "Y")
  }

  test("saltedJoin rejects join kinds that would duplicate unmatched right rows") {
    val e = intercept[IllegalArgumentException](
      t1.saltedJoin(t1.rename("column_1" -> "k"), "column_2", salt = 4, how = "outer"))
    assert(e.getMessage.contains("outer"))
  }

  test("rangeJoin equals the raw range predicate, including edge exclusivity") {
    val points = Relation(frame(
      struct("pid" -> LongType, "x" -> DoubleType),
      Row(1L, 0.0), Row(2L, 4.9), Row(3L, 5.0), Row(4L, 10.0), Row(5L, 17.5)))
    val ivals = Relation(frame(
      struct("iid" -> LongType, "lo" -> DoubleType, "hi" -> DoubleType),
      Row(10L, 0.0, 5.0), Row(11L, 4.0, 10.0), Row(12L, 15.0, 15.0), // empty
      Row(13L, 9.0, 20.0)))
    val banded = points.rangeJoin(ivals, "x", "lo", "hi", bucket = 4.0)
      .apply("pid", "iid")
    val naive = points.join(ivals, "x >= lo AND x < hi").apply("pid", "iid")
    assert(banded.sameAs(naive))
    // interval ending exactly on a bucket edge must not match that edge
    assert(!banded.toDF.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((3L, 10L)))
  }

  test("pivot produces one column per value with the aggregate applied") {
    val sales = Relation(frame(
      struct("yr" -> IntegerType, "status" -> StringType, "amt" -> LongType),
      Row(2024, "O", 10L), Row(2024, "F", 20L), Row(2024, "O", 5L),
      Row(2025, "F", 7L)))
    val out = sales.pivot(Seq("yr"), "status", Seq("O", "F"), "sum(amt)")
      .order("yr").toDF
    assert(out.columns.toSeq == Seq("yr", "O", "F"))
    val rows = out.collect()
    assert(rows(0).getLong(1) == 15L && rows(0).getLong(2) == 20L)
    assert(rows(1).isNullAt(1) && rows(1).getLong(2) == 7L)
  }

  test("bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val db = new Database(spark)
    val suffix = java.lang.Long.toHexString(System.nanoTime())
    val (ta, tb) = (s"bkt_a_$suffix", s"bkt_b_$suffix")
    val data = Relation(frame(
      struct("k" -> LongType, "v" -> StringType),
      (0L until 50L).map(i => Row(i % 10, s"v$i")): _*))
    db.createBucketedTable(ta, data, Seq("k"), buckets = 4)
    db.createBucketedTable(tb, data, Seq("k"), buckets = 4)
    val joined = spark.table(ta).join(spark.table(tb), "k")
    val shuffles = joined.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"expected no exchange, got: $shuffles")
    assert(joined.count() == 250L) // 10 keys × 5 × 5
  }

  test("union reorders columns by name and errors on set mismatch") {
    val a = t1.select("column_1", "column_2")
    val b = t1.select("column_2", "column_1") // reversed order
    assert((a union b).count() == 6)
    assert((a union b).toDF.columns.toSeq == Seq("column_1", "column_2"))
    val c = t1.select("column_1")
    val e = intercept[IllegalArgumentException](a union c)
    assert(e.getMessage.contains("column_2"))
  }

  test("intersect/except dedup; distinct") {
    val dup = t1 union t1
    assert(dup.distinct().count() == 3)
    assert(dup.intersect(t1).count() == 3)
    assert((dup except t1.filter("column_1 = 1")).count() == 2)
  }

  test("order fragments, limit and offset") {
    val out = t1.order("column_1 desc").limit(2, offset = 1).toDF
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L, 1L))
  }

  test("order handles NULLS FIRST/LAST and comma-joined multi-key fragments") {
    // the reference forwards arbitrary ORDER BY fragments to the engine
    // (duckdb.py:1368-1438) — "x DESC NULLS LAST, y" must parse per key
    val r = Relation(frame(
      struct("x" -> LongType, "y" -> StringType),
      Row(null, "a"), Row(2L, "b"), Row(2L, "a"), Row(1L, "c")))
    def xs(rel: Relation): Seq[Any] =
      rel.toDF.collect().map(row => if (row.isNullAt(0)) null else row.getLong(0)).toSeq
    // default desc puts nulls last in Spark; NULLS FIRST must override
    assert(xs(r.order("x DESC NULLS FIRST")) == Seq(null, 2L, 2L, 1L))
    assert(xs(r.order("x ASC NULLS LAST")) == Seq(1L, 2L, 2L, null))
    // multi-key in ONE fragment, mixed directions + nulls placement
    val multi = r.order("x desc nulls last, y asc").toDF
      .collect().map(row => (if (row.isNullAt(0)) null else row.getLong(0), row.getString(1))).toSeq
    assert(multi == Seq((2L, "a"), (2L, "b"), (1L, "c"), (null, "a")))
    // top-level comma split must not break function-call commas
    assert(xs(r.order("coalesce(x, 99), y")) == Seq(1L, 2L, 2L, null))
  }

  test("get arity errors and getEq") {
    assert(t1.get("column_1 = 2") == Row(2L, "b"))
    intercept[RowDoesNotExist](t1.get("column_1 = 99"))
    intercept[MultipleRowsReturned](t1.get())
    assert(t1.getEq("column_2" -> "c") == Row(3L, "c"))
  }

  test("toSeries demands single column; iterator streams rows") {
    assert(t1.apply("column_1").toSeries().toSet == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException](t1.toSeries())
    assert(t1.iterator.size == 3)
  }

  test("sameAs is order-insensitive multiset equality") {
    assert(t1.order("column_1 desc").sameAs(t1))
    assert(!(t1 union t1).sameAs(t1))
  }

  test("model drops on schema change, survives filter/order/limit") {
    val m = Schema("T", Seq(FieldSpec.long("column_1"), FieldSpec.string("column_2")))
    val r = t1.setModel(m)
    assert(r.filter("column_1 > 0").model.isDefined)
    assert(r.order("column_1").limit(2).model.isDefined)
    assert(r.select("column_1").model.isEmpty)
    assert(r.rename("column_1" -> "c").model.isEmpty)
  }

  test("createTable + insertInto with column reordering (F6 insert_into)") {
    val db = new Database(spark)
    spark.sql("DROP TABLE IF EXISTS graft_ins")
    db.createTable("graft_ins",
      Schema("I", Seq(FieldSpec.long("a", nullable = true),
        FieldSpec.string("b", nullable = true))))
    assert(db.contains("graft_ins"))
    // reversed column order must be reordered to match the target
    Relation(frame(struct("b" -> StringType, "a" -> LongType), Row("x", 1L)))
      .insertInto("graft_ins")
    assert(collectSorted(db.table("graft_ins").toDF, "a") == Seq(Row(1L, "x")))
    val e = intercept[IllegalArgumentException](
      Relation(frame(struct("b" -> StringType), Row("y"))).insertInto("graft_ins"))
    assert(e.getMessage.contains("missing column"))
    spark.sql("DROP TABLE IF EXISTS graft_ins")
  }

  test("createView + Database.query + execute + emptyRelation + enum names") {
    val db = new Database(spark)
    t1.createView("graft_v")
    assert(db.view("graft_v").count() == 3)
    assert(db.query("SELECT count(*) AS n FROM graft_v").toDF.head().getLong(0) == 3L)
    db.execute("SELECT 1")
    val m = Schema("E", Seq(
      FieldSpec.long("x"), FieldSpec.enum("e", Seq("a", "b"), nullable = true)))
    assert(db.emptyRelation(m).count() == 0)
    db.createEnumTypes(m)
    assert(db.enumTypeNames.exists(_.startsWith("enum__")))
    // Database.default() binds the active session; toRelation dispatches SQL
    assert(Database.default().spark eq spark)
    assert(db.toRelation("SELECT 2 AS two").toDF.head().getInt(0) == 2)
  }

  test("toString renders tree + columns; str() adds the executed preview") {
    val r = Relation(frame(
      struct("product_name" -> StringType, "supplier_id" -> LongType),
      Row("apple", 2L), Row("banana", 1L))).setAlias("products")
    val s = r.toString
    assert(s.contains("--- Relation Tree ---"))
    assert(s.contains("-- Result Columns  --"))
    assert(s.contains("- product_name (STRING)"))
    assert(s.contains("- supplier_id (BIGINT)"))
    assert(s.contains("alias: products"))
    val full = r.str()
    assert(full.contains("-- Result Preview  --"))
    assert(full.contains("[ Rows: 2]"))
    assert(full.contains("apple\t2"))
    // a transform shows up as a node in the tree
    assert(Relation(r.toDF.where(
      org.apache.spark.sql.functions.col("supplier_id") > 1L)).toString
      .toLowerCase.contains("filter"))
  }

  test("model-bound get/iterator return model-shaped rows") {
    // mirrors Relation.get returning a Model instance when set_model was
    // called (duckdb.py:1003-1010): model field order, declared defaults
    // for missing columns, nulls for missing nullable ones, extras dropped
    val m = Schema("P", Seq(
      FieldSpec.long("product_id"),
      FieldSpec.double("price", nullable = true),
      FieldSpec.string("status").copy(default = Some("active")),
      FieldSpec.string("note", nullable = true)))
    val r = Relation(frame(
      struct("price" -> DoubleType, "junk" -> StringType, "product_id" -> LongType),
      Row(10.0, "x", 1L), Row(20.0, "y", 2L))).setModel(m)
    val row = r.get("product_id = 1")
    assert(row.schema.fieldNames.toSeq == Seq("product_id", "price", "status", "note"))
    assert(row.toSeq == Seq(1L, 10.0, "active", null))
    val it = r.iterator.toSeq.sortBy(_.getLong(0))
    assert(it.map(_.toSeq) == Seq(
      Seq(1L, 10.0, "active", null), Seq(2L, 20.0, "active", null)))
    // model survives the filter inside getEq
    assert(r.getEq("product_id" -> 2L).toSeq == Seq(2L, 20.0, "active", null))
    // without a model the raw row comes back untouched
    val raw = Relation(frame(struct("a" -> LongType), Row(7L))).get("a = 7")
    assert(raw.schema.fieldNames.toSeq == Seq("a") && raw.getLong(0) == 7L)
  }

  test("model-bound get/iterator coerce values to the declared field types") {
    // mirrors pydantic's model(**kwargs) coercion inside _to_model
    // (duckdb.py:1055-1073): an UNCAST relation (int where the model says
    // long, int where it says double) must still hand back model-typed
    // values, not leak the physical types
    val m = Schema("C", Seq(
      FieldSpec.long("id"),
      FieldSpec.double("price"),
      FieldSpec.string("label", nullable = true)))
    val r = Relation(frame(
      struct("id" -> IntegerType, "price" -> IntegerType, "label" -> LongType),
      Row(1, 10, 7L), Row(2, 20, null))).setModel(m)
    val row = r.get("id = 1")
    assert(row.toSeq == Seq(1L, 10.0, "7"))
    assert(row.get(0).isInstanceOf[Long] && row.get(1).isInstanceOf[Double])
    val it = r.iterator.toSeq.sortBy(_.getLong(0))
    assert(it.map(_.toSeq) == Seq(Seq(1L, 10.0, "7"), Seq(2L, 20.0, null)))
  }

  test("Database.execute runs a prepared statement once per parameter set") {
    // mirrors the reference doctest (duckdb.py:2540-2553) and
    // tests/test_duckdb/test_database.py:263 via INSERT ... VALUES
    val db = new Database(spark)
    spark.sql("DROP TABLE IF EXISTS graft_exec")
    db.execute("CREATE TABLE graft_exec (a bigint, b bigint, c bigint) USING parquet")
    db.execute("INSERT INTO graft_exec VALUES (?, ?, ?)", Seq(2L, 3L, 4L))
    assert(collectSorted(db.table("graft_exec").toDF, "a") == Seq(Row(2L, 3L, 4L)))
    // multiple parameter sets: one execution per set, in order
    db.execute("INSERT INTO graft_exec VALUES (?, ?, ?)",
      Seq(5L, 6L, 7L), Seq(8L, 9L, 10L))
    assert(collectSorted(db.table("graft_exec").toDF, "a") ==
      Seq(Row(2L, 3L, 4L), Row(5L, 6L, 7L), Row(8L, 9L, 10L)))
    // a SELECT with one param set binds positionally too (parquet tables
    // don't take DELETE in Spark, so the read path stands in for it)
    assert(spark.sql("SELECT count(*) FROM graft_exec WHERE a = ?",
      Array(8L)).head().getLong(0) == 1L)
    spark.sql("DROP TABLE IF EXISTS graft_exec")
  }

  test("cast to model via relation (F6 cast)") {
    val m = Schema("C", Seq(FieldSpec.long("column_1"), FieldSpec.string("column_2")))
    val narrow = Relation(frame(struct("column_1" -> IntegerType, "column_2" -> StringType),
      Row(1, "a")))
    assert(narrow.cast(m).toDF.schema("column_1").dataType == IntegerType) // valid family
    assert(narrow.cast(m, strict = true).toDF.schema("column_1").dataType == LongType)
  }

  test("validate() on bound model raises on violation") {
    val m = Schema("V", Seq(FieldSpec.long("column_1"),
      FieldSpec.enum("column_2", Seq("a", "b"))))
    val e = intercept[ValidationError](t1.setModel(m).validate())
    assert(e.errors.exists(_.msg.contains("'c'")))
    intercept[IllegalStateException](t1.validate())
  }

  test("profile: one row per column with exact counts, nulls, distinct, min/max") {
    val r = Relation(frame(
      struct("k" -> LongType, "s" -> StringType),
      Row(1L, "b"), Row(2L, "a"), Row(2L, null), Row(3L, "a")))
    val rows = r.profile(approx = false).order("column").toDF.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getString(4), x.getString(5)))
    assert(rows.toSeq == Seq(
      ("k", 4L, 0L, 3L, "1", "3"),
      ("s", 3L, 1L, 2L, "a", "b")))
    // column count widens the aggregate, never the scan count
    val plan = r.profile(approx = false).toDF.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"profile must be one pass, not per-column:\n$plan")
    // the scale default is approximate: HLL sketches instead of exact
    // per-column distinct state (plan shows the approx aggregate)
    val approxPlan = r.profile().toDF.queryExecution.executedPlan.toString
    assert(approxPlan.contains("approx_count_distinct"), approxPlan)
    assert(!approxPlan.contains("Union"))
    // at this cardinality the sketch answer happens to be exact too
    val approxRows = r.profile().order("column").toDF.collect()
      .map(x => (x.getString(0), x.getLong(3)))
    assert(approxRows.toSeq == Seq(("k", 3L), ("s", 2L)))
  }

  test("profile: hostile column names and map columns are safe") {
    // names with spaces, quotes, commas, dots, backticks — none may reach
    // a SQL parser
    val odd = frame(
      struct("a b" -> LongType, "it's, tricky" -> StringType, "a.b" -> LongType),
      Row(1L, "x", 5L), Row(2L, "x", 5L))
    val rows = Relation(odd).profile(approx = false).toDF.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(3))).toSet
    assert(rows == Set(("a b", 2L, 2L), ("it's, tricky", 2L, 1L), ("a.b", 2L, 1L)))
    // map columns: distinct over the JSON rendering, min/max null
    val m = frame(
      struct("id" -> LongType, "tags" -> MapType(StringType, LongType)),
      Row(1L, Map("x" -> 1L)), Row(2L, Map("x" -> 1L)), Row(3L, null))
    val prof = Relation(m).profile(approx = false).order("column").toDF.collect()
    val tags = prof.find(_.getString(0) == "tags").get
    assert(tags.getLong(1) == 2L && tags.getLong(2) == 1L && tags.getLong(3) == 1L
      && tags.isNullAt(4) && tags.isNullAt(5))
    // entry order must not split distincts: {x:1,y:2} == {y:2,x:1}
    val reordered = frame(
      struct("id" -> LongType, "tags" -> MapType(StringType, LongType)),
      Row(1L, Map("x" -> 1L, "y" -> 2L)), Row(2L, Map("y" -> 2L, "x" -> 1L)))
    val rprof = Relation(reordered).profile(approx = false).toDF.collect()
    assert(rprof.find(_.getString(0) == "tags").get.getLong(3) == 1L)
  }

  test("profile: percentiles add per-numeric quantile sketches in the same scan") {
    val r = Relation(frame(
      struct("k" -> LongType, "s" -> StringType),
      (1L to 100L).map(i => Row(i, s"v$i")): _*))
    val rows = r.profile(percentiles = Seq(0.5, 0.95)).order("column").toDF.collect()
    val k = rows.find(_.getString(0) == "k").get
    val q = k.getSeq[Double](6)
    // percentile_approx with accuracy 10000 is exact at n=100
    assert(q == Seq(50.0, 95.0), q.toString)
    // non-numeric columns carry a null quantiles entry, not a failure
    assert(rows.find(_.getString(0) == "s").get.isNullAt(6))
    // still ONE scan: no union of per-column jobs
    val plan =
      r.profile(percentiles = Seq(0.5)).toDF.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
    // default keeps the historical 6-column schema (q91 oracle unchanged)
    assert(r.profile().toDF.schema.fieldNames.toSeq ==
      Seq("column", "n", "n_null", "n_distinct", "min_str", "max_str"))
    intercept[IllegalArgumentException](r.profile(percentiles = Seq(1.5)))
  }
}
