package graft.relation

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core._
import graft.sql.CaseBuilder

/** Lazy fluent relational surface — the Spark-native counterpart of the
  * reference's `patito.duckdb.Relation` (src/patito/duckdb.py:140). Every
  * builder returns a new Relation wrapping a transformed (still-lazy)
  * DataFrame; Catalyst owns optimization exactly as DuckDB owned it in the
  * reference. String expressions go through `expr`/`selectExpr`, which covers
  * the reference's whole SQL-fragment surface (SURVEY §2 "SQL-string
  * passthrough").
  *
  * Model propagation follows the reference's `_wrap(schema_change=...)` rule
  * (duckdb.py:2332-2349): schema-preserving ops (filter/order/limit/union/
  * distinct/intersect/except) keep the bound model; schema-changing ops
  * (select/aggregate/rename/drop/case/coalesce/cast/joins) drop it.
  */
final case class Relation(
    df: DataFrame,
    model: Option[Schema] = None,
    alias: Option[String] = None) {

  private def spark: SparkSession = df.sparkSession
  private def keep(d: DataFrame): Relation = copy(df = d)
  private def changed(d: DataFrame): Relation = Relation(d, None, alias)

  def columns: Seq[String] = df.columns.toSeq
  def types: Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.sql).toMap

  // ---- projections (duckdb.py:1528-1611) --------------------------------

  /** SQL projection with the reference's star-expansion-and-overwrite rule
    * (duckdb.py:1578-1591): `"*"` expands to the current column list, and a
    * named projection whose name collides with a star-expanded column
    * REPLACES it in place rather than appearing twice.
    */
  def select(exprs: String*): Relation = select(exprs, Nil)

  def select(exprs: Seq[String], named: Seq[(String, String)]): Relation = {
    val expanded: Seq[(Option[String], String)] =
      exprs.flatMap {
        case "*" => df.columns.toSeq.map(c => (Some(c), quoteIdent(c)))
        case e   => Seq((None, e))
      } ++ named.map { case (n, e) => (Some(n), s"$e AS ${quoteIdent(n)}") }
    // overwrite: later named entries replace earlier entries with same name
    val out = expanded.foldLeft(Vector.empty[(Option[String], String)]) {
      case (acc, item @ (Some(n), _)) =>
        val i = acc.indexWhere(_._1.contains(n))
        if (i >= 0) acc.updated(i, item) else acc :+ item
      case (acc, item) => acc :+ item
    }
    changed(df.selectExpr(out.map(_._2): _*))
  }

  def selectNamed(named: (String, String)*): Relation = select(Seq("*"), named)

  /** `rel("a")` / column-subset access (duckdb.py:2138-2189). */
  def apply(cols: String*): Relation = changed(df.select(cols.map(col): _*))

  /** Append/overwrite computed columns — `select("*", ...)` sugar
    * (duckdb.py:1911-1943).
    */
  def withColumns(named: (String, String)*): Relation = select(Seq("*"), named)

  /** Projection-based rename: errors on missing sources, silently overwrites
    * an existing target (duckdb.py:1613-1654).
    */
  def rename(mapping: (String, String)*): Relation = {
    val m = mapping.toMap
    val missing = m.keys.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Column${if (missing.size == 1) "" else "s"} ${missing.mkString(", ")} " +
        "can not be renamed as they do not exist")
    val targets = m.values.toSet
    val kept = df.columns.filterNot(c => targets.contains(c) && !m.contains(c))
    changed(df.select(kept.map(c => col(c).as(m.getOrElse(c, c))): _*))
  }

  /** Rename-all via projection, with include/exclude subsets
    * (duckdb.py:331-461).
    */
  def addPrefix(p: String, include: Seq[String] = Nil, exclude: Seq[String] = Nil): Relation =
    mapNames(n => p + n, include, exclude)
  def addSuffix(s: String, include: Seq[String] = Nil, exclude: Seq[String] = Nil): Relation =
    mapNames(n => n + s, include, exclude)

  private def mapNames(f: String => String, include: Seq[String], exclude: Seq[String]): Relation = {
    require(include.isEmpty || exclude.isEmpty,
      "Only one of include and exclude can be provided")
    val targeted: String => Boolean =
      if (include.nonEmpty) include.contains
      else if (exclude.nonEmpty) c => !exclude.contains(c)
      else _ => true
    changed(df.select(df.columns.map(c =>
      if (targeted(c)) col(c).as(f(c)) else col(c)): _*))
  }

  /** Drop with missing-column error (duckdb.py:834-854). */
  def drop(cols: String*): Relation = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Columns ${missing.mkString(", ")} do not exist")
    changed(df.drop(cols: _*))
  }

  /** Literal-map CASE appended as a new column (duckdb.py:499-570). */
  def caseColumn(
      fromColumn: String,
      toColumn: String,
      mapping: Seq[(Any, Any)],
      default: Any = null): Relation =
    changed(df.withColumn(toColumn,
      CaseBuilder.caseWhen(col(fromColumn), mapping, default)))

  /** Per-column null replacement (duckdb.py:675-726). */
  def coalesceColumns(replacements: (String, Any)*): Relation = {
    val m = replacements.toMap
    changed(df.select(df.columns.map { c =>
      m.get(c).fold(col(c))(v => coalesce(col(c), lit(v)).as(c))
    }: _*))
  }

  /** Cast columns to a model's types; `strict = false` skips columns whose
    * type is already in the valid set (duckdb.py:572-673). Non-model columns
    * are untouched.
    */
  def cast(
      schema: Schema,
      strict: Boolean = false,
      include: Seq[String] = Nil,
      exclude: Seq[String] = Nil): Relation = {
    require(include.isEmpty || exclude.isEmpty,
      "Only one of include and exclude can be provided")
    val targeted: String => Boolean =
      if (include.nonEmpty) include.contains
      else if (exclude.nonEmpty) c => !exclude.contains(c)
      else _ => true
    val out = df.columns.foldLeft(df) { (d, c) =>
      if (!schema.contains(c) || !targeted(c)) d
      else {
        val f = schema(c)
        val cur = d.schema(c).dataType
        val skip = if (strict) cur == f.dataType else f.validTypes.contains(cur)
        if (skip) d else d.withColumn(c, col(c).cast(f.dataType))
      }
    }
    Relation(out, model, alias)
  }

  // ---- filters (duckdb.py:1076-1134) ------------------------------------

  /** WHERE with positional SQL fragments AND-ed (parenthesized). */
  def filter(filters: String*): Relation =
    keep(filters.foldLeft(df)((d, f) => d.where(expr(s"($f)"))))

  def filter(c: Column): Relation = keep(df.where(c))

  /** kwargs-style equality filters (`col = value`). */
  def filterEq(equalities: (String, Any)*): Relation =
    keep(equalities.foldLeft(df) { case (d, (c, v)) => d.where(col(c) === lit(v)) })

  /** Do ALL rows satisfy the predicates? (duckdb.py:463-497) — implemented as
    * "no counterexample exists": one early-terminating job instead of the
    * reference's two full counts. A null predicate result counts as a
    * violation (not strictly true).
    */
  def all(filters: String*): Boolean =
    df.where(!filters.map(f => coalesce(expr(s"($f)"), lit(false))).reduce(_ && _))
      .isEmpty

  // ---- aggregation (duckdb.py:277-329) ----------------------------------

  /** GROUP BY with raw SQL aggregate fragments; empty groupBy = global
    * aggregate. Named aggregates project as `expr AS name`. Spark performs
    * partial (map-side) aggregation automatically — one shuffle on the keys.
    */
  def aggregate(
      exprs: Seq[String],
      groupBy: Seq[String] = Nil,
      named: Seq[(String, String)] = Nil): Relation = {
    val aggExprs = exprs ++ named.map { case (n, e) => s"$e AS ${quoteIdent(n)}" }
    val d =
      if (groupBy.isEmpty) df.selectExpr(aggExprs: _*)
      else {
        val aggs = aggExprs.map(expr)
        df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    changed(d)
  }

  def aggregate(expr1: String, groupBy: String): Relation =
    aggregate(Seq(expr1), Seq(groupBy))

  /** Pivot: one output column per value in `values`, each holding
    * `aggExpr` over the matching rows. `values` is REQUIRED (not inferred):
    * inferring distinct pivot values costs an extra full-scan job before
    * the real aggregation — at 100 TB that is a second pass over the
    * corpus for metadata the caller usually knows. One shuffle on the
    * group keys either way.
    */
  def pivot(
      groupBy: Seq[String],
      pivotCol: String,
      values: Seq[Any],
      aggExpr: String): Relation =
    changed(df.groupBy(groupBy.map(col): _*)
      .pivot(pivotCol, values)
      .agg(expr(aggExpr)))

  def count(): Long = df.count()

  /** Per-column profile — the `describe()` analogue, built the same
    * one-scan way as the Validator: ONE aggregate pass computes every
    * column's non-null count, null count, distinct count, and min/max
    * (rendered as strings so the long-format frame has one schema), then
    * a struct-array explode unpivots to one row per column. Column count
    * changes the aggregate width, never the scan count — profiling a
    * 500-column table is still one job.
    *
    * `approx = true` (the default) counts distincts with
    * `approx_count_distinct` (HyperLogLog++): exact per-column distinct
    * state is the heaviest possible aggregate on a wide high-cardinality
    * table — at 100 TB it is an executor-memory hazard, while HLL state
    * is a few KB per column at ~2% error. Pass `approx = false` when the
    * exact count matters (small tables, oracle comparisons — q91 pins
    * this mode).
    *
    * Column names never reach a SQL parser: the frame is positionally
    * renamed first and labels are literal expressions, so names with
    * spaces, quotes, commas or dots profile safely. Map-typed columns
    * (not comparable) count distincts over a CANONICALIZED JSON rendering
    * — entries sorted by key first, since Spark's JSON keeps the map's
    * internal entry order and would otherwise count semantically equal
    * maps built in different orders as distinct — and leave min/max null.
    *
    * `percentiles` (e.g. `Seq(0.5, 0.95)`) adds a `quantiles` column with
    * `percentile_approx` sketches per NUMERIC column (null elsewhere) —
    * still the same single scan; sketch state is KBs per column, so the
    * audit stays scale-safe. The default (empty) leaves the output schema
    * exactly as before.
    */
  def profile(
      approx: Boolean = true,
      percentiles: Seq[Double] = Nil): Relation = {
    import org.apache.spark.sql.{functions => F}
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column relation")
    require(percentiles.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got ${percentiles.mkString(", ")}")
    val tmp = df.toDF(fields.indices.map(i => s"__c$i"): _*)
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val isMap = f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
      val isNum = f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      val c =
        if (isMap)
          F.to_json(F.map_from_entries(F.array_sort(F.map_entries(col(s"__c$i")))))
        else col(s"__c$i")
      val nd = if (approx) F.approx_count_distinct(c, rsd = 0.02) else F.count_distinct(c)
      Seq(
        F.count(c).cast("bigint").as(s"__n_$i"),
        (F.count(lit(1)) - F.count(c)).cast("bigint").as(s"__nn_$i"),
        nd.cast("bigint").as(s"__nd_$i"),
        (if (isMap) lit(null).cast("string") else F.min(c).cast("string")).as(s"__mn_$i"),
        (if (isMap) lit(null).cast("string") else F.max(c).cast("string")).as(s"__mx_$i")) ++
        (if (percentiles.isEmpty) Seq.empty
         else Seq(
           (if (isNum)
              F.percentile_approx(col(s"__c$i").cast("double"),
                F.typedlit(percentiles), lit(10000))
            else lit(null).cast("array<double>")).as(s"__q_$i")))
    }
    val one = tmp.agg(aggs.head, aggs.tail: _*)
    val entries = fields.zipWithIndex.map { case (f, i) =>
      F.struct(Seq(
        lit(f.name).as("column"),
        col(s"__n_$i").as("n"),
        col(s"__nn_$i").as("n_null"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_str"),
        col(s"__mx_$i").as("max_str")) ++
        (if (percentiles.isEmpty) Seq.empty
         else Seq(col(s"__q_$i").as("quantiles"))): _*)
    }
    changed(one.select(F.explode(F.array(entries: _*)).as("p")).select("p.*"))
  }

  // ---- joins (duckdb.py:1136-1321 + pydantic.py:1044-1116) --------------

  /** Theta join with a raw SQL condition, all seven schema-level kinds
    * executed (the reference only executes inner/left; SURVEY §2.3).
    */
  def join(other: Relation, on: String, how: String = "inner"): Relation =
    join(other, expr(on), JoinKind.fromString(how))

  def join(other: Relation, on: Column, how: JoinKind): Relation = {
    val l = alias.fold(df)(df.as(_))
    val r = other.alias.fold(other.df)(other.df.as(_))
    val joined = how match {
      case JoinKind.Cross => l.crossJoin(r)
      case JoinKind.AsOf =>
        throw new IllegalArgumentException(
          "use asofJoin(other, by, leftOn, rightOn) for as-of joins")
      case k => l.join(r, on, k.sparkName)
    }
    val m = for { lm <- model; rm <- other.model } yield lm.join(rm, how)
    Relation(joined, m, None)
  }

  def innerJoin(other: Relation, on: String): Relation = join(other, on, "inner")
  def leftJoin(other: Relation, on: String): Relation  = join(other, on, "left")
  def outerJoin(other: Relation, on: String): Relation = join(other, on, "outer")
  def semiJoin(other: Relation, on: String): Relation  = join(other, on, "semi")
  def antiJoin(other: Relation, on: String): Relation  = join(other, on, "anti")
  def crossJoin(other: Relation): Relation = join(other, lit(true), JoinKind.Cross)

  /** As-of join: for each left row, match the nearest right row in time
    * within the same `by` group. Directions (polars/pandas semantics, all
    * inclusive):
    *   - `"backward"` (default): most recent right with `rightOn <= leftOn`;
    *   - `"forward"`: earliest right with `rightOn >= leftOn`;
    *   - `"nearest"`: whichever of the two is closer (ties → backward).
    * `toleranceSeconds` drops matches farther than the given distance
    * (measured on the ON column cast to double — epoch seconds for
    * timestamps, the raw value for numerics).
    *
    * Declared-but-unexecuted in the reference (`Model.join(how="asof")`,
    * pydantic.py:1048); here it executes via the scale-safe union+window
    * plan: tag both sides, ONE shuffle on the `by` keys, running
    * `last`/`first(_, ignoreNulls)` fills, keep left rows. No
    * row-multiplying range join, no single-partition window (SURVEY §7
    * hard-part 6).
    *
    * `by = Nil` (the ungrouped asof a time-series user reaches for first —
    * polars/pandas `join_asof` without `by`) keeps the same plan shape by
    * manufacturing the partition key: rows are range-bucketed on `__t`
    * (approx-quantile boundaries injected as plan literals), the fills run
    * per bucket, and each bucket's edge is resolved by a broadcast
    * carry-in of the neighbouring buckets' first/last right rows — one
    * full-data shuffle, never a single-partition window.
    */
  def asofJoin(
      other: Relation,
      by: Seq[String] = Nil,
      leftOn: String,
      rightOn: String,
      direction: String = "backward",
      toleranceSeconds: Option[Double] = None): Relation = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown asof direction: $direction")
    val rightVals = other.df.columns.filterNot(c => by.contains(c) || c == rightOn)
    val leftOnly  = df.columns.filterNot(by.contains)
    val rSchema   = other.df.schema
    val collide = leftOnly.toSet & rightVals.toSet
    require(collide.isEmpty,
      s"asofJoin: column names collide between the sides: ${collide.mkString(", ")}")

    // All right-side value columns travel as ONE struct: a matched right
    // row's struct is non-null even when its individual fields are null,
    // so the ignoreNulls window fill skips only genuinely-unmatched rows
    // and every output column comes from the SAME matched row (per-column
    // fills would pull a field from an older row whenever the nearest
    // match holds a null in that field).
    val rvStruct = struct(rightVals.map(col): _*)
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => rSchema(c).copy(nullable = true)))

    // Side tags order right rows BEFORE left at equal __t, so a same-time
    // right row is inside the backward window AND (with side desc) the
    // forward window of the left row — both directions stay inclusive.
    val lSide = df.select(
      by.map(col) ++ Seq(col(leftOn).cast(rSchema(rightOn).dataType).as("__t"), lit(1).as("__side")) ++
        leftOnly.map(col) ++
        Seq(lit(null).cast(rvType).as("__rv")): _*)
    // A null right timestamp can never satisfy an as-of predicate (DuckDB
    // ASOF and polars join_asof both ignore such rows); filtering here
    // keeps the grouped and global paths consistent — unfiltered, the
    // grouped window's nulls-first sort would fill from a null-ts row
    // while the global path's min_by/max_by carry would skip it.
    val rSide = other.df.where(col(rightOn).isNotNull).select(
      by.map(col) ++ Seq(col(rightOn).as("__t"), lit(0).as("__side")) ++
        leftOnly.map(c => lit(null).cast(df.schema(c).dataType).as(c)) ++
        Seq(rvStruct.as("__rv")): _*)
    val union = lSide.unionByName(rSide)

    val filled =
      if (by.isEmpty) globalAsofFill(union, leftOnly, rvType)
      else {
        val wB = Window.partitionBy(by.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = Window.partitionBy(by.map(col): _*)
          .orderBy(col("__t").asc, col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)

        def bwd(c: Column): Column = last(when(col("__side") === 0, c), ignoreNulls = true).over(wB)
        def fwd(c: Column): Column = first(when(col("__side") === 0, c), ignoreNulls = true).over(wF)

        // matched right timestamp per direction (for nearest choice + tolerance)
        val bT = bwd(col("__t")).as("__bT")
        val fT = fwd(col("__t")).as("__fT")
        val fillCols = Seq(bwd(col("__rv")).as("__b_rv"), fwd(col("__rv")).as("__f_rv"))
        union
          .select((by ++ leftOnly).map(col) ++ Seq(col("__t"), col("__side"), bT, fT) ++ fillCols: _*)
          .where(col("__side") === 1)
      }

    val tType = rSchema(rightOn).dataType
    val t = timeAsDouble(col("__t"), tType)
    val distB = t - timeAsDouble(col("__bT"), tType)
    val distF = timeAsDouble(col("__fT"), tType) - t
    val useBackward: Column = direction match {
      case "backward" => lit(true)
      case "forward"  => lit(false)
      case "nearest"  =>
        col("__fT").isNull || (col("__bT").isNotNull && distB <= distF)
    }
    val withinTol: Column = toleranceSeconds match {
      case None      => lit(true)
      case Some(tol) => when(useBackward, distB <= tol).otherwise(distF <= tol)
    }
    val matched = when(useBackward, col("__bT").isNotNull)
      .otherwise(col("__fT").isNotNull) && withinTol

    val out = filled.select(
      (by ++ leftOnly).map(col) ++
        rightVals.map(c => when(matched,
          when(useBackward, col("__b_rv")).otherwise(col("__f_rv")).getField(c)).as(c)): _*)
    val ordered = df.columns ++ rightVals
    Relation(out.select(ordered.map(col): _*), None, None)
  }

  /** Time column as a double distance measure: epoch seconds for
    * timestamps (ntz routed through a session-tz timestamp cast, which
    * Spark forbids casting to double directly), the raw value for
    * numerics. Monotone, so it is also safe as the range-bucket key.
    */
  private def timeAsDouble(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        c.cast(org.apache.spark.sql.types.TimestampType).cast("double")
      case _ => c.cast("double")
    }

  /** Fill stage of the ungrouped as-of join — same output shape as the
    * grouped window fill (`__bT`/`__fT`/`__b_rv`/`__f_rv` on side=1 rows)
    * without a grouping key and without a single-partition window.
    *
    * Plan: approx-quantile boundaries over `__t` (one column-pruned sample
    * job; the boundaries become plan literals) split the timeline into
    * ~`spark.sql.shuffle.partitions` range buckets, and the running fills
    * run per bucket — ONE full-data shuffle, same shape as the grouped
    * path. A bucket's edge rows may need the previous bucket's last right
    * row (backward) or the next bucket's first right row (forward), so a
    * tiny per-bucket aggregate (≤ one row per bucket, collected to the
    * driver — bounded by the bucket count, not the data) computes carry-in
    * structs that are broadcast-joined back and coalesced under the fill.
    * The matched row travels as ONE `(t, rv)` struct through fill, carry,
    * and coalesce, so `__bT` and `__b_rv` always come from the same row.
    * Tie ordering matches the grouped path (right before left at equal
    * `__t` via `__side`).
    */
  private def globalAsofFill(
      union: DataFrame,
      leftOnly: Seq[String],
      rvType: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import scala.jdk.CollectionConverters._

    val tType = union.schema("__t").dataType
    val buckets = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val bounds =
      if (buckets == 1) Array.empty[Double]
      else union.select(timeAsDouble(col("__t"), tType).as("__td"))
        .stat.approxQuantile(
          "__td", (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    val td = timeAsDouble(col("__t"), tType)
    val pid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(td >= lit(b), 1).otherwise(0)
    }
    val bucketed = union.withColumn("__pid", pid)

    val m = struct(col("__t").as("t"), col("__rv").as("rv"))
    val mType = StructType(Seq(
      StructField("t", tType, nullable = true),
      StructField("rv", rvType, nullable = true)))

    // Per-bucket first/last right rows → carry-in for the neighbours.
    // Buckets with no right rows pass the carry through unchanged.
    val perBucket = bucketed.where(col("__side") === 0)
      .groupBy(col("__pid"))
      .agg(min_by(m, col("__t")).as("__first"), max_by(m, col("__t")).as("__last"))
      .collect()
      .map(r => r.getInt(0) -> (r.getStruct(1), r.getStruct(2)))
      .toMap
    val nBuckets = bounds.length + 1
    val nextFirst = new Array[Row](nBuckets)
    var follow: Row = null
    for (k <- (nBuckets - 1) to 0 by -1) {
      nextFirst(k) = follow
      perBucket.get(k).foreach { case (firstR, _) => if (firstR != null) follow = firstR }
    }
    var prevLast: Row = null
    val carryRows: Seq[Row] = (0 until nBuckets).map { k =>
      val row = Row(k, prevLast, nextFirst(k))
      perBucket.get(k).foreach { case (_, lastR) => if (lastR != null) prevLast = lastR }
      row
    }
    val carrySchema = StructType(Seq(
      StructField("__pid", IntegerType, nullable = false),
      StructField("__carry_b", mType, nullable = true),
      StructField("__carry_f", mType, nullable = true)))
    val carryDf = spark.createDataFrame(carryRows.asJava, carrySchema)

    val wB = Window.partitionBy(col("__pid"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__pid"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val bS = coalesce(
      last(when(col("__side") === 0, m), ignoreNulls = true).over(wB), col("__carry_b"))
    val fS = coalesce(
      first(when(col("__side") === 0, m), ignoreNulls = true).over(wF), col("__carry_f"))

    bucketed.join(broadcast(carryDf), Seq("__pid"), "left")
      .select(leftOnly.map(col) ++ Seq(
        col("__t"), col("__side"),
        bS.getField("t").as("__bT"), fS.getField("t").as("__fT"),
        bS.getField("rv").as("__b_rv"), fS.getField("rv").as("__f_rv")): _*)
      .where(col("__side") === 1)
  }

  /** Skew-safe equi-join on one key: left rows scatter deterministically
    * across `salt` sub-keys (hash of the whole row) and the right side
    * replicates `salt` times, so one hot key spreads over `salt` reducers.
    * Result is identical to `join(other, key)` for the supported kinds
    * (inner/left/semi/anti — kinds that preserve unmatched RIGHT rows
    * would emit each of them once per salt replica, so they are rejected);
    * use when a key is too hot even for AQE's skew-join splitting (which
    * only splits the probe side).
    */
  def saltedJoin(other: Relation, key: String, salt: Int, how: String = "inner"): Relation = {
    require(salt > 1, "salt must be > 1")
    require(Seq("inner", "left", "semi", "anti").contains(how),
      s"saltedJoin supports inner/left/semi/anti, not '$how' — an outer/right " +
        "join would duplicate unmatched right rows once per salt replica")
    val l = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val r = other.df.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    changed(l.join(r, Seq(key, "__salt"), how).drop("__salt"))
  }

  /** Banded interval (range) join: rows of this relation whose `pointCol`
    * value falls in [`startCol`, `endCol`) of `other`.
    *
    * A raw range predicate has no equi-key, so Catalyst can only pick a
    * nested-loop join — O(|left|·|right|) comparisons, which is the classic
    * 100 TB trap. This plan derives an equi-key instead: each interval
    * explodes to the width-`bucket` buckets it covers, each point maps to
    * its one bucket, and the join is a plain HASH join on the bucket id
    * with the exact range predicate as a post-filter. Interval replication
    * is `ceil(span / bucket)` rows — pick `bucket` near the typical span.
    * Overlapping intervals multiply matches, exactly like the raw
    * predicate would.
    */
  def rangeJoin(
      other: Relation,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucket: Double): Relation = {
    require(bucket > 0, "bucket width must be positive")
    val overlap = df.columns.toSet & other.df.columns.toSet
    require(overlap.isEmpty,
      s"rangeJoin: column names collide between the sides: ${overlap.mkString(", ")}")
    require(!df.columns.contains("__bucket") && !other.df.columns.contains("__bucket"),
      "rangeJoin: a __bucket column already exists on one side")
    val b = lit(bucket)
    // end is exclusive: an interval ending exactly on a bucket edge does
    // not reach into that bucket, hence ceil(end/b)-1 (== floor for
    // non-integral quotients).
    val first = floor(col(startCol) / b).cast("long")
    val last = (ceil(col(endCol) / b).cast("long") - 1)
    val r = other.df.withColumn("__bucket",
      explode(when(last >= first, sequence(first, last))
        .otherwise(array().cast("array<long>"))))
    val l = df.withColumn("__bucket", floor(col(pointCol) / b).cast("long"))
    changed(l.join(r, Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket"))
  }

  // ---- sort / limit (duckdb.py:1323-1438) -------------------------------

  /** ORDER BY with SQL fragments like the reference's `Relation.order`
    * (duckdb.py:1368-1438), which forwards arbitrary fragments to the
    * engine: each argument may itself be a comma-joined multi-key fragment
    * (`"age DESC NULLS LAST, name"`), with optional `ASC`/`DESC` and
    * `NULLS FIRST`/`NULLS LAST` per key.
    */
  def order(by: String*): Relation =
    keep(df.orderBy(by.flatMap(splitSortKeys).map(parseSort): _*))

  /** Split a multi-key ORDER BY fragment on top-level commas only — commas
    * inside parens (function calls) or quotes don't separate keys.
    */
  private def splitSortKeys(fragment: String): Seq[String] = {
    val keys = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    fragment.foreach { ch =>
      if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' => quote = ch; cur += ch
        case '(' => depth += 1; cur += ch
        case ')' => depth -= 1; cur += ch
        case ',' if depth == 0 => keys += cur.result(); cur.clear()
        case _ => cur += ch
      }
    }
    keys += cur.result()
    keys.result().map(_.trim).filter(_.nonEmpty)
  }

  private def parseSort(s: String): Column = {
    var t = s.trim
    // peel trailing NULLS FIRST/LAST, then ASC/DESC (SQL fragment order)
    val nulls = "(?i)\\s+nulls\\s+(first|last)\\s*$".r
    val nullsPos = nulls.findFirstMatchIn(t).map(_.group(1).toLowerCase)
    t = nulls.replaceFirstIn(t, "")
    val l = t.toLowerCase
    val (e, desc) =
      if (l.endsWith(" desc")) (expr(t.dropRight(5)), true)
      else if (l.endsWith(" asc")) (expr(t.dropRight(4)), false)
      else (expr(t), false)
    nullsPos match {
      case None          => if (desc) e.desc else e.asc
      case Some("first") => if (desc) e.desc_nulls_first else e.asc_nulls_first
      case _             => if (desc) e.desc_nulls_last else e.asc_nulls_last
    }
  }

  def limit(n: Int, offset: Int = 0): Relation =
    keep(if (offset > 0) df.offset(offset).limit(n) else df.limit(n))

  // ---- set ops (duckdb.py:856-946, 1495-1526, 1844-1909) ----------------

  /** UNION ALL with the reference's set-equality check + automatic column
    * reordering (duckdb.py:1894-1908) — `unionByName` after an explicit
    * column-diff error.
    */
  def union(other: Relation): Relation = {
    val a = df.columns.toSet
    val b = other.df.columns.toSet
    // reference message text (tests/test_duckdb/test_relation.py:446-455),
    // plus the actual column diff
    require(a == b,
      s"Union between relations with different column names is not allowed. " +
        s"left-only=${(a diff b).toSeq.sorted.mkString(", ")} " +
        s"right-only=${(b diff a).toSeq.sorted.mkString(", ")}")
    keep(df.unionByName(other.df))
  }

  def +(other: Relation): Relation = union(other)

  /** INTERSECT — dedups, like SQL (duckdb.py:1499). */
  def intersect(other: Relation): Relation = keep(df.intersect(other.df))

  /** EXCEPT — dedups, like SQL (duckdb.py:899). */
  def except(other: Relation): Relation = keep(df.except(other.df))

  def distinct(): Relation = keep(df.distinct())

  // ---- row access / terminals (duckdb.py:948-1074, 1768-1842) -----------

  /** Row-shaping closure for the bound model, mirroring `_to_model`'s
    * `model(**kwargs)` construction (duckdb.py:1055-1073): fields come out
    * in MODEL order, model columns missing from the relation surface their
    * declared default (null when none), non-model columns drop, and values
    * whose physical type differs from the field's declared type are COERCED
    * through a Catalyst `Cast` — the reference gets this coercion for free
    * from pydantic's `model(**kwargs)` validation, so a model-bound `get()`
    * over an uncast relation must not leak e.g. Int where the model says
    * long. The fieldName→index map and per-field cast converters are built
    * once per schema, not per row. Identity without a model.
    */
  private def modelShaper(rowSchema: org.apache.spark.sql.types.StructType): Row => Row =
    model match {
      case None => identity
      case Some(m) =>
        import org.apache.spark.sql.catalyst.CatalystTypeConverters
        import org.apache.spark.sql.catalyst.expressions.Cast
        val idx = rowSchema.fieldNames.zipWithIndex.toMap
        val outSchema =
          org.apache.spark.sql.types.StructType(m.fields.map(_.structField))
        val zone = java.time.ZoneId.systemDefault().getId
        val getters: Array[Row => Any] = m.fields.map { f =>
          idx.get(f.name) match {
            case None =>
              // Defaults go through the same Cast coercion as present
              // columns: a default whose Scala type differs from the
              // declared field type (Int default on a long field) must not
              // leak off-type. Coerced ONCE at shaper build, not per row.
              val coerced = f.default.orNull match {
                case null => null
                case dv =>
                  val to = f.structField.dataType
                  scala.util.Try {
                    val litE = org.apache.spark.sql.catalyst.expressions.Literal(dv)
                    if (litE.dataType == to) dv
                    else CatalystTypeConverters.createToScalaConverter(to)(
                      Cast(litE, to, Some(zone)).eval(null))
                  }.getOrElse(dv)
              }
              (_: Row) => coerced
            case Some(i) =>
              val from = rowSchema(i).dataType
              val to = f.structField.dataType
              if (from == to) (r: Row) => r.get(i)
              else {
                val toInternal = CatalystTypeConverters.createToCatalystConverter(from)
                val toExternal = CatalystTypeConverters.createToScalaConverter(to)
                val cast = Cast(
                  org.apache.spark.sql.catalyst.expressions.BoundReference(
                    0, from, nullable = true),
                  to, Some(zone))
                (r: Row) => {
                  val v = r.get(i)
                  if (v == null) null
                  else toExternal(cast.eval(
                    org.apache.spark.sql.catalyst.InternalRow(toInternal(v))))
                }
              }
          }
        }.toArray
        (row: Row) =>
          new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
            getters.map(_(row)), outSchema)
    }

  /** Exactly-one-row fetch with arity errors (duckdb.py:969-1055); the row
    * is model-shaped when a model is bound (see [[modelShaper]]).
    */
  def get(filters: String*): Row = {
    val filtered = filters.foldLeft(df)((d, f) => d.where(expr(s"($f)")))
    filtered.take(2) match {
      case Array(row) => modelShaper(filtered.schema)(row)
      case Array() =>
        throw new RowDoesNotExist(
          s"Relation.get(${filters.mkString(", ")}) returned 0 rows")
      case _ =>
        throw new MultipleRowsReturned(
          s"Relation.get(${filters.mkString(", ")}) returned 2 or more rows")
    }
  }

  def getEq(equalities: (String, Any)*): Row =
    filterEq(equalities: _*).get()

  /** Stream rows driver-side without materializing the whole result
    * (duckdb.py:2191-2236); rows are model-shaped when a model is bound.
    */
  def iterator: Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    val shape = modelShaper(df.schema)
    df.toLocalIterator().asScala.map(shape)
  }

  /** Single-column relation → values (duckdb.py:1816-1842). */
  def toSeries(): Seq[Any] = {
    require(df.columns.length == 1,
      s"Relation.toSeries() on relation with ${df.columns.length} columns")
    df.collect().toSeq.map(_.get(0))
  }

  def toDF: DataFrame = df

  /** Order-insensitive multiset equality — both directions of exceptAll
    * empty. (The reference zips rows in order, duckdb.py:2129-2136; row order
    * is nondeterministic on a cluster, so multiset semantics is the faithful
    * distributed analogue.)
    */
  def sameAs(other: Relation): Boolean =
    df.exceptAll(other.df).isEmpty && other.df.exceptAll(df).isEmpty

  private def strHeader(t: String): String =
    "---------------------\n" + t + "\n---------------------"

  /** Relation tree + result columns, mirroring the reference `__str__`'s
    * first two sections (duckdb.py:2246-2330) with the analyzed Catalyst
    * plan as the tree. The reference also EXECUTES a row preview inside
    * `__str__`; Spark's `toString` is called implicitly (logging,
    * debuggers) and must never trigger a job, so the preview lives in
    * [[str]] instead.
    */
  override def toString: String = {
    val tree = df.queryExecution.analyzed.treeString.stripLineEnd
    val cols = df.schema.fields
      .map(f => s"- ${f.name} (${f.dataType.sql})").mkString("\n")
    alias.map(a => s"alias: $a\n").getOrElse("") +
      s"${strHeader("--- Relation Tree ---")}\n$tree\n" +
      s"${strHeader("-- Result Columns  --")}\n$cols"
  }

  /** Full reference-shaped rendering: tree, columns, and an EXECUTED
    * `previewRows`-row preview (`[ Rows: n]` header like the reference's
    * preview block). This is the `str(relation)` analogue — it runs a
    * take() job.
    */
  def str(previewRows: Int = 10): String = {
    val taken = df.take(previewRows + 1)
    val shown = taken.take(previewRows)
    val names = df.schema.fieldNames.mkString("\t")
    val types = df.schema.fields.map(_.dataType.sql).mkString("\t")
    val body = shown.map(_.toSeq.map {
      case null => "null"
      case v    => v.toString
    }.mkString("\t")).mkString("\n")
    val rowsLine =
      if (taken.length > previewRows) s"[ Rows: > $previewRows (truncated)]"
      else s"[ Rows: ${shown.length}]"
    s"$toString\n${strHeader("-- Result Preview  --")}\n" +
      s"$names\n$types\n$rowsLine\n$body"
  }

  // ---- model & alias (duckdb.py:1656-1733) ------------------------------

  def setAlias(name: String): Relation = copy(alias = Some(name))
  def setModel(schema: Schema): Relation = copy(model = Some(schema))
  def withoutModel: Relation = copy(model = None)

  /** Validate against the bound model (terminal; one scan — see Validator). */
  def validate(): Relation = {
    val m = model.getOrElse(throw new IllegalStateException(
      "Relation has no bound model; call setModel first"))
    Validator.validate(df, m)
    this
  }

  // ---- DDL (duckdb.py:767-832, 1440-1493) -------------------------------

  /** CTAS: model-typed when bound (cast first), plain otherwise. */
  def createTable(name: String): Relation = {
    val d = model.fold(df)(m => cast(m).df)
    d.write.mode("errorifexists").saveAsTable(name)
    Relation(spark.table(name), model)
  }

  /** Append with column reordering to match the target; errors if the
    * relation is missing target columns (duckdb.py:1440-1493).
    */
  def insertInto(table: String): Relation = {
    val target = spark.table(table).columns
    val missing = target.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Relation is missing column(s) ${missing.mkString(", ")} " +
        s"in order to be inserted into table $table")
    df.select(target.map(col): _*).write.mode("append").insertInto(table)
    this
  }

  def createView(name: String, replace: Boolean = true): Relation = {
    if (replace) df.createOrReplaceTempView(name)
    else df.createTempView(name)
    this
  }

  private def quoteIdent(n: String): String = s"`${n.replace("`", "``")}`"
}

object Relation {
  /** Source dispatch (duckdb.py:249-271): DataFrame, SQL query, or a
    * parquet/CSV/JSONL path. JSONL (one JSON object per line — the
    * de-facto interchange format for training corpora) is a pure
    * extension beyond the reference's parquet/CSV: Spark's json source is
    * already line-delimited by default, splittable, and schema-inferring.
    */
  def apply(spark: SparkSession, source: String): Relation = {
    val lower = source.toLowerCase
    if (lower.endsWith(".parquet")) Relation(spark.read.parquet(source))
    else if (lower.endsWith(".csv"))
      Relation(spark.read.option("header", "true").option("inferSchema", "true").csv(source))
    else if (lower.endsWith(".jsonl") || lower.endsWith(".json"))
      Relation(spark.read.json(source))
    else Relation(spark.sql(source))
  }
}
