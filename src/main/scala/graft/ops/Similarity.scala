package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *     set against the corpus; the corpus is never shuffled, ranking is a
  *     per-query-partition window. The correctness baseline.
  *   - [[lshTopK]]: random-hyperplane LSH — corpus and queries bucket by the
  *     sign pattern of `planes` pseudo-random hyperplanes (hash-derived, no
  *     stored model); only same-bucket pairs get an exact cosine. This is
  *     the 100 TB path: one shuffle on a small int key, candidate count
  *     bounded by bucket population.
  *
  * All math is double precision with sequential array aggregation — bit-wise
  * deterministic.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double —
    * the native codegen kernel ([[graft.functions.CosineSimilarity]]); the
    * pure-HOF equivalent is kept as [[cosineExpr]] for reference.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.native.cosine(a, b)

  /** Pure `functions._` cosine (interpreted per element — prefer [[cosine]]
    * in hot paths; bit-identical accumulation order).
    */
  def cosineExpr(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Sign-bit bucket from `planes` deterministic pseudo-random hyperplanes:
    * plane p's component for dimension i is ±1 by xxhash64(p, i) parity, so
    * no model state is stored and every executor computes identical planes.
    */
  def hyperplaneBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") *
            when(xxhash64(lit(p), i).bitwiseAND(1) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (s, v) => s + v)
      when(dot > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each query id. Queries (few) are broadcast;
    * the corpus streams through map-side — no corpus shuffle, then one
    * window partitioned by query for ranking.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** LSH-bucketed top-k: exact cosine only within the query's hyperplane
    * bucket. Recall trades against `planes`; rank semantics identical to
    * brute force within the candidate set.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      planes: Int = 8): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
