package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting / sampling / mixing for training-data pipelines.
  *
  * Everything here is DETERMINISTIC and content-keyed: split membership is a
  * pure function of the row's content hash (not of partitioning, row order,
  * or a session seed), so a 100 TB corpus re-splits identically across
  * clusters, re-runs, and engines — the property that keeps train/test
  * contamination impossible when the corpus is re-processed.
  */
object Sampling {

  /** Content-keyed split assignment: the first hex nibble of md5(key) (16
    * uniform buckets) is mapped to named splits by sixteenths. Default
    * 12/2/2 → 75% train, 12.5% val, 12.5% test. Pure projection — no
    * shuffle, no seed, reproducible in any engine with md5.
    */
  def md5Split(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 12, "val" -> 2, "test" -> 2),
      splitCol: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 16,
      s"split sixteenths must total 16, got ${splits.map(_._2).sum}")
    val nibble = substring(md5(col(keyCol).cast("binary")), 1, 1)
    val hex = "0123456789abcdef"
    val bounds = splits.scanLeft(0) { case (acc, (_, n)) => acc + n }
    val assignment = splits.zip(bounds).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, n), lo)) =>
        when(nibble.isin(hex.slice(lo, lo + n).map(_.toString): _*), name)
          .otherwise(acc)
    }
    df.withColumn(splitCol, assignment)
  }

  /** Per-stratum Bernoulli sampling (e.g. downsample one language or source
    * to rebalance a corpus): content-keyed via xxhash64(key, stratum) so the
    * decision is per-row deterministic. Rows in strata missing from
    * `fractions` are kept.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val u = (pmod(xxhash64(col(keyCol), col(stratumCol)), lit(1000000L))
      .cast("double") / 1000000.0)
    val keepFraction = fractions.foldLeft(lit(1.0)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, f).otherwise(acc)
    }
    df.where(u < keepFraction)
  }

  /** Stratified sampling at md5-nibble granularity: per-stratum keep rate
    * in sixteenths (4 → 25%). Coarser than [[stratifiedSample]]'s 1e-6
    * resolution but reproducible in ANY engine with md5 (the xxhash64
    * variant is Spark-specific), which makes it the oracle-checkable form.
    * Strata absent from `sixteenths` keep all rows. Pure filter — no
    * shuffle, no seed.
    */
  def md5StratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      sixteenths: Map[String, Int]): DataFrame = {
    require(sixteenths.values.forall(n => n >= 0 && n <= 16),
      "per-stratum sixteenths must be in [0, 16]")
    val nibble = conv(
      substring(md5(col(keyCol).cast("binary")), 1, 1), 16, 10).cast("int")
    val rate = sixteenths.foldLeft(lit(16)) { case (acc, (stratum, n)) =>
      when(col(stratumCol) === stratum, n).otherwise(acc)
    }
    // null keys can't hash → keep the row (silently dropping it would
    // contradict the keep-all default for unlisted strata)
    df.where(col(keyCol).isNull || nibble < rate)
  }

  /** Exactly `n` rows per stratum (or all rows in smaller strata),
    * selected deterministically: rank by (md5(key), key) within each
    * stratum and keep the first `n`. Content-keyed like everything here —
    * "take 100 documents per language" returns the same 100 on any
    * cluster, engine, or rerun, unlike a seeded `sample()`. One shuffle
    * (the per-stratum window); the md5 order makes the pick uniform over
    * content, not over arrival order.
    *
    * Determinism REQUIRES a total order: if `keyCol` can repeat within a
    * stratum (e.g. duplicate texts), pass the table's unique id as
    * `tieCol` — without it, the window order among equal keys is
    * engine/partitioning-dependent and reruns may pick different rows.
    */
  def takePerStratum(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      n: Int): DataFrame =
    takePerStratum(df, stratumCol, keyCol, n, tieCol = None)

  def takePerStratum(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      n: Int,
      tieCol: Option[String]): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    // via string: a direct numeric→binary cast is illegal under ANSI mode,
    // and string→binary is the identity for the string keys callers
    // already rely on (same md5, same picks)
    val order = Seq(md5(col(keyCol).cast("string").cast("binary")).asc,
      col(keyCol).asc) ++ tieCol.map(col(_).asc)
    val w = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    // collision-safe rank column — never overwrite a caller's column
    val rk = Iterator.from(0).map(i => if (i == 0) "__rk" else s"__rk$i")
      .find(!df.columns.contains(_)).get
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= n)
      .drop(rk)
  }

  /** Token-BUDGET-capped sampling per stratum — "take ~1 B tokens per
    * source", the budget form of data mixing (fraction-based mixes like
    * [[weightedMix]] cap row COUNTS; training recipes cap TOKENS). Rows
    * are taken in the same engine-portable content-keyed order as
    * [[takePerStratum]] (md5 of the key, then the key) until the stratum's
    * running token total reaches `budget`; the first row that CROSSES the
    * budget is kept (so every non-empty stratum with a positive budget
    * yields at least one row, and the overshoot is bounded by one
    * document). Null token counts count as 0 tokens; counts must be
    * non-negative (a negative count makes the running total non-monotone
    * and would re-admit rows past the cutoff).
    *
    * Plan shape for 100 TB: one hash-partitioned window per stratum — the
    * same single shuffle as any per-stratum ranking; no global sort, no
    * driver state. The cumulative sum is streamed by the window operator
    * in sort order, so memory per partition is O(1) beyond the sort.
    */
  def takeTokenBudget(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string").cast("binary")).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Iterator.from(0).map(i => if (i == 0) "__cum" else s"__cum$i")
      .find(!df.columns.contains(_)).get
    val toks = coalesce(col(tokensCol).cast("long"), lit(0L))
    df.withColumn(cum, sum(toks).over(w))
      .where(col(cum) - toks < budget)
      .drop(cum)
  }

  /** Weighted corpus mix: union of sources, each downsampled to its weight
    * (1.0 = keep all). The mixing decision is content-keyed per source, so
    * the mix is stable under re-runs and independent of source ordering.
    */
  def weightedMix(sources: Seq[(DataFrame, String, Double)], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "weightedMix needs at least one source")
    sources.map { case (df, name, weight) =>
      val u = (pmod(xxhash64(col(keyCol), lit(name)), lit(1000000L))
        .cast("double") / 1000000.0)
      df.where(u < weight).withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Engine-portable weighted mix — the oracle-checkable twin of
    * [[weightedMix]] (same trade as [[md5StratifiedSample]] vs the
    * xxhash64 paths): the keep decision compares the first three md5 hex
    * digits of `"name#key"` against the weight's 3-hex-digit threshold
    * LEXICOGRAPHICALLY — fixed-width lowercase hex compares identically
    * to its numeric value in any engine, so no base conversion is needed
    * anywhere. Weight granularity 1/4096; weights that round to 0 or 1
    * short-circuit to keep-none/keep-all. Pure filter, no shuffle, no
    * seed; null keys keep the row only under keep-all (they cannot hash).
    */
  def md5WeightedMix(sources: Seq[(DataFrame, String, Double)], keyCol: String): DataFrame = {
    require(sources.nonEmpty, "md5WeightedMix needs at least one source")
    sources.map { case (df, name, weight) =>
      require(weight >= 0.0 && weight <= 1.0,
        s"weight must be in [0, 1], got $weight for source '$name'")
      val t = math.round(weight * 4096).toInt
      val keep =
        if (t <= 0) lit(false)
        else if (t >= 4096) lit(true)
        else substring(
          md5(concat(lit(name), lit("#"), col(keyCol).cast("string")).cast("binary")),
          1, 3) < lit(f"$t%03x")
      df.where(keep).withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)
  }
}
