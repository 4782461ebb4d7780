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

  /** LEAKAGE-SAFE train/val/test split: [[md5Split]] keyed on the
    * duplicate-CLUSTER representative instead of the row itself, so a
    * near-duplicate pair can never straddle the split boundary — the
    * classic eval-leakage hole (a test doc whose near-twin sits in train
    * scores as memorization; Lee et al. 2021 "Deduplicating Training Data
    * Makes Language Models Better" §6 measures exactly this) closed at
    * the split, not by deletion.
    *
    * `pairs` is any duplicate-pair frame with endpoint columns
    * `(id_a, id_b)` — the universal currency of the dedup family
    * (minhash, containment, semantic, exact pairs all emit it). The
    * transitive closure runs through [[Dedup.dedupClusters]] (star
    * rounds at scale, the bounded driver union-find on small integral-id
    * graphs), each row joins its min-id representative (unpaired rows
    * represent themselves), and the split nibble hashes the rep RENDERED
    * AS A STRING — engine-portable (`md5(cast(rep AS VARCHAR))`), unlike
    * the raw binary cast of an integral column. Same-cluster rows land
    * in the same split BY CONSTRUCTION; split shares hold at cluster
    * granularity (a giant cluster moves whole — that is the point).
    * Output: the input columns + `rep` + `splitCol`.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Int)] = Seq("train" -> 12, "val" -> 2, "test" -> 2),
      splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains("rep"),
      "leakageSafeSplit adds a 'rep' column — rename the existing one first")
    // Fail-loud key guards (the epochShuffle/sizedShardAssignment
    // discipline): the inner join below would silently DROP null-id rows
    // from every split, and k duplicate ids would fan out k× against
    // their label rows — both corrupt split shares without an error.
    // Ids-only probes: a pushdown-friendly limit-1 null scan and one
    // id-column aggregate, trivial next to the closure itself.
    require(df.where(col(idCol).isNull).limit(1).count() == 0L,
      s"leakageSafeSplit: null ids in '$idCol' would vanish from every " +
        "split at the cluster join — assign ids first")
    require(df.groupBy(col(idCol)).count()
      .where(col("count") > 1L).limit(1).count() == 0L,
      s"leakageSafeSplit: duplicate ids in '$idCol' fan out against the " +
        "cluster labels and corrupt split shares — deduplicate ids first")
    val clusters = Dedup.dedupClusters(
      df.select(col(idCol)), idCol, pairs)
      .withColumnRenamed("id", "__lsid")
    val keyed = df
      .join(clusters, col(idCol) === col("__lsid"))
      .drop("__lsid")
      .withColumn("__repkey", col("rep").cast("string"))
    md5Split(keyed, "__repkey", splits, splitCol).drop("__repkey")
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
    * and would re-admit rows past the cutoff). `keyCol` must identify a
    * row within its stratum (dup keys make the cutoff order, hence the
    * kept set, partitioning-dependent — same caveat as [[takePerStratum]]).
    *
    * Plan shape for 100 TB — two-phase bucket prefix sums, NOT one
    * window per stratum (a per-stratum running sum would sort and scan
    * each stratum's ENTIRE row set in a single task: "take 1 B tokens
    * per source" over ~10 sources would be ~10 straggler tasks sorting
    * TB-scale partitions):
    *
    *   1. the input collapses to a (stratum, key, tokens) ledger — text
    *      never rides any shuffle, no matter what columns the caller
    *      passes — and each row lands in one of `16^bucketHexLen`
    *      md5-prefix buckets. Bucket order refines the row order (the
    *      bucket IS the leading prefix of the sort key), so per-bucket
    *      token sums are contiguous runs of the global cumsum;
    *   2. one map-side-combining aggregate yields the per-(stratum,
    *      bucket) sums — strata × 4096 rows at the default — and the
    *      driver prefix-sums that tiny table to classify each bucket:
    *      strictly below the budget (keep whole bucket — a join-free
    *      filter, no sort, no window), at-or-past it (drop), or THE
    *      boundary bucket (at most one per stratum);
    *   3. the windowed cumsum — the only sort — runs ONLY inside
    *      boundary buckets, ~1/4096 of each stratum, with the bucket's
    *      prefix offset added; the attach back to the caller's rows is
    *      one pass with two BROADCAST lookups (the bucket classification
    *      and the boundary bucket's surviving keys — both small by
    *      construction), so the full rows never shuffle at all.
    *
    * The kept set is IDENTICAL to the one-window form row-for-row; only
    * the plan changes.
    */
  def takeTokenBudget(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokensCol: String,
      budget: Long): DataFrame =
    takeTokenBudget(df, stratumCol, keyCol, tokensCol, budget, bucketHexLen = 3)

  /** `bucketHexLen` sets the bucket count (`16^bucketHexLen`): more
    * buckets shrink the boundary window's single task but grow the
    * driver-side classification table (strata × buckets rows — widths
    * that overflow `maxClassificationRows` narrow automatically; the
    * kept set is width-independent).
    */
  def takeTokenBudget(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokensCol: String,
      budget: Long,
      bucketHexLen: Int,
      maxClassificationRows: Int = MaxClassificationRows): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    takeBudgets(df, stratumCol, keyCol, col(tokensCol), _ => budget,
      bucketHexLen, maxClassificationRows)
  }

  /** Per-stratum-budget core of [[takeTokenBudget]] (same two-phase
    * bucket-prefix plan; only the driver-side classification consults a
    * per-stratum budget). `budgetOf` receives the stratum value (None for
    * the null stratum); a budget <= 0 drops the stratum entirely.
    * `tokens` is any non-negative long expression — `lit(1L)` turns the
    * token budget into an exact row quota.
    */
  /** Hard bound on the driver-side bucket-classification table (strata ×
    * 16^bucketHexLen rows at the widest attempted width). 2M rows ≈ low
    * hundreds of MB of Rows — below where the collect would take down the
    * driver. [[takeBudgets]] narrows the bucket width automatically when
    * the requested width would overflow this (more strata ⇒ fewer buckets
    * each — the kept set is width-independent), so the bound only fails a
    * call when the STRATA alone exceed 2M/16 ≈ 125k distinct values —
    * far past mixing-grade (10s-1000s of sources).
    */
  private[ops] val MaxClassificationRows: Int = 2000000

  private[ops] def takeBudgets(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      tokens: Column,
      budgetOf: Option[Any] => Long,
      bucketHexLen: Int,
      maxClassificationRows: Int = MaxClassificationRows): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 6,
      s"bucketHexLen must be in [1, 6], got $bucketHexLen")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val spark = df.sparkSession

    // the narrow ledger: (stratum, key, tokens, md5-prefix bucket) — the
    // ONLY shape that rides a shuffle regardless of the caller's columns.
    // A null key cannot hash: its bucket is null, which sorts FIRST under
    // Spark's ASC NULLS FIRST — the driver prefix below mirrors that.
    def slimAt(h: Int): DataFrame = df.select(
      col(stratumCol).as("__s"),
      col(keyCol).as("__k"),
      coalesce(tokens.cast("long"), lit(0L)).as("__t"),
      substring(md5(col(keyCol).cast("string").cast("binary")), 1, h)
        .as("__b"))

    // phase 1: per-(stratum, bucket) token sums — strata × 16^hexLen rows
    // at most; one map-side-combining aggregate, nothing else moves. The
    // limit bounds driver memory BEFORE anything lands (it admits at most
    // cap + 1 rows, so the guard itself never collects the oversized
    // table). When the requested width overflows — more strata than
    // cap/16^h — degrade to a NARROWER width instead of failing: the kept
    // set is width-independent (buckets only set the boundary window's
    // size), so a 600-source mix at the default width simply gets fewer
    // buckets per stratum. The feasible width comes from ONE per-stratum
    // distinct count (not blind narrowing retries — each retry would
    // re-run the whole upstream lineage); only the overflow path pays the
    // two extra jobs. Fails only when strata alone exceed cap/16 (h = 1
    // always fits below that).
    def sumsAt(h: Int) = slimAt(h).groupBy("__s", "__b")
      .agg(sum("__t").as("__sum"))
      .limit(maxClassificationRows + 1).collect()
    val firstTry = sumsAt(bucketHexLen)
    val (hexLen, bucketSums) =
      if (firstTry.length <= maxClassificationRows) (bucketHexLen, firstTry)
      else {
        val strataCap = maxClassificationRows / 16
        val nStrata = df.select(col(stratumCol)).distinct()
          .limit(strataCap + 1).count()
        require(nStrata <= strataCap,
          s"takeBudgets: stratum '$stratumCol' has more than $strataCap " +
          "distinct values — this API is for mixing-grade strata " +
          "(10s-1000s of sources); aggregate the stratum to a coarser " +
          "key first")
        val h = (bucketHexLen - 1 to 1 by -1).find(h =>
          nStrata * (1L << (4 * h)) <= maxClassificationRows).getOrElse(1)
        val sums = sumsAt(h)
        require(sums.length <= maxClassificationRows,
          s"takeBudgets: classification table still exceeds " +
          s"$maxClassificationRows rows at width $h — coarsen the stratum")
        (h, sums)
      }
    val slim = slimAt(hexLen)

    // driver-side prefix in the window's own order (null bucket first,
    // then hex asc — the bucket is the leading prefix of the md5 sort key,
    // so bucket order refines row order exactly). A bucket whose whole
    // prefix range ends strictly below the budget keeps every row (the
    // keep test is `running-before-row < budget` and every before-row
    // value in it is < its end sum); one that starts at-or-past the
    // budget keeps none; the at-most-one straddling bucket per stratum
    // goes through the exact windowed cumsum with its start as offset.
    val clsRows = bucketSums
      .groupBy(r => if (r.isNullAt(0)) None else Some(r.get(0)))
      .iterator.flatMap { case (stratum, rows) =>
        val budget = budgetOf(stratum)
        val ordered = rows.sortBy(r =>
          (if (r.isNullAt(1)) "" else "" + r.getString(1)))
        var before = 0L
        ordered.flatMap { r =>
          val sum = r.getLong(2)
          val start = before
          before += sum
          if (budget <= 0L) None
          else if (start + sum < budget)
            Some(org.apache.spark.sql.Row(r.get(0), r.get(1), true, 0L, budget))
          else if (start < budget)
            Some(org.apache.spark.sql.Row(r.get(0), r.get(1), false, start, budget))
          else None
        }
      }.toSeq
    val sType = slim.schema("__s").dataType
    val cls = spark.createDataFrame(
      spark.sparkContext.parallelize(clsRows, 1),
      StructType(Seq(
        StructField("__cs", sType, nullable = true),
        StructField("__cb", StringType, nullable = true),
        StructField("__keep_all", BooleanType, nullable = false),
        StructField("__off", LongType, nullable = false),
        StructField("__budget", LongType, nullable = false))))

    // phase 3: the windowed cumsum — the only sort — over boundary-bucket
    // ledger rows only (~1/16^bucketHexLen of one stratum each), with the
    // bucket's prefix offset restoring global semantics. Its surviving
    // keys are a per-stratum slice of ONE bucket — small by construction,
    // hence broadcastable below.
    val w = Window.partitionBy(col("__s"))
      .orderBy(md5(col("__k").cast("string").cast("binary")).asc, col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeys = slim.join(
        broadcast(cls.where(!col("__keep_all"))),
        col("__s") <=> col("__cs") && col("__b") <=> col("__cb"))
      .withColumn("__cum", sum(col("__t")).over(w))
      .where(col("__off") + col("__cum") - col("__t") < col("__budget"))
      .select(col("__s").as("__bs"), col("__k").as("__bk"),
        lit(true).as("__in_boundary"))

    // attach: ONE pass over the input, two broadcast joins, zero shuffles
    // of the caller's rows — bucket-level classification (tiny) admits
    // whole kept buckets plus the boundary bucket, and the boundary's
    // surviving keys flip per-row membership. Dropped buckets fall out of
    // the inner join. Both lookup sides are 1:1 per row, so multiplicity
    // is preserved. (The input is evaluated once per phase — persist an
    // expensive non-file-backed frame before calling.)
    val bucketOfDf =
      substring(md5(df(keyCol).cast("string").cast("binary")), 1, hexLen)
    df.join(broadcast(cls),
        df(stratumCol) <=> col("__cs") && bucketOfDf <=> col("__cb"))
      .join(broadcast(boundaryKeys),
        df(stratumCol) <=> col("__bs") && df(keyCol) <=> col("__bk"), "left")
      .where(col("__keep_all") || coalesce(col("__in_boundary"), lit(false)))
      .drop("__cs", "__cb", "__keep_all", "__off", "__budget",
        "__bs", "__bk", "__in_boundary")
  }

  /** Per-source (stratum, size, weight^alpha) triples plus the normalizer
    * Z — the shared quota arithmetic of the temperature mixes. `sizes` is
    * the per-source magnitude (row count or token sum) collected from one
    * tiny aggregate; the canonical fold order (null source first, then by
    * name) makes Z the same double on every rerun, and the cross-engine
    * exactness contract is alpha ∈ {1, 0.5} (identity/sqrt — see
    * [[temperatureMix]]'s portability note).
    */
  private def temperatureWeights(
      sizes: Seq[(Option[Any], Long)],
      alpha: Double): (Seq[(Option[Any], Long, Double)], Double) = {
    val weighted = sizes
      .sortBy { case (s, _) => (s.nonEmpty, s.map(_.toString).getOrElse("")) }
      .map { case (s, c) =>
        val w =
          if (alpha == 1.0) c.toDouble // exact
          else if (alpha == 0.5) math.sqrt(c.toDouble) // IEEE-exact
          else math.pow(c.toDouble, alpha)
        (s, c, w)
      }
    (weighted, weighted.foldLeft(0.0)(_ + _._3))
  }

  /** One tiny per-source aggregate of `sizeAgg`, collected driver-side.
    * Guarded like [[takeBudgets]]' classification collect: a
    * high-cardinality source column fails with a contract error before
    * the collect can OOM the driver (the limit admits cap + 1 rows only).
    */
  private def sourceSizes(
      df: DataFrame, sourceCol: String, sizeAgg: Column): Seq[(Option[Any], Long)] = {
    val rows = df.groupBy(col(sourceCol).as("__src")).agg(sizeAgg.as("__c"))
      .limit(MaxClassificationRows + 1).collect()
    require(rows.length <= MaxClassificationRows,
      s"temperature mixing: source column '$sourceCol' exceeds " +
      s"$MaxClassificationRows distinct values — not a mixing-grade " +
      "source key; aggregate to a coarser source first")
    rows.map(r => ((if (r.isNullAt(0)) None
                    else Some(r.get(0))): Option[Any], r.getLong(1)))
      .toSeq
  }

  /** Temperature-scaled source mixing — the multilingual-LM recipe (mT5 /
    * XLM-R style): sampling probabilities follow source SHARES raised to
    * `alpha` (p_s ∝ (c_s/Σc)^alpha), so alpha = 1 reproduces natural
    * proportions and alpha → 0 flattens toward uniform, upsampling the
    * tail sources a proportional mix would starve. Each source keeps
    * exactly `quota_s = min(c_s, round(targetRows · p_s))` rows (no
    * replacement — a quota never exceeds the source's row count, so the
    * realized total can fall short of `targetRows` when small sources
    * saturate), chosen in the engine-portable md5(key) content order of
    * [[takePerStratum]].
    *
    * Plan shape: one tiny per-source count aggregate (map-side combining,
    * sources × 1 rows to the driver), quota arithmetic on the driver, then
    * the [[takeTokenBudget]] two-phase bucket-prefix machinery with
    * per-source quotas and weight-1 tokens — the caller's rows never
    * shuffle and no stratum funnels through a single window task, so the
    * mix holds at 100 TB exactly like the token-budget take.
    *
    * Determinism: quotas are a pure function of the per-source counts
    * (weights summed in source-name order), and membership is a pure
    * function of content — reruns and engines agree. The CROSS-ENGINE
    * portability contract is restricted to alpha ∈ {1, 0.5}: those use
    * IEEE-exact identity/sqrt, so any engine recomputing the quotas from
    * the same counts lands on the same integers. Any other alpha goes
    * through `math.pow`, whose last-ulp behavior is platform-dependent —
    * same-engine reruns still agree, but another engine's pow may differ
    * by one ulp and shift a `round` boundary by one row. Ship alpha ∈
    * {1, 0.5} when downstream consumers hash-compare across engines.
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      alpha: Double,
      targetRows: Long,
      bucketHexLen: Int = 3): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    val (weighted, z) = temperatureWeights(
      sourceSizes(df, sourceCol, count(lit(1))), alpha)
    val quotas: Map[Option[Any], Long] = weighted.map { case (s, c, w) =>
      s -> math.min(c, math.round(targetRows * w / z))
    }.toMap
    takeBudgets(df, sourceCol, keyCol, lit(1L),
      quotas.getOrElse(_, 0L), bucketHexLen)
  }

  /** [[temperatureMix]] WITH REPLACEMENT — the form the mT5/XLM-R recipe
    * actually trains with: a source whose temperature quota EXCEEDS its
    * row count repeats its data (tail languages run multiple epochs while
    * head languages are subsampled) instead of saturating at one copy.
    * Each source emits `quota_s div c_s` full copies of every row plus
    * the md5-content-order prefix of `quota_s mod c_s` rows as the last
    * partial copy, so the realized total is exactly `Σ round(N·p_s)`.
    * Output = input columns + `copy` (0-based repeat index — downstream
    * dedup keys must include it, and shuffling repeats into training
    * order is the caller's step).
    *
    * Determinism: quotas are [[temperatureMix]]'s driver arithmetic (same
    * cross-engine contract — exact only at alpha ∈ {1, 0.5}); full copies
    * are a per-row `sequence` explode (no shuffle at all), and the
    * partial copy is the same scale-safe two-phase take. `maxRepeat`
    * bounds the copy factor so a degenerate mix (a tiny source under a
    * huge target) fails loudly instead of exploding the corpus.
    */
  def temperatureMixRepeat(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      alpha: Double,
      targetRows: Long,
      bucketHexLen: Int = 3,
      maxRepeat: Long = 100L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    require(!df.columns.contains("copy"),
      "temperatureMixRepeat adds a 'copy' column — rename the existing one first")
    val spark = df.sparkSession
    val (weighted, z) = temperatureWeights(
      sourceSizes(df, sourceCol, count(lit(1))), alpha)
    // UNCAPPED quotas: div/mod split each into full copies + a remainder
    val split: Seq[(Option[Any], Long, Long)] = weighted.map { case (s, c, w) =>
      val quota = math.round(targetRows * w / z)
      (s, quota / c, quota % c)
    }
    split.foreach { case (s, k, _) =>
      require(k <= maxRepeat,
        s"temperatureMixRepeat: source ${s.getOrElse("NULL")} would repeat " +
        s"$k times (> maxRepeat $maxRepeat) — a degenerate mix for this " +
        "alpha/target; raise maxRepeat only if that is intended")
    }
    repeatedTake(df, sourceCol, keyCol, split, bucketHexLen)
  }

  /** WITH-REPLACEMENT selection shared by [[temperatureMixRepeat]] and
    * [[takeUniMax]]: each source emits `kf` full copies of every row
    * (per-row generator, zero shuffle) plus the md5-content-order prefix
    * of `rem` rows as the last partial copy (the two-phase take), with a
    * 0-based `copy` index. `split` = (source, kf, rem).
    */
  private def repeatedTake(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      split: Seq[(Option[Any], Long, Long)],
      bucketHexLen: Int,
      weight: Column = lit(1L)): DataFrame = {
    val spark = df.sparkSession
    // per-source copy factor via a tiny BROADCAST lookup (a per-source
    // when-chain would deepen the expression tree linearly in source
    // count and fall out of codegen at 1000s of sources)
    val sType = df.schema(sourceCol).dataType
    val kDf = spark.createDataFrame(
      spark.sparkContext.parallelize(split.map(t =>
        org.apache.spark.sql.Row(t._1.orNull, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__ks", sType, nullable = true),
        org.apache.spark.sql.types.StructField("__kf",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val rems: Map[Option[Any], Long] = split.map(t => t._1 -> t._3).toMap
    def withK(frame: DataFrame): DataFrame =
      frame.join(broadcast(kDf), frame(sourceCol) <=> col("__ks"), "left")
    // full copies: a per-row generator, zero shuffle (k = 0 sources emit
    // nothing — the guard keeps sequence() off its descending-step path)
    val fullCopies = withK(df).withColumn("copy",
      explode(when(col("__kf") > 0L, sequence(lit(0L), col("__kf") - 1L))
        .otherwise(array().cast("array<bigint>"))))
      .drop("__ks", "__kf")
    // the partial copy: md5-content-order prefix of the remainder quota
    // (row count at weight 1, token budget with the crossing row kept
    // when a weight column is passed — takeBudgets' rule either way)
    val partial = withK(takeBudgets(df, sourceCol, keyCol, weight,
      rems.getOrElse(_, 0L), bucketHexLen))
      .withColumn("copy", coalesce(col("__kf"), lit(0L)))
      .drop("__ks", "__kf")
    fullCopies.unionByName(partial)
  }

  /** UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread a row budget UNIFORMLY across sources, capped
    * at `maxEpochs` passes over any source's own data, redistributing a
    * saturated source's leftover uniformly among the rest. The published
    * algorithm IS [[waterfillQuotas]] at EQUAL weights over
    * availabilities `maxEpochs · c_s` (the same BigInt-exact fixpoint),
    * and selection is with replacement ([[repeatedTake]]): a source whose
    * quota exceeds one epoch repeats — `quota div c` full copies plus the
    * md5-content-order prefix of `quota mod c` rows, 0-based `copy`
    * index, so tail languages run multiple epochs while head languages
    * subsample, never more than `maxEpochs` passes. Null sources are
    * excluded (weight 0). If the budget exceeds `maxEpochs` times the
    * corpus, every source saturates at exactly `maxEpochs` full copies —
    * the cap binds, matching the paper. Unsaturated shares are FLOOR
    * divisions (the fixpoint's exact-integer rule), so up to
    * `#unsaturated − 1` rows of the budget stay unallocated rather than
    * being assigned by a tie-break the paper doesn't define.
    *
    * Plan shape: one tiny per-source count aggregate, the driver
    * fixpoint, then a zero-shuffle copy generator + one two-phase take —
    * identical scale character to [[temperatureMixRepeat]].
    */
  def takeUniMax(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      budget: Long,
      maxEpochs: Long,
      bucketHexLen: Int = 3): DataFrame =
    uniMaxCore(df, sourceCol, keyCol, count(lit(1)), lit(1L),
      budget, maxEpochs, bucketHexLen, "takeUniMax")

  /** The shared UniMax allocation + selection behind [[takeUniMax]] (row
    * space: size = count, weight 1) and [[takeUniMaxTokens]] (token
    * space: size = token sum, weight = tokens) — one definition of the
    * equal-weight fixpoint, the null-source exclusion, and the quota
    * div/mod split, so the two budget units cannot drift.
    */
  private def uniMaxCore(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      sizeAgg: Column,
      weight: Column,
      budget: Long,
      maxEpochs: Long,
      bucketHexLen: Int,
      op: String): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(!df.columns.contains("copy"),
      s"$op adds a 'copy' column — rename the existing one first")
    val sizes = sourceSizes(df, sourceCol, sizeAgg)
    val quotas = waterfillQuotas(
      sizes.map { case (s, c) => (s, maxEpochs * c) },
      s => if (s.isEmpty) 0L else 1L, budget)
    val split = sizes.map { case (s, c) =>
      val q = quotas.getOrElse(s, 0L)
      if (c <= 0L) (s, 0L, 0L) else (s, q / c, q % c)
    }
    repeatedTake(df, sourceCol, keyCol, split, bucketHexLen, weight)
  }

  /** [[takeUniMax]] in TOKEN space — the budget unit the paper states
    * the algorithm in: availabilities are `maxEpochs · tok_s` (per-source
    * token sums, nulls 0), the equal-weight fixpoint allocates token
    * quotas, and each source emits `quota div tok_s` full copies plus a
    * partial copy taken in md5 content order until `quota mod tok_s`
    * tokens with the crossing row KEPT ([[takeTokenBudget]]'s rule, so a
    * positive remainder always yields rows). A source whose token sum is
    * zero contributes nothing (its availability is 0); the floor-share
    * remainder note on [[takeUniMax]] applies unchanged.
    */
  def takeUniMaxTokens(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      tokenCol: String,
      budget: Long,
      maxEpochs: Long,
      bucketHexLen: Int = 3): DataFrame =
    uniMaxCore(df, sourceCol, keyCol,
      sum(coalesce(col(tokenCol).cast("long"), lit(0L))), col(tokenCol),
      budget, maxEpochs, bucketHexLen, "takeUniMaxTokens")

  /** [[temperatureMix]] in TOKEN space — the form the mT5/XLM-R recipe is
    * actually stated in ("sample so each language contributes share^alpha
    * of the TOKEN budget"): sampling probabilities follow per-source token
    * SHARES raised to `alpha`, each source keeps its md5-content-order
    * prefix until `quota_s = min(tok_s, round(targetTokens · p_s))` tokens
    * (crossing row kept, [[takeTokenBudget]]'s rule, so a tiny quota still
    * yields rows; a saturated source keeps everything).
    *
    * Plan shape: one tiny per-source token-sum aggregate (map-side
    * combining), quota arithmetic on the driver, then the two-phase
    * bucket-prefix take — the caller's rows never shuffle and no source
    * funnels through a single window task. Determinism matches
    * [[temperatureMix]] including its portability contract: only alpha ∈
    * {1, 0.5} recompute IEEE-exactly on any engine (weights summed in
    * source-name order, null source first); other alphas ride `math.pow`
    * and may shift a rounding boundary across engines.
    *
    * A corpus whose every row has null/zero tokens has no token shares to
    * mix (Z = 0, every quota would be round(NaN·…) = 0) — that is a
    * caller error and fails loudly rather than silently emptying the
    * result.
    */
  def temperatureMixTokens(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      tokensCol: String,
      alpha: Double,
      targetTokens: Long,
      bucketHexLen: Int = 3): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetTokens >= 1, s"targetTokens must be >= 1, got $targetTokens")
    val sizes = sourceSizes(df, sourceCol,
      coalesce(sum(coalesce(col(tokensCol), lit(0L))), lit(0L)))
    val (weighted, z) = temperatureWeights(sizes, alpha)
    require(sizes.isEmpty || z > 0.0,
      "temperatureMixTokens: every source has 0 total tokens (all-null/zero " +
      s"'$tokensCol') — token-share mixing is undefined on a zero-token " +
      "corpus; fix the token column or use temperatureMix (row space)")
    val quotas: Map[Option[Any], Long] = weighted.map { case (s, c, w) =>
      s -> math.min(c, math.round(targetTokens * w / z))
    }.toMap
    takeBudgets(df, sourceCol, keyCol, coalesce(col(tokensCol), lit(0L)),
      quotas.getOrElse(_, 0L), bucketHexLen)
  }

  /** Temperature-scaled mixing FILLED BY QUALITY — [[temperatureMix]]'s
    * per-source quotas (`quota_s = min(c_s, round(targetRows · p_s))`,
    * p_s ∝ share^alpha) taken in `(scoreCol DESC nulls last, md5(key),
    * key)` order instead of md5 content order: "mix to temperature,
    * keeping each source's BEST documents" — the quality-aware form of
    * the multilingual recipe (a content-keyed mix admits a uniform
    * sample of each source; real pipelines fill the quota from the top
    * of the quality distribution). Quota arithmetic, determinism, and
    * the alpha ∈ {1, 0.5} cross-engine contract are [[temperatureMix]]'s
    * verbatim; the selection plan, exactness, tie order, and
    * evaluated-once-per-phase contract are [[takeTopFraction]]'s (no
    * source is ever sorted whole, discrete scores ride the run/tie
    * path).
    */
  def temperatureMixTopQuality(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      scoreCol: String,
      alpha: Double,
      targetRows: Long,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetRows >= 1, s"targetRows must be >= 1, got $targetRows")
    // quota arithmetic runs over takeTopCore's OWN phase-0 per-source
    // counts — a separate sourceSizes aggregate would be an identical
    // second pass over the input
    takeTopCore(df, sourceCol, keyCol, scoreCol, lit(1L),
      counts => {
        val (weighted, z) = temperatureWeights(counts, alpha)
        weighted.map { case (s, c, w) =>
          s -> math.min(c, math.round(targetRows * w / z))
        }.toMap
      },
      nBuckets, maxClassificationRows, maxBoundaryTaskRows)._1
  }

  /** Exact integer waterfill allocation: split `budget` units across
    * strata in proportion to integer `weights`, REDISTRIBUTING the share a
    * stratum cannot absorb (its availability `a_s` is smaller than its
    * proportional cut) to the unsaturated strata, again proportionally —
    * the classic waterfilling fixpoint, the allocation rule behind "hit a
    * 1 B-token budget at these mixture ratios even when small sources run
    * dry" (the gap [[temperatureMix]]'s `min(c, quota)` leaves open: there
    * a saturated source just under-fills the total).
    *
    * All arithmetic is BigInt-exact: a stratum saturates iff
    * `a_s · W_unsat <= w_s · remaining` (the cross-multiplied form of
    * "its full availability fits inside its provisional share"), rounds
    * of simultaneous saturation repeat until the fixpoint (≤ #strata
    * passes — the saturated set of the real-valued relaxation is unique
    * and this monotone closure reaches exactly it), and every unsaturated
    * stratum finally gets `floor(w_s · remaining / W_unsat)`. Totals:
    * `Σ quota = min(budget, Σ a_s)` up to the final floors (each floor
    * loses < 1 unit). Zero-weight strata get 0 (explicit exclusion);
    * zero-availability strata saturate at 0. Deterministic and
    * engine-free: a pure function of the (avail, weight, budget)
    * integers, re-derivable by any engine (the oracle replays it as a
    * recursive SQL fixpoint).
    */
  def waterfillQuotas(
      avail: Seq[(Option[Any], Long)],
      weightOf: Option[Any] => Long,
      budget: Long): Map[Option[Any], Long] = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val entries = avail.map { case (s, a) =>
      require(a >= 0, s"negative availability $a for stratum $s")
      val w = weightOf(s)
      require(w >= 0, s"negative weight $w for stratum $s")
      (s, BigInt(a), BigInt(w))
    }
    require(entries.map(_._1).distinct.length == entries.length,
      "duplicate strata in avail")
    var sat = Map.empty[Option[Any], BigInt]
    var changed = true
    while (changed) {
      val rem = BigInt(budget) - sat.values.sum
      val unsat = entries.filterNot(e => sat.contains(e._1))
      val wu = unsat.map(_._3).sum
      if (wu == 0) changed = false
      else {
        val newly = unsat.filter { case (_, a, w) => a * wu <= w * rem }
        if (newly.isEmpty) changed = false
        else sat ++= newly.map { case (s, a, _) => s -> a }
      }
    }
    val rem = BigInt(budget) - sat.values.sum
    val wu = entries.filterNot(e => sat.contains(e._1)).map(_._3).sum
    entries.map { case (s, _, w) =>
      s -> sat.getOrElse(s, if (wu == 0) BigInt(0) else w * rem / wu).toLong
    }.toMap
  }

  private def waterfillLookup(
      weights: Map[String, Long]): Option[Any] => Long = {
    case None => 0L
    case Some(v) =>
      val k = v.toString
      require(weights.contains(k),
        s"waterfill: stratum '$k' has no weight — every non-null stratum " +
          "needs an explicit entry (use 0 to exclude)")
      weights(k)
  }

  /** Row-budget waterfill mix: exactly [[waterfillQuotas]]' allocation of
    * `budget` ROWS across the values of `sourceCol` (weights keyed by the
    * source rendered as a string; null sources are excluded at weight 0),
    * each source keeping its quota in the engine-portable md5(key)
    * content order. One tiny per-source count aggregate + the
    * [[takeBudgets]] two-phase bucket-prefix machinery — the corpus never
    * globally sorts and no source funnels into a single window task, so
    * the mix holds at 100 TB like every take in this module.
    */
  def takeWaterfillMix(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Map[String, Long],
      budget: Long,
      bucketHexLen: Int = 3): DataFrame = {
    val quotas = waterfillQuotas(
      sourceSizes(df, sourceCol, count(lit(1))),
      waterfillLookup(weights), budget)
    takeBudgets(df, sourceCol, keyCol, lit(1L),
      quotas.getOrElse(_, 0L), bucketHexLen)
  }

  /** TOKEN-budget waterfill mix: the allocation of [[takeWaterfillMix]]
    * run in token space — availabilities are per-source token sums (nulls
    * count 0), quotas are token budgets, and each source keeps the
    * md5-content-order prefix until its quota with the crossing row KEPT
    * ([[takeTokenBudget]]'s rule), so every source with a positive quota
    * keeps at least one row. "Fill 1 B tokens at these ratios, spilling
    * dry sources' shares to the rest" as one exact, rerun-stable take.
    */
  def takeWaterfillTokens(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      tokenCol: String,
      weights: Map[String, Long],
      budget: Long,
      bucketHexLen: Int = 3): DataFrame = {
    val quotas = waterfillQuotas(
      sourceSizes(df, sourceCol,
        sum(coalesce(col(tokenCol).cast("long"), lit(0L)))),
      waterfillLookup(weights), budget)
    takeBudgets(df, sourceCol, keyCol, col(tokenCol),
      quotas.getOrElse(_, 0L), bucketHexLen)
  }

  /** Fixed-point scale for [[doremiWeights]]: weights live on the integer
    * lattice `[0, 10^12]` (a scale-S weight of `10^12` is probability 1),
    * losses and the step size in integer MICRO-nats — the learned-filter
    * micro-nat discipline applied to the mixture-weight recursion, so the
    * whole optimization is exact integer arithmetic and hashes bit-exact
    * cross-engine.
    */
  val DoremiScale: Long = 1000000000000L

  /** Caps on the driver-side loss table behind [[doremiWeights]] — the
    * collect is (steps × domains) rows, so both axes fail loudly past
    * mixing grade (the [[takeBudgets]] classification-table discipline).
    */
  val MaxDoremiDomains: Int = 4096
  val MaxDoremiSteps: Int = 65536

  /** DoReMi domain reweighting (Xie et al. 2023, "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining"), the DATA-ENGINE
    * half: given per-(step, domain) proxy- and reference-model losses,
    * run the Group-DRO mixture-weight recursion and return the
    * time-averaged domain weights the paper feeds back into sampling.
    * The multiplicative update uses the CLASSIC multiplicative-weights
    * factor `(1 + η·λ)` (Arora, Hazan & Kale 2012, "The Multiplicative
    * Weights Update Method") in place of the paper's `exp(η·λ)` — its
    * first-order form — because `1 + η·λ` is exact on the integer
    * lattice, so the recursion is reproducible bit-for-bit on any engine
    * (libm `exp` is not correctly rounded, and one ulp at a `floor`
    * boundary would fork the hash). The recursion, all divisions FLOOR
    * on non-negative integers (S = [[DoremiScale]], K = domain count,
    * T = step count, steps iterated in ascending order):
    *
    *   λ_t[s]  = max(0, ⌊Σ_rows(proxy − ref) / n_rows⌋)   (per step t, domain s; absent → 0)
    *   u_t[s]  = ⌊w_{t-1}[s] · (S + η_micro · λ_t[s]) / S⌋         (update)
    *   n_t[s]  = ⌊u_t[s] · S / Σ_s u_t[s]⌋                         (normalize)
    *   w_t[s]  = ⌊(S − c) · n_t[s] / S⌋ + ⌊c / K⌋                  (smooth, c = smoothMicro·10^6)
    *   w_{-1}[s] = ⌊S / K⌋
    *   weight[s] = ⌊Σ_{t=0}^{T-1} w_t[s] / T⌋                      (the paper's time average)
    *
    * Defaults are the paper's: η = 1 (`etaMicro` 10^6), smoothing
    * c = 10^-3 (`smoothMicro` 1000). Per-(step, domain) excess loss is
    * the clamped mean of the per-row difference — one floor, and the
    * clamp-before-divide keeps every division non-negative, where BigInt
    * truncation and SQL floor division agree. Null domains are excluded
    * (they are not a mixable stratum); losses are integer micro-nats
    * (`round(loss · 10^6)` at the caller).
    *
    * Plan shape for 100 TB: ONE map-side-combining (step, domain)
    * aggregate over the loss log — (T × K) rows to the driver, capped
    * loudly — then the whole recursion is driver-side BigInt over that
    * tiny table (the [[waterfillQuotas]] fixpoint discipline). The loss
    * log itself never shuffles anything wider than (step, domain, diff).
    *
    * Returns (domain string form, scale-S weight) sorted by domain name —
    * feed into [[takeDoremiMix]] or persist as the mixture config.
    */
  def doremiWeights(
      losses: DataFrame,
      stepCol: String,
      domainCol: String,
      proxyCol: String,
      refCol: String,
      etaMicro: Long = 1000000L,
      smoothMicro: Long = 1000L): Seq[(String, Long)] = {
    require(etaMicro >= 0, s"etaMicro must be >= 0, got $etaMicro")
    require(smoothMicro >= 0 && smoothMicro <= 1000000L,
      s"smoothMicro must be in [0, 10^6], got $smoothMicro")
    val rows = losses
      .filter(col(domainCol).isNotNull)
      .groupBy(col(stepCol).as("__t"), col(domainCol).cast("string").as("__d"))
      .agg(
        sum(col(proxyCol).cast("long") - col(refCol).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .limit(MaxClassificationRows + 1)
      .collect()
    require(rows.length <= MaxClassificationRows,
      "doremiWeights: loss table exceeds the driver-side cap of " +
        s"$MaxClassificationRows (steps × domains) rows — aggregate to " +
        "coarser steps/domains first")
    val lam: Map[(Any, String), BigInt] = rows.map { r =>
      // an all-null (proxy − ref) group sums to SQL null — no measured
      // excess, same as absent: λ = 0
      val s = if (r.isNullAt(2)) BigInt(0) else BigInt(r.getLong(2))
      val n = BigInt(r.getLong(3))
      (r.get(0), r.getString(1)) -> (if (s > 0) s / n else BigInt(0))
    }.toMap
    val domains = rows.map(_.getString(1)).distinct.sorted.toSeq
    // ascending step order, numeric when the step is numeric (a string
    // sort would put step "10" before "2" and silently permute the
    // recursion) — matching the SQL engines' native ORDER BY
    val steps = rows.map(r => r.get(0)).distinct.sortBy {
      case n: java.lang.Number => (0, BigDecimal(n.toString), "")
      case s: String => (1, BigDecimal(0), s)
      case other => (2, BigDecimal(0), String.valueOf(other))
    }.toSeq
    require(domains.nonEmpty, "doremiWeights: no non-null domains in the loss table")
    require(domains.length <= MaxDoremiDomains,
      s"doremiWeights: ${domains.length} domains exceed $MaxDoremiDomains")
    require(steps.length <= MaxDoremiSteps,
      s"doremiWeights: ${steps.length} steps exceed $MaxDoremiSteps")
    val bigS = BigInt(DoremiScale)
    val k = BigInt(domains.length)
    val c = BigInt(smoothMicro) * BigInt(1000000L)
    var w: Map[String, BigInt] = domains.map(_ -> bigS / k).toMap
    var acc: Map[String, BigInt] = domains.map(_ -> BigInt(0)).toMap
    steps.foreach { t =>
      val u = domains.map { d =>
        d -> w(d) * (bigS + BigInt(etaMicro) *
          lam.getOrElse((t, d), BigInt(0))) / bigS
      }.toMap
      val z = u.values.sum
      val wt = domains.map { d =>
        d -> ((bigS - c) * (u(d) * bigS / z) / bigS + c / k)
      }.toMap
      w = wt
      acc = domains.map(d => d -> (acc(d) + wt(d))).toMap
    }
    val bigT = BigInt(steps.length.max(1))
    domains.map(d => d -> (acc(d) / bigT).toLong)
  }

  /** Resample a corpus to learned DoReMi weights: each domain keeps
    * `quota_s = min(c_s, ⌊budget · weight_s / S⌋)` rows (S =
    * [[DoremiScale]] — the paper resamples to the averaged weights with
    * no replacement and no redistribution, unlike the waterfill family)
    * in the engine-portable md5(key) content order. A domain absent from
    * `weights`, or a null domain, keeps nothing.
    *
    * Plan shape: quota arithmetic on the driver over the [[sourceSizes]]
    * count table, then the [[takeBudgets]] two-phase bucket-prefix take —
    * the corpus never globally sorts and no domain funnels through a
    * single window task.
    */
  def takeDoremiMix(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Seq[(String, Long)],
      budget: Long,
      bucketHexLen: Int = 3): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    weights.foreach { case (d, ws) =>
      require(ws >= 0 && ws <= DoremiScale,
        s"takeDoremiMix: weight $ws for domain '$d' outside [0, $DoremiScale]")
    }
    val wMap = weights.toMap
    require(wMap.size == weights.length, "takeDoremiMix: duplicate domains in weights")
    val quota: Option[Any] => Long = {
      case None => 0L
      case Some(v) =>
        val w = BigInt(wMap.getOrElse(v.toString, 0L))
        (BigInt(budget) * w / BigInt(DoremiScale)).toLong
    }
    takeBudgets(df, sourceCol, keyCol, lit(1L), quota, bucketHexLen)
  }

  /** EXACT top-fraction quality filter per stratum — "keep the best 25%
    * of each source by score", the percentile form of quality filtering
    * (Gopher/CCNet-style): each stratum keeps its `round(fraction · c_s)`
    * highest-`scoreCol` rows in `(score DESC nulls last, md5(key), key)`
    * order — ties at the cutoff break in the same engine-portable md5
    * content order every other take in this module uses (`keyCol` must
    * identify a row within its stratum — the usual total-order caveat).
    * The kept set is EXACT — identical to a per-stratum `row_number` over
    * that order — but the plan never sorts a whole stratum in one task:
    *
    *   1. one aggregate computes per-stratum counts + approximate score
    *      quantiles (the bucket BOUNDARIES — their accuracy affects only
    *      load balance, never the kept set);
    *   2. rows land in score-range buckets (a broadcast boundary join +
    *      one codegen array fold — no per-stratum when-chains), and one
    *      map-side-combining aggregate counts each (stratum, bucket);
    *   3. the driver prefix-sums the tiny count table in descending
    *      score-bucket order: buckets wholly above the cutoff keep every
    *      row join-free, buckets below drop, and the ONE boundary bucket
    *      per stratum resolves by a strategy chosen PER STRATUM from
    *      phase-1's measured row counts: a bucket within
    *      `maxBoundaryTaskRows` (default 2M ledger rows — every practical
    *      continuous-score take: phase 0 SELF-SIZES the bucket count so a
    *      giant stratum's buckets average ~maxBoundaryTaskRows, up to
    *      4096 buckets ≈ 8B rows per stratum) runs the exact cumsum
    *      window directly, zero extra jobs; an OVERSIZED bucket — a
    *      tie-dense score collapsing the quantile boundaries — goes
    *      through score-RUN classification instead: runs grouped by
    *      exact score value keep or drop join-free (the prefix is a
    *      window over DISTINCT scores, tiny precisely when ties are the
    *      problem), and the at-most-one straddling TIE run per stratum
    *      routes through [[takeBudgets]]' md5 sub-bucket machinery
    *      (within a tied score the keep rule IS a content-order prefix),
    *      so a binary quality flag — where the tie run is half the
    *      stratum — never funnels a stratum into one window task, and a
    *      tie-dense stratum no longer drags well-behaved strata through
    *      its extra classification jobs;
    *   4. membership attaches back through broadcast joins only — the
    *      caller's rows never shuffle.
    *
    * Rerun-deterministic even though the quantile sketch is not: the kept
    * set is a pure function of `(score, md5(key), key)` order and exact
    * counts; boundaries only move rows between the join-free and windowed
    * paths. A stratum whose budget rounds to 0 is dropped entirely.
    *
    * Scores are compared AS DOUBLES: integral scores beyond ±2^53 (or
    * decimals finer than double precision) collapse to ties broken by
    * content order — keep quality scores inside double range (every
    * practical count/ratio signal is).
    *
    * The input is evaluated once per phase (stats, bucket counts, run
    * classification, and each attach arm) — persist an expensive
    * non-file-backed frame before calling, or the exact-kept-set
    * guarantee rests on the frame being deterministic.
    *
    * STRATA-CARDINALITY contract (tightened in round 12): phase 0's
    * stats rows each carry an (nBuckets−1)-double quantile array, so the
    * strata cap is byte-honest — `max(1024, maxClassificationRows /
    * nBuckets)` distinct strata (≈31k at the default 64 buckets, 1024 at
    * 4096), not the flat `maxClassificationRows` of round 11. A
    * higher-cardinality stratum column (e.g. raw URL domains) now fails
    * loudly where it previously risked a tens-of-GB driver collect —
    * aggregate to a coarser stratum, or raise `maxClassificationRows`
    * deliberately if the driver heap is provisioned for it.
    *
    * [[takeTopFractionWithStats]] additionally returns per-stratum
    * boundary/tie skew telemetry.
    */
  def takeTopFraction(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      scoreCol: String,
      fraction: Double,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame =
    takeTopFractionWithStats(
      df, stratumCol, keyCol, scoreCol, fraction, nBuckets,
      maxClassificationRows, maxBoundaryTaskRows)._1

  /** [[takeTopFraction]] plus the per-stratum [[TopTakeStratumStats]]
    * skew telemetry (free — phase-1/2 classification data).
    */
  def takeTopFractionWithStats(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      scoreCol: String,
      fraction: Double,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows)
      : (DataFrame, Seq[TopTakeStratumStats]) = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    takeTopCore(df, stratumCol, keyCol, scoreCol, lit(1L),
      counts => counts.map { case (s, c) =>
        s -> math.round(fraction * c)
      }.toMap,
      nBuckets, maxClassificationRows, maxBoundaryTaskRows)
  }

  /** Quality-ORDERED token budget per stratum — "fill each source's 1 B
    * token budget with its highest-quality documents": rows are taken in
    * `(scoreCol DESC nulls last, md5(key), key)` order until the
    * stratum's running `tokensCol` total reaches `budget`, with the
    * crossing row kept ([[takeTokenBudget]]'s rule at score order instead
    * of content order). Null token counts count as 0. Same exactness,
    * tie-order, plan, and evaluated-once-per-phase contract as
    * [[takeTopFraction]]: identical to the naive per-stratum window, but
    * no stratum is ever sorted whole — score-range buckets classify from
    * exact TOKEN sums, the boundary bucket classifies per score RUN, and
    * only the cutoff tie run's md5 sub-boundary sub-bucket is windowed.
    */
  def takeTopTokenBudget(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame =
    takeTopTokenBudgetWithStats(
      df, stratumCol, keyCol, scoreCol, tokensCol, budget, nBuckets,
      maxClassificationRows, maxBoundaryTaskRows)._1

  /** [[takeTopTokenBudget]] plus the per-stratum [[TopTakeStratumStats]]
    * skew telemetry (weights are TOKENS here, not rows).
    */
  def takeTopTokenBudgetWithStats(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows)
      : (DataFrame, Seq[TopTakeStratumStats]) = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    takeTopCore(df, stratumCol, keyCol, scoreCol,
      coalesce(col(tokensCol).cast("long"), lit(0L)),
      counts => counts.map { case (s, _) => s -> budget }.toMap,
      nBuckets, maxClassificationRows, maxBoundaryTaskRows)
  }

  /** Boundary-bucket rows above which the score-ordered takes switch from
    * the direct one-task boundary window to the run/tie classification
    * path (see [[takeTopFraction]] step 3). 2M narrow ledger rows ≈ a
    * hundred MB in one sort task — the comfortable ceiling; a tie-dense
    * score blows far past it and routes through the scale-safe machinery.
    */
  val MaxBoundaryTaskRows: Long = 2000000L

  /** Per-stratum skew telemetry from the score-ordered takes
    * ([[takeTopFractionWithStats]] / [[takeTopTokenBudgetWithStats]]):
    * how much of the stratum's weight (rows for the fraction take, tokens
    * for the budget take) landed in the score-range boundary bucket, and
    * how much of the stratum is tied exactly AT the cutoff score.
    * `boundaryShare` near 1/nBuckets is healthy; a large `tieShare` means
    * the score is discrete at the cutoff (a binary quality flag shows
    * ~0.5 here) — exact either way, the tie region rides the md5
    * sub-bucket path, so this is load-balance visibility, not a
    * correctness signal. Strata with no boundary bucket (budget ≥ total
    * or budget 0) report 0 for both; `tieWeight` is measured only when
    * the run/tie path engaged (a boundary bucket over
    * `maxBoundaryTaskRows`) — direct-windowed buckets report 0 there.
    */
  final case class TopTakeStratumStats(
      stratum: Option[Any],
      totalWeight: Long,
      boundaryWeight: Long,
      tieWeight: Long) {
    def boundaryShare: Double =
      if (totalWeight <= 0L) 0.0 else boundaryWeight.toDouble / totalWeight
    def tieShare: Double =
      if (totalWeight <= 0L) 0.0 else tieWeight.toDouble / totalWeight
  }

  /** Shared score-ordered two-phase core of [[takeTopFraction]] and
    * [[takeTopTokenBudget]]: `tokens` is the per-row weight the budget
    * consumes (`lit(1)` = row counting), `budgetsOf` maps the FULL
    * per-stratum row-count table (phase 0's own aggregate — so quota
    * arithmetic that needs every stratum's size, like the temperature
    * mix, costs no second pass) to the per-stratum budget map. Keep
    * rule: running-weight-before-row < budget in `(score DESC nulls
    * last, md5(key), key)` order — for unit weights that is exactly
    * "rank ≤ budget".
    *
    * Round-11 boundary handling: the round-10 form ran one `(score DESC,
    * key)` window over the whole boundary bucket, which degenerates to a
    * single-task full-stratum sort when the score is tie-dense (a binary
    * quality flag collapses the quantile boundaries and one bucket IS the
    * stratum). Now the boundary bucket classifies per score RUN — grouped
    * by exact score value (map-side combining), prefixed by a window over
    * DISTINCT scores — and only the at-most-one straddling TIE run per
    * stratum does ordered work, via [[takeBudgets]]' md5 sub-bucket
    * machinery (within a tied score the keep rule reduces to a
    * content-order prefix, which is exactly the order md5 buckets
    * refine).
    *
    * Round-12 refinements: (a) the direct-vs-run/tie choice is PER
    * STRATUM (phase 1 measures every boundary bucket's row count), so
    * one tie-dense stratum no longer routes every stratum through the
    * two extra classification jobs; (b) phase 0 SELF-SIZES the bucket
    * count — when the largest stratum would average more than
    * `maxBoundaryTaskRows` rows per bucket, the quantiles are recomputed
    * once at a finer width (≤ 4096) so a CONTINUOUS score's boundary
    * bucket fits the direct window up to ~4096 × maxBoundaryTaskRows
    * (≈ 8B rows) per stratum; (c) the phase-0 stats collect cap is
    * byte-honest (scaled by the quantile-array width). Residual, stated
    * honestly: a continuous-score stratum BEYOND ~8B rows still resolves
    * exactly, but its distinct-score prefix window takes ~bucket-sized
    * narrow-row input in one task. No task ever holds more than
    * max(maxBoundaryTaskRows, distinct-scores-in-one-bucket,
    * tie-region/16^3) ledger rows.
    */
  /** The SELF-SIZING bucket rule shared by [[takeTopCore]] and
    * [[qualityPartition]]: run `phase0` at the requested bucket count;
    * if the largest stratum would average more than
    * `maxBoundaryTaskRows` rows per bucket, re-run ONCE at a finer
    * width (2× margin for sketch error, capped at 4096) so a
    * CONTINUOUS score's boundary bucket fits the direct one-task
    * window. Returns (effective bucket count, phase-0 result).
    */
  private def selfSizedPhase0[T](
      phase0: Int => T,
      maxStratumCount: T => Long,
      nBuckets: Int,
      maxBoundaryTaskRows: Long): (Int, T) = {
    var nEff = nBuckets
    var r = phase0(nEff)
    val maxCnt = maxStratumCount(r)
    if (nEff < 4096 && maxCnt / nEff > maxBoundaryTaskRows) {
      nEff = math.min(4096L,
        math.max(nEff.toLong, 2L * (maxCnt / maxBoundaryTaskRows + 1L))).toInt
      r = phase0(nEff)
    }
    (nEff, r)
  }

  /** bucket(score) = number of quantile boundaries <= score
    * (0 .. nBuckets-1); null scores sit below every bucket (-1); a null
    * bounds array (empty stratum sketch) buckets everything to 0.
    * Order-consistent with (score DESC): higher score ⇒ same-or-higher
    * bucket. Shared by [[takeTopCore]] (bounds joined per stratum) and
    * [[qualityPartition]] (bounds as one literal array).
    */
  private def bucketOfBounds(score: Column, bounds: Column): Column =
    when(score.isNull, lit(-1)).otherwise(
      aggregate(coalesce(bounds, array().cast("array<double>")),
        lit(0), (acc, b) => acc + when(score >= b, 1).otherwise(0)))

  private def takeTopCore(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      scoreCol: String,
      tokens: Column,
      budgetsOf: Seq[(Option[Any], Long)] => Map[Option[Any], Long],
      nBuckets: Int,
      maxClassificationRows: Int,
      maxBoundaryTaskRows: Long): (DataFrame, Seq[TopTakeStratumStats]) = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"nBuckets must be in [2, 4096], got $nBuckets")
    require(maxBoundaryTaskRows >= 1,
      s"maxBoundaryTaskRows must be >= 1, got $maxBoundaryTaskRows")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val spark = df.sparkSession

    // phase 0: per-stratum counts + approx quantile boundaries
    // (ascending). The strata cap is BYTE-honest, not row-honest: each
    // stats row carries an (n-1)-double quantile array, so the cap scales
    // down with the bucket count (at 4096 buckets a maxClassificationRows
    // collect would be tens of GB) — floored so mixing-grade strata
    // (10s–1000s) always fit.
    def phase0(n: Int): Array[org.apache.spark.sql.Row] = {
      val statCap = math.max(1024, maxClassificationRows / math.max(2, n))
      val probs = (1 until n).map(_.toDouble / n)
      val rows = df.groupBy(col(stratumCol).as("__s"))
        .agg(
          count(lit(1)).as("__c"),
          percentile_approx(col(scoreCol).cast("double"),
            lit(probs.toArray), lit(1000)).as("__bounds"))
        .limit(statCap + 1).collect()
      require(rows.length <= statCap,
        s"top-by-score take: stratum '$stratumCol' exceeds $statCap " +
        s"distinct values (the quantile-stats byte budget at $n buckets) " +
        "— aggregate to a coarser stratum first")
      rows
    }
    // SELF-SIZING bucket count ([[selfSizedPhase0]]): paid only by giant
    // strata — one extra aggregate against a corpus that large is noise,
    // and it buys boundary buckets of ~maxBoundaryTaskRows up to
    // 4096 × 2M ≈ 8B rows per stratum. Beyond that, a continuous-score
    // stratum's boundary still resolves exactly via the run path, with
    // the documented ~bucket-sized narrow-row distinct-score window as
    // the residual cost. Tie-dense strata are unaffected: their runs
    // collapse regardless of bucket width.
    val (nEff, statRows) = selfSizedPhase0(phase0,
      (rows: Array[org.apache.spark.sql.Row]) =>
        if (rows.isEmpty) 0L else rows.iterator.map(_.getLong(1)).max,
      nBuckets, maxBoundaryTaskRows)
    val bSchema = StructType(Seq(
      StructField("__bs", statRows.headOption.map(_.schema("__s").dataType)
        .getOrElse(StringType), nullable = true),
      StructField("__bounds", ArrayType(DoubleType), nullable = true)))
    val boundsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(statRows.toSeq.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.getSeq[Double](2))), 1), bSchema)
    def bucketOf(score: Column): Column = bucketOfBounds(score, col("__bounds"))

    // phase 1: per-(stratum, bucket) weights AND row counts — strata ×
    // nBuckets at most (the row count picks the boundary strategy below)
    val slim = df.select(
      col(stratumCol).as("__s"), col(keyCol).as("__k"),
      col(scoreCol).cast("double").as("__v"), tokens.as("__t"))
      .join(broadcast(boundsDf), col("__s") <=> col("__bs"), "left")
      .withColumn("__b", bucketOf(col("__v")))
      .select(col("__s"), col("__k"), col("__v"), col("__t"), col("__b"))
    val bucketCounts = slim.groupBy("__s", "__b")
      .agg(sum("__t").as("__n"), count(lit(1)).as("__rc"))
      .limit(maxClassificationRows + 1).collect()
    require(bucketCounts.length <= maxClassificationRows,
      s"top-by-score take: stratum × bucket classification exceeds " +
      s"$maxClassificationRows rows — lower nBuckets or coarsen the stratum")

    // driver prefix in DESCENDING bucket order (highest scores first).
    // Keep rule is running-weight-BEFORE-row < budget (crossing row kept),
    // so a bucket whose whole range ends strictly under the budget keeps
    // all rows and the at-most-one straddling bucket per stratum goes
    // through the score-run machinery with its start as offset. The fold
    // also collects the per-stratum totals + boundary weights for the
    // skew telemetry — free, it is the same classification data.
    val budgets: Map[Option[Any], Long] = budgetsOf(statRows.toSeq.map { r =>
      ((if (r.isNullAt(0)) None else Some(r.get(0))): Option[Any], r.getLong(1))
    })
    val statsAcc =
      scala.collection.mutable.ArrayBuffer.empty[(Option[Any], Long, Long)]
    val clsRows = bucketCounts
      .groupBy(r => if (r.isNullAt(0)) None else Some(r.get(0)))
      .iterator.flatMap { case (stratum, rows) =>
        val budget = budgets.getOrElse(stratum, 0L)
        val total = rows.iterator.map(_.getLong(2)).sum
        var boundaryW = 0L
        var before = 0L
        val out = rows.sortBy(-_.getInt(1)).flatMap { r =>
          val n = r.getLong(2)
          val start = before
          before += n
          // STRICT keep-all bound (same as takeBudgets): a bucket ending
          // exactly AT the budget must go through run classification —
          // its positive-weight rows all pass cum-before < budget there,
          // but a ZERO-weight row in a later bucket starting at the
          // budget must not be admitted by a <= class test
          if (budget <= 0L) None
          else if (start + n < budget)
            Some(org.apache.spark.sql.Row(
              r.get(0), r.getInt(1), true, 0L, budget, true))
          else if (start < budget) {
            boundaryW = n
            // boundary strategy, PER STRATUM from phase-1's measured row
            // count: a boundary bucket that fits one task (every
            // practical continuous-score take — ~1/nBuckets of its
            // stratum, and self-sizing above keeps that near
            // maxBoundaryTaskRows even for giant strata) windows DIRECTLY
            // with zero extra driver jobs; an oversized bucket — the
            // tie-dense degeneracy this machinery exists for — pays the
            // run/tie path. Strata choose independently, so one
            // tie-dense stratum no longer drags every well-behaved
            // stratum through the two extra classification jobs.
            Some(org.apache.spark.sql.Row(
              r.get(0), r.getInt(1), false, start, budget,
              r.getLong(3) <= maxBoundaryTaskRows))
          } else None
        }
        statsAcc += ((stratum, total, boundaryW))
        out
      }.toSeq
    val sType = slim.schema("__s").dataType
    val cls = spark.createDataFrame(
      spark.sparkContext.parallelize(clsRows, 1),
      StructType(Seq(
        StructField("__cs", sType, nullable = true),
        StructField("__cb", IntegerType, nullable = false),
        StructField("__keep_all", BooleanType, nullable = false),
        StructField("__off", LongType, nullable = false),
        StructField("__budget", LongType, nullable = false),
        StructField("__direct", BooleanType, nullable = false))))
    val hasDirect = clsRows.exists(r => !r.getBoolean(2) && r.getBoolean(5))
    val hasRunTie = clsRows.exists(r => !r.getBoolean(2) && !r.getBoolean(5))
    val hasBoundary = hasDirect || hasRunTie

    // phase 2: score-RUN classification inside boundary buckets. One
    // map-side-combining aggregate per (stratum, exact score value), then
    // a running prefix over DISTINCT scores — the window input is the
    // per-run table, not the ledger: tiny when the score is tie-dense
    // (the case that used to degenerate), ~bucket-sized narrow rows when
    // the score is continuous (in which case the bucket is ~1/nBuckets of
    // the stratum and the old plan did the same work on wider rows).
    val runCls = slim.join(
        broadcast(cls.where(!col("__keep_all") && !col("__direct"))),
        col("__s") <=> col("__cs") && col("__b") === col("__cb"))
      .groupBy(col("__s"), col("__v"), col("__off"), col("__budget"))
      .agg(sum(col("__t")).as("__sw"))
      .withColumn("__bef",
        col("__off") +
          sum(col("__sw")).over(Window.partitionBy(col("__s"))
            .orderBy(col("__v").desc_nulls_last)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__sw"))
    // runs wholly under the budget keep every row join-free (strict, so a
    // zero-weight row sitting exactly at the budget can never slip in)
    val runsKeepAll = runCls
      .where(col("__bef") + col("__sw") < col("__budget"))
      .select(col("__s").as("__rs"), col("__v").as("__rv"),
        lit(true).as("__runkeep"))
    // the at-most-one straddling TIE run per stratum, collected with its
    // remaining budget — ≤ 1 row per stratum, same strata bound as phase 0
    val tieRows: Array[org.apache.spark.sql.Row] =
      if (!hasRunTie) Array.empty
      else runCls
        .where(col("__bef") < col("__budget") &&
          col("__bef") + col("__sw") >= col("__budget"))
        .select(col("__s"), col("__v"),
          (col("__budget") - col("__bef")).as("__tb"), col("__sw"))
        .limit(maxClassificationRows + 1).collect()
    require(tieRows.length <= maxClassificationRows,
      s"top-by-score take: stratum '$stratumCol' exceeds " +
      s"$maxClassificationRows tie-run rows — aggregate to a coarser " +
      "stratum first")
    def stratumOf(r: org.apache.spark.sql.Row): Option[Any] =
      if (r.isNullAt(0)) None else Some(r.get(0))
    val tieBudgets: Map[Option[Any], Long] =
      tieRows.iterator.map(r => stratumOf(r) -> r.getLong(2)).toMap
    val tieWeights: Map[Option[Any], Long] =
      tieRows.iterator.map(r => stratumOf(r) -> r.getLong(3)).toMap

    // attach: ONE pass over the caller's rows, broadcast lookups only —
    // the categories are mutually exclusive by construction (a row is in
    // a keep-all bucket, OR a keep-all score run of the boundary bucket,
    // OR the tie run — score values never span buckets), so left joins +
    // an OR filter preserve multiplicity exactly.
    val dfScore = df(scoreCol).cast("double")
    val base = df
      .join(broadcast(boundsDf), df(stratumCol) <=> col("__bs"), "left")
      .withColumn("__db", bucketOf(dfScore))
      .join(broadcast(cls.where(col("__keep_all"))),
        df(stratumCol) <=> col("__cs") && col("__db") === col("__cb"), "left")
    var attached = base
    val keepFlags = scala.collection.mutable.ArrayBuffer[Column](
      coalesce(col("__keep_all"), lit(false)))
    if (hasDirect) {
      // direct boundary window (the phase-1 counts proved those strata's
      // boundary buckets each fit one task): the exact cumsum over the
      // whole boundary bucket in the full (score DESC nulls last, md5,
      // key) order — identical kept set, no run/tie jobs for these strata
      val wD = Window.partitionBy(col("__s"))
        .orderBy(col("__v").desc_nulls_last,
          md5(col("__k").cast("string").cast("binary")).asc, col("__k").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val directKeys = slim.join(
          broadcast(cls.where(!col("__keep_all") && col("__direct"))),
          col("__s") <=> col("__cs") && col("__b") === col("__cb"))
        .withColumn("__cum", sum(col("__t")).over(wD))
        .where(col("__off") + col("__cum") - col("__t") < col("__budget"))
        .select(col("__s").as("__dks"), col("__k").as("__dkk"),
          lit(true).as("__in_direct"))
      attached = attached.join(broadcast(directKeys),
        df(stratumCol) <=> col("__dks") && df(keyCol) <=> col("__dkk"), "left")
      keepFlags += coalesce(col("__in_direct"), lit(false))
    }
    if (hasRunTie) {
        // run/tie path. The tie run reduces to a content-order prefix
        // with the remaining budget — takeBudgets' md5 sub-bucket
        // machinery inlined so the attach stays ONE pass: sub-bucket the
        // tie ledger, classify per (stratum, sub-bucket) on the driver,
        // and window ONLY the sub-boundary sub-bucket (~1/16^3 of the
        // tie region, never the run).
        val tieHexLen = 3
        val tieDf = spark.createDataFrame(
          spark.sparkContext.parallelize(tieRows.toSeq.map(r =>
            org.apache.spark.sql.Row(r.get(0), r.get(1))), 1),
          StructType(Seq(
            StructField("__zs", sType, nullable = true),
            StructField("__zv", DoubleType, nullable = true))))
        val tieLedger = slim
          .join(broadcast(tieDf),
            col("__s") <=> col("__zs") && col("__v") <=> col("__zv"))
          .withColumn("__b2",
            substring(md5(col("__k").cast("string").cast("binary")), 1, tieHexLen))
        val cls2Rows: Seq[org.apache.spark.sql.Row] =
          if (tieRows.isEmpty) Seq.empty
          else {
            val sums = tieLedger.groupBy("__s", "__zv", "__b2")
              .agg(sum("__t").as("__sum"))
              .limit(maxClassificationRows + 1).collect()
            require(sums.length <= maxClassificationRows,
              s"top-by-score take: tie-region sub-bucket classification " +
              s"exceeds $maxClassificationRows rows — coarsen the stratum")
            sums.groupBy(r => if (r.isNullAt(0)) None else Some(r.get(0)))
              .iterator.flatMap { case (stratum, rows) =>
                val budget = tieBudgets.getOrElse(stratum, 0L)
                var before = 0L
                // null sub-bucket (null key) first, then hex asc — the
                // sub-bucket is the leading prefix of the (md5, key) order
                rows.sortBy(r => (if (r.isNullAt(2)) "" else "" + r.getString(2)))
                  .flatMap { r =>
                    val n = r.getLong(3)
                    val start = before
                    before += n
                    if (budget <= 0L) None
                    else if (start + n < budget)
                      Some(org.apache.spark.sql.Row(
                        r.get(0), r.get(1), r.get(2), true, 0L, budget))
                    else if (start < budget)
                      Some(org.apache.spark.sql.Row(
                        r.get(0), r.get(1), r.get(2), false, start, budget))
                    else None
                  }
              }.toSeq
          }
        val cls2 = spark.createDataFrame(
          spark.sparkContext.parallelize(cls2Rows, 1),
          StructType(Seq(
            StructField("__c2s", sType, nullable = true),
            StructField("__c2v", DoubleType, nullable = true),
            StructField("__c2b", StringType, nullable = true),
            StructField("__keep2", BooleanType, nullable = false),
            StructField("__off2", LongType, nullable = false),
            StructField("__budget2", LongType, nullable = false))))
        // the exact windowed cumsum — the ONLY ledger sort anywhere on
        // this path — over the sub-boundary sub-bucket's rows, in the
        // (md5, key) order the sub-buckets refine
        val w2 = Window.partitionBy(col("__s"))
          .orderBy(md5(col("__k").cast("string").cast("binary")).asc,
            col("__k").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tieBoundaryKeys = tieLedger
          .join(broadcast(cls2.where(!col("__keep2"))),
            col("__s") <=> col("__c2s") && col("__b2") <=> col("__c2b"))
          .withColumn("__cum", sum(col("__t")).over(w2))
          .where(col("__off2") + col("__cum") - col("__t") < col("__budget2"))
          .select(col("__s").as("__ks"), col("__k").as("__kk"),
            lit(true).as("__in_tie_boundary"))
        val dfB2 = substring(
          md5(df(keyCol).cast("string").cast("binary")), 1, tieHexLen)
        attached = attached
          .join(broadcast(runsKeepAll),
            df(stratumCol) <=> col("__rs") && dfScore <=> col("__rv"), "left")
          .join(broadcast(cls2.where(col("__keep2"))),
            df(stratumCol) <=> col("__c2s") && dfScore <=> col("__c2v") &&
              dfB2 <=> col("__c2b"), "left")
          .join(broadcast(tieBoundaryKeys),
            df(stratumCol) <=> col("__ks") && df(keyCol) <=> col("__kk"), "left")
        keepFlags += coalesce(col("__runkeep"), lit(false))
        keepFlags += coalesce(col("__keep2"), lit(false))
        keepFlags += coalesce(col("__in_tie_boundary"), lit(false))
      }
    val withFlags = attached.where(keepFlags.reduce(_ || _))
    val result = withFlags.drop(
      "__bs", "__bounds", "__db", "__cs", "__cb", "__keep_all", "__off",
      "__budget", "__direct", "__rs", "__rv", "__runkeep", "__c2s", "__c2v",
      "__c2b", "__keep2", "__off2", "__budget2", "__ks", "__kk",
      "__in_tie_boundary", "__dks", "__dkk", "__in_direct")
    val stats = statsAcc.toSeq
      .sortBy { case (s, _, _) => (s.nonEmpty, s.map(_.toString).getOrElse("")) }
      .map { case (s, total, bw) =>
        TopTakeStratumStats(s, total, bw, tieWeights.getOrElse(s, 0L))
      }
    (result, stats)
  }

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169) as one
    * entry point: rank raw documents by how TARGET-like their token mass
    * is ([[TextOps.contrastScore]]'s exact integers), band them by the
    * importance ratio, allocate a token budget across bands by importance
    * MASS, and select within each band in the engine-portable md5 content
    * order — importance resampling at band granularity, built so every
    * arithmetic step recomputes identically on any engine:
    *
    *   - the per-doc importance ratio `(sum_target_freq + 1) /
    *     (sum_raw_freq + 1)` is never materialized as a float: documents
    *     band by `clamp(floor(log2(ratio)), ±maxBand)`, computed with one
    *     integer division and a binary-digit count — integer ops, no log;
    *   - band budgets follow importance mass (`2^band ×` the band's token
    *     total — a power-of-two scaling of an integer, IEEE-exact), folded
    *     in band-ascending order: `budget_b = min(tok_b,
    *     round(tokenBudget · mass_b / Σmass))`;
    *   - membership inside a band is [[takeBudgets]]' two-phase
    *     bucket-prefix take (crossing row kept), so the caller's rows
    *     never shuffle and no band funnels through a single window task.
    *
    * Returns the SELECTED documents' contrast rows + `band` — narrow by
    * construction; semi-join the corpus on `idCol` for the full rows.
    * Documents with no tokens carry no importance evidence and are never
    * selected (they have no [[TextOps.contrastScore]] row). An empty raw
    * corpus selects nothing.
    *
    * Scale shape: two token-keyed shuffles (the contrast signal), one tiny
    * per-band aggregate to the driver (≤ 2·maxBand+1 rows), then the
    * scale-safe take — corpus text rides no shuffle at all.
    */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      targetTextCol: String,
      tokenBudget: Long,
      maxBand: Int = 8,
      bucketHexLen: Int = 3): DataFrame = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    require(maxBand >= 1 && maxBand <= 16,
      s"maxBand must be in [1, 16], got $maxBand")
    val cs = TextOps.contrastScore(raw, target, idCol, textCol, targetTextCol)
    // floor(log2((t+1)/(r+1))) via p = (t+1)·2^maxBand div (r+1):
    // floor(log2(p)) = digits(bin(p)) − 1, then shift back by maxBand —
    // both engines agree digit-for-digit (no float log anywhere)
    val p = expr(
      s"(sum_target_freq + 1L) * ${1L << maxBand}L div (sum_raw_freq + 1L)")
    val bandRaw = when(p <= 0L, lit(-maxBand))
      .otherwise(length(bin(p)) - 1 - maxBand)
    // materialized: the contrast lineage (two corpus-wide token shuffles)
    // otherwise re-runs for the totals collect, for takeBudgets' phase-1
    // aggregate, AND for the caller's action — the banded frame is narrow
    // (id + four counters + band) by construction
    val banded = Materialize.eager(cs.withColumn("band",
      least(greatest(bandRaw, lit(-maxBand)), lit(maxBand)).cast("int")))
    // per-band token totals — ≤ 2·maxBand+1 rows to the driver
    val totals: Seq[(Int, Long)] = banded
      .groupBy(col("band")).agg(sum(col("n_toks")).as("tk"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
    // importance mass per band: 2^band · tok_band — a power-of-two scaling
    // of an integer is exact in IEEE double regardless of association, so
    // quota arithmetic recomputes identically on any engine (the fold runs
    // band-ascending to pin the one order-dependent step, the Σ)
    val mass = totals.map { case (b, tk) => (b, tk, math.pow(2.0, b) * tk) }
    val m = mass.foldLeft(0.0)(_ + _._3)
    val budgets: Map[Int, Long] =
      if (m <= 0.0) Map.empty
      else mass.map { case (b, tk, w) =>
        b -> math.min(tk, math.round(tokenBudget * w / m))
      }.toMap
    takeBudgets(banded, "band", idCol, col("n_toks"),
      {
        case Some(b: Int) => budgets.getOrElse(b, 0L)
        case _ => 0L
      },
      bucketHexLen)
  }

  /** Deterministic, engine-portable GLOBAL training-order shuffle: every
    * row gets its position in the `md5(epoch # key)` order — the epoch
    * shuffle a training pipeline runs between passes. A different `epoch`
    * seed yields an uncorrelated order; the same epoch reproduces the
    * same positions on any cluster, rerun, or engine (md5 of the same
    * string). Output = input columns + `pos` (0-based long); materialize
    * the shuffled order with `orderBy("pos")` into a sink, or
    * `repartitionByRange` on it.
    *
    * Plan shape for 100 TB — no global single-task sort anywhere: the
    * md5 bucket prefix IS the leading prefix of the sort key (the
    * [[takeBudgets]] discipline), so one map-side-combining per-bucket
    * count (≤ 16^bucketHexLen rows to the driver), a driver prefix sum,
    * and a per-bucket `row_number` window (each bucket ~1/16^hexLen of
    * the corpus, uniform by construction) plus a broadcast offset yield
    * the exact global rank. Size `bucketHexLen` so a bucket's ledger fits
    * one window task: the default 4 (65 536 buckets) puts a 100 TB
    * narrow-ledger corpus at ~1.5 GB per task; 5 (1 M buckets, still
    * under the driver cap) divides it again by 16.
    *
    * Null keys cannot hash to a position and are rejected loudly, and so
    * are DUPLICATE keys (round 12): tied keys would take their
    * `row_number` from partition order — positions that silently change
    * across reruns/clusters — so a lag-equality tripwire inside the
    * per-bucket window (dups sort adjacent; same window, no extra cost)
    * fails the job on the first duplicate instead of leaving the caveat
    * to documentation. Pass a unique id.
    */
  def epochShuffle(
      df: DataFrame,
      keyCol: String,
      epoch: Long,
      bucketHexLen: Int = 4,
      maxClassificationRows: Int = MaxClassificationRows): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 6,
      s"bucketHexLen must be in [1, 6], got $bucketHexLen")
    require(!df.columns.contains("pos"),
      "epochShuffle adds a 'pos' column — rename the existing one first")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    def hashOf(key: Column): Column =
      md5(concat(lit(epoch.toString), lit("#"), key.cast("string"))
        .cast("binary"))
    val bucketOf = substring(hashOf(col(keyCol)), 1, bucketHexLen)
    val counts = df.select(bucketOf.as("__b")).groupBy("__b").count()
      .limit(maxClassificationRows + 1).collect()
    require(counts.length <= maxClassificationRows,
      s"epochShuffle: 16^$bucketHexLen buckets exceed " +
      s"$maxClassificationRows driver rows — lower bucketHexLen")
    require(counts.forall(!_.isNullAt(0)),
      s"epochShuffle: null '$keyCol' keys cannot be ordered — filter or " +
      "fill them first")
    // driver prefix in bucket (= hash-prefix) order: each bucket's offset
    // is the count of all rows hashing strictly below it
    var acc = 0L
    val offRows = counts.sortBy(_.getString(0)).map { r =>
      val o = acc
      acc += r.getLong(1)
      org.apache.spark.sql.Row(r.getString(0), o)
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(
        StructField("__b", StringType, nullable = false),
        StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy(col("__b"))
      .orderBy(hashOf(col(keyCol)).asc, col(keyCol).asc)
    // duplicate-key tripwire, riding the SAME window (equal keys hash to
    // the same bucket and sort adjacent, so a lag-equality catches every
    // dup; row_number ties between dup rows would otherwise make their
    // positions partition-order-dependent, silently breaking the
    // "same positions on any cluster/rerun" contract). The check lives
    // INSIDE the pos expression so column pruning can never drop it, and
    // lag shares the window spec — one WindowExec, no extra shuffle.
    df.withColumn("__b", bucketOf)
      .join(broadcast(offDf), Seq("__b"))
      .withColumn("pos",
        when(lag(col(keyCol), 1).over(w) === col(keyCol),
          raise_error(concat(
            lit(s"epochShuffle: duplicate '$keyCol' key "),
            col(keyCol).cast("string"),
            lit(" — duplicate keys have no deterministic order; " +
              "deduplicate or re-key first"))).cast("long"))
        .otherwise(col("__off") + row_number().over(w).cast("long") - 1L))
      .drop("__b", "__off")
  }

  /** Multi-epoch training schedule: epochs `startEpoch ..
    * startEpoch+nEpochs-1` concatenated into ONE frame — each row appears
    * `nEpochs` times tagged `(epoch, pos)`, where `pos` is the row's
    * [[epochShuffle]] position within its epoch OFFSET by `epochIndex ·
    * N`, so ordering the whole frame by `pos` replays the exact
    * multi-epoch run order (every epoch an independent engine-portable
    * permutation, uncorrelated across epochs — the "reshuffle each
    * epoch" every training loop wants, materialized).
    *
    * Plan: one count + `nEpochs` independent epochShuffle plans unioned —
    * each epoch's permutation is genuinely different work, so the cost is
    * inherently nEpochs passes; persist the input first if it is not
    * file-backed (each arm scans it). No global sort anywhere
    * ([[epochShuffle]]'s bucket machinery per arm).
    */
  def multiEpochOrder(
      df: DataFrame,
      keyCol: String,
      nEpochs: Int,
      startEpoch: Long = 0L,
      bucketHexLen: Int = 4): DataFrame = {
    require(nEpochs >= 1 && nEpochs <= 1000,
      s"nEpochs must be in [1, 1000], got $nEpochs")
    require(!df.columns.contains("epoch"),
      "multiEpochOrder adds an 'epoch' column — rename the existing one first")
    val n = df.count()
    (0 until nEpochs).map { i =>
      val e = startEpoch + i
      epochShuffle(df, keyCol, e, bucketHexLen)
        .withColumn("epoch", lit(e))
        .withColumn("pos", col("pos") + lit(i.toLong * n))
    }.reduce(_ unionByName _)
  }

  /** Curriculum training order: every row's EXACT global position in
    * `(stage ASC, md5(epoch # key), key)` order — the curriculum-learning
    * recipe (Bengio et al. 2009; short-to-long, clean-to-noisy) where
    * training visits stage 0 first, stage 1 second, …, SHUFFLED within
    * each stage by the same engine-portable hash order [[epochShuffle]]
    * uses, so each epoch reshuffles within stages while the stage
    * progression stands.
    *
    * Same no-global-sort plan as [[epochShuffle]] with the stage as a
    * leading group column: per-(stage, bucket) counts → driver prefix sum
    * in (stage, bucket) order → per-group `row_number` + broadcast
    * offsets. The driver table is #stages × 16^`bucketHexLen` rows
    * (guarded); stages are ordinal by definition, so `stageCol` must be
    * integral — reject floats/strings loudly rather than inherit an
    * engine-specific collation.
    *
    * Null stages and null keys are rejected loudly. Duplicate keys WITHIN
    * a stage are caught by the same in-window lag tripwire as
    * [[epochShuffle]] (dups hash to one bucket and sort adjacent); the
    * same key appearing in TWO stages is two distinct curriculum items
    * and keeps deterministic positions (the stage leads the sort).
    */
  def curriculumShuffle(
      df: DataFrame,
      keyCol: String,
      stageCol: String,
      epoch: Long,
      bucketHexLen: Int = 4,
      maxClassificationRows: Int = MaxClassificationRows): DataFrame = {
    require(bucketHexLen >= 1 && bucketHexLen <= 6,
      s"bucketHexLen must be in [1, 6], got $bucketHexLen")
    require(!df.columns.contains("pos"),
      "curriculumShuffle adds a 'pos' column — rename the existing one first")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    df.schema(stageCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"curriculumShuffle: stage column '$stageCol' must be integral " +
          s"(ordinal stages), got $t")
    }
    val spark = df.sparkSession
    def hashOf(key: Column): Column =
      md5(concat(lit(epoch.toString), lit("#"), key.cast("string"))
        .cast("binary"))
    val stageOf = col(stageCol).cast("long")
    val bucketOf = substring(hashOf(col(keyCol)), 1, bucketHexLen)
    val counts = df.select(stageOf.as("__s"), bucketOf.as("__b"))
      .groupBy("__s", "__b").count()
      .limit(maxClassificationRows + 1).collect()
    require(counts.length <= maxClassificationRows,
      s"curriculumShuffle: stages × 16^$bucketHexLen groups exceed " +
      s"$maxClassificationRows driver rows — lower bucketHexLen or " +
      "coarsen the stages")
    require(counts.forall(!_.isNullAt(0)),
      s"curriculumShuffle: null '$stageCol' stages cannot be ordered — " +
      "assign every row a stage first")
    require(counts.forall(!_.isNullAt(1)),
      s"curriculumShuffle: null '$keyCol' keys cannot be ordered — " +
      "filter or fill them first")
    var acc = 0L
    val offRows = counts.sortBy(r => (r.getLong(0), r.getString(1))).map { r =>
      val o = acc
      acc += r.getLong(2)
      org.apache.spark.sql.Row(r.getLong(0), r.getString(1), o)
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      StructType(Seq(
        StructField("__s", LongType, nullable = false),
        StructField("__b", StringType, nullable = false),
        StructField("__off", LongType, nullable = false))))
    val w = Window.partitionBy(col("__s"), col("__b"))
      .orderBy(hashOf(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__s", stageOf)
      .withColumn("__b", bucketOf)
      .join(broadcast(offDf), Seq("__s", "__b"))
      .withColumn("pos",
        when(lag(col(keyCol), 1).over(w) === col(keyCol),
          raise_error(concat(
            lit(s"curriculumShuffle: duplicate '$keyCol' key "),
            col(keyCol).cast("string"),
            lit(s" within one '$stageCol' stage — duplicate keys have " +
              "no deterministic order; deduplicate or re-key first")))
            .cast("long"))
        .otherwise(col("__off") + row_number().over(w).cast("long") - 1L))
      .drop("__s", "__b", "__off")
  }

  /** Deterministic GLOBAL sample: exactly `n` rows from the whole corpus
    * (not per stratum), picked in the engine-portable md5(key) content
    * order — "cut a reproducible 1 M-doc sample" without a global sort or
    * a single-task window. This is the constant-stratum form of
    * [[takeBudgets]]' two-phase machinery: bucket counts → driver prefix →
    * whole buckets keep join-free and only the ONE boundary bucket
    * (~1/16^bucketHexLen of the corpus) runs a window. Samples NEST:
    * a larger `n` contains every smaller one (the md5-order prefix
    * property every take here shares), so growing a sample never
    * re-selects. Smaller corpora return whole.
    *
    * Expect a `WindowExec: No Partition Defined` warning from the
    * constant-stratum plans of this whole `takeGlobal*` family: the
    * literal stratum constant-folds to an empty partition spec, but the
    * window's INPUT is the one straddling bucket alone (bounded by the
    * classification machinery; PlanSpec pins the executed row count) —
    * it is not a global sort.
    */
  def takeGlobal(
      df: DataFrame,
      keyCol: String,
      n: Long,
      bucketHexLen: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val one = Iterator.from(0).map(i => if (i == 0) "__g" else s"__g$i")
      .find(!df.columns.contains(_)).get
    takeBudgets(df.withColumn(one, lit(1)), one, keyCol, lit(1L),
      _ => n, bucketHexLen)
      .drop(one)
  }

  /** [[takeGlobal]] in TOKEN space: the md5-content-order prefix of the
    * WHOLE corpus until `budget` tokens, crossing row kept
    * ([[takeTokenBudget]]'s rule at one global stratum) — "cut a
    * reproducible 1 B-token sample of the corpus". Null token counts
    * count as 0; same nesting, plan, and determinism as [[takeGlobal]].
    */
  def takeGlobalTokens(
      df: DataFrame,
      keyCol: String,
      tokensCol: String,
      budget: Long,
      bucketHexLen: Int = 3): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val one = Iterator.from(0).map(i => if (i == 0) "__g" else s"__g$i")
      .find(!df.columns.contains(_)).get
    takeBudgets(df.withColumn(one, lit(1)), one, keyCol,
      coalesce(col(tokensCol).cast("long"), lit(0L)), _ => budget,
      bucketHexLen)
      .drop(one)
  }

  /** Score-ordered GLOBAL take: "keep the best `fraction` of the WHOLE
    * corpus by score" — [[takeTopFraction]]'s exact keep rule (rank ≤
    * round(fraction · corpus count) in `(score DESC nulls last,
    * md5(key), key)` order) at one constant stratum, so the whole
    * two-phase plan applies: score-range buckets keep/drop join-free and
    * only the boundary bucket does ordered work. With a single global
    * stratum the boundary bucket is ~1/nBuckets of the CORPUS — phase
    * 0's self-sizing (see [[takeTopFraction]] step 3) is what keeps that
    * near `maxBoundaryTaskRows` at 100 TB. Same nesting property as
    * [[takeGlobal]]: for a fixed score column, a larger fraction's kept
    * set contains every smaller one (the keep rule is a prefix of one
    * fixed global order).
    */
  def takeGlobalTopFraction(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      fraction: Double,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame = {
    val one = Iterator.from(0).map(i => if (i == 0) "__g" else s"__g$i")
      .find(!df.columns.contains(_)).get
    takeTopFraction(df.withColumn(one, lit(1)), one, keyCol, scoreCol,
      fraction, nBuckets, maxClassificationRows, maxBoundaryTaskRows)
      .drop(one)
  }

  /** Score-ordered GLOBAL token budget: "fill a corpus-wide 1 B-token
    * budget with the highest-quality documents" — [[takeTopTokenBudget]]'s
    * keep rule (running token weight before the row < `budget` in
    * `(score DESC nulls last, md5(key), key)` order, crossing row kept)
    * at one constant stratum. Same plan and nesting notes as
    * [[takeGlobalTopFraction]]; null token counts count as 0.
    */
  def takeGlobalTokensTop(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      tokensCol: String,
      budget: Long,
      nBuckets: Int = 64,
      maxClassificationRows: Int = MaxClassificationRows,
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame = {
    val one = Iterator.from(0).map(i => if (i == 0) "__g" else s"__g$i")
      .find(!df.columns.contains(_)).get
    takeTopTokenBudget(df.withColumn(one, lit(1)), one, keyCol, scoreCol,
      tokensCol, budget, nBuckets, maxClassificationRows, maxBoundaryTaskRows)
      .drop(one)
  }

  /** CCNet-style quality PARTITION (Wenzek et al. 2020 split the crawl
    * into head/middle/tail by LM-perplexity terciles): label every row
    * with its exact global quantile bucket in `(score DESC nulls last,
    * md5(key), key)` order — bucket 0 holds the best `round(f₁·n)` rows,
    * bucket i the rows between cutoffs i and i+1, bucket
    * `fractions.size` the tail. The label of a row at global rank r is
    * `min { i : r ≤ round(fᵢ·n) }` (else the tail) — identical to
    * membership in the nested [[takeGlobalTopFraction]] kept sets, but
    * computed in ONE shared pass instead of one full two-phase take per
    * cutoff (round-15: the K-cutoff form re-scanned the scored ledger
    * per cutoff; phase-0 stats and phase-1 bucket counts are
    * cutoff-independent, so all K boundaries now resolve against the
    * same classification):
    *
    *   1. ONE stats aggregate (count + self-sized approximate score
    *      quantiles — [[takeTopFraction]] step 1 at a single global
    *      stratum) and ONE per-bucket count aggregate;
    *   2. the driver prefix-sums the ≤ 4096-row bucket table once in
    *      descending score order and labels every bucket not straddled
    *      by any cutoff — those rows get their label from a broadcast
    *      literal array, join-free per cutoff;
    *   3. the ≤ K straddled buckets resolve per row: a bucket within
    *      `maxBoundaryTaskRows` windows directly (ALL straddled buckets
    *      in one window pass, partitioned by bucket); an oversized one —
    *      the tie-dense degeneracy — classifies per exact-score RUN
    *      (uniform runs label join-free), and only the ≤ K straddled
    *      TIE runs route through the md5 sub-bucket machinery, where
    *      uniform sub-buckets label join-free and the ≤ K sub-boundary
    *      sub-buckets (~1/16³ of their tie run) take the only ledger
    *      windows on the path;
    *   4. labels attach back through broadcast lookups only — the
    *      caller's rows never shuffle, and the number of input scans is
    *      CONSTANT in the cutoff count (PlanSpec-pinned).
    *
    * Exactness, determinism, self-sizing, and the tie-order contract are
    * [[takeTopFraction]]'s verbatim (the per-level uniform/straddled
    * split is decided on exact counts; quantile-sketch error only moves
    * rows between the join-free and windowed paths). The input is
    * evaluated once per phase — pass a materialized narrow
    * `(key, score, …)` frame when the scores are expensive to derive.
    */
  def qualityPartition(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      fractions: Seq[Double],
      nBuckets: Int = 64,
      bucketCol: String = "bucket",
      maxBoundaryTaskRows: Long = MaxBoundaryTaskRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    require(fractions.nonEmpty, "qualityPartition needs at least one cutoff")
    require(fractions.forall(f => f > 0.0 && f < 1.0) &&
      fractions.sliding(2).forall(s => s.size < 2 || s(0) < s(1)),
      s"cutoff fractions must be strictly increasing within (0, 1): $fractions")
    require(!df.columns.contains(bucketCol),
      s"qualityPartition: input already has a '$bucketCol' column")
    // every internal column materialized on or joined against the
    // CALLER's frame in the attach phase — a caller column with one of
    // these names would be silently clobbered by withColumn or dropped
    // at the end
    val reserved = Seq("__db", "__base", "__dk", "__dl", "__uv", "__ul",
      "__c2v", "__c2b", "__sl", "__wk", "__wl")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"qualityPartition: input columns ${clash.mkString(", ")} collide " +
      "with reserved internal names — rename them first")
    require(nBuckets >= 2 && nBuckets <= 4096,
      s"nBuckets must be in [2, 4096], got $nBuckets")
    require(maxBoundaryTaskRows >= 1,
      s"maxBoundaryTaskRows must be >= 1, got $maxBoundaryTaskRows")
    val spark = df.sparkSession
    val tail = fractions.size

    // phase 0: ONE count + quantile aggregate, self-sized exactly like
    // takeTopCore (a single global stratum, so the stats row is one row)
    def phase0(n: Int): (Long, Seq[Double]) = {
      val probs = (1 until n).map(_.toDouble / n)
      val r = df.agg(
        count(lit(1)).as("__c"),
        percentile_approx(col(scoreCol).cast("double"),
          lit(probs.toArray), lit(1000)).as("__bounds")).head()
      (r.getLong(0), if (r.isNullAt(1)) Seq.empty[Double] else r.getSeq[Double](1).toSeq)
    }
    val (nEff, (total, bounds)) = selfSizedPhase0(phase0,
      (t: (Long, Seq[Double])) => t._1, nBuckets, maxBoundaryTaskRows)
    if (total == 0L)
      return df.withColumn(bucketCol, lit(tail).cast("int"))
    val budgets: Seq[Long] = fractions.map(f => math.round(f * total))
    // label of global rank r; rows of a range (start, end] share it iff
    // no budget falls strictly inside (start, end)
    def labelAt(rank: Long): Int = {
      val i = budgets.indexWhere(rank <= _)
      if (i < 0) tail else i
    }
    def isStraddled(start: Long, end: Long): Boolean =
      budgets.exists(b => b > start && b < end)
    def labelOfRank(rank: Column): Column =
      budgets.zipWithIndex.foldRight(lit(tail): Column) {
        case ((b, i), rest) => when(rank <= b, lit(i)).otherwise(rest)
      }

    // bounds ride the plan as ONE literal array (a single global stratum
    // needs no boundary join); ≤ 4095 doubles
    def bucketOf(score: Column): Column =
      bucketOfBounds(score, typedLit(bounds))
    val mdKey: Column => Column = k => md5(k.cast("string").cast("binary"))
    val slim = df.select(col(keyCol).as("__k"),
        col(scoreCol).cast("double").as("__v"))
      .withColumn("__b", bucketOf(col("__v")))

    // phase 1: ONE per-bucket count aggregate (≤ nEff+1 rows), then the
    // single driver prefix that classifies every bucket for ALL cutoffs
    val bucketCounts: Seq[(Int, Long)] = slim.groupBy("__b")
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
    final case class BucketCls(
        bucket: Int, start: Long, uniform: Option[Int], direct: Boolean)
    var before = 0L
    val cls = bucketCounts.sortBy(-_._1).map { case (b, n) =>
      val start = before
      before += n
      if (!isStraddled(start, start + n))
        BucketCls(b, start, Some(labelAt(start + n)), direct = false)
      else BucketCls(b, start, None, direct = n <= maxBoundaryTaskRows)
    }
    val byBucket: Map[Int, BucketCls] = cls.map(c => c.bucket -> c).toMap
    // literal lookup tables indexed by bucket id (-1 .. nEff-1 → 1-based
    // element_at at id+2): uniform label (null = resolve finer) + start
    val labelArr: Seq[Option[Int]] =
      (-1 until nEff).map(id => byBucket.get(id).flatMap(_.uniform))
    val startArr: Seq[Long] =
      (-1 until nEff).map(id => byBucket.get(id).map(_.start).getOrElse(0L))
    def bucketStart(b: Column): Column =
      element_at(typedLit(startArr), b + lit(2))

    val joins = scala.collection.mutable.ArrayBuffer.empty[(DataFrame, Column => Column, String)]
    // straddled buckets that fit one task: ONE window pass over all of
    // them (partitioned per bucket), exact global rank = bucket start +
    // within-bucket cumcount in the full (score DESC nulls last, md5,
    // key) order
    val directBuckets = cls.filter(c => c.uniform.isEmpty && c.direct).map(_.bucket)
    if (directBuckets.nonEmpty) {
      val wD = Window.partitionBy(col("__b"))
        .orderBy(col("__v").desc_nulls_last, mdKey(col("__k")).asc, col("__k").asc)
      val labeled = slim.where(col("__b").isin(directBuckets: _*))
        .withColumn("__r",
          bucketStart(col("__b")) + row_number().over(wD).cast("long"))
        .select(col("__k").as("__dk"), labelOfRank(col("__r")).as("__dl"))
      joins += ((labeled, k => k <=> col("__dk"), "__dl"))
    }
    // oversized straddled buckets — the tie-dense path: classify per
    // exact-score run; uniform runs label join-free by score value (a
    // score maps to exactly one bucket, so the value alone is the key)
    val runBuckets = cls.filter(c => c.uniform.isEmpty && !c.direct).map(_.bucket)
    if (runBuckets.nonEmpty) {
      val runLedger = slim.where(col("__b").isin(runBuckets: _*))
      val wR = Window.partitionBy(col("__b")).orderBy(col("__v").desc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runCls = runLedger.groupBy(col("__b"), col("__v"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__end", bucketStart(col("__b")) + sum(col("__n")).over(wR))
        .withColumn("__start", col("__end") - col("__n"))
      val runStraddled = budgets
        .map(b => lit(b) > col("__start") && lit(b) < col("__end"))
        .reduce(_ || _)
      joins += ((
        runCls.where(!runStraddled)
          .select(col("__v").as("__uv"), labelOfRank(col("__end")).as("__ul")),
        (_: Column) => col(scoreCol).cast("double") <=> col("__uv"), "__ul"))
      // the ≤ K straddled TIE runs: within a tied score the rank order
      // is the (md5, key) content order, so takeBudgets' md5 sub-bucket
      // machinery applies — classify sub-buckets on the driver, window
      // only the ≤ K sub-boundary sub-buckets
      val tieRuns = runCls.where(runStraddled)
        .select(col("__v"), col("__start")).collect()
      if (tieRuns.nonEmpty) {
        val tieDf = spark.createDataFrame(
          spark.sparkContext.parallelize(tieRuns.toSeq.map(r =>
            org.apache.spark.sql.Row(r.get(0), r.getLong(1))), 1),
          StructType(Seq(
            StructField("__zv", DoubleType, nullable = true),
            StructField("__zs", LongType, nullable = false))))
        val tieHexLen = 3
        val tieLedger = runLedger
          .join(broadcast(tieDf), col("__v") <=> col("__zv"))
          .withColumn("__b2", substring(mdKey(col("__k")), 1, tieHexLen))
        val subCounts = tieLedger
          .groupBy(col("__zv"), col("__zs"), col("__b2"))
          .agg(count(lit(1)).as("__n")).collect()
        final case class SubCls(
            v: Any, b2: String, start: Long, uniform: Option[Int])
        val subCls: Seq[SubCls] = subCounts
          .groupBy(r => Option(r.get(0))).iterator.flatMap { case (_, rows) =>
            var at = rows.head.getLong(1)
            // null sub-bucket (null key) first, then hex asc — the
            // leading prefix of the (md5, key) order
            rows.sortBy(r => Option(r.getString(2)).getOrElse(""))
              .map { r =>
                val n = r.getLong(3)
                val s = at
                at += n
                SubCls(r.get(0), r.getString(2), s,
                  if (!isStraddled(s, s + n)) Some(labelAt(s + n)) else None)
              }
          }.toSeq
        val subSchema = StructType(Seq(
          StructField("__c2v", DoubleType, nullable = true),
          StructField("__c2b", StringType, nullable = true),
          StructField("__c2s", LongType, nullable = false),
          StructField("__c2l", IntegerType, nullable = true)))
        def subFrame(rows: Seq[SubCls]) = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(c =>
            org.apache.spark.sql.Row(c.v, c.b2, c.start,
              c.uniform.map(Integer.valueOf).orNull)), 1), subSchema)
        val uniformSubs = subCls.filter(_.uniform.nonEmpty)
        if (uniformSubs.nonEmpty) {
          val sb2 = substring(mdKey(col(keyCol)), 1, tieHexLen)
          joins += ((
            subFrame(uniformSubs).select(col("__c2v"), col("__c2b"),
              col("__c2l").as("__sl")),
            (_: Column) => col(scoreCol).cast("double") <=> col("__c2v") &&
              sb2 <=> col("__c2b"), "__sl"))
        }
        val boundarySubs = subCls.filter(_.uniform.isEmpty)
        if (boundarySubs.nonEmpty) {
          val w2 = Window.partitionBy(col("__zv"), col("__b2"))
            .orderBy(mdKey(col("__k")).asc, col("__k").asc)
          val labeled = tieLedger.join(
              broadcast(subFrame(boundarySubs)),
              col("__zv") <=> col("__c2v") && col("__b2") <=> col("__c2b"))
            .withColumn("__r",
              col("__c2s") + row_number().over(w2).cast("long"))
            .select(col("__k").as("__wk"), labelOfRank(col("__r")).as("__wl"))
          joins += ((labeled, k => k <=> col("__wk"), "__wl"))
        }
      }
    }

    // attach: the uniform-bucket label is a literal array lookup; every
    // finer level is a broadcast join. Levels are mutually exclusive by
    // construction, so coalesce order is immaterial.
    val base = df
      .withColumn("__db", bucketOf(col(scoreCol).cast("double")))
      .withColumn("__base", element_at(typedLit(labelArr), col("__db") + lit(2)))
    val attached = joins.foldLeft(base) { case (acc, (tbl, cond, _)) =>
      acc.join(broadcast(tbl), cond(acc(keyCol)), "left")
    }
    val label = coalesce(
      (joins.toSeq.map { case (_, _, c) => col(c) } :+ col("__base")): _*)
    attached
      .withColumn(bucketCol, label.cast("int"))
      .drop("__db", "__base", "__dk", "__dl", "__uv", "__ul",
        "__c2v", "__c2b", "__sl", "__wk", "__wl")
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
