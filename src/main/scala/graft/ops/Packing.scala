package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking and sequence packing — the last mile of a
  * training-data pipeline, where cleaned documents become fixed-capacity
  * training sequences.
  *
  * Three operators, in increasing packing quality:
  *
  *   - [[chunkByTokens]]: split each document independently into
  *     fixed-stride token windows (long-doc handling; pure per-row
  *     generator, zero shuffle);
  *   - [[concatChunkPlan]]: the GPT-style "concatenate then chop" plan —
  *     documents are laid end-to-end in a deterministic order and cut at
  *     capacity boundaries; fully window-expressible (one shuffle on the
  *     group key), exact-oracle-able, but documents may straddle bins;
  *   - [[packFirstFitDecreasing]]: true bin packing (no straddling, FFD's
  *     11/9·OPT+1 bin-count guarantee) — inherently a sequential decision
  *     per group, so it runs inside `flatMapGroups` over md5-bucketed
  *     groups.
  *
  * Determinism everywhere: group assignment is a prefix of the md5 of the
  * id (content-keyed like [[Sampling]] — stable across runs, partitionings,
  * and engines), in-group order is the id itself, so a 100 TB corpus packs
  * identically on every rerun. The prefix width scales with `nGroups`
  * (⌈log₁₆ nGroups⌉ hex digits), so groups can be sliced fine enough that
  * corpus/nGroups rows genuinely fit one executor at any corpus size.
  */
object Packing {

  /** Fixed-stride sliding token windows per document: starts 1, 1+stride,
    * 1+2·stride, … while ≤ token count; each chunk is the next `chunkSize`
    * tokens (shorter at the tail). Overlap = chunkSize − stride tokens.
    * A pure generator expression — explode fused into the scan, no shuffle,
    * no state; documents chunk independently so the op scales linearly.
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize] — stride=$stride chunkSize=$chunkSize " +
        "would silently drop the tokens between windows")
    val toks = TextOps.wsTokens(col(textCol))
    val starts = when(size(toks) >= 1, sequence(lit(1), size(toks), lit(stride)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol), toks.as("__toks"), explode(starts).as("__s"))
      .select(
        col(idCol),
        // (__s - 1) is an exact multiple of stride, so the double division
        // is exact and the cast loses nothing
        ((col("__s") - 1) / lit(stride)).cast("bigint").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("__s") + 1)
          .cast("bigint").as("n_chunk_tokens"))
  }

  /** Deterministic group id in [0, nGroups): the first ⌈log₁₆ nGroups⌉ hex
    * digits of the md5 of the id rendered as a string, mod nGroups —
    * reproducible in any engine with md5 (the same trick as
    * [[Sampling.md5StratifiedSample]]). One digit for nGroups ≤ 16 (so
    * historical group assignments are unchanged), up to three for the 4096
    * maximum; the digit count grows with nGroups so the modulo never folds
    * a coarse prefix onto a fine group count.
    */
  private[ops] def md5GroupDigits(nGroups: Int): Int = {
    // smallest d with 16^d >= nGroups — integer arithmetic, no log rounding
    var d = 1
    var span = 16L
    while (span < nGroups) { d += 1; span *= 16L }
    d
  }

  private def md5Group(idCol: String, nGroups: Int) =
    pmod(
      conv(
        substring(md5(col(idCol).cast("string").cast("binary")), 1, md5GroupDigits(nGroups)),
        16, 10).cast("int"),
      lit(nGroups))

  /** Concat-and-chunk packing plan: within each md5 group, documents are
    * laid end-to-end in id order and cut every `capacity` tokens. Returns
    * one row per document — its group, token count, the bins its tokens
    * land in (`bin_first`..`bin_last`; a document straddles a boundary
    * when they differ), and its token offset inside the first bin.
    *
    * One shuffle (the window's partition-by on the group key), then pure
    * exact integer arithmetic on the running total — which is why this
    * variant is oracle-able while true bin packing is not. `nGroups`
    * bounds each window partition at corpus/nGroups rows; at real scale
    * pick nGroups ≫ executor count (up to 4096 — the group key takes as
    * many md5 digits as the count needs).
    */
  def concatChunkPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nGroups: Int): DataFrame =
    concatChunkPlan(df, idCol, textCol, capacity, nGroups, TextOps.tokenCount)

  /** Variant with a caller-supplied token counter — e.g.
    * [[TextOps.bpeTokenCount]] or the broadcast-model column from
    * [[TextOps.bpeTokenCountFromMerges]], so packing budgets can match a
    * real tokenizer instead of whitespace counts.
    */
  def concatChunkPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nGroups: Int,
      tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(nGroups >= 1 && nGroups <= 4096, s"nGroups must be in [1, 4096], got $nGroups")
    val w = Window.partitionBy(col("grp")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(idCol),
      md5Group(idCol, nGroups).as("grp"),
      tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(
        col(idCol), col("grp"), col("n_tokens"),
        expr(s"cast((__cum - n_tokens) div $capacity as bigint)").as("bin_first"),
        expr(s"""cast(case when n_tokens = 0 then (__cum - n_tokens) div $capacity
                 else (__cum - 1) div $capacity end as bigint)""").as("bin_last"),
        expr(s"cast((__cum - n_tokens) % $capacity as bigint)").as("offset_in_bin"))
  }

  /** Materialize the [[concatChunkPlan]] layout into ACTUAL training
    * sequences: one row per (group, bin) with the bin's text — documents
    * laid end-to-end in id order, split exactly at capacity boundaries
    * (a straddling document contributes a fragment to each bin it spans).
    * Every bin holds exactly `capacity` tokens except each group's last.
    *
    * Two shuffles, both bounded: the running-total window (carrying each
    * doc's token array once), and the final (grp, bin) aggregate whose
    * groups are ≤ capacity tokens BY CONSTRUCTION — so executor memory
    * per task is bounded by capacity × bins-per-task regardless of corpus
    * size, the property that makes this the 100 TB-safe way to emit
    * sequences (concatenating a whole group's text first would hold
    * corpus/nGroups tokens in one value).
    *
    * Exact integer arithmetic end-to-end (same math as the plan), so the
    * emitted sequences are engine-reproducible and oracle-checkable.
    */
  def materializeBins(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nGroups: Int): DataFrame = {
    require(nGroups >= 1 && nGroups <= 4096, s"nGroups must be in [1, 4096], got $nGroups")
    materializeBinsCore(df, idCol, textCol, capacity, md5Group(idCol, nGroups))
  }

  /** The shared binning engine of [[materializeBins]] (md5-hash groups in
    * id order) and [[materializeEpochOrder]] (stride groups in shuffled
    * position order): `grp` is any caller-supplied bounded-cardinality
    * grouping expression, `orderCol` the total order within a group.
    */
  private def materializeBinsCore(
      df: DataFrame,
      orderCol: String,
      textCol: String,
      capacity: Long,
      grp: org.apache.spark.sql.Column): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val w = Window.partitionBy(col("grp")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
      col(orderCol),
      grp.as("grp"),
      TextOps.wsTokens(col(textCol)).as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("bigint"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .where(col("n_tokens") > 0)
      .withColumn("__g0", col("__cum") - col("n_tokens"))
      // the bins this doc touches: g0 div cap .. (cum-1) div cap
      .withColumn("bin",
        explode(sequence(expr(s"__g0 div $capacity"), expr(s"(__cum - 1) div $capacity"))))
      // fragment of the doc landing in this bin, 0-based [s0, e0)
      .withColumn("__s0", greatest(lit(0L), col("bin") * capacity - col("__g0")))
      .withColumn("__e0", least(col("n_tokens"), (col("bin") + 1) * capacity - col("__g0")))
      .withColumn("__frag",
        slice(col("__toks"), (col("__s0") + 1).cast("int"), (col("__e0") - col("__s0")).cast("int")))
      .groupBy(col("grp"), col("bin"))
      .agg(
        concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col(orderCol).as("i"), col("__frag").as("f")))),
          e => e("f")))).as("bin_text"),
        sum(col("__e0") - col("__s0")).as("n_tokens"))
  }

  /** Materialize ONE TRAINING EPOCH's shuffled global order into
    * capacity-token sequences, end to end and bucket-parallel — the
    * composition a training-data pipeline runs last: shuffle
    * ([[Sampling.epochShuffle]]: every doc's exact global position in the
    * md5(epoch#key) order, no global sort), shard the position space by
    * STRIDE (`grp = pos % nGroups` — exactly a distributed data loader's
    * worker assignment: worker w trains on samples w, w+W, w+2W, … of the
    * shuffled order), and concat-chunk each worker's stream in position
    * order at `capacity` tokens ([[materializeBins]]' exact integer
    * math). Returns (grp, bin, bin_text, n_tokens): worker `grp`'s
    * training sequence `bin`.
    *
    * The naive formulation is `orderBy(pos)` + a single running window —
    * the one global sort this engine otherwise avoids; here every stage
    * keys on a bounded column (hash bucket, then stride), so no task ever
    * sees more than corpus/nGroups rows and no exchange is
    * single-partition (PlanSpec-pinned). Deterministic for a given
    * (epoch, corpus): positions, strides, and bin boundaries are all
    * exact integer functions of md5 — any engine reproduces the same
    * sequences byte for byte.
    */
  def materializeEpochOrder(
      df: DataFrame,
      keyCol: String,
      textCol: String,
      epoch: Long,
      capacity: Long,
      nGroups: Int): DataFrame = {
    require(nGroups >= 1 && nGroups <= 4096, s"nGroups must be in [1, 4096], got $nGroups")
    val shuffled = Sampling.epochShuffle(df, keyCol, epoch)
    materializeBinsCore(shuffled, "pos", textCol, capacity,
      pmod(col("pos"), lit(nGroups.toLong)).cast("int"))
  }

  /** First-fit-decreasing bin packing per md5 group: documents sorted by
    * (tokens desc, id), each placed in the first bin with room, a new bin
    * otherwise. No document straddles bins; a document larger than
    * `capacity` gets a bin of its own (it must be [[chunkByTokens]]'d
    * first if that is not acceptable). Returns (id, grp, bin, n_tokens);
    * bins are numbered from 0 per group in creation order.
    *
    * The group is the unit of sequential work: `flatMapGroups` holds one
    * group's (id, tokens) pairs in memory and runs the O(docs × bins)
    * first-fit scan — size `nGroups` (up to 4096) so corpus/nGroups rows
    * fit an executor. Deterministic: content-keyed groups, total sort
    * order, no ties possible. Ids may be integral (sorted numerically,
    * matching historical placements) or strings — URLs, UUIDs — sorted
    * lexicographically; any other id type is rejected loudly rather than
    * silently null-cast.
    */
  def packFirstFitDecreasing(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nGroups: Int): DataFrame =
    packFirstFitDecreasing(df, idCol, textCol, capacity, nGroups, TextOps.tokenCount)

  /** Variant with a caller-supplied token counter (see the
    * [[concatChunkPlan]] twin) — real-tokenizer budgets compose here too.
    */
  def packFirstFitDecreasing(
      df: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long,
      nGroups: Int,
      tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(nGroups >= 1 && nGroups <= 4096, s"nGroups must be in [1, 4096], got $nGroups")
    // the typed flatMapGroups path carries the id as a string (round-trips
    // exactly for integral and string ids); anything else — floats, dates,
    // structs — would change meaning under the cast, so reject it
    val idType = df.schema(idCol).dataType
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0 && d.precision <= 18
      case _ => false
    }
    require(integral || idType == org.apache.spark.sql.types.StringType,
      s"packFirstFitDecreasing needs an integral or string id column, $idCol is $idType")
    // integral ids keep their numeric in-group order (10 after 2, not
    // before) so placements match the pre-string-support behavior
    val ord: Ordering[(String, Long)] =
      if (integral) Ordering.by { case (id, tok) => (-tok, id.toLong) }
      else Ordering.by { case (id, tok) => (-tok, id) }
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      md5Group(idCol, nGroups).as("_1"),
      col(idCol).cast("string").as("_2"),
      tokenCount(col(textCol)).cast("long").as("_3"))
      .as[(Int, String, Long)]
    prepared.groupByKey(_._1)
      .flatMapGroups { (grp, it) =>
        val docs = it.map { case (_, id, tok) => (id, tok) }.toArray.sorted(ord)
        val binTotals = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.iterator.map { case (id, tok) =>
          var bin = binTotals.indexWhere(_ + tok <= capacity)
          if (bin < 0) { binTotals += 0L; bin = binTotals.length - 1 }
          binTotals(bin) += tok
          (id, grp, bin, tok)
        }
      }
      .toDF(idCol, "grp", "bin", "n_tokens")
      .withColumn(idCol, col(idCol).cast(idType))
  }
}
