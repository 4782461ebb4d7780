package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag or drop corpus documents that share word
  * n-grams with an evaluation/benchmark set — the standard guard against
  * train/test leakage in a training-data pipeline (the n-gram-overlap rule
  * popularized by the GPT-3 and PaLM data cards).
  *
  * Plan shape for 100 TB: the eval side is small (benchmark suites are at
  * most a few hundred MB), so its distinct gram keys BROADCAST; the corpus
  * side explodes its grams map-side and probes the broadcast hash table —
  * corpus text never shuffles, corpus grams never shuffle, and only the
  * matching (id, gram-key) pairs (a vanishingly small fraction) reach the
  * final per-document aggregate. Gram keys are 16-hex-char md5 prefixes
  * (64 bits), not gram text, so the broadcast table and the matched rows
  * stay compact — and md5 (not xxhash64) keeps the key reproducible in any
  * engine for the oracle.
  */
object Decontam {

  /** Sliding word `n`-grams over the whitespace tokens, space-joined;
    * empty array under `n` tokens. Delegates to [[Dedup.shingles]], whose
    * token array is LET-BOUND — a naive `transform` over a captured
    * `split(...)` re-runs the split regex per gram (the round-1 minhash
    * pathology), turning each document into O(tokens²) regex work.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    Dedup.shingles(text, n)
  }

  /** 64-bit gram join key: first 16 hex chars of md5(gram). */
  def gramKey(gram: Column): Column =
    substring(md5(gram.cast("binary")), 1, 16)

  /** Per-document contamination report: corpus documents sharing at least
    * one word `n`-gram with `evalSet`, with the count of DISTINCT shared
    * grams as `n_shared_grams`. Set `broadcastEval = false` only if the
    * eval side is too large to broadcast (then AQE picks the join).
    */
  private def grams(
      df: DataFrame, textCol: String, n: Int, keep: Seq[Column],
      foldCase: Boolean = false) = {
    val t = if (foldCase) lower(col(textCol)) else col(textCol)
    df.select(keep :+ explode(wordNgrams(t, n)).as("__gram"): _*)
      .select(keep :+ gramKey(col("__gram")).as("__g"): _*)
  }

  private def evalSide(
      evalSet: DataFrame, textCol: String, n: Int, bcast: Boolean,
      foldCase: Boolean = false): DataFrame = {
    val evalGrams = grams(evalSet, textCol, n, Seq.empty, foldCase).distinct()
    if (bcast) broadcast(evalGrams) else evalGrams
  }

  /** `foldCase = true` lowercases both sides before gram matching — the
    * normalization the published decontamination recipes apply (the GPT-3
    * data card matches on lowercased n-grams), so a re-cased leak ("The
    * Quick Brown Fox…" quoted in a different style) still counts as
    * contamination. Default false: exact matching, byte-for-byte.
    */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true,
      foldCase: Boolean = false): DataFrame =
    grams(corpus, textCol, n, Seq(col(idCol)), foldCase)
      .join(evalSide(evalSet, textCol, n, broadcastEval, foldCase), Seq("__g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared_grams"))

  /** Corpus minus the contaminated documents. Lighter than anti-joining
    * the report: dropping needs only the distinct contaminated IDS, so the
    * corpus grams left-semi probe the broadcast eval table and bare ids —
    * not per-doc gram sets for a countDistinct — reach the one shuffle.
    * No broadcast hint on the final anti-join: the contaminated set is
    * bounded by the CORPUS, not the eval set, so AQE must size it (it
    * will broadcast the usual tiny case at runtime).
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true,
      foldCase: Boolean = false): DataFrame = {
    val contaminated = grams(corpus, textCol, n, Seq(col(idCol)), foldCase)
      .join(evalSide(evalSet, textCol, n, broadcastEval, foldCase), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** SPAN-level decontamination: instead of dropping whole documents,
    * remove exactly the tokens covered by any shared n-gram — the surgical
    * variant for when a 10 000-token document contains one leaked
    * benchmark sentence. Returns every corpus row plus `cleaned` (covered
    * tokens removed, survivors space-joined; null text stays null) and
    * `n_removed_tokens`.
    *
    * Plan: eval gram keys broadcast exactly as in [[decontaminate]]; the
    * corpus's matched gram START positions come back as one small per-doc
    * array (only matching (id, position) pairs ever shuffle — never text),
    * and coverage is pure array math fused into the scan: token j is
    * removed iff some matched start s satisfies s ≤ j < s + n.
    */
  def redactContaminated(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    val matches = corpus
      .select(col(idCol), posexplode(wordNgrams(col(textCol), n)).as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), gramKey(col("__gram")).as("__g"))
      .join(evalSide(evalSet, textCol, n, broadcastEval), Seq("__g"))
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__starts"))
    redactByStarts(corpus, matches, idCol, textCol, n)
  }

  /** Shared tail of the span-removal ops: join the per-doc matched-start
    * arrays back onto the corpus and remove exactly the covered tokens.
    * `starts` must be `(idCol, __starts: array<int>)`, one row per doc
    * that has at least one matched gram start (0-based token positions).
    * Coverage is pure array math fused into the scan: token j is removed
    * iff some matched start s satisfies s ≤ j < s + n.
    */
  private def redactByStarts(
      corpus: DataFrame,
      starts: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    corpus.join(starts, Seq(idCol), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__toks", TextOps.wsTokens(col(textCol)))
      .withColumn("__kept",
        keptOutsideWindows(col("__toks"), col("__starts"), n))
      .withColumn("cleaned",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", col("__kept"))))
      .withColumn("n_removed_tokens",
        // null text tokenizes to null arrays whose size() is null under
        // ANSI semantics — nothing was removed from it, so report 0
        coalesce((size(col("__toks")) - size(col("__kept"))).cast("bigint"), lit(0L)))
      .drop("__starts", "__toks", "__kept")

  /** Per-document exact repeated-substring report — the corpus analysed
    * against ITSELF instead of an eval set: for every document, how many
    * of its distinct word `n`-grams also occur in at least `minDocs`
    * documents corpus-wide (the doc itself included). Exact-substring
    * duplication at the n-gram level is the signal behind suffix-array
    * training-data dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022 — public paper); this is its
    * shuffle-friendly n-gram form. Output: `(idCol, n_grams,
    * n_dup_grams)` for every document with at least one gram.
    *
    * Plan shape for 100 TB: text never shuffles. The per-doc DISTINCT
    * (id, gram-key) pairs are 24-byte rows with map-side partial
    * aggregation; gram multiplicities are counted by a second narrow
    * aggregate keyed on the 64-bit gram key alone (never a collected doc
    * list — stop-phrase grams occurring in millions of documents cost one
    * counter, not one array), and the count table joins back on the same
    * gram-key partitioning before the final per-doc rollup.
    */
  def repeatedGramReport(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val pg = grams(corpus, textCol, n, Seq(col(idCol))).distinct()
    val gc = pg.groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
    pg.join(gc, Seq("__g"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__nd") >= minDocs, 1L).otherwise(0L)).as("n_dup_grams"))
  }

  /** [[contaminationReport]] for eval sets TOO LARGE TO BROADCAST — e.g.
    * decontaminating one corpus partition against the full held-out split
    * of another. `broadcastEval = false` already handles this correctly,
    * but it shuffles EVERY corpus gram to the join; here a Bloom filter
    * over the eval gram keys (a few MB regardless of eval size, built by
    * one pass over the eval side) prunes the corpus grams MAP-SIDE first,
    * so only near-matches — true hits plus an `fpp` fraction of false
    * positives — reach the shuffle. The exact confirm join then removes
    * the false positives, so the result is IDENTICAL to
    * [[contaminationReport]]; the bloom stage only cuts shuffle volume.
    *
    * Probe is Spark's own codegen `BloomFilterMightContain` (the
    * expression behind runtime row-level join filtering) over
    * `xxhash64(gram-key)` — whole-stage codegen, no UDF. The filter rides
    * the plan as a binary literal; at fpp=1e-3 and 100 M eval grams that
    * is ~180 MB of bits, so size `fpp` to the eval side (1e-2 ⇒ ~120 MB
    * per billion grams). Costs one extra count job over the eval grams to
    * size the filter.
    */
  def contaminationReportBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      fpp: Double = 0.001): DataFrame = {
    // three consumers (count, bloom aggregate, confirm join) — materialize
    // the distinct eval gram keys once instead of re-tokenizing the eval
    // corpus three times
    val ev = Materialize.eager(grams(evalSet, textCol, n, Seq.empty).distinct())
    val bytes = gramKeyBloom(ev)(fpp)
    grams(corpus, textCol, n, Seq(col(idCol)))
      .where(bloomMightContainKey(bytes, col("__g")))
      .join(ev, Seq("__g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared_grams"))
  }

  /** Serialized bloom filter over a frame of distinct gram keys (column
    * `__g`), sized by an exact count of the keys. Shared by the batch
    * bloom report and the streaming decontamination filter.
    */
  private[graft] def gramKeyBloom(evalKeys: DataFrame)(fpp: Double): Array[Byte] = {
    val nKeys = math.max(evalKeys.count(), 1L)
    val bf = evalKeys.stat.bloomFilter(xxhash64(col("__g")), nKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen probe of a [[gramKeyBloom]] filter: does the bloom (maybe)
    * contain this gram KEY (the 16-hex-char md5 prefix)? No false
    * negatives ever; false positives at the filter's fpp.
    */
  private[graft] def bloomMightContainKey(bytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    GraftBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftBridge.expression(xxhash64(key))))
  }

  /** Distinct eval-side gram keys, exposed for the streaming filter. */
  private[graft] def evalGramKeys(evalSet: DataFrame, textCol: String, n: Int): DataFrame =
    grams(evalSet, textCol, n, Seq.empty).distinct()

  /** Pairwise stratum-overlap matrix — "which sources leak into which":
    * for every pair of corpus strata (sources, dumps, snapshots …), the
    * number of DISTINCT word `n`-grams they share. The mixing-table
    * diagnostic run before combining corpora: a large off-diagonal entry
    * means two "independent" sources substantially duplicate each other
    * (mirrors, re-crawls), and their mixing weights double-count.
    * Output: `(stratum_a, stratum_b, n_shared_grams)` with
    * `stratum_a < stratum_b`; non-overlapping pairs are absent.
    *
    * Plan shape for 100 TB: text reduces map-side to DISTINCT (stratum,
    * 64-bit gram-key) pairs — the corpus collapses to at most
    * nStrata × distinct-grams narrow rows before the one self-join on the
    * gram key. Per shared gram the join yields at most nStrata²/2 pairs,
    * so this is for MIXING-GRADE strata counts (tens to hundreds of
    * sources), not per-document grouping — [[repeatedGramReport]] is the
    * per-document form.
    */
  /** Asymmetric n-gram CONTAINMENT pairs — the quote/subset detector
    * Jaccard misses: a short document wholly quoted inside a long one has
    * tiny Jaccard (the union is dominated by the long doc) but containment
    * `|A∩B| / |A|` ≈ 1 for the smaller side. Lee et al. 2022 §4 flag
    * exactly this near-duplication mode; minhash estimates Jaccard, not
    * containment, so the candidate step here is the exact shared-gram
    * join instead. Emits each unordered pair `(id_a < id_b)` sharing at
    * least one qualifying gram with
    * `(id_a, id_b, shared_grams, n_grams_a, n_grams_b, containment)`
    * where `containment = shared / min(n_a, n_b)` (the smaller side's
    * coverage — an exact ratio of distinct-gram counts), filtered at
    * `minContainment`.
    *
    * `maxDf` caps candidate generation: grams appearing in more than
    * `maxDf` documents (boilerplate headers, licence blurbs) are excluded
    * from SHARED-gram counting on both the pair and the oracle side —
    * without the cap a corpus-wide stop-phrase fans out quadratically in
    * the gram-keyed join. Denominators `n_grams_*` stay the UNCAPPED
    * per-document distinct-gram counts, so capping only lowers
    * containment for pairs whose overlap is mostly boilerplate — the
    * pairs the cap exists to mute. Plan shape for 100 TB: text collapses
    * map-side to distinct (id, 16-hex-md5-gram-key) rows; the pair join
    * is keyed on the gram key with per-gram fan-out ≤ maxDf²; only
    * (id_a, id_b) pairs and counters move after that. Text never reaches
    * an Exchange.
    */
  def containmentPairs(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minContainment: Double = 0.5,
      maxDf: Long = 10000L,
      materialize: Boolean = true): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (no pair can share a df-1 gram), got $maxDf")
    // the distinct gram table feeds sizes, the df counts, AND both pair
    // sides; consumers optimize the shared subtree differently, so AQE
    // never reuses its stages — materialize ONCE (measured: 6 corpus
    // scans without this) instead of re-running scan+explode+md5 per use.
    // `materialize = false` keeps the derivation lazy for plan inspection
    // (PlanSpec pins the pre-materialization shape)
    val pgLazy = grams(corpus, textCol, n, Seq(col(idCol))).distinct()
    val pg = if (materialize) Materialize.eager(pgLazy) else pgLazy
    val sizes = pg.groupBy(col(idCol)).agg(count(lit(1)).as("__ng"))
    val kept = pg.join(
      pg.groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
        .where(col("__nd") >= 2 && col("__nd") <= maxDf)
        .select(col("__g")),
      Seq("__g"))
    val a = kept.select(col(idCol).as("id_a"), col("__g"))
    val b = kept.select(col(idCol).as("id_b"), col("__g"))
    val shared = a.join(b, Seq("__g"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(sizes.select(col(idCol).as("id_a"), col("__ng").as("n_grams_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("__ng").as("n_grams_b")), Seq("id_b"))
      .withColumn("containment",
        col("shared_grams").cast("double") /
          least(col("n_grams_a"), col("n_grams_b")).cast("double"))
      .where(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared_grams"),
        col("n_grams_a"), col("n_grams_b"), col("containment"))
  }

  /** Winnowed fingerprint keys of one document (Schleimer et al. 2003,
    * SIGMOD — the MOSS algorithm, public): hash every word `n`-gram, slide
    * a window of `w` consecutive hashes, keep each window's MINIMUM, and
    * return the distinct kept values. Value-level winnowing: the selected
    * value SET is independent of which tied position a window picks, so it
    * is engine-portable (16-hex md5 keys compare lexicographically the
    * same everywhere). The winnowing guarantee holds: any shared token run
    * of length ≥ `w + n − 1` contributes at least one shared fingerprint,
    * while expected density drops to ~2/(w+1) of the gram count — the
    * knob that buys partial-overlap detection at a fraction of
    * [[containmentPairs]]' volume. Documents with fewer than `w` grams
    * keep the minimum of what they have (one window); no grams → empty;
    * null text → null.
    *
    * Pure codegen selection fused into the scan (let-bound arrays, no
    * shuffle, no UDF): the per-window `array_min(slice(...))` runs over
    * the ONCE-computed key array.
    */
  def winnowedGramKeys(text: Column, n: Int, w: Int): Column = {
    require(w >= 1, s"window must be >= 1 gram, got $w")
    Dedup.bind(transform(wordNgrams(text, n), g => gramKey(g))) { keys =>
      Dedup.bind(size(keys)) { m =>
        when(m === 0, array().cast("array<string>"))
          .when(m < w, array(array_min(keys)))
          .otherwise(array_distinct(
            transform(sequence(lit(0), m - w),
              j => array_min(slice(keys, j + lit(1), lit(w))))))
      }
    }
  }

  /** Fingerprint-sharing pairs over the winnowed keys — the corpus-scale
    * partial-overlap detector: each unordered pair sharing at least
    * `minShared` qualifying fingerprints, with both sides' fingerprint
    * counts for caller-side scoring. The same df cap and plan shape as
    * [[containmentPairs]], but the shuffled volume is the WINNOWED
    * fingerprint set (~2/(w+1) of the grams) and the per-doc selection
    * happened in the scan, so this is the cheap first pass; route its
    * survivors through [[containmentPairs]]-grade exact verification when
    * exact overlap ratios matter.
    */
  def winnowingPairs(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      w: Int = 4,
      minShared: Long = 2L,
      maxDf: Long = 10000L,
      materialize: Boolean = true): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (no pair can share a df-1 fingerprint), got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // winnowedGramKeys is per-doc distinct already — no dedup shuffle; the
    // fingerprint table feeds sizes, df counts, and both pair sides, so it
    // materializes once (same rationale as [[containmentPairs]])
    val fpLazy = corpus.select(
      col(idCol), explode(winnowedGramKeys(col(textCol), n, w)).as("__g"))
    val fp = if (materialize) Materialize.eager(fpLazy) else fpLazy
    val sizes = fp.groupBy(col(idCol)).agg(count(lit(1)).as("__nf"))
    val kept = fp.join(
      fp.groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
        .where(col("__nd") >= 2 && col("__nd") <= maxDf)
        .select(col("__g")),
      Seq("__g"))
    val a = kept.select(col(idCol).as("id_a"), col("__g"))
    val b = kept.select(col(idCol).as("id_b"), col("__g"))
    a.join(b, Seq("__g"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .join(sizes.select(col(idCol).as("id_a"), col("__nf").as("n_fps_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("__nf").as("n_fps_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared_fps"),
        col("n_fps_a"), col("n_fps_b"))
  }

  /** Incremental [[winnowingPairs]]: today's batch against the standing
    * corpus, cross-side candidates only — the [[containmentPairsAgainst]]
    * discipline over the winnowed fingerprint sets. Fingerprint df (the
    * `maxDf` cap) counts over the union of both sides, so the result is
    * exactly `winnowingPairs(new ∪ existing)` restricted to cross pairs.
    * Ids must be disjoint across sides. Returns `(new_id, existing_id,
    * shared_fps, n_fps_new, n_fps_existing)`.
    */
  def winnowingPairsAgainst(
      newDocs: DataFrame,
      existing: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      w: Int = 4,
      minShared: Long = 2L,
      maxDf: Long = 10000L): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (no pair can share a df-1 fingerprint), got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val nf = Materialize.eager(newDocs.select(
      col(idCol).as("new_id"), explode(winnowedGramKeys(col(textCol), n, w)).as("__g")))
    val ef = Materialize.eager(existing.select(
      col(idCol).as("existing_id"), explode(winnowedGramKeys(col(textCol), n, w)).as("__g")))
    crossSideFpPairs(nf, ef, minShared, maxDf)
  }

  /** Cross-side fingerprint pair core shared by the direct and the
    * index-backed probes: df cap over the union of both posting sets,
    * pairs only across sides, per-side total fingerprint counts attached.
    */
  private def crossSideFpPairs(
      nf: DataFrame, ef: DataFrame,
      minShared: Long, maxDf: Long): DataFrame = {
    val gc = nf.select(col("__g"))
      .unionAll(ef.select(col("__g")))
      .groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2 && col("__nd") <= maxDf)
      .select(col("__g"))
    nf.join(gc, Seq("__g"))
      .join(ef.join(gc, Seq("__g")), Seq("__g"))
      .groupBy(col("new_id"), col("existing_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .join(nf.groupBy(col("new_id")).agg(count(lit(1)).as("n_fps_new")), Seq("new_id"))
      .join(ef.groupBy(col("existing_id")).agg(count(lit(1)).as("n_fps_existing")),
        Seq("existing_id"))
      .select(col("new_id"), col("existing_id"), col("shared_fps"),
        col("n_fps_new"), col("n_fps_existing"))
  }

  // ---- persisted winnowing-fingerprint index ([[EpochStore]] layout) ----

  /** On-disk format version of the fingerprint index; bump on change. */
  val FingerprintIndexFormatVersion: Int = 1

  private def fpPostings(
      df: DataFrame, idCol: String, textCol: String, n: Int, w: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(winnowedGramKeys(col(textCol), n, w)).as("__g"))

  private def writeFpMeta(
      spark: org.apache.spark.sql.SparkSession, dir: String, n: Int, w: Int): Unit = {
    import spark.implicits._
    Seq((n, w, FingerprintIndexFormatVersion)).toDF("n", "w", "format_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private[graft] def resolveFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (String, org.apache.spark.sql.Row) = {
    val dir = EpochStore.epochDir(spark, path)
    val meta = spark.read.parquet(s"$dir/meta").head()
    val v = meta.getAs[Int]("format_version")
    require(v == FingerprintIndexFormatVersion,
      s"fingerprint index at $path has on-disk format version $v but this " +
      s"build reads version $FingerprintIndexFormatVersion — rebuild it " +
      "with writeFingerprintIndex")
    (dir, meta)
  }

  /** Persist the standing WINNOWING-FINGERPRINT index — the fourth index
    * lifecycle on the shared [[EpochStore]] delta-epoch layout (next to
    * LSH dedup, ANN, and paragraph hashes): `postings` = (id, 16-hex
    * fingerprint) rows, `fsizes` = per-doc fingerprint counts, and `meta`
    * holding (n, w) so probes can never run with mismatched winnowing
    * parameters. A daily job probes arrivals for partial overlap against
    * the whole standing corpus ([[winnowingPairsAgainstIndex]]) and folds
    * them in ([[appendFingerprintIndex]]) without re-reading corpus text.
    * At 100 TB the index is ~2/(w+1) of the corpus' gram keys — the
    * winnowing compression is exactly what makes a standing all-corpus
    * overlap table storable. Non-destructive over a live index; single
    * writer ([[EpochStore.commitEpoch]]).
    *
    * `w = 1` degenerates to a FULL gram-postings index (every distinct
    * gram selected): probes then return exact shared-gram counts, and
    * `shared_fps / least(n_fps_new, n_fps_existing)` IS the
    * [[containmentPairs]] containment — the storage/recall dial between
    * exact containment (w = 1) and cheap winnowed screening (larger w)
    * is one build parameter.
    */
  def writeFingerprintIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      n: Int = 8,
      w: Int = 4,
      retainEpochs: Int = 2): Unit = {
    val spark = corpus.sparkSession
    EpochStore.withLease(spark, path) {
    val cur = EpochStore.currentEpoch(spark, path)
    if (cur.isEmpty) EpochStore.resetKeepingLease(spark, path)
    val en = cur.map(EpochStore.epochNumber(_) + 1L).getOrElse(1L)
    val epoch = EpochStore.epochName(en)
    val dir = s"$path/$epoch"
    EpochStore.deleteDir(spark, dir)
    val postingsDir = EpochStore.dataDirName("postings", en)
    val sizesDir = EpochStore.dataDirName("fsizes", en)
    val posted = fpPostings(corpus, idCol, textCol, n, w)
    // postings and per-doc counts are independent writes — overlap them
    EpochStore.inParallel(
      () => {
        posted.write.mode("overwrite").parquet(s"$path/data/$postingsDir")
        val ids = spark.read.parquet(s"$path/data/$postingsDir").select("id").distinct()
        val items = EpochStore.idBloomItems(ids.count())
        EpochStore.writeIdBloom(spark, dir,
          EpochStore.buildIdBloom(ids, "id", items, EpochStore.IdBloomFpp),
          items, EpochStore.IdBloomFpp)
      },
      () => posted.groupBy(col("id")).agg(count(lit(1)).as("nf"))
        .write.mode("overwrite").parquet(s"$path/data/$sizesDir"))
    writeFpMeta(spark, dir, n, w)
    EpochStore.writeManifest(spark, dir,
      Seq("postings" -> postingsDir, "fsizes" -> sizesDir))
    EpochStore.commitEpoch(spark, path, epoch, cur)
    EpochStore.gc(spark, path, epoch, retainEpochs)
    }
  }

  /** Fold new documents into the standing fingerprint index: ONLY the
    * batch's postings and counts are written (per-doc payloads carry no
    * cross-doc state, so append ≡ rebuild on the union trivially —
    * table-for-table); standing data rides forward by manifest reference.
    * Ids must be disjoint from the index — re-appending a committed batch
    * would double its postings — enforced by the same bloom-then-exact
    * guard as the dedup/ANN appends (O(1) standing reads on clean
    * appends). Winnowing parameters come FROM the index.
    */
  def appendFingerprintIndex(
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      retainEpochs: Int = 2): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val spark = newDocs.sparkSession
    EpochStore.withLease(spark, path) {
    val (curDir, meta) = resolveFingerprintIndex(spark, path)
    val n = meta.getAs[Int]("n")
    val w = meta.getAs[Int]("w")
    if (EpochStore.idGuardNeedsExact(spark, curDir, newDocs, idCol)) {
      val dupIds = EpochStore.readTable(spark, curDir, "fsizes").select("id")
        .join(newDocs.select(col(idCol).as("id")), Seq("id"), "left_semi")
        .limit(3).collect().map(_.get(0))
      require(dupIds.isEmpty,
        s"appendFingerprintIndex: ids already present in the index at $path " +
        s"(e.g. ${dupIds.mkString(", ")}) — append requires disjoint ids; " +
        "re-appending a committed batch would double its postings")
    }
    val curEpoch = new HPath(curDir).getName
    val en = EpochStore.epochNumber(curEpoch) + 1L
    val epoch = EpochStore.epochName(en)
    val dir = s"$path/$epoch"
    EpochStore.deleteDir(spark, dir)
    val postingsDir = EpochStore.dataDirName("postings", en)
    val sizesDir = EpochStore.dataDirName("fsizes", en)
    val posted = fpPostings(newDocs, idCol, textCol, n, w)
    EpochStore.inParallel(
      () => posted.write.mode("overwrite").parquet(s"$path/data/$postingsDir"),
      () => posted.groupBy(col("id")).agg(count(lit(1)).as("nf"))
        .write.mode("overwrite").parquet(s"$path/data/$sizesDir"),
      () => {
        val (bItems, bFpp, bBytes) = EpochStore.appendedIdBloom(
          spark, curDir, newDocs.select(col(idCol).as("id")),
          EpochStore.readTable(spark, curDir, "fsizes").select("id")
            .unionByName(newDocs.select(col(idCol).as("id"))), "id")
        EpochStore.writeIdBloom(spark, dir, bBytes, bItems, bFpp)
      })
    writeFpMeta(spark, dir, n, w)
    EpochStore.writeManifest(spark, dir,
      EpochStore.readManifest(spark, curDir) ++
        Seq("postings" -> postingsDir, "fsizes" -> sizesDir))
    EpochStore.commitEpoch(spark, path, epoch, Some(curEpoch))
    EpochStore.gc(spark, path, epoch, retainEpochs)
    }
  }

  /** Merge the fingerprint index's delta history into one file set per
    * table — same maintenance op as the other three lifecycles; a fresh
    * right-sized id bloom replaces the merged one.
    */
  def compactFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      retainEpochs: Int = 2): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    EpochStore.withLease(spark, path) {
    val (curDir, meta) = resolveFingerprintIndex(spark, path)
    val curEpoch = new HPath(curDir).getName
    val en = EpochStore.epochNumber(curEpoch) + 1L
    val epoch = EpochStore.epochName(en)
    val dir = s"$path/$epoch"
    EpochStore.deleteDir(spark, dir)
    val postingsDir = EpochStore.dataDirName("postings", en)
    val sizesDir = EpochStore.dataDirName("fsizes", en)
    EpochStore.inParallel(
      () => {
        EpochStore.readTable(spark, curDir, "postings")
          .write.mode("overwrite").parquet(s"$path/data/$postingsDir")
        val ids = spark.read.parquet(s"$path/data/$postingsDir").select("id").distinct()
        val items = EpochStore.idBloomItems(ids.count())
        EpochStore.writeIdBloom(spark, dir,
          EpochStore.buildIdBloom(ids, "id", items, EpochStore.IdBloomFpp),
          items, EpochStore.IdBloomFpp)
      },
      () => EpochStore.readTable(spark, curDir, "fsizes")
        .write.mode("overwrite").parquet(s"$path/data/$sizesDir"))
    writeFpMeta(spark, dir, meta.getAs[Int]("n"), meta.getAs[Int]("w"))
    EpochStore.writeManifest(spark, dir,
      Seq("postings" -> postingsDir, "fsizes" -> sizesDir))
    EpochStore.commitEpoch(spark, path, epoch, Some(curEpoch))
    EpochStore.gc(spark, path, epoch, retainEpochs)
    }
  }

  /** [[winnowingPairsAgainst]] with the EXISTING side read from the
    * standing index — the daily partial-overlap job: no standing text is
    * touched, winnowing parameters come FROM the index, and the standing
    * postings scan is pruned to the batch's fingerprint keys by a
    * broadcast semi-join BEFORE anything shuffles (the touched-buckets
    * discipline of the dedup append). Fingerprint df for the `maxDf` cap
    * counts batch + standing occurrences of each candidate key — the same
    * union semantics as the direct form, so probe ≡
    * `winnowingPairsAgainst(batch, corpus)` row-for-row.
    */
  def winnowingPairsAgainstIndex(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      minShared: Long = 2L,
      maxDf: Long = 10000L): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (no pair can share a df-1 fingerprint), got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val spark = batch.sparkSession
    val (dir, meta) = resolveFingerprintIndex(spark, path)
    val n = meta.getAs[Int]("n")
    val w = meta.getAs[Int]("w")
    // the batch's fingerprints feed the touched-key broadcast, the df
    // counts, the pair join, and the per-doc sizes — materialize once so
    // the batch text is winnowed exactly once. The PRUNED standing side
    // stays lazy: its two consumers (df counts, pair join) each re-run
    // only a narrow two-column postings scan behind the broadcast
    // semi-join — cheap by construction, and the probe plan stays
    // inspectable (PlanSpec pins the prune shape)
    val nf = Materialize.eager(fpPostings(batch, idCol, textCol, n, w)
      .withColumnRenamed("id", "new_id"))
    val touched = nf.select(col("__g")).distinct()
    val ef = EpochStore.readTable(spark, dir, "postings")
      .join(broadcast(touched), Seq("__g"), "left_semi")
      .withColumnRenamed("id", "existing_id")
    val gc = nf.select(col("__g"))
      .unionAll(ef.select(col("__g")))
      .groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2 && col("__nd") <= maxDf)
      .select(col("__g"))
    nf.join(gc, Seq("__g"))
      .join(ef.join(gc, Seq("__g")), Seq("__g"))
      .groupBy(col("new_id"), col("existing_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .join(nf.groupBy(col("new_id")).agg(count(lit(1)).as("n_fps_new")), Seq("new_id"))
      .join(EpochStore.readTable(spark, dir, "fsizes")
        .select(col("id").as("existing_id"), col("nf").as("n_fps_existing")),
        Seq("existing_id"))
      .select(col("new_id"), col("existing_id"), col("shared_fps"),
        col("n_fps_new"), col("n_fps_existing"))
  }

  /** Incremental [[containmentPairs]]: today's batch against the standing
    * corpus, generating ONLY cross-side candidates — new×new and
    * existing×existing pairs are never formed, the
    * [[Dedup.minhashPairsAgainst]] discipline at containment semantics.
    * Gram document-frequency (the `maxDf` boilerplate cap) is computed
    * over the UNION of both sides, so the result is exactly
    * `containmentPairs(new ∪ existing)` restricted to cross pairs — a
    * batch that later folds into the corpus sees the same pairs either
    * way. Ids must be disjoint across sides (same contract as appending).
    * Returns `(new_id, existing_id, shared_grams, n_grams_new,
    * n_grams_existing, containment)` with the same min-side containment
    * and UNCAPPED denominators as the batch form.
    */
  def containmentPairsAgainst(
      newDocs: DataFrame,
      existing: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minContainment: Double = 0.5,
      maxDf: Long = 10000L): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (no pair can share a df-1 gram), got $maxDf")
    val ng = Materialize.eager(grams(newDocs, textCol, n, Seq(col(idCol))).distinct())
    val eg = Materialize.eager(grams(existing, textCol, n, Seq(col(idCol))).distinct())
    val gc = ng.unionByName(eg)
      .groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2 && col("__nd") <= maxDf)
      .select(col("__g"))
    val a = ng.join(gc, Seq("__g")).select(col(idCol).as("new_id"), col("__g"))
    val b = eg.join(gc, Seq("__g")).select(col(idCol).as("existing_id"), col("__g"))
    val shared = a.join(b, Seq("__g"))
      .groupBy(col("new_id"), col("existing_id"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(ng.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams_new"))
        .withColumnRenamed(idCol, "new_id"), Seq("new_id"))
      .join(eg.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams_existing"))
        .withColumnRenamed(idCol, "existing_id"), Seq("existing_id"))
      .withColumn("containment",
        col("shared_grams").cast("double") /
          least(col("n_grams_new"), col("n_grams_existing")).cast("double"))
      .where(col("containment") >= minContainment)
      .select(col("new_id"), col("existing_id"), col("shared_grams"),
        col("n_grams_new"), col("n_grams_existing"), col("containment"))
  }

  def sourceOverlapMatrix(
      corpus: DataFrame,
      stratumCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val sg = grams(corpus, textCol, n, Seq(col(stratumCol))).distinct()
    val a = sg.select(col(stratumCol).as("stratum_a"), col("__g"))
    val b = sg.select(col(stratumCol).as("stratum_b"), col("__g"))
    a.join(b, Seq("__g"))
      .where(col("stratum_a") < col("stratum_b"))
      .groupBy(col("stratum_a"), col("stratum_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Cross-document SPAN dedup — remove repeated text, keep one copy: for
    * every word `n`-gram occurring in two or more documents, the document
    * with the smallest `idCol` keeps its text and every OTHER document has
    * the tokens covered by that gram removed (the keep-one-occurrence rule
    * of Lee et al. 2022, applied at n-gram granularity; min-id is the
    * engine-portable canonical choice). Returns every corpus row plus
    * `cleaned` and `n_removed_tokens`, exactly like
    * [[redactContaminated]]; null text stays null.
    *
    * Plan shape for 100 TB: the gram machinery moves only (id, position,
    * 64-bit gram-key) rows. One aggregate keyed on the gram key finds the
    * winner (`min(id)`) and the distinct-doc count; only grams that
    * actually repeat across documents survive it, so the join back is
    * against a filtered table partitioned on the same key, and only
    * LOSING (id, start) pairs reach the per-doc collect — bounded by the
    * document's own token count. The one place corpus TEXT can shuffle is
    * the final starts→corpus attach join (shared with
    * [[redactContaminated]]): AQE broadcasts the per-doc start arrays
    * when they fit, otherwise the corpus rows shuffle ONCE on the id —
    * the same unavoidable exchange any row-level enrichment pays.
    */
  def dedupRepeatedSpans(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val occ = corpus
      .select(col(idCol), posexplode(wordNgrams(col(textCol), n)).as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), gramKey(col("__gram")).as("__g"))
    val winners = occ.groupBy(col("__g"))
      .agg(min(col(idCol)).as("__w"), countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= 2)
      .select(col("__g"), col("__w"))
    val starts = occ.join(winners, Seq("__g"))
      .where(col(idCol) =!= col("__w"))
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__starts"))
    redactByStarts(corpus, starts, idCol, textCol, n)
  }

  /** [[dedupRepeatedSpans]] at CHARACTER granularity — the ExactSubstr
    * variant of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better", ACL 2022 — public paper) for
    * whitespace-free scripts: a duplicated CJK run is ONE opaque token to
    * the word-gram path (a 60-character repeated passage is invisible to
    * it), but its character n-gram windows are shared. For every char
    * `n`-gram occurring in two or more documents, the smallest-`idCol`
    * document keeps its text and every OTHER document removes the covered
    * CHARACTER positions (interval union — overlapping duplicate windows
    * never double-count). Returns every corpus row plus `cleaned` (kept
    * characters rejoined; null text stays null) and `n_removed_chars`.
    *
    * Windows come from the native code-point kernel
    * ([[graft.functions.native.charNgrams]]) over the RAW text — no
    * normalization, positions are exact offsets into the original string
    * (DuckDB's `substr` convention, so the whole report hashes
    * cross-engine).
    *
    * Plan shape for 100 TB: this is the expensive dedup granularity — the
    * gram ledger carries ONE row per character, (id, pos, 64-bit key),
    * which is the suffix-array price paid in shuffle form; run it on the
    * already word-deduped survivors, not the raw corpus. Text itself
    * never shuffles except the final per-doc starts→corpus attach join
    * (AQE broadcasts the start arrays when they fit), and the winner
    * aggregate is keyed on the 16-hex gram hash with map-side partials.
    */
  def dedupRepeatedCharSpans(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 20): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n (n = 1 would dedup every " +
      "character the corpus shares)")
    val occ = corpus
      .select(col(idCol), posexplode(
        graft.functions.native.charNgrams(col(textCol), n))
        .as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), gramKey(col("__gram")).as("__g"))
    val winners = occ.groupBy(col("__g"))
      .agg(min(col(idCol)).as("__w"), countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= 2)
      .select(col("__g"), col("__w"))
    val starts = occ.join(winners, Seq("__g"))
      .where(col(idCol) =!= col("__w"))
      .groupBy(col(idCol))
      .agg(collect_list(col("__pos")).as("__starts"))
    corpus.join(starts, Seq(idCol), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__chars",
        graft.functions.native.charNgrams(col(textCol), 1))
      .withColumn("__kept",
        keptOutsideWindows(col("__chars"), col("__starts"), n))
      .withColumn("cleaned",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws("", col("__kept"))))
      .withColumn("n_removed_chars",
        coalesce((size(col("__chars")) - size(col("__kept"))).cast("bigint"),
          lit(0L)))
      .drop("__starts", "__chars", "__kept")
  }

  /** The elements of `elems` NOT covered by any window `[s, s+n)` for
    * `s ∈ starts` — the shared coverage kernel of [[redactByStarts]] and
    * [[dedupRepeatedCharSpans]]. Round-15 shape: the round-14 form
    * tested every position against the raw start list
    * (`O(len · |starts|)` interpreted lambda steps per row — toward
    * `O(len²)` on a document where most positions start a duplicated
    * window), so the starts now pre-merge into DISJOINT intervals and
    * the kept array assembles from the uncovered slices:
    *
    *   - every window has the same width `n`, so merged intervals follow
    *     from one gap rule over the SORTED starts: a start opens a new
    *     interval iff it sits ≥ n past its predecessor, and closes its
    *     chain iff the next start opens one — two linear indexed
    *     `filter`s over the sorted array, no quadratic accumulator
    *     rebuilding;
    *   - kept = the ≤ m+1 inter-interval `slice`s concatenated by one
    *     `aggregate` over the m merged intervals (slices are native and
    *     copy each element once).
    *
    * Total per row: O(s log s) for the sort + O(s) interpreted lambda
    * steps + O(len) native element copies. Null `elems` (null text)
    * propagates null exactly like the filter form; empty starts return
    * `elems` whole. Same removal rule bit-for-bit: position j is covered
    * iff some start s has s ≤ j < s+n (OpsPropertySpec pins the
    * equivalence against the naive per-position scan).
    */
  private[ops] def keptOutsideWindows(
      elems: Column, starts: Column, n: Int): Column =
    Dedup.bind(array_sort(starts)) { ss =>
      Dedup.bind(zip_with(
        // interval los: starts opening a chain…
        filter(ss, (s, i) => when(i === 0, lit(true))
          .otherwise(s - element_at(ss, i) >= n)),
        // …paired 1:1 with the chain-closing starts (+n below): the gap
        // rule makes opens and closes alternate, so the k-th open pairs
        // with the k-th close
        filter(ss, (s, i) => when(i === size(ss) - 1, lit(true))
          .otherwise(element_at(ss, i + 2) - s >= n)),
        (lo, last) => struct(lo.as("lo"), (last + n).as("hi")))) { ivs =>
        Dedup.bind(aggregate(
          ivs,
          struct(slice(elems, 1, 0).as("acc"), lit(0).as("pos")),
          (st, iv) => struct(
            concat(st("acc"),
              slice(elems, st("pos") + 1,
                greatest(iv("lo") - st("pos"), lit(0)))).as("acc"),
            iv("hi").as("pos")),
          st => concat(st("acc"),
            slice(elems, st("pos") + 1,
              greatest(size(elems) - st("pos"), lit(0)))))) { kept =>
          // a null element array must stay null (the filter form's
          // behavior): the aggregate above would fold it through concat
          // as null anyway, but state it once, loudly
          when(elems.isNull, lit(null).cast("array<string>")).otherwise(kept)
        }
      }
    }
}
