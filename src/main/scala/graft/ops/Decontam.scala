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
  private def grams(df: DataFrame, textCol: String, n: Int, keep: Seq[Column]) =
    df.select(keep :+ explode(wordNgrams(col(textCol), n)).as("__gram"): _*)
      .select(keep :+ gramKey(col("__gram")).as("__g"): _*)

  private def evalSide(
      evalSet: DataFrame, textCol: String, n: Int, bcast: Boolean): DataFrame = {
    val evalGrams = grams(evalSet, textCol, n, Seq.empty).distinct()
    if (bcast) broadcast(evalGrams) else evalGrams
  }

  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame =
    grams(corpus, textCol, n, Seq(col(idCol)))
      .join(evalSide(evalSet, textCol, n, broadcastEval), Seq("__g"))
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
      broadcastEval: Boolean = true): DataFrame = {
    val contaminated = grams(corpus, textCol, n, Seq(col(idCol)))
      .join(evalSide(evalSet, textCol, n, broadcastEval), Seq("__g"), "left_semi")
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
    corpus.join(matches, Seq(idCol), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__toks", TextOps.wsTokens(col(textCol)))
      .withColumn("__kept", filter(col("__toks"), (_, j) =>
        !exists(col("__starts"), s => s <= j && j < s + n)))
      .withColumn("cleaned",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", col("__kept"))))
      .withColumn("n_removed_tokens",
        (size(col("__toks")) - size(col("__kept"))).cast("bigint"))
      .drop("__starts", "__toks", "__kept")
  }
}
