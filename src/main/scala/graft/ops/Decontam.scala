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
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    def grams(df: DataFrame, keep: Seq[Column]) =
      df.select(keep :+ explode(wordNgrams(col(textCol), n)).as("__gram"): _*)
        .select(keep :+ gramKey(col("__gram")).as("__g"): _*)
    val evalGrams = grams(evalSet, Seq.empty).distinct()
    val evalSide = if (broadcastEval) broadcast(evalGrams) else evalGrams
    grams(corpus, Seq(col(idCol)))
      .join(evalSide, Seq("__g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__g")).as("n_shared_grams"))
  }

  /** Corpus minus the contaminated documents: left-anti against the report
    * ids. Same broadcast-probe plan — the corpus is scanned, never shuffled.
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    // no broadcast hint here: the contaminated-id set is usually tiny (AQE
    // will broadcast it), but it is bounded by the CORPUS, not the eval
    // set — forcing a broadcast would break on a heavily-contaminated run
    val contaminated = contaminationReport(
      corpus, evalSet, idCol, textCol, n, broadcastEval).select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
