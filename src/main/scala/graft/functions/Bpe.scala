package graft.functions

import scala.collection.mutable

/** Byte-level BPE tokenization length from a user-supplied merges file.
  *
  * Format and algorithm are the public GPT-2 byte-level BPE (Radford et
  * al. 2019; reference implementation `openai/gpt-2`, `encoder.py`): a
  * pre-tokenizer regex splits text into words, each word's UTF-8 bytes map
  * to visible unicode chars, and merge rules apply lowest-rank-first until
  * none match. COUNTING needs only the merge ranks — not the vocab ids —
  * so a single `merges.txt` fully specifies the tokenizer length function;
  * GPT-2's own merges file is public and loads unchanged.
  *
  * Serializable: ship it to executors via a broadcast (see
  * `TextOps.bpeTokenCountFromMerges`); the per-word memo cache is
  * `@transient` and rebuilds per executor.
  */
final class BpeModel private (ranks: Map[(String, String), Int]) extends Serializable {

  // per-JVM memo: corpora repeat words heavily, and BPE is per-word
  // deterministic. Access-ordered LRU, bounded so a 100 TB corpus's long
  // tail cannot grow driver/executor heap without limit.
  @transient private lazy val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Integer](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Integer]): Boolean =
          size > 65536
      })

  /** Number of BPE symbols the byte-encoded `word` merges down to. */
  private def bpeLen(word: String): Int = {
    if (word.length <= 1) return word.length
    val cached = cache.get(word)
    if (cached != null) return cached.intValue
    var symbols = mutable.ArrayBuffer.tabulate(word.length)(i => word.substring(i, i + 1))
    var done = false
    while (!done && symbols.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of the lowest-rank pair, left to right —
        // the reference algorithm's order, which matters for overlaps
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 &&
              ranks.getOrElse((symbols(j), symbols(j + 1)), Int.MaxValue) == best) {
            out += symbols(j) + symbols(j + 1); j += 2
          } else { out += symbols(j); j += 1 }
        }
        symbols = out
      }
    }
    cache.put(word, symbols.length)
    symbols.length
  }

  /** Token count of `text` under this merge table (0 for null/empty). */
  def countTokens(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = BpeModel.PreToken.matcher(text)
    var total = 0
    while (m.find()) {
      val bytes = m.group().getBytes("UTF-8")
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        sb.append(BpeModel.ByteEncoder(bytes(i) & 0xff)); i += 1
      }
      total += bpeLen(sb.toString)
    }
    total
  }
}

object BpeModel {

  /** The GPT-2 pre-tokenizer regex (public, from the reference impl):
    * contractions, optionally-space-prefixed letter/number/punct runs,
    * then residual whitespace.
    */
  private val PreToken = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** bytes→unicode (GPT-2's `bytes_to_unicode`): printable/latin bytes map
    * to themselves, the rest shift to 256+n in order — every byte becomes
    * one visible char, so merge rules are plain strings with no raw spaces.
    */
  private val ByteEncoder: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Parse GPT-2 `merges.txt` lines: one "left right" pair per line in
    * priority order. Only a `#version` header on the FIRST NON-BLANK line
    * (the GPT-2/HF convention; a UTF-8 BOM is stripped first — HF tooling
    * accepts files with either) and blank lines are skipped — other
    * `#`-initial lines are legitimate merge rules ('#' maps to itself in
    * bytes_to_unicode, so rules like `# #` forming the `##` token are real
    * and common in markdown/code-heavy vocabularies).
    */
  def fromMerges(lines: Iterator[String]): BpeModel = {
    val ranks = mutable.Map.empty[(String, String), Int]
    var rank = 0
    var seenContent = false
    lines.foreach { raw =>
      val line = raw.stripPrefix("﻿").trim
      if (line.nonEmpty) {
        val isVersionHeader = !seenContent && line.startsWith("#version")
        seenContent = true
        if (!isVersionHeader) {
          val sp = line.split(" ")
          require(sp.length == 2, s"malformed merge line: '$raw'")
          ranks((sp(0), sp(1))) = rank
          rank += 1
        }
      }
    }
    require(ranks.nonEmpty, "merges file contained no merge rules")
    new BpeModel(ranks.toMap)
  }

  def fromMergesFile(path: String): BpeModel = {
    val src = scala.io.Source.fromFile(path)("UTF-8")
    try fromMerges(src.getLines()) finally src.close()
  }
}
