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

  /** The merged symbol sequence of one byte-encoded word — the shared
    * merge loop behind counting and encoding.
    */
  private def mergeWord(word: String): mutable.ArrayBuffer[String] = {
    var symbols = mutable.ArrayBuffer.tabulate(word.length)(i => word.substring(i, i + 1))
    var done = symbols.length <= 1
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
    symbols
  }

  /** Number of BPE symbols the byte-encoded `word` merges down to. */
  private def bpeLen(word: String): Int = {
    if (word.length <= 1) return word.length
    val cached = cache.get(word)
    if (cached != null) return cached.intValue
    val n = mergeWord(word).length
    cache.put(word, n)
    n
  }

  /** Id space derived from the merge table alone: ids 0–255 are the byte
    * alphabet in byte order, then one id per merge rule's output symbol in
    * rank order (first occurrence wins on the rare duplicate output).
    * This is the canonical vocabulary a byte-level BPE trainer constructs
    * from these merges — deterministic and stable across engines — NOT the
    * published GPT-2 `encoder.json` numbering, which carries its own
    * training-time id assignment. Training-data pipelines tokenizing from
    * scratch want exactly this derived space.
    */
  @transient private lazy val vocab: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](ranks.size * 2 + 512)
    var b = 0
    while (b < 256) {
      m.put(BpeModel.byteSymbol(b), Integer.valueOf(b)); b += 1
    }
    ranks.toSeq.sortBy(_._2).foreach { case ((l, r), _) =>
      val s = l + r
      if (!m.containsKey(s)) m.put(s, Integer.valueOf(m.size))
    }
    m
  }

  /** Number of distinct symbols in the derived vocabulary. */
  def vocabSize: Int = vocab.size

  /** The merged BPE symbol strings of `text`, in order (empty for
    * null/empty input). Symbols are in the byte-encoder alphabet —
    * [[BpeModel.decodeSymbols]] recovers the exact original text, and
    * every symbol has an id in the derived vocabulary ([[encodeIds]]).
    * By construction `encodeSymbols(t).length == countTokens(t)`.
    */
  def encodeSymbols(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val m = BpeModel.PreToken.matcher(text)
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      val bytes = m.group().getBytes("UTF-8")
      val sb = new java.lang.StringBuilder(bytes.length)
      var i = 0
      while (i < bytes.length) {
        sb.append(BpeModel.ByteEncoder(bytes(i) & 0xff)); i += 1
      }
      out ++= mergeWord(sb.toString)
    }
    out.toArray
  }

  /** Token ids of `text` in the derived vocabulary (see [[vocabSize]]).
    * Every symbol the merge loop emits is either a single alphabet char or
    * some rule's output, so the lookup is total.
    */
  def encodeIds(text: String): Array[Int] =
    encodeSymbols(text).map(s => vocab.get(s).intValue)

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

  private[functions] def byteSymbol(b: Int): String = ByteEncoder(b).toString

  @transient private lazy val ByteDecoder: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) {
      m.put(Character.valueOf(ByteEncoder(b)), java.lang.Byte.valueOf(b.toByte)); b += 1
    }
    m
  }

  /** Exact inverse of [[BpeModel.encodeSymbols]]: map each symbol's chars
    * back through the byte encoder and decode UTF-8. Throws on a char
    * outside the byte alphabet (a symbol that never came from this
    * encoder).
    */
  def decodeSymbols(symbols: Seq[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    symbols.foreach(_.foreach { c =>
      val b = ByteDecoder.get(Character.valueOf(c))
      require(b != null, s"char '\\u${c.toInt.toHexString}' is not in the byte-level BPE alphabet")
      bos.write(b.byteValue & 0xff)
    })
    new String(bos.toByteArray, "UTF-8")
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
