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

  /** The merge rules in rank (priority) order — the exact sequence a
    * trainer learned or a merges file listed. `fromRanks(mergesInOrder)`
    * and `fromMerges(mergesLines)` both reconstruct this model.
    */
  def mergesInOrder: Vector[(String, String)] =
    ranks.toVector.sortBy(_._2).map(_._1)

  /** GPT-2 `merges.txt` serialization of this model (header + one
    * "left right" rule per line in rank order). Symbols never contain a
    * raw space — the byte encoder maps space to Ġ — so the two-token
    * line format is lossless. Round-trips through [[BpeModel.fromMerges]].
    */
  def mergesLines: Vector[String] =
    "#version: 0.2" +: mergesInOrder.map { case (l, r) => s"$l $r" }

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
    * then residual whitespace. Exposed so the Spark-side word histogram
    * (`TextOps.preTokenHistogram`) splits text EXACTLY like this model's
    * own `countTokens`/`encodeSymbols` — training and application must
    * agree on word boundaries. Java-regex syntax (the `(?!\S)` lookahead
    * keeps the last space of an interior run attached to the next word).
    */
  val PreTokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val PreToken = java.util.regex.Pattern.compile(PreTokenPattern)

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

  /** One raw pre-token → its byte-encoded form (every UTF-8 byte as one
    * visible char) — the alphabet the merge rules and trainer operate in.
    */
  def byteEncode(word: String): String = {
    val bytes = word.getBytes("UTF-8")
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(ByteEncoder(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Build a model directly from an in-memory merge list in priority
    * order (what [[train]] returns); rank = position. The later duplicate
    * of a repeated pair is ignored, matching `fromMerges` file semantics.
    * An EMPTY list is allowed (unlike a merges FILE, where it signals a
    * parse problem): it is the identity byte-level tokenizer — one token
    * per UTF-8 byte, vocabSize 256 — which `train(_, 0)` legitimately
    * produces.
    */
  def fromRanks(merges: Seq[(String, String)]): BpeModel = {
    val ranks = mutable.Map.empty[(String, String), Int]
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!ranks.contains(p)) ranks(p) = i
    }
    new BpeModel(ranks.toMap)
  }

  /** Learn `numMerges` byte-level BPE merge rules from a word→count
    * histogram — the classic algorithm (Sennrich, Haddow & Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") on
    * GPT-2's byte alphabet: greedily merge the most frequent adjacent
    * symbol pair, count-weighted over the histogram, until `numMerges`
    * rules exist or no pair is left.
    *
    * This is the DRIVER-SIDE half of training: the corpus-sized work is
    * the one aggregate that produced `wordCounts`
    * (`TextOps.preTokenHistogram` — the corpus shuffles once, into a
    * vocabulary-sized table); the merge loop never touches the corpus.
    * `wordCounts` words are RAW pre-tokens (as the histogram emits them);
    * they are byte-encoded here, so trained rules compose directly with
    * [[countTokens]]/[[encodeSymbols]].
    *
    * Deterministic: ties on pair count break lexicographically smallest
    * (left, then right) in the byte-encoded alphabet, independent of
    * input order. Pair selection uses a lazy-deletion priority queue, so
    * a merge step costs O(affected words · word length · log pairs), not
    * a full recount — the HF-tokenizers-style formulation that keeps a
    * 50k-merge train on a million-word histogram tractable.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // byte-encode and combine (encode is injective, but defend anyway)
    val agg = mutable.LinkedHashMap.empty[String, Long]
    wordCounts.foreach { case (w, c) =>
      require(w != null, "null word in histogram")
      require(c > 0, s"non-positive count $c for word '$w'")
      if (w.nonEmpty) {
        val e = byteEncode(w)
        agg(e) = agg.getOrElse(e, 0L) + c
      }
    }
    val words: Array[mutable.ArrayBuffer[String]] = agg.keysIterator
      .map(w => mutable.ArrayBuffer.tabulate(w.length)(i => w.substring(i, i + 1)))
      .toArray
    val counts: Array[Long] = agg.valuesIterator.toArray

    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    val touched = mutable.HashSet.empty[(String, String)]

    def addWord(i: Int): Unit = {
      val s = words(i); val c = counts(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += i
        touched += p
        j += 1
      }
    }
    def removeWord(i: Int): Unit = {
      val s = words(i); val c = counts(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val n = pairCounts(p) - c
        if (n == 0L) pairCounts.remove(p) else pairCounts(p) = n
        pairWords.get(p).foreach { set =>
          set.remove(i); if (set.isEmpty) pairWords.remove(p)
        }
        touched += p
        j += 1
      }
    }
    // merge every occurrence of `p` left to right — the same overlap
    // order mergeWord uses at inference time
    def mergeAll(s: mutable.ArrayBuffer[String], p: (String, String)): mutable.ArrayBuffer[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == p._1 && s(j + 1) == p._2) {
          out += s(j) + s(j + 1); j += 2
        } else { out += s(j); j += 1 }
      }
      out
    }

    words.indices.foreach(addWord)
    touched.clear()

    // max-heap on (count, pair): higher count wins, then the
    // lexicographically SMALLEST pair — a total order, so selection is
    // deterministic whatever the hash-map iteration order did
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2)
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    pairCounts.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }

    val out = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      // lazy deletion: entries whose count moved since enqueue are stale;
      // every count change re-enqueues, so the current max is in the heap
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, l, r) = heap.dequeue()
        if (pairCounts.get((l, r)).contains(c)) best = (l, r)
      }
      if (best == null) exhausted = true
      else {
        out += best
        val affected = pairWords(best).toArray.sorted
        affected.foreach { i =>
          removeWord(i)
          words(i) = mergeAll(words(i), best)
          addWord(i)
        }
        touched.foreach { p =>
          pairCounts.get(p).foreach(c => heap.enqueue((c, p._1, p._2)))
        }
        touched.clear()
        m += 1
      }
    }
    out.result()
  }

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
