package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.TextOps

/** Real byte-level BPE counting against the tiny in-repo merges fixture.
  * Hand-computed expectations: with merges (h,e) < (l,l) < (he,ll),
  * "hello" → [hell, o] = 2 symbols; a space-prefixed word gains the Ġ
  * byte-encoder char as its own symbol.
  */
class BpeSpec extends SparkSpec {

  private def model = BpeModel.fromMergesFile(
    getClass.getResource("/bpe_test_merges.txt").getPath)

  test("merge order and byte encoding match the hand computation") {
    val m = model
    assert(m.countTokens("hello") == 2) // h e→he, l l→ll, he ll→hell | o
    assert(m.countTokens("hello hello") == 5) // + [Ġ, hell, o]
    assert(m.countTokens("hello world") == 8) // world: Ġ w o r l d unmerged
    assert(m.countTokens("") == 0)
    assert(m.countTokens(null) == 0)
    // pre-tokenizer splits contractions like the reference regex
    assert(m.countTokens("it's") == 4) // [it] ['s] → i t | ' s (no merges)
    // multi-byte UTF-8 counts per encoded byte when unmerged
    assert(m.countTokens("é") == 2) // U+00E9 is two UTF-8 bytes
  }

  test("repeated counting is deterministic and the memo cache agrees") {
    val m = model
    val first = m.countTokens("hello hello hello")
    assert(first == 8) // [hell,o] + 2×[Ġ,hell,o]
    assert((1 to 5).map(_ => m.countTokens("hello hello hello")).toSet == Set(first))
  }

  test("the Spark column backend broadcasts the model and handles nulls") {
    val df = frame(struct("doc_id" -> LongType, "text" -> StringType),
      Row(1L, "hello world"), Row(2L, null), Row(3L, "hello"))
    val counter = TextOps.bpeTokenCountFromMerges(
      spark, getClass.getResource("/bpe_test_merges.txt").getPath)
    val out = df.select(col("doc_id"), counter(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(out.map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq == Seq(8, -1, 2))
    // the regex proxy stays available and differs only where BPE merges do
    val proxy = df.select(TextOps.bpeTokenCount(col("text"))).head().getInt(0)
    assert(proxy == 2) // "hello world" = two alpha runs under the proxy
  }

  test("encodeSymbols/encodeIds match the hand computation; decode round-trips") {
    val m = model
    // "hello" → [hell, o]; space-prefixed second word keeps its Ġ symbol
    assert(m.encodeSymbols("hello").toSeq == Seq("hell", "o"))
    assert(m.encodeSymbols("hello hello").toSeq ==
      Seq("hell", "o", "Ġ", "hell", "o"))
    assert(m.encodeSymbols("").isEmpty && m.encodeSymbols(null).isEmpty)
    // count ≡ encode length by construction
    Seq("hello world", "it's", "é", "hello  hello\n", "###").foreach { t =>
      assert(m.encodeSymbols(t).length == m.countTokens(t), s"mismatch on '$t'")
    }
    // decode is the exact inverse, including multi-byte UTF-8 and whitespace
    Seq("hello world", "it's é", " leading and  double  spaces\n", "hélloé")
      .foreach { t => assert(BpeModel.decodeSymbols(m.encodeSymbols(t).toSeq) == t) }
    // derived id space: bytes 0-255 then merges in rank order —
    // fixture merges are (h,e)=256, (l,l)=257, (he,ll)=258
    assert(m.vocabSize == 259)
    assert(m.encodeIds("hello").toSeq == Seq(258, 'o'.toInt))
    assert(m.encodeIds("ll").toSeq == Seq(257))
    // every emitted symbol has an id (lookup is total over arbitrary text)
    assert(m.encodeIds("wider coverage: 123 !?").length == m.countTokens("wider coverage: 123 !?"))
  }

  test("the Spark encode backend produces id arrays with nulls preserved") {
    val df = frame(struct("doc_id" -> LongType, "text" -> StringType),
      Row(1L, "hello"), Row(2L, null))
    val enc = TextOps.bpeEncodeFromMerges(
      spark, getClass.getResource("/bpe_test_merges.txt").getPath)
    val out = df.select(col("doc_id"), enc(col("text")).as("ids"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Int](1) == Seq(258, 'o'.toInt))
    assert(out(1).isNullAt(1))
  }

  test("malformed and empty merges files fail loudly") {
    intercept[IllegalArgumentException] {
      BpeModel.fromMerges(Iterator("#version: 0.2")) // header only, no rules
    }
    intercept[IllegalArgumentException] {
      BpeModel.fromMerges(Iterator("a b c"))
    }
  }

  test("'#'-initial lines are merge rules, only a first-line #version header is skipped") {
    // '#' maps to itself in bytes_to_unicode, so `# #` is a real GPT-2 rule
    // forming the '##' token — it must load as a rule, not drop as a comment.
    val m = BpeModel.fromMerges(Iterator("#version: 0.2", "# #", "## #"))
    assert(m.countTokens("###") == 1)  // # #→##, ## #→###
    assert(m.countTokens("##") == 1)
    assert(m.countTokens("#") == 1)
    // the header is skipped only on line 0: ranks start at the `# #` rule
    val noHeader = BpeModel.fromMerges(Iterator("# #"))
    assert(noHeader.countTokens("## ##") == 3) // [##] + [Ġ, ##]
    // a '#version'-looking line NOT on line 0 is treated as malformed (3 tokens)
    intercept[IllegalArgumentException] {
      BpeModel.fromMerges(Iterator("a b", "#version: 0.2 extra"))
    }
  }

  // ---- tokenizer TRAINING (Sennrich et al. 2016, byte-level) ----
  // The merge loop is sequential driver-side code with no SQL form, so it
  // is pinned here (COVERAGE's closed-no-oracle convention): an exact
  // hand-computed fixture, an overlap fixture, determinism under input
  // reordering, and an encode-parity property against an independent
  // sequential-rank-order reference implementation. The corpus-sized half
  // (the word histogram) is oracled in q138.

  /** Independent reference: apply the merge rules SEQUENTIALLY in rank
    * order, each exhaustively left-to-right — a different formulation
    * from BpeModel's lowest-rank-first loop; byte-level BPE guarantees
    * they agree because a merge can only create pairs of HIGHER rank.
    */
  private def naiveCount(merges: Seq[(String, String)], text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = java.util.regex.Pattern.compile(BpeModel.PreTokenPattern).matcher(text)
    var total = 0
    while (m.find()) {
      var syms: List[String] = BpeModel.byteEncode(m.group()).map(_.toString).toList
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: t if a == l && b == r => out += a + b; rest = t
          case a :: t => out += a; rest = t
        }
        syms = out.toList
      }
      total += syms.length
    }
    total
  }

  test("train reproduces the hand-computed Sennrich merge sequence") {
    // classic corpus: low×5 lower×2 newest×6 widest×3 (all ASCII, so the
    // byte encoding is the identity). Pair counts: es=st=9 → tie breaks
    // to (e,s); then (es,t)=9; lo=ow=7 → (l,o); (lo,w)=7; then
    // ne=ew=w·est=6 → smallest left wins → (e,w).
    val merges = BpeModel.train(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    assert(merges == Vector("e" -> "s", "es" -> "t", "l" -> "o", "lo" -> "w", "e" -> "w"))
    val m = BpeModel.fromRanks(merges)
    assert(m.encodeSymbols("lowest").toSeq == Seq("low", "est"))
    assert(m.encodeSymbols("newest").toSeq == Seq("n", "ew", "est"))
    assert(m.encodeSymbols("lower").toSeq == Seq("low", "e", "r"))
    assert(m.vocabSize == 261) // 256 bytes + 5 distinct merge outputs
  }

  test("training is deterministic under histogram input reordering") {
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "the" -> 11L, "then" -> 4L, "than" -> 4L)
    val a = BpeModel.train(wc, 12)
    val b = BpeModel.train(scala.util.Random.shuffle(wc.toVector), 12)
    val c = BpeModel.train(wc.reverse, 12)
    assert(a == b && a == c)
  }

  test("overlapping pairs count and merge left-to-right like inference") {
    // "aaaa" has THREE (a,a) adjacencies (count 9 at word count 3); the
    // left-to-right merge yields aa,aa, then (aa,aa) completes the word
    val merges = BpeModel.train(Seq("aaaa" -> 3L), 10)
    assert(merges == Vector("a" -> "a", "aa" -> "aa"))
    val m = BpeModel.fromRanks(merges)
    assert(m.countTokens("aaaa") == 1)
    assert(m.countTokens("aaa") == 2)  // aa,a — leftmost-first overlap
    assert(m.countTokens("aaaaa") == 2) // aa,aa,a → aaaa,a
  }

  test("training exhausts gracefully and the empty model is the byte identity") {
    assert(BpeModel.train(Seq("ab" -> 3L, "cd" -> 2L), 100) ==
      Vector("a" -> "b", "c" -> "d"))
    assert(BpeModel.train(Seq("x" -> 5L), 3).isEmpty) // no pairs at all
    val id = BpeModel.fromRanks(Nil)
    assert(id.vocabSize == 256)
    assert(id.countTokens("ab cd") == 5) // a b | Ġ c d — one token per byte
    intercept[IllegalArgumentException] { BpeModel.train(Seq("a" -> 0L), 1) }
    intercept[IllegalArgumentException] { BpeModel.train(Seq(null.asInstanceOf[String] -> 1L), 1) }
  }

  test("trained merges round-trip through merges.txt serialization") {
    val merges = BpeModel.train(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    val m = BpeModel.fromRanks(merges)
    assert(m.mergesInOrder == merges)
    val reloaded = BpeModel.fromMerges(m.mergesLines.iterator)
    assert(reloaded.mergesInOrder == merges)
    Seq("lowest", "newest lower", "widest of the low").foreach { t =>
      assert(reloaded.countTokens(t) == m.countTokens(t))
      assert(reloaded.encodeIds(t).toSeq == m.encodeIds(t).toSeq)
    }
  }

  test("property: trained-model encoding agrees with the sequential-rank reference") {
    val corpusWords = Seq("the" -> 50L, "there" -> 9L, "then" -> 7L, "other" -> 12L,
      "low" -> 5L, "lower" -> 2L, "lowest" -> 4L, "newest" -> 6L, "widest" -> 3L,
      " the" -> 40L, " low" -> 8L, "42" -> 6L, "!" -> 9L, "é" -> 3L, "aaa" -> 5L)
    val merges = BpeModel.train(corpusWords, 25)
    val m = BpeModel.fromRanks(merges)
    val texts = Seq("the lowest there", "other than the newest, truly!",
      "aaaa 42 aaa é", "low lower lowest", "the the the", "", "zebra quartz")
    texts.foreach { t =>
      assert(m.countTokens(t) == naiveCount(merges, t), s"mismatch on '$t'")
      // and the decode inverse still holds under trained (not file) merges
      assert(BpeModel.decodeSymbols(m.encodeSymbols(t).toSeq) == t)
    }
  }

  test("trainBpe fits on a DataFrame corpus; histogram matches a driver recount") {
    val df = frame(struct("doc_id" -> LongType, "text" -> StringType),
      Row(1L, "the lower the newer"), Row(2L, "the newest of the new"),
      Row(3L, "lower and lower, newest!"), Row(4L, null))
    val model = TextOps.trainBpe(df, "text", vocabSize = 256 + 8)
    assert(model.mergesInOrder.size == 8)
    // parity: trained model vs the sequential reference on every doc
    df.collect().foreach { r =>
      val t = if (r.isNullAt(1)) null else r.getString(1)
      assert(model.countTokens(t) == naiveCount(model.mergesInOrder, t))
    }
    // the Spark histogram ≡ a driver-side Java-regex recount
    val sparkHist = TextOps.preTokenHistogram(df, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val driverHist = scala.collection.mutable.Map.empty[String, Long]
    df.collect().foreach { r =>
      if (!r.isNullAt(1)) {
        val mm = java.util.regex.Pattern.compile(BpeModel.PreTokenPattern)
          .matcher(r.getString(1))
        while (mm.find()) driverHist(mm.group()) =
          driverHist.getOrElse(mm.group(), 0L) + 1L
      }
    }
    assert(sparkHist == driverHist.toMap)
    // bounded driver collect: maxWords truncation is the documented
    // deterministic (count desc, word asc) prefix
    val truncated = TextOps.trainBpe(df, "text", vocabSize = 256 + 4, maxWords = 3)
    assert(truncated.mergesInOrder.size <= 4)
    intercept[IllegalArgumentException] { TextOps.trainBpe(df, "text", 255) }
  }

  test("model-direct column backends compose train -> count/encode with no merges file") {
    val texts = Map(1L -> "the lower the newer", 2L -> "the newest of the new",
      3L -> null.asInstanceOf[String])
    val df = frame(struct("doc_id" -> LongType, "text" -> StringType),
      texts.toSeq.sortBy(_._1).map { case (i, t) => Row(i, t) }: _*)
    val model = TextOps.trainBpe(df, "text", vocabSize = 256 + 6)
    val counter = TextOps.bpeTokenCountFromModel(spark, model)
    val enc = TextOps.bpeEncodeFromModel(spark, model)
    val rows = df.select(col("doc_id"), counter(col("text")).as("n"),
      enc(col("text")).as("ids")).orderBy("doc_id").collect()
    rows.foreach { r =>
      val t = texts(r.getLong(0))
      if (t == null) assert(r.isNullAt(1) && r.isNullAt(2))
      else {
        assert(r.getInt(1) == model.countTokens(t))
        assert(r.getSeq[Int](2) == model.encodeIds(t).toSeq)
      }
    }
    // and the trained counter slots straight into the packing budgets
    val plan = graft.ops.Packing.concatChunkPlan(
      df.where(col("text").isNotNull), "doc_id", "text",
      capacity = 4L, nGroups = 1, counter)
    assert(plan.agg(sum("n_tokens")).head().getLong(0) ==
      model.countTokens(texts(1L)) + model.countTokens(texts(2L)))
  }

  test("a BOM or leading blank lines before the #version header still parse") {
    // HF tooling accepts both; the header check keys on the first NON-BLANK
    // line with any UTF-8 BOM stripped, not physical line 0
    val bom = BpeModel.fromMerges(Iterator("﻿#version: 0.2", "a b"))
    assert(bom.countTokens("ab") == 1)
    val blank = BpeModel.fromMerges(Iterator("", "  ", "#version: 0.2", "a b"))
    assert(blank.countTokens("ab") == 1)
    // but after a real rule, a '#version' two-token line is a rule, not a header
    val late = BpeModel.fromMerges(Iterator("a b", "#version: x"))
    assert(late.countTokens("ab") == 1) // both lines loaded as rules
  }
}
