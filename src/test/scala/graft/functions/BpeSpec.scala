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
