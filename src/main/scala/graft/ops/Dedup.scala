package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the point of this module):
  *   - signatures are pure per-row expressions (codegen, no shuffle);
  *   - candidate generation is ONE shuffle keyed by (band, bandHash) —
  *     documents only meet if they collide in some band, so the join fan-out
  *     is the number of true near-duplicate candidates, not n²;
  *   - exact-Jaccard verification only touches candidate pairs.
  * A brute-force n² compare never appears anywhere in the plan.
  */
object Dedup {

  /** Let-binding for Column expressions: evaluate `x` ONCE and reference it
    * as a cheap lambda variable inside `body`.
    *
    * Why this exists: any sub-expression appearing in a higher-order-function
    * lambda BODY is re-evaluated for every array element, and Catalyst's
    * CollapseProject happily inlines an upstream projection's expression into
    * downstream lambdas — nesting minhash (64 hashes) inside banding (32
    * slices) inside shingling (per-token split) this way multiplies into
    * ~1e5 regex splits per row (observed: 455 s for 5000 docs). Wrapping the
    * expensive expression as the ARGUMENT of a singleton `transform` pins it
    * to exactly one evaluation per row, immune to projection collapsing.
    */
  private[ops] def bind(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** Exact dedup: one surviving (minimum) id per identical text. A single
    * hash-aggregate shuffle on a 32-byte key — never shuffles full text.
    */
  def exactKeepMin(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as(idCol))

  /** k-word shingles of a text column (empty when fewer than k tokens).
    * The token array is let-bound so the split regex runs once per row, not
    * once per shingle.
    */
  def shingles(text: Column, k: Int): Column =
    bind(TextOps.wsTokens(text)) { toks =>
      when(size(toks) < k, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
    }

  /** MinHash signature: for each of `numHashes` seeded xxhash64 functions,
    * the minimum hash over the shingle set. Pure expression per row: one
    * `transform(sequence(...))` (O(1) tree size — `numHashes` sibling
    * expressions would re-inline at every downstream reference and produce
    * 30 MB task binaries) with the shingle array let-bound (evaluated once,
    * traversed `numHashes` times).
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    bind(sh) { shv =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(shv, s => xxhash64(i, s))))
    }

  /** LSH banding: split the signature into `bands` equal bands and hash each
    * — docs agreeing on any whole band become candidates. Signature is
    * let-bound (computed once, sliced `bands` times); the band index is not
    * part of the hash because candidate keys are (band, bandHash) pairs.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    bind(sig) { s =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(s, b * rowsPerBand + 1, lit(rowsPerBand))))
    }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. Returns (idA, idB, jaccard) with idA < idB.
    *
    * @param threshold exact Jaccard cutoff applied after LSH candidate
    *   generation (the usual two-phase filter).
    */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = df
      .select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .where(size(col("sh")) > 0)
    // Fused native kernel (graft.functions.MinHashBandHashes): one codegen
    // call per row computes shingles → 64 minima → band hashes. The HOF
    // composition (minhashSignature ∘ bandHashes) is semantically identical
    // but pays interpreted lambda evaluation per array element.
    val sigs = df.select(
      col(idCol).as("id"),
      graft.functions.native
        .minhashBandHashes(TextOps.wsTokens(col(textCol)), k, numHashes, bands)
        .as("bh"))
      .where(size(col("bh")) > 0)

    // Bucket shuffle carries ONLY (band, bandHash, id) — never the shingle
    // arrays. At 100 TB the explode is `bands`× the id column, not `bands`×
    // the corpus text.
    val buckets = sigs.select(
      posexplode(col("bh")).as(Seq("band", "bhash")), col("id"))
    val l = buckets.select(col("band"), col("bhash"), col("id").as("id_a"))
    val r = buckets.select(col("band"), col("bhash"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band", "bhash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Exact-Jaccard verification: re-join the (recomputed, pure-map) shingle
    // sets onto the deduplicated candidate pairs — two id-keyed joins whose
    // probe side is only the candidate set.
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit j is set when more token
    * hashes have bit j set than cleared. Pure per-row expression (64 small
    * array-aggregates over the token hashes — all codegen).
    */
  def simhash64(text: Column): Column =
    // One pass over the token hashes with a 64-counter array accumulator
    // (the 64-sibling-expression form re-tokenizes the text 64× per row
    // once Catalyst collapses projections — same pathology as
    // [[minhashSignature]]). `bits` and `votes` are let-bound.
    bind(sequence(lit(0), lit(63))) { bits =>
      bind(aggregate(
        transform(TextOps.wsTokens(text), t => xxhash64(t)),
        array_repeat(lit(0L), lit(64)),
        (acc, h) => zip_with(acc, bits, (a, j) =>
          a + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)))) { votes =>
        aggregate(
          zip_with(votes, bits, (v, j) =>
            when(v > 0, call_function("shiftleft", lit(1L), j))
              .otherwise(lit(0L))),
          lit(0L), (acc, x) => acc + x)
      }
    }

  /** Hamming distance between two simhashes (for near-dup banding on the
    * 16-bit chunks of the simhash — same LSH pattern as minhashPairs).
    */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by embedding cosine, LSH-bucketed: random
    * hyperplane sign bits (hash-derived, deterministic) bucket the vectors;
    * only same-bucket pairs get an exact cosine. One shuffle on the bucket
    * key; fan-out bounded by bucket population, not n².
    */
  def embeddingNearDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      planes: Int = 8,
      threshold: Double = 0.99): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val l = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .dropDuplicates("id_a", "id_b")
  }
}
