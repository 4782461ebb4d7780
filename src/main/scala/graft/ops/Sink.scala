package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output side of the pipeline: write a corpus as hash-sharded parquet a
  * downstream training job (or the next pipeline stage) can consume with
  * bounded file counts and prunable layout.
  *
  * Shard assignment is the engine-portable md5-prefix bucket used across
  * the library (same idiom as `Packing.md5Group` / `Sampling.md5Split`):
  * any engine can recompute `shard` from the id alone, so a reader — or an
  * oracle — never needs Spark to know which shard a document lives in.
  *
  * Plan shape for 100 TB: `repartition(nShards × filesPerShard, shard,
  * salt)` ahead of `partitionBy(shard)` means each task holds exactly one
  * (shard, salt) slice, so the job writes AT MOST nShards × filesPerShard
  * files TOTAL — without it, every task can touch every shard and the file
  * count explodes to tasks × shards (the classic small-files failure).
  * `filesPerShard` restores write parallelism when shards are huge: at
  * 100 TB / 256 shards, filesPerShard = 64 gives 16 384 write tasks with
  * the file count still bounded and each file internally sorted by id
  * (`sortWithinPartitions`), so parquet row-group min/max stats prune
  * id-range scans.
  */
object Sink {

  /** Engine-portable shard of `key`: first ⌈log₁₆ nShards⌉ md5 hex digits
    * of the key rendered as a string, mod nShards. Null keys yield a null
    * shard (they would land in the writer's default partition — filter or
    * fill ids first).
    */
  def shardColumn(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards must be in [1, 4096], got $nShards")
    pmod(
      conv(
        substring(md5(key.cast("string").cast("binary")), 1,
          Packing.md5GroupDigits(nShards)),
        16, 10).cast("int"),
      lit(nShards))
  }

  /** Write `df` under `path` as `shard=NN/part-*.parquet`, sharded by
    * [[shardColumn]] of `idCol` and sorted by `idCol` within every file.
    * The shard column is the directory key only — file contents carry the
    * original columns. `overwrite = false` (the default) fails on an
    * existing `path` rather than silently replacing a corpus.
    */
  def writeShards(
      df: DataFrame,
      path: String,
      idCol: String,
      nShards: Int,
      filesPerShard: Int = 1,
      overwrite: Boolean = false,
      idBloom: Boolean = false): Unit = {
    require(filesPerShard >= 1 && filesPerShard <= 4096,
      s"filesPerShard must be in [1, 4096], got $filesPerShard")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — rename it first (the sink " +
        "derives its own shard key from the id)")
    // an empty write would leave a directory with no parquet files — a
    // reader can't infer a schema from it, so the corpus would LOOK
    // written but be unreadable; fail here instead (costs one short job)
    require(!df.isEmpty,
      s"writeShards: refusing to write an empty corpus to $path — the " +
        "resulting directory would have no readable schema")
    val sharded = df.withColumn("shard", shardColumn(col(idCol), nShards))
    // the salt needs no cross-engine story (it never appears in the
    // output), so the cheap codegen hash is fine
    val salt = pmod(xxhash64(col(idCol)), lit(filesPerShard))
    val writer = sharded
      .repartition(nShards * filesPerShard, col("shard"), salt)
      // shard leads the sort so it already satisfies the writer's
      // required partition-column ordering — otherwise FileFormatWriter
      // inserts its own shard-only sort and the id order is lost
      .sortWithinPartitions(col("shard"), col(idCol))
      .write
      .mode(if (overwrite) "overwrite" else "errorifexists")
    // `idBloom` writes a parquet bloom filter on the id column of every
    // file: point lookups and id semi-joins against the standing corpus
    // then skip row groups whose bloom rules the key out — the standard
    // lakehouse complement to the min/max pruning the id-sorted files
    // already give range scans. Footer-verified in OpsSpec.
    (if (idBloom)
      writer.option(s"parquet.bloom.filter.enabled#$idCol", "true")
    else writer)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Per-shard manifest of a [[writeShards]] output, recomputed FROM the
    * written files (a read-back, not a side channel — what you see is what
    * a consumer gets): `(shard, n_rows)` plus one `sum_<c>` column per
    * requested numeric column.
    */
  def shardManifest(
      spark: SparkSession,
      path: String,
      sumCols: Seq[String] = Seq.empty): DataFrame = {
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    df.groupBy(col("shard").cast("int").as("shard"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
