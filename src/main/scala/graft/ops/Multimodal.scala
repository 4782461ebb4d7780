package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque media metadata extracted by the (stubbed) decoder. */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    format: String)

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract as
  * a partition-batched function over a typed Dataset.
  *
  * The decode itself is a STUB — media codecs are not available in this
  * container — implemented as a deterministic fake (`fakeDecode`) so the
  * Spark-side contract is fully real and testable: binary column schema,
  * per-partition batching via `mapPartitions` (the Scala analogue of
  * `mapInPandas`), a case-class output Encoder, and expression-level parity
  * columns for the oracle.
  */
object Multimodal {

  /** Attach a binary payload column (here fabricated from text — stands in
    * for real image/audio bytes read from parquet binary columns).
    */
  def withBinaryPayload(df: DataFrame, textCol: String, binCol: String): DataFrame =
    df.withColumn(binCol, col(textCol).cast("binary"))

  /** Deterministic fake decode of a payload: byte count and hash-derived
    * fake dimensions. Replace the body with a real codec
    * (ImageIO/ffmpeg/...) when available — the signature and partition
    * batching stay the same.
    */
  def fakeDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = id,
      n_bytes = n,
      width = (n % 640).toInt,
      height = ((n * 7) % 480).toInt,
      format = if (n % 2 == 0) "png" else "jpeg")
  }

  /** Partition-batched decode: each executor task iterates its partition
    * once (the place to amortize per-batch codec init, like mapInPandas
    * batches do). Returns a typed Dataset with a proper Encoder — schema is
    * carried by the case class, not inferred.
    */
  def decodeMeta(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of the (stub) codec would go here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }
}
