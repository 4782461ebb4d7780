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
    val n = if (payload == null) 0L else payload.length.toLong
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

  /** Fixed-dimension feature vector from a payload (STUB: hash-derived
    * pseudo-embedding, deterministic). The real implementation would run a
    * vision/audio encoder per batch; the output shape — `array<float>` of
    * length `dim` keyed by id — is exactly what the [[Similarity]] ANN
    * operators consume, so multimodal → embedding → near-dup/top-k composes
    * end-to-end.
    */
  def featureExtract(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      dim: Int = 16): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition encoder-model load would go here
        it.map { case (id, bytes) =>
          val safe = if (bytes == null) Array.emptyByteArray else bytes
          val vec = Array.tabulate(dim) { i =>
            val h = scala.util.hashing.MurmurHash3.bytesHash(safe, i)
            (h % 1000) / 1000.0f
          }
          (id, vec)
        }
      }
      .toDF(idCol, "embedding")
  }

  /** Resize stub: emits a new payload of deterministic size w×h (real
    * implementation: image decode → scale → re-encode per batch). The
    * contract under test is the binary→binary partition-batched shape.
    */
  def resize(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      w: Int,
      h: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val out = new Array[Byte](w * h)
        // empty/null payload → zero-filled frame (a real codec would error
        // a decode failure into a dead-letter column instead)
        if (bytes != null && bytes.length > 0) {
          var i = 0
          while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
        }
        (id, out)
      })
      .toDF(idCol, binCol)
  }

  /** Frame sampling stub: one output row per sampled "frame" (every
    * `everyN`-th chunk of `frameBytes` bytes) — the 1→N generator shape of
    * real video frame extraction, with frame index carried alongside the id.
    */
  def frameSample(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nFrames =
          if (bytes == null) 0 else bytes.length / math.max(frameBytes, 1)
        (0 until nFrames by everyN).iterator.map { f =>
          (id, f, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      })
      .toDF(idCol, "frame_idx", "frame")
  }
}
