package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata extracted by the image decoder. `width`/`height` are
  * absent and `error` is set when the payload does not decode — the
  * dead-letter contract: no row is dropped, failures stay addressable.
  */
final case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Option[Int],
    height: Option[Int],
    format: String,
    error: Option[String])

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns; decode / feature-extract / resize run partition-batched
  * (`mapPartitions`, the Scala analogue of `mapInPandas`) so per-task codec
  * init amortizes across the partition — the right shape for a 100 TB
  * corpus where each executor core streams its split through one decoder.
  *
  * The IMAGE path is real: `javax.imageio` (stock JVM, no extra deps)
  * decodes PNG/JPEG/GIF/BMP payloads into pixels; metadata, features and
  * resize all derive from the decoded image, and undecodable payloads land
  * in a dead-letter `error` column instead of failing the job. Video frame
  * extraction has no stock-JVM codec, so [[frameSample]] keeps a
  * byte-chunking stand-in for the 1→N generator shape (clearly marked).
  */
object Multimodal {

  /** Attach a raw binary payload column (text bytes as-is — the generic
    * "opaque bytes" plumbing used by [[frameSample]] and the dead-letter
    * tests; NOT a decodable image. See [[synthesizePng]] for that.)
    */
  def withBinaryPayload(df: DataFrame, textCol: String, binCol: String): DataFrame =
    df.withColumn(binCol, col(textCol).cast("binary"))

  /** Deterministic synthetic PNG from a seed byte string: dimensions are
    * `1 + n%16` × `1 + (n*7)%16` for `n = seed length`, pixels are
    * murmur3-derived from the seed — so the driver's DuckDB oracle can
    * predict the DECODED dimensions from the text column alone while the
    * payload itself is a genuine PNG that round-trips through `ImageIO`.
    * This is the test/fixture generator for the real decode path (the
    * container ships no image corpus).
    */
  def synthPngBytes(seed: Array[Byte]): Array[Byte] = {
    val n = seed.length
    val w = 1 + (n % 16)
    val h = 1 + ((n * 7) % 16)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = scala.util.hashing.MurmurHash3.bytesHash(seed, y * w + x + 1)
        img.setRGB(x, y, px & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** `(idCol, binCol)` frame of synthetic PNGs seeded from `textCol` —
    * partition-batched like every other media op.
    */
  def synthesizePng(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // in-memory streams, no temp-file cache
        it.map { case (id, text) =>
          val seed = if (text == null) Array.emptyByteArray
                     else text.getBytes("UTF-8")
          (id, synthPngBytes(seed))
        }
      }
      .toDF(idCol, binCol)
  }

  /** Container format sniffed from magic bytes — cheap, runs even when the
    * body is corrupt (a decode failure still reports what the payload
    * claimed to be).
    */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 3) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
             (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else "unknown"

  /** Real image decode; `Left(reason)` instead of an exception so a bad
    * payload becomes a dead-letter row, never a task failure.
    */
  private def decodeImage(bytes: Array[Byte]): Either[String, BufferedImage] =
    if (bytes == null || bytes.length == 0) Left("empty payload")
    else
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) Left("undecodable payload") else Right(img)
      } catch {
        case e: Exception => Left(s"decode error: ${e.getMessage}")
      }

  /** Partition-batched metadata decode: each executor task streams its
    * partition through one `ImageIO` decoder. Returns a typed Dataset with
    * a proper Encoder — schema carried by the case class, not inferred.
    * Undecodable payloads keep their sniffed format and byte count with
    * the failure reason in `error` (dead-letter, no dropped rows).
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
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          decodeImage(bytes) match {
            case Right(img) =>
              MediaMeta(id, n, Some(img.getWidth), Some(img.getHeight),
                sniffFormat(bytes), None)
            case Left(reason) =>
              MediaMeta(id, n, None, None, sniffFormat(bytes), Some(reason))
          }
        }
      }
  }

  /** Mean-luma over a `g`×`g` grid of the decoded image, row-major, scaled
    * to [0, 1] — a deterministic pixel-derived feature vector (the shape a
    * vision encoder would emit). Cells cover `[c*dim/g, (c+1)*dim/g)` with
    * a 1-pixel floor so images smaller than the grid still fill every cell.
    */
  private def lumaGrid(img: BufferedImage, g: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Float](g * g)
    var cy = 0
    while (cy < g) {
      val y0 = cy * h / g
      val y1 = math.max(y0 + 1, (cy + 1) * h / g)
      var cx = 0
      while (cx < g) {
        val x0 = cx * w / g
        val x1 = math.max(x0 + 1, (cx + 1) * w / g)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xff) +
                 0.587 * ((rgb >> 8) & 0xff) +
                 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(cy * g + cx) = (s / (255.0 * (x1 - x0) * (y1 - y0))).toFloat
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Pixel-derived feature vectors: decode, then mean-luma over a
    * `√dim`×`√dim` grid (dim must be a perfect square). Output is
    * `(idCol, embedding array<float>, error)` — exactly what the
    * [[Similarity]] ANN operators consume after filtering the dead-letter
    * rows (`error IS NULL`), so multimodal → embedding → near-dup/top-k
    * composes end-to-end. Per-partition decoder init, like a real vision
    * encoder's per-batch model load.
    */
  def featureExtract(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      dim: Int = 16): DataFrame = {
    val g = math.sqrt(dim).toInt
    require(g * g == dim, s"dim must be a perfect square, got $dim")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Right(img)   => (id, lumaGrid(img, g), null: String)
            case Left(reason) => (id, null: Array[Float], reason)
          }
        }
      }
      .toDF(idCol, "embedding", "error")
  }

  /** Real image resize: decode, nearest-neighbor resample to `w`×`h`,
    * re-encode as PNG. Nearest-neighbor (not `Graphics2D` interpolation)
    * keeps the output pixels bit-deterministic across JVMs. Undecodable
    * payloads emit a null payload with the reason in `error`.
    */
  def resize(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      w: Int,
      h: Int): DataFrame = {
    require(w > 0 && h > 0, s"resize dimensions must be positive, got ${w}x$h")
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Right(img) =>
              val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                val sy = y * img.getHeight / h
                var x = 0
                while (x < w) {
                  out.setRGB(x, y, img.getRGB(x * img.getWidth / w, sy) & 0xffffff)
                  x += 1
                }
                y += 1
              }
              val baos = new ByteArrayOutputStream()
              ImageIO.write(out, "png", baos)
              (id, baos.toByteArray, null: String)
            case Left(reason) => (id, null: Array[Byte], reason)
          }
        }
      }
      .toDF(idCol, binCol, "error")
  }

  /** Frame sampling STUB: one output row per sampled "frame" (every
    * `everyN`-th chunk of `frameBytes` bytes). Video codecs are not on a
    * stock JVM, so the chunking stands in for real frame decode — what is
    * real and tested is the 1→N generator shape (id, frame_idx, frame
    * bytes) that an ffmpeg-backed implementation would keep verbatim.
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
