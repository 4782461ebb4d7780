package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media metadata extracted by the image decoder. `width`/`height` are
  * absent and `error` is set when the payload does not decode — the
  * dead-letter contract: no row is dropped, failures stay addressable.
  * `doc_id` is the internal string carry (see [[Multimodal.mediaIdOutType]]);
  * the public ops cast it back to the caller's id type on the way out.
  */
final case class MediaMeta(
    doc_id: String,
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
  * in a dead-letter `error` column instead of failing the job. The VIDEO
  * path is real for MJPEG-in-AVI — the one video format a stock JVM can
  * both contain-parse (RIFF is a public Microsoft spec, ~60 lines of
  * chunk walking) and frame-decode (each MJPEG frame is a standalone
  * JPEG): [[frameSample]] walks the `movi` list and decodes sampled
  * frames with the same `ImageIO` codec as the image path, so sampled
  * frames feed [[decodeMeta]]/[[featureExtract]]/[[resize]] directly.
  * Other containers (MP4/H.264 needs a real codec) dead-letter with a
  * sniffed reason rather than pretending.
  */
object Multimodal {

  /** The typed media paths carry ids as STRINGS — the cast round-trips
    * exactly for integral ids (normalized back to `long` on the way out,
    * as before) and for string ids (URLs, UUIDs — the common corpus keys),
    * following `Packing.packFirstFitDecreasing`'s pattern. Any other id
    * type (floats, dates, structs) would change meaning under the carry,
    * so it is rejected loudly rather than silently null-cast. Returns the
    * OUTPUT id type for the op to cast back to.
    */
  private[ops] def mediaIdOutType(
      df: DataFrame, idCol: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val t = df.schema(idCol).dataType
    val ok = t match {
      case ByteType | ShortType | IntegerType | LongType | StringType => true
      case d: DecimalType => d.scale == 0 && d.precision <= 18
      case _ => false
    }
    require(ok, s"media ops need an integral or string id column, $idCol is $t — " +
      "any other type would change meaning under the internal string carry")
    if (t == StringType) StringType else LongType
  }

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
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false) // in-memory streams, no temp-file cache
        it.map { case (id, text) =>
          val seed = if (text == null) Array.emptyByteArray
                     else text.getBytes("UTF-8")
          (id, synthPngBytes(seed))
        }
      }
      .toDF(idCol, binCol)
      .withColumn(idCol, col(idCol).cast(outT))
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
    * partition through one `ImageIO` decoder. Schema is carried by the
    * [[MediaMeta]] case class (not inferred); the output `doc_id` column
    * keeps the caller's id kind (integral → long, string → string).
    * Undecodable payloads keep their sniffed format and byte count with
    * the failure reason in `error` (dead-letter, no dropped rows).
    */
  def decodeMeta(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String): DataFrame = {
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
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
      .toDF()
      .withColumn("doc_id", col("doc_id").cast(outT))
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
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
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
      .withColumn(idCol, col(idCol).cast(outT))
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
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
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
      .withColumn(idCol, col(idCol).cast(outT))
  }

  // ---- MJPEG-in-AVI video: RIFF container writer + parser ----------------
  //
  // AVI is RIFF (Microsoft's public multimedia container spec): a tree of
  // [fourcc][u32-LE size][payload, even-padded] chunks; `LIST` chunks nest
  // and carry a 4-byte list type. Video frames live in the `movi` list as
  // `##dc`/`##db` chunks (## = stream number); for the MJPG handler each
  // frame payload is a complete baseline JPEG — decodable by `ImageIO`
  // with zero extra dependencies.

  private def leU32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leU16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def riffChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray
    fourcc.getBytes("US-ASCII") ++ leU32(data.length.toLong) ++ data ++ pad
  }

  private def riffList(listType: String, subs: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ subs)

  /** Minimal valid single-stream MJPEG AVI from pre-encoded JPEG frames —
    * the fixture/synthesizer side of the video path (the container ships
    * no video corpus, same situation as [[synthPngBytes]]).
    */
  def mjpegAviBytes(jpegFrames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "an AVI needs at least one frame")
    require(fps > 0, s"fps must be positive, got $fps")
    val n = jpegFrames.length
    val maxFrame = jpegFrames.map(_.length).max
    val avih = riffChunk("avih",
      leU32(1000000L / fps) ++ leU32(0) ++ leU32(0) ++ leU32(0) ++
        leU32(n.toLong) ++ leU32(0) ++ leU32(1) ++ leU32(maxFrame.toLong) ++
        leU32(w.toLong) ++ leU32(h.toLong) ++ Array.fill(16)(0.toByte))
    val strh = riffChunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        leU32(0) ++ leU16(0) ++ leU16(0) ++ leU32(0) ++
        leU32(1) ++ leU32(fps.toLong) ++ // scale, rate → fps frames/sec
        leU32(0) ++ leU32(n.toLong) ++ leU32(maxFrame.toLong) ++
        leU32(0xffffffffL) ++ leU32(0) ++
        leU16(0) ++ leU16(0) ++ leU16(w) ++ leU16(h))
    val strf = riffChunk("strf",
      leU32(40) ++ leU32(w.toLong) ++ leU32(h.toLong) ++ leU16(1) ++ leU16(24) ++
        "MJPG".getBytes("US-ASCII") ++ leU32(w.toLong * h * 3) ++
        leU32(0) ++ leU32(0) ++ leU32(0) ++ leU32(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      jpegFrames.toArray.flatMap(f => riffChunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ body
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the RIFF tree and return the video-frame chunk payloads
    * (`##dc`/`##db` inside `movi`/`rec ` lists) in file order.
    * `Left(reason)` on anything that is not a structurally valid AVI —
    * the dead-letter reason, never an exception.
    */
  def aviVideoFrames(bytes: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return Left("empty or truncated payload")
    if (fourccAt(bytes, 0) != "RIFF") return Left(s"not a RIFF container (${sniffFormat(bytes)})")
    if (fourccAt(bytes, 8) != "AVI ") return Left(s"RIFF but not AVI (form '${fourccAt(bytes, 8)}')")
    val end = math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt
    val frames = Vector.newBuilder[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        id(2) == 'd' && (id(3) == 'b' || id(3) == 'c')
    // returns an error message or null; iterative per level, recursive into
    // LISTs (RIFF nesting is shallow — hdrl/strl/movi/rec is depth 3)
    def walk(start: Int, stop: Int, inMovi: Boolean): String = {
      var off = start
      while (off + 8 <= stop) {
        val id = fourccAt(bytes, off)
        val sz = u32(bytes, off + 4)
        if (sz > Int.MaxValue || off + 8 + sz > stop)
          return s"truncated chunk '$id' at offset $off"
        if (id == "LIST" && sz >= 4) {
          val ltype = fourccAt(bytes, off + 8)
          val err = walk(off + 12, off + 8 + sz.toInt,
            inMovi || ltype == "movi" || ltype == "rec ")
          if (err != null) return err
        } else if (inMovi && isFrameId(id)) {
          frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + sz.toInt)
        }
        off += 8 + sz.toInt + (sz.toInt & 1)
      }
      null
    }
    val err = walk(12, end, inMovi = false)
    if (err != null) Left(err) else Right(frames.result())
  }

  /** Deterministic synthetic MJPEG AVI from a seed byte string, the video
    * twin of [[synthPngBytes]]: `n = seed length` gives `1 + n%4` frames of
    * `2 + n%8` × `2 + (n*3)%8` pixels, so an oracle can predict the frame
    * count and decoded dimensions from the text column alone while the
    * payload is a genuine AVI that round-trips through the RIFF parser and
    * `ImageIO`'s JPEG codec.
    */
  def synthAviBytes(seed: Array[Byte]): Array[Byte] = {
    val n = seed.length
    val nFrames = 1 + (n % 4)
    val w = 2 + (n % 8)
    val h = 2 + ((n * 3) % 8)
    val frames = (0 until nFrames).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = scala.util.hashing.MurmurHash3.bytesHash(seed, (f + 1) * (y * w + x + 1))
          img.setRGB(x, y, px & 0xffffff)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    mjpegAviBytes(frames, w, h)
  }

  /** `(idCol, binCol)` frame of synthetic MJPEG AVIs seeded from `textCol`. */
  def synthesizeAvi(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      binCol: String): DataFrame = {
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val seed = if (text == null) Array.emptyByteArray
                     else text.getBytes("UTF-8")
          (id, synthAviBytes(seed))
        }
      }
      .toDF(idCol, binCol)
      .withColumn(idCol, col(idCol).cast(outT))
  }

  /** Cheap structural JPEG check: SOI marker at the start, EOI anywhere
    * after it (scanned from the tail — real MJPEG encoders commonly pad
    * frame chunks with trailing bytes after the EOI, which `ImageIO`
    * ignores, so requiring EOI to be the final two bytes would drop valid
    * frames). [[frameSample]] uses this instead of a full decode — fully
    * decoding a frame just to validate it doubled per-frame decode cost
    * on the hot video path. `error IS NULL` therefore means "structurally
    * JPEG-framed", NOT "decodable": downstream
    * [[decodeMeta]]/[[featureExtract]] perform the one real decode and
    * dead-letter frames with intact markers but corrupt entropy data.
    */
  private[ops] def jpegMarkersOk(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return false
    var i = b.length - 2
    while (i >= 2) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xd9) return true
      i -= 1
    }
    false
  }

  /** REAL frame sampling over MJPEG-in-AVI payloads: parse the RIFF
    * container, take every `everyN`-th video frame, validate it with a
    * structural JPEG marker sniff ([[jpegMarkersOk]] — the full decode
    * happens exactly once, in whichever downstream op consumes the frame).
    * One output row per sampled frame `(id, frame_idx, frame, error)`
    * where `frame` is the raw JPEG payload — directly consumable by
    * [[decodeMeta]] / [[featureExtract]] / [[resize]]. Dead-letter
    * contract: a payload that is not a valid AVI (or a frame without JPEG
    * markers) yields a row with null frame and the reason — never a
    * dropped row or failed task.
    */
  def frameSample(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val outT = mediaIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviVideoFrames(bytes) match {
            case Left(reason) =>
              Iterator.single((id, None: Option[Int], null: Array[Byte], Option(reason)))
            case Right(fs) if fs.isEmpty =>
              Iterator.single((id, None: Option[Int], null: Array[Byte],
                Option("AVI contains no video frames")))
            case Right(fs) =>
              Iterator.range(0, fs.length, everyN).map { i =>
                if (jpegMarkersOk(fs(i))) (id, Option(i), fs(i), None: Option[String])
                else (id, Option(i), null: Array[Byte],
                  Option(s"frame $i: missing JPEG SOI/EOI markers"))
              }
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame", "error")
      .withColumn(idCol, col(idCol).cast(outT))
  }
}
