package graft.ops

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio metadata from the WAV decoder — dead-letter contract identical to
  * [[MediaMeta]]: decode failures keep the row with a reason, never drop it.
  * `doc_id` is the internal string carry; [[Audio.audioMeta]] casts it back
  * to the caller's id kind on the way out.
  */
final case class AudioMeta(
    doc_id: String,
    n_bytes: Long,
    sample_rate: Option[Int],
    channels: Option[Int],
    bits: Option[Int],
    n_samples: Option[Long],
    duration_ms: Option[Long],
    error: Option[String])

/** Audio-column operators, completing the image/video/audio multimodal
  * triple. WAV (RIFF/WAVE — same public container family as
  * [[Multimodal]]'s AVI) is the format a stock JVM decodes natively:
  * `javax.sound.sampled.AudioSystem` parses the container and yields raw
  * PCM with zero extra dependencies. Metadata and features derive from the
  * DECODED stream; compressed formats (MP3/AAC need a codec) dead-letter
  * with a reason rather than pretending.
  *
  * Same execution shape as the other media ops: `mapPartitions` batches so
  * per-task decoder init amortizes, ids guarded against silent null-casts,
  * every op a 1→1 generator with no shuffle.
  */
object Audio {

  /** Same id contract as the image/video ops: integral or string, carried
    * internally as string, cast back on the way out
    * ([[Multimodal.mediaIdOutType]]).
    */
  private def audioIdOutType(df: DataFrame, idCol: String) =
    Multimodal.mediaIdOutType(df, idCol)

  private def leU32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def leU16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** PCM WAV (RIFF/WAVE `fmt ` + `data`) from raw little-endian frame data
    * of any channel count at 8, 16, or 24 bits — the general writer behind
    * [[wavBytes]] and the multi-channel [[resample]] output.
    */
  def wavBytesRaw(
      data: Array[Byte], sampleRate: Int, channels: Int, bits: Int): Array[Byte] = {
    require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
      s"bits must be 8, 16, 24 or 32, got $bits")
    wavBytesTagged(data, sampleRate, channels, bits, formatTag = 1)
  }

  /** WAVE_FORMAT_EXTENSIBLE wrapper (fmt tag 0xFFFE with the 22-byte
    * extension) over integer-PCM (`innerTag = 1`) or IEEE-float
    * (`innerTag = 3`) frame data — the layout professional tools emit for
    * multi-channel or >16-bit WAVs, and the one the stock JVM reader
    * rejects ([[decodeWav]] carries its own parser for it). The SubFormat
    * GUID is the public KSDATAFORMAT one with the inner tag in Data1.
    */
  def wavBytesExtensible(
      data: Array[Byte], sampleRate: Int, channels: Int, bits: Int,
      innerTag: Int = 1): Array[Byte] = {
    require(innerTag == 1 || innerTag == 3,
      s"innerTag must be 1 (PCM) or 3 (IEEE float), got $innerTag")
    val guid = leU32(innerTag.toLong) ++
      Array(0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
        0x00, 0x38, 0x9B, 0x71).map(_.toByte)
    val extension = leU16(22) ++ leU16(bits) /* valid bits */ ++
      leU32(0L) /* channel mask: unspecified */ ++ guid
    wavBytesTagged(data, sampleRate, channels, bits, formatTag = 0xFFFE,
      extension = extension)
  }

  /** IEEE-float WAV (format tag 3, 32-bit little-endian samples) — the
    * other sample format real audio corpora carry. Samples are nominally
    * in [-1, 1] per the WAV spec.
    */
  def wavBytesFloat(
      samples: Array[Float], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    val data = new Array[Byte](samples.length * 4)
    var i = 0
    while (i < samples.length) {
      val b = java.lang.Float.floatToIntBits(samples(i))
      data(4 * i) = (b & 0xff).toByte
      data(4 * i + 1) = ((b >> 8) & 0xff).toByte
      data(4 * i + 2) = ((b >> 16) & 0xff).toByte
      data(4 * i + 3) = ((b >> 24) & 0xff).toByte
      i += 1
    }
    wavBytesTagged(data, sampleRate, channels, bits = 32, formatTag = 3)
  }

  private def wavBytesTagged(
      data: Array[Byte], sampleRate: Int, channels: Int, bits: Int,
      formatTag: Int, extension: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    require(channels >= 1, s"channels must be >= 1, got $channels")
    val blockAlign = channels * (bits / 8)
    val fmt = leU16(formatTag) ++ leU16(channels) ++ leU32(sampleRate.toLong) ++
      leU32(sampleRate.toLong * blockAlign) ++ leU16(blockAlign) ++ leU16(bits) ++
      extension
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ leU32(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ leU32(data.length.toLong) ++ data
    "RIFF".getBytes("US-ASCII") ++ leU32(body.length.toLong) ++ body
  }

  /** Canonical 16-bit mono PCM WAV (RIFF/WAVE `fmt ` + `data`). */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    wavBytesRaw(data, sampleRate, channels = 1, bits = 16)
  }

  /** Deterministic synthetic WAV from a seed byte string, the audio twin
    * of `synthPngBytes`/`synthAviBytes`: `n = seed length` gives
    * `160 + (n % 32) · 40` murmur-derived samples at 8 kHz mono 16-bit —
    * so an oracle predicts sample count and duration (`20 + 5·(n % 32)`
    * ms, exact integer) from the text column alone while the payload is a
    * genuine WAV that round-trips through `AudioSystem`.
    */
  def synthWavBytes(seed: Array[Byte]): Array[Byte] = {
    val n = seed.length
    val nSamples = 160 + (n % 32) * 40
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = (scala.util.hashing.MurmurHash3.bytesHash(seed, i + 1) % 30000).toShort
      i += 1
    }
    wavBytes(samples, 8000)
  }

  /** `(idCol, binCol)` frame of synthetic WAVs seeded from `textCol`. */
  def synthesizeWav(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      binCol: String): DataFrame = {
    val outT = audioIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions(_.map { case (id, text) =>
        val seed = if (text == null) Array.emptyByteArray
                   else text.getBytes("UTF-8")
        (id, synthWavBytes(seed))
      })
      .toDF(idCol, binCol)
      .withColumn(idCol, col(idCol).cast(outT))
  }

  /** Real audio decode: container + format from `AudioSystem`, PCM samples
    * read through the decoded stream; WAVE_FORMAT_EXTENSIBLE — which the
    * stock JVM reader rejects but real crawls carry routinely — falls back
    * to [[decodeExtensibleWav]]. `Left(reason)` for anything neither path
    * can decode (dead-letter, never a task failure).
    */
  private def decodeWav(bytes: Array[Byte]): Either[String, (javax.sound.sampled.AudioFormat, Array[Byte])] =
    if (bytes == null || bytes.length == 0) Left("empty payload")
    else
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try Right((in.getFormat, in.readAllBytes())) finally in.close()
      } catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          decodeExtensibleWav(bytes).left.map(_ =>
            s"not a decodable audio payload: ${e.getMessage}")
        case e: Exception => Left(s"decode error: ${e.getMessage}")
      }

  /** Minimal RIFF walk for WAVE_FORMAT_EXTENSIBLE (fmt tag 0xFFFE): the
    * 22-byte extension's SubFormat GUID carries the REAL format tag in its
    * first four bytes (1 = integer PCM, 3 = IEEE float — the public
    * KSDATAFORMAT registrations); everything else reads like a basic fmt
    * chunk. Only called after `AudioSystem` declined the payload, so the
    * basic-WAV path is byte-for-byte the JVM's own.
    */
  private def decodeExtensibleWav(
      bytes: Array[Byte]): Either[String, (javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      def ascii(o: Int) = new String(bytes, o, 4, "US-ASCII")
      def u16(o: Int) = ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
      def u32(o: Int): Long =
        ((bytes(o + 3) & 0xffL) << 24) | ((bytes(o + 2) & 0xffL) << 16) |
          ((bytes(o + 1) & 0xffL) << 8) | (bytes(o) & 0xffL)
      if (bytes.length < 44 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        Left("not a RIFF/WAVE payload")
      else {
        var off = 12
        var fmtOff = -1; var fmtLen = 0; var dataOff = -1; var dataLen = 0
        while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
          val id = ascii(off)
          val len = u32(off + 4).toInt
          if (id == "fmt ") { fmtOff = off + 8; fmtLen = len }
          else if (id == "data") { dataOff = off + 8; dataLen = len }
          off += 8 + len + (len & 1) // chunks pad to even offsets
        }
        if (fmtOff < 0 || dataOff < 0) Left("missing fmt /data chunk")
        else if (u16(fmtOff) != 0xFFFE) Left("not an extensible WAV")
        else if (fmtLen < 40) Left("extensible fmt chunk too short")
        else {
          import javax.sound.sampled.AudioFormat
          import javax.sound.sampled.AudioFormat.Encoding._
          val channels = u16(fmtOff + 2)
          val rate = u32(fmtOff + 4).toInt
          val bits = u16(fmtOff + 14)
          val innerTag = u32(fmtOff + 24).toInt // GUID Data1
          val enc = innerTag match {
            case 1 => Some(if (bits == 8) PCM_UNSIGNED else PCM_SIGNED)
            case 3 => Some(PCM_FLOAT)
            case _ => None
          }
          if (enc.isEmpty)
            Left(s"unsupported extensible inner format tag $innerTag")
          else if (channels < 1 || rate <= 0 || bits < 8 || bits % 8 != 0)
            Left("malformed extensible fmt chunk")
          else {
            val fmt = new AudioFormat(enc.get, rate.toFloat, bits, channels,
              channels * (bits / 8), rate.toFloat, /* bigEndian = */ false)
            val end = math.min(dataOff.toLong + dataLen, bytes.length.toLong).toInt
            Right((fmt, java.util.Arrays.copyOfRange(bytes, dataOff, end)))
          }
        }
      }
    } catch {
      case e: Exception => Left(s"extensible parse error: ${e.getMessage}")
    }

  /** Partition-batched audio metadata: sample rate, channels, bit depth,
    * sample count, integer-exact duration (`n_samples * 1000 / rate`).
    */
  def audioMeta(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String): DataFrame = {
    val outT = audioIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = if (bytes == null) 0L else bytes.length.toLong
        decodeWav(bytes) match {
          case Right((fmt, pcm)) =>
            val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8) * fmt.getChannels
            val nSamples = pcm.length.toLong / bytesPerSample
            AudioMeta(id, n, Some(fmt.getSampleRate.toInt), Some(fmt.getChannels),
              Some(fmt.getSampleSizeInBits), Some(nSamples),
              Some(nSamples * 1000L / fmt.getSampleRate.toLong), None)
          case Left(reason) =>
            AudioMeta(id, n, None, None, None, None, None, Some(reason))
        }
      })
      .toDF()
      .withColumn("doc_id", col("doc_id").cast(outT))
  }

  /** Sample-rate conversion by linear interpolation — the audio twin of
    * [[Multimodal.resize]]: decode, resample PCM to `toRate` PER CHANNEL,
    * re-encode as WAV preserving channel count and bit depth. Supports 8-,
    * 16-, 24- and 32-bit little-endian integer PCM at any channel count (8-bit
    * WAV PCM is unsigned per the spec; each channel interpolates
    * independently over its own samples). All interpolation arithmetic is
    * EXACT integer math on the rational source position `j·fromRate/toRate`
    * (no floats anywhere), so output payloads are bit-identical across
    * JVMs and engines; output length is `⌊n·toRate/fromRate⌋` frames,
    * which preserves integer-ms durations exactly. Unsupported layouts
    * (big-endian, IEEE-float — float interpolation has no exact integer
    * form, so pretending would break the bit-stability contract) and
    * undecodable payloads dead-letter with the reason;
    * [[audioFeatures]]/[[audioMeta]] still cover float payloads.
    */
  def resample(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String,
      toRate: Int): DataFrame = {
    require(toRate > 0, s"toRate must be positive, got $toRate")
    val outT = audioIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Right((fmt, pcm))
              if (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8 ||
                fmt.getSampleSizeInBits == 24 || fmt.getSampleSizeInBits == 32) &&
                !fmt.isBigEndian &&
                fmt.getEncoding !=
                  javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT =>
            val bits = fmt.getSampleSizeInBits
            val ch = fmt.getChannels
            val bytesPerSample = bits / 8
            val blockAlign = ch * bytesPerSample
            val n = pcm.length / blockAlign // frames
            val fromRate = fmt.getSampleRate.toInt
            if (n == 0)
              (id, wavBytesRaw(Array.emptyByteArray, toRate, ch, bits), null: String)
            else {
              val outN = math.max(1, (n.toLong * toRate / fromRate).toInt)
              val out = new Array[Byte](outN * blockAlign)
              var c = 0
              while (c < ch) {
                def sampleAt(i: Int): Int = {
                  val off = math.min(i, n - 1) * blockAlign + c * bytesPerSample
                  if (bits == 32)
                    ((pcm(off + 3) & 0xff) << 24) | ((pcm(off + 2) & 0xff) << 16) |
                      ((pcm(off + 1) & 0xff) << 8) | (pcm(off) & 0xff)
                  else if (bits == 24) {
                    val u = ((pcm(off + 2) & 0xff) << 16) |
                      ((pcm(off + 1) & 0xff) << 8) | (pcm(off) & 0xff)
                    (u << 8) >> 8 // sign-extend 24 → 32
                  } else if (bits == 16)
                    ((pcm(off + 1) << 8) | (pcm(off) & 0xff)).toShort.toInt
                  else pcm(off) & 0xff // 8-bit WAV PCM is unsigned
                }
                var j = 0
                while (j < outN) {
                  val num = j.toLong * fromRate // source position = num / toRate
                  val i0 = (num / toRate).toInt
                  val frac = num % toRate
                  val s0 = sampleAt(i0)
                  // the delta in Long: two full-range 32-bit samples differ
                  // by up to 2^32, past Int
                  val v = (s0 + (sampleAt(i0 + 1).toLong - s0) * frac / toRate).toInt
                  val off = j * blockAlign + c * bytesPerSample
                  out(off) = (v & 0xff).toByte
                  if (bits >= 16) out(off + 1) = ((v >> 8) & 0xff).toByte
                  if (bits >= 24) out(off + 2) = ((v >> 16) & 0xff).toByte
                  if (bits == 32) out(off + 3) = ((v >> 24) & 0xff).toByte
                  j += 1
                }
                c += 1
              }
              (id, wavBytesRaw(out, toRate, ch, bits), null: String)
            }
          case Right(_) =>
            (id, null: Array[Byte],
              "resample supports 8/16/24/32-bit little-endian integer PCM only")
          case Left(reason) => (id, null: Array[Byte], reason)
        }
      })
      .toDF(idCol, binCol, "error")
      .withColumn(idCol, col(idCol).cast(outT))
  }

  private def featurable(fmt: javax.sound.sampled.AudioFormat): Boolean = {
    import javax.sound.sampled.AudioFormat.Encoding._
    val enc = fmt.getEncoding
    val bits = fmt.getSampleSizeInBits
    ((enc == PCM_SIGNED || enc == PCM_UNSIGNED) &&
      (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
      (enc == PCM_FLOAT && bits == 32)
  }

  /** Signal features from the decoded PCM (first channel): RMS energy,
    * peak amplitude, zero-crossing count — the deterministic scalar shape
    * an audio encoder front-end emits. Supports 8/16/24/32-bit integer PCM
    * (either endianness; 8-bit WAV PCM is unsigned per the spec, centered
    * at 128 here) and 32-bit IEEE-float PCM. Float samples are nominally
    * in [-1, 1], so they are scaled by 2^15 into the 16-bit integer domain
    * to keep `rms`/`peak` comparable across sample formats (`peak`
    * truncates to int). Determinism: 8/16-bit sums are exact integer
    * arithmetic; 24-bit and float accumulate sequentially in double —
    * every op exactly rounded per IEEE-754 in a fixed order, so results
    * are bit-stable across JVMs either way. Output
    * `(idCol, rms double, peak int, zero_crossings long, error)`.
    */
  def audioFeatures(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      binCol: String): DataFrame = {
    val outT = audioIdOutType(df, idCol)
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(binCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Right((fmt, pcm)) if featurable(fmt) =>
            val bits = fmt.getSampleSizeInBits
            val isFloat =
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT
            val bytesPer = bits / 8
            val step = bytesPer * fmt.getChannels // first channel of each frame
            val bigEndian = fmt.isBigEndian
            val exact = !isFloat && bits <= 16 // Long accumulator stays exact
            var i = 0
            var sumSqL = 0L
            var sumSqD = 0.0
            var peak = 0.0
            var zc = 0L
            var prevNeg = false
            var first = true
            while (i + bytesPer - 1 < pcm.length) {
              val v: Double =
                if (isFloat) {
                  val b =
                    if (bigEndian)
                      ((pcm(i) & 0xff) << 24) | ((pcm(i + 1) & 0xff) << 16) |
                        ((pcm(i + 2) & 0xff) << 8) | (pcm(i + 3) & 0xff)
                    else
                      ((pcm(i + 3) & 0xff) << 24) | ((pcm(i + 2) & 0xff) << 16) |
                        ((pcm(i + 1) & 0xff) << 8) | (pcm(i) & 0xff)
                  java.lang.Float.intBitsToFloat(b).toDouble * 32768.0
                } else if (bits == 32) {
                  (if (bigEndian)
                    ((pcm(i) & 0xff) << 24) | ((pcm(i + 1) & 0xff) << 16) |
                      ((pcm(i + 2) & 0xff) << 8) | (pcm(i + 3) & 0xff)
                  else
                    ((pcm(i + 3) & 0xff) << 24) | ((pcm(i + 2) & 0xff) << 16) |
                      ((pcm(i + 1) & 0xff) << 8) | (pcm(i) & 0xff)).toDouble
                } else if (bits == 24) {
                  val u =
                    if (bigEndian)
                      ((pcm(i) & 0xff) << 16) | ((pcm(i + 1) & 0xff) << 8) |
                        (pcm(i + 2) & 0xff)
                    else
                      ((pcm(i + 2) & 0xff) << 16) | ((pcm(i + 1) & 0xff) << 8) |
                        (pcm(i) & 0xff)
                  ((u << 8) >> 8).toDouble // sign-extend 24 → 32
                } else if (bits == 16) {
                  (if (bigEndian) ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort.toInt
                   else ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort.toInt).toDouble
                } else ((pcm(i) & 0xff) - 128).toDouble // 8-bit WAV PCM is unsigned
              if (exact) { val s = v.toInt; sumSqL += s.toLong * s }
              else sumSqD += v * v
              val a = math.abs(v)
              if (a > peak) peak = a
              val neg = v < 0
              if (!first && neg != prevNeg) zc += 1
              prevNeg = neg
              first = false
              i += step
            }
            val nFrames = pcm.length / step
            val sumSq = if (exact) sumSqL.toDouble else sumSqD
            val rms = if (nFrames == 0) 0.0 else math.sqrt(sumSq / nFrames)
            (id, rms, peak.toInt, zc, null: String)
          case Right(_) =>
            (id, 0.0, 0, 0L,
              "unsupported sample format (integer PCM 8/16/24/32-bit or float32 only)")
          case Left(reason) => (id, 0.0, 0, 0L, reason)
        }
      })
      .toDF(idCol, "rms", "peak", "zero_crossings", "error")
      .withColumn(idCol, col(idCol).cast(outT))
  }
}
