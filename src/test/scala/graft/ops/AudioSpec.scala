package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Audio path: real WAV decode through javax.sound.sampled, dead-letter
  * behavior, and hand-computed signal features.
  */
class AudioSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    frame(struct("doc_id" -> LongType, "text" -> StringType),
      rows.map { case (i, t) => Row(i, t) }: _*)

  // AudioMeta columns: doc_id 0, n_bytes 1, sample_rate 2, channels 3,
  // bits 4, n_samples 5, duration_ms 6, error 7

  test("synthesized WAV decodes to the contract dimensions") {
    // n=7 → 160 + 7·40 = 440 samples @8 kHz → 55 ms exactly
    val wav = Audio.synthesizeWav(spark, docs(1L -> ("x" * 7)), "doc_id", "text", "payload")
    val m = Audio.audioMeta(spark, wav, "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getInt(3) == 1 && m.getInt(4) == 16
      && m.getLong(5) == 440L && m.getLong(6) == 55L && m.isNullAt(7))
  }

  test("non-audio payloads dead-letter; string ids carry through; bad id types rejected") {
    val junk = Audio.audioMeta(spark,
      Multimodal.withBinaryPayload(docs(9L -> "not audio"), "text", "payload"),
      "doc_id", "payload").head()
    assert(!junk.isNullAt(7) && junk.isNullAt(2))
    // URL/UUID ids ride the whole audio chain and come back as strings
    val strIds = frame(struct("doc_id" -> StringType, "text" -> StringType),
      Row("https://a.com/x", "x" * 7), Row("u-2", "y" * 3))
    val wav = Audio.synthesizeWav(spark, strIds, "doc_id", "text", "payload")
    val metas = Audio.audioMeta(spark, wav, "doc_id", "payload")
    assert(metas.schema("doc_id").dataType == StringType)
    val byId = metas.collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(byId == Map("https://a.com/x" -> 440L, "u-2" -> 280L))
    val res = Audio.resample(spark, wav, "doc_id", "payload", toRate = 4000)
    assert(res.schema("doc_id").dataType == StringType &&
      res.collect().map(_.getString(0)).toSet == Set("https://a.com/x", "u-2"))
    // non-integral non-string ids still fail loudly
    val badIds = frame(struct("doc_id" -> DoubleType, "text" -> StringType),
      Row(1.5, "t"))
    val err = intercept[IllegalArgumentException] {
      Audio.synthesizeWav(spark, badIds, "doc_id", "text", "payload")
    }
    assert(err.getMessage.contains("integral or string id"))
  }

  test("audio decode dead-letters every junk payload without failing tasks") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 100L).map { i =>
      Row(i, Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    }
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType), rows: _*)
    val metas = Audio.audioMeta(spark, df, "doc_id", "payload").collect()
    assert(metas.length == 100 && metas.forall(r => !r.isNullAt(7)))
    // corrupting a valid WAV's body must not fail the task either
    val wav = Audio.synthWavBytes("seed".getBytes("UTF-8"))
    val mutated = (0 until 20).map { i =>
      val m = wav.clone(); m(i * wav.length / 20) = 0x55.toByte; Row(i.toLong, m)
    }
    val mdf = frame(struct("doc_id" -> LongType, "payload" -> BinaryType), mutated: _*)
    assert(Audio.audioMeta(spark, mdf, "doc_id", "payload").count() == 20)
  }

  test("resample: exact integer linear interpolation, duration preserved") {
    // upsample [0, 1000] from 4 kHz to 8 kHz: positions 0, ½, 1, 1½ →
    // 0, 500, 1000, 1000 (tail clamps to the last sample)
    val up = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, Audio.wavBytes(Array[Short](0, 1000), sampleRate = 4000)))
    val out = Audio.resample(spark, up, "doc_id", "payload", toRate = 8000).head()
    assert(out.isNullAt(2), "valid input must not dead-letter")
    val m = Audio.audioMeta(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
        Row(1L, out.getAs[Array[Byte]](1))), "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getLong(5) == 4L)
    val pcm = java.util.Arrays.copyOfRange(
      out.getAs[Array[Byte]](1), out.getAs[Array[Byte]](1).length - 8,
      out.getAs[Array[Byte]](1).length)
    val samples = (0 until 4).map(i =>
      (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort)
    assert(samples == Seq(0.toShort, 500.toShort, 1000.toShort, 1000.toShort))
    // downsample halves the count and keeps the ms duration (8 kHz corpus)
    val wav = Audio.synthesizeWav(
      spark, frame(struct("doc_id" -> LongType, "text" -> StringType),
        Row(1L, "x" * 7)), "doc_id", "text", "payload")
    val half = Audio.resample(spark, wav, "doc_id", "payload", toRate = 4000)
    val hm = Audio.audioMeta(spark, half, "doc_id", "payload").head()
    assert(hm.getLong(5) == 220L && hm.getLong(6) == 55L,
      "440 samples @8 kHz → 220 @4 kHz, still exactly 55 ms")
    // junk dead-letters with the decode reason
    val junk = Audio.resample(spark,
      Multimodal.withBinaryPayload(
        frame(struct("doc_id" -> LongType, "text" -> StringType), Row(9L, "junk")),
        "text", "payload"),
      "doc_id", "payload", toRate = 4000).head()
    assert(!junk.isNullAt(2) && junk.isNullAt(1))
  }

  test("resample: stereo interpolates per channel, preserving the layout") {
    // L = [0, 1000], R = [1000, 0] @4 kHz → 8 kHz:
    // L → [0, 500, 1000, 1000], R → [1000, 500, 0, 0] (tails clamp)
    def le16(vs: Short*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val stereo = Audio.wavBytesRaw(
      le16(0, 1000, 1000, 0), sampleRate = 4000, channels = 2, bits = 16)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, stereo))
    val out = Audio.resample(spark, df, "doc_id", "payload", toRate = 8000).head()
    assert(out.isNullAt(2), "stereo must no longer dead-letter")
    val bytes = out.getAs[Array[Byte]](1)
    val m = Audio.audioMeta(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
        Row(1L, bytes)), "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getInt(3) == 2 && m.getInt(4) == 16
      && m.getLong(5) == 4L, "4 frames of 2 channels at 8 kHz")
    val pcm = java.util.Arrays.copyOfRange(bytes, bytes.length - 16, bytes.length)
    val samples = (0 until 8).map(i =>
      (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort)
    assert(samples == Seq[Short](0, 1000, 500, 500, 1000, 0, 1000, 0),
      "interleaved L/R frames, each channel interpolated independently")
  }

  test("resample: 8-bit unsigned PCM interpolates and keeps its bit depth") {
    val eight = Audio.wavBytesRaw(
      Array[Byte](0, 200.toByte), sampleRate = 4000, channels = 1, bits = 8)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, eight))
    val out = Audio.resample(spark, df, "doc_id", "payload", toRate = 8000).head()
    assert(out.isNullAt(2), "8-bit must no longer dead-letter")
    val bytes = out.getAs[Array[Byte]](1)
    val m = Audio.audioMeta(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
        Row(1L, bytes)), "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getInt(4) == 8 && m.getLong(5) == 4L)
    val pcm = java.util.Arrays.copyOfRange(bytes, bytes.length - 4, bytes.length)
    assert(pcm.map(_ & 0xff).toSeq == Seq(0, 100, 200, 200),
      "unsigned byte samples interpolate as 0..255 values")
  }

  test("24-bit PCM: decode, hand-computed features, exact resample") {
    def le24(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte)).toArray
    // two samples beyond the 16-bit range — only 24-bit carries them
    val wav = Audio.wavBytesRaw(le24(100000, -100000), 4000, channels = 1, bits = 24)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, wav))
    val m = Audio.audioMeta(spark, df, "doc_id", "payload").head()
    assert(m.getInt(2) == 4000 && m.getInt(4) == 24 && m.getLong(5) == 2L
      && m.isNullAt(7), "24-bit WAV must decode, not dead-letter")
    val f = Audio.audioFeatures(spark, df, "doc_id", "payload").head()
    // sumSq = 2·1e10 over 2 frames → rms = 100000 exactly; one sign change
    assert(f.getInt(2) == 100000 && f.getLong(3) == 1L && f.isNullAt(4))
    assert(math.abs(f.getDouble(1) - 100000.0) < 1e-9)
    // 4 kHz → 8 kHz: [100000, midpoint 0, -100000, clamp -100000]
    val out = Audio.resample(spark, df, "doc_id", "payload", toRate = 8000).head()
    assert(out.isNullAt(2), "24-bit must no longer dead-letter in resample")
    val bytes = out.getAs[Array[Byte]](1)
    val pcm = java.util.Arrays.copyOfRange(bytes, bytes.length - 12, bytes.length)
    def s24(o: Int) = {
      val u = ((pcm(o + 2) & 0xff) << 16) | ((pcm(o + 1) & 0xff) << 8) |
        (pcm(o) & 0xff)
      (u << 8) >> 8
    }
    assert(Seq(s24(0), s24(3), s24(6), s24(9)) ==
      Seq(100000, 0, -100000, -100000))
  }

  test("float32 WAV: decode + features in the scaled 16-bit domain") {
    val wav = Audio.wavBytesFloat(Array(0.5f, -0.25f, 0.25f), 8000)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, wav))
    val m = Audio.audioMeta(spark, df, "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getInt(4) == 32 && m.getLong(5) == 3L
      && m.isNullAt(7), "IEEE-float WAV must decode, not dead-letter")
    val f = Audio.audioFeatures(spark, df, "doc_id", "payload").head()
    // scaled by 2^15: (16384, -8192, 8192) — all exact in double;
    // sumSq = 402653184, /3 = 134217728 exactly; signs +,-,+ → 2 crossings
    assert(f.getInt(2) == 16384 && f.getLong(3) == 2L && f.isNullAt(4))
    assert(f.getDouble(1) == math.sqrt(134217728.0))
    // float resample has no exact integer form — documented dead-letter
    val r = Audio.resample(spark, df, "doc_id", "payload", toRate = 4000).head()
    assert(r.getString(2).contains("integer PCM"))
  }

  test("32-bit int PCM: decode, features, exact resample") {
    def le32(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)).toArray
    // samples beyond the 24-bit range — only 32-bit carries them
    val wav = Audio.wavBytesRaw(le32(100000000, -100000000), 4000, channels = 1, bits = 32)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, wav))
    val m = Audio.audioMeta(spark, df, "doc_id", "payload").head()
    assert(m.getInt(2) == 4000 && m.getInt(4) == 32 && m.getLong(5) == 2L
      && m.isNullAt(7), "32-bit int WAV must decode, not dead-letter")
    val f = Audio.audioFeatures(spark, df, "doc_id", "payload").head()
    // sumSq = 2·1e16 over 2 frames → rms = 1e8 exactly; one sign change
    assert(f.getInt(2) == 100000000 && f.getLong(3) == 1L && f.isNullAt(4))
    assert(math.abs(f.getDouble(1) - 1e8) < 1e-6)
    // 4 kHz → 8 kHz: [1e8, midpoint 0, -1e8, clamp -1e8] — exact integers
    val out = Audio.resample(spark, df, "doc_id", "payload", toRate = 8000).head()
    assert(out.isNullAt(2), "32-bit int must not dead-letter in resample")
    val bytes = out.getAs[Array[Byte]](1)
    val pcm = java.util.Arrays.copyOfRange(bytes, bytes.length - 16, bytes.length)
    def s32(o: Int) =
      ((pcm(o + 3) & 0xff) << 24) | ((pcm(o + 2) & 0xff) << 16) |
        ((pcm(o + 1) & 0xff) << 8) | (pcm(o) & 0xff)
    assert(Seq(s32(0), s32(4), s32(8), s32(12)) ==
      Seq(100000000, 0, -100000000, -100000000))
  }

  test("WAVE_FORMAT_EXTENSIBLE: int PCM and float decode; junk inner tags dead-letter") {
    // 16-bit PCM inside the extensible container — the exact payload the
    // stock JVM reader rejects; the fallback parser must yield the same
    // metadata a basic 16-bit WAV would
    def le16(vs: Short*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val ext16 = Audio.wavBytesExtensible(
      le16(0, 1000, -1000, 1000), sampleRate = 8000, channels = 1, bits = 16)
    val df16 = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, ext16))
    val m = Audio.audioMeta(spark, df16, "doc_id", "payload").head()
    assert(m.getInt(2) == 8000 && m.getInt(3) == 1 && m.getInt(4) == 16
      && m.getLong(5) == 4L && m.isNullAt(7),
      "extensible 16-bit PCM must decode, not dead-letter")
    // identical features to the basic-container fixture with the same PCM
    val f = Audio.audioFeatures(spark, df16, "doc_id", "payload").head()
    assert(f.getInt(2) == 1000 && f.getLong(3) == 2L && f.isNullAt(4))
    assert(math.abs(f.getDouble(1) - math.sqrt(750000.0)) < 1e-9)
    // resample treats it like any 16-bit int PCM
    val out = Audio.resample(spark, df16, "doc_id", "payload", toRate = 4000).head()
    assert(out.isNullAt(2), "extensible PCM must resample")
    // extensible stereo 32-bit int also decodes
    def le32(vs: Int*): Array[Byte] =
      vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)).toArray
    val ext32 = Audio.wavBytesExtensible(
      le32(1, 2, 3, 4), sampleRate = 4000, channels = 2, bits = 32)
    val m32 = Audio.audioMeta(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType), Row(2L, ext32)),
      "doc_id", "payload").head()
    assert(m32.getInt(3) == 2 && m32.getInt(4) == 32 && m32.getLong(5) == 2L
      && m32.isNullAt(7))
    // extensible float routes to the float feature path
    val floats = Array(0.5f, -0.25f, 0.25f)
    val fdata = new Array[Byte](12)
    floats.zipWithIndex.foreach { case (x, i) =>
      val b = java.lang.Float.floatToIntBits(x)
      fdata(4 * i) = (b & 0xff).toByte
      fdata(4 * i + 1) = ((b >> 8) & 0xff).toByte
      fdata(4 * i + 2) = ((b >> 16) & 0xff).toByte
      fdata(4 * i + 3) = ((b >> 24) & 0xff).toByte
    }
    val extF = Audio.wavBytesExtensible(fdata, 8000, channels = 1, bits = 32,
      innerTag = 3)
    val ff = Audio.audioFeatures(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType), Row(3L, extF)),
      "doc_id", "payload").head()
    assert(ff.getInt(2) == 16384 && ff.getLong(3) == 2L && ff.isNullAt(4))
    // an extensible WAV with an unknown inner GUID tag stays a dead-letter
    val alaw = ext16.clone()
    // fmt chunk starts at byte 20; GUID Data1 sits at fmt+24 → byte 44
    alaw(44) = 6 // WAVE_FORMAT_ALAW
    val junk = Audio.audioMeta(spark,
      frame(struct("doc_id" -> LongType, "payload" -> BinaryType), Row(4L, alaw)),
      "doc_id", "payload").head()
    assert(!junk.isNullAt(7), "unknown inner codec must dead-letter")
  }

  test("audio features match the hand computation on a fixture WAV") {
    val fixture = Audio.wavBytes(Array[Short](0, 1000, -1000, 1000), sampleRate = 8000)
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType),
      Row(1L, fixture))
    val r = Audio.audioFeatures(spark, df, "doc_id", "payload").head()
    // signs: +,+,-,+ → 2 crossings; sumSq = 3e6 over 4 frames → rms = √750000
    assert(r.getLong(3) == 2L)
    assert(r.getInt(2) == 1000)
    assert(math.abs(r.getDouble(1) - math.sqrt(750000.0)) < 1e-9)
    assert(r.isNullAt(4))
    // features on a synthesized corpus are deterministic across reruns
    val wav = Audio.synthesizeWav(
      spark, docs((1L to 20L).map(i => i -> s"doc $i"): _*), "doc_id", "text", "payload")
    def run() = Audio.audioFeatures(spark, wav, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSet
    assert(run() == run())
  }
}
