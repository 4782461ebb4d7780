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

  test("synthesized WAV decodes to the contract dimensions") {
    // n=7 → 160 + 7·40 = 440 samples @8 kHz → 55 ms exactly
    val wav = Audio.synthesizeWav(spark, docs(1L -> ("x" * 7)), "doc_id", "text", "payload")
    val m = Audio.audioMeta(spark, wav, "doc_id", "payload").head()
    assert(m.sample_rate.contains(8000) && m.channels.contains(1)
      && m.bits.contains(16) && m.n_samples.contains(440L)
      && m.duration_ms.contains(55L) && m.error.isEmpty)
  }

  test("non-audio payloads dead-letter; string ids rejected loudly") {
    val junk = Audio.audioMeta(spark,
      Multimodal.withBinaryPayload(docs(9L -> "not audio"), "text", "payload"),
      "doc_id", "payload").head()
    assert(junk.error.isDefined && junk.sample_rate.isEmpty)
    val strIds = frame(struct("doc_id" -> StringType, "text" -> StringType),
      Row("u-1", "t"))
    val err = intercept[IllegalArgumentException] {
      Audio.synthesizeWav(spark, strIds, "doc_id", "text", "payload")
    }
    assert(err.getMessage.contains("integral id"))
  }

  test("audio decode dead-letters every junk payload without failing tasks") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 100L).map { i =>
      Row(i, Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte))
    }
    val df = frame(struct("doc_id" -> LongType, "payload" -> BinaryType), rows: _*)
    val metas = Audio.audioMeta(spark, df, "doc_id", "payload").collect()
    assert(metas.length == 100 && metas.forall(_.error.isDefined))
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
    assert(m.sample_rate.contains(8000) && m.n_samples.contains(4L))
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
    assert(hm.n_samples.contains(220L) && hm.duration_ms.contains(55L),
      "440 samples @8 kHz → 220 @4 kHz, still exactly 55 ms")
    // junk dead-letters with the decode reason
    val junk = Audio.resample(spark,
      Multimodal.withBinaryPayload(
        frame(struct("doc_id" -> LongType, "text" -> StringType), Row(9L, "junk")),
        "text", "payload"),
      "doc_id", "payload", toRate = 4000).head()
    assert(!junk.isNullAt(2) && junk.isNullAt(1))
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
