package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.AudioOps
import graft.search.Knn

/** Real audio decode (graft.expr.AudioOps via JDK javax.sound): WAV
  * fixtures are ENCODED in-test (both by the synth kernel and by the JDK's
  * own writer from known samples), decoded by the expressions, and checked
  * against the exact integer sample math — no external audio files, fully
  * deterministic (PCM is lossless). */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** PCM16LE WAV through the JDK's OWN writer (independent of the synth
    * kernel's hand-rolled header) with the given interleaved samples. */
  private def jdkWav(samples: Array[Short], sampleRate: Float,
      channels: Int): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, channels, channels * 2, sampleRate, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = s.toByte; raw(2 * i + 1) = (s >> 8).toByte
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio_meta decodes rate/channels/bits/frames and sniffs the container") {
    val rows = Seq(
      (1L, jdkWav(Array[Short](100, -100, 3000, 7), 8000f, 1)),
      (2L, jdkWav(Array[Short](1, 2, 3, 4, 5, 6), 44100f, 2)),
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val m = rows.select($"id", Multimodal.audioMeta($"media").as("meta"))
      .orderBy($"id").collect()
    val mono = m(0).getStruct(1)
    assert(mono.getInt(0) == 8000 && mono.getInt(1) == 1 && mono.getInt(2) == 16)
    assert(mono.getLong(3) == 4L && mono.getString(4) == "audio/wav")
    val stereo = m(1).getStruct(1)
    assert(stereo.getInt(0) == 44100 && stereo.getInt(1) == 2)
    assert(stereo.getLong(3) == 3L, "stereo frame count is per frame, not per sample")
    assert(m(2).isNullAt(1), "garbage bytes must decode to NULL, not throw")
    assert(m(3).isNullAt(1), "null payload stays NULL")
  }

  test("AIFF and AU containers route through the magic dispatch") {
    // The decode path dispatches readers on the 4-byte container magic
    // (FORM / .snd) instead of AudioSystem's probe-every-reader loop —
    // these containers prove the non-RIFF branches, and their big-endian
    // samples exercise the cached-provider PCM conversion too.
    def enc(t: AudioFileFormat.Type): Array[Byte] = {
      val samples = Array[Short](100, -100, 3000, 7)
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f,
        16, 1, 2, 8000f, true) // big-endian: AIFF's native byte order
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s >> 8).toByte; raw(2 * i + 1) = s.toByte
      }
      val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt,
        samples.length)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, t, out)
      out.toByteArray
    }
    val rows = Seq(
      (1L, enc(AudioFileFormat.Type.AIFF)),
      (2L, enc(AudioFileFormat.Type.AU))).toDF("id", "media")
    val m = rows.select($"id", Multimodal.audioMeta($"media").as("meta"),
        graft.functions.audio_env_sums($"media", 1).as("sums"))
      .orderBy($"id").collect()
    val aiff = m(0).getStruct(1)
    assert(aiff.getInt(0) == 8000 && aiff.getInt(1) == 1 &&
      aiff.getLong(3) == 4L && aiff.getString(4) == "audio/aiff")
    val au = m(1).getStruct(1)
    assert(au.getInt(0) == 8000 && au.getString(4) == "audio/basic")
    // 100+100+3000+7 regardless of container byte order
    m.foreach(r => assert(r.getSeq[Long](2) == Seq(3207L),
      s"big-endian samples must convert exactly, got ${r.getSeq[Long](2)}"))
  }

  test("audio_env_sums: exact integer window sums on known samples") {
    // 8 mono samples, 2 windows -> [|1|+|-2|+|3|+|-4|, |10|+|-20|+|30|+|-40|]
    val rows = Seq((1L,
      jdkWav(Array[Short](1, -2, 3, -4, 10, -20, 30, -40), 8000f, 1)))
      .toDF("id", "media")
    val sums = rows.select(graft.functions.audio_env_sums($"media", 2))
      .head().getSeq[Long](0)
    assert(sums == Seq(10L, 100L))
  }

  test("stereo mixes to truncated-mean mono before the abs") {
    // frames (L,R): (10,20)->15, (-10,-21)->-15 (Java int div truncates
    // toward zero: -31/2 = -15), (0,1)->0, (32767,32767)->32767
    val rows = Seq((1L, jdkWav(
      Array[Short](10, 20, -10, -21, 0, 1, 32767, 32767), 8000f, 2)))
      .toDF("id", "media")
    val sums = rows.select(graft.functions.audio_env_sums($"media", 1))
      .head().getSeq[Long](0)
    assert(sums == Seq(15L + 15L + 0L + 32767L))
  }

  test("audio_envelope: one division per window, empty windows are 0") {
    val rows = Seq((1L,
      jdkWav(Array[Short](16384, -16384, 0, 0), 8000f, 1)))
      .toDF("id", "media")
    val env = rows.select(graft.functions.audio_envelope($"media", 4))
      .head().getSeq[Float](0)
    assert(env == Seq(0.5f, 0.5f, 0f, 0f))
    // 8 windows over 4 frames: frame i -> window 2i, odd windows empty
    val env8 = rows.select(graft.functions.audio_envelope($"media", 8))
      .head().getSeq[Float](0)
    assert(env8 == Seq(0.5f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f))
  }

  test("synth kernel round-trips through the real decoder bit-exactly") {
    // The hand-rolled WAV header + formula samples, decoded by javax.sound,
    // must equal the formula evaluated directly.
    val seed = 7L
    val n = 100
    val p = 3 + (seed % 29).toInt
    val expect = (0 until n).map(i => (((i % p) * 2048) / p - 1024) * 16)
    val rows = Seq((seed, n, 8000)).toDF("seed", "n", "sr")
      .select(graft.functions.synth_wav($"seed", $"n", $"sr").as("media"))
    val meta = rows.select(Multimodal.audioMeta($"media")).head().getStruct(0)
    assert(meta.getInt(0) == 8000 && meta.getInt(1) == 1 && meta.getLong(3) == n.toLong)
    val sums = rows.select(graft.functions.audio_env_sums($"media", 1))
      .head().getSeq[Long](0)
    assert(sums.head == expect.map(v => math.abs(v).toLong).sum)
    // and the raw synth bytes parse back sample-exact via the local kernel
    val bytes = AudioOps.synthWav(seed, n, 8000)
    val decoded = (0 until n).map { i =>
      ((bytes(44 + 2 * i) & 0xff) | (bytes(45 + 2 * i) << 8)).toShort.toInt
    }
    assert(decoded == expect)
  }

  test("8-bit PCM converts deterministically (JDK width conversion)") {
    // 8-bit unsigned WAV via the JDK writer; decode path converts to
    // 16-bit signed by (u8-128)<<8 — pin two known values.
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val raw = Array[Byte](128.toByte, 255.toByte, 0.toByte, 192.toByte)
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, 4)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray
    // Reference conversion: ask the JDK itself (the conversion law is a
    // fixed integer map, but ITS choice — pin expression ≡ JDK, twice for
    // determinism, rather than hardcoding the law).
    def jdkSum(): Long = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val tgt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
      val pcm = AudioSystem.getAudioInputStream(tgt, in)
      val b = pcm.readAllBytes()
      (0 until b.length / 2).map { i =>
        math.abs(((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt).toLong
      }.sum
    }
    val expect = jdkSum()
    assert(expect == jdkSum(), "JDK width conversion must be deterministic")
    val rows = Seq((1L, wav)).toDF("id", "media")
    val sums = rows.select(graft.functions.audio_env_sums($"media", 1))
      .head().getSeq[Long](0)
    assert(sums == Seq(expect))
    val meta = rows.select(Multimodal.audioMeta($"media")).head().getStruct(0)
    assert(meta.getInt(2) == 8, "meta reports the container's declared width")
  }

  test("end-to-end: synth corpus -> real decode envelope -> knn pairs by period") {
    // Same seed mod 29 -> same waveform -> identical envelopes.
    val media = Seq(1L, 30L, 2L, 31L, 5L).toDF("doc_id")
      .select($"doc_id", graft.functions.synth_wav($"doc_id", lit(400), lit(8000)).as("media"))
    val feats = Multimodal.extractAudioFeatures(media, "media", "feat", windows = 8)
      .select($"doc_id", $"feat")
    val nn = Knn.knnJoin(feats, "doc_id", "feat", feats, "doc_id", "feat",
        k = 1, roundScoreTo = Some(6))
      .select($"query_id", $"doc_id".as("nn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nn(1L) == 30L && nn(30L) == 1L, "period-3 clips pair up")
    assert(nn(2L) == 31L && nn(31L) == 2L, "period-4 clips pair up")
  }

  test("SQL registration: audio functions callable from SQL") {
    graft.functions.registerAll(spark)
    spark.sql("SELECT synth_wav(CAST(3 AS BIGINT), 50, 8000) AS media")
      .createOrReplaceTempView("clips")
    val r = spark.sql(
      """SELECT audio_meta(media).sample_rate AS sr,
        |       size(audio_env_sums(media, 4)) AS ns,
        |       size(audio_envelope(media, 4)) AS ne FROM clips""".stripMargin)
      .head()
    assert(r.getInt(0) == 8000 && r.getInt(1) == 4 && r.getInt(2) == 4)
  }
}
