package graft.expr

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * REAL audio decoding for the multimodal column path — the JDK's
 * `javax.sound.sampled` (WAV/AIFF/AU readers and the PCM conversion
 * pipeline ship with the JRE, no external dependency), replacing the
 * byte-histogram stand-in for payloads that actually are audio
 * ([[graft.multimodal.Multimodal]] keeps the histogram for
 * modality-agnostic bytes; compressed codecs — MP3/AAC/Opus — have no JRE
 * decoder and stay on that path).
 *
 * Scale shape mirrors [[ImageOps]]: decode is pure map-side CPU per row —
 * the binary payload never rides a shuffle (these expressions reduce it to
 * a small struct or a W-float envelope in the same projection as the
 * scan). Repartition BEFORE the projection if the source collapses to few
 * splits so decoding parallelizes.
 *
 * Determinism: the PCM path is exact — WAV/AIFF/AU containers carry raw
 * integer samples, and the JDK's width/encoding conversions (8→16 bit
 * shift, µ-law/a-law table lookup) are fixed integer maps. The envelope
 * kernels are integer sums plus one correctly-rounded IEEE division, so
 * their values replay bit-identically cross-engine (the same contract as
 * the TF-IDF embedding kernels). Undecodable or null payloads yield NULL
 * (never a throw): one corrupt clip in a 100 TB crawl must not kill the
 * stage — filter `IS NULL` downstream to quarantine.
 */
object AudioOps {

  // --- Provider plumbing: NOT AudioSystem. Every AudioSystem entry point
  // (getAudioInputStream / getAudioFileFormat) re-resolves its provider
  // list through a globally `synchronized` registry AND probes readers in
  // registration order — for a WAV payload that means three readers
  // (AIFF, AU, SoftMidi) throw before WaveFileReader is even tried, and
  // the SoftMidi probe re-enters the synchronized registry per call. Under
  // a 32-thread executor the whole decode family collapses to single-core
  // throughput (measured: 16 threads = 0.8x of 1 thread via AudioSystem;
  // 16.0x with the reader called directly). The fix: resolve the SPI
  // providers ONCE per JVM, sniff the 4-byte container magic, and hand
  // the payload straight to the readers that can parse it — identical
  // first-success semantics, no registry lock, no probe exceptions on the
  // hot path. Unknown magic still tries every reader in provider order,
  // so anything the JRE can read still decodes.

  // Loaded via the thread context classloader like AudioSystem's own
  // registry, so application-classpath SPIs (an MP3/Vorbis decoder jar on
  // the executor classpath) stay visible; parent delegation keeps the JDK
  // readers in the list. Resolved once — executor threads share the
  // application classloader, which is the point of the cache.
  private lazy val readers: IndexedSeq[AudioFileReader] = {
    val it = java.util.ServiceLoader.load(classOf[AudioFileReader]).iterator()
    val b = Vector.newBuilder[AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private lazy val converters: IndexedSeq[FormatConversionProvider] = {
    val it = java.util.ServiceLoader
      .load(classOf[FormatConversionProvider]).iterator()
    val b = Vector.newBuilder[FormatConversionProvider]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Readers that can plausibly parse the payload, by container magic,
    * in provider-registration order (same first-success winner as
    * AudioSystem's try-them-all). Unknown magic → all readers. */
  private def candidateReaders(bytes: Array[Byte]): Seq[AudioFileReader] = {
    def name(r: AudioFileReader) = r.getClass.getSimpleName
    if (bytes.length < 4) return readers
    val magic = ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
    val picked = magic match {
      case 0x52494646 => readers.filter(name(_).startsWith("Wave")) // "RIFF"
      case 0x464f524d => readers.filter(name(_).startsWith("Aiff")) // "FORM"
      case 0x2e736e64 => readers.filter(name(_).startsWith("Au"))   // ".snd"
      case 0x4d546864 => readers.filter(name(_).contains("Midi"))   // "MThd"
      case _ => readers
    }
    // a JRE with differently-named providers must degrade to try-all,
    // never to silently-undecodable
    if (picked.isEmpty) readers else picked
  }

  /** First candidate reader whose probe accepts the payload wins —
    * AudioSystem's first-success semantics without its registry lock. */
  private def firstSuccess[T](bytes: Array[Byte])(probe: AudioFileReader => T): T = {
    val cands = candidateReaders(bytes)
    var i = 0
    while (i < cands.size) {
      try return probe(cands(i))
      catch { case _: UnsupportedAudioFileException => () }
      i += 1
    }
    throw new UnsupportedAudioFileException("no reader accepts the payload")
  }

  /** AudioSystem.getAudioInputStream without the registry lock. */
  private def open(bytes: Array[Byte]): AudioInputStream =
    firstSuccess(bytes)(_.getAudioInputStream(new ByteArrayInputStream(bytes)))

  /** AudioSystem.getAudioFileFormat without the registry lock. */
  private def fileFormat(bytes: Array[Byte]): AudioFileFormat =
    firstSuccess(bytes)(_.getAudioFileFormat(new ByteArrayInputStream(bytes)))

  /** AudioSystem.getAudioInputStream(target, source) without the registry
    * lock: first provider supporting the conversion wins. */
  private def convert(tgt: AudioFormat, in: AudioInputStream): AudioInputStream = {
    var i = 0
    while (i < converters.size) {
      val c = converters(i)
      if (c.isConversionSupported(tgt, in.getFormat))
        return c.getAudioInputStream(tgt, in)
      i += 1
    }
    throw new IllegalArgumentException("unsupported conversion")
  }

  /** Decode to interleaved PCM_SIGNED 16-bit little-endian samples at the
    * source rate/channel-count, or null when the container/encoding is
    * unreadable. The JDK converts 8-bit, big-endian, unsigned, µ-law and
    * a-law sources to 16-bit signed deterministically. */
  private def pcm16(bytes: Array[Byte]): (AudioFormat, Array[Short]) = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val in = open(bytes)
      val src = in.getFormat
      val tgt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      val pcm = if (src.matches(tgt)) in else convert(tgt, in)
      val raw = pcm.readAllBytes()
      val n = raw.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      (tgt, samples)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** (sample_rate, channels, bits, n_frames, container MIME) or null when
    * undecodable. bits/n_frames come from the container header (the
    * source's declared width, before any conversion). */
  def metaRow(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val aff = fileFormat(bytes)
      val f = aff.getFormat
      InternalRow(
        math.round(f.getSampleRate),
        f.getChannels,
        f.getSampleSizeInBits,
        aff.getFrameLength.toLong,
        UTF8String.fromString(mime(aff.getType.getExtension)))
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def mime(ext: String): String = ext match {
    case "wav" => "audio/wav"
    case "aif" | "aiff" => "audio/aiff"
    case "au" | "snd" => "audio/basic"
    case other => s"audio/$other"
  }

  /** Per-window sum of |mono sample| (array<long> of length `windows`) —
    * the integer core of the energy envelope, exact by construction.
    * Frames bin by the grid rule frame i → window i·W/n (integer
    * arithmetic, same scheme as the image grid); channels mix to mono by
    * truncating integer mean BEFORE the abs. Null when undecodable. */
  def envSums(bytes: Array[Byte], windows: Int): ArrayData = {
    val dec = pcm16(bytes)
    if (dec == null) return null
    val (fmt, samples) = dec
    val ch = fmt.getChannels
    val n = samples.length / ch
    val sums = new Array[Long](windows)
    var i = 0
    while (i < n) {
      val w = ((i.toLong * windows) / n).toInt
      var acc = 0
      var c = 0
      while (c < ch) { acc += samples(i * ch + c); c += 1 }
      sums(w) += math.abs(acc / ch).toLong
      i += 1
    }
    new GenericArrayData(sums)
  }

  /** Mean-|amplitude| energy envelope in [0,1]: envSums ÷ (count·32768),
    * one IEEE double division + one float cast per window (both
    * correctly rounded → cross-engine replayable); empty windows → 0.
    * The W-float audio embedding — downstream knn/near-dup/IVF consume it
    * exactly like any other vector. Null when undecodable. */
  def envelope(bytes: Array[Byte], windows: Int): ArrayData = {
    val dec = pcm16(bytes)
    if (dec == null) return null
    val (fmt, samples) = dec
    val ch = fmt.getChannels
    val n = samples.length / ch
    val sums = new Array[Long](windows)
    val counts = new Array[Long](windows)
    var i = 0
    while (i < n) {
      val w = ((i.toLong * windows) / n).toInt
      var acc = 0
      var c = 0
      while (c < ch) { acc += samples(i * ch + c); c += 1 }
      sums(w) += math.abs(acc / ch).toLong
      counts(w) += 1L
      i += 1
    }
    val out = new Array[Float](windows)
    var w = 0
    while (w < windows) {
      if (counts(w) > 0)
        out(w) = (sums(w).toDouble / (counts(w) * 32768.0)).toFloat
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic PCM16LE mono WAV synthesis — the audio fixture
    * generator (no audio files ship in this container): a sawtooth whose
    * period is seeded per row, all-integer samples so any engine can
    * replay the waveform symbolically. period p = 3 + (seed mod 29);
    * sample(i) = (((i mod p)·2048)/p − 1024)·16 ∈ [−16384, 16368]. */
  def synthWav(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    require(nSamples >= 0 && nSamples <= (Int.MaxValue - 44) / 2 && sampleRate > 0,
      s"synth_wav: nSamples=$nSamples sampleRate=$sampleRate out of range")
    val p = 3 + java.lang.Math.floorMod(seed, 29L).toInt
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, sampleRate); le32(28, sampleRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < nSamples) {
      le16(44 + 2 * i, (((i % p) * 2048) / p - 1024) * 16)
      i += 1
    }
    out
  }
}

/** audio_meta(binary) -> struct(sample_rate int, channels int, bits int,
  * n_frames long, format string), NULL for undecodable payloads. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def prettyName: String = "audio_meta"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    AudioOps.metaRow(v.asInstanceOf[Array[Byte]])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.AudioOps.metaRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** audio_env_sums(binary, windows) -> array<long> per-window |sample|
  * sums — the exact-integer envelope core (oracle-checkable); NULL for
  * undecodable payloads. */
case class AudioEnvSums(child: Expression, windows: Int)
    extends UnaryExpression {
  require(windows >= 1 && windows <= 4096,
    s"windows must be in [1,4096], got $windows")
  override def prettyName: String = "audio_env_sums"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_env_sums expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    AudioOps.envSums(v.asInstanceOf[Array[Byte]], windows)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.AudioOps.envSums($c, $windows);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** audio_envelope(binary, windows) -> array<float> mean-|amplitude|
  * energy envelope in [0,1]; NULL for undecodable payloads. */
case class AudioEnvelope(child: Expression, windows: Int)
    extends UnaryExpression {
  require(windows >= 1 && windows <= 4096,
    s"windows must be in [1,4096], got $windows")
  override def prettyName: String = "audio_envelope"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_envelope expects binary, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    AudioOps.envelope(v.asInstanceOf[Array[Byte]], windows)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.AudioOps.envelope($c, $windows);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** synth_wav(seed long, n_samples int, sample_rate int) -> binary —
  * deterministic PCM16 mono WAV (see [[AudioOps.synthWav]]). Fixture
  * synthesis / pipeline smoke-test utility; null if any input is null. */
case class SynthWav(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "synth_wav"
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType | IntegerType, IntegerType | LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"synth_wav expects (long, int, int), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  private def toL(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
  }
  override def nullSafeEval(s: Any, n: Any, r: Any): Any =
    AudioOps.synthWav(toL(s), toL(n).toInt, toL(r).toInt)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n, r) => s"""
      ${ev.value} = graft.expr.AudioOps.synthWav((long) $s, (int) $n, (int) $r);""")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
