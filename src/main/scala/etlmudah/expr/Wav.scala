package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 16-bit-PCM WAV SAMPLE kernels — the audio twin of the BMP pixel
  * family ([[BmpPixelStatsFn]]): uncompressed PCM samples are pure
  * byte arithmetic, so the sample statistics every audio-curation
  * pipeline computes (clipping peak, DC offset, RMS energy, silence)
  * decode for real with no codec library. Header fields follow the
  * `audioMeta` chunk-walk contract (fmt /data in any order, pad
  * bytes, hostile declared sizes terminate the walk); anything not
  * exactly decodable — PCM fmt != 1, bits != 16, truncated or odd
  * data, sample count past `maxSamples` — yields null, never a
  * partial statistic. */
object WavSampleStatsFn {

  /** Output schema: format fields + pooled (all channels) sample
    * statistics. Sums are exact BIGINTs (|s| <= 32768, sumsq per
    * sample <= 2^30 — thousands of samples stay far inside long);
    * mean/rms are the 6dp HALF_UP rounds of the same double division
    * both engines compute. */
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate_hz", LongType),
    StructField("n_samples", LongType),
    StructField("peak", IntegerType),
    StructField("s_min", IntegerType), StructField("s_max", IntegerType),
    StructField("s_sum", LongType), StructField("s_mean", DoubleType),
    StructField("sq_sum", LongType), StructField("rms", DoubleType)))

  /** Shared accept/parse gate for [[stats]] and [[features]]:
    * (dataOff, nSamples, channels, rate) when the blob is an exactly
    * decodable 16-bit PCM WAV within `maxSamples`, else null — the
    * one place the accept contract lives. */
  private def parsePcm16(bytes: Array[Byte],
                         maxSamples: Int): Array[Long] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    if (bytes.length < 12 ||
      u8(0) != 'R' || u8(1) != 'I' || u8(2) != 'F' || u8(3) != 'F' ||
      u8(8) != 'W' || u8(9) != 'A' || u8(10) != 'V' || u8(11) != 'E')
      return null
    // chunk walk (long offsets: a hostile uint32-max size must step
    // past the blob, not wrap an int)
    var off = 12L
    var fmtCode = -1; var ch = -1; var bits = -1
    var rate = -1L; var dataOff = -1L; var dataLen = -1L
    var steps = 0
    while (steps < 32 && off + 8 <= bytes.length &&
      (fmtCode < 0 || dataOff < 0)) {
      val o = off.toInt
      val id = new String(bytes, o, 4, "ISO-8859-1")
      val size = le32(o + 4)
      if (id == "fmt " && off + 24 <= bytes.length) {
        fmtCode = le16(o + 8)
        ch = le16(o + 10)
        rate = le32(o + 12)
        bits = le16(o + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = size
      }
      off = off + 8 + size + (size % 2)
      steps += 1
    }
    if (fmtCode != 1 || bits != 16 || ch < 1 || dataOff < 0 ||
      dataLen < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    if (n == 0 || n > maxSamples) return null
    if (dataOff + dataLen > bytes.length) return null
    Array(dataOff, n, ch.toLong, rate)
  }

  def stats(bytes: Array[Byte], maxSamples: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val parsed = parsePcm16(bytes, maxSamples)
    if (parsed == null) return null
    val Array(dataOff, n, chL, rate) = parsed
    val ch = chL.toInt
    var sMin = 32767; var sMax = -32768; var peak = 0
    var sum = 0L; var sq = 0L
    var i = 0
    val base = dataOff.toInt
    while (i < n) {
      val v = (le16(base + i * 2) << 16) >> 16 // sign-extend
      if (v < sMin) sMin = v
      if (v > sMax) sMax = v
      val a = math.abs(v)
      if (a > peak) peak = a
      sum += v
      sq += v.toLong * v
      i += 1
    }
    val nd = n.toDouble
    new GenericInternalRow(Array[Any](
      ch, rate, n, peak, sMin, sMax,
      sum, BmpPixelStatsFn.round6(sum / nd),
      sq, BmpPixelStatsFn.round6(math.sqrt(sq / nd))))
  }

  /** Sample-level FEATURES beyond the moments — the VAD/trim
    * preprocessing pair every audio-curation pipeline runs before
    * anything expensive: zero-crossing count (s_{i−1}·s_i < 0, the
    * classic spectral-content proxy) and silence segmentation at
    * |s| <= thresh (total silent samples plus maximal-run statistics —
    * the trim/split decision inputs). Computed over the flat
    * INTERLEAVED stream: exact for mono (the q265 fixture), a
    * documented approximation for multi-channel (the per-channel
    * variant is a deinterleave away). Null exactly when [[stats]] is
    * null. */
  val featureSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("n_zero_cross", LongType),
    StructField("n_silent", LongType),
    StructField("n_silence_runs", LongType),
    StructField("max_silence_run", LongType)))

  def features(bytes: Array[Byte], maxSamples: Int,
               thresh: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val parsed = parsePcm16(bytes, maxSamples)
    if (parsed == null) return null
    val Array(dataOff, n, _, _) = parsed
    val base = dataOff.toInt
    var zc = 0L; var silent = 0L; var runs = 0L; var maxRun = 0L
    var curRun = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val v = (le16(base + i * 2) << 16) >> 16
      if (i > 0 && prev.toLong * v < 0) zc += 1
      if (math.abs(v) <= thresh) {
        silent += 1
        curRun += 1
        if (curRun == 1) runs += 1
        if (curRun > maxRun) maxRun = curRun
      } else curRun = 0
      prev = v
      i += 1
    }
    new GenericInternalRow(Array[Any](n, zc, silent, runs, maxRun))
  }

  /** Synthesize a COMPLETE 16-bit PCM WAV — canonical 44-byte header
    * plus `frames * channels` interleaved samples whose value at flat
    * index i is
    *
    *   s(i) = floorMod(seed*31 + i*17, 65536) - 32768
    *
    * floorMod (not Scala %, whose remainder is negative for negative
    * seeds) keeps s(i) in [-32768, 32767] — and therefore equal to the
    * 16-bit value actually stored — for EVERY seed, matching what a
    * SQL `%` on non-negative operands replays.
    * Closed-form in (seed, i), so the q230 oracle replays the exact
    * statistics from a generate-series — the fakeBmp24 discipline for
    * audio payloads. */
  def synth(seed: Long, channels: Long, rate: Long,
            frames: Long): Array[Byte] = {
    require(channels >= 1 && frames >= 1 &&
      channels * frames <= (1 << 20),
      s"fake WAV shape out of range: ${channels}ch x $frames")
    val n = (channels * frames).toInt
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte
      out(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xFF).toByte
      out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte
      out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    def putAscii(i: Int, s: String): Unit =
      s.getBytes("ISO-8859-1").copyToArray(out, i)
    putAscii(0, "RIFF"); putLe32(4, 36L + dataLen)
    putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16L)
    putLe16(20, 1)                       // PCM
    putLe16(22, channels.toInt)
    putLe32(24, rate)
    putLe32(28, rate * channels * 2)     // byte rate
    putLe16(32, (channels * 2).toInt)    // block align
    putLe16(34, 16)                      // bits
    putAscii(36, "data"); putLe32(40, dataLen.toLong)
    var i = 0
    while (i < n) {
      val v = (Math.floorMod(seed * 31 + i * 17, 65536L) - 32768).toInt
      putLe16(44 + i * 2, v & 0xFFFF)
      i += 1
    }
    out
  }
}

/** Native Catalyst expression `graft_wav_stats(binary[, maxSamples])`
  * — see [[WavSampleStatsFn]]. */
case class WavSampleStats(child: Expression, maxSamples: Int = 65536)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = WavSampleStatsFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_stats"

  override def nullSafeEval(input: Any): Any =
    WavSampleStatsFn.stats(input.asInstanceOf[Array[Byte]], maxSamples)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.WavSampleStatsFn.stats($c, $maxSamples);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): WavSampleStats = copy(child = newChild)
}

/** Native expression `graft_wav_features(binary, thresh[, maxSamples])`
  * — see [[WavSampleStatsFn.features]]. */
case class WavFeatures(child: Expression, thresh: Int,
                       maxSamples: Int = 65536)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (thresh < 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_wav_features thresh must be >= 0, got $thresh")
    else if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wav_features expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = WavSampleStatsFn.featureSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_features"

  override def nullSafeEval(input: Any): Any =
    WavSampleStatsFn.features(input.asInstanceOf[Array[Byte]],
      maxSamples, thresh)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.WavSampleStatsFn.features($c, $maxSamples, $thresh);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): WavFeatures = copy(child = newChild)
}

/** Native fixture generator
  * `graft_fake_wav16(seed, channels, rate, frames)` — see
  * [[WavSampleStatsFn.synth]]. */
case class FakeWav16(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c =>
      c.dataType == LongType || c.dataType == IntegerType ||
        c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_wav16 expects (bigint, bigint, bigint, bigint)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_fake_wav16"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, c: Any, r: Any, f: Any): Any =
    WavSampleStatsFn.synth(asLong(s), asLong(c), asLong(r), asLong(f))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c, r, f) =>
      s"${ev.value} = etlmudah.expr.WavSampleStatsFn.synth((long)$s, " +
        s"(long)$c, (long)$r, (long)$f);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeWav16 = FakeWav16(f, s, t, q)
}
