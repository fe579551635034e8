package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL FLAC sample decode — the audio twin of the PNG-beside-BMP
  * story: WAV is the raw family, FLAC the LOSSLESS compressed one, and
  * because FLAC is integer-exact by design the decoded samples equal
  * the raw ones bit for bit — so the whole WAV kernel family (stats,
  * VAD features, the q230/q265 closed-form oracles) applies to
  * compressed audio through a REAL entropy decoder. The decoder
  * implements the published FLAC format: "fLaC" magic, STREAMINFO
  * (20-bit rate / 3-bit channels / 5-bit bps / 36-bit total-sample
  * bit fields), frame headers with CRC-8, UTF-8-style coded frame
  * numbers, CONSTANT / VERBATIM / FIXED(0–4) subframes with
  * Rice-coded residuals (4- and 5-bit parameter methods, partition
  * orders, zigzag), fixed-predictor reconstruction, and the CRC-16
  * frame footer.
  *
  * Stereo decorrelation is REAL: left/side, right/side and mid/side
  * channel assignments decode (the side channel carries bps+1 bits
  * per the spec; mid/side reconstructs via m' = (m<<1)|(s&1),
  * L = (m'+s)>>1, R = (m'−s)>>1), and synth cycles all four
  * assignments so every reconstruction path is on the oracle
  * surface.
  *
  * Scope gates (anything else nulls whole, never a partial
  * statistic): 16-bit samples, fixed blocking strategy,
  * frame sample-rate code 0 (from STREAMINFO), no wasted bits, no
  * LPC subframes, no Rice escape codes; both CRCs verified; the
  * stream must carry exactly STREAMINFO's total samples and end at
  * EOF. `maxSamples` gates total×channels BEFORE any allocation
  * (each factor individually first — the Png/Avi overflow lesson).
  *
  * Synth emits the SAME closed-form samples as
  * [[WavSampleStatsFn.synth]] (s(i) = floorMod(seed·31 + i·17, 65536)
  * − 32768 at flat interleaved index i), Rice-compressed for real
  * through FIXED orders 0–2 with periodic VERBATIM frames — so
  * `stats(synthFlac(...))` must equal `stats(synthWav(...))`, the
  * q230 oracle lands VERBATIM, and [[toWav16]] reproduces
  * `WavSampleStatsFn.synth`'s output byte for byte. */
object FlacFn {

  private final class Bail extends Exception
    with scala.util.control.NoStackTrace
  private val bail = new Bail

  /** Decoded audio: channels, rate, interleaved 16-bit samples. */
  private[expr] final class Decoded(val channels: Int, val rate: Long,
                                    val samples: Array[Int])

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= bytes(i) & 0xFF
      var b = 0
      while (b < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
        b += 1
      }
      i += 1
    }
    c
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (bytes(i) & 0xFF) << 8
      var b = 0
      while (b < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
        b += 1
      }
      i += 1
    }
    c
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= bytes.length) throw bail
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def unary(): Int = {
      var q = 0
      while (true) {
        if (pos >= bytes.length || q > (1 << 20)) throw bail
        val b = (bytes(pos) >> (7 - bit)) & 1
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        if (b == 1) return q
        q += 1
      }
      q
    }
    def align(): Unit = if (bit != 0) {
      // padding bits must be zero (strict)
      while (bit != 0) {
        if (((bytes(pos) >> (7 - bit)) & 1) != 0) throw bail
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
      }
    }
  }

  /** Full accept gate + decode; null unless EXACTLY decodable. */
  private[expr] def decode(bytes: Array[Byte],
                           maxSamples: Int): Decoded = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    try {
      if (bytes.length < 42 || u8(0) != 'f' || u8(1) != 'L' ||
        u8(2) != 'a' || u8(3) != 'C') return null
      // metadata blocks; STREAMINFO must come first
      var pos = 4
      var last = false
      var rate = -1L; var ch = -1; var bps = -1; var total = -1L
      var first = true
      while (!last) {
        if (pos + 4 > bytes.length) return null
        val hdr = u8(pos)
        last = (hdr & 0x80) != 0
        val typ = hdr & 0x7F
        val blen = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
        if (pos + 4 + blen > bytes.length) return null
        if (first && (typ != 0 || blen != 34)) return null
        if (typ == 0) {
          val d = pos + 4
          rate = (u8(d + 10).toLong << 12) | (u8(d + 11) << 4) |
            (u8(d + 12) >> 4)
          ch = ((u8(d + 12) >> 1) & 7) + 1
          bps = (((u8(d + 12) & 1) << 4) | (u8(d + 13) >> 4)) + 1
          total = ((u8(d + 13) & 0xF).toLong << 32) |
            (u8(d + 14).toLong << 24) | (u8(d + 15).toLong << 16) |
            (u8(d + 16) << 8) | u8(d + 17)
        }
        first = false
        pos += 4 + blen
      }
      if (rate < 1 || bps != 16 || ch < 1 || ch > 8 || total < 1)
        return null
      // gate each factor BEFORE the multiply
      if (total > maxSamples || ch > maxSamples ||
        total * ch > maxSamples) return null
      val n = (total * ch).toInt
      val out = new Array[Int](n)
      var base = 0L // per-channel sample position
      var frameIdx = 0L
      while (base < total) {
        val frameStart = pos
        if (pos + 5 > bytes.length) return null
        // header: sync 11111111 111110, reserved 0, strategy 0 (fixed)
        if (u8(pos) != 0xFF || (u8(pos + 1) & 0xFE) != 0xF8) return null
        if ((u8(pos + 1) & 1) != 0) return null // variable strategy
        val bsCode = u8(pos + 2) >> 4
        val srCode = u8(pos + 2) & 0xF
        val chAsgn = u8(pos + 3) >> 4
        val ssCode = (u8(pos + 3) >> 1) & 7
        if ((u8(pos + 3) & 1) != 0) return null
        if (srCode != 0) return null            // STREAMINFO rate only
        // channel assignment: independent (0..7) or, for stereo, the
        // decorrelated pairs 8 = left/side, 9 = right/side,
        // 10 = mid/side (side channel carries bps+1 bits)
        val decor = chAsgn >= 8 && chAsgn <= 10
        if (decor && ch != 2) return null
        if (!decor && chAsgn != ch - 1) return null
        if (ssCode != 0 && ssCode != 4) return null // 16-bit
        pos += 4
        // UTF-8-style coded frame number
        var num = 0L
        val f0 = u8(pos); pos += 1
        if ((f0 & 0x80) == 0) num = f0
        else {
          var cont = 0
          var mask = 0x40
          while ((f0 & mask) != 0) { cont += 1; mask >>= 1 }
          if (cont < 1 || cont > 6) return null
          num = f0 & (mask - 1)
          var i = 0
          while (i < cont) {
            if (pos >= bytes.length || (u8(pos) & 0xC0) != 0x80)
              return null
            num = (num << 6) | (u8(pos) & 0x3F)
            pos += 1
            i += 1
          }
        }
        if (num != frameIdx) return null
        val blockSize = bsCode match {
          case 0 => return null
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 =>
            if (pos >= bytes.length) return null
            val v = u8(pos) + 1; pos += 1; v
          case 7 =>
            if (pos + 2 > bytes.length) return null
            val v = (u8(pos) << 8 | u8(pos + 1)) + 1; pos += 2; v
          case c => 256 << (c - 8)
        }
        if (base + blockSize > total) return null
        if (pos >= bytes.length ||
          crc8(bytes, frameStart, pos) != u8(pos)) return null
        pos += 1
        // subframes
        val br = new BitReader(bytes, pos)
        val chBuf = Array.ofDim[Int](ch, blockSize)
        var c = 0
        while (c < ch) {
          // side channels carry one extra bit (the spec's bps+1)
          val sb =
            if (!decor) 16
            else if (chAsgn == 8) (if (c == 0) 16 else 17)
            else if (chAsgn == 9) (if (c == 0) 17 else 16)
            else (if (c == 0) 16 else 17)
          val lo = -(1L << (sb - 1)); val hi = (1L << (sb - 1)) - 1
          if (br.bits(1) != 0) return null
          val typ = br.bits(6)
          if (br.bits(1) != 0) return null // wasted bits unsupported
          val buf = chBuf(c)
          def signed16(): Int = (br.bits(sb) << (32 - sb)) >> (32 - sb)
          if (typ == 0) { // CONSTANT
            val v = signed16()
            java.util.Arrays.fill(buf, v)
          } else if (typ == 1) { // VERBATIM
            var i = 0
            while (i < blockSize) { buf(i) = signed16(); i += 1 }
          } else if (typ >= 8 && typ <= 12) { // FIXED order 0..4
            val order = typ - 8
            if (order > blockSize) return null
            var i = 0
            while (i < order) { buf(i) = signed16(); i += 1 }
            // residuals: rice method + partitions
            val method = br.bits(2)
            if (method > 1) return null
            val pBits = if (method == 0) 4 else 5
            val escape = (1 << pBits) - 1
            val po = br.bits(4)
            val parts = 1 << po
            if (blockSize % parts != 0) return null
            val perPart = blockSize / parts
            if (perPart <= order && parts == 1) return null
            var p = 0
            i = order
            while (p < parts) {
              val param = br.bits(pBits)
              if (param == escape) return null
              val cnt = if (p == 0) perPart - order else perPart
              if (cnt < 0) return null
              var j = 0
              while (j < cnt) {
                val q = br.unary()
                val r = if (param > 0) br.bits(param) else 0
                val u = (q.toLong << param) | r
                val res = ((u >>> 1) ^ -(u & 1L)).toInt
                val s = order match {
                  case 0 => res.toLong
                  case 1 => res + buf(i - 1).toLong
                  case 2 => res + 2L * buf(i - 1) - buf(i - 2)
                  case 3 => res + 3L * buf(i - 1) - 3L * buf(i - 2) +
                    buf(i - 3)
                  case 4 => res + 4L * buf(i - 1) - 6L * buf(i - 2) +
                    4L * buf(i - 3) - buf(i - 4)
                }
                if (s < lo || s > hi) return null
                buf(i) = s.toInt
                i += 1
                j += 1
              }
              p += 1
            }
          } else return null // LPC and reserved types out of scope
          c += 1
        }
        br.align()
        pos = br.pos
        if (pos + 2 > bytes.length ||
          crc16(bytes, frameStart, pos) != ((u8(pos) << 8) | u8(pos + 1)))
          return null
        pos += 2
        // undo stereo decorrelation (integer-exact reconstructions)
        if (decor) {
          var i = 0
          while (i < blockSize) {
            val a = chBuf(0)(i); val b = chBuf(1)(i)
            val (l, r) = chAsgn match {
              case 8 => (a.toLong, a.toLong - b)            // left/side
              case 9 => (b.toLong + a, b.toLong)            // side/right
              case _ =>                                      // mid/side
                val mp = (a.toLong << 1) | (b & 1L)
                ((mp + b) >> 1, (mp - b) >> 1)
            }
            if (l < -32768L || l > 32767L ||
              r < -32768L || r > 32767L) return null
            chBuf(0)(i) = l.toInt; chBuf(1)(i) = r.toInt
            i += 1
          }
        }
        // interleave
        var i = 0
        while (i < blockSize) {
          c = 0
          while (c < ch) {
            out(((base + i) * ch + c).toInt) = chBuf(c)(i)
            c += 1
          }
          i += 1
        }
        base += blockSize
        frameIdx += 1
      }
      if (pos != bytes.length) return null // trailing garbage
      new Decoded(ch, rate, out)
    } catch { case _: Bail => null }
  }

  /** Sample statistics over the decoded stream —
    * [[WavSampleStatsFn.schema]], so the q230 oracle closed form
    * lands verbatim on FLAC inputs. */
  def stats(bytes: Array[Byte], maxSamples: Int): InternalRow = {
    val d = decode(bytes, maxSamples)
    if (d == null) return null
    val n = d.samples.length
    var sMin = 32767; var sMax = -32768; var peak = 0
    var sum = 0L; var sq = 0L
    var i = 0
    while (i < n) {
      val v = d.samples(i)
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
      d.channels, d.rate, n.toLong, peak, sMin, sMax,
      sum, BmpPixelStatsFn.round6(sum / nd),
      sq, BmpPixelStatsFn.round6(math.sqrt(sq / nd))))
  }

  /** VAD features over the decoded stream —
    * [[WavSampleStatsFn.featureSchema]] semantics verbatim. */
  def features(bytes: Array[Byte], maxSamples: Int,
               thresh: Int): InternalRow = {
    val d = decode(bytes, maxSamples)
    if (d == null) return null
    var zc = 0L; var silent = 0L; var runs = 0L; var maxRun = 0L
    var curRun = 0L
    var prev = 0
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i)
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
    new GenericInternalRow(Array[Any](
      d.samples.length.toLong, zc, silent, runs, maxRun))
  }

  /** TRANSCODE to a canonical 44-byte-header 16-bit PCM WAV —
    * composes the whole WAV kernel family onto FLAC inputs; on a
    * [[synth]] stream the output equals `WavSampleStatsFn.synth`'s
    * byte for byte (pinned in FlacSpec). */
  def toWav16(bytes: Array[Byte], maxSamples: Int): Array[Byte] = {
    val d = decode(bytes, maxSamples)
    if (d == null) return null
    val n = d.samples.length
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
    putLe16(20, 1)
    putLe16(22, d.channels)
    putLe32(24, d.rate)
    putLe32(28, d.rate * d.channels * 2)
    putLe16(32, d.channels * 2)
    putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataLen.toLong)
    var i = 0
    while (i < n) {
      putLe16(44 + i * 2, d.samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  // --- synthesis -----------------------------------------------------

  private final class BitWriter(
      out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1L).toInt
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { put(0L, q); put(1L, 1) }
    def alignZero(): Unit = if (cnt > 0) put(0L, 8 - cnt)
  }

  /** Synthesize a COMPLETE FLAC stream carrying the
    * [[WavSampleStatsFn.synth]] closed form: sample at flat
    * interleaved index i is floorMod(seed·31 + i·17, 65536) − 32768.
    * Frames of 192 samples (block size code 1) with a shorter
    * explicit-size final frame; per (frame, channel) the subframe
    * cycles FIXED orders 0/1/2 (real Rice-coded residuals, parameter
    * fit per frame) with every 4th frame VERBATIM — so decode
    * exercises the predictor ladder, both rice parameter widths stay
    * in range, and the multi-byte UTF-8 frame-number coder runs once
    * streams pass 128 frames. */
  def synth(seed: Long, channels: Long, rate: Long,
            frames: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 8 && frames >= 1 &&
      channels * frames <= (1 << 20) && rate >= 1 && rate < (1L << 20),
      s"fake FLAC shape out of range: ${channels}ch x $frames")
    val ch = channels.toInt
    val total = frames
    def sample(flat: Long): Int =
      (Math.floorMod(seed * 31 + flat * 17, 65536L) - 32768).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val bs = 192
    val lastBs = (total % bs).toInt
    val minBs = if (lastBs > 0 && total > bs) math.min(bs, lastBs)
                else if (total < bs) total.toInt else bs
    val si = new java.io.ByteArrayOutputStream()
    val sw = new BitWriter(si)
    sw.put(minBs.toLong, 16)                  // min block size
    sw.put(math.min(bs, total).toLong, 16)    // max block size
    sw.put(0L, 24); sw.put(0L, 24)            // frame sizes unknown
    sw.put(rate, 20)
    sw.put((ch - 1).toLong, 3)
    sw.put(15L, 5)                            // bps - 1 = 15
    sw.put(total, 36)
    (0 until 16).foreach(_ => sw.put(0L, 8))  // md5 unset
    val siB = si.toByteArray
    out.write(0x80)                           // last block, type 0
    out.write(0); out.write(siB.length >> 8); out.write(siB.length & 0xFF)
    out.write(siB, 0, siB.length)
    var base = 0L
    var frameIdx = 0L
    while (base < total) {
      val curBs = math.min(bs.toLong, total - base).toInt
      val f = new java.io.ByteArrayOutputStream()
      f.write(0xFF); f.write(0xF8)            // sync + fixed strategy
      val bsCode = if (curBs == bs) 1 else 7
      f.write((bsCode << 4) | 0)              // rate code 0
      // stereo streams cycle all four channel assignments so every
      // decorrelation reconstruction is on the oracle surface
      val chAsgn =
        if (ch != 2) ch - 1
        else (frameIdx % 4) match {
          case 0 => 1   // independent
          case 1 => 8   // left/side
          case 2 => 9   // right/side
          case _ => 10  // mid/side
        }
      f.write((chAsgn << 4) | (4 << 1))       // assignment, 16-bit
      // UTF-8-style frame number
      if (frameIdx < 0x80) f.write(frameIdx.toInt)
      else if (frameIdx < 0x800) {
        f.write(0xC0 | (frameIdx >> 6).toInt)
        f.write(0x80 | (frameIdx & 0x3F).toInt)
      } else {
        f.write(0xE0 | (frameIdx >> 12).toInt)
        f.write(0x80 | ((frameIdx >> 6) & 0x3F).toInt)
        f.write(0x80 | (frameIdx & 0x3F).toInt)
      }
      if (bsCode == 7) { f.write((curBs - 1) >> 8); f.write((curBs - 1) & 0xFF) }
      val hdr = f.toByteArray
      f.write(crc8(hdr, 0, hdr.length))
      val bw = new BitWriter(f)
      var c = 0
      while (c < ch) {
        val raw = Array.tabulate(curBs)(i => sample((base + i) * ch + c))
        // decorrelated channel derivation (encoder side)
        val (s, sb): (Array[Int], Int) =
          if (chAsgn < 8) (raw, 16)
          else {
            val l = Array.tabulate(curBs)(i => sample((base + i) * ch))
            val r = Array.tabulate(curBs)(i => sample((base + i) * ch + 1))
            chAsgn match {
              case 8 => if (c == 0) (l, 16)
                        else (Array.tabulate(curBs)(i => l(i) - r(i)), 17)
              case 9 => if (c == 0)
                          (Array.tabulate(curBs)(i => l(i) - r(i)), 17)
                        else (r, 16)
              case _ => if (c == 0)
                          (Array.tabulate(curBs)(i => (l(i) + r(i)) >> 1), 16)
                        else (Array.tabulate(curBs)(i => l(i) - r(i)), 17)
            }
          }
        val mask = (1L << sb) - 1
        if (frameIdx % 4 == 3) {
          bw.put(0L, 1); bw.put(1L, 6); bw.put(0L, 1) // VERBATIM
          s.foreach(v => bw.put(v & mask, sb))
        } else {
          val order = math.min(((frameIdx + c) % 3).toInt, curBs - 1)
          bw.put(0L, 1); bw.put((8 + order).toLong, 6); bw.put(0L, 1)
          var i = 0
          while (i < order) { bw.put(s(i) & mask, sb); i += 1 }
          val res = (order until curBs).map { i =>
            order match {
              case 0 => s(i).toLong
              case 1 => s(i) - s(i - 1).toLong
              case 2 => s(i) - 2L * s(i - 1) + s(i - 2)
            }
          }
          val zig = res.map(r => (r << 1) ^ (r >> 63))
          var param = 0
          val mx = if (zig.isEmpty) 0L else zig.max
          while (param < 14 && (mx >> param) > 3) param += 1
          bw.put(0L, 2)          // rice method 0 (4-bit params)
          bw.put(0L, 4)          // partition order 0
          bw.put(param.toLong, 4)
          zig.foreach { u =>
            bw.unary((u >>> param).toInt)
            if (param > 0) bw.put(u & ((1L << param) - 1), param)
          }
        }
        c += 1
      }
      bw.alignZero()
      val body = f.toByteArray
      val c16 = crc16(body, 0, body.length)
      f.write(c16 >> 8); f.write(c16 & 0xFF)
      out.write(f.toByteArray, 0, f.size())
      base += curBs
      frameIdx += 1
    }
    out.toByteArray
  }
}

/** Native expression `graft_flac_stats(binary[, maxSamples])` — see
  * [[FlacFn.stats]]; output schema shared with [[WavSampleStats]]. */
case class FlacSampleStats(child: Expression, maxSamples: Int = 65536)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_flac_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = WavSampleStatsFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_stats"

  override def nullSafeEval(input: Any): Any =
    FlacFn.stats(input.asInstanceOf[Array[Byte]], maxSamples)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.FlacFn.stats($c, $maxSamples);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): FlacSampleStats = copy(child = newChild)
}

/** Native expression `graft_flac_features(binary, thresh[, maxSamples])`
  * — see [[FlacFn.features]]. */
case class FlacFeatures(child: Expression, thresh: Int,
                        maxSamples: Int = 65536)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_flac_features expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = WavSampleStatsFn.featureSchema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_features"

  override def nullSafeEval(input: Any): Any =
    FlacFn.features(input.asInstanceOf[Array[Byte]], maxSamples, thresh)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.FlacFn.features($c, $maxSamples, $thresh);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): FlacFeatures = copy(child = newChild)
}

/** Native expression `graft_flac_to_wav16(binary[, maxSamples])` — see
  * [[FlacFn.toWav16]]. */
case class FlacToWav16(child: Expression, maxSamples: Int = 65536)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_flac_to_wav16 expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_flac_to_wav16"

  override def nullSafeEval(input: Any): Any =
    FlacFn.toWav16(input.asInstanceOf[Array[Byte]], maxSamples)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.FlacFn.toWav16($c, $maxSamples);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): FlacToWav16 = copy(child = newChild)
}

/** Native expression `graft_fake_flac(seed, channels, rate, frames)` —
  * see [[FlacFn.synth]]; the [[FakeWav16]] pattern for the compressed
  * audio family. */
case class FakeFlac(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c =>
      c.dataType == LongType || c.dataType == IntegerType ||
        c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_flac expects (bigint, bigint, bigint, bigint)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_fake_flac"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, c: Any, r: Any, f: Any): Any =
    FlacFn.synth(asLong(s), asLong(c), asLong(r), asLong(f))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c, r, f) =>
      s"${ev.value} = etlmudah.expr.FlacFn.synth((long)$s, " +
        s"(long)$c, (long)$r, (long)$f);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      o: Expression): FakeFlac = FakeFlac(f, s, t, o)
}
