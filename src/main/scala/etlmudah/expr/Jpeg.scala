package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL baseline JPEG (JFIF) pixel decode — the dominant lossy web
  * image format and the LAST stubbed payload family in the multimodal
  * tier (`multimodal/Multimodal.scala` documented the lossy-codec
  * step as the one remaining environment substitution; this closes
  * the image half of it). The decoder is a complete baseline
  * sequential implementation of the public ITU T.81 spec: marker
  * walk, DQT (8-bit precision), DHT (canonical Huffman per Annex C),
  * SOF0, SOS, entropy decode with byte-stuffing, DC prediction +
  * magnitude-category extension, AC run/size with EOB/ZRL, dequant,
  * de-zigzag, 2-D IDCT, level shift, chroma upsampling by sample
  * replication, and JFIF YCbCr→RGB. INTERLEAVED SAMPLING is the
  * general T.81 A.2.3 loop — per-component Hc/Vc factors in {1, 2}
  * cover 4:4:4, 4:2:2, 4:4:0 and the dominant real-world 4:2:0
  * (16x16 MCUs, 4 luma + 2 chroma blocks each) — and RESTART
  * INTERVALS (DRI + cycling byte-aligned RST0–7, DC predictors
  * reset) are decoded per E.1.4. Scope gates (anything else nulls
  * whole, never a partial statistic): baseline SOF0 only
  * (progressive SOF2, extended/lossless/arithmetic SOFs rejected),
  * 8-bit precision, 1 or 3 components, sampling factors ≤ 2 per
  * axis with ≤ 10 data units per MCU, every dimension gated
  * individually BEFORE the w*h multiply and before any allocation
  * (the Png/Avi overflow lesson), entropy stream must decode EXACTLY
  * the MCU grid — with the RIGHT RSTn index at every restart
  * boundary — and terminate at EOI with nothing after it.
  *
  * Exactness: the IDCT carries an integer-exact DC-only fast path —
  * a block whose AC coefficients are all zero decodes to the constant
  * (dc + 4) >> 3 + 128 on every conforming decoder (the 2-D IDCT of
  * a lone DC term is flat), and the JFIF color transform at neutral
  * chroma (Cb = Cr = 128) returns Y unchanged under ANY rounding. So
  * a DC-only 4:4:4 stream with neutral chroma has a closed-form
  * pixel function an oracle can replay WITHOUT parsing a byte — the
  * fakePng24/fakeAvi discipline extended to the entropy-coded family.
  * [[synth]] emits exactly such streams. Blocks with AC energy take
  * the general separable IDCT (deterministic IEEE double, final
  * round-half-up) — exercised in JpegSpec against a direct
  * double-precision reference, not by the SQL oracles.
  *
  * Reference surface: the image-ingest slice of the multimodal
  * substitution (`multimodal/Multimodal.scala:10-16`); this tier
  * replaces the stub for baseline JPEG the way `PngFn` did for
  * truecolor PNG.
  *
  * Orientation: JPEG file order is visual top-down; hash/transcode
  * use the same visual-image conventions as [[PngFn]], so one picture
  * hashes identically across BMP/PNG/AVI/JPEG containers. */
object JpegFn {

  /** Output schema — the q224 stats family in RGB order (identical
    * to [[PngFn.schema]]). */
  val schema: StructType = PngFn.schema

  /** Decoded image: interleaved RGB rows, top-down visual order. */
  private[expr] final class Decoded(val w: Int, val h: Int,
                                    val rgb: Array[Byte])

  /** Natural-order index of zigzag position k (ITU T.81 Figure 5). */
  private val ZIGZAG: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · (u == 0 ? 1/√2 : 1) — the separable IDCT
    * basis. */
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) {
    (x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16) *
        (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
  }

  /** Canonical Huffman table (Annex C code generation + the spec's
    * DECODE procedure tables). */
  private final class Huff(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l)
          k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with 0xFF00 de-stuffing; a real
    * marker (0xFF followed by non-zero) ends the segment — nextBit
    * then returns −1 and `markerPos` points at the 0xFF. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var markerPos: Int = -1
    /** Consume an expected RSTn at a restart boundary: discard the
      * pad bits of the current byte, then the next two bytes MUST be
      * 0xFF, `expect` (the cycling D0–D7 index — T.81 E.1.4). Returns
      * false on anything else: wrong index, missing marker,
      * truncation — the caller nulls whole. */
    def restart(expect: Int): Boolean = {
      cnt = 0
      if (markerPos >= 0) {
        if (markerPos + 2 > bytes.length) return false
        if ((bytes(markerPos + 1) & 0xFF) != expect) return false
        pos = markerPos + 2
        markerPos = -1
        true
      } else {
        if (pos + 2 > bytes.length) return false
        if ((bytes(pos) & 0xFF) != 0xFF ||
          (bytes(pos + 1) & 0xFF) != expect) return false
        pos += 2
        true
      }
    }
    def nextBit(): Int = {
      if (cnt == 0) {
        if (markerPos >= 0 || pos >= bytes.length) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) return -1
          if ((bytes(pos) & 0xFF) == 0x00) pos += 1 // stuffed data 0xFF
          else { markerPos = pos - 1; return -1 }   // real marker
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = nextBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
  }

  private def huffDecode(br: BitReader, t: Huff): Int = {
    var code = 0
    var l = 0
    while (l < 16) {
      val b = br.nextBit()
      if (b < 0) return -1
      code = (code << 1) | b
      l += 1
      if (t.maxcode(l) >= 0 && code <= t.maxcode(l))
        return t.vals(t.valptr(l) + code - t.mincode(l))
    }
    -1
  }

  /** Magnitude-category sign extension (spec EXTEND). */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Inverse DCT + level shift of one dequantized block into 0..255
    * samples (natural order in, raster order out). DC-only blocks
    * take the exact integer path; mixed blocks the separable double
    * path with final round-half-up. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    var acZero = true
    var i = 1
    while (i < 64 && acZero) { if (coef(i) != 0) acZero = false; i += 1 }
    if (acZero) {
      // flat block: every sample is dc/8, rounded half-up, shifted
      val v = clamp255(((coef(0) + 4) >> 3) + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    // rows first (u over x), then columns
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += COS(x)(u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      y = 0
      while (y < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += COS(y)(v) * tmp(v * 8 + x); v += 1 }
        out(y * 8 + x) = clamp255(
          math.floor(s / 4.0 + 0.5).toInt + 128)
        y += 1
      }
      x += 1
    }
  }

  /** Full accept gate + baseline sequential decode; null unless
    * EXACTLY decodable (see object doc). */
  private[expr] def decode(bytes: Array[Byte],
                           maxPixels: Int): Decoded = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var w = 0; var h = 0; var nComp = 0
    var compId: Array[Int] = null
    var compTq: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var sosDc: Array[Int] = null
    var sosAc: Array[Int] = null
    var sawSof = false
    var restartInterval = 0
    var pos = 2
    var entropyAt = -1
    // marker walk up to SOS
    while (entropyAt < 0) {
      if (pos + 2 > bytes.length) return null
      if (u8(pos) != 0xFF) return null
      var m = u8(pos + 1)
      pos += 2
      while (m == 0xFF) { // fill bytes
        if (pos >= bytes.length) return null
        m = u8(pos); pos += 1
      }
      if (m == 0xD8 || m == 0xD9) return null // stray SOI / early EOI
      if (pos + 2 > bytes.length) return null
      val len = be16(pos)
      if (len < 2 || pos + len > bytes.length) return null
      val end = pos + len
      var p = pos + 2
      m match {
        case 0xDB => // DQT: one or more tables
          while (p < end) {
            val pq = u8(p) >> 4
            val tq = u8(p) & 0x0F
            if (pq != 0 || tq > 3 || p + 65 > end) return null // 8-bit only
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val q = u8(p + 1 + k)
              if (q < 1) return null
              t(ZIGZAG(k)) = q
              k += 1
            }
            quant(tq) = t
            p += 65
          }
          if (p != end) return null
        case 0xC4 => // DHT: one or more tables
          while (p < end) {
            if (p + 17 > end) return null
            val tc = u8(p) >> 4
            val th = u8(p) & 0x0F
            if (tc > 1 || th > 3) return null
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) {
              bits(l) = u8(p + l); total += bits(l); l += 1
            }
            if (total < 1 || total > 256 || p + 17 + total > end)
              return null
            val vals = new Array[Int](total)
            var k = 0
            while (k < total) { vals(k) = u8(p + 17 + k); k += 1 }
            val tab = new Huff(bits, vals)
            if (tc == 0) dcTab(th) = tab else acTab(th) = tab
            p += 17 + total
          }
          if (p != end) return null
        case 0xC0 => // SOF0 baseline sequential
          if (sawSof) return null
          sawSof = true
          if (len < 8) return null
          val prec = u8(p)
          h = be16(p + 1); w = be16(p + 3)
          nComp = u8(p + 5)
          // gate each dim BEFORE the multiply (the Png/Avi lesson;
          // here dims are 16-bit so the product fits Int, but the
          // individual gate still runs first for uniformity)
          if (prec != 8 || w < 1 || h < 1 ||
            w > maxPixels || h > maxPixels ||
            w.toLong * h > maxPixels) return null
          if ((nComp != 1 && nComp != 3) || len != 8 + 3 * nComp)
            return null
          compId = new Array[Int](nComp)
          compTq = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          var c = 0
          var hvSum = 0
          while (c < nComp) {
            compId(c) = u8(p + 6 + 3 * c)
            val hv = u8(p + 7 + 3 * c)
            compH(c) = hv >> 4
            compV(c) = hv & 0x0F
            // sampling factors 1 or 2 per axis cover 4:4:4, 4:2:2,
            // 4:4:0 and 4:2:0 (the dominant real-world shape); a
            // single-component frame is non-interleaved so factors
            // must be 1x1 there. T.81 A.2.3 caps an MCU at 10 data
            // units.
            if (compH(c) < 1 || compH(c) > 2 ||
              compV(c) < 1 || compV(c) > 2) return null
            if (nComp == 1 && hv != 0x11) return null
            hvSum += compH(c) * compV(c)
            compTq(c) = u8(p + 8 + 3 * c)
            if (compTq(c) > 3) return null
            c += 1
          }
          if (hvSum > 10) return null
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
             0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return null // progressive / extended / lossless / arithmetic
        case 0xDD => // DRI: restart interval in MCUs (0 disables)
          if (len != 4) return null
          restartInterval = be16(p)
        case 0xDA => // SOS
          if (!sawSof) return null
          if (len != 6 + 2 * nComp || u8(p) != nComp) return null
          sosDc = new Array[Int](nComp)
          sosAc = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            val cs = u8(p + 1 + 2 * c)
            if (compId(c) != cs) return null // scan order = frame order
            sosDc(c) = u8(p + 2 + 2 * c) >> 4
            sosAc(c) = u8(p + 2 + 2 * c) & 0x0F
            if (sosDc(c) > 3 || sosAc(c) > 3) return null
            c += 1
          }
          // baseline full-spectral single scan only
          if (u8(p + 1 + 2 * nComp) != 0 ||
            u8(p + 2 + 2 * nComp) != 63 ||
            u8(p + 3 + 2 * nComp) != 0) return null
          entropyAt = end
        case mm if mm >= 0xE0 && mm <= 0xEF => () // APPn
        case 0xFE => () // COM
        case _ => return null
      }
      pos = end
    }
    // all referenced tables must exist
    var c = 0
    while (c < nComp) {
      if (quant(compTq(c)) == null || dcTab(sosDc(c)) == null ||
        acTab(sosAc(c)) == null) return null
      c += 1
    }
    // MCU geometry (T.81 A.2.3): maxH/maxV set the MCU pixel size;
    // component c carries compH(c) x compV(c) blocks per MCU and a
    // plane of ceil(w*Hc/maxH) x ceil(h*Vc/maxV) samples. 4:4:4 is
    // the all-1x1 special case of the same loop.
    var maxH = 1; var maxV = 1
    c = 0
    while (c < nComp) {
      if (compH(c) > maxH) maxH = compH(c)
      if (compV(c) > maxV) maxV = compV(c)
      c += 1
    }
    val cw = Array.tabulate(nComp)(c => (w * compH(c) + maxH - 1) / maxH)
    val ch = Array.tabulate(nComp)(c => (h * compV(c) + maxV - 1) / maxV)
    // dims are maxPixels-gated: plane allocation is bounded
    val planes = Array.tabulate(nComp)(c => new Array[Int](cw(c) * ch(c)))
    val mcuX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcuY = (h + 8 * maxV - 1) / (8 * maxV)
    val br = new BitReader(bytes, entropyAt)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcuDone = 0
    var rstIdx = 0
    val mcuTotal = mcuX.toLong * mcuY
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        c = 0
        while (c < nComp) {
          var vb0 = 0
          while (vb0 < compV(c)) {
            var hb0 = 0
            while (hb0 < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              // DC: category + extension, predicted
              val s = huffDecode(br, dcTab(sosDc(c)))
              if (s < 0 || s > 11) return null
              val diffBits = br.receive(s)
              if (diffBits == Int.MinValue) return null
              pred(c) += extend(diffBits, s)
              val qt = quant(compTq(c))
              coef(0) = pred(c) * qt(0)
              // AC: run/size to EOB or position 63
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = huffDecode(br, acTab(sosAc(c)))
                if (rs < 0) return null
                val r = rs >> 4
                val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true      // EOB
                } else {
                  k += r
                  if (k > 63 || sz > 10) return null
                  val vb = br.receive(sz)
                  if (vb == Int.MinValue) return null
                  coef(ZIGZAG(k)) = extend(vb, sz) * qt(ZIGZAG(k))
                  k += 1
                }
              }
              if (k > 64) return null
              idct(coef, block)
              // place with crop (partial edge MCUs / plane edges)
              val oy = (my * compV(c) + vb0) * 8
              val ox = (mx * compH(c) + hb0) * 8
              var by = 0
              while (by < 8) {
                val py = oy + by
                if (py < ch(c)) {
                  var bx = 0
                  while (bx < 8) {
                    val px = ox + bx
                    if (px < cw(c))
                      planes(c)(py * cw(c) + px) = block(by * 8 + bx)
                    bx += 1
                  }
                }
                by += 1
              }
              hb0 += 1
            }
            vb0 += 1
          }
          c += 1
        }
        // restart boundary (T.81 E.1.4): after every `restartInterval`
        // MCUs — except the last — a byte-aligned RSTn with the
        // CYCLING index must follow; DC predictors reset. A wrong
        // index, a missing marker, or an RSTn anywhere else (it would
        // abort huffDecode mid-MCU) nulls whole.
        mcuDone += 1
        if (restartInterval > 0 && mcuDone < mcuTotal &&
          mcuDone % restartInterval == 0) {
          if (!br.restart(0xD0 + (rstIdx & 7))) return null
          rstIdx += 1
          java.util.Arrays.fill(pred, 0)
        }
        mx += 1
      }
      my += 1
    }
    // the entropy stream must end exactly here: pad bits, then EOI,
    // then nothing (the exactly-decodable contract)
    var ep = if (br.markerPos >= 0) br.markerPos else br.pos
    while (ep + 1 < bytes.length && u8(ep) == 0xFF && u8(ep + 1) == 0xFF)
      ep += 1 // fill bytes
    if (ep + 2 != bytes.length || u8(ep) != 0xFF || u8(ep + 1) != 0xD9)
      return null
    // color convert (JFIF fixed point, round-half via +32768 >> 16;
    // neutral chroma returns Y exactly) or replicate grayscale.
    // Subsampled components upsample by NEAREST (sample replication —
    // pixel (x, y) reads component sample (x*Hc/maxH, y*Vc/maxV));
    // decoders legitimately differ here (libjpeg defaults to a
    // triangular filter), but at the oracle surface chroma is
    // CONSTANT, where every upsampling filter returns the constant.
    val rgb = new Array[Byte](3 * w * h)
    if (nComp == 1) {
      var i = 0
      while (i < w * h) {
        val y = clamp255(planes(0)(i)).toByte
        rgb(3 * i) = y; rgb(3 * i + 1) = y; rgb(3 * i + 2) = y
        i += 1
      }
    } else {
      val lumaFull = compH(0) == maxH && compV(0) == maxV
      var py = 0
      while (py < h) {
        val cbRow = (py * compV(1) / maxV) * cw(1)
        val crRow = (py * compV(2) / maxV) * cw(2)
        val yRow = (py * compV(0) / maxV) * cw(0)
        var px = 0
        while (px < w) {
          val i = py * w + px
          val y =
            if (lumaFull) planes(0)(i)
            else planes(0)(yRow + px * compH(0) / maxH)
          val cb = planes(1)(cbRow + px * compH(1) / maxH) - 128
          val cr = planes(2)(crRow + px * compH(2) / maxH) - 128
          rgb(3 * i) = clamp255(y + ((91881 * cr + 32768) >> 16)).toByte
          rgb(3 * i + 1) = clamp255(
            y - ((22554 * cb + 46802 * cr + 32768) >> 16)).toByte
          // 116130 = libjpeg FIX(1.77200) = (INT32)(1.772*65536 +
          // 0.5) = (INT32)(116130.292) — NOT 116131 (1.772*65536 is
          // 116129.792, which half-up-rounds to 116130)
          rgb(3 * i + 2) = clamp255(
            y + ((116130 * cb + 32768) >> 16)).toByte
          px += 1
        }
        py += 1
      }
    }
    new Decoded(w, h, rgb)
  }

  def stats(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val d = decode(bytes, maxPixels)
    if (d == null) return null
    val npx = d.w.toLong * d.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var nr = 255; var ng = 255; var nb = 255
    var xr = 0; var xg = 0; var xb = 0
    var i = 0
    while (i < d.rgb.length) {
      val r = d.rgb(i) & 0xFF
      val g = d.rgb(i + 1) & 0xFF
      val b = d.rgb(i + 2) & 0xFF
      sr += r; sg += g; sb += b
      if (r < nr) nr = r; if (r > xr) xr = r
      if (g < ng) ng = g; if (g > xg) xg = g
      if (b < nb) nb = b; if (b > xb) xb = b
      i += 3
    }
    val n = npx.toDouble
    new GenericInternalRow(Array[Any](
      d.w.toLong, d.h.toLong, npx,
      nr, xr, sr, BmpPixelStatsFn.round6(sr / n),
      ng, xg, sg, BmpPixelStatsFn.round6(sg / n),
      nb, xb, sb, BmpPixelStatsFn.round6(sb / n)))
  }

  /** Perceptual average hash, IDENTICAL grid/packing/compare to
    * [[BmpPixelStatsFn.ahash]]/[[PngFn.ahash]] (visual-image
    * convention), so one picture hashes the same from any of the
    * four containers. */
  def ahash(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val d = decode(bytes, maxPixels)
    if (d == null) return null
    val cell = new Array[Long](64)
    var total = 0L
    var gi = 0
    while (gi < 8) {
      val v = d.h - 1 - gi * d.h / 8 // visual-hash convention
      var gj = 0
      while (gj < 8) {
        val c = gj * d.w / 8
        val p = (v * d.w + c) * 3
        val s = (d.rgb(p) & 0xFF) + (d.rgb(p + 1) & 0xFF) +
          (d.rgb(p + 2) & 0xFF)
        cell(gi * 8 + gj) = s.toLong
        total += s
        gj += 1
      }
      gi += 1
    }
    var w0 = 0L; var w1 = 0L
    var k = 0
    while (k < 64) {
      if (cell(k) * 64 > total) {
        if (k < 32) w0 |= 1L << k else w1 |= 1L << (k - 32)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](w0, w1))
  }

  /** TRANSCODE to a canonical bottom-up BI_RGB 24bpp BMP ([[PngFn
    * .toBmp24]]'s convention verbatim) — composes the whole BMP
    * kernel family (resize, stats, ahash) onto JPEG inputs. */
  def toBmp24(bytes: Array[Byte], maxPixels: Int): Array[Byte] = {
    val d = decode(bytes, maxPixels)
    if (d == null) return null
    val stride = (d.w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * d.h)
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xFF).toByte
      out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte
      out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length.toLong)
    putLe32(10, 54L)
    putLe32(14, 40L)
    putLe32(18, d.w.toLong)
    putLe32(22, d.h.toLong) // positive = bottom-up
    out(26) = 1
    out(28) = 24
    putLe32(30, 0L)
    putLe32(34, (stride * d.h).toLong)
    var fr = 0
    while (fr < d.h) {
      val v = d.h - 1 - fr
      val row = 54 + fr * stride
      var c = 0
      while (c < d.w) {
        val p = (v * d.w + c) * 3
        out(row + c * 3) = d.rgb(p + 2)     // B
        out(row + c * 3 + 1) = d.rgb(p + 1) // G
        out(row + c * 3 + 2) = d.rgb(p)     // R
        c += 1
      }
      fr += 1
    }
    out
  }

  // --- synthesis ---------------------------------------------------

  /** Per-block gray value of the synthesized image — the closed form
    * oracles replay. Visual pixel (y top-down, x) of
    * `synth(seed, w, h)` has R = G = B =
    * floorMod(seed*17 + (y div 8)*5 + (x div 8)*3, 256). */
  private[expr] def blockVal(seed: Long, by: Int, bx: Int): Int =
    Math.floorMod(seed * 17 + by * 5 + bx * 3, 256L).toInt

  /** Standard Annex K.3.1 luminance DC table: category i codes. */
  private val DC_BITS = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DC_VALS = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  /** Minimal AC table: EOB only, 1-bit code. */
  private val AC_BITS = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AC_VALS = Array(0)

  /** Canonical (code, length) per symbol from a bits/vals pair. */
  private def canonCodes(bits: Array[Int],
                         vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        m += vals(k) -> ((code, l))
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    m.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  /** Synthesize a COMPLETE baseline JFIF whose decoded image is the
    * [[blockVal]] closed form: 3 components, 4:4:4, all-ones quant
    * table, DC-ONLY blocks (luma DC = 8·(v−128) so the flat-block
    * IDCT returns exactly v; chroma pinned at neutral 128 so the
    * color transform returns Y unchanged). Non-multiple-of-8 dims
    * exercise the decoder's edge-MCU crop — the padded samples repeat
    * the block constant, so the closed form holds for EVERY (w, h).
    * DC diffs span the full ±2040 range over a multi-block image,
    * exercising magnitude categories 0–11. */
  def synth(seed: Long, width: Long, height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake JPEG dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xDB, Array(0x00) ++ Array.fill(64)(1)) // DQT 0: all ones
    seg(0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF,
      w & 0xFF, 3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xC4, Array(0x00) ++ DC_BITS.drop(1) ++ DC_VALS) // DHT DC 0
    seg(0xC4, Array(0x10) ++ AC_BITS.drop(1) ++ AC_VALS) // DHT AC 0
    seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcCodes = canonCodes(DC_BITS, DC_VALS)
    val (eobCode, eobLen) = canonCodes(AC_BITS, AC_VALS)(0)
    val bw = new BitWriter(out)
    def putDc(diff: Int): Unit = {
      var s = 0
      var a = math.abs(diff)
      while (a > 0) { s += 1; a >>= 1 }
      val (c, l) = dcCodes(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff > 0) diff else diff + (1 << s) - 1, s)
    }
    val pred = new Array[Int](3)
    val mcuX = (w + 7) / 8
    val mcuY = (h + 7) / 8
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        var c = 0
        while (c < 3) {
          val target = if (c == 0) blockVal(seed, my, mx) else 128
          val dc = 8 * (target - 128)
          putDc(dc - pred(c))
          pred(c) = dc
          bw.put(eobCode, eobLen) // all-zero AC
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Subsampled sibling of [[synth]]: the SAME closed-form image
    * through an INTERLEAVED-SAMPLING stream — luma hs x vs (2x2 =
    * 4:2:0, 2x1 = 4:2:2), chroma 1x1 — with optional RESTART
    * INTERVALS (DRI + a byte-aligned cycling RST0–7 after every `ri`
    * MCUs, DC predictors reset, per T.81 E.1.4). Every luma block
    * still covers exactly one 8x8 closed-form cell (a 4:2:0 MCU is
    * 16x16 pixels = a 2x2 grid of cells) and chroma stays constant
    * (neutral chroma is invariant under ANY subsampling/upsampling),
    * so the decoded pixels are IDENTICAL to synth(seed, w, h)'s:
    * subsampling and restarts change the BYTE STREAM, not the
    * number — the oracle replays the same closed form. cb/cr are
    * parameters so JpegSpec can exercise the non-neutral upsampled
    * color transform off the oracle surface. */
  private[expr] def synthSub(seed: Long, width: Long, height: Long,
                             hs: Int, vs: Int, ri: Int,
                             cbVal: Int, crVal: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake JPEG dims out of range: ${width}x$height")
    require((hs == 1 || hs == 2) && (vs == 1 || vs == 2),
      s"sampling factors must be 1 or 2, got ${hs}x$vs")
    require(ri >= 0 && ri <= 0xFFFF, s"restart interval out of range: $ri")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xDB, Array(0x00) ++ Array.fill(64)(1)) // DQT 0: all ones
    seg(0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF,
      w & 0xFF, 3, 1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xC4, Array(0x00) ++ DC_BITS.drop(1) ++ DC_VALS) // DHT DC 0
    seg(0xC4, Array(0x10) ++ AC_BITS.drop(1) ++ AC_VALS) // DHT AC 0
    if (ri > 0) seg(0xDD, Array((ri >> 8) & 0xFF, ri & 0xFF)) // DRI
    seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    val dcCodes = canonCodes(DC_BITS, DC_VALS)
    val (eobCode, eobLen) = canonCodes(AC_BITS, AC_VALS)(0)
    val bw = new BitWriter(out)
    def putDc(diff: Int): Unit = {
      var s = 0
      var a = math.abs(diff)
      while (a > 0) { s += 1; a >>= 1 }
      val (c, l) = dcCodes(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff > 0) diff else diff + (1 << s) - 1, s)
    }
    val pred = new Array[Int](3)
    def putBlock(c: Int, target: Int): Unit = {
      val dc = 8 * (target - 128)
      putDc(dc - pred(c))
      pred(c) = dc
      bw.put(eobCode, eobLen) // all-zero AC
    }
    val mcuX = (w + 8 * hs - 1) / (8 * hs)
    val mcuY = (h + 8 * vs - 1) / (8 * vs)
    val mcuTotal = mcuX.toLong * mcuY
    var mcuDone = 0L
    var rst = 0
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        var v = 0
        while (v < vs) {
          var hb = 0
          while (hb < hs) {
            putBlock(0, blockVal(seed, my * vs + v, mx * hs + hb))
            hb += 1
          }
          v += 1
        }
        putBlock(1, cbVal)
        putBlock(2, crVal)
        mcuDone += 1
        if (ri > 0 && mcuDone < mcuTotal && mcuDone % ri == 0) {
          bw.flushWithOnes() // byte-align before the marker
          marker(0xD0 + (rst & 7))
          rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** 4:2:0 + restart-interval synthesis at neutral chroma — the
    * dominant real-world JPEG shape carrying the [[blockVal]] closed
    * form; see [[synthSub]]. */
  def synth420(seed: Long, width: Long, height: Long,
               ri: Long): Array[Byte] =
    synthSub(seed, width, height, 2, 2, ri.toInt, 128, 128)
}

/** Native Catalyst expression `graft_jpeg_stats(binary[, maxPixels])`
  * — see [[JpegFn.stats]]. */
case class JpegPixelStats(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = JpegFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_stats"

  override def nullSafeEval(input: Any): Any =
    JpegFn.stats(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.JpegFn.stats($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): JpegPixelStats = copy(child = newChild)
}

/** Native Catalyst expression `graft_jpeg_ahash(binary[, maxPixels])`
  * — see [[JpegFn.ahash]]; struct(h0, h1) packed exactly like
  * [[BmpAHash]]/[[PngAHash]] so cross-format Hamming/grouping tiers
  * compose. */
case class JpegAHash(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_ahash expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_ahash"

  override def nullSafeEval(input: Any): Any =
    JpegFn.ahash(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.JpegFn.ahash($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): JpegAHash = copy(child = newChild)
}

/** Native expression `graft_jpeg_to_bmp24(binary[, maxPixels])` — see
  * [[JpegFn.toBmp24]]. */
case class JpegToBmp24(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_to_bmp24 expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_to_bmp24"

  override def nullSafeEval(input: Any): Any =
    JpegFn.toBmp24(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.JpegFn.toBmp24($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): JpegToBmp24 = copy(child = newChild)
}

/** Native expression `graft_fake_jpeg(seed, w, h)` — see
  * [[JpegFn.synth]]; the [[FakePng24]] pattern for the entropy-coded
  * family. */
case class FakeJpeg(first: Expression, second: Expression,
                    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_jpeg expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_jpeg"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    JpegFn.synth(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.JpegFn.synth((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakeJpeg =
    FakeJpeg(f, s, t)
}

/** Native expression `graft_fake_jpeg420(seed, w, h, restartInterval)`
  * — 4:2:0 subsampled + restart-interval sibling of [[FakeJpeg]],
  * same decoded image; see [[JpegFn.synth420]]. */
case class FakeJpeg420(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_jpeg420 expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_jpeg420"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, ri: Any): Any =
    JpegFn.synth420(asLong(s), asLong(w), asLong(h), asLong(ri))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, ri) =>
      s"${ev.value} = etlmudah.expr.JpegFn.synth420((long)$s, " +
        s"(long)$w, (long)$h, (long)$ri);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeJpeg420 = FakeJpeg420(f, s, t, q)
}
