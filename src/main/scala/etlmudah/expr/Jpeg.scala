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
  * reset) are decoded per E.1.4. PROGRESSIVE (SOF2) is decoded in
  * full per T.81 G.1/G.2: multi-scan walk with spectral selection
  * and successive approximation — interleaved or single-component DC
  * first scans (arithmetic point transform) and raw-bit DC
  * refinements, single-component AC first scans (SIGN-MAGNITUDE
  * point transform, EOB-run coding) and AC refinement with the
  * correction-bit algorithm; scan-script legality is enforced (first
  * pass once per band, Al stepping down by one, DC before AC, AC
  * never interleaved) and a script that does not land EVERY
  * coefficient of EVERY component at level 0 nulls whole rather than
  * render a half-approximated image. Scope gates (anything else
  * nulls whole, never a partial statistic): SOF0/SOF2 only
  * (extended/lossless/arithmetic SOFs rejected), 8-bit precision,
  * 1 or 3 components, sampling factors ≤ 2 per axis with ≤ 10 data
  * units per MCU, every dimension gated individually BEFORE the w*h
  * multiply and before any allocation (the Png/Avi overflow lesson),
  * every scan must decode EXACTLY its data-unit grid — with the
  * RIGHT RSTn index at every restart boundary — and the stream must
  * terminate at EOI with nothing after it.
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
    var progressive = false
    var restartInterval = 0
    var pos = 2
    // geometry + per-component COEFFICIENT STORE, allocated at SOF.
    // Coefficients accumulate RAW (un-dequantized) across scans —
    // baseline fills them in its one full scan, progressive across
    // its DC/AC first+refinement scans (T.81 G.1.2) — and one final
    // reconstruction pass dequantizes + IDCTs. Progressive and
    // sequential streams carrying the SAME coefficients therefore
    // decode to IDENTICAL pixels by construction.
    var maxH = 1; var maxV = 1
    var mcuX = 0; var mcuY = 0
    var cw: Array[Int] = null; var ch: Array[Int] = null
    var cbW: Array[Int] = null; var cbH: Array[Int] = null
    var bwFull: Array[Int] = null; var bhFull: Array[Int] = null
    var coefs: Array[Array[Int]] = null
    // per component, per ZIGZAG index: the successive-approximation
    // level currently decoded (-1 = untouched); the completeness gate
    // requires every entry to reach 0 (T.81 scan-script legality:
    // first pass Ah=0 once per band, then refinements stepping Al
    // down by exactly one)
    var approx: Array[Array[Int]] = null
    var nScans = 0

    /** Decode one entropy-coded scan; returns the marker-aligned end
      * position or -1 (caller nulls whole). */
    def decodeScan(comps: Array[Int], tds: Array[Int], tas: Array[Int],
                   ss: Int, se: Int, ah: Int, al: Int,
                   startPos: Int): Int = {
      val br = new BitReader(bytes, startPos)
      val pred = new Array[Int](nComp)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -(1 << al)
      def dcUnit(ci: Int, base: Int): Boolean = {
        if (ah == 0) {
          val sym = huffDecode(br, dcTab(tds(ci)))
          if (sym < 0 || sym > 11) return false
          val diffBits = br.receive(sym)
          if (diffBits == Int.MinValue) return false
          pred(ci) += extend(diffBits, sym)
          coefs(ci)(base) = pred(ci) << al
          true
        } else { // DC refinement: one raw bit per block, no Huffman
          val b = br.nextBit()
          if (b < 0) return false
          if (b == 1) coefs(ci)(base) |= p1
          true
        }
      }
      def acFirstUnit(ci: Int, base: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = huffDecode(br, acTab(tas(ci)))
          if (rs < 0) return false
          val r = rs >> 4
          val sz = rs & 0x0F
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: run of 2^r + ext blocks ENDING with this one
              eobrun = (1 << r) - 1
              if (r > 0) {
                val ext = br.receive(r)
                if (ext == Int.MinValue) return false
                eobrun += ext
              }
              return true
            }
          } else {
            k += r
            if (k > se || sz > 10) return false
            val vb = br.receive(sz)
            if (vb == Int.MinValue) return false
            coefs(ci)(base + ZIGZAG(k)) = extend(vb, sz) << al
            k += 1
          }
        }
        true
      }
      def acRefineUnit(ci: Int, base: Int): Boolean = {
        val cf = coefs(ci)
        def correct(zi: Int): Boolean = {
          val b = br.nextBit()
          if (b < 0) return false
          if (b == 1 && (cf(base + zi) & p1) == 0)
            cf(base + zi) += (if (cf(base + zi) >= 0) p1 else m1)
          true
        }
        var k = ss
        if (eobrun == 0) {
          var broke = false
          while (k <= se && !broke) {
            val rs = huffDecode(br, acTab(tas(ci)))
            if (rs < 0) return false
            var r = rs >> 4
            val sz = rs & 0x0F
            var newVal = 0
            if (sz == 0) {
              if (r < 15) { // EOBn: run covers the REST of this block
                eobrun = 1 << r
                if (r > 0) {
                  val ext = br.receive(r)
                  if (ext == Int.MinValue) return false
                  eobrun += ext
                }
                broke = true
              }
              // r == 15 (ZRL): skip 16 zero-HISTORY coefficients
            } else {
              if (sz != 1) return false // refinement codes only +-1
              val b = br.nextBit()
              if (b < 0) return false
              newVal = if (b == 1) p1 else m1
            }
            if (!broke) {
              // advance over the band: nonzero-history coefficients
              // take a correction bit; zero-history ones count down r
              var placed = false
              var cont = true
              while (k <= se && cont) {
                val zi = ZIGZAG(k)
                if (cf(base + zi) != 0) {
                  if (!correct(zi)) return false
                } else {
                  if (r == 0) {
                    if (sz != 0) { cf(base + zi) = newVal; placed = true }
                    cont = false
                  } else r -= 1
                }
                k += 1
              }
              if (sz != 0 && !placed) return false // ran off the band
            }
          }
        }
        if (eobrun > 0) {
          // the EOB run covers this block from k on: correction bits
          // for every remaining nonzero-history coefficient
          while (k <= se) {
            val zi = ZIGZAG(k)
            if (cf(base + zi) != 0 && !correct(zi)) return false
            k += 1
          }
          eobrun -= 1
        }
        true
      }
      def baselineUnit(ci: Int, base: Int): Boolean = {
        val sym = huffDecode(br, dcTab(tds(ci)))
        if (sym < 0 || sym > 11) return false
        val diffBits = br.receive(sym)
        if (diffBits == Int.MinValue) return false
        pred(ci) += extend(diffBits, sym)
        coefs(ci)(base) = pred(ci)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffDecode(br, acTab(tas(ci)))
          if (rs < 0) return false
          val r = rs >> 4
          val sz = rs & 0x0F
          if (sz == 0) {
            if (r == 15) k += 16 // ZRL
            else eob = true      // EOB
          } else {
            k += r
            if (k > 63 || sz > 10) return false
            val vb = br.receive(sz)
            if (vb == Int.MinValue) return false
            coefs(ci)(base + ZIGZAG(k)) = extend(vb, sz)
            k += 1
          }
        }
        k <= 64
      }
      def unit(ci: Int, base: Int): Boolean =
        if (!progressive) baselineUnit(ci, base)
        else if (ss == 0) dcUnit(ci, base)
        else if (ah == 0) acFirstUnit(ci, base)
        else acRefineUnit(ci, base)
      var rstIdx = 0
      var unitDone = 0L
      def restartIfDue(total: Long): Boolean = {
        unitDone += 1
        if (restartInterval > 0 && unitDone < total &&
          unitDone % restartInterval == 0) {
          if (!br.restart(0xD0 + (rstIdx & 7))) return false
          rstIdx += 1
          java.util.Arrays.fill(pred, 0)
          eobrun = 0 // E.1.4: restart resets the EOB run too
        }
        true
      }
      if (comps.length > 1) {
        // INTERLEAVED: MCU order with per-component sub-blocks
        val total = mcuX.toLong * mcuY
        var my = 0
        while (my < mcuY) {
          var mx = 0
          while (mx < mcuX) {
            var i = 0
            while (i < comps.length) {
              val ci = comps(i)
              var v = 0
              while (v < compV(ci)) {
                var hb = 0
                while (hb < compH(ci)) {
                  val base = ((my * compV(ci) + v) * bwFull(ci) +
                    mx * compH(ci) + hb) * 64
                  if (!unit(ci, base)) return -1
                  hb += 1
                }
                v += 1
              }
              i += 1
            }
            if (!restartIfDue(total)) return -1
            mx += 1
          }
          my += 1
        }
      } else {
        // NON-INTERLEAVED (T.81 A.2.2): the component's own ceil
        // block grid in row-major order; the MCU is one data unit
        val ci = comps(0)
        val total = cbW(ci).toLong * cbH(ci)
        var by = 0
        while (by < cbH(ci)) {
          var bx = 0
          while (bx < cbW(ci)) {
            if (!unit(ci, (by * bwFull(ci) + bx) * 64)) return -1
            if (!restartIfDue(total)) return -1
            bx += 1
          }
          by += 1
        }
      }
      if (br.markerPos >= 0) br.markerPos else br.pos
    }

    // marker walk: tables/frame header/scans until EOI at EXACTLY the
    // end of the blob
    var seenEoi = false
    while (!seenEoi) {
      if (pos + 2 > bytes.length) return null
      if (u8(pos) != 0xFF) return null
      var m = u8(pos + 1)
      pos += 2
      while (m == 0xFF) { // fill bytes
        if (pos >= bytes.length) return null
        m = u8(pos); pos += 1
      }
      if (m == 0xD8) return null // stray SOI
      if (m == 0xD9) { // EOI: nothing after it, at least one scan
        if (pos != bytes.length || nScans == 0) return null
        seenEoi = true
      } else {
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
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            if (sawSof) return null
            sawSof = true
            progressive = m == 0xC2
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
            // geometry + bounded coefficient storage (dims are
            // maxPixels-gated; the padded block grid is at most one
            // extra MCU per axis)
            c = 0
            while (c < nComp) {
              if (compH(c) > maxH) maxH = compH(c)
              if (compV(c) > maxV) maxV = compV(c)
              c += 1
            }
            mcuX = (w + 8 * maxH - 1) / (8 * maxH)
            mcuY = (h + 8 * maxV - 1) / (8 * maxV)
            cw = Array.tabulate(nComp)(c => (w * compH(c) + maxH - 1) / maxH)
            ch = Array.tabulate(nComp)(c => (h * compV(c) + maxV - 1) / maxV)
            cbW = Array.tabulate(nComp)(c => (cw(c) + 7) / 8)
            cbH = Array.tabulate(nComp)(c => (ch(c) + 7) / 8)
            bwFull = Array.tabulate(nComp)(c => mcuX * compH(c))
            bhFull = Array.tabulate(nComp)(c => mcuY * compV(c))
            coefs = Array.tabulate(nComp)(c =>
              new Array[Int](bwFull(c) * bhFull(c) * 64))
            approx = Array.fill(nComp)(Array.fill(64)(-1))
          case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return null // extended / lossless / arithmetic
          case 0xDD => // DRI: restart interval in MCUs (0 disables)
            if (len != 4) return null
            restartInterval = be16(p)
          case 0xDA => // SOS
            if (!sawSof || nScans >= 512) return null
            val ns = u8(p)
            if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return null
            val comps = new Array[Int](ns)
            val tds = new Array[Int](nComp)
            val tas = new Array[Int](nComp)
            var i = 0
            var prevIdx = -1
            while (i < ns) {
              val cs = u8(p + 1 + 2 * i)
              val idx = compId.indexOf(cs)
              if (idx < 0 || idx <= prevIdx) return null // frame order
              prevIdx = idx
              comps(i) = idx
              tds(idx) = u8(p + 2 + 2 * i) >> 4
              tas(idx) = u8(p + 2 + 2 * i) & 0x0F
              if (tds(idx) > 3 || tas(idx) > 3) return null
              i += 1
            }
            val ss = u8(p + 1 + 2 * ns)
            val se = u8(p + 2 + 2 * ns)
            val ah = u8(p + 3 + 2 * ns) >> 4
            val al = u8(p + 3 + 2 * ns) & 0x0F
            if (!progressive) {
              // baseline: exactly ONE full-spectral all-component scan
              if (nScans != 0 || ns != nComp || ss != 0 || se != 63 ||
                ah != 0 || al != 0) return null
            } else {
              // T.81 G.1: DC scans are Ss=Se=0 (possibly interleaved);
              // AC scans cover one band of ONE component; successive
              // approximation steps Al down one at a time
              if (ss > 63 || se > 63 || ss > se || ah > 13 || al > 13)
                return null
              if (ss == 0 && se != 0) return null
              if (ss > 0 && ns != 1) return null
              if (ah != 0 && al != ah - 1) return null
            }
            // scan-script legality + coverage bookkeeping
            i = 0
            while (i < ns) {
              val ci = comps(i)
              if (ss > 0 && approx(ci)(0) < 0) return null // DC first
              var k = ss
              while (k <= se) {
                val st = approx(ci)(k)
                if (ah == 0) { if (st != -1) return null }
                else if (st != ah) return null
                approx(ci)(k) = al
                k += 1
              }
              i += 1
            }
            // referenced tables must exist for the paths that use them
            i = 0
            while (i < ns) {
              val ci = comps(i)
              if (ss == 0 && ah == 0 && dcTab(tds(ci)) == null) return null
              if ((!progressive || ss > 0) && acTab(tas(ci)) == null)
                return null
              if (!progressive && dcTab(tds(ci)) == null) return null
              i += 1
            }
            val after = decodeScan(comps, tds, tas, ss, se, ah, al, end)
            if (after < 0) return null
            nScans += 1
            pos = after
          case mm if mm >= 0xE0 && mm <= 0xEF => () // APPn
          case 0xFE => () // COM
          case _ => return null
        }
        if (m != 0xDA) pos = end
      }
    }
    // completeness: a progressive scan script must land EVERY
    // coefficient of EVERY component at approximation level 0 —
    // partial scripts (missing refinements, uncovered bands) null
    // whole rather than render a half-approximated image
    if (progressive) {
      var c = 0
      while (c < nComp) {
        var k = 0
        while (k < 64) {
          if (approx(c)(k) != 0) return null
          k += 1
        }
        c += 1
      }
    }
    // reconstruction: dequantize + IDCT the visible block grid
    val planes = Array.tabulate(nComp)(c => new Array[Int](cw(c) * ch(c)))
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var c = 0
    while (c < nComp) {
      val qt = quant(compTq(c))
      if (qt == null) return null
      var by = 0
      while (by < cbH(c)) {
        var bx = 0
        while (bx < cbW(c)) {
          val base = (by * bwFull(c) + bx) * 64
          var i = 0
          while (i < 64) { coef(i) = coefs(c)(base + i) * qt(i); i += 1 }
          idct(coef, block)
          val oy = by * 8
          val ox = bx * 8
          var r = 0
          while (r < 8) {
            val py = oy + r
            if (py < ch(c)) {
              var x = 0
              while (x < 8) {
                val px = ox + x
                if (px < cw(c))
                  planes(c)(py * cw(c) + px) = block(r * 8 + x)
                x += 1
              }
            }
            r += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
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

  /** AC table for progressive scans: the fifteen EOBn/ZRL-free run
    * symbols 0x00–0xE0 as 4-bit canonical codes (15 of 16 slots; the
    * all-ones prefix stays unassigned per Annex C). */
  private val PAC_BITS = Array(0, 0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val PAC_VALS = Array(0x00, 0x10, 0x20, 0x30, 0x40, 0x50, 0x60,
    0x70, 0x80, 0x90, 0xA0, 0xB0, 0xC0, 0xD0, 0xE0)

  /** PROGRESSIVE (SOF2) sibling of [[synthSub]]: the IDENTICAL
    * closed-form image through a seven-scan successive-approximation
    * script — (1) an interleaved DC FIRST scan at Al=3, (2–4) three
    * DC REFINEMENT scans stepping Al 2→1→0 (raw bits, no Huffman),
    * (5–7) per-component non-interleaved AC first scans coded as
    * EOBn RUNS (all ACs are zero; the runs exercise the EOB-run
    * machinery for real, capped at restart boundaries). The DC quant
    * step is 8, so the quantized DC is exactly v−128 and the
    * refinement bits at Al=2,1,0 GENUINELY VARY — the approximation
    * chain is on the oracle surface, not a ladder of zero bits.
    * Because the accumulated coefficients equal the sequential
    * stream's, the decoded pixels are IDENTICAL to
    * synthSub(seed, w, h, ...)'s — the scan script changes the byte
    * stream, not the number. */
  private[expr] def synthProg(seed: Long, width: Long, height: Long,
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
    // DQT 0: DC step 8 (zigzag slot 0), ACs 1
    seg(0xDB, Array(0x00, 8) ++ Array.fill(63)(1))
    seg(0xC2, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF,
      w & 0xFF, 3, 1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0))
    seg(0xC4, Array(0x00) ++ DC_BITS.drop(1) ++ DC_VALS) // DHT DC 0
    seg(0xC4, Array(0x10) ++ PAC_BITS.drop(1) ++ PAC_VALS) // DHT AC 0
    if (ri > 0) seg(0xDD, Array((ri >> 8) & 0xFF, ri & 0xFF)) // DRI
    val dcCodes = canonCodes(DC_BITS, DC_VALS)
    val pacCodes = canonCodes(PAC_BITS, PAC_VALS)
    val mcuX = (w + 8 * hs - 1) / (8 * hs)
    val mcuY = (h + 8 * vs - 1) / (8 * vs)
    val mcuTotal = mcuX.toLong * mcuY
    // quantized DC per (component, blockRow, blockCol): exactly the
    // target value minus 128 (quant step 8 divides the 8·(v−128))
    def qdc(c: Int, by: Int, bx: Int): Int =
      if (c == 0) blockVal(seed, by, bx) - 128
      else if (c == 1) cbVal - 128
      else crVal - 128
    // --- scan 1: interleaved DC first, Ah=0, Al=3 ---
    seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 3))
    var bw = new BitWriter(out)
    def putDcDiff(diff: Int): Unit = {
      var sz = 0
      var a = math.abs(diff)
      while (a > 0) { sz += 1; a >>= 1 }
      val (c, l) = dcCodes(sz)
      bw.put(c, l)
      if (sz > 0)
        bw.put(if (diff > 0) diff else diff + (1 << sz) - 1, sz)
    }
    val pred = new Array[Int](3)
    var rst = 0
    var mcuDone = 0L
    def restartDue(total: Long): Unit = {
      mcuDone += 1
      if (ri > 0 && mcuDone < total && mcuDone % ri == 0) {
        bw.flushWithOnes()
        marker(0xD0 + (rst & 7))
        rst += 1
        java.util.Arrays.fill(pred, 0)
      }
    }
    def dcScanInterleaved(body: (Int, Int, Int) => Unit): Unit = {
      java.util.Arrays.fill(pred, 0)
      rst = 0
      mcuDone = 0L
      var my = 0
      while (my < mcuY) {
        var mx = 0
        while (mx < mcuX) {
          var c = 0
          while (c < 3) {
            val (hc, vc) = if (c == 0) (hs, vs) else (1, 1)
            var v = 0
            while (v < vc) {
              var hb = 0
              while (hb < hc) {
                val by = if (c == 0) my * vs + v else my
                val bx = if (c == 0) mx * hs + hb else mx
                body(c, by, bx)
                hb += 1
              }
              v += 1
            }
            c += 1
          }
          restartDue(mcuTotal)
          mx += 1
        }
        my += 1
      }
      bw.flushWithOnes()
    }
    dcScanInterleaved { (c, by, bx) =>
      val v3 = qdc(c, by, bx) >> 3 // arithmetic: floor toward -inf
      putDcDiff(v3 - pred(c))
      pred(c) = v3
    }
    // --- scans 2-4: DC refinement, Ah -> Al descending to 0; one RAW
    // bit per block = the two's-complement bit Al of the quantized DC
    var al = 2
    while (al >= 0) {
      seg(0xDA, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0,
        ((al + 1) << 4) | al))
      bw = new BitWriter(out)
      val bitAl = al
      dcScanInterleaved { (c, by, bx) =>
        bw.put((qdc(c, by, bx) >> bitAl) & 1, 1)
      }
      al -= 1
    }
    // --- scans 5-7: per-component non-interleaved AC first scans,
    // Ss=1..Se=63, all-zero coefficients coded as EOBn runs (capped
    // at restart boundaries — an EOB run may never span one)
    var c = 0
    while (c < 3) {
      seg(0xDA, Array(1, c + 1, 0x00, 1, 63, 0))
      bw = new BitWriter(out)
      rst = 0
      val (hc, vc) = if (c == 0) (hs, vs) else (1, 1)
      val cwc = (w * hc + hs - 1) / hs
      val chc = (h * vc + vs - 1) / vs
      val blocks = ((cwc + 7) / 8) * ((chc + 7) / 8)
      var doneB = 0
      while (doneB < blocks) {
        val toBoundary =
          if (ri > 0) ri - (doneB % ri) else blocks - doneB
        var run = math.min(math.min(blocks - doneB, toBoundary), 32767)
        // EOBn encodes run = 2^r + ext with ext < 2^r
        var r = 0
        while ((1 << (r + 1)) <= run) r += 1
        run = math.min(run, (1 << (r + 1)) - 1)
        val (code, clen) = pacCodes(r << 4)
        bw.put(code, clen)
        if (r > 0) bw.put(run - (1 << r), r)
        doneB += run
        if (ri > 0 && doneB < blocks && doneB % ri == 0) {
          bw.flushWithOnes()
          marker(0xD0 + (rst & 7))
          rst += 1
        }
      }
      bw.flushWithOnes()
      c += 1
    }
    marker(0xD9) // EOI
    out.toByteArray
  }

  /** Progressive 4:2:0 + restart-interval synthesis at neutral
    * chroma — the real-world web-photo shape end to end; see
    * [[synthProg]]. */
  def synthProgressive420(seed: Long, width: Long, height: Long,
                          ri: Long): Array[Byte] =
    synthProg(seed, width, height, 2, 2, ri.toInt, 128, 128)
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

/** Native expression `graft_fake_jpeg_prog420(seed, w, h,
  * restartInterval)` — PROGRESSIVE (SOF2) 4:2:0 sibling of
  * [[FakeJpeg420]], same decoded image through a seven-scan
  * successive-approximation script; see
  * [[JpegFn.synthProgressive420]]. */
case class FakeJpegProg420(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_jpeg_prog420 expects (bigint, bigint, bigint, " +
        "bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_jpeg_prog420"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, ri: Any): Any =
    JpegFn.synthProgressive420(asLong(s), asLong(w), asLong(h),
      asLong(ri))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, ri) =>
      s"${ev.value} = etlmudah.expr.JpegFn.synthProgressive420(" +
        s"(long)$s, (long)$w, (long)$h, (long)$ri);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeJpegProg420 = FakeJpegProg420(f, s, t, q)
}
