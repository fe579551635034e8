package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL TIFF pixel decode — baseline TIFF 6.0 RGB (the scanner/
  * archival sibling of the web formats): BOTH byte orders (II
  * little-endian and MM big-endian — the SAME image bytes walk two
  * entirely different multi-byte readers), 8-bit chunky RGB, strips
  * uncompressed, §13 LZW (with the §14 horizontal-differencing
  * predictor) or §9 PackBits. TIFF's LZW is MSB-first with the
  * EARLY code-width change — the exact counterpoint to GIF's late
  * convention (`Gif.scala`), which is why the two decoders cannot
  * share a table walk. Extends the real-pixel tier and feeds the
  * same cross-format perceptual-hash dedup grid as
  * BMP/PNG/GIF/JPEG.
  *
  * Reference surface: the image-ingest slice of the multimodal
  * substitution (`multimodal/Multimodal.scala:10-16`); the header
  * IFD walk already existed as a column expression (width/height
  * only) — this is the full pixel tier.
  *
  * Accept contract (the BMP `parse` discipline — every gate runs
  * before any pixel read): II*\0 or MM\0* magic, one IFD walked
  * entry by entry with the TIFF 6.0 ASCENDING-TAG requirement
  * enforced (a shuffled directory is malformed, not merely odd),
  * ImageWidth/ImageLength gated individually and as a product
  * BEFORE any allocation, BitsPerSample exactly [8,8,8],
  * SamplesPerPixel 3, PhotometricInterpretation 2 (RGB),
  * Compression in {1, 5, 32773} (Predictor 2 accepted for LZW only,
  * per the spec's placement), PlanarConfiguration 1 (chunky) if
  * present, and the strip ledger covering the image EXACTLY:
  * StripOffsets/StripByteCounts equal length, each strip counting
  * its stored bytes and DECOMPRESSING to exactly rows × 3w (LZW
  * must also end in EOI; a short, long, or desynced stream nulls),
  * every range in bounds. TIFF has no checksum, so hostile fixtures
  * corrupt STRUCTURE (the JPEG discipline). Anything off-contract
  * yields null, never a partial statistic.
  *
  * Orientation: TIFF rows are stored top-down (row 0 is the visual
  * top); stats/ahash/transcode follow the [[PngFn]] conventions
  * verbatim, so one picture hashes identically across BMP, PNG,
  * GIF, JPEG and both TIFF byte orders.
  */
object TiffFn {

  /** Decoded image: interleaved RGB rows, top-down visual order. */
  private[expr] final class Decoded(val w: Int, val h: Int,
                                    val rgb: Array[Byte])

  private[expr] def decode(bytes: Array[Byte],
                           maxPixels: Int): Decoded = {
    if (bytes.length < 8) return null
    def u8(i: Int): Int = bytes(i) & 0xFF
    val le =
      if (u8(0) == 0x49 && u8(1) == 0x49 && u8(2) == 0x2A &&
        u8(3) == 0) true
      else if (u8(0) == 0x4D && u8(1) == 0x4D && u8(2) == 0 &&
        u8(3) == 0x2A) false
      else return null
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > bytes.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8)
      else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > bytes.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1) << 16) |
        (u8(i + 2) << 8) | u8(i + 3)
    val ifdOff = u32(4)
    if (ifdOff < 8L || ifdOff + 2 > bytes.length) return null
    val ifd = ifdOff.toInt
    val nEntries = u16(ifd)
    if (nEntries < 1 || ifd + 2 + nEntries * 12 + 4 > bytes.length)
      return null
    // tag values we accept; -1 = unseen
    var width = -1L; var height = -1L
    var compression = 1L; var photometric = -1L
    var samplesPerPx = 1L; var rowsPerStrip = -1L
    var planar = 1L; var predictor = 1L
    var bpsOk = false
    var stripOffTags: (Int, Int, Int) = null // (type, count, valOff)
    var stripCntTags: (Int, Int, Int) = null
    var prevTag = -1
    var e = 0
    while (e < nEntries) {
      val d = ifd + 2 + e * 12
      val tag = u16(d)
      val typ = u16(d + 2)
      val cnt = u32(d + 4)
      if (tag <= prevTag) return null // 6.0: ascending tag order
      prevTag = tag
      if (cnt < 1L || cnt > (1L << 20)) return null
      // scalar readers: SHORT(3) and LONG(4) values are
      // left-justified in the 4-byte value field in BOTH orders
      def scalar(): Long =
        if (cnt != 1L) -1L
        else if (typ == 3) u16(d + 8).toLong
        else if (typ == 4) u32(d + 8)
        else -1L
      tag match {
        case 256 => width = scalar()
        case 257 => height = scalar()
        case 258 =>
          // exactly three 8-bit samples: count 3 SHORTs never fit
          // inline, so the value field is an offset
          if (typ != 3 || cnt != 3L) return null
          val p = u32(d + 8)
          if (p < 0L || p + 6 > bytes.length) return null
          bpsOk = u16(p.toInt) == 8 && u16(p.toInt + 2) == 8 &&
            u16(p.toInt + 4) == 8
          if (!bpsOk) return null
        case 259 => compression = scalar()
        case 262 => photometric = scalar()
        case 273 =>
          if (typ != 3 && typ != 4) return null
          stripOffTags = (typ, cnt.toInt, d + 8)
        case 277 => samplesPerPx = scalar()
        case 278 => rowsPerStrip = scalar()
        case 279 =>
          if (typ != 3 && typ != 4) return null
          stripCntTags = (typ, cnt.toInt, d + 8)
        case 284 => planar = scalar()
        case 317 => predictor = scalar()
        case _ => () // unknown tags skipped (walk already bounded)
      }
      e += 1
    }
    if (width < 1L || height < 1L ||
      width > maxPixels || height > maxPixels ||
      width * height > maxPixels) return null
    // compression: 1 none, 5 LZW (§13, EARLY code-width change),
    // 32773 PackBits (§9); predictor 2 (horizontal differencing,
    // §14) is LZW-only per the spec's placement
    if (!bpsOk ||
      (compression != 1L && compression != 5L &&
        compression != 32773L) ||
      photometric != 2L || samplesPerPx != 3L || planar != 1L)
      return null
    if (predictor != 1L &&
      !(predictor == 2L && compression == 5L)) return null
    if (stripOffTags == null || stripCntTags == null) return null
    val w = width.toInt
    val h = height.toInt
    val rps =
      if (rowsPerStrip < 1L || rowsPerStrip > h) h
      else rowsPerStrip.toInt
    val nStrips = (h + rps - 1) / rps
    if (stripOffTags._2 != nStrips || stripCntTags._2 != nStrips)
      return null
    // array-valued tag reader: k==1 inline, else pointer
    def arr(t: (Int, Int, Int)): Array[Long] = {
      val (typ, cnt, valOff) = t
      val sz = if (typ == 3) 2 else 4
      val base =
        if (cnt.toLong * sz <= 4L) valOff.toLong
        else u32(valOff)
      if (base < 0L || base + cnt.toLong * sz > bytes.length)
        return null
      val out = new Array[Long](cnt)
      var i = 0
      while (i < cnt) {
        out(i) =
          if (typ == 3) u16((base + i * 2).toInt).toLong
          else u32((base + i * 4).toInt)
        if (out(i) < 0L) return null
        i += 1
      }
      out
    }
    val offs = arr(stripOffTags)
    val cnts = arr(stripCntTags)
    if (offs == null || cnts == null) return null
    val rgb = new Array[Byte](3 * w * h)
    var row = 0
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - row)
      val expect = rows * 3 * w
      if (offs(s) < 8L ||
        offs(s) + cnts(s) > bytes.length) return null
      val srcOff = offs(s).toInt
      val srcLen = cnts(s).toInt
      val dst = row * 3 * w
      compression match {
        case 1L =>
          if (srcLen != expect) return null // ledger covers EXACTLY
          System.arraycopy(bytes, srcOff, rgb, dst, expect)
        case 5L =>
          if (!lzwStrip(bytes, srcOff, srcLen, rgb, dst, expect))
            return null
        case _ => // 32773 PackBits
          if (!packBitsStrip(bytes, srcOff, srcLen, rgb, dst, expect))
            return null
      }
      // §14 horizontal differencing: undo per row, per component —
      // each byte is a delta against the same channel one pixel left
      if (predictor == 2L) {
        var r = 0
        while (r < rows) {
          val base = dst + r * 3 * w
          var i = 3
          while (i < 3 * w) {
            rgb(base + i) =
              ((rgb(base + i) + rgb(base + i - 3)) & 0xFF).toByte
            i += 1
          }
          r += 1
        }
      }
      row += rows
      s += 1
    }
    new Decoded(w, h, rgb)
  }

  /** TIFF §13 LZW over one strip: MSB-first bit packing, 256=Clear /
    * 257=EOI, 9-bit initial width, and the EARLY code-width change
    * (the width bumps when the NEXT code to be added would not fit —
    * at table sizes 511/1023/2047, one entry BEFORE the power of
    * two; TIFF 6.0: "the compressor always increments the code size
    * one code early") — the exact counterpoint to GIF's late
    * convention (`Gif.scala`), which is why the two decoders cannot
    * share a table walk. Output must land on EXACTLY `expect` bytes
    * and end with EOI. */
  private[expr] def lzwStrip(bytes: Array[Byte], off: Int, len: Int,
                       out: Array[Byte], dst: Int,
                       expect: Int): Boolean = {
    var bitPos = 0L
    val bitEnd = len.toLong * 8
    var codeLen = 9
    def read(): Int = {
      if (bitPos + codeLen > bitEnd) return -1
      var v = 0
      var i = 0
      while (i < codeLen) {
        val bp = bitPos + i
        val b = bytes(off + (bp >> 3).toInt) & 0xFF
        v = (v << 1) | ((b >> (7 - (bp & 7).toInt)) & 1)
        i += 1
      }
      bitPos += codeLen
      v
    }
    // string table: per-entry (prefix code, appended byte); 256
    // singles + Clear/EOI; capacity 4096 like every LZW
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var size = 258
    codeLen = 9
    var prev = -1
    var got = 0
    def emit(code: Int): Boolean = {
      // walk the chain into a scratch, then copy forward
      var n = 0
      var c = code
      while (c >= 258) {
        c = prefix(c); n += 1
        if (n > 4096) return false // cycle guard
      }
      val total = n + 1
      if (got + total > expect) return false
      var w = got + total - 1
      c = code
      while (c >= 258) {
        out(dst + w) = append(c); w -= 1; c = prefix(c)
      }
      out(dst + w) = c.toByte
      got += total
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= 258) c = prefix(c)
      c.toByte
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return false
      if (code == 256) { // Clear: reset table AND width
        size = 258; codeLen = 9; prev = -1
      } else if (code == 257) { // EOI
        done = true
      } else if (prev == -1) {
        if (code >= 256) return false // first code must be a literal
        if (!emit(code)) return false
        prev = code
      } else {
        if (code > size || (code >= 256 && code < 258)) return false
        if (code == size) { // KwKwK
          if (size >= 4096) return false
          prefix(size) = prev; append(size) = firstByte(prev)
          size += 1
          if (!emit(code)) return false
        } else {
          if (!emit(code)) return false
          if (size < 4096) {
            prefix(size) = prev; append(size) = firstByte(code)
            size += 1
          }
        }
        prev = code
      }
      // EARLY change, decoder side: the spec's literal 510/1022/2046
      // (TIFF 6.0 §13 pseudocode) — one entry BEFORE the encoder's
      // own early bump at 511/1023/2047, because the decoder's table
      // lags the encoder's by exactly one entry when a code is read
      if (!done && size == (1 << codeLen) - 2 && codeLen < 12)
        codeLen += 1
    }
    got == expect
  }

  /** TIFF §9 PackBits over one strip: n in [0,127] copies n+1
    * literals, n in [-127,-1] repeats the next byte 1-n times, -128
    * is a no-op. Output must land on EXACTLY `expect` bytes with the
    * input fully consumed. */
  private[expr] def packBitsStrip(bytes: Array[Byte], off: Int, len: Int,
                            out: Array[Byte], dst: Int,
                            expect: Int): Boolean = {
    var p = off
    val end = off + len
    var got = 0
    while (p < end) {
      val n = bytes(p); p += 1
      if (n >= 0) {
        val cnt = n + 1
        if (p + cnt > end || got + cnt > expect) return false
        System.arraycopy(bytes, p, out, dst + got, cnt)
        p += cnt; got += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (p >= end || got + cnt > expect) return false
        val v = bytes(p); p += 1
        var i = 0
        while (i < cnt) { out(dst + got + i) = v; i += 1 }
        got += cnt
      }
    }
    got == expect
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

  /** Perceptual average hash, IDENTICAL grid/packing/orientation to
    * [[PngFn.ahash]] (both containers store rows top-down), so a
    * picture hashes the same across every format tier. */
  def ahash(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val d = decode(bytes, maxPixels)
    if (d == null) return null
    val cell = new Array[Long](64)
    var total = 0L
    var gi = 0
    while (gi < 8) {
      val v = d.h - 1 - gi * d.h / 8
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

  /** Transcode to the canonical bottom-up 24bpp BMP (the
    * [[PngFn.toBmp24]] convention), composing the BMP kernel family
    * onto TIFF inputs. */
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
    putLe32(22, d.h.toLong)
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
        out(row + c * 3) = d.rgb(p + 2)
        out(row + c * 3 + 1) = d.rgb(p + 1)
        out(row + c * 3 + 2) = d.rgb(p)
        c += 1
      }
      fr += 1
    }
    out
  }

  /** Synthesize a COMPLETE baseline TIFF carrying the
    * [[JpegFn.blockVal]] gray closed form at `seed` — the
    * [[BmpPixelStatsFn.synthBlocks]] visual image, so BMP/TIFF pairs
    * land in one dedup group and the q338 hash replay applies
    * unchanged. `mode` selects byte order AND compression (low bit =
    * MM big-endian): 0/1 uncompressed, 2/3 LZW with the §14
    * horizontal-differencing predictor (the compressor implements
    * the §13 EARLY code-width change and emits Clear on a full
    * table), 4/5 PackBits (runs encoded per row — the spec's
    * row-boundary convention). Strips are REAL: rows split 5 per
    * strip (last short), per-strip compressed byte counts in the
    * ledger; the IFD sits after the data with tags in the required
    * ascending order. */
  def synth(seed: Long, width: Long, height: Long,
            mode: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake TIFF dims out of range: ${width}x$height")
    require(mode >= 0L && mode <= 5L,
      s"fake TIFF mode out of range: $mode")
    val w = width.toInt
    val h = height.toInt
    val be = (mode & 1L) != 0L
    val comp = (mode >> 1).toInt // 0 none, 1 LZW+pred2, 2 PackBits
    val rps = 5
    val nStrips = (h + rps - 1) / rps
    // raw pixel rows, top-down
    val raw = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var c = 0
      while (c < w) {
        val g = JpegFn.blockVal(seed, y / 8, c / 8).toByte
        val p = (y * w + c) * 3
        raw(p) = g; raw(p + 1) = g; raw(p + 2) = g
        c += 1
      }
      y += 1
    }
    // per-strip payloads
    val payloads = new Array[Array[Byte]](nStrips)
    var s = 0
    var row = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - row)
      val strip = new Array[Byte](rows * 3 * w)
      System.arraycopy(raw, row * 3 * w, strip, 0, strip.length)
      payloads(s) = comp match {
        case 0 => strip
        case 1 =>
          // §14 differencing per row/channel, then §13 LZW
          var r = 0
          while (r < rows) {
            val base = r * 3 * w
            var i = 3 * w - 1
            while (i >= 3) {
              strip(base + i) =
                ((strip(base + i) - strip(base + i - 3)) & 0xFF).toByte
              i -= 1
            }
            r += 1
          }
          lzwCompress(strip)
        case _ => packBitsCompress(strip, 3 * w)
      }
      row += rows
      s += 1
    }
    val pixBytes = payloads.map(_.length).sum
    // layout: header(8) | payloads | bps(6) | offs | cnts | IFD
    val stripArrSz = if (nStrips == 1) 0 else nStrips * 4
    val bpsOff = 8 + pixBytes
    val offsOff = bpsOff + 6
    val cntsOff = offsOff + stripArrSz
    val ifdOff = cntsOff + stripArrSz
    val nTags = if (comp == 1) 11 else 10
    val out = new Array[Byte](ifdOff + 2 + nTags * 12 + 4)
    def p16(i: Int, v: Int): Unit =
      if (be) { out(i) = (v >> 8).toByte; out(i + 1) = v.toByte }
      else { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def p32(i: Int, v: Long): Unit =
      if (be) {
        out(i) = (v >> 24).toByte; out(i + 1) = (v >> 16).toByte
        out(i + 2) = (v >> 8).toByte; out(i + 3) = v.toByte
      } else {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      }
    if (be) { out(0) = 0x4D; out(1) = 0x4D; out(2) = 0; out(3) = 0x2A }
    else { out(0) = 0x49; out(1) = 0x49; out(2) = 0x2A; out(3) = 0 }
    p32(4, ifdOff.toLong)
    var off = 8
    s = 0
    while (s < nStrips) {
      System.arraycopy(payloads(s), 0, out, off, payloads(s).length)
      if (nStrips > 1) {
        p32(offsOff + s * 4, off.toLong)
        p32(cntsOff + s * 4, payloads(s).length.toLong)
      }
      off += payloads(s).length
      s += 1
    }
    p16(bpsOff, 8); p16(bpsOff + 2, 8); p16(bpsOff + 4, 8)
    p16(ifdOff, nTags)
    var t = ifdOff + 2
    def tag(id: Int, typ: Int, cnt: Long, value: Long): Unit = {
      p16(t, id); p16(t + 2, typ); p32(t + 4, cnt)
      if (typ == 3 && cnt == 1L) p16(t + 8, value.toInt)
      else p32(t + 8, value)
      t += 12
    }
    val compTag = comp match {
      case 0 => 1L
      case 1 => 5L
      case _ => 32773L
    }
    tag(256, 4, 1L, w.toLong)              // ImageWidth
    tag(257, 4, 1L, h.toLong)              // ImageLength
    tag(258, 3, 3L, bpsOff.toLong)         // BitsPerSample -> [8,8,8]
    tag(259, 3, 1L, compTag)               // Compression
    tag(262, 3, 1L, 2L)                    // Photometric: RGB
    if (nStrips == 1) tag(273, 4, 1L, 8L)  // StripOffsets inline
    else tag(273, 4, nStrips.toLong, offsOff.toLong)
    tag(277, 3, 1L, 3L)                    // SamplesPerPixel
    tag(278, 3, 1L, rps.toLong)            // RowsPerStrip
    if (nStrips == 1) tag(279, 4, 1L, payloads(0).length.toLong)
    else tag(279, 4, nStrips.toLong, cntsOff.toLong)
    tag(284, 3, 1L, 1L)                    // PlanarConfig: chunky
    if (comp == 1) tag(317, 3, 1L, 2L)     // Predictor: differencing
    p32(t, 0L)                             // no next IFD
    out
  }

  /** §13 LZW COMPRESSOR (the synth side): greedy longest-match
    * against a hash of (prefixCode, byte) pairs, MSB-first bit
    * packing, EARLY width change (a code is written with the width
    * in force AFTER the table grew past 2^len−2 — "one code early"),
    * Clear emitted when the table fills, EOI to close. */
  private[expr] def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    var codeLen = 9
    def put(code: Int): Unit = {
      acc = (acc << codeLen) | code
      nBits += codeLen
      while (nBits >= 8) {
        out.write(((acc >> (nBits - 8)) & 0xFF).toInt)
        nBits -= 8
      }
    }
    def flush(): Unit =
      if (nBits > 0) { out.write(((acc << (8 - nBits)) & 0xFF).toInt); nBits = 0 }
    // table: map (prefix, byte) -> code via open addressing
    val cap = 1 << 13
    val keys = new Array[Long](cap)
    val vals = new Array[Int](cap)
    java.util.Arrays.fill(keys, -1L)
    var size = 258
    def clearTable(): Unit = {
      java.util.Arrays.fill(keys, -1L); size = 258
    }
    def find(prefixCode: Int, b: Int): Int = {
      val key = (prefixCode.toLong << 8) | b
      var i = ((key * 0x9E3779B97F4A7C15L) >>> 51).toInt & (cap - 1)
      while (keys(i) != -1L) {
        if (keys(i) == key) return vals(i)
        i = (i + 1) & (cap - 1)
      }
      -1
    }
    def insert(prefixCode: Int, b: Int): Unit = {
      val key = (prefixCode.toLong << 8) | b
      var i = ((key * 0x9E3779B97F4A7C15L) >>> 51).toInt & (cap - 1)
      while (keys(i) != -1L) i = (i + 1) & (cap - 1)
      keys(i) = key; vals(i) = size
      size += 1
    }
    put(256) // spec: strips begin with Clear
    var prefixCode = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (prefixCode == -1) prefixCode = b
      else {
        val nxt = find(prefixCode, b)
        if (nxt >= 0) prefixCode = nxt
        else {
          put(prefixCode)
          insert(prefixCode, b)
          // EARLY change: the width the DECODER switches to after
          // mirroring this add is the width for the NEXT code
          if (size == (1 << codeLen) - 1 && codeLen < 12) codeLen += 1
          if (size >= 4094) { // table nearly full: Clear and restart
            put(256)
            clearTable(); codeLen = 9
          }
          prefixCode = b
        }
      }
      i += 1
    }
    if (prefixCode != -1) {
      put(prefixCode)
      if (size == (1 << codeLen) - 1 && codeLen < 12) codeLen += 1
    }
    put(257) // EOI
    flush()
    out.toByteArray
  }

  /** §9 PackBits COMPRESSOR, runs never crossing row boundaries
    * (`rowBytes` per row): literal runs up to 128, repeat runs up to
    * 128. */
  private[expr] def packBitsCompress(data: Array[Byte],
                                     rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var rowStart = 0
    while (rowStart < data.length) {
      val rowEnd = math.min(rowStart + rowBytes, data.length)
      var p = rowStart
      while (p < rowEnd) {
        // measure the repeat run at p
        var q = p + 1
        while (q < rowEnd && data(q) == data(p) && q - p < 128) q += 1
        val run = q - p
        if (run >= 2) {
          out.write(1 - run) // -(run-1)
          out.write(data(p) & 0xFF)
          p = q
        } else {
          // literal run: until the next >=3 repeat or 128 bytes
          var r = p + 1
          var litEnd = rowEnd
          while (r + 2 < rowEnd && litEnd == rowEnd) {
            if (data(r) == data(r + 1) && data(r) == data(r + 2))
              litEnd = r
            else r += 1
          }
          val lit = math.min(litEnd - p, 128)
          out.write(lit - 1)
          out.write(data, p, lit)
          p += lit
        }
      }
      rowStart = rowEnd
    }
    out.toByteArray
  }
}

/** Native expression `graft_tiff_stats(binary[, maxPixels])` — see
  * [[TiffFn.stats]]. */
case class TiffPixelStats(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tiff_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = PngFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_stats"

  override def nullSafeEval(input: Any): Any =
    TiffFn.stats(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.TiffFn.stats($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): TiffPixelStats = copy(child = newChild)
}

/** Native expression `graft_tiff_ahash(binary[, maxPixels])` — see
  * [[TiffFn.ahash]]. */
case class TiffAHash(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tiff_ahash expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_ahash"

  override def nullSafeEval(input: Any): Any =
    TiffFn.ahash(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.TiffFn.ahash($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): TiffAHash = copy(child = newChild)
}

/** Native expression `graft_tiff_to_bmp24(binary[, maxPixels])` — see
  * [[TiffFn.toBmp24]]. */
case class TiffToBmp24(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tiff_to_bmp24 expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tiff_to_bmp24"

  override def nullSafeEval(input: Any): Any =
    TiffFn.toBmp24(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.TiffFn.toBmp24($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): TiffToBmp24 = copy(child = newChild)
}

/** Native fixture generator `graft_fake_tiff(seed, w, h, bigEndian)`
  * — see [[TiffFn.synth]]. */
case class FakeTiff(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_tiff expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_tiff"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, e: Any): Any =
    TiffFn.synth(asLong(s), asLong(w), asLong(h), asLong(e))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, e) =>
      s"${ev.value} = etlmudah.expr.TiffFn.synth((long)$s, " +
        s"(long)$w, (long)$h, (long)$e);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeTiff = FakeTiff(f, s, t, q)
}
