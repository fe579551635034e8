package etlmudah.expr

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL PNG pixel decode for the dominant web image format — ALL
  * FIVE sample layouts (RFC 2083 §4.1.1: color type 0 grayscale, 2
  * truecolor, 3 palette-indexed, 4 grayscale+alpha, 6 truecolor+
  * alpha) at bit depth 8 AND — for the non-palette layouts — bit
  * depth 16, sequential OR Adam7-interlaced, which is pure
  * JDK machinery: IDAT is a zlib stream (`java.util.zip.Inflater`, the
  * same class `compressionRatio` already leans on) and the per-
  * scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) reverse
  * with byte arithmetic at the layout's bytes-per-pixel. Extends the
  * real-pixel tier (BMP 24bpp, `Bmp.scala`) from the uncompressed
  * family to a COMPRESSED one, and feeds the same cross-format
  * perceptual-hash dedup grid.
  *
  * Reference surface: the image-ingest slice of the multimodal
  * substitution (`multimodal/Multimodal.scala:10-16`); the decoders
  * here replace the stub for this family the way `BmpPixelStatsFn`
  * did for BI_RGB.
  *
  * Accept contract (the BMP `parse` discipline — every gate runs
  * before any pixel read): 8-byte signature, chunk walk with length/
  * CRC32 verification on EVERY chunk, IHDR first with bit depth 8 /
  * color type in {0,2,3,4,6} / compression 0 / filter 0 / interlace
  * 0 or 1 (Adam7: seven independently-filtered pass sub-images, RFC
  * 2083 §8.2 — a pure pixel permutation of the sequential layout,
  * empty passes contributing no bytes), positive dims with w*h <=
  * maxPixels (gated BEFORE inflating, so a hostile IHDR cannot
  * zip-bomb), IDAT inflating to EXACTLY the per-layout filtered
  * volume, IEND present. Palette discipline per §4.1.2: color type 3
  * REQUIRES one PLTE before the first IDAT (length a positive
  * multiple of 3, <= 256 entries; any index past the last entry
  * nulls the image); PLTE is FORBIDDEN for color types 0/4; for
  * types 2/6 a well-formed PLTE is the spec's optional suggested-
  * quantization palette — CRC-checked then ignored. 16-bit samples
  * are big-endian (§2.1); filters reverse at the byte stride (§6.2:
  * bpp is BYTES per complete pixel) and the canonical 8-bit readout
  * takes each sample's HIGH byte — libpng's default reduction
  * (png_set_strip_16), exact whenever the low byte repeats the high
  * one (v = L·257, where strip and scale-by-255/65535 agree); a
  * 16-bit palette claim is illegal per §4.1.1 and nulls. Anything
  * else — truncated blob, depths other than 8/16, CRC mismatch,
  * short or over-long inflate, a truncated interlace pass,
  * duplicate/misplaced PLTE — yields null, never a partial
  * statistic.
  *
  * Alpha convention (types 4/6): PNG samples are NON-premultiplied
  * (§10.8), so the color channels are well-defined without
  * compositing; the 24bpp canonical readout takes them as stored and
  * DROPS alpha — the exact, lossless-for-color choice (compositing
  * against a background would destroy channel closed forms). tRNS is
  * ancillary and skipped like every other ancillary chunk, which is
  * consistent with the same convention (it only adds alpha).
  *
  * Orientation convention: PNG file order is visual top-down; the
  * perceptual hash is defined over the VISUAL image with the
  * `BmpPixelStatsFn.ahash` convention (grid row gi samples visual row
  * h-1-gi*h/8), so the same picture hashes IDENTICALLY whether it
  * arrived as a PNG or as a (bottom-up or top-down) 24bpp BMP —
  * cross-format near-dup groups just work (pinned by PngSpec and the
  * q305 oracle).
  */
object PngFn {

  /** Output schema — the q224 stats family in the format's native
    * channel order (PNG stores R,G,B). */
  val schema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("r_min", IntegerType), StructField("r_max", IntegerType),
    StructField("r_sum", LongType), StructField("r_mean", DoubleType),
    StructField("g_min", IntegerType), StructField("g_max", IntegerType),
    StructField("g_sum", LongType), StructField("g_mean", DoubleType),
    StructField("b_min", IntegerType), StructField("b_max", IntegerType),
    StructField("b_sum", LongType), StructField("b_mean", DoubleType)))

  private val SIG = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  /** Decoded image: interleaved RGB rows, top-down visual order,
    * 3*w bytes per row (no filter bytes, no padding). */
  private[expr] final class Decoded(val w: Int, val h: Int,
                                    val rgb: Array[Byte])

  /** Full accept gate + inflate + unfilter; null unless EXACTLY
    * decodable (see object doc). */
  private[expr] def decode(bytes: Array[Byte],
                           maxPixels: Int): Decoded = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)
    if (bytes.length < 8) return null
    var k = 0
    while (k < 8) { if (u8(k) != SIG(k)) return null; k += 1 }
    // chunk walk: bounds-check every read; verify every CRC
    var pos = 8
    var w = 0; var h = 0
    var colorType = -1; var bpp = 0; var deep = false
    var adam7 = false
    var sawIhdr = false; var sawIend = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32()
    while (!sawIend) {
      if (pos + 8 > bytes.length) return null
      val len = be32(pos)
      if (len < 0L || len > Int.MaxValue - 12 ||
        pos + 12 + len > bytes.length) return null
      val l = len.toInt
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(bytes, pos + 4, 4 + l)
      if (crc.getValue != be32(pos + 8 + l)) return null
      if (!sawIhdr) {
        if (typ != "IHDR" || l != 13) return null
        val d = pos + 8
        val ww = be32(d); val hh = be32(d + 4)
        val bitDepth = u8(d + 8); colorType = u8(d + 9)
        val comp = u8(d + 10); val filt = u8(d + 11)
        val interlace = u8(d + 12)
        // gate each dim BEFORE the multiply: ww/hh are unsigned-32
        // Longs (to 2^32-1) and ww*hh can overflow Long negative,
        // bypassing the pixel cap (then rowBytes*h Int math wraps)
        if (ww < 1L || hh < 1L ||
          ww > maxPixels || hh > maxPixels || ww * hh > maxPixels ||
          (bitDepth != 8 && bitDepth != 16) || comp != 0 || filt != 0 ||
          interlace > 1) return null
        deep = bitDepth == 16
        bpp = colorType match {
          case 0 => 1 // grayscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette index
          case 4 => 2 // grayscale + alpha
          case 6 => 4 // truecolor + alpha
          case _ => return null
        }
        // §4.1.1: palette indices exist only at depths 1/2/4/8 — a
        // 16-bit type-3 claim is illegal, not merely unsupported
        if (deep && colorType == 3) return null
        if (deep) bpp *= 2 // filter stride is BYTES per pixel (§6.2)
        w = ww.toInt; h = hh.toInt
        adam7 = interlace == 1
        sawIhdr = true
      } else typ match {
        case "IDAT" => idat.write(bytes, pos + 8, l)
        case "PLTE" =>
          // §4.1.2: one PLTE, before the first IDAT, 1..256 entries;
          // forbidden for grayscale layouts; for 2/6 it's the
          // optional suggested-quantization palette (checked above
          // for CRC like every chunk, then ignored)
          if (plte != null || idat.size() > 0 ||
            l < 3 || l > 768 || l % 3 != 0 ||
            colorType == 0 || colorType == 4) return null
          plte = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + l)
        case "IEND" => if (l != 0) return null else sawIend = true
        case "IHDR" => return null
        case _ => () // ancillary chunks skipped (CRC already checked)
      }
      pos += 12 + l
    }
    if (colorType == 3 && plte == null) return null
    // inflate to EXACTLY the filtered-scanline volume (the maxPixels
    // gate above bounds this allocation): one filter byte per
    // scanline — per PASS sub-image when Adam7-interlaced (empty
    // passes contribute no bytes at all, RFC 2083 §8.2)
    val rowBytes = 1 + bpp * w
    var filtLen = 0
    if (adam7) {
      var pass = 0
      while (pass < 7) {
        val pw = passW(w, pass)
        val ph = passH(h, pass)
        if (pw > 0 && ph > 0) filtLen += ph * (1 + bpp * pw)
        pass += 1
      }
    } else filtLen = rowBytes * h
    val filtered = new Array[Byte](filtLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inf.needsInput()) return null // short stream
        got += n
      }
      if (got != filtered.length) return null
      // a stream with MORE pixels than IHDR declared is malformed too
      if (!inf.finished() &&
        inf.inflate(new Array[Byte](1)) != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    val raw = new Array[Byte](bpp * w * h)
    if (!adam7) {
      if (!unfilter(filtered, 0, w, h, bpp, raw)) return null
    } else {
      // Adam7 (RFC 2083 §8.2): seven independently-filtered pass
      // sub-images; each unfilters against its OWN previous scanline,
      // then scatters to (ys + r*ystep, xs + c*xstep) — a pure pixel
      // permutation of the already-decoded data
      var off = 0
      var pass = 0
      while (pass < 7) {
        val pw = passW(w, pass)
        val ph = passH(h, pass)
        if (pw > 0 && ph > 0) {
          val sub = new Array[Byte](bpp * pw * ph)
          if (!unfilter(filtered, off, pw, ph, bpp, sub)) return null
          off += ph * (1 + bpp * pw)
          var r = 0
          while (r < ph) {
            val py = A7_YS(pass) + r * A7_YSTEP(pass)
            var c = 0
            while (c < pw) {
              val px = A7_XS(pass) + c * A7_XSTEP(pass)
              val d = (py * w + px) * bpp
              val sp = (r * pw + c) * bpp
              var ch = 0
              while (ch < bpp) { raw(d + ch) = sub(sp + ch); ch += 1 }
              c += 1
            }
            r += 1
          }
        }
        pass += 1
      }
    }
    // 16-bit depths reduce to 8 by taking each big-endian sample's
    // HIGH byte — libpng's default reduction (png_set_strip_16),
    // exact whenever the low byte repeats the high one (v = L*257,
    // where strip and scale-by-255/65535 agree); documented, not
    // silent: the stats tier is defined over the 8-bit canonical
    val raw8 = if (!deep) raw else {
      val half = new Array[Byte](raw.length / 2)
      var i = 0
      while (i < half.length) { half(i) = raw(2 * i); i += 1 }
      half
    }
    // expand the layout's samples to canonical interleaved RGB
    // (alpha dropped — see the object doc's alpha convention)
    val n = w * h
    val rgb = colorType match {
      case 2 => raw8
      case 0 =>
        val out = new Array[Byte](3 * n)
        var i = 0
        while (i < n) {
          val v = raw8(i)
          out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
          i += 1
        }
        out
      case 3 =>
        val entries = plte.length / 3
        val out = new Array[Byte](3 * n)
        var i = 0
        while (i < n) {
          val idx = raw8(i) & 0xFF
          if (idx >= entries) return null // §4.1.2: out-of-range index
          out(i * 3) = plte(idx * 3)
          out(i * 3 + 1) = plte(idx * 3 + 1)
          out(i * 3 + 2) = plte(idx * 3 + 2)
          i += 1
        }
        out
      case 4 =>
        val out = new Array[Byte](3 * n)
        var i = 0
        while (i < n) {
          val v = raw8(i * 2)
          out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
          i += 1
        }
        out
      case _ => // 6: RGBA
        val out = new Array[Byte](3 * n)
        var i = 0
        while (i < n) {
          out(i * 3) = raw8(i * 4)
          out(i * 3 + 1) = raw8(i * 4 + 1)
          out(i * 3 + 2) = raw8(i * 4 + 2)
          i += 1
        }
        out
    }
    new Decoded(w, h, rgb)
  }

  /** Adam7 pass geometry (RFC 2083 §8.2). */
  private val A7_XS = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7_YS = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7_XSTEP = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7_YSTEP = Array(8, 8, 8, 4, 4, 2, 2)
  private def passW(w: Int, p: Int): Int =
    if (w > A7_XS(p)) (w - A7_XS(p) + A7_XSTEP(p) - 1) / A7_XSTEP(p) else 0
  private def passH(h: Int, p: Int): Int =
    if (h > A7_YS(p)) (h - A7_YS(p) + A7_YSTEP(p) - 1) / A7_YSTEP(p) else 0

  /** Unfilter one (sub-)image of pw x ph scanlines starting at `off`
    * (RFC 2083 §6.4-6.9) at the layout's bytes-per-pixel; a = left,
    * b = up, c = upper-left, all from the RECONSTRUCTED bytes of the
    * SAME (sub-)image. */
  private def unfilter(filtered: Array[Byte], off: Int, pw: Int,
                       ph: Int, bpp: Int, out: Array[Byte]): Boolean = {
    val rowBytes = 1 + bpp * pw
    var v = 0
    while (v < ph) {
      val ft = filtered(off + v * rowBytes) & 0xFF
      if (ft > 4) return false
      val src = off + v * rowBytes + 1
      val dst = v * bpp * pw
      val prev = dst - bpp * pw
      var i = 0
      while (i < bpp * pw) {
        val x = filtered(src + i) & 0xFF
        val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
        val b = if (v > 0) out(prev + i) & 0xFF else 0
        val c = if (v > 0 && i >= bpp) out(prev + i - bpp) & 0xFF else 0
        val rec = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a
                 else if (pb <= pc) b else c)
        }
        out(dst + i) = (rec & 0xFF).toByte
        i += 1
      }
      v += 1
    }
    true
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
    * [[BmpPixelStatsFn.ahash]] (brightness = R+G+B is channel-order-
    * free; grid row gi samples VISUAL row h-1-gi*h/8 — see the
    * orientation note in the object doc), so PNG and BMP encodings of
    * one picture land in one dedup group. */
  def ahash(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val d = decode(bytes, maxPixels)
    if (d == null) return null
    val cell = new Array[Long](64)
    var total = 0L
    var gi = 0
    while (gi < 8) {
      val v = d.h - 1 - gi * d.h / 8   // visual-hash convention
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

  /** TRANSCODE to a canonical bottom-up BI_RGB 24bpp BMP (visual
    * image preserved: BMP file row fr takes PNG row h-1-fr, channels
    * reordered RGB -> BGR). Composes the whole BMP kernel family onto
    * PNG inputs: resize, stats, ahash — `graft_bmp_resize(
    * graft_png_to_bmp24(x), f)` is the PNG thumbnail path. Null iff
    * the PNG is not exactly decodable. */
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
    putLe32(22, d.h.toLong)       // positive = bottom-up
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

  /** Synthesize a COMPLETE non-interlaced 8-bit truecolor PNG whose
    * VISUAL image equals `BmpPixelStatsFn.synth(seed, w, h)`'s: PNG
    * row v (top-down) carries the BMP's bottom-up file row h-1-v, so
    * with fr = h-1-v the channels are
    *
    *   R = floorMod(seed*13 + fr*7 + c*3, 256)
    *   G = floorMod(seed*11 + fr*5 + c*2, 256)
    *   B = floorMod(seed*7  + fr*3 + c,   256)
    *
    * — and every ORDER-INDEPENDENT statistic (sums/min/max over the
    * whole image) replays with the q224 oracle's formulas unchanged
    * (summing over fr is summing over v). Scanline v is filtered with
    * type v % 5, so a multi-row image exercises None, Sub, Up,
    * Average AND Paeth — the decode roundtrip proves all five filter
    * reversals, not just the trivial one. */
  def synth(seed: Long, width: Long, height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake PNG dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val raw = new Array[Byte](3 * w * h)   // RGB rows, top-down
    var v = 0
    while (v < h) {
      val fr = h - 1 - v
      var c = 0
      while (c < w) {
        val p = (v * w + c) * 3
        raw(p) = Math.floorMod(seed * 13 + fr * 7 + c * 3, 256L).toByte
        raw(p + 1) = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toByte
        raw(p + 2) = Math.floorMod(seed * 7 + fr * 3 + c, 256L).toByte
        c += 1
      }
      v += 1
    }
    // filter each scanline with type v % 5 (encode = raw minus the
    // predictor over RAW neighbors, RFC 2083 §6.3)
    val rowBytes = 1 + 3 * w
    val filtered = new Array[Byte](rowBytes * h)
    v = 0
    while (v < h) {
      val ft = v % 5
      filtered(v * rowBytes) = ft.toByte
      val dst = v * rowBytes + 1
      val src = v * 3 * w
      val prev = src - 3 * w
      var i = 0
      while (i < 3 * w) {
        val x = raw(src + i) & 0xFF
        val a = if (i >= 3) raw(src + i - 3) & 0xFF else 0
        val b = if (v > 0) raw(prev + i) & 0xFF else 0
        val cc = if (v > 0 && i >= 3) raw(prev + i - 3) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - cc
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
        }
        filtered(dst + i) = ((x - pred) & 0xFF).toByte
        i += 1
      }
      v += 1
    }
    val def1 = new Deflater()
    val zs = try {
      def1.setInput(filtered); def1.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def1.finished()) buf.write(tmp, 0, def1.deflate(tmp))
      buf.toByteArray
    } finally def1.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(x: Long): Array[Byte] = Array(
        ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
        ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", zs)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** ONE GRAY VISUAL IMAGE through any of the five 8-bit sample
    * layouts (colorType in {0,2,3,4,6}): luminance
    *
    *   L = floorMod(seed*11 + fr*5 + c*2, 256)   (fr = h-1-v)
    *
    * — [[synth]]'s G-channel formula — rendered as grayscale (type
    * 0), truecolor R=G=B=L (2), palette indices through an IDENTITY
    * grayscale PLTE entry j = (j,j,j) (3), gray+alpha (4) or RGBA
    * (6), with a varying alpha plane A = floorMod(seed*5 + fr*2 + c,
    * 256) on the alpha layouts (dropped by the canonical readout, so
    * EVERY layout decodes to the identical RGB image — one ahash, one
    * stats row, five byte streams). Scanline v is filtered with type
    * v % 5 at the layout's bpp, so all five filter reversals run at
    * every bytes-per-pixel. */
  def synthTyped(seed: Long, width: Long, height: Long,
                 colorType: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake PNG dims out of range: ${width}x$height")
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1
      case 4 => 2
      case 6 => 4
      case _ => throw new IllegalArgumentException(
        s"fake PNG color type must be one of 0/2/3/4/6: $colorType")
    }
    val w = width.toInt
    val h = height.toInt
    val raw = new Array[Byte](bpp * w * h) // layout samples, top-down
    var v = 0
    while (v < h) {
      val fr = h - 1 - v
      var c = 0
      while (c < w) {
        val lum = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toByte
        val alpha = Math.floorMod(seed * 5 + fr * 2 + c, 256L).toByte
        val p = (v * w + c) * bpp
        colorType match {
          case 0 => raw(p) = lum
          case 2 => raw(p) = lum; raw(p + 1) = lum; raw(p + 2) = lum
          case 3 => raw(p) = lum // identity gray palette: index == L
          case 4 => raw(p) = lum; raw(p + 1) = alpha
          case _ =>
            raw(p) = lum; raw(p + 1) = lum; raw(p + 2) = lum
            raw(p + 3) = alpha
        }
        c += 1
      }
      v += 1
    }
    // filter each scanline with type v % 5 at this layout's bpp
    val rowBytes = 1 + bpp * w
    val filtered = new Array[Byte](rowBytes * h)
    v = 0
    while (v < h) {
      val ft = v % 5
      filtered(v * rowBytes) = ft.toByte
      val dst = v * rowBytes + 1
      val src = v * bpp * w
      val prev = src - bpp * w
      var i = 0
      while (i < bpp * w) {
        val x = raw(src + i) & 0xFF
        val a = if (i >= bpp) raw(src + i - bpp) & 0xFF else 0
        val b = if (v > 0) raw(prev + i) & 0xFF else 0
        val cc = if (v > 0 && i >= bpp) raw(prev + i - bpp) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - cc
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
        }
        filtered(dst + i) = ((x - pred) & 0xFF).toByte
        i += 1
      }
      v += 1
    }
    val def1 = new Deflater()
    val zs = try {
      def1.setInput(filtered); def1.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def1.finished()) buf.write(tmp, 0, def1.deflate(tmp))
      buf.toByteArray
    } finally def1.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(x: Long): Array[Byte] = Array(
        ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
        ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    if (colorType == 3) {
      val p = new Array[Byte](768)
      var j = 0
      while (j < 256) {
        p(j * 3) = j.toByte; p(j * 3 + 1) = j.toByte
        p(j * 3 + 2) = j.toByte
        j += 1
      }
      chunk("PLTE", p)
    }
    chunk("IDAT", zs)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 16-BIT sibling of [[synthTyped]] (colorType in {0,2,4,6} — §4.1.1
    * forbids 16-bit palettes): the IDENTICAL gray visual image with
    * each 8-bit sample widened to the big-endian 16-bit value whose
    * HIGH byte is L and whose LOW byte is an independently varying
    * plane Lo = floorMod(seed*3 + fr + c*5, 256) — so the strip-16
    * readout reproduces the 8-bit legs exactly while the byte stream
    * genuinely exercises the doubled filter stride (scanline v again
    * filtered with type v % 5, now at 2·channels bytes per pixel). */
  def synth16(seed: Long, width: Long, height: Long,
              colorType: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake PNG dims out of range: ${width}x$height")
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => throw new IllegalArgumentException(
        s"fake 16-bit PNG color type must be one of 0/2/4/6: $colorType")
    }
    val bpp = channels * 2
    val w = width.toInt
    val h = height.toInt
    val raw = new Array[Byte](bpp * w * h) // big-endian 16-bit samples
    var v = 0
    while (v < h) {
      val fr = h - 1 - v
      var c = 0
      while (c < w) {
        val lum = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toByte
        val lo = Math.floorMod(seed * 3 + fr + c * 5, 256L).toByte
        val alpha = Math.floorMod(seed * 5 + fr * 2 + c, 256L).toByte
        val p = (v * w + c) * bpp
        // per-channel (hi, lo) pairs; alpha rides (alpha, lo)
        var ch = 0
        while (ch < channels) {
          val isAlpha = (colorType == 4 && ch == 1) ||
            (colorType == 6 && ch == 3)
          raw(p + ch * 2) = if (isAlpha) alpha else lum
          raw(p + ch * 2 + 1) = lo
          ch += 1
        }
        c += 1
      }
      v += 1
    }
    val rowBytes = 1 + bpp * w
    val filtered = new Array[Byte](rowBytes * h)
    v = 0
    while (v < h) {
      val ft = v % 5
      filtered(v * rowBytes) = ft.toByte
      val dst = v * rowBytes + 1
      val src = v * bpp * w
      val prev = src - bpp * w
      var i = 0
      while (i < bpp * w) {
        val x = raw(src + i) & 0xFF
        val a = if (i >= bpp) raw(src + i - bpp) & 0xFF else 0
        val b = if (v > 0) raw(prev + i) & 0xFF else 0
        val cc = if (v > 0 && i >= bpp) raw(prev + i - bpp) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - cc
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - cc)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
        }
        filtered(dst + i) = ((x - pred) & 0xFF).toByte
        i += 1
      }
      v += 1
    }
    val def1 = new Deflater()
    val zs = try {
      def1.setInput(filtered); def1.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def1.finished()) buf.write(tmp, 0, def1.deflate(tmp))
      buf.toByteArray
    } finally def1.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(x: Long): Array[Byte] = Array(
        ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
        ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 16; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    chunk("IDAT", zs)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // --- animated tier (APNG) ----------------------------------------

  /** Parsed APNG: canvas dims + per-frame zlib byte ranges
    * ((offset, len) pairs, flattened) — frame bodies are NOT
    * inflated here; the walk is O(bytes) and only the SAMPLED frame
    * pays the inflate (the [[AviFn]]/[[GifFn]] sampling
    * discipline). */
  private[expr] final class Apng(val w: Int, val h: Int,
                                 val frames: Array[Array[Int]])

  /** Accept gate for the ANIMATED tier — the FOURTH frame-sampling
    * container beside DIB-AVI, MJPEG-AVI and animated GIF: the
    * standard APNG chunk grammar (acTL before the first IDAT; one
    * fcTL per frame; frame 0 carried by IDAT, later frames by fdAT;
    * ONE sequence-number counter across fcTL AND fdAT, starting 0,
    * strictly in chunk order) with every chunk CRC-verified and the
    * same pre-inflate dim gates as [[decode]]. Scope gates,
    * documented like the GIF animated tier's palette form: frames
    * are 8-bit truecolor sequential, full-canvas (x=y=0, frame dims
    * = canvas dims), dispose_op 0 and blend_op 0 — each frame is a
    * complete image, which is what makes per-frame closed forms
    * replayable; offset/disposal compositing variants null whole.
    * An APNG whose IDAT is not part of the animation (no leading
    * fcTL) also nulls — every registered fixture animates its first
    * frame. */
  private[expr] def parseApng(bytes: Array[Byte],
                              maxPixels: Int): Apng = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)
    if (bytes.length < 8) return null
    var k = 0
    while (k < 8) { if (u8(k) != SIG(k)) return null; k += 1 }
    var pos = 8
    var w = 0; var h = 0
    var sawIhdr = false; var sawIend = false
    var numFrames = -1
    var expectSeq = 0L
    var sawIdat = false; var sawFdat = false
    var open = false // an fcTL has announced the next frame
    val frames = Array.newBuilder[Array[Int]]
    var cur = Array.newBuilder[Int]
    var curHasData = false
    var nDone = 0
    val crc = new CRC32()
    while (!sawIend) {
      if (pos + 8 > bytes.length) return null
      val len = be32(pos)
      if (len < 0L || len > Int.MaxValue - 12 ||
        pos + 12 + len > bytes.length) return null
      val l = len.toInt
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(bytes, pos + 4, 4 + l)
      if (crc.getValue != be32(pos + 8 + l)) return null
      if (!sawIhdr) {
        if (typ != "IHDR" || l != 13) return null
        val d = pos + 8
        val ww = be32(d); val hh = be32(d + 4)
        if (ww < 1L || hh < 1L ||
          ww > maxPixels || hh > maxPixels || ww * hh > maxPixels ||
          u8(d + 8) != 8 || u8(d + 9) != 2 || u8(d + 10) != 0 ||
          u8(d + 11) != 0 || u8(d + 12) != 0) return null
        w = ww.toInt; h = hh.toInt
        sawIhdr = true
      } else typ match {
        case "acTL" =>
          // once, before any image data or frame control
          if (numFrames >= 0 || sawIdat || open || l != 8) return null
          val nf = be32(pos + 8)
          if (nf < 1L || nf > 4096L) return null
          numFrames = nf.toInt
        case "fcTL" =>
          if (numFrames < 0 || l != 26) return null
          val d = pos + 8
          if (be32(d) != expectSeq) return null // one shared counter
          expectSeq += 1
          // full-canvas, no offset, dispose 0, blend 0 (scope gate)
          if (be32(d + 4) != w || be32(d + 8) != h ||
            be32(d + 12) != 0L || be32(d + 16) != 0L ||
            u8(d + 24) != 0 || u8(d + 25) != 0) return null
          if (open) { // close the previous frame
            if (!curHasData) return null
            frames += cur.result(); nDone += 1
          }
          cur = Array.newBuilder[Int]; curHasData = false
          open = true
        case "IDAT" =>
          // frame 0's stream; must be announced by the FIRST fcTL
          // and precede every fdAT
          if (numFrames < 0 || !open || sawFdat || nDone > 0)
            return null
          sawIdat = true
          cur += (pos + 8); cur += l; curHasData = true
        case "fdAT" =>
          if (numFrames < 0 || !open || !sawIdat || l < 5) return null
          if (be32(pos + 8) != expectSeq) return null
          expectSeq += 1
          sawFdat = true
          cur += (pos + 12); cur += (l - 4); curHasData = true
        case "IEND" =>
          if (l != 0) return null
          sawIend = true
        case "IHDR" => return null
        case "PLTE" => return null // type-2 animated scope
        case _ => () // ancillary chunks skipped (CRC checked)
      }
      pos += 12 + l
    }
    if (numFrames < 1 || !open || !curHasData) return null
    frames += cur.result(); nDone += 1
    if (nDone != numFrames) return null
    new Apng(w, h, frames.result())
  }

  /** struct(width, height, n_frames) or null — the
    * [[GifFn.animMeta]] sibling for the APNG container. */
  def apngMeta(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val a = parseApng(bytes, maxPixels)
    if (a == null) null
    else new GenericInternalRow(Array[Any](
      a.w.toLong, a.h.toLong, a.frames.length.toLong))
  }

  /** Frame k's pixel statistics ([[schema]], RGB order) — the APNG
    * sibling of [[GifFn.frameStats]]: the container walk is shallow,
    * ONLY frame k's zlib ranges are concatenated and inflated (to
    * EXACTLY the filtered volume, unfiltered at bpp 3). Null on a
    * hostile container or k out of range — never a partial
    * statistic. */
  def apngFrameStats(bytes: Array[Byte], k: Long,
                     maxPixels: Int): InternalRow = {
    val a = parseApng(bytes, maxPixels)
    if (a == null || k < 0 || k >= a.frames.length) return null
    val ranges = a.frames(k.toInt)
    var total = 0
    var i = 1
    while (i < ranges.length) { total += ranges(i); i += 2 }
    val z = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < ranges.length) {
      System.arraycopy(bytes, ranges(i), z, off, ranges(i + 1))
      off += ranges(i + 1)
      i += 2
    }
    val filtered = new Array[Byte]((1 + 3 * a.w) * a.h)
    val inf = new Inflater()
    try {
      inf.setInput(z)
      var got = 0
      while (got < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inf.needsInput()) return null
        got += n
      }
      if (got != filtered.length) return null
      if (!inf.finished() &&
        inf.inflate(new Array[Byte](1)) != 0) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    val rgb = new Array[Byte](3 * a.w * a.h)
    if (!unfilter(filtered, 0, a.w, a.h, 3, rgb)) return null
    val npx = a.w.toLong * a.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var nr = 255; var ng = 255; var nb = 255
    var xr = 0; var xg = 0; var xb = 0
    i = 0
    while (i < rgb.length) {
      val r = rgb(i) & 0xFF
      val g = rgb(i + 1) & 0xFF
      val b = rgb(i + 2) & 0xFF
      sr += r; sg += g; sb += b
      if (r < nr) nr = r; if (r > xr) xr = r
      if (g < ng) ng = g; if (g > xg) xg = g
      if (b < nb) nb = b; if (b > xb) xb = b
      i += 3
    }
    val n = npx.toDouble
    new GenericInternalRow(Array[Any](
      a.w.toLong, a.h.toLong, npx,
      nr, xr, sr, BmpPixelStatsFn.round6(sr / n),
      ng, xg, sg, BmpPixelStatsFn.round6(sg / n),
      nb, xb, sb, BmpPixelStatsFn.round6(sb / n)))
  }

  /** Synthesize a COMPLETE APNG: `nFrames` full-canvas 8-bit
    * truecolor frames (acTL, per-frame fcTL with the shared
    * sequence counter, frame 0 as IDAT, later frames as fdAT),
    * frame k carrying the [[JpegFn.blockVal]] closed form at seed+k
    * replicated to R=G=B — the [[GifFn.synthAnim]]/
    * [[AviFn.synthMjpeg]] convention, so sampling tiers replay ONE
    * pixel rule across all four frame-sampling containers. Scanline
    * v of every frame is filtered with type v % 5. */
  def synthApng(seed: Long, width: Long, height: Long,
                nFrames: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake APNG dims out of range: ${width}x$height")
    require(nFrames >= 1 && nFrames <= 64,
      s"fake APNG frame count out of range: $nFrames")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(x: Long): Array[Byte] = Array(
        ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
        ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    def be32a(x: Long): Array[Byte] = Array(
      ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
      ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
    val ihdr = new Array[Byte](13)
    System.arraycopy(be32a(w.toLong), 0, ihdr, 0, 4)
    System.arraycopy(be32a(h.toLong), 0, ihdr, 4, 4)
    ihdr(8) = 8; ihdr(9) = 2
    chunk("IHDR", ihdr)
    chunk("acTL", be32a(nFrames) ++ be32a(0L)) // loop forever
    var seq = 0L
    def fctl(): Unit = {
      val d = new java.io.ByteArrayOutputStream()
      d.write(be32a(seq), 0, 4); seq += 1
      d.write(be32a(w.toLong), 0, 4)
      d.write(be32a(h.toLong), 0, 4)
      d.write(be32a(0L), 0, 4) // x
      d.write(be32a(0L), 0, 4) // y
      d.write(Array[Byte](0, 4, 0, 100), 0, 4) // 4/100 s delay
      d.write(0) // dispose none
      d.write(0) // blend source
      chunk("fcTL", d.toByteArray)
    }
    def frameZ(fk: Long): Array[Byte] = {
      val rowBytes = 1 + 3 * w
      val raw = new Array[Byte](3 * w * h)
      var v = 0
      while (v < h) {
        var c = 0
        while (c < w) {
          val p = (v * w + c) * 3
          val g = JpegFn.blockVal(seed + fk, v / 8, c / 8).toByte
          raw(p) = g; raw(p + 1) = g; raw(p + 2) = g
          c += 1
        }
        v += 1
      }
      val filtered = new Array[Byte](rowBytes * h)
      v = 0
      while (v < h) {
        val ft = v % 5
        filtered(v * rowBytes) = ft.toByte
        val dst = v * rowBytes + 1
        val src = v * 3 * w
        val prev = src - 3 * w
        var i = 0
        while (i < 3 * w) {
          val x = raw(src + i) & 0xFF
          val a = if (i >= 3) raw(src + i - 3) & 0xFF else 0
          val b = if (v > 0) raw(prev + i) & 0xFF else 0
          val cc = if (v > 0 && i >= 3) raw(prev + i - 3) & 0xFF else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - cc
              val pa = math.abs(p - a)
              val pb = math.abs(p - b)
              val pc = math.abs(p - cc)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
          }
          filtered(dst + i) = ((x - pred) & 0xFF).toByte
          i += 1
        }
        v += 1
      }
      val def1 = new Deflater()
      try {
        def1.setInput(filtered); def1.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!def1.finished()) buf.write(tmp, 0, def1.deflate(tmp))
        buf.toByteArray
      } finally def1.end()
    }
    var fk = 0L
    while (fk < nFrames) {
      fctl()
      val z = frameZ(fk)
      if (fk == 0L) chunk("IDAT", z)
      else {
        chunk("fdAT", be32a(seq) ++ z); seq += 1
      }
      fk += 1
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** ADAM7-INTERLACED sibling of [[synth]]: the IDENTICAL visual
    * image stored as seven independently-filtered pass sub-images
    * (RFC 2083 §8.2) — a pure pixel permutation, so every statistic
    * AND the row-sensitive perceptual hash must land exactly where
    * the sequential container does. Pass scanline r is filtered with
    * type r % 5 against PASS-LOCAL neighbors, so all five filter
    * reversals run inside every non-trivial pass. */
  def synthInterlaced(seed: Long, width: Long,
                      height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake PNG dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val raw = new Array[Byte](3 * w * h) // full image, RGB top-down
    var v = 0
    while (v < h) {
      val fr = h - 1 - v
      var c = 0
      while (c < w) {
        val p = (v * w + c) * 3
        raw(p) = Math.floorMod(seed * 13 + fr * 7 + c * 3, 256L).toByte
        raw(p + 1) = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toByte
        raw(p + 2) = Math.floorMod(seed * 7 + fr * 3 + c, 256L).toByte
        c += 1
      }
      v += 1
    }
    val filtered = new java.io.ByteArrayOutputStream()
    var pass = 0
    while (pass < 7) {
      val pw = passW(w, pass)
      val ph = passH(h, pass)
      if (pw > 0 && ph > 0) {
        // gather the pass sub-image, then filter it pass-locally
        val sub = new Array[Byte](3 * pw * ph)
        var r = 0
        while (r < ph) {
          val py = A7_YS(pass) + r * A7_YSTEP(pass)
          var c = 0
          while (c < pw) {
            val px = A7_XS(pass) + c * A7_XSTEP(pass)
            val sp = (r * pw + c) * 3
            val gp = (py * w + px) * 3
            sub(sp) = raw(gp); sub(sp + 1) = raw(gp + 1)
            sub(sp + 2) = raw(gp + 2)
            c += 1
          }
          r += 1
        }
        r = 0
        while (r < ph) {
          val ft = r % 5
          filtered.write(ft)
          val src = r * 3 * pw
          val prev = src - 3 * pw
          var i = 0
          while (i < 3 * pw) {
            val x = sub(src + i) & 0xFF
            val a = if (i >= 3) sub(src + i - 3) & 0xFF else 0
            val b = if (r > 0) sub(prev + i) & 0xFF else 0
            val cc = if (r > 0 && i >= 3) sub(prev + i - 3) & 0xFF else 0
            val pred = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) / 2
              case 4 =>
                val pp = a + b - cc
                val pa = math.abs(pp - a)
                val pb = math.abs(pp - b)
                val pc = math.abs(pp - cc)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
            }
            filtered.write((x - pred) & 0xFF)
            i += 1
          }
          r += 1
        }
      }
      pass += 1
    }
    val def1 = new Deflater()
    val zs = try {
      def1.setInput(filtered.toByteArray); def1.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def1.finished()) buf.write(tmp, 0, def1.deflate(tmp))
      buf.toByteArray
    } finally def1.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(x: Long): Array[Byte] = Array(
        ((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
        ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
      val t = typ.getBytes("US-ASCII")
      out.write(be32(data.length.toLong), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32()
      crc.update(t); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xFF).toByte; ihdr(1) = ((w >> 16) & 0xFF).toByte
    ihdr(2) = ((w >> 8) & 0xFF).toByte; ihdr(3) = (w & 0xFF).toByte
    ihdr(4) = ((h >> 24) & 0xFF).toByte; ihdr(5) = ((h >> 16) & 0xFF).toByte
    ihdr(6) = ((h >> 8) & 0xFF).toByte; ihdr(7) = (h & 0xFF).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 1
    chunk("IHDR", ihdr)
    chunk("IDAT", zs)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

/** Native Catalyst expression `graft_png_stats(binary[, maxPixels])` —
  * see [[PngFn.stats]]. */
case class PngPixelStats(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = PngFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_stats"

  override def nullSafeEval(input: Any): Any =
    PngFn.stats(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.PngFn.stats($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): PngPixelStats = copy(child = newChild)
}

/** Native Catalyst expression `graft_png_ahash(binary[, maxPixels])` —
  * see [[PngFn.ahash]]; struct(h0, h1) packed exactly like
  * [[BmpAHash]] so cross-format Hamming/grouping tiers compose. */
case class PngAHash(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_ahash expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_ahash"

  override def nullSafeEval(input: Any): Any =
    PngFn.ahash(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.PngFn.ahash($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): PngAHash = copy(child = newChild)
}

/** Native expression `graft_png_to_bmp24(binary[, maxPixels])` — see
  * [[PngFn.toBmp24]]. */
case class PngToBmp24(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_png_to_bmp24 expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_to_bmp24"

  override def nullSafeEval(input: Any): Any =
    PngFn.toBmp24(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.PngFn.toBmp24($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): PngToBmp24 = copy(child = newChild)
}

/** Native fixture generator `graft_fake_png24(seed, width, height)` —
  * see [[PngFn.synth]]; the [[FakeBmp24]] pattern for the compressed
  * family. */
case class FakePng24(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_png24 expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_png24"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    PngFn.synth(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.PngFn.synth((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakePng24 =
    FakePng24(f, s, t)
}

/** Native expression `graft_fake_png_interlaced(seed, w, h)` — see
  * [[PngFn.synthInterlaced]]. */
case class FakePngInterlaced(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_png_interlaced expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_png_interlaced"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    PngFn.synthInterlaced(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.PngFn.synthInterlaced((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakePngInterlaced =
    FakePngInterlaced(f, s, t)
}

/** Native fixture generator `graft_fake_png_typed(seed, w, h,
  * colorType)` — see [[PngFn.synthTyped]]: one gray visual image
  * through any of the five 8-bit sample layouts. */
case class FakePngTyped(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_png_typed expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_png_typed"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, ct: Any): Any =
    PngFn.synthTyped(asLong(s), asLong(w), asLong(h), asLong(ct))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, ct) =>
      s"${ev.value} = etlmudah.expr.PngFn.synthTyped((long)$s, " +
        s"(long)$w, (long)$h, (long)$ct);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakePngTyped = FakePngTyped(f, s, t, q)
}

/** Native fixture generator `graft_fake_png16(seed, w, h, colorType)`
  * — see [[PngFn.synth16]]: the 16-bit-depth sibling of
  * [[FakePngTyped]] (colorType in {0,2,4,6}), same gray visual image
  * under the strip-16 readout. */
case class FakePng16(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_png16 expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_png16"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, ct: Any): Any =
    PngFn.synth16(asLong(s), asLong(w), asLong(h), asLong(ct))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, ct) =>
      s"${ev.value} = etlmudah.expr.PngFn.synth16((long)$s, " +
        s"(long)$w, (long)$h, (long)$ct);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakePng16 = FakePng16(f, s, t, q)
}

/** Native expression `graft_apng_meta(binary[, maxPixels])` — see
  * [[PngFn.apngMeta]]; the [[GifAnimMeta]] sibling for the APNG
  * container. */
case class ApngMeta(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_apng_meta expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_frames", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_apng_meta"

  override def nullSafeEval(input: Any): Any =
    PngFn.apngMeta(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.PngFn.apngMeta($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): ApngMeta = copy(child = newChild)
}

/** Native expression `graft_apng_frame_stats(binary, frameIdx
  * [, maxPixels])` — see [[PngFn.apngFrameStats]]; [[PngFn.schema]]
  * (RGB order, the [[PngPixelStats]] convention). */
case class ApngFrameStats(left: Expression, right: Expression,
                          maxPixels: Int = 4096)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
      (right.dataType == LongType || right.dataType == IntegerType ||
        right.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_apng_frame_stats expects (binary, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = PngFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_apng_frame_stats"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(b: Any, k: Any): Any =
    PngFn.apngFrameStats(b.asInstanceOf[Array[Byte]], asLong(k),
      maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = etlmudah.expr.PngFn.apngFrameStats($b, (long)$k, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ApngFrameStats =
    copy(left = l, right = r)
}

/** Native expression `graft_fake_apng(seed, w, h, nFrames)` — see
  * [[PngFn.synthApng]]. */
case class FakeApng(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_apng expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_apng"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, nf: Any): Any =
    PngFn.synthApng(asLong(s), asLong(w), asLong(h), asLong(nf))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, nf) =>
      s"${ev.value} = etlmudah.expr.PngFn.synthApng((long)$s, " +
        s"(long)$w, (long)$h, (long)$nf);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeApng = FakeApng(f, s, t, q)
}
