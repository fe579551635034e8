package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL TIFF pixel decode — baseline TIFF 6.0 RGB (the scanner/
  * archival sibling of the web formats): BOTH byte orders (II
  * little-endian and MM big-endian — the SAME image bytes walk two
  * entirely different multi-byte readers), 8-bit chunky RGB,
  * uncompressed strips. Extends the real-pixel tier with the last
  * major uncompressed container and feeds the same cross-format
  * perceptual-hash dedup grid as BMP/PNG/GIF/JPEG.
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
  * Compression 1 (uncompressed — an LZW or PackBits claim nulls,
  * honestly out of scope), PlanarConfiguration 1 (chunky) if
  * present, and the strip ledger covering the image EXACTLY:
  * StripOffsets/StripByteCounts equal length, each strip's byte
  * count == its rows × 3w with the last strip short, every range in
  * bounds. TIFF has no checksum, so hostile fixtures corrupt
  * STRUCTURE (the JPEG discipline). Anything off-contract yields
  * null, never a partial statistic.
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
    var planar = 1L
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
        case _ => () // unknown tags skipped (walk already bounded)
      }
      e += 1
    }
    if (width < 1L || height < 1L ||
      width > maxPixels || height > maxPixels ||
      width * height > maxPixels) return null
    if (!bpsOk || compression != 1L || photometric != 2L ||
      samplesPerPx != 3L || planar != 1L) return null
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
      val expect = rows.toLong * 3 * w
      if (cnts(s) != expect) return null // ledger must cover EXACTLY
      if (offs(s) < 8L || offs(s) + expect > bytes.length) return null
      System.arraycopy(bytes, offs(s).toInt, rgb, row * 3 * w,
        expect.toInt)
      row += rows
      s += 1
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

  /** Synthesize a COMPLETE baseline TIFF in EITHER byte order
    * (bigEndian != 0 → MM) carrying the [[JpegFn.blockVal]] gray
    * closed form at `seed` — the [[BmpPixelStatsFn.synthBlocks]]
    * visual image, so BMP/TIFF pairs land in one dedup group and the
    * q338 hash replay applies unchanged. Strips are REAL: rows are
    * split 5 per strip (last short), exercising the multi-strip
    * ledger; the IFD sits after the pixel data with tags in the
    * required ascending order. */
  def synth(seed: Long, width: Long, height: Long,
            bigEndian: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake TIFF dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val be = bigEndian != 0L
    val rps = 5
    val nStrips = (h + rps - 1) / rps
    val pixBytes = 3 * w * h
    // layout: header(8) | pixel data | bps(6) | offs | cnts | IFD
    val stripArrSz = if (nStrips == 1) 0 else nStrips * 4
    val bpsOff = 8 + pixBytes
    val offsOff = bpsOff + 6
    val cntsOff = offsOff + stripArrSz
    val ifdOff = cntsOff + stripArrSz
    val nTags = 10
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
    var y = 0
    while (y < h) {
      var c = 0
      while (c < w) {
        val g = JpegFn.blockVal(seed, y / 8, c / 8).toByte
        val p = 8 + (y * w + c) * 3
        out(p) = g; out(p + 1) = g; out(p + 2) = g
        c += 1
      }
      y += 1
    }
    p16(bpsOff, 8); p16(bpsOff + 2, 8); p16(bpsOff + 4, 8)
    var s = 0
    var row = 0
    while (s < nStrips) {
      val rows = math.min(rps, h - row)
      val off = 8L + row.toLong * 3 * w
      val cnt = rows.toLong * 3 * w
      if (nStrips > 1) {
        p32(offsOff + s * 4, off)
        p32(cntsOff + s * 4, cnt)
      }
      row += rows
      s += 1
    }
    p16(ifdOff, nTags)
    var t = ifdOff + 2
    def tag(id: Int, typ: Int, cnt: Long, value: Long): Unit = {
      p16(t, id); p16(t + 2, typ); p32(t + 4, cnt)
      if (typ == 3 && cnt == 1L) p16(t + 8, value.toInt)
      else p32(t + 8, value)
      t += 12
    }
    tag(256, 4, 1L, w.toLong)              // ImageWidth
    tag(257, 4, 1L, h.toLong)              // ImageLength
    tag(258, 3, 3L, bpsOff.toLong)         // BitsPerSample -> [8,8,8]
    tag(259, 3, 1L, 1L)                    // Compression: none
    tag(262, 3, 1L, 2L)                    // Photometric: RGB
    if (nStrips == 1) tag(273, 4, 1L, 8L)  // StripOffsets inline
    else tag(273, 4, nStrips.toLong, offsOff.toLong)
    tag(277, 3, 1L, 3L)                    // SamplesPerPixel
    tag(278, 3, 1L, rps.toLong)            // RowsPerStrip
    if (nStrips == 1) tag(279, 4, 1L, pixBytes.toLong)
    else tag(279, 4, nStrips.toLong, cntsOff.toLong)
    tag(284, 3, 1L, 1L)                    // PlanarConfig: chunky
    p32(t, 0L)                             // no next IFD
    out
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
