package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 24bpp-BMP pixel kernels, factored into static methods so the
  * interpreted path and the generated code share one bytes-in,
  * row-out routine (the [[JaroWinklerFn]] pattern).
  *
  * Why a custom Expression rather than built-in byte arithmetic (the
  * [[etlmudah.multimodal.Multimodal.mediaMeta]] route): the pixel walk
  * needs per-pixel state over w*h*3 bytes, and the equivalent nested
  * higher-order-function tree is pathological to OPTIMIZE — Catalyst
  * spends tens of seconds per query inlining extract-over-create
  * through the lambda nest (measured 72 s for a two-field projection
  * at sf-test scale), where this expression is one static call inside
  * whole-stage codegen with a constant-size plan. Header fields
  * (magic, DIB size, dims, bpp, compression) are validated bytes-first
  * exactly as the builtin tier does; anything it cannot decode EXACTLY
  * — truncated pixel array included — yields null, never a partial
  * statistic. */
object BmpPixelStatsFn {

  /** Output schema: dims + per-channel (BMP stores B,G,R) min/max int,
    * exact BIGINT sum, and the 6dp HALF_UP-rounded mean of sum/n_px —
    * the same rounding `functions.round` applies, so oracle SQL
    * replays it with round(x, 6). */
  val schema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("b_min", IntegerType), StructField("b_max", IntegerType),
    StructField("b_sum", LongType), StructField("b_mean", DoubleType),
    StructField("g_min", IntegerType), StructField("g_max", IntegerType),
    StructField("g_sum", LongType), StructField("g_mean", DoubleType),
    StructField("r_min", IntegerType), StructField("r_max", IntegerType),
    StructField("r_sum", LongType), StructField("r_mean", DoubleType)))

  private[expr] def round6(d: Double): Double =
    BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Null unless: "BM" + BITMAPINFOHEADER (DIB 40) + bpp 24 +
    * compression 0 (BI_RGB) + positive dims + w*h <= maxPixels + the
    * padded-stride pixel array fully inside the blob. For [[stats]]
    * row order (bottom-up vs top-down negative height) cannot matter —
    * those statistics are order-independent, so that walk runs in file
    * order and the signed height contributes only its magnitude;
    * [[ahash]] IS order-sensitive, so parse also reports the layout
    * (last element: 1 = top-down) and ahash mirrors its sampled row.
    * Every gate runs BEFORE any pixel read, and the npx cap runs
    * before the stride multiply so hostile dims cannot overflow (the
    * audioMeta ANSI lesson carried over). */
  /** Shared accept/parse gate: (off, w, h, stride) when the blob is an
    * exactly-decodable 24bpp BI_RGB BMP within `maxPixels`, else null
    * — the one place the accept contract lives for stats AND ahash. */
  private def parse(bytes: Array[Byte], maxPixels: Int): Array[Long] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def sle32(i: Int): Long = {
      val v = le32(i)
      if (v > Int.MaxValue) v - 4294967296L else v
    }
    if (bytes.length < 54 || u8(0) != 0x42 || u8(1) != 0x4D) return null
    val off = le32(10)
    val dib = le32(14)
    val w = sle32(18)
    val h = math.abs(sle32(22))
    val bpp = le16(28)
    val comp = le32(30)
    if (dib != 40L || bpp != 24 || comp != 0L || w <= 0L || h <= 0L)
      return null
    val npx = w * h // <= 2^62: each factor is at most 2^31
    if (npx > maxPixels || off < 54L) return null
    // dims are now tiny (npx-capped): stride arithmetic cannot overflow
    val stride = (w * 3 + 3) / 4 * 4
    if (bytes.length < off + stride * h) return null
    Array(off, w, h, stride, if (sle32(22) < 0L) 1L else 0L)
  }

  def stats(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    val parsed = parse(bytes, maxPixels)
    if (parsed == null) return null
    val Array(off, w, h, stride, _) = parsed
    val npx = w * h
    var sb = 0L; var sg = 0L; var sr = 0L
    var nb = 255; var ng = 255; var nr = 255
    var xb = 0; var xg = 0; var xr = 0
    var fr = 0
    while (fr < h) {
      val row = (off + fr * stride).toInt
      var c = 0
      while (c < w) {
        val p = row + c * 3
        val b = u8(p); val g = u8(p + 1); val r = u8(p + 2)
        sb += b; sg += g; sr += r
        if (b < nb) nb = b; if (b > xb) xb = b
        if (g < ng) ng = g; if (g > xg) xg = g
        if (r < nr) nr = r; if (r > xr) xr = r
        c += 1
      }
      fr += 1
    }
    val n = npx.toDouble
    new GenericInternalRow(Array[Any](
      w, h, npx,
      nb, xb, sb, round6(sb / n),
      ng, xg, sg, round6(sg / n),
      nr, xr, sr, round6(sr / n)))
  }

  /** 64-bit AVERAGE HASH (aHash) of a decodable 24bpp BMP — the
    * classic perceptual fingerprint: nearest-neighbor downsample to
    * an 8x8 grid (pure index arithmetic — grid cell (i, j) samples
    * pixel (i*h/8, j*w/8), integer division), per-cell brightness =
    * B+G+R (0..765, no lossy /3), bit set where the cell outshines
    * the grid mean — the comparison is the exact cross-multiplied
    * `cell*64 > total` (BIGINT, no division), so any SQL engine
    * replays the hash bit for bit. Packed as two 32-bit words (the
    * q225 signature convention: shifts stay below 32, xor/bit_count
    * Hamming works unchanged). Null exactly when [[stats]] is null. */
  def ahash(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    val parsed = parse(bytes, maxPixels)
    if (parsed == null) return null
    val Array(off, w, h, stride, topDown) = parsed
    val cell = new Array[Long](64)
    var total = 0L
    var gi = 0
    while (gi < 8) {
      // The hash is defined over the VISUAL image, so a top-down
      // (negative DIB height) and a bottom-up encoding of the same
      // pixels hash identically: grid row gi samples file row gi*h/8
      // in the bottom-up layout, and its vertical mirror in the
      // top-down layout (where file order IS visual order).
      val fr0 = gi * h / 8
      val fr = if (topDown == 1L) h - 1 - fr0 else fr0
      var gj = 0
      while (gj < 8) {
        val c = gj * w / 8
        val p = (off + fr * stride + c * 3).toInt
        val v = (u8(p) + u8(p + 1) + u8(p + 2)).toLong
        cell(gi * 8 + gj) = v
        total += v
        gj += 1
      }
      gi += 1
    }
    var w0 = 0L
    var w1 = 0L
    var k = 0
    while (k < 64) {
      if (cell(k) * 64 > total) {
        if (k < 32) w0 |= 1L << k else w1 |= 1L << (k - 32)
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](w0, w1))
  }

  /** Synthesize a COMPLETE uncompressed 24bpp BMP — full 54-byte
    * BM+BITMAPINFOHEADER file plus the padded-stride pixel array —
    * whose pixel at file-row fr, column c carries channels
    *
    *   B = floorMod(seed*7  + fr*3 + c,   256)
    *   G = floorMod(seed*11 + fr*5 + c*2, 256)
    *   R = floorMod(seed*13 + fr*7 + c*3, 256)
    *
    * (floorMod, not Scala %, so the formula also holds verbatim for
    * negative seeds; SQL `%` on the non-negative doc_id call sites is
    * identical.)
    * Closed-form in (seed, fr, c), so the q224 oracle replays the
    * exact per-channel statistics with three modular expressions over
    * a generate-series grid and never parses a byte — the
    * fakeMediaHeader discipline extended from headers to payloads.
    * Width 1..4 exercises every pad width (1/2/3/0 bytes). */
  /** REAL box-filter downscale of a decodable 24bpp BMP by integer
    * `factor` — the brief's multimodal RESIZE step, exactly computable
    * for the uncompressed family: output pixel (oy, ox) is the
    * per-channel FLOOR mean of the factor×factor input block starting
    * at (oy·f, ox·f), trailing rows/cols that do not fill a block are
    * truncated (ow = w div f, oh = h div f — the standard thumbnail
    * convention). Integer arithmetic only (sum div f² per channel), so
    * an oracle replays every output byte from the synth closed form.
    * Output is a canonical 54-byte-header BI_RGB 24bpp BMP; a top-down
    * input (negative DIB height) keeps its orientation — the output
    * header carries the same sign, so resize→stats, resize→ahash and
    * resize→resize all compose with the layout conventions above.
    * Null when the input is not exactly decodable or a dimension
    * collapses below one block. */
  def resize(bytes: Array[Byte], factor: Int,
             maxPixels: Int): Array[Byte] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    val parsed = parse(bytes, maxPixels)
    if (parsed == null || factor < 1) return null
    val Array(off, w, h, stride, topDown) = parsed
    val ow = (w / factor).toInt
    val oh = (h / factor).toInt
    if (ow < 1 || oh < 1) return null
    val oStride = (ow * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + oStride * oh)
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
    putLe32(18, ow.toLong)
    putLe32(22, if (topDown == 1L) -oh.toLong else oh.toLong)
    out(26) = 1
    out(28) = 24
    putLe32(30, 0L)
    putLe32(34, (oStride * oh).toLong)
    val f2 = factor * factor
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sb = 0; var sg = 0; var sr = 0
        var dy = 0
        while (dy < factor) {
          val row = (off + (oy * factor + dy) * stride).toInt
          var dx = 0
          while (dx < factor) {
            val p = row + (ox * factor + dx) * 3
            sb += u8(p); sg += u8(p + 1); sr += u8(p + 2)
            dx += 1
          }
          dy += 1
        }
        val q = 54 + oy * oStride + ox * 3
        out(q) = (sb / f2).toByte
        out(q + 1) = (sg / f2).toByte
        out(q + 2) = (sr / f2).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  def synth(seed: Long, width: Long, height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake BMP dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * h)
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = (v & 0xFF).toByte
      out(i + 1) = ((v >> 8) & 0xFF).toByte
      out(i + 2) = ((v >> 16) & 0xFF).toByte
      out(i + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, out.length.toLong)
    putLe32(10, 54L)              // pixel-array offset
    putLe32(14, 40L)              // BITMAPINFOHEADER
    putLe32(18, w.toLong)
    putLe32(22, h.toLong)
    out(26) = 1                   // planes
    out(28) = 24                  // bpp
    putLe32(30, 0L)               // BI_RGB
    putLe32(34, (stride * h).toLong)
    var fr = 0
    while (fr < h) {
      val row = 54 + fr * stride
      var c = 0
      while (c < w) {
        val p = row + c * 3
        // floorMod, not %: Scala % returns negative remainders for
        // negative seeds, which would break the documented closed form
        // the oracles replay (all call sites pass doc_id >= 0, but the
        // formula must hold for every seed).
        out(p) = Math.floorMod(seed * 7 + fr * 3 + c, 256L).toByte
        out(p + 1) = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toByte
        out(p + 2) = Math.floorMod(seed * 13 + fr * 7 + c * 3, 256L).toByte
        c += 1
      }
      fr += 1
    }
    out
  }

  /** Synthesize a COMPLETE bottom-up 24bpp BMP carrying the BLOCK-
    * CONSTANT image of [[JpegFn.synth]]: visual pixel (y top-down, x)
    * has R = G = B = floorMod(seed*17 + (y div 8)*5 + (x div 8)*3,
    * 256) — i.e. [[JpegFn.blockVal]](seed, y div 8, x div 8). The
    * lossless cross-format twin for the JPEG tier: a baseline JPEG
    * cannot carry the per-pixel [[synth]] image exactly (the DCT
    * quantizes), but DC-only blocks ARE exactly this closed form, so
    * BMP-vs-JPEG parity runs on real decoded pixels through two
    * fully independent decode paths. */
  def synthBlocks(seed: Long, width: Long, height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake BMP dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + stride * h)
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
    putLe32(18, w.toLong)
    putLe32(22, h.toLong)
    out(26) = 1
    out(28) = 24
    putLe32(30, 0L)
    putLe32(34, (stride * h).toLong)
    var fr = 0
    while (fr < h) {
      val y = h - 1 - fr // bottom-up file row fr is visual row y
      val row = 54 + fr * stride
      var c = 0
      while (c < w) {
        val v = JpegFn.blockVal(seed, y / 8, c / 8).toByte
        val p = row + c * 3
        out(p) = v; out(p + 1) = v; out(p + 2) = v
        c += 1
      }
      fr += 1
    }
    out
  }
}

/** Native Catalyst expression `graft_bmp_stats(binary[, maxPixels])` —
  * REAL pixel statistics for uncompressed 24bpp BMPs, the one image
  * family whose pixels decode with pure byte arithmetic (no codec, no
  * image library). Closes a real slice of the "image feature"
  * substitution: the header decode was already real (`mediaMeta`);
  * for BI_RGB 24bpp the payload now is too.
  *
  * maxPixels bounds the walk the way maxSegments bounds the JPEG
  * marker walk: this is the thumbnail/patch tier; full-resolution
  * corpus scans belong to a mapPartitions codec tier (the
  * videoMetaScan split). Null on anything not exactly decodable —
  * including a pixel array truncated mid-file. */
case class BmpPixelStats(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BmpPixelStatsFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_stats"

  override def nullSafeEval(input: Any): Any =
    BmpPixelStatsFn.stats(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.BmpPixelStatsFn.stats($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): BmpPixelStats = copy(child = newChild)
}

/** Native Catalyst expression `graft_bmp_ahash(binary[, maxPixels])` —
  * see [[BmpPixelStatsFn.ahash]]. Returns struct(h0, h1): the 64-bit
  * perceptual average hash as two 32-bit words, ready for exact-match
  * image dedup grouping or `bit_count(xor)` Hamming near-dup tiers. */
case class BmpAHash(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_ahash expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_ahash"

  override def nullSafeEval(input: Any): Any =
    BmpPixelStatsFn.ahash(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.BmpPixelStatsFn.ahash($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): BmpAHash = copy(child = newChild)
}

/** Native expression `graft_bmp_resize(binary, factor[, maxPixels])`
  * — see [[BmpPixelStatsFn.resize]]. */
case class BmpResize(child: Expression, factor: Int,
                     maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (factor < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bmp_resize factor must be >= 1, got $factor")
    else if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bmp_resize expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_resize"

  override def nullSafeEval(input: Any): Any =
    BmpPixelStatsFn.resize(input.asInstanceOf[Array[Byte]], factor,
      maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.BmpPixelStatsFn.resize($c, $factor, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): BmpResize = copy(child = newChild)
}

/** Native fixture generator `graft_fake_bmp24(seed, width, height)` —
  * see [[BmpPixelStatsFn.synth]]. Native for the same reason as the
  * decoder: the builtin hex-assembly tree costs seconds of optimizer
  * time per query; the fixture is a test/bench surface and must not
  * dominate the measurement. */
case class FakeBmp24(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_bmp24 expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_bmp24"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    BmpPixelStatsFn.synth(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.BmpPixelStatsFn.synth((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakeBmp24 =
    FakeBmp24(f, s, t)
}

/** Native expression `graft_fake_bmp_blocks(seed, w, h)` — see
  * [[BmpPixelStatsFn.synthBlocks]]; the lossless twin of the JPEG
  * tier's block-constant image. */
case class FakeBmpBlocks(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_bmp_blocks expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_bmp_blocks"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    BmpPixelStatsFn.synthBlocks(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.BmpPixelStatsFn.synthBlocks((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakeBmpBlocks =
    FakeBmpBlocks(f, s, t)
}
