package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL VIDEO FRAME SAMPLING — the last multimodal verb (decode /
  * feature-extract / resize / FRAME-SAMPLE) done on real bytes: an
  * uncompressed AVI (RIFF 'AVI ' with a 'vids'/DIB stream of 24bpp
  * BI_RGB frames) is to video what BI_RGB BMP is to images and 16-bit
  * PCM WAV to audio — the one family whose payload decodes with pure
  * byte arithmetic, no codec. Frame extraction is a bounded RIFF walk
  * to the movi list's nth '00db' chunk; the frame body is EXACTLY a
  * BMP pixel array (bottom-up padded-stride BGR rows), so the whole
  * BMP kernel family applies per frame.
  *
  * Reference surface: the frame-sampling leg of the multimodal
  * substitution (`multimodal/Multimodal.scala:10-16`).
  *
  * MJPEG tier: the same container with an 'MJPG'-compressed 'vids'
  * stream — each movi chunk is '00dc' carrying ONE complete baseline
  * JFIF, decoded per sampled frame by [[JpegFn]] (the real
  * entropy-decode path), with the frame's dims REQUIRED to match the
  * container's. One registered function family serves both codecs:
  * meta/frameStats/frameAhash branch on the strf compression fourcc,
  * so a frame-sampling query is codec-transparent. A chunk whose
  * JPEG payload does not decode exactly (or lies about dims) nulls
  * that frame, never a partial statistic.
  *
  * Accept contract (the Bmp/Png discipline — every gate before any
  * pixel read): 'RIFF' + 'AVI ' signature, chunk walk with bounds
  * checks, LIST hdrl with a 56-byte 'avih' (dims, total frames,
  * µs/frame), a 'vids' 'strh' and a BITMAPINFOHEADER 'strf' gating
  * 24bpp / BI_RGB / matching dims, w·h ≤ maxPixels BEFORE any frame
  * walk, LIST movi whose '00db' chunks each carry exactly stride·h
  * bytes and number exactly dwTotalFrames. Anything else — truncated
  * file, compressed stream, frame index out of range — nulls, never
  * a partial statistic.
  *
  * Synth: frame k of `synth(seed, w, h, n)` carries EXACTLY the
  * pixels of `BmpPixelStatsFn.synth(seed + k, w, h)` — so per-frame
  * stats/hashes replay with the established q224/q227 closed forms,
  * and a sampled frame's perceptual hash equals the corresponding
  * BMP/PNG hash (cross-CONTAINER dedup parity, pinned in AviSpec).
  */
object AviFn {

  /** (w, h, nFrames, usPerFrame, moviOff) or null; moviOff points at
    * the first byte of the first frame chunk header. */
  private def parse(bytes: Array[Byte], maxPixels: Int): Array[Long] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def fcc(i: Int): String =
      if (i + 4 > bytes.length) "" else new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ")
      return null
    var w = -1L; var h = -1L; var nFrames = -1L; var usPf = -1L
    var strfOk = false; var vidsOk = false
    var codec = -1L // 0 = uncompressed DIB, 1 = MJPG
    var moviOff = -1L; var moviEnd = -1L
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = fcc(pos)
      val sz = le32(pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return null
      if (id == "LIST" && sz >= 4) {
        val listType = fcc(pos + 8)
        if (listType == "hdrl" || listType == "strl") {
          // descend: header lists nest; walk their children in place
          var p = pos + 12
          val end = pos + 8 + sz.toInt
          while (p + 8 <= end) {
            val cid = fcc(p)
            val csz = le32(p + 4)
            if (csz < 0 || p + 8 + csz > end + 0L) return null
            cid match {
              case "avih" if csz >= 40 =>
                usPf = le32(p + 8)
                nFrames = le32(p + 8 + 16)
                w = le32(p + 8 + 32)
                h = le32(p + 8 + 36)
              case "strh" if csz >= 8 =>
                if (fcc(p + 8) == "vids") vidsOk = true
              case "strf" if csz >= 40 =>
                // BITMAPINFOHEADER: gate 24bpp, BI_RGB or 'MJPG'
                // compression, dims match avih
                val bw = le32(p + 8 + 4)
                val bh = le32(p + 8 + 8)
                val bpp = u8(p + 8 + 14) | (u8(p + 8 + 15) << 8)
                val comp = le32(p + 8 + 16)
                codec =
                  if (comp == 0L) 0L
                  else if (comp == 0x47504A4DL) 1L // 'MJPG'
                  else -1L
                strfOk = bpp == 24 && codec >= 0L && bw == w && bh == h
              case "LIST" => // nested strl under hdrl: descend in place
                p += 4        // re-walk from the list type as a chunk
              case _ => ()
            }
            if (cid != "LIST") p += 8 + csz.toInt + (csz.toInt & 1)
            else p += 8
          }
        } else if (listType == "movi") {
          moviOff = pos + 12L
          moviEnd = pos + 8L + sz
        }
      }
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (w <= 0L || h <= 0L || nFrames <= 0L || usPf <= 0L ||
      !vidsOk || !strfOk || moviOff < 0L) return null
    // gate each dim BEFORE the multiply: w/h are le32 Longs (to
    // 2^32-1) and w*h can overflow Long negative, bypassing the cap
    // (stride/frameBytes then wrap and the frame loops mis-index)
    if (w > maxPixels || h > maxPixels || w * h > maxPixels) return null
    // verify the movi chunk ladder: exactly nFrames frames — DIB
    // ('00db', each exactly stride*h bytes) or MJPG ('00dc', each a
    // non-empty payload whose JPEG validity is gated per sampled
    // frame at decode time)
    val stride = (w * 3 + 3) / 4 * 4
    val frameBytes = stride * h
    var p = moviOff
    var seen = 0L
    while (p + 8 <= moviEnd) {
      def fcc2(i: Long): String = new String(bytes, i.toInt, 4, "US-ASCII")
      val csz = le32(p.toInt + 4)
      val okChunk =
        if (codec == 0L) fcc2(p) == "00db" && csz == frameBytes
        else fcc2(p) == "00dc" && csz >= 4
      if (!okChunk || p + 8 + csz > moviEnd) return null
      seen += 1
      p += 8 + csz + (csz & 1)
    }
    if (seen != nFrames) return null
    Array(w, h, nFrames, usPf, moviOff, codec)
  }

  /** (offset, size) of MJPG frame k's JPEG payload, or null — a
    * bounded chunk walk (sizes vary, unlike the DIB stride ladder).
    * `moviEnd` is implied by the already-verified ladder: walking k
    * verified chunks cannot leave it. */
  private def mjpegFrame(bytes: Array[Byte], moviOff: Long, n: Long,
                         k: Long): Array[Long] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    if (k < 0 || k >= n) return null
    var p = moviOff
    var i = 0L
    while (i < k) {
      val csz = le32(p.toInt + 4)
      p += 8 + csz + (csz & 1)
      i += 1
    }
    Array(p + 8, le32(p.toInt + 4))
  }

  /** struct(width, height, n_frames, us_per_frame) or null. */
  def meta(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val p = parse(bytes, maxPixels)
    if (p == null) null
    else new GenericInternalRow(Array[Any](p(0), p(1), p(2), p(3)))
  }

  /** Offset of DIB frame k's pixel array, or -1. */
  private def frameOffset(p: Array[Long], k: Long): Long = {
    val Array(w, h, n, _, movi, _) = p
    if (k < 0 || k >= n) return -1L
    val stride = (w * 3 + 3) / 4 * 4
    movi + k * (8 + stride * h) + 8
  }

  /** Decode MJPG frame k to top-down RGB, with the container-dims
    * cross-check; null on any payload the JPEG tier rejects. */
  private def mjpegDecoded(bytes: Array[Byte], p: Array[Long], k: Long,
                           maxPixels: Int): JpegFn.Decoded = {
    val Array(w, h, n, _, movi, _) = p
    val fb = mjpegFrame(bytes, movi, n, k)
    if (fb == null) return null
    val slice = java.util.Arrays.copyOfRange(
      bytes, fb(0).toInt, (fb(0) + fb(1)).toInt)
    val d = JpegFn.decode(slice, maxPixels)
    if (d == null || d.w != w || d.h != h) null else d
  }

  /** Per-frame pixel statistics — [[BmpPixelStatsFn.schema]] (the
    * frame body IS a BMP pixel array: B,G,R channels). */
  def frameStats(bytes: Array[Byte], k: Long, maxPixels: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    val p = parse(bytes, maxPixels)
    if (p == null) return null
    if (p(5) == 1L) { // MJPG: real entropy decode, stats in BGR order
      val d = mjpegDecoded(bytes, p, k, maxPixels)
      if (d == null) return null
      val npx = d.w.toLong * d.h
      var sb = 0L; var sg = 0L; var sr = 0L
      var nb = 255; var ng = 255; var nr = 255
      var xb = 0; var xg = 0; var xr = 0
      var i = 0
      while (i < d.rgb.length) {
        val r = d.rgb(i) & 0xFF
        val g = d.rgb(i + 1) & 0xFF
        val b = d.rgb(i + 2) & 0xFF
        sb += b; sg += g; sr += r
        if (b < nb) nb = b; if (b > xb) xb = b
        if (g < ng) ng = g; if (g > xg) xg = g
        if (r < nr) nr = r; if (r > xr) xr = r
        i += 3
      }
      val nn = npx.toDouble
      return new GenericInternalRow(Array[Any](
        d.w.toLong, d.h.toLong, npx,
        nb, xb, sb, BmpPixelStatsFn.round6(sb / nn),
        ng, xg, sg, BmpPixelStatsFn.round6(sg / nn),
        nr, xr, sr, BmpPixelStatsFn.round6(sr / nn)))
    }
    val off = frameOffset(p, k)
    if (off < 0) return null
    val Array(w, h, _, _, _, _) = p
    val stride = (w * 3 + 3) / 4 * 4
    var sb = 0L; var sg = 0L; var sr = 0L
    var nb = 255; var ng = 255; var nr = 255
    var xb = 0; var xg = 0; var xr = 0
    var fr = 0
    while (fr < h) {
      val row = (off + fr * stride).toInt
      var c = 0
      while (c < w) {
        val q = row + c * 3
        val b = u8(q); val g = u8(q + 1); val r = u8(q + 2)
        sb += b; sg += g; sr += r
        if (b < nb) nb = b; if (b > xb) xb = b
        if (g < ng) ng = g; if (g > xg) xg = g
        if (r < nr) nr = r; if (r > xr) xr = r
        c += 1
      }
      fr += 1
    }
    val npx = w * h
    val n = npx.toDouble
    new GenericInternalRow(Array[Any](
      w, h, npx,
      nb, xb, sb, BmpPixelStatsFn.round6(sb / n),
      ng, xg, sg, BmpPixelStatsFn.round6(sg / n),
      nr, xr, sr, BmpPixelStatsFn.round6(sr / n)))
  }

  /** Per-frame perceptual hash — the [[BmpPixelStatsFn.ahash]]
    * convention verbatim (frame rows are bottom-up, exactly the
    * bottom-up BMP case), so one picture hashes identically whether
    * it arrived as a BMP, a PNG, or an AVI frame. */
  def frameAhash(bytes: Array[Byte], k: Long, maxPixels: Int): InternalRow = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    val p = parse(bytes, maxPixels)
    if (p == null) return null
    if (p(5) == 1L) { // MJPG: decode, then the VISUAL-hash convention
      val d = mjpegDecoded(bytes, p, k, maxPixels)
      if (d == null) return null
      val cell = new Array[Long](64)
      var total = 0L
      var gi = 0
      while (gi < 8) {
        val v = d.h - 1 - gi * d.h / 8 // top-down rgb: mirror like PNG
        var gj = 0
        while (gj < 8) {
          val c = gj * d.w / 8
          val q = (v * d.w + c) * 3
          val s = (d.rgb(q) & 0xFF) + (d.rgb(q + 1) & 0xFF) +
            (d.rgb(q + 2) & 0xFF)
          cell(gi * 8 + gj) = s.toLong
          total += s
          gj += 1
        }
        gi += 1
      }
      var w0 = 0L; var w1 = 0L
      var kk = 0
      while (kk < 64) {
        if (cell(kk) * 64 > total) {
          if (kk < 32) w0 |= 1L << kk else w1 |= 1L << (kk - 32)
        }
        kk += 1
      }
      return new GenericInternalRow(Array[Any](w0, w1))
    }
    val off = frameOffset(p, k)
    if (off < 0) return null
    val Array(w, h, _, _, _, _) = p
    val stride = (w * 3 + 3) / 4 * 4
    val cell = new Array[Long](64)
    var total = 0L
    var gi = 0
    while (gi < 8) {
      val fr = gi * h / 8            // bottom-up file row (BMP case)
      var gj = 0
      while (gj < 8) {
        val c = gj * w / 8
        val q = (off + fr * stride + c * 3).toInt
        val v = (u8(q) + u8(q + 1) + u8(q + 2)).toLong
        cell((gi * 8 + gj).toInt) = v
        total += v
        gj += 1
      }
      gi += 1
    }
    var w0 = 0L; var w1 = 0L
    var kk = 0
    while (kk < 64) {
      if (cell(kk) * 64 > total) {
        if (kk < 32) w0 |= 1L << kk else w1 |= 1L << (kk - 32)
      }
      kk += 1
    }
    new GenericInternalRow(Array[Any](w0, w1))
  }

  /** Synthesize a COMPLETE uncompressed AVI: RIFF('AVI ') → LIST hdrl
    * (avih + LIST strl(strh 'vids'/'DIB ', strf BITMAPINFOHEADER
    * 24bpp BI_RGB)) → LIST movi with `nFrames` '00db' chunks. Frame k
    * carries the pixels of `BmpPixelStatsFn.synth(seed + k, w, h)` —
    * the established closed form, shifted one seed per frame. 40ms
    * per frame (25 fps). */
  def synth(seed: Long, width: Long, height: Long,
            nFrames: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 1 &&
      width * height * nFrames <= (1 << 22),
      s"fake AVI dims out of range: ${width}x$height x$nFrames")
    val w = width.toInt; val h = height.toInt; val n = nFrames.toInt
    val stride = (w * 3 + 3) / 4 * 4
    val frameBytes = stride * h
    val strlSz = 4 + 8 + 56 + 8 + 40
    val hdrlSz = 4 + 8 + 56 + 8 + strlSz
    val moviSz = 4 + n * (8 + frameBytes)
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    val out = new Array[Byte](8 + riffSz)
    var p = 0
    def put4(s: String): Unit = {
      var i = 0
      while (i < 4) { out(p) = s.charAt(i).toByte; p += 1; i += 1 }
    }
    def le32(v: Long): Unit = {
      out(p) = (v & 0xFF).toByte
      out(p + 1) = ((v >> 8) & 0xFF).toByte
      out(p + 2) = ((v >> 16) & 0xFF).toByte
      out(p + 3) = ((v >> 24) & 0xFF).toByte
      p += 4
    }
    put4("RIFF"); le32(riffSz); put4("AVI ")
    put4("LIST"); le32(hdrlSz); put4("hdrl")
    put4("avih"); le32(56)
    le32(40000L)            // dwMicroSecPerFrame (25 fps)
    le32(0); le32(0); le32(0)
    le32(n)                 // dwTotalFrames
    le32(0); le32(1)        // dwInitialFrames, dwStreams
    le32(frameBytes)        // dwSuggestedBufferSize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0)   // reserved
    put4("LIST"); le32(strlSz); put4("strl")
    put4("strh"); le32(56)
    put4("vids"); put4("DIB ")
    le32(0); le32(0)        // flags, prio+lang
    le32(0)                 // initial frames
    le32(1); le32(25L)      // scale, rate (25 fps)
    le32(0); le32(n)        // start, length
    le32(frameBytes); le32(0xFFFFFFFFL)  // bufSize, quality
    le32(0)                 // sampleSize
    le32(0); le32(0)        // rcFrame
    put4("strf"); le32(40)
    le32(40); le32(w); le32(h)
    out(p) = 1; p += 2      // planes = 1 (LE16)
    out(p) = 24; p += 2     // bpp = 24 (LE16)
    le32(0)                 // BI_RGB
    le32(frameBytes)
    le32(0); le32(0); le32(0); le32(0)
    put4("LIST"); le32(moviSz); put4("movi")
    var k = 0
    while (k < n) {
      put4("00db"); le32(frameBytes)
      val s = seed + k
      var fr = 0
      while (fr < h) {
        val row = p + fr * stride
        var c = 0
        while (c < w) {
          val q = row + c * 3
          out(q) = Math.floorMod(s * 7 + fr * 3 + c, 256L).toByte
          out(q + 1) = Math.floorMod(s * 11 + fr * 5 + c * 2, 256L).toByte
          out(q + 2) = Math.floorMod(s * 13 + fr * 7 + c * 3, 256L).toByte
          c += 1
        }
        fr += 1
      }
      p += frameBytes
      k += 1
    }
    out
  }

  /** Synthesize a COMPLETE MJPEG AVI: same container as [[synth]] but
    * an 'MJPG'-compressed 'vids' stream whose movi list carries
    * `nFrames` '00dc' chunks, chunk k = `JpegFn.synth(seed + k, w, h)`
    * — a complete baseline JFIF per frame, so frame k's decoded image
    * is the [[JpegFn.blockVal]] closed form at seed + k (shifted one
    * seed per frame, the [[synth]] convention moved to the
    * entropy-coded codec). Odd-sized payloads get the RIFF pad
    * byte. */
  def synthMjpeg(seed: Long, width: Long, height: Long,
                 nFrames: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 1 &&
      width * height * nFrames <= (1 << 22),
      s"fake MJPEG AVI dims out of range: ${width}x$height x$nFrames")
    val w = width.toInt; val h = height.toInt; val n = nFrames.toInt
    val frames = (0 until n).map(k => JpegFn.synth(seed + k, w, h))
    val bufSize = frames.map(_.length).max
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val strlSz = 4 + 8 + 56 + 8 + 40
    val hdrlSz = 4 + 8 + 56 + 8 + strlSz
    val moviSz = 4 + moviBody
    val riffSz = 4 + 8 + hdrlSz + 8 + moviSz
    val out = new Array[Byte](8 + riffSz)
    var p = 0
    def put4(s: String): Unit = {
      var i = 0
      while (i < 4) { out(p) = s.charAt(i).toByte; p += 1; i += 1 }
    }
    def le32(v: Long): Unit = {
      out(p) = (v & 0xFF).toByte
      out(p + 1) = ((v >> 8) & 0xFF).toByte
      out(p + 2) = ((v >> 16) & 0xFF).toByte
      out(p + 3) = ((v >> 24) & 0xFF).toByte
      p += 4
    }
    put4("RIFF"); le32(riffSz); put4("AVI ")
    put4("LIST"); le32(hdrlSz); put4("hdrl")
    put4("avih"); le32(56)
    le32(40000L)            // dwMicroSecPerFrame (25 fps)
    le32(0); le32(0); le32(0)
    le32(n)                 // dwTotalFrames
    le32(0); le32(1)        // dwInitialFrames, dwStreams
    le32(bufSize)           // dwSuggestedBufferSize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0)   // reserved
    put4("LIST"); le32(strlSz); put4("strl")
    put4("strh"); le32(56)
    put4("vids"); put4("MJPG")
    le32(0); le32(0)
    le32(0)
    le32(1); le32(25L)
    le32(0); le32(n)
    le32(bufSize); le32(0xFFFFFFFFL)
    le32(0)
    le32(0); le32(0)
    put4("strf"); le32(40)
    le32(40); le32(w); le32(h)
    out(p) = 1; p += 2      // planes = 1 (LE16)
    out(p) = 24; p += 2     // bpp = 24 (LE16)
    put4("MJPG")            // biCompression
    le32(bufSize)
    le32(0); le32(0); le32(0); le32(0)
    put4("LIST"); le32(moviSz); put4("movi")
    frames.foreach { f =>
      put4("00dc"); le32(f.length.toLong)
      System.arraycopy(f, 0, out, p, f.length)
      p += f.length
      if ((f.length & 1) == 1) { out(p) = 0; p += 1 }
    }
    out
  }
}

/** `graft_avi_meta(binary[, maxPixels])` — struct(width, height,
  * n_frames, us_per_frame); null unless exactly decodable. */
case class AviMeta(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_avi_meta expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("us_per_frame", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_meta"

  override def nullSafeEval(input: Any): Any =
    AviFn.meta(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.AviFn.meta($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): AviMeta = copy(child = newChild)
}

/** `graft_avi_frame_stats(binary, frameIdx[, maxPixels])` — see
  * [[AviFn.frameStats]]; [[BmpPixelStatsFn.schema]]. */
case class AviFrameStats(left: Expression, right: Expression,
                         maxPixels: Int = 4096)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
      (right.dataType == LongType || right.dataType == IntegerType ||
        right.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_frame_stats expects (binary, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = BmpPixelStatsFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frame_stats"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(b: Any, k: Any): Any =
    AviFn.frameStats(b.asInstanceOf[Array[Byte]], asLong(k), maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = etlmudah.expr.AviFn.frameStats($b, (long)$k, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AviFrameStats =
    copy(left = l, right = r)
}

/** `graft_avi_frame_ahash(binary, frameIdx[, maxPixels])` — see
  * [[AviFn.frameAhash]]; packed like [[BmpAHash]]/[[PngAHash]]. */
case class AviFrameAHash(left: Expression, right: Expression,
                         maxPixels: Int = 4096)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
      (right.dataType == LongType || right.dataType == IntegerType ||
        right.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_avi_frame_ahash expects (binary, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frame_ahash"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(b: Any, k: Any): Any =
    AviFn.frameAhash(b.asInstanceOf[Array[Byte]], asLong(k), maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = etlmudah.expr.AviFn.frameAhash($b, (long)$k, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AviFrameAHash =
    copy(left = l, right = r)
}

/** `graft_fake_avi(seed, w, h, nFrames)` — see [[AviFn.synth]]. */
case class FakeAvi(first: Expression, second: Expression,
                   third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c =>
      c.dataType == LongType || c.dataType == IntegerType ||
        c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_avi expects (bigint, bigint, bigint, bigint)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_fake_avi"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, n: Any): Any =
    AviFn.synth(asLong(s), asLong(w), asLong(h), asLong(n))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, n) =>
      s"${ev.value} = etlmudah.expr.AviFn.synth((long)$s, " +
        s"(long)$w, (long)$h, (long)$n);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      o: Expression): FakeAvi = FakeAvi(f, s, t, o)
}

/** `graft_fake_mjpeg_avi(seed, w, h, nFrames)` — see
  * [[AviFn.synthMjpeg]]; the entropy-coded twin of [[FakeAvi]]. */
case class FakeMjpegAvi(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c =>
      c.dataType == LongType || c.dataType == IntegerType ||
        c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_mjpeg_avi expects (bigint, bigint, bigint, bigint)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_fake_mjpeg_avi"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, n: Any): Any =
    AviFn.synthMjpeg(asLong(s), asLong(w), asLong(h), asLong(n))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, n) =>
      s"${ev.value} = etlmudah.expr.AviFn.synthMjpeg((long)$s, " +
        s"(long)$w, (long)$h, (long)$n);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      o: Expression): FakeMjpegAvi = FakeMjpegAvi(f, s, t, o)
}
