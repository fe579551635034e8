package etlmudah.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL GIF pixel decode — the THIRD independent compression family
  * on the image tier: PNG is zlib (LZ77+Huffman), JPEG is DCT+Huffman
  * entropy coding, GIF is LZW DICTIONARY coding (variable-width codes
  * growing 3→12 bits, clear/EOI control codes, LSB-first bit packing
  * inside length-prefixed sub-blocks — the published GIF87a/89a
  * format). GIF is lossless, so decoded pixels are exact and the
  * closed-form-synthesis oracle discipline applies unchanged.
  *
  * Accept contract (the Bmp/Png/Jpeg discipline — every gate before
  * any pixel read): GIF87a/GIF89a signature, logical screen
  * descriptor with a GLOBAL color table, dims gated individually
  * against maxPixels BEFORE the multiply and any allocation,
  * extensions skipped by their sub-block ladder, exactly ONE image
  * whose descriptor is full-screen at (0,0) with no local color
  * table (sequential OR interlaced — the four-pass appendix-E row
  * permutation is undone after decode), LZW stream decoding to
  * EXACTLY w·h indices (every index inside the palette), the 0x3B
  * trailer, and nothing after it. Anything else — truncated blob,
  * local palettes, over/under-long LZW output, code past the
  * dictionary, missing trailer — nulls whole, never a partial
  * statistic.
  *
  * Synth emits a 256-entry GRAYSCALE palette (entry i = (i,i,i)) and
  * REAL LZW-compressed indices carrying the [[JpegFn.blockVal]]
  * block-constant closed form — the same visual image as
  * [[BmpPixelStatsFn.synthBlocks]] (raw path) and [[JpegFn.synth]]
  * (DCT path), so one picture now round-trips through THREE
  * independent decoders and must hash identically (q349/q350). The
  * encoder builds a real dictionary (resets at 4096 entries), so
  * decode exercises code growth, not just literals. */
object GifFn {

  /** Output schema — the q224 stats family in RGB order (identical
    * to [[PngFn.schema]]). */
  val schema: StructType = PngFn.schema

  /** Decoded image: interleaved RGB rows, top-down visual order. */
  private[expr] final class Decoded(val w: Int, val h: Int,
                                    val rgb: Array[Byte])

  /** Decode the image whose descriptor starts at `start` (the 0x2C
    * byte): validates full-screen at (0,0)/no local table/no
    * interlace, LZW-decodes to EXACTLY w*h palette indices into
    * `idx`, and returns the position just past the sub-block
    * terminator — or -1 on any violation (caller nulls whole). The
    * decoder widens code width at post-add dictSize == 2^len (the
    * giflib/stb late convention; see the interop fixtures). */
  private def decodeImageAt(bytes: Array[Byte], start: Int, w: Int,
                            h: Int, palSize: Int,
                            idx: Array[Int]): Int = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    var pos = start
    if (pos + 10 > bytes.length) return -1
    val left = le16(pos + 1); val top = le16(pos + 3)
    val iw = le16(pos + 5); val ih = le16(pos + 7)
    val ip = u8(pos + 9)
    if (left != 0 || top != 0 || iw != w || ih != h ||
      (ip & 0x80) != 0) return -1
    val interlaced = (ip & 0x40) != 0
    pos += 10
    if (pos >= bytes.length) return -1
    val mcs = u8(pos); pos += 1
    if (mcs < 2 || mcs > 8) return -1
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoi + 1
    var codeLen = mcs + 1
    var out = 0
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var blockLeft = 0
    var done = false
    val stack = new Array[Int](4096)
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= clear) {
        if (sp >= 4096) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (c >= palSize) return false
      if (out + sp + 1 > idx.length) return false
      idx(out) = c; out += 1
      while (sp > 0) { sp -= 1; idx(out) = stack(sp); out += 1 }
      true
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    while (!done) {
      while (bitCnt < codeLen) {
        if (blockLeft == 0) {
          if (pos >= bytes.length) return -1
          blockLeft = u8(pos); pos += 1
          if (blockLeft == 0) return -1 // starved before EOI
        }
        if (pos >= bytes.length) return -1
        bitBuf |= u8(pos).toLong << bitCnt
        bitCnt += 8
        pos += 1
        blockLeft -= 1
      }
      val code = (bitBuf & ((1L << codeLen) - 1)).toInt
      bitBuf >>= codeLen
      bitCnt -= codeLen
      if (code == clear) {
        dictSize = eoi + 1
        codeLen = mcs + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return -1 // first code must be raw
        if (!emit(code)) return -1
        prev = code
      } else {
        if (code > dictSize) return -1
        if (code == dictSize) {
          // KwKwK case: new entry = prev + first(prev)
          if (dictSize >= 4096) return -1
          prefix(dictSize) = prev
          suffix(dictSize) = firstOf(prev)
          dictSize += 1
          if (!emit(code)) return -1 // code IS the new entry
        } else {
          if (!emit(code)) return -1
          if (dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = firstOf(code)
            dictSize += 1
          }
        }
        // late (deferred) width change — giflib/stb/browser rule
        if (dictSize == (1 << codeLen) && codeLen < 12)
          codeLen += 1
        prev = code
      }
    }
    if (pos >= bytes.length) return -1
    pos += blockLeft // residual bytes of the current sub-block
    if (pos >= bytes.length || u8(pos) != 0) return -1
    pos += 1
    if (out != idx.length) return -1
    if (interlaced) {
      // GIF89a interlace (appendix E): rows are STORED in four
      // passes — 0,8,16.. / 4,12.. / 2,6,10.. / 1,3,5.. — a pure row
      // permutation of the already-decoded indices
      val tmp = new Array[Int](idx.length)
      System.arraycopy(idx, 0, tmp, 0, idx.length)
      var sr = 0
      var pass = 0
      val starts = Array(0, 4, 2, 1)
      val steps = Array(8, 8, 4, 2)
      while (pass < 4) {
        var dr = starts(pass)
        while (dr < h) {
          System.arraycopy(tmp, sr * w, idx, dr * w, w)
          sr += 1
          dr += steps(pass)
        }
        pass += 1
      }
    }
    pos
  }

  /** Shallow walk over the image at `start`: same descriptor gates as
    * [[decodeImageAt]] but the LZW body is SKIPPED via the sub-block
    * ladder (no decode) — returns the end position or -1. */
  private def skipImageAt(bytes: Array[Byte], start: Int, w: Int,
                          h: Int): Int = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    var pos = start
    if (pos + 10 > bytes.length) return -1
    val left = le16(pos + 1); val top = le16(pos + 3)
    val iw = le16(pos + 5); val ih = le16(pos + 7)
    val ip = u8(pos + 9)
    if (left != 0 || top != 0 || iw != w || ih != h ||
      (ip & 0x80) != 0) return -1 // interlace OK: a row permutation
    pos += 10
    if (pos >= bytes.length) return -1
    val mcs = u8(pos); pos += 1
    if (mcs < 2 || mcs > 8) return -1
    var len = if (pos < bytes.length) u8(pos) else return -1
    while (len != 0) {
      pos += 1 + len
      if (pos >= bytes.length) return -1
      len = u8(pos)
    }
    pos + 1
  }

  /** Full accept gate + LZW decode; null unless EXACTLY decodable. */
  private[expr] def decode(bytes: Array[Byte],
                           maxPixels: Int): Decoded = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 14) return null
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val w = le16(6)
    val h = le16(8)
    val packed = u8(10)
    if ((packed & 0x80) == 0) return null // need a global color table
    if (w < 1 || h < 1 || w > maxPixels || h > maxPixels ||
      w.toLong * h > maxPixels) return null
    val palSize = 2 << (packed & 7)
    var pos = 13
    if (pos + 3 * palSize > bytes.length) return null
    val palOff = pos
    pos += 3 * palSize
    // blocks until the image descriptor (skip extensions)
    var sawImage = false
    val idx = new Array[Int](w * h)
    while (!sawImage) {
      if (pos >= bytes.length) return null
      u8(pos) match {
        case 0x21 => // extension: label + sub-block ladder
          pos += 2
          var len = if (pos < bytes.length) u8(pos) else return null
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return null
            len = u8(pos)
          }
          pos += 1
        case 0x2C =>
          val end = decodeImageAt(bytes, pos, w, h, palSize, idx)
          if (end < 0) return null
          pos = end
          sawImage = true
        case _ => return null
      }
    }
    // trailer, and nothing after it
    if (pos >= bytes.length || u8(pos) != 0x3B ||
      pos + 1 != bytes.length) return null
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < idx.length) {
      val p = palOff + idx(i) * 3
      rgb(3 * i) = bytes(p)
      rgb(3 * i + 1) = bytes(p + 1)
      rgb(3 * i + 2) = bytes(p + 2)
      i += 1
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

  /** Perceptual average hash — the [[BmpPixelStatsFn.ahash]] /
    * [[PngFn.ahash]] / [[JpegFn.ahash]] visual convention verbatim,
    * so one picture hashes identically through all FOUR image
    * containers. */
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

  /** TRANSCODE to a canonical bottom-up BI_RGB 24bpp BMP
    * ([[PngFn.toBmp24]]'s convention verbatim). */
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

  /** Synthesize a COMPLETE GIF89a: 256-gray global palette, one
    * full-screen image, REAL LZW compression (dictionary built over
    * the stream, reset at 4096 entries) of the [[JpegFn.blockVal]]
    * block-constant indices — constant runs compress for real, so
    * the dictionary-growth path is on the oracle surface. */
  def synth(seed: Long, width: Long, height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake GIF dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write(v >> 8) }
    le16(w); le16(h)
    out.write(0x80 | 7) // global table, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    writeImage(out, seed, w, h)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Write ONE full-screen image (descriptor + REAL LZW body in the
    * sub-block ladder) whose pixels are the [[JpegFn.blockVal]]
    * closed form at `seed` — shared by [[synth]] (single image) and
    * [[synthAnim]] (one call per frame at seed+k). */
  private def writeImage(out: java.io.ByteArrayOutputStream, seed: Long,
                         w: Int, h: Int,
                         interlaced: Boolean = false): Unit = {
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write(v >> 8) }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0)
    // stored-row -> visual-row map: identity when sequential, the
    // four-pass appendix-E schedule when interlaced
    val rowOf = new Array[Int](h)
    if (interlaced) {
      var sr = 0
      var pass = 0
      val starts = Array(0, 4, 2, 1)
      val steps = Array(8, 8, 4, 2)
      while (pass < 4) {
        var dr = starts(pass)
        while (dr < h) { rowOf(sr) = dr; sr += 1; dr += steps(pass) }
        pass += 1
      }
    } else {
      var r = 0
      while (r < h) { rowOf(r) = r; r += 1 }
    }
    val mcs = 8
    out.write(mcs)
    val clear = 1 << mcs
    val eoi = clear + 1
    // real LZW encode over the index stream
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var codeLen = mcs + 1
    def putCode(c: Int): Unit = {
      bitBuf |= c.toLong << bitCnt
      bitCnt += codeLen
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xFF).toInt)
        bitBuf >>= 8
        bitCnt -= 8
      }
    }
    // dictionary: (prefixCode, nextByte) -> code
    var dict = new java.util.HashMap[Long, Integer]()
    var dictSize = eoi + 1
    putCode(clear)
    def pix(k: Int): Int = {
      val y = rowOf(k / w); val x = k % w
      JpegFn.blockVal(seed, y / 8, x / 8)
    }
    var cur = pix(0)
    var i = 1
    while (i < w * h) {
      val nb = pix(i)
      val key = (cur.toLong << 12) | nb
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue
      else {
        putCode(cur)
        if (dictSize >= 4096) {
          putCode(clear)
          dict = new java.util.HashMap[Long, Integer]()
          dictSize = eoi + 1
          codeLen = mcs + 1
        } else {
          dict.put(key, Integer.valueOf(dictSize))
          dictSize += 1
          // late-change synchronization: the decoder's dictionary
          // LAGS this one by one entry (it reconstructs entry k only
          // while processing code k+1), so the encoder widens one
          // entry AFTER the decoder's 2^len boundary — giflib applies
          // the same lag by checking the pre-add count at emit time
          if (dictSize == (1 << codeLen) + 1 && codeLen < 12)
            codeLen += 1
        }
        cur = nb
      }
      i += 1
    }
    putCode(cur)
    putCode(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xFF).toInt)
    // sub-block ladder
    val body = data.toByteArray
    var off = 0
    while (off < body.length) {
      val n = math.min(255, body.length - off)
      out.write(n)
      out.write(body, off, n)
      off += n
    }
    out.write(0) // block terminator
  }

  /** INTERLACED sibling of [[synth]]: the IDENTICAL visual image with
    * rows stored in the four-pass GIF89a appendix-E schedule — a pure
    * row permutation, so every statistic AND the row-sensitive
    * perceptual hash must land exactly where the sequential container
    * does. */
  def synthInterlaced(seed: Long, width: Long,
                      height: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake GIF dims out of range: ${width}x$height")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write(v >> 8) }
    le16(w); le16(h)
    out.write(0x80 | 7) // global table, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    writeImage(out, seed, w, h, interlaced = true)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // --- animated tier -----------------------------------------------

  /** Parsed animation: shared dims/palette + per-frame descriptor
    * offsets (each pointing at its 0x2C byte). */
  private[expr] final class Anim(val w: Int, val h: Int, val palOff: Int,
                                 val palSize: Int, val frames: Array[Int])

  /** Accept gate for the ANIMATED tier — the third frame-sampling
    * container beside DIB-AVI and MJPEG-AVI: same header/palette/dim
    * gates as [[decode]], one or MORE full-screen images, extensions
    * (GIF89a graphic-control blocks among them) walked via their
    * sub-block ladders, the 0x3B trailer, nothing after. Frame BODIES
    * are not decoded here — the walk is O(bytes); only SAMPLED frames
    * pay the LZW decode (the [[AviFn]] sampling discipline). */
  private[expr] def parseAnim(bytes: Array[Byte], maxPixels: Int): Anim = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 14) return null
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val w = le16(6)
    val h = le16(8)
    val packed = u8(10)
    if ((packed & 0x80) == 0) return null
    if (w < 1 || h < 1 || w > maxPixels || h > maxPixels ||
      w.toLong * h > maxPixels) return null
    val palSize = 2 << (packed & 7)
    var pos = 13
    if (pos + 3 * palSize > bytes.length) return null
    val palOff = pos
    pos += 3 * palSize
    val fb = Array.newBuilder[Int]
    var nFrames = 0
    var done = false
    while (!done) {
      if (pos >= bytes.length) return null
      u8(pos) match {
        case 0x21 => // extension: label + sub-block ladder
          pos += 2
          var len = if (pos < bytes.length) u8(pos) else return null
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return null
            len = u8(pos)
          }
          pos += 1
        case 0x2C =>
          fb += pos
          nFrames += 1
          val e = skipImageAt(bytes, pos, w, h)
          if (e < 0) return null
          pos = e
        case 0x3B =>
          if (pos + 1 != bytes.length) return null
          done = true
        case _ => return null
      }
    }
    if (nFrames < 1) return null
    new Anim(w, h, palOff, palSize, fb.result())
  }

  /** struct(width, height, n_frames) or null — the [[AviFn.meta]]
    * sibling for the animated-GIF container. */
  def animMeta(bytes: Array[Byte], maxPixels: Int): InternalRow = {
    val a = parseAnim(bytes, maxPixels)
    if (a == null) null
    else new GenericInternalRow(Array[Any](
      a.w.toLong, a.h.toLong, a.frames.length.toLong))
  }

  /** Frame k's pixel statistics ([[schema]], RGB order) — the
    * animated-GIF sibling of [[AviFn.frameStats]]: the container is
    * parsed shallowly, ONLY frame k pays the LZW decode. Null on a
    * hostile container or k out of range — never a partial
    * statistic. */
  def frameStats(bytes: Array[Byte], k: Long, maxPixels: Int): InternalRow = {
    val a = parseAnim(bytes, maxPixels)
    if (a == null || k < 0 || k >= a.frames.length) return null
    val idx = new Array[Int](a.w * a.h)
    if (decodeImageAt(bytes, a.frames(k.toInt), a.w, a.h, a.palSize,
      idx) < 0) return null
    val npx = a.w.toLong * a.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var nr = 255; var ng = 255; var nb = 255
    var xr = 0; var xg = 0; var xb = 0
    var i = 0
    while (i < idx.length) {
      val p = a.palOff + idx(i) * 3
      val r = bytes(p) & 0xFF
      val g = bytes(p + 1) & 0xFF
      val b = bytes(p + 2) & 0xFF
      sr += r; sg += g; sb += b
      if (r < nr) nr = r; if (r > xr) xr = r
      if (g < ng) ng = g; if (g > xg) xg = g
      if (b < nb) nb = b; if (b > xb) xb = b
      i += 1
    }
    val n = npx.toDouble
    new GenericInternalRow(Array[Any](
      a.w.toLong, a.h.toLong, npx,
      nr, xr, sr, BmpPixelStatsFn.round6(sr / n),
      ng, xg, sg, BmpPixelStatsFn.round6(sg / n),
      nb, xb, sb, BmpPixelStatsFn.round6(sb / n)))
  }

  /** Synthesize a COMPLETE ANIMATED GIF89a: global 256-gray palette,
    * `nFrames` full-screen frames each preceded by a graphic-control
    * extension (the 89a animation block: 4-byte body, 4/100s delay,
    * no transparency), frame k carrying the [[JpegFn.blockVal]]
    * closed form at seed+k — the [[AviFn.synthMjpeg]] convention, so
    * sampling tiers replay one pixel rule across all three
    * frame-sampling containers. */
  def synthAnim(seed: Long, width: Long, height: Long,
                nFrames: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width * height <= (1 << 20),
      s"fake GIF dims out of range: ${width}x$height")
    require(nFrames >= 1 && nFrames <= 64,
      s"fake GIF frame count out of range: $nFrames")
    val w = width.toInt
    val h = height.toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write(v >> 8) }
    le16(w); le16(h)
    out.write(0x80 | 7) // global table, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    var k = 0L
    while (k < nFrames) {
      // graphic-control extension: 0x21 0xF9, 4-byte block
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0)   // no disposal, no transparency
      le16(4)        // 4/100 s delay
      out.write(0)   // transparent index (unused)
      out.write(0)   // block terminator
      writeImage(out, seed + k, w, h)
      k += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }
}


/** Native expression `graft_gif_stats(binary[, maxPixels])` — see
  * [[GifFn.stats]]. */
case class GifPixelStats(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_stats expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = GifFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_stats"

  override def nullSafeEval(input: Any): Any =
    GifFn.stats(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.GifFn.stats($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): GifPixelStats = copy(child = newChild)
}

/** Native expression `graft_gif_ahash(binary[, maxPixels])` — see
  * [[GifFn.ahash]]. */
case class GifAHash(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_ahash expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("h0", LongType), StructField("h1", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_ahash"

  override def nullSafeEval(input: Any): Any =
    GifFn.ahash(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.GifFn.ahash($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): GifAHash = copy(child = newChild)
}

/** Native expression `graft_gif_to_bmp24(binary[, maxPixels])` — see
  * [[GifFn.toBmp24]]. */
case class GifToBmp24(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_to_bmp24 expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_to_bmp24"

  override def nullSafeEval(input: Any): Any =
    GifFn.toBmp24(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.GifFn.toBmp24($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): GifToBmp24 = copy(child = newChild)
}

/** Native expression `graft_fake_gif(seed, w, h)` — see
  * [[GifFn.synth]]. */
case class FakeGif(first: Expression, second: Expression,
                   third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_gif expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_gif"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    GifFn.synth(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.GifFn.synth((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakeGif =
    FakeGif(f, s, t)
}

/** Native expression `graft_gif_anim_meta(binary[, maxPixels])` — see
  * [[GifFn.animMeta]]. */
case class GifAnimMeta(child: Expression, maxPixels: Int = 4096)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gif_anim_meta expects binary, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_frames", LongType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_anim_meta"

  override def nullSafeEval(input: Any): Any =
    GifFn.animMeta(input.asInstanceOf[Array[Byte]], maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = etlmudah.expr.GifFn.animMeta($c, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): GifAnimMeta = copy(child = newChild)
}

/** Native expression `graft_gif_frame_stats(binary, frameIdx
  * [, maxPixels])` — see [[GifFn.frameStats]]; [[GifFn.schema]]
  * (RGB order, the [[GifPixelStats]] convention). */
case class GifFrameStats(left: Expression, right: Expression,
                         maxPixels: Int = 4096)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType || left.dataType == NullType) &&
      (right.dataType == LongType || right.dataType == IntegerType ||
        right.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_gif_frame_stats expects (binary, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = GifFn.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frame_stats"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(b: Any, k: Any): Any =
    GifFn.frameStats(b.asInstanceOf[Array[Byte]], asLong(k), maxPixels)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) => s"""
      ${ev.value} = etlmudah.expr.GifFn.frameStats($b, (long)$k, $maxPixels);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GifFrameStats =
    copy(left = l, right = r)
}

/** Native expression `graft_fake_anim_gif(seed, w, h, nFrames)` — see
  * [[GifFn.synthAnim]]. */
case class FakeAnimGif(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_anim_gif expects (bigint, bigint, bigint, bigint), " +
        "got " + children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_anim_gif"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any, nf: Any): Any =
    GifFn.synthAnim(asLong(s), asLong(w), asLong(h), asLong(nf))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h, nf) =>
      s"${ev.value} = etlmudah.expr.GifFn.synthAnim((long)$s, " +
        s"(long)$w, (long)$h, (long)$nf);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): FakeAnimGif = FakeAnimGif(f, s, t, q)
}

/** Native expression `graft_fake_gif_interlaced(seed, w, h)` — see
  * [[GifFn.synthInterlaced]]. */
case class FakeGifInterlaced(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType || c.dataType == NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_fake_gif_interlaced expects (bigint, bigint, bigint), got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fake_gif_interlaced"

  private def asLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(s: Any, w: Any, h: Any): Any =
    GifFn.synthInterlaced(asLong(s), asLong(w), asLong(h))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = etlmudah.expr.GifFn.synthInterlaced((long)$s, " +
        s"(long)$w, (long)$h);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FakeGifInterlaced =
    FakeGifInterlaced(f, s, t)
}
