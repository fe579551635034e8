package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** Pins the baseline-JPEG decode tier: the DC-only closed form
  * (synth → decode returns exactly the block-constant image), stats
  * against brute-force, cross-format hash parity with the
  * block-constant BMP twin through two independent decode paths,
  * transcode composition, the general-IDCT path against a direct
  * double-precision reference, and hostile fixtures. */
class JpegSpec extends SparkSpec {

  private def blockVal(seed: Long, by: Int, bx: Int): Int =
    Math.floorMod(seed * 17 + by * 5 + bx * 3, 256L).toInt

  test("synth -> stats equals the block-constant brute force, dims across MCU edges") {
    for (seed <- Seq(0L, 1L, 7L, 41L); (w, h) <- Seq(
        (1, 1), (7, 5), (8, 8), (9, 3), (16, 17), (24, 11))) {
      val st = JpegFn.stats(JpegFn.synth(seed, w, h), 4096)
      assert(st != null, s"seed=$seed ${w}x$h must decode")
      // brute force over the closed form (R = G = B = blockVal)
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield blockVal(seed, y / 8, x / 8)
      assert(st.getLong(0) == w && st.getLong(1) == h &&
        st.getLong(2) == w.toLong * h)
      for (ch <- 0 until 3) {
        val base = 3 + ch * 4
        assert(st.getInt(base) == vals.min, s"min ch=$ch $seed ${w}x$h")
        assert(st.getInt(base + 1) == vals.max)
        assert(st.getLong(base + 2) == vals.map(_.toLong).sum)
      }
    }
  }

  test("cross-format: JPEG ahash == block-BMP ahash through two independent decoders") {
    for (seed <- Seq(0L, 3L, 12L, 99L); (w, h) <- Seq(
        (8, 8), (9, 12), (17, 10), (24, 24))) {
      val ja = JpegFn.ahash(JpegFn.synth(seed, w, h), 4096)
      val ba = BmpPixelStatsFn.ahash(
        BmpPixelStatsFn.synthBlocks(seed, w, h), 4096)
      assert(ja != null && ba != null)
      assert(ja.getLong(0) == ba.getLong(0) &&
        ja.getLong(1) == ba.getLong(1),
        s"containers disagree seed=$seed ${w}x$h")
      // and the stats agree too (same pixels, channel order aside:
      // gray image, so all channels equal)
      val js = JpegFn.stats(JpegFn.synth(seed, w, h), 4096)
      val bs = BmpPixelStatsFn.stats(
        BmpPixelStatsFn.synthBlocks(seed, w, h), 4096)
      assert(js.getLong(5) == bs.getLong(5)) // r_sum == b_sum (gray)
    }
  }

  test("transcode composes: jpeg->bmp24 then the BMP kernels equal the native path") {
    for (seed <- Seq(2L, 8L); (w, h) <- Seq((9, 12), (16, 8))) {
      val jp = JpegFn.synth(seed, w, h)
      val tb = JpegFn.toBmp24(jp, 4096)
      assert(tb != null)
      val sb = BmpPixelStatsFn.stats(tb, 4096)
      val sp = JpegFn.stats(jp, 4096)
      assert(sb != null && sb.getLong(0) == w && sb.getLong(1) == h)
      // BMP stats are B,G,R order; JPEG stats R,G,B — gray so equal
      assert(sb.getLong(5) == sp.getLong(13))
      assert(sb.getLong(9) == sp.getLong(9))
      assert(sb.getLong(13) == sp.getLong(5))
      val hb = BmpPixelStatsFn.ahash(tb, 4096)
      val hj = JpegFn.ahash(jp, 4096)
      assert(hb.getLong(0) == hj.getLong(0) &&
        hb.getLong(1) == hj.getLong(1))
      // resize composes on the transcoded output
      val rz = BmpPixelStatsFn.resize(tb, 2, 4096)
      val sr = BmpPixelStatsFn.stats(rz, 4096)
      assert(sr != null && sr.getLong(0) == w / 2 && sr.getLong(1) == h / 2)
    }
  }

  test("general IDCT path: AC-bearing blocks match a direct double-precision reference") {
    // hand-build a single-MCU grayscale JPEG carrying known
    // coefficients, decode it, and compare every sample against the
    // textbook 2-D IDCT computed independently here
    def cos(x: Int, u: Int): Double =
      math.cos((2 * x + 1) * u * math.Pi / 16) *
        (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
    def refIdct(coef: Array[Int]): Array[Int] = {
      val out = new Array[Int](64)
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (v <- 0 until 8; u <- 0 until 8)
          s += cos(x, u) * cos(y, v) * coef(v * 8 + u)
        val p = math.floor(s / 4.0 + 0.5).toInt + 128
        out(y * 8 + x) = math.max(0, math.min(255, p))
      }
      out
    }
    // encoder for one 8x8 grayscale block with arbitrary natural-order
    // coefficients (quant all ones): DC cat table = Annex K, AC table
    // with EOB, ZRL and sizes 1..10 under run 0..3 is overkill — use
    // the library's own synth for the container and splice? no:
    // build a minimal stream with a 4-bit-indexable AC table instead.
    // Simpler: encode AC coefficients via the SEQUENTIAL spec path
    // using a custom AC Huffman table that contains exactly the
    // (run,size) symbols we emit, in canonical order.
    val coef = new Array[Int](64)
    coef(0) = 8 * 20 // DC: flat 20 above mid-gray
    coef(1) = 37     // (v=0,u=1)
    coef(8) = -22    // (v=1,u=0)
    coef(2 * 8 + 3) = 11
    coef(7 * 8 + 7) = -3
    // zigzag positions of the AC coefficients we set
    val zig = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    // emit (run, size, bits) per nonzero AC in zigzag order
    case class Sym(rs: Int, bits: Int, nbits: Int)
    var run = 0
    val syms = scala.collection.mutable.ArrayBuffer[Sym]()
    for (k <- 1 until 64) {
      val v = coef(zig(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { syms += Sym(0xF0, 0, 0); run -= 16 }
        var s = 0; var a = math.abs(v)
        while (a > 0) { s += 1; a >>= 1 }
        syms += Sym((run << 4) | s,
          if (v > 0) v else v + (1 << s) - 1, s)
        run = 0
      }
    }
    syms += Sym(0x00, 0, 0) // EOB
    // canonical AC table over the distinct symbols used (sorted):
    // all at length ceil(log2(n)) via a simple bits vector
    val used = syms.map(_.rs).distinct.sorted
    var len = 1
    while ((1 << len) < used.size + 1) len += 1 // +1 keeps all-ones free
    val acBits = Array.fill(17)(0); acBits(len) = used.size
    val acCode = used.zipWithIndex.toMap
    // DC Annex K codes
    val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = (0 to 11).toArray
    def canon(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l)) {
          m += vals(k) -> ((code, l)); code += 1; k += 1
        }
        code <<= 1
      }
      m.result()
    }
    val dcC = canon(dcBits, dcVals)
    val acC = canon(acBits, used.toArray)
    val out = new java.io.ByteArrayOutputStream()
    def mk(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, b: Array[Int]): Unit = {
      mk(m); val l = b.length + 2
      out.write((l >> 8) & 0xFF); out.write(l & 0xFF); b.foreach(out.write)
    }
    mk(0xD8)
    seg(0xDB, Array(0x00) ++ Array.fill(64)(1))
    seg(0xC0, Array(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    seg(0xC4, Array(0x00) ++ dcBits.drop(1) ++ dcVals)
    seg(0xC4, Array(0x10) ++ acBits.drop(1) ++ used)
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0))
    var buf = 0; var cnt = 0
    def put(code: Int, n: Int): Unit = {
      for (i <- (n - 1) to 0 by -1) {
        buf = (buf << 1) | ((code >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(buf); if (buf == 0xFF) out.write(0); buf = 0; cnt = 0
        }
      }
    }
    // DC
    var s = 0; var a = math.abs(coef(0))
    while (a > 0) { s += 1; a >>= 1 }
    val (dcw, dcl) = dcC(s)
    put(dcw, dcl)
    if (s > 0) put(if (coef(0) > 0) coef(0) else coef(0) + (1 << s) - 1, s)
    syms.foreach { sy =>
      val (cw, cl) = acC(sy.rs); put(cw, cl)
      if (sy.nbits > 0) put(sy.bits, sy.nbits)
    }
    if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
    mk(0xD9)
    val st = JpegFn.stats(out.toByteArray, 4096)
    assert(st != null, "AC-bearing stream must decode")
    val ref = refIdct(coef)
    assert(st.getLong(2) == 64)
    for (ch <- 0 until 3) { // grayscale replicated to RGB
      val base = 3 + ch * 4
      assert(st.getInt(base) == ref.min, s"ch=$ch min")
      assert(st.getInt(base + 1) == ref.max, s"ch=$ch max")
      assert(st.getLong(base + 2) == ref.map(_.toLong).sum, s"ch=$ch sum")
    }
  }

  test("hostile fixtures null cleanly — never a partial statistic") {
    val good = JpegFn.synth(5L, 9, 12)
    assert(JpegFn.stats(good, 4096) != null)
    // truncated: every prefix of a valid file
    for (cut <- Seq(0, 1, 2, 4, 20, good.length / 2, good.length - 1))
      assert(JpegFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // bad signature
    val badSig = good.clone(); badSig(1) = 0x00
    assert(JpegFn.stats(badSig, 4096) == null)
    // progressive (SOF2) and other non-baseline frames
    def find(b: Array[Byte], m: Int): Int =
      (0 until b.length - 1).find(i =>
        (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == m).getOrElse(-1)
    val sof = find(good, 0xC0)
    for (bad <- Seq(0xC2, 0xC1, 0xC3, 0xC9, 0xCB)) {
      val b = good.clone(); b(sof + 1) = bad.toByte
      assert(JpegFn.stats(b, 4096) == null, f"SOF$bad%02X")
    }
    // 4:2:0 / 4:2:2 sampling factors on component 1
    for (hv <- Seq(0x22, 0x21, 0x12)) {
      val b = good.clone(); b(sof + 11) = hv.toByte
      assert(JpegFn.stats(b, 4096) == null, f"sampling $hv%02X")
    }
    // 16-bit sample precision
    val b16 = good.clone(); b16(sof + 4) = 16
    assert(JpegFn.stats(b16, 4096) == null)
    // oversize gate (9*12=108 pixels)
    assert(JpegFn.stats(JpegFn.synth(5L, 9, 12), 107) == null)
    assert(JpegFn.stats(JpegFn.synth(5L, 9, 12), 108) != null)
    // truncated entropy stream: chop mid-scan, keep EOI
    val eoi = Array(0xFF.toByte, 0xD9.toByte)
    assert(JpegFn.stats(good.dropRight(8).dropRight(2) ++ eoi, 4096) == null)
    // trailing garbage after EOI
    assert(JpegFn.stats(good ++ Array[Byte](0, 1, 2), 4096) == null)
    // corrupt a DHT: zero value count
    val dht = find(good, 0xC4)
    val bd = good.clone()
    for (i <- 0 until 16) bd(dht + 5 + i) = 0
    assert(JpegFn.stats(bd, 4096) == null)
    // garbage / empty
    assert(JpegFn.stats(Array.fill[Byte](64)(0x42), 4096) == null)
    assert(JpegFn.stats(Array.emptyByteArray, 4096) == null)
  }

  test("registered SQL functions: end-to-end over a frame, codegen path") {
    import spark.implicits._
    val df = (0L until 40L).toDF("id").select(col("id"),
      Multimodal.fakeJpeg(col("id"), (col("id") % 13 + 4),
        (col("id") % 9 + 3)).as("jpg"),
      Multimodal.fakeBmpBlocks(col("id"), (col("id") % 13 + 4),
        (col("id") % 9 + 3)).as("bmp"))
    val out = df.select(
      Multimodal.jpegPixelStats(col("jpg")).as("js"),
      Multimodal.jpegAHash(col("jpg")).as("jh"),
      Multimodal.bmpAHash(col("bmp")).as("bh"),
      Multimodal.bmpPixelStats(
        Multimodal.jpegToBmp24(col("jpg"))).as("ts"))
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(3))
      assert(r.getStruct(1) == r.getStruct(2),
        "jpeg/bmp ahash must agree through the SQL surface")
    }
    // null propagation on garbage
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "jpg")
      .select(Multimodal.jpegPixelStats(col("jpg")).as("s"),
        Multimodal.jpegAHash(col("jpg")).as("h")).collect().head
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("JFIF color-transform constants are libjpeg's FIX() values exactly") {
    // libjpeg jdcolor.c: FIX(x) = (INT32)(x * 65536 + 0.5). Note
    // FIX(1.77200) is 116130, NOT 116131: 1.772*65536 = 116129.792.
    def fix(x: Double): Int = (x * 65536 + 0.5).toInt
    assert(fix(1.40200) == 91881)   // Cr -> R
    assert(fix(0.34414) == 22554)   // Cb -> G
    assert(fix(0.71414) == 46802)   // Cr -> G
    assert(fix(1.77200) == 116130)  // Cb -> B
    // and a chroma-bearing decode exercises them end-to-end: a
    // synthetic 4:4:4 JPEG with NON-neutral constant chroma must land
    // on the same fixed-point transform applied to the closed form
    // (guarded by the existing chroma tests; this pins the constants)
  }

  test("4:2:0 + restart intervals: same closed-form pixels as 4:4:4 through 16x16 MCUs, partial edges, cycling RSTn") {
    for (seed <- Seq(0L, 3L, 41L); (w, h) <- Seq(
        (1, 1), (7, 5), (16, 16), (17, 10), (33, 18), (64, 48));
        ri <- Seq(0, 1, 3)) {
      val st = JpegFn.stats(JpegFn.synth420(seed, w, h, ri), 1 << 20)
      assert(st != null, s"seed=$seed ${w}x$h ri=$ri must decode")
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield Math.floorMod(seed * 17 + (y / 8) * 5 + (x / 8) * 3, 256L).toInt
      assert(st.getLong(0) == w && st.getLong(1) == h)
      for (ch <- 0 until 3) {
        val base = 3 + ch * 4
        assert(st.getInt(base) == vals.min, s"min ch=$ch $seed ${w}x$h ri=$ri")
        assert(st.getInt(base + 1) == vals.max)
        assert(st.getLong(base + 2) == vals.map(_.toLong).sum,
          s"sum ch=$ch seed=$seed ${w}x$h ri=$ri")
      }
      // and the perceptual hash matches the 4:4:4 container byte-for-byte
      val h420 = JpegFn.ahash(JpegFn.synth420(seed, w, h, ri), 1 << 20)
      val h444 = JpegFn.ahash(JpegFn.synth(seed, w, h), 1 << 20)
      assert(h420.getLong(0) == h444.getLong(0) &&
        h420.getLong(1) == h444.getLong(1),
        s"4:2:0 and 4:4:4 must hash identically seed=$seed ${w}x$h")
    }
    // 64x48 at ri=1 is 12 MCUs -> 11 restarts: the RSTn index CYCLES
    // past D7 back to D0 (covered above; this pins the count)
    assert((64 / 16) * (48 / 16) == 12)
  }

  test("4:2:2 (2x1 luma) decodes the same closed form; 4:4:0 (1x2) too") {
    for (seed <- Seq(5L, 12L); (w, h) <- Seq((9, 12), (24, 17));
        (hs, vs) <- Seq((2, 1), (1, 2))) {
      val st = JpegFn.stats(
        JpegFn.synthSub(seed, w, h, hs, vs, 2, 128, 128), 1 << 20)
      assert(st != null, s"${hs}x$vs seed=$seed ${w}x$h")
      val vals = for (y <- 0 until h; x <- 0 until w)
        yield Math.floorMod(seed * 17 + (y / 8) * 5 + (x / 8) * 3, 256L).toInt
      assert(st.getLong(5) == vals.map(_.toLong).sum &&
        st.getLong(9) == vals.map(_.toLong).sum)
    }
  }

  test("4:2:0 with NON-neutral constant chroma: replicated upsample + exact fixed-point transform") {
    def fixTransform(y: Int, cbv: Int, crv: Int): (Int, Int, Int) = {
      val cb = cbv - 128; val cr = crv - 128
      def cl(v: Int) = math.max(0, math.min(255, v))
      (cl(y + ((91881 * cr + 32768) >> 16)),
        cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)),
        cl(y + ((116130 * cb + 32768) >> 16)))
    }
    for ((cbv, crv) <- Seq((100, 150), (200, 60)); seed <- Seq(7L)) {
      val (w, h) = (20, 13)
      val d = JpegFn.stats(
        JpegFn.synthSub(seed, w, h, 2, 2, 0, cbv, crv), 1 << 20)
      assert(d != null)
      val px = for (y <- 0 until h; x <- 0 until w) yield {
        val lum = Math.floorMod(
          seed * 17 + (y / 8) * 5 + (x / 8) * 3, 256L).toInt
        fixTransform(lum, cbv, crv)
      }
      assert(d.getLong(5) == px.map(_._1.toLong).sum, "R sum")
      assert(d.getLong(9) == px.map(_._2.toLong).sum, "G sum")
      assert(d.getLong(13) == px.map(_._3.toLong).sum, "B sum")
    }
  }

  test("restart-interval hostile fixtures null whole: wrong RSTn index, truncation, stripped marker") {
    val good = JpegFn.synth420(9L, 48, 32, 1) // 3x2 MCUs, 5 restarts
    assert(JpegFn.stats(good, 4096) != null)
    // locate the first RST marker (FF D0 in the entropy segment)
    val i = good.indices.dropWhile(i => i + 1 >= good.length ||
      (good(i) & 0xFF) != 0xFF || (good(i + 1) & 0xFF) != 0xD0).head
    // wrong index: D0 -> D1 desyncs the expected cycle
    val wrong = good.clone(); wrong(i + 1) = 0xD1.toByte
    assert(JpegFn.stats(wrong, 4096) == null, "wrong RST index must null")
    // strip the marker entirely: stream starves / misaligns
    val stripped = good.take(i) ++ good.drop(i + 2)
    assert(JpegFn.stats(stripped, 4096) == null, "missing RST must null")
    // truncate mid-MCU
    for (cut <- Seq(good.length / 3, good.length / 2, good.length - 3))
      assert(JpegFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // DRI declared but interval impossible (0 disables - still fine)
    assert(JpegFn.stats(JpegFn.synth420(9L, 48, 32, 0), 4096) != null)
  }

  test("fakeJpeg420 SQL surface: codegen path, cross-container hash parity with BMP") {
    import spark.implicits._
    val df = (0L until 30L).toDF("id").select(col("id"),
      Multimodal.fakeJpeg420(col("id"), col("id") % 29 + 4,
        col("id") % 23 + 3, col("id") % 3 + 1).as("jpg"),
      Multimodal.fakeBmpBlocks(col("id"), col("id") % 29 + 4,
        col("id") % 23 + 3).as("bmp"))
    val out = df.select(
      Multimodal.jpegPixelStats(col("jpg")).as("js"),
      Multimodal.jpegAHash(col("jpg")).as("jh"),
      Multimodal.bmpAHash(col("bmp")).as("bh")).collect()
    assert(out.length == 30)
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(r.getStruct(1) == r.getStruct(2),
        "4:2:0 jpeg/bmp ahash must agree through the SQL surface")
    }
  }

  test("progressive (SOF2): seven-scan successive approximation decodes the IDENTICAL image as sequential") {
    for (seed <- Seq(0L, 3L, 41L); (w, h) <- Seq(
        (1, 1), (7, 5), (16, 16), (17, 10), (33, 18), (64, 48));
        (hs, vs) <- Seq((1, 1), (2, 2)); ri <- Seq(0, 2)) {
      val prog = JpegFn.synthProg(seed, w, h, hs, vs, ri, 128, 128)
      val seqn = JpegFn.synthSub(seed, w, h, hs, vs, ri, 128, 128)
      val dp = JpegFn.toBmp24(prog, 1 << 20)
      val ds = JpegFn.toBmp24(seqn, 1 << 20)
      assert(dp != null && ds != null, s"seed=$seed ${w}x$h ${hs}x$vs ri=$ri")
      assert(java.util.Arrays.equals(dp, ds),
        s"progressive != sequential seed=$seed ${w}x$h ${hs}x$vs ri=$ri")
    }
    // non-neutral chroma through the progressive path too
    val p2 = JpegFn.toBmp24(JpegFn.synthProg(7L, 20, 13, 2, 2, 0, 100, 150), 4096)
    val s2 = JpegFn.toBmp24(JpegFn.synthSub(7L, 20, 13, 2, 2, 0, 100, 150), 4096)
    assert(p2 != null && java.util.Arrays.equals(p2, s2))
  }

  test("progressive AC refinement: hand-built value-bearing scans equal the baseline stream of the same coefficients") {
    // one 8x8 grayscale block; FINAL coefficients DC=51, zz1=+5,
    // zz2=-3, zz3=+1 decoded two ways: a baseline single scan, and a
    // four-scan successive approximation where zz3 is a NEW
    // coefficient placed DURING AC refinement (the correction-bit
    // path a DC-only synth never drives). Key spec asymmetry
    // exercised: the DC point transform is an ARITHMETIC shift, the
    // AC one is SIGN-MAGNITUDE (toward zero), so -3 at Al=1 codes as
    // -1 and refines -2 -> -3 away from zero.
    class BW { // MSB-first with byte stuffing
      val out = new java.io.ByteArrayOutputStream()
      private var buf = 0; private var cnt = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          buf = (buf << 1) | ((code >> i) & 1); cnt += 1
          if (cnt == 8) {
            out.write(buf); if (buf == 0xFF) out.write(0)
            buf = 0; cnt = 0
          }
          i -= 1
        }
      }
      def flush(): Array[Byte] = {
        if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
        out.toByteArray
      }
    }
    val acSyms = Seq(0x00, 0x01, 0x02, 0x11) // 3-bit canonical codes
    val acCode = acSyms.zipWithIndex.map { case (v, i) => v -> i }.toMap
    def headTo(sofMarker: Int): java.io.ByteArrayOutputStream = {
      val o = new java.io.ByteArrayOutputStream()
      def m(x: Int) = { o.write(0xFF); o.write(x) }
      def seg(x: Int, b: Seq[Int]) = {
        m(x); o.write(0); o.write(b.length + 2); b.foreach(o.write)
      }
      m(0xD8)
      seg(0xDB, Seq(0x00) ++ Seq.fill(64)(1))
      seg(sofMarker, Seq(8, 0, 8, 0, 8, 1, 1, 0x11, 0))
      seg(0xC4, Seq(0x00) ++ // DC: 12 categories as 4-bit codes
        Seq(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ (0 to 11))
      seg(0xC4, Seq(0x10) ++ // AC: 4 symbols as 3-bit codes
        Seq(0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++ acSyms)
      o
    }
    def putDc(bw: BW, diff: Int): Unit = {
      var s0 = 0; var a = math.abs(diff)
      while (a > 0) { s0 += 1; a >>= 1 }
      bw.put(s0, 4)
      if (s0 > 0) bw.put(if (diff > 0) diff else diff + (1 << s0) - 1, s0)
    }
    def sos(o: java.io.ByteArrayOutputStream, ss: Int, se: Int,
            ahal: Int): Unit = {
      o.write(0xFF); o.write(0xDA)
      o.write(0); o.write(8)
      Seq(1, 1, 0x00, ss, se, ahal).foreach(o.write)
    }
    // ---- baseline: one full scan carrying the FINAL coefficients
    // (the 4-symbol AC table covers categories 1-2 and EOB, so the
    // fixture uses DC=51, zz1=+2, zz2=-3, zz3=+1)
    val base2 = headTo(0xC0)
    sos(base2, 0, 63, 0)
    locally {
      val bw = new BW
      putDc(bw, 51)
      bw.put(acCode(0x02), 3); bw.put(2, 2)  // zz1 = +2 (cat 2: 10)
      bw.put(acCode(0x02), 3); bw.put(0, 2)  // zz2 = -3 (cat 2: 00)
      bw.put(acCode(0x01), 3); bw.put(1, 1)  // zz3 = +1 (cat 1: 1)
      bw.put(acCode(0x00), 3)                // EOB
      val b = bw.flush(); base2.write(b, 0, b.length)
    }
    base2.write(0xFF); base2.write(0xD9)
    val dBase = JpegFn.decode(base2.toByteArray, 4096)
    assert(dBase != null, "hand-built baseline must decode")
    // ---- progressive, same coefficients:
    val prog = headTo(0xC2)
    sos(prog, 0, 0, 0x01) // DC first, Al=1: 51>>1 = 25
    locally { val bw = new BW; putDc(bw, 25)
      val b = bw.flush(); prog.write(b, 0, b.length) }
    sos(prog, 0, 0, 0x10) // DC refine to Al=0: bit0(51) = 1
    locally { val bw = new BW; bw.put(1, 1)
      val b = bw.flush(); prog.write(b, 0, b.length) }
    sos(prog, 1, 63, 0x01) // AC first, Al=1 (sign-magnitude):
    locally {
      val bw = new BW
      bw.put(acCode(0x01), 3); bw.put(1, 1) // zz1: +2 -> +1 (cat 1: 1)
      bw.put(acCode(0x01), 3); bw.put(0, 1) // zz2: -3 -> -1 (cat 1: 0)
      bw.put(acCode(0x00), 3)               // EOB (zz3 invisible at Al=1)
      val b = bw.flush(); prog.write(b, 0, b.length)
    }
    sos(prog, 1, 63, 0x10) // AC refine to Al=0
    locally {
      val bw = new BW
      // place NEW +1: symbol (r=0, s=1), sign bit, then the advance
      // walks zz1 (nonzero history: correction bit 0 keeps +2) and
      // zz2 (nonzero history: correction bit 1 refines -2 -> -3),
      // landing the new +1 at zz3 — then EOB covers the rest
      bw.put(acCode(0x01), 3)
      bw.put(1, 1) // sign: +1
      bw.put(0, 1) // zz1 correction: 2 stays 2
      bw.put(1, 1) // zz2 correction: -2 -> -3
      bw.put(acCode(0x00), 3)
      val b = bw.flush(); prog.write(b, 0, b.length)
    }
    prog.write(0xFF); prog.write(0xD9)
    val dProg = JpegFn.decode(prog.toByteArray, 4096)
    assert(dProg != null, "hand-built progressive must decode")
    assert(java.util.Arrays.equals(dProg.rgb, dBase.rgb),
      "progressive refinement must reconstruct the baseline coefficients exactly")
  }

  test("progressive hostile fixtures: incomplete scripts and illegal scans null whole") {
    val good = JpegFn.synthProgressive420(9L, 33, 18, 2)
    assert(JpegFn.stats(good, 4096) != null)
    // truncation anywhere
    for (cut <- Seq(0, 20, 200, good.length / 2, good.length - 3))
      assert(JpegFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // drop the LAST scan (find the final SOS, cut there, re-append
    // EOI): the AC band of the last component never reaches Al=0 ->
    // the completeness gate must null, never render a half image
    val sosAt = (0 until good.length - 1).filter(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA)
    assert(sosAt.length == 7, s"expected 7 scans, got ${sosAt.length}")
    val dropped = good.take(sosAt.last) ++ Array(0xFF.toByte, 0xD9.toByte)
    assert(JpegFn.stats(dropped, 4096) == null,
      "incomplete successive-approximation script must null")
    // duplicated first scan (Ah=0 over an already-covered band)
    val dup = good.take(sosAt(1)) ++ good.slice(sosAt(0), sosAt(1)) ++
      good.drop(sosAt(1))
    assert(JpegFn.stats(dup, 4096) == null, "re-covered band must null")
    assert(JpegFn.stats(JpegFn.synthProgressive420(9L, 33, 18, 0), 4096) != null)
  }
}
