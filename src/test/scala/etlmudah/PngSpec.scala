package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** PNG decode tier: synth→decode roundtrip against the closed form
  * (all five scanline filters), cross-format perceptual-hash equality
  * with the BMP tier, transcode composition, and hostile fixtures. */
class PngSpec extends SparkSpec {

  private def closedForm(seed: Long, w: Int, h: Int)
      : Seq[(Int, Int, Int)] =
    for (fr <- 0 until h; c <- 0 until w) yield (
      Math.floorMod(seed * 13 + fr * 7 + c * 3, 256L).toInt,
      Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toInt,
      Math.floorMod(seed * 7 + fr * 3 + c, 256L).toInt)

  test("synth→stats roundtrip equals the closed form — dims covering all five filters") {
    // h up to 7 exercises filter types 0..4 (row v uses v % 5)
    for (seed <- Seq(0L, 1L, 42L, -3L, 999983L); w <- Seq(1, 2, 5, 8);
         h <- Seq(1, 2, 5, 6, 7)) {
      val png = PngFn.synth(seed, w, h)
      val st = PngFn.stats(png, 4096)
      assert(st != null, s"seed=$seed ${w}x$h must decode")
      val px = closedForm(seed, w, h)
      assert(st.getLong(0) == w && st.getLong(1) == h &&
        st.getLong(2) == w.toLong * h)
      val rs = px.map(_._1); val gs = px.map(_._2); val bs = px.map(_._3)
      assert(st.getInt(3) == rs.min && st.getInt(4) == rs.max &&
        st.getLong(5) == rs.map(_.toLong).sum, s"R seed=$seed ${w}x$h")
      assert(st.getInt(7) == gs.min && st.getInt(8) == gs.max &&
        st.getLong(9) == gs.map(_.toLong).sum, s"G seed=$seed ${w}x$h")
      assert(st.getInt(11) == bs.min && st.getInt(12) == bs.max &&
        st.getLong(13) == bs.map(_.toLong).sum, s"B seed=$seed ${w}x$h")
    }
  }

  test("cross-format: PNG and BMP of one seed hash identically; transcode composes") {
    for (seed <- Seq(0L, 7L, 123L, 100003L); w <- Seq(3, 8, 11);
         h <- Seq(2, 7, 9)) {
      val png = PngFn.synth(seed, w, h)
      val bmp = BmpPixelStatsFn.synth(seed, w, h)
      val hp = PngFn.ahash(png, 4096)
      val hb = BmpPixelStatsFn.ahash(bmp, 4096)
      assert(hp != null && hb != null)
      assert(hp.getLong(0) == hb.getLong(0) &&
        hp.getLong(1) == hb.getLong(1),
        s"cross-format ahash mismatch seed=$seed ${w}x$h")
      // transcode: BMP kernels over the transcoded blob agree
      val tb = PngFn.toBmp24(png, 4096)
      assert(tb != null)
      val hs = BmpPixelStatsFn.ahash(tb, 4096)
      assert(hs.getLong(0) == hb.getLong(0) &&
        hs.getLong(1) == hb.getLong(1))
      val sb = BmpPixelStatsFn.stats(tb, 4096)
      val sp = PngFn.stats(png, 4096)
      // BMP schema orders B,G,R; PNG orders R,G,B
      assert(sb.getLong(5) == sp.getLong(13))  // b_sum
      assert(sb.getLong(9) == sp.getLong(9))   // g_sum
      assert(sb.getLong(13) == sp.getLong(5))  // r_sum
      // resize composes: PNG→BMP→resize(2)→stats decodes
      if (w >= 2 && h >= 2) {
        val rz = BmpPixelStatsFn.resize(tb, 2, 4096)
        val sr = BmpPixelStatsFn.stats(rz, 4096)
        assert(sr != null && sr.getLong(0) == w / 2 &&
          sr.getLong(1) == h / 2)
      }
    }
  }

  test("hostile fixtures null cleanly — never a partial statistic") {
    val good = PngFn.synth(5L, 6, 6)
    assert(PngFn.stats(good, 4096) != null)
    // truncated: every prefix of a valid file
    for (cut <- Seq(0, 4, 8, 20, 33, good.length / 2, good.length - 1))
      assert(PngFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // bad signature
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(PngFn.stats(badSig, 4096) == null)
    // corrupt a pixel byte inside IDAT: CRC must catch it
    val badCrc = good.clone(); badCrc(45) = (badCrc(45) ^ 0x5A).toByte
    assert(PngFn.stats(badCrc, 4096) == null)
    // interlaced / 16-bit / palette / RGBA headers (fix the CRC so the
    // gate that rejects them is the FIELD check, not the checksum)
    def withIhdrByte(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone()
      b(8 + 8 + off) = v   // sig(8) + len+type(8) + IHDR data offset
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      val cv = crc.getValue
      var i = 0
      while (i < 4) {
        b(8 + 8 + 13 + i) = ((cv >> (24 - 8 * i)) & 0xFF).toByte
        i += 1
      }
      b
    }
    assert(PngFn.stats(withIhdrByte(12, 1), 4096) == null) // interlaced
    assert(PngFn.stats(withIhdrByte(8, 16), 4096) == null) // 16-bit
    assert(PngFn.stats(withIhdrByte(9, 3), 4096) == null)  // palette
    assert(PngFn.stats(withIhdrByte(9, 6), 4096) == null)  // RGBA
    // oversized: maxPixels gate fires before any inflate
    assert(PngFn.stats(PngFn.synth(1L, 10, 10), 99) == null)
    assert(PngFn.stats(PngFn.synth(1L, 10, 10), 100) != null)
    // unsigned-32 dims whose Long product overflows negative (CRC
    // fixed so the DIMENSION gate is what rejects, not the checksum):
    // must null, never wrap into a negative-size allocation
    def withIhdrDims(ww: Long, hh: Long): Array[Byte] = {
      val b = good.clone()
      var i = 0
      while (i < 4) {
        b(16 + i) = ((ww >> (24 - 8 * i)) & 0xFF).toByte
        b(20 + i) = ((hh >> (24 - 8 * i)) & 0xFF).toByte
        i += 1
      }
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13)
      val cv = crc.getValue
      i = 0
      while (i < 4) {
        b(8 + 8 + 13 + i) = ((cv >> (24 - 8 * i)) & 0xFF).toByte
        i += 1
      }
      b
    }
    assert(PngFn.stats(withIhdrDims(0xFFFFFFFFL, 0xFFFFFFFFL), 4096) == null)
    assert(PngFn.stats(withIhdrDims(0x80000000L, 0x80000000L), 4096) == null)
    assert(PngFn.stats(withIhdrDims(0xFFFFFFFFL, 1L), 4096) == null)
    assert(PngFn.stats(withIhdrDims(1L, 0xFFFFFFFFL), 4096) == null)
    // garbage
    assert(PngFn.stats(Array.fill[Byte](64)(0x42), 4096) == null)
    assert(PngFn.stats(Array.emptyByteArray, 4096) == null)
  }

  test("registered SQL functions: end-to-end over a frame, codegen path") {
    import spark.implicits._
    val df = (0L until 40L).toDF("id").select(col("id"),
      Multimodal.fakePng24(col("id"), (col("id") % 4 + 1),
        (col("id") % 6 + 1)).as("png"),
      Multimodal.fakeBmp24(col("id"), (col("id") % 4 + 1),
        (col("id") % 6 + 1)).as("bmp"))
    val out = df.select(
      Multimodal.pngPixelStats(col("png")).as("ps"),
      Multimodal.pngAHash(col("png")).as("ph"),
      Multimodal.bmpAHash(col("bmp")).as("bh"),
      Multimodal.bmpPixelStats(
        Multimodal.pngToBmp24(col("png"))).as("ts"))
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(3))
      assert(r.getStruct(1) == r.getStruct(2),
        "png/bmp ahash must agree through the SQL surface")
    }
    // null propagation through the registered functions
    val nulls = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "png")
      .select(Multimodal.pngPixelStats(col("png")).as("s"),
        Multimodal.pngAHash(col("png")).as("h"),
        Multimodal.pngToBmp24(col("png")).as("t"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("Adam7 tier: seven-pass scatter undone exactly — pixels, hash, transcode all match sequential") {
    // dims chosen so passes degenerate every way: single pixel (only
    // pass 1), w or h <= 4 (passes 2/3 empty), odd sizes, and a case
    // where all seven passes are non-trivial
    for (seed <- Seq(0L, 4L, 77L); (w, h) <- Seq(
        (1, 1), (2, 1), (1, 2), (4, 3), (3, 4), (5, 5), (8, 8),
        (9, 12), (17, 10), (23, 31))) {
      val si = PngFn.synthInterlaced(seed, w, h)
      val sq = PngFn.synth(seed, w, h)
      val di = PngFn.toBmp24(si, 4096)
      val dq = PngFn.toBmp24(sq, 4096)
      assert(di != null && dq != null, s"seed=$seed ${w}x$h")
      assert(java.util.Arrays.equals(di, dq),
        s"Adam7 decode must be the IDENTICAL image seed=$seed ${w}x$h")
      val hi = PngFn.ahash(si, 4096)
      val hq = PngFn.ahash(sq, 4096)
      assert(hi.getLong(0) == hq.getLong(0) && hi.getLong(1) == hq.getLong(1))
    }
    // hostile: truncated pass data (short inflate) and interlace > 1
    val g = PngFn.synthInterlaced(5L, 17, 10)
    for (cut <- Seq(40, g.length / 2, g.length - 5))
      assert(PngFn.stats(g.take(cut), 4096) == null, s"cut=$cut")
    // corrupt the IHDR interlace byte to 2 (and re-CRC): must null
    val bad = g.clone()
    bad(8 + 8 + 12) = 2 // IHDR data byte 12 (interlace)
    val crc = new java.util.zip.CRC32()
    crc.update(bad, 12, 4 + 13)
    val cv = crc.getValue
    bad(8 + 8 + 13) = ((cv >> 24) & 0xFF).toByte
    bad(8 + 8 + 14) = ((cv >> 16) & 0xFF).toByte
    bad(8 + 8 + 15) = ((cv >> 8) & 0xFF).toByte
    bad(8 + 8 + 16) = (cv & 0xFF).toByte
    assert(PngFn.stats(bad, 4096) == null, "interlace=2 must null")
  }
}
