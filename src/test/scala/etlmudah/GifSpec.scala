package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** GIF LZW decode tier: synth→decode equals the block closed form
  * (real dictionary compression incl. code-width growth and the 4096
  * reset), four-container hash parity, transcode composition, hostile
  * fixtures. */
class GifSpec extends SparkSpec {

  private def blockVal(seed: Long, by: Int, bx: Int): Int =
    Math.floorMod(seed * 17 + by * 5 + bx * 3, 256L).toInt

  test("synth -> stats equals the block-constant brute force; large images cross the 4096-entry reset") {
    for (seed <- Seq(0L, 1L, 7L, 41L); (w, h) <- Seq(
        (1, 1), (7, 5), (9, 12), (17, 10), (64, 64), (200, 150))) {
      val st = GifFn.stats(GifFn.synth(seed, w, h), 1 << 20)
      assert(st != null, s"seed=$seed ${w}x$h must decode")
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
    // a genuinely large stream exercises code widths up to 12 bits
    // and at least one dictionary reset (1024x512 = 524288 px)
    val big = GifFn.stats(GifFn.synth(5L, 1024, 512), 1 << 20)
    assert(big != null && big.getLong(2) == 1024L * 512)
  }

  test("four-container hash parity: GIF (LZW) == BMP (raw) == JPEG (DCT) on one visual image") {
    for (seed <- Seq(0L, 3L, 12L, 99L); (w, h) <- Seq(
        (8, 8), (9, 12), (17, 10), (24, 24))) {
      val ga = GifFn.ahash(GifFn.synth(seed, w, h), 4096)
      val ba = BmpPixelStatsFn.ahash(
        BmpPixelStatsFn.synthBlocks(seed, w, h), 4096)
      val ja = JpegFn.ahash(JpegFn.synth(seed, w, h), 4096)
      assert(ga != null && ba != null && ja != null)
      assert(ga.getLong(0) == ba.getLong(0) && ga.getLong(1) == ba.getLong(1))
      assert(ga.getLong(0) == ja.getLong(0) && ga.getLong(1) == ja.getLong(1),
        s"containers disagree seed=$seed ${w}x$h")
    }
  }

  test("transcode composes: gif->bmp24 then the BMP kernels equal the native path") {
    for (seed <- Seq(2L, 8L); (w, h) <- Seq((9, 12), (16, 8))) {
      val g = GifFn.synth(seed, w, h)
      val tb = GifFn.toBmp24(g, 4096)
      assert(tb != null)
      val hb = BmpPixelStatsFn.ahash(tb, 4096)
      val hg = GifFn.ahash(g, 4096)
      assert(hb.getLong(0) == hg.getLong(0) &&
        hb.getLong(1) == hg.getLong(1))
      val rz = BmpPixelStatsFn.resize(tb, 2, 4096)
      val sr = BmpPixelStatsFn.stats(rz, 4096)
      assert(sr != null && sr.getLong(0) == w / 2 && sr.getLong(1) == h / 2)
    }
  }

  test("hostile fixtures null cleanly — never a partial statistic") {
    val good = GifFn.synth(5L, 9, 12)
    assert(GifFn.stats(good, 4096) != null)
    for (cut <- Seq(0, 3, 6, 12, 40, good.length / 2, good.length - 1))
      assert(GifFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // bad signature / version
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(GifFn.stats(badSig, 4096) == null)
    // interlace flag on the image descriptor
    def find2c(b: Array[Byte]): Int =
      (13 + 768 until b.length).find(i => (b(i) & 0xFF) == 0x2C).get
    val il = good.clone(); il(find2c(il) + 9) = 0x40.toByte
    assert(GifFn.stats(il, 4096) == null)
    // local-color-table flag
    val lc = good.clone(); lc(find2c(lc) + 9) = 0x80.toByte
    assert(GifFn.stats(lc, 4096) == null)
    // corrupt an LZW byte mid-stream: output-length/dictionary gates
    // must catch it (GIF has no CRC — structural detection only)
    val corr = good.clone()
    val lz = find2c(corr) + 12
    corr(lz + 4) = (corr(lz + 4) ^ 0x7F).toByte
    assert(GifFn.stats(corr, 4096) == null)
    // oversize gate (9*12 = 108)
    assert(GifFn.stats(GifFn.synth(5L, 9, 12), 107) == null)
    assert(GifFn.stats(GifFn.synth(5L, 9, 12), 108) != null)
    // trailing garbage after the trailer
    assert(GifFn.stats(good ++ Array[Byte](1), 4096) == null)
    // garbage / empty
    assert(GifFn.stats(Array.fill[Byte](64)(0x42), 4096) == null)
    assert(GifFn.stats(Array.emptyByteArray, 4096) == null)
  }

  test("registered SQL functions: end-to-end over a frame, codegen path") {
    import spark.implicits._
    val df = (0L until 40L).toDF("id").select(col("id"),
      Multimodal.fakeGif(col("id"), (col("id") % 13 + 4),
        (col("id") % 9 + 3)).as("gif"),
      Multimodal.fakeBmpBlocks(col("id"), (col("id") % 13 + 4),
        (col("id") % 9 + 3)).as("bmp"))
    val out = df.select(
      Multimodal.gifPixelStats(col("gif")).as("gs"),
      Multimodal.gifAHash(col("gif")).as("gh"),
      Multimodal.bmpAHash(col("bmp")).as("bh"),
      Multimodal.bmpPixelStats(
        Multimodal.gifToBmp24(col("gif"))).as("ts"))
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(3))
      assert(r.getStruct(1) == r.getStruct(2),
        "gif/bmp ahash must agree through the SQL surface")
    }
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "gif")
      .select(Multimodal.gifPixelStats(col("gif")).as("s")).collect().head
    assert(bad.isNullAt(0))
  }
}
