package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** TIFF decode tier: synth→decode roundtrip against the block closed
  * form in BOTH byte orders, cross-format perceptual-hash equality
  * with the BMP tier, transcode composition, and structural hostiles
  * (TIFF has no checksum — the JPEG discipline). */
class TiffSpec extends SparkSpec {

  private def blockPx(seed: Long, w: Int, h: Int): Seq[Int] =
    for (y <- 0 until h; c <- 0 until w)
      yield Math.floorMod(seed * 17 + (y / 8) * 5 + (c / 8) * 3,
        256L).toInt

  test("synth→stats roundtrip equals the block closed form — both byte orders, multi-strip ledgers") {
    for (seed <- Seq(0L, 1L, 42L, 999983L); w <- Seq(1, 4, 9, 16);
         h <- Seq(1, 3, 5, 6, 11, 13); be <- Seq(0L, 1L)) {
      // h in {1,3,5} → single strip; {6,11,13} → 2-3 strips with a
      // short last strip
      val tiff = TiffFn.synth(seed, w, h, be)
      val st = TiffFn.stats(tiff, 4096)
      assert(st != null, s"seed=$seed ${w}x$h be=$be must decode")
      val px = blockPx(seed, w, h)
      assert(st.getLong(0) == w && st.getLong(1) == h &&
        st.getLong(2) == w.toLong * h)
      for (ch <- 0 until 3)
        assert(st.getInt(3 + ch * 4) == px.min &&
          st.getInt(4 + ch * 4) == px.max &&
          st.getLong(5 + ch * 4) == px.map(_.toLong).sum,
          s"channel $ch seed=$seed ${w}x$h be=$be")
      // the two byte orders are different BYTES, identical numbers
      if (be == 1L) {
        val le = TiffFn.synth(seed, w, h, 0L)
        assert(!java.util.Arrays.equals(le, tiff) || w * h == 0,
          "byte orders must differ on the wire")
        val sl = TiffFn.stats(le, 4096)
        for (f <- 0 until 15)
          assert(sl.get(f, null) == st.get(f, null),
            s"LE/BE field $f seed=$seed")
      }
    }
  }

  test("cross-format: TIFF and BMP of one seed hash identically; transcode composes") {
    for (seed <- Seq(0L, 7L, 123L); w <- Seq(4, 11, 16);
         h <- Seq(3, 7, 12); be <- Seq(0L, 1L)) {
      val tiff = TiffFn.synth(seed, w, h, be)
      val bmp = BmpPixelStatsFn.synthBlocks(seed, w, h)
      val ht = TiffFn.ahash(tiff, 4096)
      val hb = BmpPixelStatsFn.ahash(bmp, 4096)
      assert(ht != null && hb != null)
      assert(ht.getLong(0) == hb.getLong(0) &&
        ht.getLong(1) == hb.getLong(1),
        s"cross-format ahash mismatch seed=$seed ${w}x$h be=$be")
      // transcode: canonical BMP bytes equal the BMP synth's
      val tb = TiffFn.toBmp24(tiff, 4096)
      assert(tb != null && java.util.Arrays.equals(tb, bmp),
        s"transcode must reproduce the BMP leg byte-for-byte")
    }
  }

  test("structural hostiles null cleanly — TIFF has no checksum, so the gates are the contract") {
    val good = TiffFn.synth(5L, 9, 11, 0L)
    assert(TiffFn.stats(good, 4096) != null)
    // truncation ladder: every prefix fails some bounds check
    for (cut <- Seq(0, 4, 8, 20, good.length / 2, good.length - 2))
      assert(TiffFn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    // bad magic / mixed magic
    val badMagic = good.clone(); badMagic(2) = 0x2B
    assert(TiffFn.stats(badMagic, 4096) == null)
    val mixed = good.clone(); mixed(0) = 0x4D
    assert(TiffFn.stats(mixed, 4096) == null)
    // locate the IFD to corrupt entries surgically
    def u32le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
        ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    val ifd = u32le(good, 4)
    // descending tags: swap the first two entries' tag ids
    val shuffled = good.clone()
    for (i <- 0 until 12) {
      val t = shuffled(ifd + 2 + i)
      shuffled(ifd + 2 + i) = shuffled(ifd + 14 + i)
      shuffled(ifd + 14 + i) = t
    }
    assert(TiffFn.stats(shuffled, 4096) == null,
      "6.0 ascending-tag order must be enforced")
    // unsupported claims, each a single patched IFD value:
    // entry layout: [tag(2) type(2) count(4) value(4)] from ifd+2
    def patchValue(entryIdx: Int, v: Byte): Array[Byte] = {
      val b = good.clone()
      b(ifd + 2 + entryIdx * 12 + 8) = v
      b
    }
    // entries (ascending): 0=256 w, 1=257 h, 2=258 bps, 3=259 comp,
    // 4=262 photometric, 5=273 offs, 6=277 spp, 7=278 rps, 8=279
    // cnts, 9=284 planar
    assert(TiffFn.stats(patchValue(3, 5), 4096) == null,
      "LZW compression claim must null (out of scope, fail closed)")
    assert(TiffFn.stats(patchValue(4, 1), 4096) == null,
      "non-RGB photometric must null")
    assert(TiffFn.stats(patchValue(6, 4), 4096) == null,
      "SamplesPerPixel 4 must null")
    assert(TiffFn.stats(patchValue(9, 2), 4096) == null,
      "planar configuration must null")
    // strip ledger lies: shrink the image height by one -> the
    // ledger no longer covers exactly
    assert(TiffFn.stats(patchValue(1, 10), 4096) == null,
      "height/ledger mismatch must null")
    // oversized dims: the pre-allocation gate fires
    assert(TiffFn.stats(TiffFn.synth(1L, 10, 10, 0L), 99) == null)
    assert(TiffFn.stats(TiffFn.synth(1L, 10, 10, 1L), 100) != null)
    // garbage
    assert(TiffFn.stats(Array.fill[Byte](64)(0x42), 4096) == null)
    assert(TiffFn.stats(Array.emptyByteArray, 4096) == null)
  }

  test("registered SQL surface: BMP/TIFF pairs in both byte orders land in one hash group") {
    import spark.implicits._
    val grouped = (0L until 40L).toDF("id")
      .select(expr("id div 2").as("seed"), (col("id") % 2).as("leg"))
      .select(when(col("leg") === 0,
        Multimodal.bmpAHash(Multimodal.fakeBmpBlocks(col("seed"),
          (col("seed") % 6 + 3), (col("seed") % 4 + 2))))
        .otherwise(Multimodal.tiffAHash(Multimodal.fakeTiff(col("seed"),
          (col("seed") % 6 + 3), (col("seed") % 4 + 2),
          col("seed") % 2))).as("ah"))
      .groupBy(col("ah")).agg(count(lit(1)).as("n")).collect()
    assert(grouped.forall(_.getLong(1) % 2 == 0),
      "every BMP/TIFF pair must land whole")
    // null propagation through the registered functions
    val nulls = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "t")
      .select(Multimodal.tiffPixelStats(col("t")).as("s"),
        Multimodal.tiffAHash(col("t")).as("h"),
        Multimodal.tiffToBmp24(col("t")).as("b"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }
}
