package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** AVI frame-sampling tier: synth→decode roundtrip against the
  * closed form, cross-CONTAINER hash parity (AVI frame == BMP ==
  * PNG of the same seed), and hostile fixtures. */
class AviSpec extends SparkSpec {

  test("meta + every frame's stats equal the shifted-seed BMP closed form") {
    for (seed <- Seq(0L, 9L, 777L); w <- Seq(1, 3, 6); h <- Seq(1, 4, 5);
         n <- Seq(1, 3)) {
      val avi = AviFn.synth(seed, w, h, n)
      val m = AviFn.meta(avi, 4096)
      assert(m != null && m.getLong(0) == w && m.getLong(1) == h &&
        m.getLong(2) == n && m.getLong(3) == 40000L)
      for (k <- 0 until n) {
        val fs = AviFn.frameStats(avi, k, 4096)
        val bs = BmpPixelStatsFn.stats(
          BmpPixelStatsFn.synth(seed + k, w, h), 4096)
        assert(fs != null && bs != null)
        (0 until 15).foreach(i =>
          assert(fs.get(i, null) == bs.get(i, null),
            s"field $i seed=$seed k=$k ${w}x$h"))
      }
      // out-of-range frame indices null, never wrap
      assert(AviFn.frameStats(avi, n, 4096) == null)
      assert(AviFn.frameStats(avi, -1, 4096) == null)
    }
  }

  test("cross-container: AVI frame hash == BMP hash == PNG hash of the same seed") {
    for (seed <- Seq(3L, 41L); w <- Seq(4, 9); h <- Seq(3, 8)) {
      val avi = AviFn.synth(seed, w, h, 3)
      for (k <- 0 until 3) {
        val fa = AviFn.frameAhash(avi, k, 4096)
        val ba = BmpPixelStatsFn.ahash(
          BmpPixelStatsFn.synth(seed + k, w, h), 4096)
        val pa = PngFn.ahash(PngFn.synth(seed + k, w, h), 4096)
        assert(fa.getLong(0) == ba.getLong(0) &&
          fa.getLong(1) == ba.getLong(1))
        assert(fa.getLong(0) == pa.getLong(0) &&
          fa.getLong(1) == pa.getLong(1),
          s"containers disagree seed=$seed k=$k ${w}x$h")
      }
    }
  }

  test("hostile fixtures null cleanly") {
    val good = AviFn.synth(5L, 4, 4, 2)
    assert(AviFn.meta(good, 4096) != null)
    for (cut <- Seq(0, 8, 11, 40, 100, good.length / 2, good.length - 1))
      assert(AviFn.meta(good.take(cut), 4096) == null, s"cut=$cut")
    // wrong signature / wrong form type
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(AviFn.meta(badSig, 4096) == null)
    val badForm = good.clone(); badForm(8) = 'W'.toByte
    assert(AviFn.meta(badForm, 4096) == null)
    // compressed stream (strf biCompression != 0) rejected: find strf
    def find(b: Array[Byte], s: String): Int = {
      val pat = s.getBytes("US-ASCII")
      (0 to b.length - 4).find(i => pat.indices.forall(j =>
        b(i + j) == pat(j))).getOrElse(-1)
    }
    val strf = find(good, "strf")
    val comp = good.clone(); comp(strf + 8 + 16) = 1
    assert(AviFn.meta(comp, 4096) == null)
    // frame-count lie (avih says one more than movi carries)
    val avih = find(good, "avih")
    val lie = good.clone(); lie(avih + 8 + 16) = 3
    assert(AviFn.meta(lie, 4096) == null)
    // oversize gate before any frame walk
    assert(AviFn.meta(AviFn.synth(1L, 10, 10, 1), 99) == null)
    assert(AviFn.meta(AviFn.synth(1L, 10, 10, 1), 100) != null)
    // unsigned-32 dims whose Long product overflows negative: patch
    // avih AND strf to the same huge dims (so the strf cross-check
    // passes and the DIMENSION gate is what must reject) — must null,
    // never wrap stride/frameBytes into mis-indexed frame walks
    def withDims(wv: Long, hv: Long): Array[Byte] = {
      val b = good.clone()
      val av = find(b, "avih"); val sf = find(b, "strf")
      var i = 0
      while (i < 4) {
        b(av + 8 + 32 + i) = ((wv >> (8 * i)) & 0xFF).toByte
        b(av + 8 + 36 + i) = ((hv >> (8 * i)) & 0xFF).toByte
        b(sf + 8 + 4 + i) = ((wv >> (8 * i)) & 0xFF).toByte
        b(sf + 8 + 8 + i) = ((hv >> (8 * i)) & 0xFF).toByte
        i += 1
      }
      b
    }
    assert(AviFn.meta(withDims(0xFFFFFFFFL, 0xFFFFFFFFL), 4096) == null)
    assert(AviFn.meta(withDims(0x80000000L, 0x80000000L), 4096) == null)
    assert(AviFn.meta(withDims(0xFFFFFFFFL, 1L), 4096) == null)
    assert(AviFn.meta(withDims(1L, 0xFFFFFFFFL), 4096) == null)
    assert(AviFn.meta(Array.emptyByteArray, 4096) == null)
  }

  test("registered SQL surface: uniform frame sampling end to end") {
    import spark.implicits._
    val df = (0L until 20L).toDF("id").select(col("id"),
      Multimodal.fakeAvi(col("id"), lit(4), lit(3),
        (col("id") % 3 + 2)).as("avi"))
    val m = df.select(col("id"), Multimodal.aviMeta(col("avi")).as("m"))
      .select(col("id"), col("m.n_frames").as("nf")).collect()
    assert(m.forall(r => r.getLong(1) == r.getLong(0) % 3 + 2))
    // sample frame floor(k*n/2) for k=0,1 (uniform 2-of-n), hash them
    val sampled = df
      .select(col("id"), explode(sequence(lit(0), lit(1))).as("k"),
        col("avi"))
      .select(col("id"), col("k"),
        Multimodal.aviFrameAHash(col("avi"),
          expr("k * (id % 3 + 2) div 2")).as("ah"))
      .collect()
    assert(sampled.length == 40 && sampled.forall(!_.isNullAt(2)))
    // null propagation
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "avi")
      .select(Multimodal.aviMeta(col("avi")).as("m"),
        Multimodal.aviFrameStats(col("avi"), lit(0)).as("s")).collect().head
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }
}
