package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** FLAC decode tier: synth→decode equals the WAV closed form (fixed
  * predictors 0–2 + verbatim frames, real Rice coding), transcode is
  * byte-identical to the raw WAV synth, multi-frame / multi-byte
  * frame-number coverage, VAD feature parity, hostile fixtures. */
class FlacSpec extends SparkSpec {

  test("synth -> stats equals the WAV tier exactly (same closed form, compressed path)") {
    for (seed <- Seq(0L, 5L, 41L); ch <- Seq(1L, 2L);
         frames <- Seq(1L, 70L, 192L, 500L, 1000L)) {
      val fs = FlacFn.stats(FlacFn.synth(seed, ch, 8000L, frames), 1 << 20)
      val ws = WavSampleStatsFn.stats(
        WavSampleStatsFn.synth(seed, ch, 8000L, frames), 1 << 20)
      assert(fs != null && ws != null, s"seed=$seed ch=$ch f=$frames")
      assert((0 until 10).forall(i => fs.get(i, null) == ws.get(i, null)),
        s"stats diverge seed=$seed ch=$ch f=$frames: $fs vs $ws")
    }
  }

  test("toWav16 reproduces the raw WAV synth byte for byte") {
    // frames=1000 -> 6 frames: stereo streams cycle ALL FOUR channel
    // assignments (independent, left/side, right/side, mid/side), so
    // byte-equality here pins every decorrelation reconstruction
    for (seed <- Seq(3L, 12L); ch <- Seq(1L, 2L);
         frames <- Seq(70L, 500L, 1000L)) {
      val wav = FlacFn.toWav16(FlacFn.synth(seed, ch, 8000L, frames), 1 << 20)
      val raw = WavSampleStatsFn.synth(seed, ch, 8000L, frames)
      assert(wav != null && java.util.Arrays.equals(wav, raw),
        s"transcode not byte-faithful seed=$seed ch=$ch f=$frames")
    }
  }

  test("features parity with the WAV tier; multi-byte frame numbers decode") {
    for (seed <- Seq(7L); frames <- Seq(60L, 25000L)) { // 25000 -> 131 frames
      val ff = FlacFn.features(FlacFn.synth(seed, 1L, 8000L, frames),
        1 << 20, 8000)
      val wf = WavSampleStatsFn.features(
        WavSampleStatsFn.synth(seed, 1L, 8000L, frames), 1 << 20, 8000)
      assert(ff != null && wf != null)
      assert((0 until 5).forall(i => ff.getLong(i) == wf.getLong(i)),
        s"features diverge f=$frames: $ff vs $wf")
    }
  }

  test("hostile fixtures null cleanly — never a partial statistic") {
    val good = FlacFn.synth(9L, 2L, 8000L, 500L)
    assert(FlacFn.stats(good, 1 << 20) != null)
    // truncation: every prefix
    for (cut <- Seq(0, 3, 8, 41, good.length / 2, good.length - 1))
      assert(FlacFn.stats(good.take(cut), 1 << 20) == null, s"cut=$cut")
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(FlacFn.stats(badMagic, 1 << 20) == null)
    // corrupt a mid-frame byte: the CRC-16 must catch it
    val corr = good.clone()
    corr(good.length / 2) = (corr(good.length / 2) ^ 0x5A).toByte
    assert(FlacFn.stats(corr, 1 << 20) == null)
    // bps lie in STREAMINFO (claim 24-bit)
    val bps = good.clone()
    bps(4 + 4 + 13) = ((bps(4 + 4 + 13) & 0x0F) | (0x17 << 4 & 0xF0)).toByte
    assert(FlacFn.stats(bps, 1 << 20) == null)
    // oversize gate: 2ch x 500 frames = 1000 samples
    assert(FlacFn.stats(good, 999) == null)
    assert(FlacFn.stats(good, 1000) != null)
    // trailing garbage after the last frame
    assert(FlacFn.stats(good ++ Array[Byte](1, 2, 3), 1 << 20) == null)
    // garbage / empty
    assert(FlacFn.stats(Array.fill[Byte](64)(0x42), 1 << 20) == null)
    assert(FlacFn.stats(Array.emptyByteArray, 1 << 20) == null)
  }

  test("registered SQL functions: end-to-end over a frame, WAV==FLAC through two decoders") {
    import spark.implicits._
    val df = (0L until 30L).toDF("id").select(col("id"),
      Multimodal.fakeFlac(col("id"), (col("id") % 2 + 1), lit(8000L),
        (col("id") % 50 + 10)).as("flac"),
      Multimodal.fakeWav16(col("id"), (col("id") % 2 + 1), lit(8000L),
        (col("id") % 50 + 10)).as("wav"))
    val out = df.select(
      Multimodal.flacSampleStats(col("flac")).as("fs"),
      Multimodal.wavSampleStats(col("wav")).as("ws"),
      Multimodal.flacFeatures(col("flac"), 8000).as("ff"),
      Multimodal.wavSampleStats(
        Multimodal.flacToWav16(col("flac"))).as("ts"))
      .collect()
    assert(out.length == 30)
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getStruct(0) == r.getStruct(1),
        "flac/wav stats must agree through the SQL surface")
      assert(r.getStruct(0) == r.getStruct(3),
        "transcode path must agree too")
    }
    // null propagation on garbage
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "flac")
      .select(Multimodal.flacSampleStats(col("flac")).as("s")).collect().head
    assert(bad.isNullAt(0))
  }
}
