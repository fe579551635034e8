package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.multimodal.Multimodal

/** MPEG-1 Layer I bitstream tier: synth→stats equals the closed-form
  * brute force over allocations/scalefactors/sample codes, hostile
  * fixtures null whole, SQL surface codegen path. The PCM synthesis
  * stage is scoped out by spec design (11172-4 RMS compliance — see
  * the [[Mp3L1Fn]] scoping note); this suite pins the maximal exact
  * (integer) surface. */
class Mp3L1Spec extends SparkSpec {

  private def brute(seed: Long, nf: Int) = {
    val alloc = Array.tabulate(32)(sb => ((seed + sb) % 4 + 1).toInt)
    var nAlloc = 0L; var scfSum = 0L; var nSamples = 0L
    var cMin = Int.MaxValue; var cMax = -1; var cSum = 0L
    for (fr <- 0 until nf) {
      for (sb <- 0 until 32) {
        scfSum += Math.floorMod(seed * 3 + fr * 7 + sb * 5, 63L)
        nAlloc += 1
      }
      for (s <- 0 until 12; sb <- 0 until 32) {
        val nb = alloc(sb) + 1
        val code = Math.floorMod(
          seed * 31 + fr * 17 + s * 13 + sb * 11, 1L << nb).toInt
        cMin = math.min(cMin, code); cMax = math.max(cMax, code)
        cSum += code; nSamples += 1
      }
    }
    (nf.toLong, nAlloc, scfSum, nSamples, cMin, cMax, cSum)
  }

  test("synth -> stats equals the closed-form brute force over the full integer surface") {
    for (seed <- Seq(0L, 1L, 7L, 41L, 999L); nf <- Seq(1, 2, 3, 8)) {
      val st = Mp3L1Fn.stats(Mp3L1Fn.synth(seed, nf), 4096)
      assert(st != null, s"seed=$seed nf=$nf must decode")
      val (f, a, sc, n, mn, mx, su) = brute(seed, nf)
      assert(st.getLong(0) == f && st.getLong(1) == a)
      assert(st.getLong(2) == sc, s"scf_sum seed=$seed nf=$nf")
      assert(st.getLong(3) == n)
      assert(st.getInt(4) == mn && st.getInt(5) == mx)
      assert(st.getLong(6) == su, s"code_sum seed=$seed nf=$nf")
    }
  }

  test("hostile fixtures null whole: truncation, bad sync/version/layer/mode, forbidden alloc, reserved scf") {
    val good = Mp3L1Fn.synth(9L, 3)
    assert(Mp3L1Fn.stats(good, 4096) != null)
    // truncation — mid-header, mid-frame, mid-last-frame all null;
    // a cut at an exact FRAME boundary is a valid shorter stream
    for (cut <- Seq(0, 2, 100, 672 + 10, good.length - 1))
      assert(Mp3L1Fn.stats(good.take(cut), 4096) == null, s"cut=$cut")
    val oneFrame = Mp3L1Fn.stats(good.take(672), 4096)
    assert(oneFrame != null && oneFrame.getLong(0) == 1L,
      "a frame-boundary cut is a valid 1-frame stream")
    // trailing garbage after the last frame
    assert(Mp3L1Fn.stats(good ++ Array[Byte](0), 4096) == null)
    def mut(i: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(i) = v.toByte; b
    }
    assert(Mp3L1Fn.stats(mut(0, 0xFE), 4096) == null, "broken sync")
    assert(Mp3L1Fn.stats(mut(1, 0xF7), 4096) == null, "MPEG-2 ID")
    assert(Mp3L1Fn.stats(mut(1, 0xFD), 4096) == null, "Layer II")
    assert(Mp3L1Fn.stats(mut(1, 0xFE), 4096) == null, "CRC flagged")
    assert(Mp3L1Fn.stats(mut(2, 0xF8), 4096) == null, "forbidden bitrate 15")
    assert(Mp3L1Fn.stats(mut(2, 0xEC), 4096) == null, "reserved samplerate")
    assert(Mp3L1Fn.stats(mut(3, 0x00), 4096) == null, "stereo mode")
    assert(Mp3L1Fn.stats(mut(3, 0xC2), 4096) == null, "reserved emphasis")
    // forbidden allocation 15: force the first 4 alloc bits to 1111
    val fa = good.clone(); fa(4) = 0xF0.toByte
    assert(Mp3L1Fn.stats(fa, 4096) == null)
    // maxFrames runaway gate
    assert(Mp3L1Fn.stats(good, 2) == null)
    assert(Mp3L1Fn.stats(good, 3) != null)
    // garbage / empty
    assert(Mp3L1Fn.stats(Array.fill[Byte](64)(0x11), 4096) == null)
    assert(Mp3L1Fn.stats(Array.emptyByteArray, 4096) == null)
  }

  test("SQL surface: codegen path over a frame, nulls propagate") {
    import spark.implicits._
    val df = (0L until 30L).toDF("id").select(col("id"),
      Multimodal.fakeMp3L1(col("id"), col("id") % 3 + 1).as("mp3"))
    val out = df.select(Multimodal.mp3L1Stats(col("mp3")).as("st"))
      .collect()
    assert(out.length == 30 && out.forall(!_.isNullAt(0)))
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("id", "mp3")
      .select(Multimodal.mp3L1Stats(col("mp3")).as("s")).collect().head
    assert(bad.isNullAt(0))
  }
}
