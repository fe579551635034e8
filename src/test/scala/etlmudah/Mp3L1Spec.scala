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

  private val interopFrames: String =
    "ffffe8c052130013320238e11e130258103000e801bca635ee2209fdca7200d5ed4d7d09" +
    "42808ace676d4ad64330897e9281f374551f79c4c063fae16a936b07f3d7e1e541e86247" +
    "bc7f184efd80a92b334430b79692c82f65ee1bf56318b77c63e5fb4f5b39bbf838c58480" +
    "76c962cb56e7d6d32b180e567a05e3f956a59449bf31dfe1da6da2a5679b26fb950f33b8" +
    "188c9eebfa4fe2a8638d1f025e57a1e43ac6b28a4b8d112c51a1e1e678a0a80b61f5fe5f" +
    "048abc0022b1571a1f081fe4457ca59ed4f2727702cdf07a6f1e578123b12011eb180605" +
    "c16b1727d2a82a925d690b65182f376ec79592cf5368b83fde2f047acba6bc347d33226e" +
    "4a987bbd3123d2e636268d90689c4fe0c77ecd261d3294d410218c2e1ad6c4344d9f7250" +
    "c53228167c1675b8ee470c770b8154fe01a92f4670c4ec118387f26b1aa3ce9dc335e786" +
    "59402b74043135365b1999f8ebce41a2934fcd692025afe249a3773a30794ed53adf2de0" +
    "f2d1fce77788a164971ec0aff55acaae5e5ea0b003e1a72d5a94fee463fcabf17e73d6a1" +
    "3146932a57b53ca0c15e3ea3d5a96db94a5f15612a804f1a874ffc07a5e85d3e671c6dab" +
    "80b793578abfac5d5440a97feb5facab0d40206262ec04e66d9bcd97757e6ff4a70b5e84" +
    "a5242b3cfa5a0761710166df4a7c37109416c87d892038f4967fae99119bb9c77daf56ac" +
    "0034720c5866909e7089f0c0ed68e03aa1758c46fee003994b5ac4d3113ef179567d9edb" +
    "86c00ee74cc210103723dfd1792179ac8dc6f084c8b37dfb9b69de9c9eb194bf6cfa1bec" +
    "9da125bad9ca7be6b8be55711765ed687fa198fc1678dcc2ae42873baa633748cc9b3d5d" +
    "1251006df2c92e7ce6c38e6471b66e37259ce7bda1160394d15c30515e174da5dbc8181e" +
    "c9b64632b3710f8ce7148fafb2ac8d902e76004e733dfd15ffffe8c00000302205382500" +
    "5e180503388000024d3b5d5d95ed0716432201811c16f55beeb21a7ecf49ffd1ed80adc7" +
    "0d38172a24aebecd64c95f0b9d49c6372a4de071c613b010599f5cba10e383272adebb1a" +
    "90d2b3977423f071e0e2ee7d21d19baa1fd00297850d475c9652870d9a45bdeeb98851e8" +
    "c61ed71d2b39814fa8eb434089245e372ed759ea9143646f4511529cd778bbfb655fb1c8" +
    "2bc78d022f4c0926737dc846500213a6d83644536f4036191acf2f9eb8a018ee2b388b20" +
    "2df5d8dfa0125f2f98d4f91707aba6b2c1a08a0457c8e96132697d49335e0c5e162dc434" +
    "b6ec212092fd2d892d3a8e21f74d5d0c8bd64ed457ad6310b3ae39bc5078780d9d8546a7" +
    "db98e5ca37ea7fdb263df1e035b384253357f7038861a8421b8621717269b28491efa159" +
    "f04409699bac5ef86dba891f09b74626307f3edfe6be1f36fb4acb7edc431fd819232291" +
    "1bc249d03a5c5785ca93b8d39643ede4b15c89d6c4bb1ae7af90a5c85e62db40115bd4f0" +
    "c3cf843c2bd5c95abcbd07f7eb57b8de1f1b7980cc92c49b716229b64324d21a83e07e12" +
    "68ab9c46ac44b16f39a5d126fc0987a25a0c709b70676d54548541c6a40d20b70db2bd58" +
    "583a5f03ba8af96e5e3b4b1ee6da460a06b0c8b29c540bf4ab3a3f5f2d78db28693073c6" +
    "d16fdbe769cf9053f71d9c1b7678254db90b56d5d6a306393f4e097535dd5265321a817a" +
    "4e30a40672cfa7c32278cd1431fc9c5287647bd2537ad97d94c15d74b72802c3445c66f4" +
    "d35f046b1f523816a8e898950abaef4c1de242cc5ebe0bff4718b50140687d0db15543aa" +
    "49c5b911e5239a235feac0d3e54c4dd7cd12186e243655432be6fc8d934a1362ab01439f" +
    "e4c3defb56bf28db428887dc6b81d82d775779e80ffb48901470e945ce55184c30b7b0fe" +
    "eae54ae5418242d446fbfdbaffffe8c03051008335223182030e1832e0e0228899ea35ac" +
    "f4dea82aeb534d3da356f638b020128377712b0ecc2066975346e1d34a84eb5619606cba" +
    "540b5bc5443935e6888a18f5d968af721fea2b7e6d48f52991f2c6fe8d009057101a0f66" +
    "f75a350d1f0aaf4bc08c5aa448ca5f52c81a351da5b490dbb7b1c1b3fd5933d9b1a88d4e" +
    "8957ab4772d7f1e637a8892f6b58db5740380ec741e20f6ee85129a5a5e00a141ee27077" +
    "511540f5975de6e444b8820e5b127cd58917507beef90a65b6d99bc650ca9b7b23830958" +
    "6214dbfd5513a559cf384af8e62d3c678b85ef28ef5b219aadacb85ad7ee18d10df7117c" +
    "f15fc67d2fc64adb9a7044e63d6d5d9ff2daa7a06f30e9d41a28d52ef44ca2813a06dab8" +
    "f6bf634f57439b5cb9534fa2874b5983e650bba9132dfd0d230db47c2f4b768fd10cdaa4" +
    "13dfba77a29ee92fad78af62a57dc5f293c77cf4a893f3e3c1b974eb990ab2a8e2648f37" +
    "bdbbb0af225b532871f9dc07105764ab6b411a9c7a53256c95bfdd4023982e88459879d3" +
    "674c130a77ea354d38feea0e2392c96ac3eac3697d7f9fdd4decc67d7dddbe6afe480a95" +
    "5056b0c8a7020559114fa4adc74d374d24538ed471dfc55e1bb50ada2527a263fb1a97a5" +
    "24caf5b861f01ba675ebe70e93aebd12c1befeb787ab80918bf8010c7fb3bad983e5c021" +
    "01b9e80bba5b5ab1c20d1ac6261c50e747e5cc559b6e12569fed5e739badd33af2ae3c61" +
    "8b81f455dbe249678500b8fc4c88b536b2db2bc70c41ba948d631400c87a5140f57ecd2a" +
    "701e7c3127df7f2c5dc5ea892a8569a5bae2502eeedf6e86c5af0e37f0a903bb1c3d7adb" +
    "1d94b95ee900fdd0260dfbfeb1d71ff573abd6eedfe8476cd30962fbf9713b117a334507" +
    "1aaf8fd8d307f71b6daf1d95ef8abcb0334ca1e322a661a1be55f21d2779f2adc857675e"

  test("interop: frames from an independent reference writer — silent subbands, 15-bit codes, random ancillary tails") {
    // generated outside this codebase with content graft's synth never
    // emits: allocation 0 (silent subbands must be SKIPPED, not read),
    // allocation 14 (15-bit codes), and random non-zero ancillary
    // bytes (must be skipped by frame-length arithmetic, not content)
    val b = interopFrames.grouped(2)
      .map(x => Integer.parseInt(x, 16).toByte).toArray
    val st = Mp3L1Fn.stats(b, 4096)
    assert(st != null, "reference frames must decode")
    assert(st.getLong(0) == 3L && st.getLong(1) == 67L)
    assert(st.getLong(2) == 1834L, "scf_sum")
    assert(st.getLong(3) == 804L)
    assert(st.getInt(4) == 0 && st.getInt(5) == 32663)
    assert(st.getLong(6) == 1264583L, "code_sum")
  }
}
