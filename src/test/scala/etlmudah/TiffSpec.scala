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
      "an LZW claim over a raw strip must desync and null")
    assert(TiffFn.stats(patchValue(3, 7), 4096) == null,
      "an unsupported compression id must null")
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

  // ---- compression tier: LZW (early width change) + PackBits ----

  private def lcgBytes(n: Int, seed: Long = 12345L): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed
    var i = 0
    while (i < n) {
      x = (x * 1103515245L + 12345L) & 0x7FFFFFFFL
      out(i) = ((x >> 16) & 0xFF).toByte
      i += 1
    }
    out
  }

  test("compressed modes decode to the identical image: LZW+predictor and PackBits, both byte orders") {
    for (seed <- Seq(0L, 42L, 999983L); (w, h) <- Seq(
        (4, 3), (9, 11), (16, 13), (33, 29))) {
      val ref = TiffFn.toBmp24(TiffFn.synth(seed, w, h, 0L), 4096)
      for (mode <- 2L to 5L) {
        val t = TiffFn.synth(seed, w, h, mode)
        val d = TiffFn.toBmp24(t, 4096)
        assert(d != null && java.util.Arrays.equals(d, ref),
          s"mode=$mode seed=$seed ${w}x$h must decode to the same image")
      }
      // compressed wire bytes genuinely differ from uncompressed
      assert(!java.util.Arrays.equals(TiffFn.synth(seed, w, h, 0L),
        TiffFn.synth(seed, w, h, 2L)))
    }
  }

  test("LZW compressor/decompressor roundtrip on random bytes — width ladder 9..12 and Clear-on-full") {
    for (n <- Seq(1, 5, 300, 1600, 8000, 60000)) {
      val data = lcgBytes(n, seed = 7L + n)
      val z = TiffFn.lzwCompress(data)
      val out = new Array[Byte](n)
      assert(TiffFn.lzwStrip(z, 0, z.length, out, 0, n),
        s"n=$n roundtrip must decode")
      assert(java.util.Arrays.equals(out, data), s"n=$n bytes must match")
      // truncations desync or run dry: never a partial success
      for (cut <- Seq(1, z.length / 2, z.length - 1)) {
        val o2 = new Array[Byte](n)
        assert(!TiffFn.lzwStrip(z, 0, cut, o2, 0, n),
          s"n=$n cut=$cut must fail closed")
      }
    }
  }

  test("PackBits roundtrip incl. long runs, 128-literal edges, and the -128 no-op") {
    for (n <- Seq(1, 3, 384, 5000)) {
      val rowBytes = 48
      // mix long runs (block-gray-like) and noise
      val data = lcgBytes(n, seed = 3L + n).zipWithIndex.map { case (b, i) =>
        if ((i / 7) % 2 == 0) 0x55.toByte else b }
      val z = TiffFn.packBitsCompress(data, rowBytes)
      val out = new Array[Byte](n)
      assert(TiffFn.packBitsStrip(z, 0, z.length, out, 0, n))
      assert(java.util.Arrays.equals(out, data), s"n=$n")
    }
    // -128 is a spec no-op the decoder must skip
    val withNoop = Array[Byte](-128, 0, 'A', -128, -1, 'B')
    val out = new Array[Byte](3)
    assert(TiffFn.packBitsStrip(withNoop, 0, withNoop.length, out, 0, 3))
    assert(out.toSeq == Seq[Byte]('A', 'B', 'B'))
    // empty-payload edges: LZW of zero bytes is Clear+EOI and
    // roundtrips to zero bytes; PackBits of zero bytes is zero bytes
    val z0 = TiffFn.lzwCompress(Array.emptyByteArray)
    assert(TiffFn.lzwStrip(z0, 0, z0.length, Array.emptyByteArray, 0, 0))
    assert(TiffFn.packBitsCompress(Array.emptyByteArray, 3).isEmpty)
  }

  private val lzwEarlyHex: String =
    "8037008655507d5a1d2d369caac0d878be13381e4d8fd083fc32af3007408ac5a074042b" +
    "231e0e63a7937cbeae5b820b2d1770e420cb242556acc448a422ff032d8c42e6f8f1f235" +
    "7e92d282865024f84459808bc962facdd46d563505a81371a55ee07321c989c0239da436" +
    "2e8b0c0c9753d0f2f643281d69313390c4126a83596b33b854d46a1d1a1748e6d9d01046" +
    "4f3cd9cb3053e1a0dd342edf05f7d091e4d27e0610efb2e21d74b41c0c94a9b0d8f4207c" +
    "7b9e1ac7f711b5f011488a4fc934ab2c24c52bb38b4f16a05830d70caf0085b3f264caf1" +
    "51250e2c4152b0d4a91c310eac7568c870020f814762c4c869f8eb0ab799f7a701f178d6" +
    "0f25c369a05a757c9731b4d24fc57b7d448c4b88c8a6275b740e65383fcb0893533cf732" +
    "8ee0fc1c3a4e402868394de24c8d0e09c1f4bd35c5b024d439ce20cc440fc4a230c42849" +
    "0358b82e0dc1845f3448e0a0be1640e2a85006c502286a0d8293987037c551dcba370441" +
    "b4432eca902017358c03d87b020611c0d90b4c90487216c241f8c2388da2c4b20109e080" +
    "801d0372686f2400c3742e178723d409120b6160d125ce930c8c2c46e34cdd0484418832" +
    "0301429caf0fcfa030de3581333813218cb15ca011ce416cbe344452d036354883f8d200" +
    "0413c8872c40f20c5f1d0652e82811816148df220a204cd92fc423bcb7044b5378071fcc" +
    "91e4ba38ca81604a2a4e80b4a813450274e62606b388a9268cf0844c1982a230d5240110" +
    "dc9819c892ecad3cc51234132b4f5070a1004942b0b02106c3d48a3d42a1e8913d4f32ac" +
    "2f218322e881114200f4c319c142207a1d4903206331c073801e3087000c9a3448b0583f" +
    "090f630cde0acef1745a344e61d8131e4ca108162e4102a805364830c0c7028cf214f019" +
    "8cb3b0ef2b089130fa2dc1f060ba30c3437cb61804a2c8800c8cd0e4a11b8df25044050e" +
    "13cca63b0c13d03910c063009b1889d38c3a34c613bcc314c6b3404f2581f3b84d2f4f30" +
    "142d25cfe310d126c4509cb4288c4250d81903e2e0712e4c407c5322c082541c2785f100" +
    "213fc971e81a1347f1c08cb987c3e88006c42328f536c8c3e42c2e0e61f8413d8f91fc01" +
    "390a80d86d290ec288ed2e8703b45415ceb281e8104891344d16468398922f05c2ac0e3c" +
    "c101e406274a50f4f11485d0b8090ec0d338961b441278f50282c2906b05856274ac0680" +
    "4008291ec662f41d25c832a056294e5328c312404140c23e87313428050cc0c40d2f05d0" +
    "2c5c1e08f1f81e2281a2148103ceb398ab370d01dc41050e90505a88919e170298d81020" +
    "b8058430263987e04c02a15c628171882204507d1e60bc642a61de364088d50a0118090e" +
    "c104340668621a20f4508101d038c088ad18c3d80d0fb1002442c0b31762146b8311d039" +
    "45d0e007c138470630f23dc358890a81f0680ee18e1a81e070000224460580463b40c045" +
    "1842ec460d80362f04302102828c7a0cc1ee0781580b1da27c6404307839c2387608015c" +
    "328730563d81a8bf0f8104020420802d8770b101807c1e8bf16c27c428031ac1f4400a71" +
    "fe2d0550d617a0d84e0e309c0101483a0423bc1d0070200ac348a80b8264300d30d83447" +
    "808708a3c4780b419009c6e0a915e0001484108c1bc348cd1d2274118c00821d03801d07" +
    "a3a42b0a11a4030720b00e63400880009e26c2a80709c23002825192240378920160905c" +
    "80511839c3d0291ce39c0a8c11422a06d0951303cc6d824098194470081a22cc13827120" +
    "2f85989e1821687a06e152378000e41261ac4c0ca11e3f4248501da8585b8771bc3f8618" +
    "720962206f0530a22ac0604203232c4904f1601e43307709c3542a8550c82a47b8a80ce1" +
    "1c298880be0782886705c07c718ca9803c86283806c0281c0b50ba318660671883e85583" +
    "30e6288010671b22341b83e0ca590198e419a2b40309e0d22104782e0dc06c2302503a32" +
    "84705e0a0125b686a06402c7a000078354260440620c8680361683644388916a3dc55856" +
    "1602e42408215026c4d0f01ce1b8120670e40b04804209c1f0250da0ec00c6d0b412e1c0" +
    "028691221185185915c1a01f80f1401983887207a2287d0b11f2281cc02711235c518ef0" +
    "fe3ec6f80e04a244110510ac044078cf1542046d0e9190368370020dc0682f8ff0820a04" +
    "b07d0aa1b05b0d50f80a8280d109e28c6602b1fc3a8090c91ae64c5d89719a1ec780741f" +
    "62285e0e602a35c050391005886a06013e260238b20fc1600b0281f0158238c811613456" +
    "8430642f87981609419c338620902104608c03a3202f0940c8068318360a20403b0c30b4" +
    "0b0298bc1443647083305408c218e216e0e84e80810229453007140114790bf06c0447e8" +
    "a80ba22c7b8b219e014288dc0b0254060961f83645e0d71d01ac2f0fe03208c6f86a19c0" +
    "3c340d815e0cc3587f174004378ed1e225c4d8a018a2ec0206308025c5b06e1ea0d04203" +
    "d1522dc4802c17e1784c8d70c925c1a07f1542e0368561362203f00010228c4988e02822" +
    "80f8f81963985e0c90320406322e0b82d4780dc0520f8620be1520a44b0c90e23c410820" +
    "17e0743e80911e184038690b81cc0800116c2b8244430d43a46902702c28c3a01a034128" +
    "6c8ac0dc108688321f42981781d1580ec230bf0b60625505f0222647c0ec1d03542d8330" +
    "640187203701420c4986f620350108a10782303c8ac13639436076086368278fc0562041" +
    "a884338034450ab1ba1e03707f0f81b06f8440f6228028e90680fc3889e1502706280d00" +
    "c3d81185b1fa0f42b0dd1820746189a1be35806885182370458770020b8358ee0dc1d851" +
    "8881be3984d83d1743344d85f0843ec7b05314a3687a00d1821244084d1740dc4b09b202"

  private val lzwLateHex: String =
    "8037008655507d5a1d2d369caac0d878be13381e4d8fd083fc32af3007408ac5a074042b" +
    "231e0e63a7937cbeae5b820b2d1770e420cb242556acc448a422ff032d8c42e6f8f1f235" +
    "7e92d282865024f84459808bc962facdd46d563505a81371a55ee07321c989c0239da436" +
    "2e8b0c0c9753d0f2f643281d69313390c4126a83596b33b854d46a1d1a1748e6d9d01046" +
    "4f3cd9cb3053e1a0dd342edf05f7d091e4d27e0610efb2e21d74b41c0c94a9b0d8f4207c" +
    "7b9e1ac7f711b5f011488a4fc934ab2c24c52bb38b4f16a05830d70caf0085b3f264caf1" +
    "51250e2c4152b0d4a91c310eac7568c870020f814762c4c869f8eb0ab799f7a701f178d6" +
    "0f25c369a05a757c9731b4d24fc57b7d448c4b88c8a6275b740e65383fcb0893533dee65" +
    "1dc1f838749c8050d0729bc4991a1c1383e97a6b8b6049a8739c4198881f894461885092" +
    "06b1705c1b8308be6891c1417c2c81c550a00d8a0450d41b052730e06f8aa3b9746e0883" +
    "68865d9520402e6b1807b0f6040c2381b216992090e42d8483f184711b4589640213c101" +
    "003a06e4d0de480186e85c2f0e47a8122416c2c1a24b9d261918588dc699ba0908831064" +
    "060285395e1f9f4061bc6b02667026431962b940239c82d97c6888a5a06c6a9107f1a400" +
    "0827910e5881e418be3a0ca5d0502302c291be44144099b25f8847796e0896a6f00e3f99" +
    "23c974719502c094549d016950268a04e9cc4c0d6711524d19e1089833054461aa480221" +
    "b930339125d95a798a246826569ea0e1420092856160420d87a9147a8543d1227a9e6558" +
    "5e430645d102228401e98633828440f43a920640c66380e7003c610e001934689160b07e" +
    "121ec619bc159de2e8b4689cc3b0263c9942102c5c8205500a6c9061818e0519e429e033" +
    "196761de56112261f45b83e0c174618686f96c30094591001919a1c942371be4a0880a1c" +
    "27994c761827a0722180c601363113a71874698c277986298d66809e4b03e7709a5e9e60" +
    "285a4b9fc621a24d88a13968511884a1b03207c5c0e25c9880f8a6458104a8384f0be200" +
    "427f92e3d034268fe38119730f87d1000d884651ea6d9187c8585c1cc3f0827b1f23f802" +
    "721501b0da521d8511da5d0e0768a82b9d6503d0209122689a2c8d0731245e0b85581c79" +
    "8203c80c4e94a1e9e2290ba170121d81a6712c368824f1ea05058520d60b0ac4e9580d00" +
    "8010523d8cc5e83a4b906540ac529ca6518624808281847d0e6268500a1981881a5e0ba0" +
    "58b83c11e3f03c4503442902079d6731566e1a03b8820a1d20a16a2246785c0a63604082" +
    "e01610c098e61f81300a85718a05c620881141f47982f190a98778d9022354280460243b" +
    "0410d019a1886883d142040740e30222b4630f60343ec400910b02cc5d8851ae0c4740e5" +
    "1743801f04e11c18c3c8f70d62242a07c1a03b86386a0781c000089118160118ed030114" +
    "610bb1183600d8bc10c0840a0a31e83307b81e05602c7689f19010c1e0e708e1d8200570" +
    "ca1cc158f606a2fc3e041008108200b61dc2c40601f07a2fc5b09f10a00c6b07d10029c7" +
    "f8b41543585e83613838c270040520e8108ef07401c0802b0d22a02e0990c034c360d11e" +
    "021c228f11e02d0640271b82a4578000521042306f0d23347489d046300208740e00741e" +
    "8e90ac2846900c1c82c0398d00220002789b0aa01c2708c00a094648900de24805824172" +
    "014460e70f40a4738e702a304508a81b42544c0f31b60902606511c020688b304e09c480" +
    "be1662786085a1e81b8548de0003904986b130328478fd09214076a1616e1dc6f0fe1861" +
    "c8258881bc14c288ab0181080c8cb12413c580790cc1dc270d50aa154320a91ee2a03384" +
    "70a62202f81e0a219c1701f1c632a600f218a0e01b00a0702d42e8c619819c620fa1560c" +
    "c398a200419c6c88d06e0f832964066390668ad00c2783488411e0b83701b08c0940e8ca" +
    "11c178280496da1a81900b1e80001e0d5098110188321a00d85a0d910e2245a8f7156158" +
    "580b90902085409b1343c07386e04819c3902c1201082707c0943683b0031b42d04b8700" +
    "0a1a4488461461645706807e03c500660e21c81e88a1f42c47c8a073009c448d71463bc3" +
    "f8fb1be038128910441442b01101e33c550811b43a4640da0dc0083701a0be3fc2082812" +
    "c1f42a86c16c3543e02a0a0344278a31980ac7f0ea0243246b99317625c6687b1e01d07d" +
    "88a1783980a8d70140e4401621a81804f89808e2c83f05802c0a07c05608e3204584d15a" +
    "10c190be1e6058250670ce188240841182300e8c80bc2503201a0c60d8288100ec30c2d0" +
    "2c0a62f0510d91c20cc150230863885b83a13a020408a514c01c500451e42fc1b0111fa2" +
    "a02e88b1ee2c8678050a23702c0950182587e0d917835c7406b0bc3f80c8231be1a86700" +
    "f0d0360578330d61fc5d0010de3b478897136280628bb00818c2009716c1b87a8341080f" +
    "4548b71200b05f85e13235c324970681fc550b80da1584d8880fc000408a31262380a08a" +
    "03e3e0658e61783240c81018c8b82e0b51e03701483e1882f85482912c324388f1042080" +
    "5f81d0fa0244786100e1a42e0730200045b0ae09110c350e91a409c0b0a30e80680d04a1" +
    "b22b0370421a20c87d0a605e0745603b08c2fc2d81895417c088991f03b0740d50b60cc1" +
    "90061c80dc050831261bd880d40422841e08c0f22b04d8e50d81d8218da09e3f01588106" +
    "a210ce00d1142ac6e8780dc1fc3e06c1be1103d88a00a3a41a03f0e22785409c18a03403" +
    "0f604616c7e83d0ac3746081d1862686f8d601a214608dc1161dc0082e0d63b837076146" +
    "2206f8e61360f45d0cd13617c210fb1ec14c528da1e8034608491021345d03712c26c808"

  private def unhexT(x: String): Array[Byte] =
    x.grouped(2).map(v => Integer.parseInt(v, 16).toByte).toArray

  test("interop: LZW stream from an INDEPENDENT libtiff-rule implementation decodes byte-for-byte; the GIF-rule (late) stream fails CLOSED") {
    // generated outside this codebase from libtiff's LZWEncode width
    // rule (nbits bumps when nextcode reaches 2^nbits - 1): 1600
    // LCG bytes, table growing to 1840 entries — the stream crosses
    // BOTH the 511 and 1023 width boundaries, which a self-
    // consistently-wrong pair would still roundtrip but an
    // independent stream catches (the Gif.scala round-12 lesson)
    val data = lcgBytes(1600)
    val early = unhexT(lzwEarlyHex)
    val out = new Array[Byte](1600)
    assert(TiffFn.lzwStrip(early, 0, early.length, out, 0, 1600),
      "the reference-rule stream must decode")
    assert(java.util.Arrays.equals(out, data),
      "decoded bytes must equal the reference input")
    // the SAME input encoded with the late (GIF) width convention
    // desyncs at the first boundary: fail closed, never wrong bytes
    val lateS = unhexT(lzwLateHex)
    val o2 = new Array[Byte](1600)
    val ok = TiffFn.lzwStrip(lateS, 0, lateS.length, o2, 0, 1600)
    assert(!ok || !java.util.Arrays.equals(o2, data),
      "a late-convention stream must not decode to the input")
    assert(!ok, "the desynced stream must fail CLOSED")
  }
}
