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
    def find2c(b: Array[Byte]): Int =
      (13 + 768 until b.length).find(i => (b(i) & 0xFF) == 0x2C).get
    // flipping the interlace flag on a sequential stream is
    // UNDETECTABLE (it reads as a legitimately interlaced image of
    // permuted rows): permutation-invariant stats are unchanged, and
    // the decode stays non-null — pinned so the gate never silently
    // over-rejects
    val il = good.clone(); il(find2c(il) + 9) = 0x40.toByte
    val ilSt = GifFn.stats(il, 4096)
    val goodSt = GifFn.stats(good, 4096)
    assert(ilSt != null && ilSt.getLong(5) == goodSt.getLong(5) &&
      ilSt.getInt(3) == goodSt.getInt(3) &&
      ilSt.getInt(4) == goodSt.getInt(4))
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

  // ------------------------------------------------------------------
  // INTEROP: streams produced by an independent encoder implementing
  // giflib's published algorithm (initial clear, LATE width change —
  // bump checked against the pre-add code count at emit time, reset
  // at 4095), generated outside this codebase and embedded as bytes.
  // Fixture A (min-code-size 2) crosses THREE width boundaries
  // (3->4->5->6 bits); fixture B (min-code-size 8) crosses 512 and
  // 1024 (9->10->11 bits). An early-change (TIFF-convention) stream
  // of the same pixels must fail CLOSED, never desync silently.
  // ------------------------------------------------------------------

  private val interopA: String =
    "47494638396108000800810000000000555555aaaaaaffffff2c00000000080008000002199c" +
    "0c177713108213072601f10346d2f76890038c4e940c4901003b"

  private val interopB: String =
    "4749463839612800280087000000000001010102020203030304040405050506060607070708" +
    "08080909090a0a0a0b0b0b0c0c0c0d0d0d0e0e0e0f0f0f101010111111121212131313141414" +
    "1515151616161717171818181919191a1a1a1b1b1b1c1c1c1d1d1d1e1e1e1f1f1f2020202121" +
    "212222222323232424242525252626262727272828282929292a2a2a2b2b2b2c2c2c2d2d2d2e" +
    "2e2e2f2f2f3030303131313232323333333434343535353636363737373838383939393a3a3a" +
    "3b3b3b3c3c3c3d3d3d3e3e3e3f3f3f4040404141414242424343434444444545454646464747" +
    "474848484949494a4a4a4b4b4b4c4c4c4d4d4d4e4e4e4f4f4f50505051515152525253535354" +
    "54545555555656565757575858585959595a5a5a5b5b5b5c5c5c5d5d5d5e5e5e5f5f5f606060" +
    "6161616262626363636464646565656666666767676868686969696a6a6a6b6b6b6c6c6c6d6d" +
    "6d6e6e6e6f6f6f7070707171717272727373737474747575757676767777777878787979797a" +
    "7a7a7b7b7b7c7c7c7d7d7d7e7e7e7f7f7f808080818181828282838383848484858585868686" +
    "8787878888888989898a8a8a8b8b8b8c8c8c8d8d8d8e8e8e8f8f8f9090909191919292929393" +
    "939494949595959696969797979898989999999a9a9a9b9b9b9c9c9c9d9d9d9e9e9e9f9f9fa0" +
    "a0a0a1a1a1a2a2a2a3a3a3a4a4a4a5a5a5a6a6a6a7a7a7a8a8a8a9a9a9aaaaaaabababacacac" +
    "adadadaeaeaeafafafb0b0b0b1b1b1b2b2b2b3b3b3b4b4b4b5b5b5b6b6b6b7b7b7b8b8b8b9b9" +
    "b9babababbbbbbbcbcbcbdbdbdbebebebfbfbfc0c0c0c1c1c1c2c2c2c3c3c3c4c4c4c5c5c5c6" +
    "c6c6c7c7c7c8c8c8c9c9c9cacacacbcbcbcccccccdcdcdcecececfcfcfd0d0d0d1d1d1d2d2d2" +
    "d3d3d3d4d4d4d5d5d5d6d6d6d7d7d7d8d8d8d9d9d9dadadadbdbdbdcdcdcdddddddedededfdf" +
    "dfe0e0e0e1e1e1e2e2e2e3e3e3e4e4e4e5e5e5e6e6e6e7e7e7e8e8e8e9e9e9eaeaeaebebebec" +
    "ececedededeeeeeeefefeff0f0f0f1f1f1f2f2f2f3f3f3f4f4f4f5f5f5f6f6f6f7f7f7f8f8f8" +
    "f9f9f9fafafafbfbfbfcfcfcfdfdfdfefefeffffff2c00000000280028000008ff00f5e84a02" +
    "ecd28f7f005851ca55e2852b5429b02c03a4830b084c829c988236894786284c5c016204ce48" +
    "1d17a7fe08aa03ec572f55935035b857490cab67ed4628f0f7ea41090aea961511824f19005c" +
    "013464f9d08b432475dd30e03a21ec9c1b31f22410b1720d1c364ecd6449ba954a18ac42ca76" +
    "d159364d8e0a2a4778140ad4ea9d917e80fc4da21125cc0126fece9872b0878d13b58dd8845b" +
    "710941386bc38ce40955228bac7c7284f150f2e459a7762bb878d871e4d93a0cd52a11c31326" +
    "d41d784c266d31144a5f0d2766ee8928842d44346aa08409da37cdd725034880e8e3d2470295" +
    "726bda15f965a1c7a47c77128d7034405c8d0da7543cff705262df123c15b63cfb9663808552" +
    "a078e18b448fd9890eb3f2d10875ed1fbe6678d4910e04cd74728828a8c042c2324328424435" +
    "5170e2cb18c798a24905bdcc22800b4f88908401c5f0e149338480b00c0f557413c11fd0e030" +
    "c2320e28534e3946c0814e3a6c48a0461dad70b0051d764c93c13ea93c110e2ed52c908c1675" +
    "6c7107237518808801c0dc530106e0a0c1cb36c2ec93093f452c508f1b2848d20824b300414f" +
    "08824c230014920490ce3adae8d387247804130c30a95ca3062d1510504a09fa9ca04e3dc048" +
    "b1451b582c428d332998b04737ca98830331d800d14d23b2f811812d27e4f04a374b38b3c50d" +
    "cbe8f24c1e6c789200391bd4ff334111da2c00432bd4c03183358390430e013b0830c80be88c" +
    "d14e154b1c82811a4304618a25b890e3c125d63c40c208318453c7128fd4f30f359e58900502" +
    "3fb0310f010f9cf24d0a6150c0412077fcc00b2beff873420fbbe871400a42bce38027a44003" +
    "4f294580e2871cb124730402a8dc00c029c704728b14fd7c81cf2fa148c789202698500d0039" +
    "80508735c9b052c1053bd0c003249620e00400a0e45108275754e08012b360708e014c6c6306" +
    "34e2ec52843a3bf062c117b1e0d144378c8ca2c10148ac434e2bbf1442c60eb5d492863d4b48" +
    "f04e02661899860bfd10b2040d56b4f1432150f001c71e56bcc381010fd421892f3688e34f12" +
    "1f7cfff0802b1c60504f1879e4410031bfe44104134a30c00a2d62a0124d02b3c523c2138f34" +
    "b2ce1cd2d0f2f80ead2c030b19f470a28a1fb0e8b04a1b8af8804e124f44a34031370432c00b" +
    "ab10a20510e9fcd20e0717b31004046f50a10c34e884d38232b88c9382229fac5149139af8b3" +
    "8d2cd924704c100af4904619876470070f6148e20c2274acf3c065f26cb1c0306184e0070a14" +
    "d003ce145634d10836c2ec104e0072400130eab00b36542313bde88423d2910b5f00c0083e30" +
    "c0196870842d8c031fec6845007c60824624e2012030837b4c108c31d4e11185b80005c2408b" +
    "151cc310c0c8c31994208962e0810459c0c727a080000824230786608709ff4c91825c504007" +
    "98c8472f2ef18604182216df28862a709101770c030077b80121941008279c8104ef38c13858" +
    "008456dcc21beb60c5121ab18c06684119a0c8823c3e218e2684e30914d0050b08508c7c48c3" +
    "0fcbf80003b620026d302c1a2da0400a8ee18445f0630fc690460a38d00f3068c3068e98022c" +
    "12118301c8a306cb40841aec308b0a286110766083056cb08a74ece31c4140052fd6a10412e8" +
    "a3008b40860354b08950884314d6b8452888d1c565b06016ad10052ba8b00c30bc011910f087" +
    "01e4808a2bcc01093b08043414b10d406482127158050ef8008d58d4001dd568c62ba0600866" +
    "28c00cbd58c5030ef1045cb8a00ccc2807047ce0ff0e4ba4e116edf84714ec00815fdc221f60" +
    "f84617ace1011630c10da298c329625082d53d431a97084315cc918e3b58c000de708537caf7" +
    "8849d4020c2c5880045c00013cbc500f1b5842199481847688e301230d84161c4a8d71786012" +
    "84504517de20890f188115e65045192260857c20601c5310463cae908f296881114b204218d8" +
    "a0004e1ce00f22f8c3105401817698c315a5604000b8d00f5f986018bfd84133a650892d4402" +
    "01ac9841031060076be8c11a95b042324cc18c1bc8611bd128042a76c0891c40e307082a433a" +
    "18208d643ce103cbd08206c28086320c620ce29004126040054920e0588a004436dc508366dc" +
    "411421a084227a118b29ff2028141158842a2441ac0844a20d5e284729269188711841055978" +
    "812732c00240a0811e98a0420b36618944a84214d458c3248a71042064401906094202a09188" +
    "58c42019aaa8442b80300c0fc06209ed98802446408f13f8e100ff50c41b3a900026984216dc" +
    "98c2079e918163ecc20bfef08046fd908d01d8a51c82e84328b2f1043080830a2900c42f3000" +
    "011380010c5bc8430ed8b089708c20042860c638003000620020080b0845353c11810d306301" +
    "c4188632b2700d3d8ca00e0c408004b6b1006fb860134a08011628908c7b30a31fe868063e28" +
    "108030ec03020440c13bcaf08e33f4e0156ee8840a58400e4134420f9a48011d1271835e8023" +
    "fe133e900725b8308d7fa4400124a042076e208c56a0221cd30080172a510d51bc831176a047" +
    "19f4b102190ca20dee58c114fc21852cb0c31c2290c3220e6009162082696b48831380ab040e" +
    "80e31083a0061d145003024042161db00616286104320460086a10c103f2910c6538c0072ac0" +
    "00370e218836b0e31a4568035f43118536e0631755d80607e0e1834ae0a1169998c31ccee081" +
    "037c600f2a40c61ec6c10f73506207caf8031734010f78a480022e10851396800d4308c11693" +
    "68c31cf270852a18a01c645842354ed009325cc21cd6908535a6600e4f5043052590460d2641" +
    "8e00fc030b34284038f2c08bb146e1190640c5337630855f802220003b"

  private val interopEarly: String =
    "4749463839612800280087000000000001010102020203030304040405050506060607070708" +
    "08080909090a0a0a0b0b0b0c0c0c0d0d0d0e0e0e0f0f0f101010111111121212131313141414" +
    "1515151616161717171818181919191a1a1a1b1b1b1c1c1c1d1d1d1e1e1e1f1f1f2020202121" +
    "212222222323232424242525252626262727272828282929292a2a2a2b2b2b2c2c2c2d2d2d2e" +
    "2e2e2f2f2f3030303131313232323333333434343535353636363737373838383939393a3a3a" +
    "3b3b3b3c3c3c3d3d3d3e3e3e3f3f3f4040404141414242424343434444444545454646464747" +
    "474848484949494a4a4a4b4b4b4c4c4c4d4d4d4e4e4e4f4f4f50505051515152525253535354" +
    "54545555555656565757575858585959595a5a5a5b5b5b5c5c5c5d5d5d5e5e5e5f5f5f606060" +
    "6161616262626363636464646565656666666767676868686969696a6a6a6b6b6b6c6c6c6d6d" +
    "6d6e6e6e6f6f6f7070707171717272727373737474747575757676767777777878787979797a" +
    "7a7a7b7b7b7c7c7c7d7d7d7e7e7e7f7f7f808080818181828282838383848484858585868686" +
    "8787878888888989898a8a8a8b8b8b8c8c8c8d8d8d8e8e8e8f8f8f9090909191919292929393" +
    "939494949595959696969797979898989999999a9a9a9b9b9b9c9c9c9d9d9d9e9e9e9f9f9fa0" +
    "a0a0a1a1a1a2a2a2a3a3a3a4a4a4a5a5a5a6a6a6a7a7a7a8a8a8a9a9a9aaaaaaabababacacac" +
    "adadadaeaeaeafafafb0b0b0b1b1b1b2b2b2b3b3b3b4b4b4b5b5b5b6b6b6b7b7b7b8b8b8b9b9" +
    "b9babababbbbbbbcbcbcbdbdbdbebebebfbfbfc0c0c0c1c1c1c2c2c2c3c3c3c4c4c4c5c5c5c6" +
    "c6c6c7c7c7c8c8c8c9c9c9cacacacbcbcbcccccccdcdcdcecececfcfcfd0d0d0d1d1d1d2d2d2" +
    "d3d3d3d4d4d4d5d5d5d6d6d6d7d7d7d8d8d8d9d9d9dadadadbdbdbdcdcdcdddddddedededfdf" +
    "dfe0e0e0e1e1e1e2e2e2e3e3e3e4e4e4e5e5e5e6e6e6e7e7e7e8e8e8e9e9e9eaeaeaebebebec" +
    "ececedededeeeeeeefefeff0f0f0f1f1f1f2f2f2f3f3f3f4f4f4f5f5f5f6f6f6f7f7f7f8f8f8" +
    "f9f9f9fafafafbfbfbfcfcfcfdfdfdfefefeffffff2c00000000280028000008ff00f5e84a02" +
    "ecd28f7f005851ca55e2852b5429b02c03a4830b084c829c988236894786284c5c016204ce48" +
    "1d17a7fe08aa03ec572f55935035b857490cab67ed4628f0f7ea41090aea961511824f19005c" +
    "013464f9d08b432475dd30e03a21ec9c1b31f22410b1720d1c364ecd6449ba954a18ac42ca76" +
    "d159364d8e0a2a4778140ad4ea9d917e80fc4da21125cc0126fece9872b0878d13b58dd8845b" +
    "710941386bc38ce40955228bac7c7284f150f2e459a7762bb878d871e4d93a0cd52a11c31326" +
    "d41d784c266d31144a5f0d2766ee8928842d44346aa08409da37cdd725034880e8e3d2470295" +
    "726bda15f965a1c7a47c77128d7034405c8d0da7543cff705262df123c15b63cfb9663808552" +
    "a078e18b448fd9890eb3f2d10875ed1fbe66f0a8231d089ae9e410515081858465865084886a" +
    "a2e0c497318e3145930a7a994500179e102109038ae1c39366080161191eaae826823fa0c161" +
    "84651c50a69c728c80039d74d890408d3a5ae1600b3aec9826837d5279221c5caa5920192dea" +
    "d8e20e46ea3000110380b9a7020cc04183976d84d927137e8a58a01e375090a411486601829e" +
    "1004994600282409209d75b4d1a70f49f00826186052b9460d5a2a20a09412f439419d7a8091" +
    "628b36b058841a675230618f6e9431070762b001a29b4664f123025b4ec8e1956e9670668b1b" +
    "96d1e5993cd8f024017236a8ff678222b459008656a88163066b0621871c027610609017d019" +
    "a39d2a96380403358608c2144b7021c7834bac798084116208a78e251ea9e71f6a3cb1200b04" +
    "7e60631e021e38e59b14c2a0808340eef8811756def1e7841e76d1e380148478c7014f488106" +
    "9e528a00c50f396249e6080450b90180538e09e41629faf9029f5f42918e13414c30a11a0072" +
    "00a10e6b9261a5820b76a08107482c41c0090040c9a3104eaea8c0012566c1e01c0398d8c60c" +
    "68c4d9a5087576e0c5822f62c1a3896e18194583039058879c567e29848c1d6aa9250d7b9690" +
    "e09d04cc30320d17fa2164091aac68e38742a0e0038e3dac788703031ea843125f6c10c79f24" +
    "3ef8ffe0015738c0a09e30f2c88300627ec9830826946080155ac440259a04668b4784271e69" +
    "649d39a4a1e5f11d5a59061632e8e144153f60d161953614f1019d249e884681626e08648017" +
    "5621440b20d2f9a51d0e2e66210808dea0421968d009a7056570192705453e59a3922634f167" +
    "1b59b249e0982014e8218d320ec9e00e1ec290c41944e858e781cbe4d9628161c208c10f1428" +
    "a0079c29ac68a2116c84d9219c00c80105c0a8c32ed8508d4cf4a2138e48472e7c010023f8c0" +
    "0067a0c111b6300e7cb0a31501f081091a91880780c00cee314130c650874714e2021408032d" +
    "56700c4300230f675082248a81071264011f9f80020220908c1c18821d26ff30450a7241011d" +
    "60221fbdb8c41b126088587ca318aac04506dc310c00dce106845042209c700612bce304e360" +
    "01105a710b6fac83154b68c4321aa0056580220bf2f884389a108e275040172c204031f2210d" +
    "3f2ce3030cd88208b4c1b068b480022938861316c18f3d18431a29e0403fc0a00d1b38620ab0" +
    "48440c06208f1a2c03116ab0c32c2aa08441d8810d16b0c12ad2b18f73040115bc58871248a0" +
    "8f022c02190e50c12642210e5158e316a120461797c18259b44214aca0c232c0f0066440c01f" +
    "0690032aae300724ec2010d050c4360091094ac4611538e003346251037454a319af80822198" +
    "a10033f462150f38c41370e1823230a31c10f081ff3b2c91865bb4e31f51b003047e718b7c80" +
    "e11b5db0860758c0043788620ea788410956f70c695c220c5530473aee60010378c315de28df" +
    "2326510b30b0600112700104f0f0423d6c600965500612da218e078c34105a702835c6e18149" +
    "1042155d7883243e60045698431565888015f28180714c4118f1b8423ea6a005462c81086160" +
    "83023871803f88e00f43500504da610e5794820101e0423f7c618261fc6207cd984225b61009" +
    "04b062060d40801daca1076b54c20ac93005336e20876d44a310a8d8012772008d1f20a80ce9" +
    "60803492f1840f2c430b1a08031aca3088318843124880011524818063290210d970430d9a71" +
    "07518480128ae8452ca6ff80a050446011aa9004b12210893678a11ca5984422c661041564e1" +
    "059ec8000b0081067a60820a2dd8842512a10a5150630d9328c6118090016518240809804622" +
    "62118364a8a212ad00c2303c008b25b463029218013d4ee08703fc43116fe8400298600a5970" +
    "630a1f7846068eb10b2ff8c3031af543360660977208a20fa1c8c613c0000e2aa40010bfc000" +
    "044c0006306c210f3960c326c2318210a08019e300c000880180202c2014d5f0440436c08c05" +
    "106318cac8c235f430823a30000112d8c602bce1824d28210458a04032eec18c7ea0a319f8a0" +
    "4000c2b00f08100005ef28c33bced08357b8a1132a60013904d1083d6822057448c40d7a018e" +
    "ff4cf8401e94e0c234fe91020590800a1db881305a818a704c03005ea8443544f10e46d8811e" +
    "65d0c70a64308836b8630553f08714b2c00e7388400e8b388025588008a6ad210d4e00ae1238" +
    "008e430c821a7450400d0800095974c01a58a08411c8108021a841040fc8473294e1001fa800" +
    "03dc388420dac08e6b14a10d7c0d4514da808f5d54611b1c80870f2a81875a64620e73388307" +
    "0ef0813da800197b18073fcc41891d28e30f5cd0043ce091020ab840144e5802360c21045b4c" +
    "a20d73c8c315aa608072906109d5384127c8700973584316d69882393c410d1594401a359804" +
    "3902f00f2cd0a000e1c8032fc61a8567180015cfd8c1147e018a8000003b"

  private val interopAIdx: Array[Int] = Array(3,2,3,2,0,2,3,1,2,3,2,3,3,1,0,1,1,3,1,2,2,3,0,1,0,2,2,0,1,2,0,1,0,0,3,2,1,3,2,2,1,0,1,0,2,0,1,0,1,3,1,0,0,1,3,3,1,1,1,0,2,3,0,2)

  private val interopBIdx: Array[Int] = (
    "122,186,73,192,151,63,255,0,172,148,185,37,47,174,168,41,88,203,128,58,92,32" +
    ",152,130,78,166,208,147,60,25,81,76,174,128,140,224,70,117,46,167,127,130,11" +
    "7,192,191,189,170,147,168,13,247,149,98,172,207,237,35,10,254,175,15,37,20,2" +
    "34,203,69,66,248,202,0,184,1,26,89,31,189,28,145,234,221,24,184,39,194,231,1" +
    "10,98,242,18,68,86,215,224,216,156,205,178,146,183,169,194,176,133,202,187,1" +
    "16,203,211,114,42,84,71,60,133,129,173,239,70,253,128,254,147,52,81,97,7,76," +
    "254,103,166,14,123,108,78,187,116,141,108,225,43,151,8,225,214,195,70,121,16" +
    "1,37,89,178,249,114,194,60,74,79,207,157,237,43,92,30,59,71,207,235,24,213,1" +
    "49,196,120,97,161,119,240,76,147,91,134,161,250,53,78,102,247,34,133,216,33," +
    "209,212,160,194,130,251,211,190,151,6,72,64,250,92,125,18,84,229,107,237,69," +
    "191,22,61,147,249,119,137,35,142,3,226,53,27,167,42,15,78,37,251,75,120,21,9" +
    "1,207,223,57,3,22,165,160,188,248,145,244,204,39,29,179,249,52,161,215,255,2" +
    "48,205,120,117,233,16,205,157,135,162,168,176,36,203,67,138,68,213,81,156,19" +
    "0,99,199,166,154,21,189,179,2,46,79,34,73,6,197,124,158,205,132,32,203,60,85" +
    ",221,17,127,208,56,35,203,14,202,229,229,70,112,232,233,108,18,106,117,173,2" +
    "8,91,116,118,211,25,251,169,79,225,184,213,11,201,90,117,91,119,140,117,6,13" +
    "6,6,192,247,21,24,224,104,188,219,194,251,153,252,69,11,245,110,40,146,141,1" +
    "44,179,64,244,33,130,211,2,80,146,1,233,235,218,250,125,146,120,193,193,192," +
    "169,215,106,180,21,4,165,37,250,39,234,245,192,82,91,109,88,139,212,206,41,3" +
    "8,123,221,202,230,56,196,216,64,221,141,178,126,17,182,39,57,175,221,75,206," +
    "91,55,203,186,207,121,108,158,9,228,27,245,19,69,218,11,48,173,212,112,51,21" +
    "4,131,228,228,4,59,2,131,47,232,99,237,85,75,135,24,106,67,65,166,150,184,22" +
    "8,30,151,214,15,36,35,49,225,117,75,143,245,255,212,158,22,89,8,63,108,243,4" +
    ",15,167,223,41,97,20,28,129,119,63,188,172,239,254,39,61,187,122,7,41,66,239" +
    ",14,158,164,208,240,165,69,160,126,114,177,201,71,8,168,55,0,167,199,129,183" +
    ",82,253,95,248,191,161,237,69,156,130,38,38,213,0,57,32,117,214,201,172,21,2" +
    "3,59,52,60,144,150,8,78,0,160,121,133,156,87,21,14,74,179,24,231,6,76,219,10" +
    "2,208,226,187,69,234,59,188,22,95,177,120,77,221,140,163,26,7,72,235,228,173" +
    ",191,133,100,59,181,181,105,246,75,18,239,9,102,79,225,105,46,253,132,75,52," +
    "86,109,63,133,80,124,112,123,86,239,28,6,15,117,146,190,54,226,254,73,31,31," +
    "15,174,28,24,245,97,121,121,4,196,191,121,68,76,74,12,172,180,98,168,209,9,9" +
    "1,134,241,34,79,143,141,235,115,210,180,172,180,59,173,203,176,100,244,156,1" +
    "70,126,176,58,171,109,138,62,232,73,79,209,10,197,55,129,3,47,171,132,90,64," +
    "233,191,237,28,248,191,44,65,16,111,84,202,208,232,225,45,202,184,227,41,138" +
    ",159,107,149,77,154,254,219,178,217,9,199,65,10,61,105,101,135,25,119,60,97," +
    "146,206,136,116,235,15,178,249,242,91,11,195,97,33,126,40,20,244,224,83,86,7" +
    "7,141,216,194,59,225,1,114,40,192,117,187,108,213,153,189,157,142,233,185,19" +
    "0,0,70,62,6,103,52,71,91,227,248,236,173,1,62,38,141,137,15,32,102,3,22,38,1" +
    "93,99,117,143,133,23,20,97,180,43,199,134,192,121,103,74,146,197,120,36,89,2" +
    "48,159,80,8,16,201,57,134,236,38,166,41,185,20,58,152,249,189,151,111,9,134," +
    "177,223,197,170,184,25,238,195,0,119,55,132,74,129,78,103,36,239,39,227,44,6" +
    "4,173,183,222,235,172,75,141,203,13,90,202,160,89,242,159,226,77,225,79,20,1" +
    "86,44,4,197,249,210,126,203,31,12,91,34,218,8,168,209,45,20,41,199,78,139,25" +
    "2,123,198,210,41,28,253,96,218,54,142,83,176,137,49,3,242,53,203,136,106,118" +
    ",179,21,74,131,118,108,22,54,171,233,251,231,65,168,188,235,74,36,250,5,139," +
    "200,14,42,155,161,226,162,214,183,161,196,129,78,203,44,179,173,162,172,84,2" +
    "03,96,111,200,16,254,6,114,168,87,115,72,59,129,208,138,219,128,153,148,113," +
    "171,56,124,208,177,53,232,213,205,175,80,134,204,10,102,189,171,15,135,79,18" +
    "4,46,101,204,229,16,62,238,150,105,183,237,255,81,118,16,191,183,249,96,223," +
    "93,214,30,44,76,110,162,115,167,49,37,171,109,207,210,151,97,85,230,233,119," +
    "22,6,222,174,222,97,146,143,147,181,96,44,11,18,46,16,120,199,134,122,27,75," +
    "101,202,72,237,226,15,222,97,129,90,44,76,212,227,30,147,132,170,93,111,146," +
    "31,70,172,230,170,101,17,86,249,8,227,83,194,241,87,249,83,90,140,75,68,97,1" +
    "08,10,156,7,127,34,127,67,170,16,237,230,174,165,12,1,92,253,190,38,195,191," +
    "59,205,83,149,91,145,8,172,51,13,8,118,214,122,214,149,86,201,166,204,55,114" +
    ",219,209,133,168,59,156,57,208,63,162,168,101,233,12,210,201,79,31,203,90,26" +
    ",97,104,101,131,99,226,146,72,48,84,146,8,237,85,138,128,217,110,53,205,119," +
    "162,33,148,138,189,177,83,162,168,161,17,139,170,146,47,232,17,145,109,94,22" +
    "9,165,147,137,227,70,42,89,47,158,25,44,128,104,244,152,84,45,155,150,137,17" +
    "0,162,212,107,147,197,71,64,25,202,151,63,65,9,208,137,177,49,201,170,149,17" +
    "3,64,195,30,176,75,237,19,146,35,244,39,126,7,255,138,111,29,9,76,166,178,22" +
    "0,83,31,207,25,199,187,94,254,30,97,85,126,217,3,239,70,229,130,125,161,217," +
    "79,96,224,84,41,128,191,24,16,38,96,96,91,121,57,108,155,225,35,33,40,204,22" +
    "7,0,3,196,0,65,11,161,213,158,17,27,204,11,196,195,202,89,215,122,35,117,12," +
    "8,18,219,11,222,46,155,74,33,88,20,201,247,204,253,232,205,248,20,1,97,251,1" +
    "6,4,40,239,101,239,103,61,175,110,157,42,44,228,130,141,122,154,41,116,137,5" +
    "5,189,224,153,62,242,148,92,211,255,41,10,36,84,29,55,194,173,168,225,211,0," +
    "94,149,213,162,239,140,118,244,101,250,43,50,131,109,238,43,83,254,82,89,236" +
    ",230,34,114,139,7,150,44,136,221,140,107,105,78,109,94,74,28,224,135,131,212" +
    ",116,10,53,4,144,178,29,214,88,148,70,100,1,67,106,34,15,249,201,202,14,62,4" +
    "2,24,220,135,130,109,236,215,69,109,8,118,161,81,109,248,187,85,219,28,240,6" +
    "2,149,120,181,153,115,115,103,30,7,31,123,42,200,123,227,252,230,148,59,202," +
    "127,92,154,240,240,41,20,46,162,78,75,216,134,66,182,147,109,115,121,87,85,6" +
    ",229,100,75,213,39,157,100,151,230,214,178,214,83,230,158,212,42,37,210,53,1" +
    "47,228,1,255,88,52,5,225,121,188,67,170,81,207,6,168,207,59,83,191,160").split(",").map(_.toInt)

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray

  test("interop: reference-encoder LZW streams crossing width boundaries decode exactly") {
    val palA = Array(0, 85, 170, 255)
    val dA = GifFn.decode(unhex(interopA), 4096)
    assert(dA != null, "giflib-rule fixture A must decode")
    assert(dA.w == 8 && dA.h == 8)
    for (i <- interopAIdx.indices; ch <- 0 until 3)
      assert((dA.rgb(3 * i + ch) & 0xFF) == palA(interopAIdx(i)),
        s"pixel $i channel $ch")
    val dB = GifFn.decode(unhex(interopB), 4096)
    assert(dB != null, "giflib-rule fixture B (9->11 bit widths) must decode")
    assert(dB.w == 40 && dB.h == 40)
    for (i <- interopBIdx.indices; ch <- 0 until 3)
      assert((dB.rgb(3 * i + ch) & 0xFF) == interopBIdx(i),
        s"pixel $i channel $ch")
    // stats surface agrees with the independently computed sums
    val st = GifFn.stats(unhex(interopB), 4096)
    assert(st.getInt(3) == 0 && st.getInt(4) == 255 &&
      st.getLong(5) == 202804L)
  }

  test("interop: early-change (TIFF-rule) stream fails closed") {
    assert(GifFn.stats(unhex(interopEarly), 4096) == null,
      "an early-width-change stream desyncs and must null whole")
  }

  test("animated tier: synthAnim -> frame k equals the closed form at seed+k; meta counts frames") {
    for (seed <- Seq(0L, 9L, 33L); (w, h) <- Seq((7, 5), (17, 10));
        nf <- Seq(1L, 2L, 5L)) {
      val blob = GifFn.synthAnim(seed, w, h, nf)
      val meta = GifFn.animMeta(blob, 4096)
      assert(meta != null && meta.getLong(0) == w &&
        meta.getLong(1) == h && meta.getLong(2) == nf)
      for (k <- 0L until nf) {
        val st = GifFn.frameStats(blob, k, 4096)
        assert(st != null, s"frame $k of $nf seed=$seed")
        val vals = for (y <- 0 until h; x <- 0 until w)
          yield blockVal(seed + k, y / 8, x / 8)
        assert(st.getLong(2) == w.toLong * h)
        for (ch <- 0 until 3) {
          val base = 3 + ch * 4
          assert(st.getInt(base) == vals.min && st.getInt(base + 1) == vals.max)
          assert(st.getLong(base + 2) == vals.map(_.toLong).sum,
            s"sum frame=$k seed=$seed ${w}x$h nf=$nf ch=$ch")
        }
      }
      // out-of-range frames null, never wrap
      assert(GifFn.frameStats(blob, nf, 4096) == null)
      assert(GifFn.frameStats(blob, -1L, 4096) == null)
    }
    // a SINGLE-image synth() is a valid 1-frame animation (the walk
    // and the single-image gate agree on the container grammar)
    val one = GifFn.synth(5L, 9, 12)
    assert(GifFn.animMeta(one, 4096).getLong(2) == 1L)
  }

  test("animated tier: cross-container sampling parity with MJPEG-AVI on the same pixel rule") {
    // frame k of BOTH containers carries blockVal(seed+k, ...): the
    // q344/q353 sampling tiers replay ONE oracle
    for (seed <- Seq(3L, 21L); (w, h) <- Seq((9, 12), (16, 8)); k <- 0 to 2) {
      val g = GifFn.frameStats(GifFn.synthAnim(seed, w, h, 4), k, 4096)
      val a = AviFn.frameStats(AviFn.synthMjpeg(seed, w, h, 4), k, 4096)
      assert(g != null && a != null)
      // schemas differ in channel ORDER (GIF RGB vs AVI BGR) but the
      // image is gray: every channel-sum must agree
      assert(g.getLong(5) == a.getLong(5),
        s"gif/mjpeg frame sums disagree seed=$seed k=$k")
      assert(g.getLong(2) == a.getLong(2))
    }
  }

  test("animated tier hostile fixtures: truncation, maimed control block, bad later frame all null whole") {
    val good = GifFn.synthAnim(7L, 12, 9, 3)
    assert(GifFn.animMeta(good, 4096) != null)
    for (cut <- Seq(0, 14, 100, good.length / 2, good.length - 1)) {
      assert(GifFn.animMeta(good.take(cut), 4096) == null, s"cut=$cut")
      assert(GifFn.frameStats(good.take(cut), 0, 4096) == null, s"cut=$cut")
    }
    // corrupt the SECOND frame's LZW body: frame 0 still parses
    // shallowly but the container is intact — only decoding frame 1
    // hits the damage and nulls; the walk itself stays honest
    def findFrames(b: Array[Byte]): Seq[Int] =
      (13 + 768 until b.length).filter(i => (b(i) & 0xFF) == 0x2C)
    val frames = findFrames(good)
    assert(frames.length >= 3)
    val corr = good.clone()
    corr(frames(1) + 15) = (corr(frames(1) + 15) ^ 0x55).toByte
    assert(GifFn.frameStats(corr, 1, 4096) == null,
      "corrupted sampled frame must null")
    // maim a graphic-control block length: the extension ladder
    // desyncs and the whole container nulls
    val gce = (13 + 768 until good.length).find(i =>
      (good(i) & 0xFF) == 0x21 && (good(i + 1) & 0xFF) == 0xF9).get
    val bad = good.clone(); bad(gce + 2) = 9 // claims 9-byte body
    assert(GifFn.animMeta(bad, 4096) == null)
    // oversize pixel gate applies to the shared dims
    assert(GifFn.animMeta(good, 107) == null)
  }

  test("animated tier SQL surface: meta + sampled frame stats, codegen path") {
    import spark.implicits._
    val df = (0L until 25L).toDF("id").select(col("id"),
      Multimodal.fakeAnimGif(col("id"), col("id") % 13 + 4,
        col("id") % 9 + 3, col("id") % 5 + 2).as("gif"))
    val out = df.select(
      Multimodal.gifAnimMeta(col("gif")).as("m"),
      Multimodal.gifFrameStats(col("gif"), col("id") % 2).as("st"))
      .collect()
    assert(out.length == 25)
    out.foreach { r =>
      assert(!r.isNullAt(0))
      val nf = r.getStruct(0).getLong(2)
      assert(nf >= 2 && nf <= 6)
      assert(!r.isNullAt(1))
    }
  }

  test("interlaced tier: four-pass row permutation undone exactly — pixels, hash, transcode all match sequential") {
    for (seed <- Seq(0L, 6L, 29L); (w, h) <- Seq(
        (1, 1), (5, 1), (7, 3), (9, 12), (17, 10), (16, 29), (40, 40))) {
      val si = GifFn.synthInterlaced(seed, w, h)
      val sq = GifFn.synth(seed, w, h)
      val di = GifFn.toBmp24(si, 4096)
      val dq = GifFn.toBmp24(sq, 4096)
      assert(di != null && dq != null, s"seed=$seed ${w}x$h")
      assert(java.util.Arrays.equals(di, dq),
        s"interlaced decode must be the IDENTICAL image seed=$seed ${w}x$h")
      val hi = GifFn.ahash(si, 4096)
      val hq = GifFn.ahash(sq, 4096)
      assert(hi.getLong(0) == hq.getLong(0) && hi.getLong(1) == hq.getLong(1))
    }
    // truncated interlaced stream nulls whole
    val g = GifFn.synthInterlaced(3L, 16, 29)
    for (cut <- Seq(20, g.length / 2, g.length - 2))
      assert(GifFn.stats(g.take(cut), 4096) == null, s"cut=$cut")
  }

  private val interopInterlaced: String =
    "4749463839610b000d00810000000000555555aaaaaaffffff2c000000000b000d004002" +
    "341c0e0223a1610c806c18c7426249a86f4d99923802b750d3745aa14505d420579e926d" +
    "b4678b0e043cc00e908ec7b1484c348202003b"

  private val interopInterlacedIdx: Array[Int] = (
    "3,0,0,0,0,2,0,3,2,1,2,1,3,3,1,1,3,3,3,1,1,3,0,1,3,2,1,2,0,0,2,1,2,2,3,2," +
    "2,2,0,3,2,1,0,2,3,3,0,1,2,3,2,1,0,2,3,3,3,1,2,2,3,2,3,2,0,1,2,3,2,0,0,3," +
    "1,3,3,0,1,3,1,2,1,3,1,3,1,0,0,3,0,1,3,0,3,0,0,1,3,3,2,3,1,0,0,1,3,0,2,2," +
    "2,2,0,1,2,3,3,3,3,3,0,3,3,1,2,0,3,0,2,0,1,1,0,2,2,0,2,2,2,0,2,0,2,3,3").split(",").map(_.toInt)

  test("interop: interlaced stream from an independent reference-schedule writer decodes pixel-for-pixel") {
    // rows stored in the reference appendix-E order (0,8,../4,12,../
    // 2,6,../1,3,..) by an implementation outside this codebase, LZW
    // per the verified giflib rule — catches a self-consistently
    // wrong pass schedule our own synth round-trip cannot see
    val palA = Array(0, 85, 170, 255)
    val d = GifFn.decode(unhex(interopInterlaced), 4096)
    assert(d != null && d.w == 11 && d.h == 13)
    for (i <- interopInterlacedIdx.indices; ch <- 0 until 3)
      assert((d.rgb(3 * i + ch) & 0xFF) == palA(interopInterlacedIdx(i)),
        s"pixel $i channel $ch")
  }
}
