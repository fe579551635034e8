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
    // lying IHDR headers (CRC fixed so the checksum is not what
    // rejects): 16-bit depth fails the field gate; a palette/RGBA/
    // interlaced claim over this truecolor-sequential stream fails
    // the missing-PLTE or exact-inflate-volume gate — every layout
    // decodes ONLY when the stream genuinely carries it
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

  private val a7InterlacedHex: String =
    "89504e470d0a1a0a0000000d494844520000000d0000000b08020000015cd7a0a0000001" +
    "ce49444154789c01c3013cfe00fe5c44346642012716acea9e6900f6ea911ba4b901d776" +
    "75c1dc960072fea5fc440bf00badca04210057a6fb48606ed5e555010d53f00bc967dba8" +
    "3f02a4e155d2a70aa3a330006e460bf9b6b8b3b3c5fec5a2921446aa740e81ce3d019c4d" +
    "300624fb9979956be2b68e5b9799c016d9c7ce02dab86ee6b53bf5d070132ff0ad1da393" +
    "e73ed954d0007d33fd7bfd53341b64058f2e2b9dfe859aff01893034b9a3ff21b0aa6027" +
    "eeabc2c8891a0a0268fea1951a15ded6890d70d718e82999053e0345ea348d41817d7a21" +
    "f8aab53c9c20b2051e0426170cd7ce937592eb9dfa3fecd594e3ff5b00fb4eca15095709" +
    "fa69cb80fc3172750af42400cd0902d642bb4ad34a4f0d260e4e71a76126ad8d14b0de6f" +
    "c530f88382e287682dfba3d02b0b0501959ea756421b6b2f2a92fb27d6279e86fc84dd1a" +
    "1d41535a6850fc149c5d51990db8d38f59447e02d35a6763e898e1ecb2f0ab65fb5b1006" +
    "fa1c4d9b82aeba4f1fc611bc3a3b5076c941ebf29f69fb036c203046587df79b4646529b" +
    "16d8e16aee4dd31b6458b3fa3cc36c8166c9b320db22c9638262b20436fbb3033f906396" +
    "cff70eae71b706c36131c3d6a45d6e1f201dfe215e599240051596e9536bad69f4d7a134" +
    "d416d00000000049454e44ae426082"

  private val a7SequentialHex: String =
    "89504e470d0a1a0a0000000d494844520000000d0000000b08020000002bd09036000001" +
    "c349444154789c01b80147fe00fe5c447d33fd57a6fb7bfd53f6ea91341b6448606e058f" +
    "2e3466422b9dfed5e555859aff1ba4b901cd09020939b974918f053adcbf414b9913b506" +
    "2cee03515b155289be52ea04e64b743ba330683502a13d09b3ee79afe36ef3c60da56554" +
    "bc22b751388e13cc5ccde44eebeab1230ce1fce3cd56c338035e7ba25c795564442f9c99" +
    "84f1d345b4d36e80cee7f0221e50932f42db686ba20954a04a8c56b004dd60fe063013b7" +
    "4404ef9a353e575a83155bf7c3f16ed3f620710b9649b7c4a5da9d993a8ace020068f80e" +
    "4ec85a37fb9ed8b578b98cc14a27516ee2d41054fbe9b0b99ac0407f95db28dd93df9f1a" +
    "019c4d3021b46ee5708db547c9e432cc8e180eddcaa81eecf7706fa0adfba7ecc56f9d74" +
    "c23c530c02044f07000927cfaccc93035eac91aa393ddc65dfada17a1caf0d005ebe3b45" +
    "f39dd549276b55d403d7c8917108f2071a75610f3c4df6fdd23ae3c624173438373241b9" +
    "a52dc6277f42e3713a69d65704af813ef6b29023964fb30e6c718506870c959ebe2c5d1f" +
    "1ff41d725947c17e40876c1ea8535aff0076059efb4eca88266615095730ba3009fa69b9" +
    "fb66cb80fce144b031727560ce610af4247f02c1e016d0f236eaeb010000000049454e44" +
    "ae426082"

  private val a7Px: Array[Int] = (
    "254,92,68,125,51,253,87,166,251,123,253,83,246,234,145,52,27,100,72,96,1" +
    "10,5,143,46,52,102,66,43,157,254,213,229,85,133,154,255,27,164,185,205,9" +
    ",2,214,66,187,74,211,74,79,13,38,14,78,113,167,97,38,173,141,20,176,222," +
    "111,197,48,248,131,130,226,135,104,45,251,163,208,43,11,5,110,70,11,137," +
    "48,52,249,182,184,66,211,51,179,179,197,99,131,221,254,197,162,195,170,2" +
    "03,146,20,70,110,108,147,170,116,14,247,134,157,129,206,61,149,158,167,2" +
    "35,224,194,86,15,236,232,10,19,190,49,177,68,45,53,33,71,82,98,154,172,2" +
    "02,234,168,222,134,5,47,31,18,231,242,161,64,54,31,114,254,165,241,46,21" +
    "3,13,83,240,215,237,72,252,68,11,65,89,102,24,28,87,208,26,162,240,11,17" +
    "3,134,84,188,243,196,150,144,139,219,202,4,33,104,248,14,78,200,90,55,25" +
    "1,158,216,181,120,185,140,193,74,39,81,110,226,212,16,84,251,233,176,185" +
    ",154,192,64,127,149,219,40,221,147,223,159,26,156,77,48,189,1,158,162,11" +
    "3,43,87,184,244,59,234,192,201,2,206,166,204,118,196,184,109,52,39,13,22" +
    "5,34,180,205,231,35,106,91,229,166,174,241,160,156,55,189,10,197,113,29," +
    "247,234,187,82,231,123,106,2,63,170,11,171,35,101,50,137,227,52,13,63,22" +
    "4,239,18,218,192,63,164,12,17,3,197,39,22,172,227,24,170,177,52,69,46,13" +
    "4,135,215,118,117,62,148,114,234,195,97,219,178,172,17,180,21,205,247,72" +
    ",150,103,198,77,246,163,152,82,11,214,151,234,217,73,122,212,223,148,225" +
    ",237,0,82,114,6,197,160,155,136,129,199,229,160,230,5,189,135,38,62,72,1" +
    "64,126,77,185,20,245,12,110,162,118,5,158,251,78,202,136,38,102,21,9,87," +
    "48,186,48,9,250,105,185,251,102,203,128,252,225,68,176,49,114,117,96,206" +
    ",97,10,244,36,127,2,193").split(",").map(_.toInt)

  private def unhexP(x: String): Array[Byte] =
    x.grouped(2).map(v => Integer.parseInt(v, 16).toByte).toArray

  test("interop: Adam7 stream from an INDEPENDENT reference implementation decodes pixel-for-pixel") {
    // generated outside this codebase: RFC 2083 8.2 pass schedule,
    // per-pass filtering cycling all five types, random 13x11 pixels —
    // the fixture that would catch a self-consistently-wrong pass
    // order/geometry our own synth round-trip cannot see
    val di = PngFn.decode(unhexP(a7InterlacedHex), 4096)
    val ds = PngFn.decode(unhexP(a7SequentialHex), 4096)
    assert(di != null && ds != null)
    assert(di.w == 13 && di.h == 11)
    for (i <- a7Px.indices) {
      assert((di.rgb(i) & 0xFF) == a7Px(i), s"interlaced byte $i")
      assert((ds.rgb(i) & 0xFF) == a7Px(i), s"sequential byte $i")
    }
    val st = PngFn.stats(unhexP(a7InterlacedHex), 4096)
    assert(st.getLong(5) == 19562L && st.getLong(9) == 17965L &&
      st.getLong(13) == 18273L)
  }

  // ---- color-type tier: all five 8-bit sample layouts ----

  /** Split a well-formed PNG into (sig, chunks) for surgical
    * rearrangement; each chunk keeps its raw 12+len bytes. */
  private def pngChunks(b: Array[Byte]): Seq[Array[Byte]] = {
    def be32(i: Int): Int =
      ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
        ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    var pos = 8
    val out = Seq.newBuilder[Array[Byte]]
    while (pos < b.length) {
      val l = be32(pos)
      out += java.util.Arrays.copyOfRange(b, pos, pos + 12 + l)
      pos += 12 + l
    }
    out.result()
  }

  private def rebuild(chunks: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(unhexP("89504e470d0a1a0a"), 0, 8)
    chunks.foreach(c => out.write(c, 0, c.length))
    out.toByteArray
  }

  private def mkChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val l = data.length
    out.write(Array(((l >> 24) & 0xFF).toByte, ((l >> 16) & 0xFF).toByte,
      ((l >> 8) & 0xFF).toByte, (l & 0xFF).toByte), 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, l)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    val cv = crc.getValue
    out.write(Array(((cv >> 24) & 0xFF).toByte, ((cv >> 16) & 0xFF).toByte,
      ((cv >> 8) & 0xFF).toByte, (cv & 0xFF).toByte), 0, 4)
    out.toByteArray
  }

  private def chunkType(c: Array[Byte]): String =
    new String(c, 4, 4, "US-ASCII")

  test("color-type tier: one gray image through all five layouts — identical pixels, hash, canonical bytes") {
    for (seed <- Seq(0L, 9L, 321L, 100003L); (w, h) <- Seq(
        (1, 1), (4, 3), (5, 7), (8, 8), (13, 11))) {
      val legs = Seq(0L, 2L, 3L, 4L, 6L)
        .map(ct => PngFn.synthTyped(seed, w, h, ct))
      val dec = legs.map(PngFn.decode(_, 4096))
      assert(dec.forall(_ != null), s"seed=$seed ${w}x$h all legs decode")
      // brute-force closed form: every layout lands on R=G=B=L
      for (v <- 0 until h; c <- 0 until w) {
        val fr = h - 1 - v
        val lum = Math.floorMod(seed * 11 + fr * 5 + c * 2, 256L).toInt
        dec.zip(Seq(0, 2, 3, 4, 6)).foreach { case (d, ct) =>
          val p = (v * w + c) * 3
          assert((d.rgb(p) & 0xFF) == lum && (d.rgb(p + 1) & 0xFF) == lum &&
            (d.rgb(p + 2) & 0xFF) == lum,
            s"ct=$ct seed=$seed ${w}x$h px($v,$c)")
        }
      }
      // canonical 24bpp bytes identical across the five layouts
      val bmps = legs.map(PngFn.toBmp24(_, 4096))
      assert(bmps.forall(b =>
        b != null && java.util.Arrays.equals(b, bmps.head)),
        s"canonical BMP bytes must agree seed=$seed ${w}x$h")
      // one ahash for all five byte streams
      val hs = legs.map(PngFn.ahash(_, 4096))
      assert(hs.forall(x => x.getLong(0) == hs.head.getLong(0) &&
        x.getLong(1) == hs.head.getLong(1)))
    }
  }

  test("palette decode: NON-trivial permuted palette against brute force; out-of-range index nulls") {
    // hand-built type-3 stream with a 40-entry non-gray palette —
    // the identity-gray palette of synthTyped can't catch a lookup
    // that ignores the PLTE, this can
    val w = 9; val h = 6; val entries = 40
    val plte = new Array[Byte](entries * 3)
    for (j <- 0 until entries) {
      plte(j * 3) = ((j * 31 + 7) % 256).toByte
      plte(j * 3 + 1) = ((j * 97 + 3) % 256).toByte
      plte(j * 3 + 2) = ((j * 13 + 11) % 256).toByte
    }
    def mkPalettePng(idx: (Int, Int) => Int): Array[Byte] = {
      val filtered = new java.io.ByteArrayOutputStream()
      for (v <- 0 until h) {
        filtered.write(0) // filter None: indices are raw bytes
        for (c <- 0 until w) filtered.write(idx(v, c))
      }
      val d = new java.util.zip.Deflater()
      d.setInput(filtered.toByteArray); d.finish()
      val zs = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) zs.write(tmp, 0, d.deflate(tmp))
      d.end()
      val ihdr = new Array[Byte](13)
      ihdr(3) = w.toByte; ihdr(7) = h.toByte
      ihdr(8) = 8; ihdr(9) = 3
      rebuild(Seq(mkChunk("IHDR", ihdr), mkChunk("PLTE", plte),
        mkChunk("IDAT", zs.toByteArray), mkChunk("IEND",
          Array.emptyByteArray)))
    }
    val good = mkPalettePng((v, c) => (v * w + c) % entries)
    val d = PngFn.decode(good, 4096)
    assert(d != null)
    for (v <- 0 until h; c <- 0 until w) {
      val j = (v * w + c) % entries
      val p = (v * w + c) * 3
      assert((d.rgb(p) & 0xFF) == (j * 31 + 7) % 256 &&
        (d.rgb(p + 1) & 0xFF) == (j * 97 + 3) % 256 &&
        (d.rgb(p + 2) & 0xFF) == (j * 13 + 11) % 256,
        s"palette lookup px($v,$c)")
    }
    // §4.1.2: any index past the last PLTE entry nulls the image
    assert(PngFn.decode(mkPalettePng((v, c) =>
      if (v == 3 && c == 4) entries else (v * w + c) % entries),
      4096) == null, "out-of-range palette index must null")
  }

  test("PLTE discipline hostiles: missing, duplicate, misplaced, malformed, forbidden") {
    val pal = PngFn.synthTyped(7L, 6, 5, 3L)
    assert(PngFn.stats(pal, 4096) != null)
    val cs = pngChunks(pal)
    val Seq(ihdr, plte, idat, iend) = cs: @unchecked
    assert(chunkType(plte) == "PLTE")
    // type 3 without PLTE
    assert(PngFn.stats(rebuild(Seq(ihdr, idat, iend)), 4096) == null)
    // duplicate PLTE
    assert(PngFn.stats(rebuild(Seq(ihdr, plte, plte, idat, iend)),
      4096) == null)
    // PLTE after the first IDAT
    assert(PngFn.stats(rebuild(Seq(ihdr, idat, plte, iend)),
      4096) == null)
    // malformed PLTE lengths: not a multiple of 3, empty, oversized
    assert(PngFn.stats(rebuild(Seq(ihdr,
      mkChunk("PLTE", new Array[Byte](100)), idat, iend)), 4096) == null)
    assert(PngFn.stats(rebuild(Seq(ihdr,
      mkChunk("PLTE", Array.emptyByteArray), idat, iend)), 4096) == null)
    assert(PngFn.stats(rebuild(Seq(ihdr,
      mkChunk("PLTE", new Array[Byte](771)), idat, iend)), 4096) == null)
    // PLTE is FORBIDDEN for grayscale layouts (types 0 and 4)...
    for (ct <- Seq(0L, 4L)) {
      val g = pngChunks(PngFn.synthTyped(7L, 6, 5, ct))
      assert(PngFn.stats(rebuild(g.head +: plte +: g.tail), 4096) == null,
        s"PLTE must be rejected for color type $ct")
    }
    // ...but is the spec's optional suggested palette for 2 and 6 —
    // well-formed PLTE accepted and ignored, corrupt PLTE still nulls
    for (ct <- Seq(2L, 6L)) {
      val full = PngFn.synthTyped(7L, 6, 5, ct)
      val g = pngChunks(full)
      val withP = rebuild(g.head +: plte +: g.tail)
      val st = PngFn.stats(withP, 4096)
      val st0 = PngFn.stats(full, 4096)
      assert(st != null && st.getLong(5) == st0.getLong(5),
        s"suggested PLTE must be ignored for color type $ct")
      val badCrc = withP.clone()
      val plteDataOff = 8 + ihdr.length + 8
      badCrc(plteDataOff) = (badCrc(plteDataOff) ^ 0x55).toByte
      assert(PngFn.stats(badCrc, 4096) == null,
        "corrupt PLTE CRC must still null")
    }
    // truncation ladder over the palette stream
    for (cut <- Seq(20, 40, pal.length / 2, pal.length - 3))
      assert(PngFn.stats(pal.take(cut), 4096) == null, s"cut=$cut")
  }

  test("16-bit tier: strip-16 readout reproduces the 8-bit legs; stride, semantics and hostiles") {
    // every 16-bit layout decodes to the same canonical bytes as the
    // 8-bit gray image (low-byte plane varies independently, so the
    // doubled filter stride is genuinely exercised)
    for (seed <- Seq(0L, 9L, 321L); (w, h) <- Seq(
        (1, 1), (4, 3), (5, 7), (8, 8), (13, 11))) {
      val ref = PngFn.toBmp24(PngFn.synthTyped(seed, w, h, 2L), 4096)
      for (ct <- Seq(0L, 2L, 4L, 6L)) {
        val b16 = PngFn.synth16(seed, w, h, ct)
        val d = PngFn.toBmp24(b16, 4096)
        assert(d != null && java.util.Arrays.equals(d, ref),
          s"16-bit ct=$ct seed=$seed ${w}x$h must strip to the 8-bit image")
      }
    }
    // strip semantics pinned on a value where strip and scale differ:
    // gray 1x1 sample 0x01FF — strip (>>8) gives 1, scale-by-
    // 255/65535 would give 2; the readout is DEFINED as strip
    val one = {
      val filtered = Array[Byte](0, 0x01, 0xFF.toByte)
      val d = new java.util.zip.Deflater()
      d.setInput(filtered); d.finish()
      val zs = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](64)
      while (!d.finished()) zs.write(tmp, 0, d.deflate(tmp))
      d.end()
      val ihdr = new Array[Byte](13)
      ihdr(3) = 1; ihdr(7) = 1; ihdr(8) = 16; ihdr(9) = 0
      rebuild(Seq(mkChunk("IHDR", ihdr),
        mkChunk("IDAT", zs.toByteArray),
        mkChunk("IEND", Array.emptyByteArray)))
    }
    val st = PngFn.stats(one, 4096)
    assert(st != null && st.getInt(3) == 1 && st.getLong(5) == 1L,
      "strip-16 must take the HIGH byte (libpng png_set_strip_16)")
    // hostiles: 16-bit palette claim is illegal; odd depths null;
    // truncation ladder
    val pal16 = {
      val g = pngChunks(PngFn.synthTyped(7L, 6, 5, 3L))
      val ihdr = g.head.clone()
      ihdr(8 + 8) = 16 // depth byte inside the IHDR chunk data
      val fixed = mkChunk("IHDR",
        java.util.Arrays.copyOfRange(ihdr, 8, 8 + 13))
      rebuild(fixed +: g.tail)
    }
    assert(PngFn.stats(pal16, 4096) == null, "16-bit palette must null")
    val g16 = PngFn.synth16(5L, 6, 6, 2L)
    assert(PngFn.stats(g16, 4096) != null)
    for (cut <- Seq(20, 40, g16.length / 2, g16.length - 3))
      assert(PngFn.stats(g16.take(cut), 4096) == null, s"cut=$cut")
    // depth 4 (legal PNG, outside this tier's scope) nulls cleanly
    val d4 = {
      val g = pngChunks(g16)
      val ihdr = g.head.clone()
      ihdr(8 + 8) = 4
      rebuild(mkChunk("IHDR",
        java.util.Arrays.copyOfRange(ihdr, 8, 8 + 13)) +: g.tail)
    }
    assert(PngFn.stats(d4, 4096) == null)
  }

  test("APNG tier: frame sampling against the block closed form; cross-container parity; hostiles") {
    // per-frame brute force: frame k carries blockVal(seed+k) on
    // every channel
    for (seed <- Seq(0L, 9L, 321L); (w, h) <- Seq((4, 3), (13, 11));
         nf <- Seq(1L, 2L, 5L)) {
      val apng = PngFn.synthApng(seed, w, h, nf)
      val meta = PngFn.apngMeta(apng, 4096)
      assert(meta != null && meta.getLong(0) == w &&
        meta.getLong(1) == h && meta.getLong(2) == nf)
      for (k <- 0L until nf) {
        val st = PngFn.apngFrameStats(apng, k, 4096)
        assert(st != null, s"seed=$seed ${w}x$h frame $k")
        val px = for (v <- 0 until h; c <- 0 until w)
          yield Math.floorMod((seed + k) * 17 + (v / 8) * 5 +
            (c / 8) * 3, 256L).toInt
        assert(st.getLong(2) == w.toLong * h)
        for (ch <- 0 until 3) {
          assert(st.getInt(3 + ch * 4) == px.min &&
            st.getInt(4 + ch * 4) == px.max &&
            st.getLong(5 + ch * 4) == px.map(_.toLong).sum,
            s"channel $ch seed=$seed frame $k")
        }
      }
      // out-of-range frame index nulls
      assert(PngFn.apngFrameStats(apng, nf, 4096) == null)
      assert(PngFn.apngFrameStats(apng, -1L, 4096) == null)
      // cross-container parity: animated GIF frame k of the same
      // seed carries the identical statistics (the q344/q353/q364
      // one-pixel-rule discipline)
      val gif = GifFn.synthAnim(seed, w, h, nf)
      for (k <- 0L until nf) {
        val sa = PngFn.apngFrameStats(apng, k, 4096)
        val sg = GifFn.frameStats(gif, k, 4096)
        for (f <- 0 until 15)
          assert(sa.get(f, null) == sg.get(f, null),
            s"cross-container field $f seed=$seed frame $k")
      }
    }
    // hostiles — every gate fails CLOSED
    val good = PngFn.synthApng(7L, 9, 6, 3L)
    assert(PngFn.apngMeta(good, 4096) != null)
    for (cut <- Seq(0, 8, 20, 40, good.length / 3, good.length / 2,
        good.length - 3))
      assert(PngFn.apngMeta(good.take(cut), 4096) == null, s"cut=$cut")
    // a plain (non-animated) PNG is not an APNG
    assert(PngFn.apngMeta(PngFn.synth(7L, 9, 6), 4096) == null)
    // ...and an APNG still decodes as a plain PNG (frame 0 is the
    // default image; acTL/fcTL/fdAT are ancillary to a plain decoder)
    val asPlain = PngFn.stats(good, 4096)
    val frame0 = PngFn.apngFrameStats(good, 0L, 4096)
    assert(asPlain != null && asPlain.getLong(5) == frame0.getLong(5),
      "plain decode must see exactly frame 0")
    // corrupt one fdAT byte: chunk CRC rejects the container
    val cs = pngChunks(good)
    val fdatIdx = cs.indexWhere(chunkType(_) == "fdAT")
    assert(fdatIdx > 0)
    val bad = good.clone()
    var off = 8
    for (i <- 0 until fdatIdx) off += cs(i).length
    bad(off + 8 + 6) = (bad(off + 8 + 6) ^ 0x3C).toByte
    assert(PngFn.apngMeta(bad, 4096) == null)
    // re-CRC'd structural lies: wrong fdAT sequence number, offset
    // fcTL, non-zero dispose, num_frames mismatch
    def patched(ci: Int, dataOff: Int, v: Byte): Array[Byte] = {
      val c = cs(ci).clone()
      c(8 + dataOff) = v
      rebuild(cs.updated(ci, mkChunk(chunkType(c),
        java.util.Arrays.copyOfRange(c, 8, c.length - 4))))
    }
    val fctlIdx = cs.indexWhere(chunkType(_) == "fcTL")
    assert(PngFn.apngMeta(patched(fdatIdx, 3, 99), 4096) == null,
      "wrong fdAT sequence must null")
    assert(PngFn.apngMeta(patched(fctlIdx, 15, 1), 4096) == null,
      "x-offset fcTL must null")
    assert(PngFn.apngMeta(patched(fctlIdx, 24, 1), 4096) == null,
      "dispose_op 1 must null (scope gate)")
    val actlIdx = cs.indexWhere(chunkType(_) == "acTL")
    assert(PngFn.apngMeta(patched(actlIdx, 3, 9), 4096) == null,
      "acTL frame count mismatch must null")
  }

  test("color-type tier through the SQL surface: five layouts, one hash group") {
    import spark.implicits._
    val df = (0L until 50L).toDF("id")
      .select(expr("id div 5").as("seed"), (col("id") % 5).as("leg"))
      .select(Multimodal.pngAHash(Multimodal.fakePngTyped(
        col("seed"), (col("seed") % 6 + 3), (col("seed") % 4 + 2),
        when(col("leg") === 0, 0).when(col("leg") === 1, 2)
          .when(col("leg") === 2, 3).when(col("leg") === 3, 4)
          .otherwise(6))).as("ah"))
      .groupBy(col("ah.h0"), col("ah.h1"))
      .agg(count(lit(1)).as("n")).collect()
    assert(df.forall(_.getLong(2) % 5 == 0),
      "every layout quintet must land in one hash group")
  }
}
