package etlmudah.multimodal

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("withFakeMedia: binary column + typed metadata struct") {
    val docs = Tables.documents(spark, sf0001).limit(5)
    val m = Multimodal.withFakeMedia(docs, "text")
    val row = m.select("media", "media_meta.format", "media_meta.n_bytes")
      .collect().head
    assert(row.getAs[Array[Byte]](0).nonEmpty)
    assert(row.getString(1) == "fake/raw")
    assert(row.getLong(2) == row.getAs[Array[Byte]](0).length)
  }

  test("decodeFeaturesStub: fixed dims, deterministic, bounded") {
    val docs = Multimodal.withFakeMedia(
      Tables.documents(spark, sf0001).limit(10), "text")
    val f = docs.select(col("doc_id"),
      Multimodal.decodeFeaturesStub(col("media"), 16).as("feat"))
    val a = f.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = f.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(a.zip(b).forall { case (x, y) => x == y })     // deterministic
    assert(a.forall(_.length == 16))
    assert(a.flatten.forall(v => v >= 0f && v < 1f))
  }

  test("decodeBatchedStub: mapPartitions path — schema, determinism, bounds") {
    val docs = Multimodal.withFakeMedia(
      Tables.documents(spark, sf0001).limit(20), "text")
    val out = Multimodal.decodeBatchedStub(docs, "doc_id", "media", 8)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "features"))
    val a = out.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    val b = out.orderBy("doc_id").collect().map(_.getSeq[Float](1))
    assert(a.length == 20)
    assert(a.zip(b).forall { case (x, y) => x == y })
    assert(a.forall(f => f.length == 8 && f.forall(v => v >= 0f && v < 1f)))
  }

  test("mediaMeta: hand-crafted PNG/GIF/JPEG headers decode; corrupt stays null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val fixtures = Seq(
      // PNG 640x480: signature + IHDR length/type + BE32 dims
      ("png640", hx("89504E470D0A1A0A" + "0000000D49484452" +
        "00000280" + "000001E0" + "0806000000")),
      // GIF87a 320x200: LE16 dims
      ("gif320", hx("474946383761" + "4001" + "C800" + "F70000")),
      // JPEG 320x240 with TWO filler segments (APP0 + APP1) before SOF0:
      // the marker walk must hop both before reading the dimensions
      ("jpeg320", hx("FFD8" + "FFE00010" + "00" * 14 +
        "FFE1000A" + "00" * 8 + "FFC0001108" + "00F0" + "0140" +
        "03" + "00" * 10)),
      // progressive JPEG (SOF2) 17x19, SOF directly after SOI
      ("jpeg_sof2", hx("FFD8" + "FFC2001108" + "0013" + "0011" +
        "03" + "00" * 10)),
      ("not_media", "just text bytes".getBytes("UTF-8").toSeq.toArray),
      // PNG signature but truncated before the dimension bytes
      ("png_trunc", hx("89504E470D0A1A0A" + "0000")),
      // hostile PNG: width uint32 has the high bit set (2^31) — must
      // decode as a long, not overflow-throw under ANSI mode
      ("png_hostile", hx("89504E470D0A1A0A" + "0000000D49484452" +
        "80000000" + "00000001" + "0806000000"))
    )
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.mediaMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("png640") == (("png", Some(640L), Some(480L))))
    assert(out("gif320") == (("gif", Some(320L), Some(200L))))
    assert(out("jpeg320") == (("jpeg", Some(320L), Some(240L))))
    assert(out("jpeg_sof2") == (("jpeg", Some(17L), Some(19L))))
    assert(out("not_media")._1 == "unknown" && out("not_media")._2.isEmpty)
    assert(out("png_trunc")._1 == "png" && out("png_trunc")._2.isEmpty)
    assert(out("png_hostile") == (("png", Some(2147483648L), Some(1L))))
  }

  test("fakeMediaHeader -> mediaMeta round trip across formats and dims") {
    import spark.implicits._
    val dims = for (f <- Seq("png", "gif", "jpeg"); d <- Seq(16, 527, 65535))
      yield (f, d, 65551 - d)
    val out = dims.toDF("fmt", "w", "h")
      .select(col("fmt"), col("w"), col("h"),
        Multimodal.mediaMeta(
          Multimodal.fakeMediaHeader(col("fmt"), col("w"), col("h"))).as("m"))
      .collect()
    out.foreach { r =>
      val (fmt, w, h) = (r.getString(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      assert(m.getString(0) == fmt, s"$fmt $w x $h -> ${m.getString(0)}")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong,
        s"$fmt $w x $h -> ${m.getLong(1)} x ${m.getLong(2)}")
    }
  }

  test("mediaMeta: hand-crafted BMP/TIFF headers decode; hostile IFD offsets stay null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val fixtures = Seq(
      // BMP BITMAPINFOHEADER 640x480: LE32 dims at 19/23
      ("bmp_info", hx("424D" + "36000000" + "00000000" + "36000000" +
        "28000000" + "80020000" + "E0010000" + "0100" + "1800")),
      // BMP top-down: height = -480 (signed LE32) -> magnitude emitted
      ("bmp_topdown", hx("424D" + "36000000" + "00000000" + "36000000" +
        "28000000" + "80020000" + "20FEFFFF" + "0100" + "1800")),
      // BMP legacy BITMAPCOREHEADER 320x200: LE16 dims
      ("bmp_core", hx("424D" + "1A000000" + "00000000" + "1A000000" +
        "0C000000" + "4001" + "C800" + "0100" + "1800")),
      // TIFF little-endian, IFD at 8, leading Compression entry the
      // walk must skip, then SHORT width 800 / SHORT height 600
      ("tiff_ii", hx("49492A00" + "08000000" + "0300" +
        "0301" + "0300" + "01000000" + "0100" + "0000" +
        "0001" + "0300" + "01000000" + "2003" + "0000" +
        "0101" + "0300" + "01000000" + "5802" + "0000" +
        "00000000")),
      // TIFF big-endian: SHORT width 17, LONG height 70000 (> uint16,
      // exercises the type-4 full-field read)
      ("tiff_mm", hx("4D4D002A" + "00000008" + "0003" +
        "0103" + "0003" + "00000001" + "0001" + "0000" +
        "0100" + "0003" + "00000001" + "0011" + "0000" +
        "0101" + "0004" + "00000001" + "00011170" +
        "00000000")),
      // hostile TIFF: IFD offset near uint32-max must terminate before
      // any byte read (the ANSI int-cast hazard), not throw
      ("tiff_hostile", hx("49492A00" + "FFFFFFFF")),
      // truncated TIFF: header only, no IFD bytes at the offset
      ("tiff_trunc", hx("4D4D002A" + "00000008")))
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.mediaMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("bmp_info") == (("bmp", Some(640L), Some(480L))))
    assert(out("bmp_topdown") == (("bmp", Some(640L), Some(480L))))
    assert(out("bmp_core") == (("bmp", Some(320L), Some(200L))))
    assert(out("tiff_ii") == (("tiff", Some(800L), Some(600L))))
    assert(out("tiff_mm") == (("tiff", Some(17L), Some(70000L))))
    assert(out("tiff_hostile")._1 == "tiff" && out("tiff_hostile")._2.isEmpty)
    assert(out("tiff_trunc")._1 == "tiff" && out("tiff_trunc")._2.isEmpty)
  }

  test("fakeMediaHeader -> mediaMeta round trip for BMP and TIFF variants") {
    import spark.implicits._
    val dims = for (f <- Seq("bmp", "bmpcore", "tiffii", "tiffmm");
                    d <- Seq(16, 527, 65535)) yield (f, d, 65551 - d)
    val out = dims.toDF("fmt", "w", "h")
      .select(col("fmt"), col("w"), col("h"),
        Multimodal.mediaMeta(
          Multimodal.fakeMediaHeader(col("fmt"), col("w"), col("h"))).as("m"))
      .collect()
    out.foreach { r =>
      val (fmt, w, h) = (r.getString(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      val wantFmt = if (fmt.startsWith("bmp")) "bmp" else "tiff"
      assert(m.getString(0) == wantFmt, s"$fmt $w x $h -> ${m.getString(0)}")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong,
        s"$fmt $w x $h -> ${m.getLong(1)} x ${m.getLong(2)}")
    }
  }

  test("mediaMeta: hand-crafted WebP headers decode across all three variants; corrupt stays null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val riff = "52494646" + "16000000" + "57454250"
    val fixtures = Seq(
      // VP8 lossy 320x240: frame tag + sync 9D012A + 14-bit LE dims
      ("vp8_320", hx(riff + "56503820" + "0A000000" +
        "000000" + "9D012A" + "4001" + "F000")),
      // VP8L lossless 17x22: 2F signature + packed 14+14 bits
      // (wm=16 -> b1=10; hm=21 -> b2=40 (h low 2 bits <<6), b3=05, b4=00)
      ("vp8l_17", hx(riff + "5650384C" + "05000000" +
        "2F" + "10400500" + "00")),
      // VP8X extended 2000x1000: canvas dims-minus-one as 24-bit LE
      ("vp8x_2000", hx(riff + "56503858" + "0A000000" + "00000000" +
        "CF0700" + "E70300")),
      // RIFF/WEBP magic with an unknown first chunk: webp, null dims
      ("webp_odd_chunk", hx(riff + "41424344" + "04000000" + "00000000")),
      // truncated before the dimension bytes
      ("webp_trunc", hx(riff + "56503820" + "0A000000" + "0000")))
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.mediaMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("vp8_320") == (("webp", Some(320L), Some(240L))))
    assert(out("vp8l_17") == (("webp", Some(17L), Some(22L))))
    assert(out("vp8x_2000") == (("webp", Some(2000L), Some(1000L))))
    assert(out("webp_odd_chunk") == (("webp", None, None)))
    assert(out("webp_trunc")._1 == "webp" && out("webp_trunc")._2.isEmpty)
  }

  test("fakeWebpHeader -> mediaMeta round trip across variants and dims") {
    import spark.implicits._
    // 14-bit dimension ceiling for VP8/VP8L; VP8X shares the grid
    val grid = for (v <- Seq("vp8", "vp8l", "vp8x");
                    d <- Seq(1, 16, 527, 16383))
      yield (v, d, 16384 - d)
    val out = grid.toDF("v", "w", "h")
      .select(col("v"), col("w"), col("h"),
        Multimodal.mediaMeta(
          Multimodal.fakeWebpHeader(col("v"), col("w"), col("h"))).as("m"))
      .collect()
    out.foreach { r =>
      val (v, w, h) = (r.getString(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      assert(m.getString(0) == "webp", s"$v $w x $h -> ${m.getString(0)}")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong,
        s"$v $w x $h -> ${m.getLong(1)} x ${m.getLong(2)}")
    }
  }

  test("fakeMp4Header -> videoMeta round trip: both box versions, audio trak skipped") {
    import spark.implicits._
    val grid = for (v <- Seq("v0", "v1"); d <- Seq(16, 640, 3840))
      yield (v, d, 4096 - d, 600 + d, 90000L * d)
    val out = grid.toDF("v", "w", "h", "ts", "dur")
      .select(col("v"), col("w"), col("h"), col("ts"), col("dur"),
        Multimodal.videoMeta(Multimodal.fakeMp4Header(
          col("v"), col("w"), col("h"), col("ts"), col("dur"))).as("m"))
      .collect()
    out.foreach { r =>
      val (v, w, h, ts, dur) =
        (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      val m = r.getStruct(5)
      assert(m.getString(0) == "mp4", s"$v -> ${m.getString(0)}")
      assert(m.getLong(1) == w.toLong && m.getLong(2) == h.toLong,
        s"$v $w x $h -> ${m.getLong(1)} x ${m.getLong(2)}")
      assert(m.getLong(3) == ts.toLong && m.getLong(4) == dur,
        s"$v ts=$ts dur=$dur -> ${m.getLong(3)} / ${m.getLong(4)}")
    }
  }

  test("videoMeta: hostile/corrupt MP4 boxes stay null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000200"
    val fixtures = Seq(
      // hostile top-level size near uint32-max: walk must stop pre-read
      ("huge_box", hx(ftyp + "FFFFFFFF" + "6D646174")),
      // cyclic zero-size box: size < 8 stops the walk
      ("zero_box", hx(ftyp + "00000000" + "6D646174")),
      // moov declared but truncated before any child
      ("trunc_moov", hx(ftyp + "00000100" + "6D6F6F76")),
      // largesize mdat (size==1 + 64-bit size) then truncated: the
      // 16-byte header path must advance, not misparse
      ("largesize", hx(ftyp + "00000001" + "6D646174" + "0000000000000018")),
      // not an mp4 at all
      ("not_mp4", hx("0011223344556677")))
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.videoMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.timescale"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("huge_box") == (("mp4", None, None)))
    assert(out("zero_box") == (("mp4", None, None)))
    assert(out("trunc_moov") == (("mp4", None, None)))
    assert(out("largesize") == (("mp4", None, None)))
    assert(out("not_mp4") == (("unknown", None, None)))
  }

  test("videoMetaScan (mapPartitions scale tier) == videoMeta expression tier on grid + hostile fixtures") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000200"
    // the whole valid grid...
    val grid = for (v <- Seq("v0", "v1"); d <- Seq(16, 640, 3840))
      yield (v, d, 4096 - d, 600 + d, 90000L * d)
    val blobs = grid.zipWithIndex.map { case ((v, w, h, ts, dur), i) =>
      (i.toLong, v, w, h, ts, dur) }.toDF("id", "v", "w", "h", "ts", "dur")
      .select(col("id"), Multimodal.fakeMp4Header(col("v"), col("w"),
        col("h"), col("ts"), col("dur")).as("media"))
    // ...plus every hostile fixture, truncations of a valid header at
    // odd byte seams, and empty/null-ish blobs
    val valid = blobs.filter(col("id") === 0L)
      .select(col("media")).collect().head.getAs[Array[Byte]](0)
    val hostile = (Seq(
      (100L, hx(ftyp + "FFFFFFFF" + "6D646174")),
      (101L, hx(ftyp + "00000000" + "6D646174")),
      (102L, hx(ftyp + "00000100" + "6D6F6F76")),
      (103L, hx(ftyp + "00000001" + "6D646174" + "0000000000000018")),
      (104L, hx("0011223344556677")),
      (105L, Array.empty[Byte])) ++
      Seq(9, 17, 33, 47, 85, 101).zipWithIndex.map { case (cut, i) =>
        ((110 + i).toLong, valid.take(math.min(cut, valid.length))) })
      .toDF("id", "media")
    val all = blobs.unionByName(hostile)
    val exprTier = all
      .select(col("id"), Multimodal.videoMeta(col("media")).as("m"))
      .select(col("id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.timescale").as("timescale"), col("m.duration").as("duration"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fastTier = Multimodal.videoMetaScan(all, "media", "id")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(exprTier.keySet == fastTier.keySet)
    exprTier.keys.toSeq.sorted.foreach { id =>
      assert(exprTier(id) == fastTier(id),
        s"id=$id expr=${exprTier(id)} fast=${fastTier(id)}") }
  }

  test("fakeMp3Header -> mp3Meta round trip: versions, bitrate/rate tables, syncsafe ID3 skip") {
    import spark.implicits._
    val v1Br = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val v2Br = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    val rates = Map("1" -> Array(44100L, 48000L, 32000L),
      "2" -> Array(22050L, 24000L, 16000L), "2.5" -> Array(11025L, 12000L, 8000L))
    // id3 pads 0 / 127 / 200 exercise the syncsafe 7-bit carry at 128
    val grid = for (v <- Seq("1", "2", "2.5"); br <- Seq(1, 9, 14);
                    sr <- Seq(0, 1, 2); mono <- Seq(0, 1);
                    pad <- Seq(0, 127, 200)) yield (v, br, sr, mono, pad)
    val out = grid.toDF("v", "br", "sr", "mono", "pad")
      .select(col("*"), Multimodal.mp3Meta(Multimodal.fakeMp3Header(
        col("v"), col("br"), col("sr"), col("mono"), col("pad"))).as("m"))
      .collect()
    out.foreach { r =>
      val (v, br, sr, mono) =
        (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))
      val m = r.getStruct(5)
      assert(m.getString(0) == "mp3" && m.getString(1) == v && m.getInt(2) == 3,
        s"$v/$br/$sr -> ${m.mkString(",")}")
      val wantBr = if (v == "1") v1Br(br) else v2Br(br)
      assert(m.getInt(3) == wantBr && m.getLong(4) == rates(v)(sr),
        s"$v/$br/$sr -> ${m.mkString(",")}")
      assert(m.getInt(5) == (if (mono == 1) 1 else 2))
    }
  }

  test("mp3Meta: bare frame sync, free/bad bitrates, hostile ID3 size stay null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val fixtures = Seq(
      // no ID3 tag: frame header at byte 1 (MPEG1 III 128kbps 44.1 stereo)
      ("bare", hx("FFFB9000")),
      // free-format bitrate (index 0) nulls bitrate, rest decodes
      ("free_br", hx("FFFB0000")),
      // bad bitrate index (15) nulls bitrate
      ("bad_br", hx("FFFBF000")),
      // reserved sample-rate index (3) nulls rate
      ("bad_sr", hx("FFFB9C00")),
      // Layer II stream: bitrate null (III tables only), rate decodes
      ("layer2", hx("FFFD9000")),
      // ID3 tag whose syncsafe size points far past the blob
      ("id3_huge", hx("494433030000" + "7F7F7F7F" + "00")),
      ("garbage", hx("0102030405060708")))
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.mp3Meta(col("media")).as("m"))
      .collect().map { r =>
        val m = r.getStruct(1)
        r.getString(0) -> (m.getString(0), Option(m.get(1)), Option(m.get(2)),
          Option(m.get(3)), Option(m.get(4)))
      }.toMap
    assert(out("bare") == (("mp3", Some("1"), Some(3), Some(128), Some(44100L))))
    assert(out("free_br") == (("mp3", Some("1"), Some(3), None, Some(44100L))))
    assert(out("bad_br") == (("mp3", Some("1"), Some(3), None, Some(44100L))))
    assert(out("bad_sr") == (("mp3", Some("1"), Some(3), Some(128), None)))
    assert(out("layer2") == (("mp3", Some("1"), Some(2), None, Some(44100L))))
    assert(out("id3_huge")._1 == "unknown")
    assert(out("garbage")._1 == "unknown")
  }

  test("fakeFlacHeader -> flacMeta round trip: bit packing across the parameter grid") {
    import spark.implicits._
    // rates cross the 4-bit/12-bit byte seams; samples cross 32 bits
    val grid = for (ch <- Seq(1, 2, 8); rate <- Seq(8000L, 44100L, 96000L, 655350L);
                    bits <- Seq(8, 16, 24, 32);
                    n <- Seq(0L, 4294967296L * 3 + 17L)) yield (ch, rate, bits, n)
    val out = grid.toDF("ch", "rate", "bits", "n")
      .select(col("*"), Multimodal.flacMeta(Multimodal.fakeFlacHeader(
        col("ch"), col("rate"), col("bits"), col("n"))).as("m"))
      .collect()
    out.foreach { r =>
      val (ch, rate, bits, n) =
        (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3))
      val m = r.getStruct(4)
      assert(m.getString(0) == "flac" && m.getInt(1) == ch &&
        m.getLong(2) == rate && m.getInt(3) == bits && m.getLong(4) == n,
        s"$ch/$rate/$bits/$n -> ${m.mkString(",")}")
    }
    // non-FLAC and truncated inputs stay null-safe
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bad = Seq(("junk", hx("0011223344")), ("trunc", hx("664C6143" + "8000")))
      .toDF("id", "media")
      .select(col("id"), Multimodal.flacMeta(col("media")).as("m"))
      .collect().map(r => r.getString(0) ->
        (r.getStruct(1).getString(0), Option(r.getStruct(1).get(2)))).toMap
    assert(bad("junk") == (("unknown", None)))
    assert(bad("trunc") == (("flac", None)))
  }

  test("audioMeta: hand-crafted WAV chunk layouts decode; corrupt stays null-safe") {
    import spark.implicits._
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // fmt chunk: PCM(0100) + LE16 ch + LE32 rate + LE32 byteRate +
    // LE16 blockAlign + LE16 bits
    val fmt16k = "666D7420" + "10000000" +
      "0100" + "0200" + "803E0000" + "00FA0000" + "0400" + "1000"
    val fixtures = Seq(
      // canonical layout: fmt then data (1000 payload bytes declared)
      ("plain", hx("52494646" + "24080000" + "57415645" +
        fmt16k + "64617461" + "E8030000")),
      // DATA BEFORE FMT — the walk must capture both in either order
      // (4 real payload bytes so the walk lands on fmt, not inside them)
      ("data_first", hx("52494646" + "24080000" + "57415645" +
        "64617461" + "04000000" + "AABBCCDD" + fmt16k)),
      // ODD-sized LIST filler (size 5 -> one pad byte) before fmt
      ("odd_list", hx("52494646" + "24080000" + "57415645" +
        "4C495354" + "05000000" + "00" * 6 +
        fmt16k + "64617461" + "E8030000")),
      ("not_riff", "just text bytes".getBytes("UTF-8").toSeq.toArray),
      // RIFF/WAVE magic but truncated before any chunk completes
      ("wav_trunc", hx("52494646" + "24080000" + "57415645" + "666D")),
      // HOSTILE declared chunk size near uint32-max: the next offset
      // (13 + 8 + 0xFFFFFFF0) exceeds Int range — the walk must
      // terminate on the out-of-range guard, not throw CAST_OVERFLOW
      // under ANSI mode when the offset is cast to int for a byte read
      ("wav_hostile_size", hx("52494646" + "24080000" + "57415645" +
        "4C495354" + "F0FFFFFF" + "00" * 8)),
      // hostile size in a chunk AFTER fmt was captured: must keep the
      // already-captured fmt fields and stop cleanly (data stays null)
      ("wav_hostile_after_fmt", hx("52494646" + "24080000" + "57415645" +
        fmt16k + "4C495354" + "FFFFFFFF"))
    )
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.audioMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.channels"),
        col("m.sample_rate_hz"), col("m.bits_per_sample"),
        col("m.data_bytes"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)))).toMap
    for (id <- Seq("plain", "odd_list"))
      assert(out(id) == (("wav", Some(2), Some(16000L), Some(16), Some(1000L))),
        s"$id -> ${out(id)}")
    assert(out("data_first") ==
      (("wav", Some(2), Some(16000L), Some(16), Some(4L))),
      s"data_first -> ${out("data_first")}")
    assert(out("not_riff")._1 == "unknown" && out("not_riff")._2.isEmpty)
    assert(out("wav_trunc")._1 == "wav" && out("wav_trunc")._2.isEmpty &&
      out("wav_trunc")._5.isEmpty)
    assert(out("wav_hostile_size") ==
      (("wav", None, None, None, None)),
      s"wav_hostile_size -> ${out("wav_hostile_size")}")
    assert(out("wav_hostile_after_fmt") ==
      (("wav", Some(2), Some(16000L), Some(16), None)),
      s"wav_hostile_after_fmt -> ${out("wav_hostile_after_fmt")}")
  }

  test("fakeWavHeader -> audioMeta round trip across PCM parameter grid") {
    import spark.implicits._
    val grid = for (ch <- Seq(1, 2, 6); rate <- Seq(8000L, 44100L, 48000L);
                    bits <- Seq(8, 16, 24))
      yield (ch, rate, bits, ch * rate * bits / 8) // 1 second of payload
    val out = grid.toDF("ch", "rate", "bits", "db")
      .select(col("ch"), col("rate"), col("bits"), col("db"),
        Multimodal.audioMeta(Multimodal.fakeWavHeader(
          col("ch"), col("rate"), col("bits"), col("db"))).as("m"))
      .collect()
    out.foreach { r =>
      val m = r.getStruct(4)
      assert(m.getString(0) == "wav")
      assert(m.getInt(1) == r.getInt(0) && m.getLong(2) == r.getLong(1) &&
        m.getInt(3) == r.getInt(2) && m.getLong(4) == r.getLong(3),
        s"${r.getInt(0)}ch ${r.getLong(1)}Hz ${r.getInt(2)}bit -> $m")
    }
  }

  test("fakeOggHeader -> oggMeta round trip; hand-crafted pages incl. multi-segment and junk packets") {
    import spark.implicits._
    // round trip across the codec grid
    val grid = for (codec <- Seq("vorbis", "opus"); ch <- Seq(1, 2, 8);
                    rate <- Seq(8000L, 44100L, 48000L))
      yield (codec, ch, rate, 312)
    val rt = grid.toDF("codec", "ch", "rate", "skip")
      .select(col("*"), Multimodal.oggMeta(Multimodal.fakeOggHeader(
        col("codec"), col("ch"), col("rate"), col("skip"))).as("m"))
      .collect()
    rt.foreach { r =>
      val m = r.getStruct(4)
      assert(m.getString(0) == s"ogg-${r.getString(0)}", m.toString)
      assert(m.getInt(1) == r.getInt(1) && m.getLong(2) == r.getLong(2))
      if (r.getString(0) == "opus") assert(m.getInt(3) == r.getInt(3))
      else assert(m.isNullAt(3), "pre-skip is an Opus-only field")
    }
    // hand-crafted: a MULTI-segment table shifts the payload — the
    // decoder must honor n_segments, not assume one lacing byte
    val pageHdr = "4F676753" + "00" + "02" + "00" * 8 + "00" * 4 + "00" * 4 + "00" * 4
    val vorbisPkt = "01766F72626973" + "00000000" + "02" + "44AC0000" +
      "00" * 12 + "B8" + "01"
    val multiSeg = pageHdr + "03" + "1E" + "00" + "00" + vorbisPkt
    // unknown first packet -> container recognized, fields null
    val junkPkt = pageHdr + "01" + "04" + "DEADBEEF"
    val cases = Seq(
      ("multi_seg", multiSeg),
      ("junk_packet", junkPkt),
      ("truncated", "4F6767"),              // not even the magic
      ("not_ogg", "52494646AABBCCDD"))
    val out = cases.toDF("id", "hx")
      .select(col("id"), Multimodal.oggMeta(unhex(col("hx"))).as("m"))
      .collect().map { r =>
        val m = r.getStruct(1)
        r.getString(0) -> ((m.getString(0),
          if (m.isNullAt(1)) None else Some(m.getInt(1)),
          if (m.isNullAt(2)) None else Some(m.getLong(2))))
      }.toMap
    assert(out("multi_seg") == (("ogg-vorbis", Some(2), Some(44100L))),
      s"multi_seg -> ${out("multi_seg")}")
    assert(out("junk_packet") == (("ogg", None, None)),
      s"junk_packet -> ${out("junk_packet")}")
    assert(out("truncated")._1 == "unknown")
    assert(out("not_ogg")._1 == "unknown")
  }

  test("frameSample: n frames of fixed size; tiny media yields empty") {
    import spark.implicits._
    val df = Seq(("long", "x" * 100), ("tiny", "ab")).toDF("id", "text")
    val m = Multimodal.withFakeMedia(df, "text")
      .select(col("id"), Multimodal.frameSample(col("media"), 4, 8).as("frames"))
    val rows = m.collect().map(r => r.getString(0) -> r.getSeq[Array[Byte]](1)).toMap
    assert(rows("long").length == 4)
    assert(rows("long").forall(_.length == 8))
    assert(rows("tiny").isEmpty)
  }

  test("bmpPixelStats: decodes fakeBmp24 exactly across every pad width; JVM replay agrees") {
    import spark.implicits._
    // w 1..4 covers pad widths 1/2/3/0; h 1..3 covers multi-row strides
    val cases = for (w <- 1 to 4; h <- 1 to 3) yield (w * 100L + h, w, h)
    val got = cases.toDF("seed", "w", "h")
      .select(col("seed"), Multimodal.bmpPixelStats(
        Multimodal.fakeBmp24(col("seed"), col("w"), col("h"))).as("st"))
      .select(col("seed"), col("st.*")).collect()
    assert(got.length == cases.length)
    got.foreach { r =>
      val seed = r.getLong(0)
      val (w, h) = ((seed / 100).toInt, (seed % 100).toInt)
      val px = for (fr <- 0 until h; c <- 0 until w) yield (
        (seed * 7 + fr * 3 + c) % 256,
        (seed * 11 + fr * 5 + c * 2) % 256,
        (seed * 13 + fr * 7 + c * 3) % 256)
      assert(r.getLong(1) == w && r.getLong(2) == h && r.getLong(3) == w * h)
      val (bs, gs, rs) = (px.map(_._1), px.map(_._2), px.map(_._3))
      assert(r.getInt(4) == bs.min && r.getInt(5) == bs.max &&
        r.getLong(6) == bs.sum, s"B channel at seed=$seed")
      assert(r.getDouble(7) ==
        BigDecimal(bs.sum.toDouble / (w * h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getInt(8) == gs.min && r.getInt(9) == gs.max &&
        r.getLong(10) == gs.sum, s"G channel at seed=$seed")
      assert(r.getInt(12) == rs.min && r.getInt(13) == rs.max &&
        r.getLong(14) == rs.sum, s"R channel at seed=$seed")
    }
  }

  test("bmpPixelStats: hostile fixtures all yield null, never a partial stat") {
    import spark.implicits._
    val base = Multimodal.fakeBmp24(lit(42L), lit(3), lit(2))
    val hostile = Seq(
      // truncated: header only / header + part of one row
      ("trunc_header", substring(base, 1, 53)),
      ("trunc_pixels", substring(base, 1, 57)),
      // BITMAPCOREHEADER (dib 12): header decode handles it, the
      // pixel tier declines (different field layout)
      ("bmpcore", Multimodal.fakeMediaHeader(lit("bmpcore"), lit(3), lit(2))),
      // compression flipped to BI_RLE8
      ("compressed", overlay(base, unhex(lit("01")), lit(31))),
      // bpp flipped to 8
      ("bpp8", overlay(base, unhex(lit("08")), lit(29))),
      // magic destroyed
      ("notbmp", overlay(base, unhex(lit("00")), lit(1))),
      // width*height past the walk bound
      ("oversize", Multimodal.fakeBmp24(lit(1L), lit(100), lit(100))),
      // zero-dim
      ("zerow", overlay(base, unhex(lit("00000000")), lit(19))))
    val rows = hostile.map(_._1).toDF("name")
      .collect() // names only; evaluate each expression independently
    hostile.foreach { case (name, blob) =>
      val st = spark.range(1).select(Multimodal.bmpPixelStats(blob).as("st"))
        .collect()(0)
      assert(st.isNullAt(0), s"hostile fixture '$name' must decode to null")
    }
    assert(rows.length == hostile.length)
  }

  test("wavSampleStats: JVM replay of every field; header agrees with audioMeta") {
    val (seed, ch, rate, nf) = (9L, 2, 8000L, 5)
    val blob = Multimodal.fakeWav16(lit(seed), lit(ch), lit(rate), lit(nf))
    val row = spark.range(1).select(
        Multimodal.wavSampleStats(blob).as("st"),
        Multimodal.audioMeta(blob).as("am"))
      .select(col("st.*"), col("am.channels").as("am_ch"),
        col("am.sample_rate_hz").as("am_rate"),
        col("am.data_bytes").as("am_db"))
      .collect()(0)
    val n = ch * nf
    val samples = (0 until n).map(i => ((seed * 31 + i * 17) % 65536 - 32768).toInt)
    assert(row.getInt(0) == ch && row.getLong(1) == rate &&
      row.getLong(2) == n)
    assert(row.getInt(3) == samples.map(math.abs).max)  // peak
    assert(row.getInt(4) == samples.min && row.getInt(5) == samples.max)
    assert(row.getLong(6) == samples.map(_.toLong).sum)
    def r6(d: Double) = BigDecimal.valueOf(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(7) == r6(samples.map(_.toLong).sum.toDouble / n))
    val sq = samples.map(v => v.toLong * v).sum
    assert(row.getLong(8) == sq)
    assert(row.getDouble(9) == r6(math.sqrt(sq.toDouble / n)))
    // the sample decoder and the header decoder must agree on the
    // container fields — two independent walks over the same bytes
    assert(row.getInt(10) == ch && row.getLong(11) == rate &&
      row.getLong(12) == 2L * n)
  }

  test("wavSampleStats: hostile fixtures all yield null") {
    val base = Multimodal.fakeWav16(lit(3L), lit(1), lit(8000L), lit(6))
    val hostile = Seq(
      ("trunc_data", substring(base, 1, 50)),
      ("header_only", substring(base, 1, 44)),
      ("bits8", overlay(base, unhex(lit("08")), lit(35))),
      ("nonpcm", overlay(base, unhex(lit("03")), lit(21))),
      ("notriff", overlay(base, unhex(lit("00")), lit(1))),
      ("oversize", Multimodal.fakeWav16(lit(3L), lit(2), lit(8000L),
        lit(40000))))
    hostile.foreach { case (name, blob) =>
      val maxS = if (name == "oversize") 65536 else 65536
      val st = spark.range(1)
        .select(Multimodal.wavSampleStats(blob, maxS).as("st")).collect()(0)
      assert(st.isNullAt(0), s"hostile WAV '$name' must decode to null")
    }
    // the walk survives a leading ODD-sized junk chunk + pad byte (the
    // audioMeta contract): LIST(9) injected between WAVE and fmt —
    // stats must equal the unpadded clip's
    val junk = "4C495354" + "09000000" + "00" * 10 // "LIST", size 9, 9+pad
    val padded = concat(substring(base, 1, 12), unhex(lit(junk)),
      substring(base, 13, 1 << 20))
    val out = spark.range(1).select(
        Multimodal.wavSampleStats(base).as("a"),
        Multimodal.wavSampleStats(padded).as("b")).collect()(0)
    assert(!out.isNullAt(0) && out.getStruct(0) == out.getStruct(1),
      "odd junk chunk must not perturb the sample decode")
  }

  test("bmpAHash: JVM grid replay; stable under trailing junk; hostile null") {
    val seed = 42L
    val (w, h) = (3, 2)
    val blob = Multimodal.fakeBmp24(lit(seed), lit(w), lit(h))
    val got = spark.range(1)
      .select(Multimodal.bmpAHash(blob).as("a"))
      .select(col("a.h0"), col("a.h1")).collect()(0)
    // replay the whole hash from the pixel rule in plain Scala
    val cells = for (gi <- 0 until 8; gj <- 0 until 8) yield {
      val fr = gi * h / 8
      val c = gj * w / 8
      (seed * 7 + fr * 3 + c) % 256 +
        (seed * 11 + fr * 5 + c * 2) % 256 +
        (seed * 13 + fr * 7 + c * 3) % 256
    }
    val total = cells.sum
    var w0 = 0L; var w1 = 0L
    cells.zipWithIndex.foreach { case (s, k) =>
      if (s * 64 > total) {
        if (k < 32) w0 |= 1L << k else w1 |= 1L << (k - 32)
      }
    }
    assert((got.getLong(0), got.getLong(1)) == ((w0, w1)))
    assert(w0 != 0L || w1 != 0L, "degenerate all-zero hash fixture")
    // the pixel array bounds the decode: appended junk cannot move it
    val junked = spark.range(1).select(Multimodal.bmpAHash(
        concat(blob, lit(Array[Byte](9, 9, 9)))).as("a"))
      .select(col("a.h0"), col("a.h1")).collect()(0)
    assert((junked.getLong(0), junked.getLong(1)) == ((w0, w1)))
    // hostile: truncated mid-pixel-array -> null (the stats contract)
    val trunc = spark.range(1).select(
      Multimodal.bmpAHash(substring(blob, 1, 57)).as("a")).collect()(0)
    assert(trunc.isNullAt(0))
  }

  test("bmpPixelStats: top-down (negative height) BMP decodes with identical stats") {
    val pos = Multimodal.fakeBmp24(lit(7L), lit(3), lit(2))
    // height -2 as LE32 at offset 23: FEFFFFFF
    val neg = overlay(pos, unhex(lit("FEFFFFFF")), lit(23))
    val out = spark.range(1).select(
        Multimodal.bmpPixelStats(pos).as("p"),
        Multimodal.bmpPixelStats(neg).as("n"))
      .collect()(0)
    assert(!out.isNullAt(1), "top-down BMP must decode")
    assert(out.getStruct(0) == out.getStruct(1),
      "row order cannot change order-independent statistics")
  }

  test("bmpAHash: top-down and bottom-up encodings of the SAME image hash identically") {
    import etlmudah.expr.BmpPixelStatsFn
    val (seed, w, h) = (42L, 5, 4)
    val bottomUp = BmpPixelStatsFn.synth(seed, w, h)
    // the top-down twin: pixel rows reversed in file order, DIB height
    // negated — byte-for-byte the same VISUAL image
    val stride = (w * 3 + 3) / 4 * 4
    val topDown = bottomUp.clone()
    for (fr <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - fr) * stride,
        topDown, 54 + fr * stride, stride)
    val negH = -h
    for (i <- 0 until 4)
      topDown(22 + i) = ((negH >> (8 * i)) & 0xFF).toByte
    val out = spark.range(1).select(
        Multimodal.bmpAHash(lit(bottomUp)).as("b"),
        Multimodal.bmpAHash(lit(topDown)).as("t"),
        Multimodal.bmpPixelStats(lit(bottomUp)).as("sb"),
        Multimodal.bmpPixelStats(lit(topDown)).as("st"))
      .collect()(0)
    assert(!out.isNullAt(1), "top-down twin must decode")
    assert(out.getStruct(0) == out.getStruct(1),
      "aHash must be invariant to the storage row order of one image")
    assert(out.getStruct(2) == out.getStruct(3))
  }

  test("bmpResize: floor block means from the closed form; composition; hostile inputs null") {
    import etlmudah.expr.BmpPixelStatsFn
    val (seed, w, h) = (9L, 5, 7)   // odd dims: trailing row/col truncate
    val img = BmpPixelStatsFn.synth(seed, w, h)
    def px(c: Int, fr: Int, cc: Int): Long = c match {
      case 0 => Math.floorMod(seed * 7 + fr * 3 + cc, 256L)
      case 1 => Math.floorMod(seed * 11 + fr * 5 + cc * 2, 256L)
      case _ => Math.floorMod(seed * 13 + fr * 7 + cc * 3, 256L)
    }
    // serial box filter: floor mean per 2x2 block, ow=2, oh=3
    val exp = for (c <- 0 to 2) yield (for {
      oy <- 0 until 3; ox <- 0 until 2
    } yield (for (dy <- 0 until 2; dx <- 0 until 2)
      yield px(c, oy * 2 + dy, ox * 2 + dx)).sum / 4)
    val out = spark.range(1).select(Multimodal.bmpPixelStats(
        org.apache.spark.sql.functions.call_function("graft_bmp_resize",
          lit(img), lit(2))).as("s"))
      .select(col("s.width"), col("s.height"), col("s.n_px"),
        col("s.b_min"), col("s.b_sum"), col("s.g_sum"), col("s.r_sum"))
      .collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 3L &&
      out.getLong(2) == 6L)
    assert(out.getInt(3) == exp(0).min.toInt)
    assert(out.getLong(4) == exp(0).sum &&
      out.getLong(5) == exp(1).sum && out.getLong(6) == exp(2).sum)
    // resize(f=1) is the identity on the pixel statistics
    val idAndHostile = spark.range(1).select(
        Multimodal.bmpPixelStats(call_function("graft_bmp_resize",
          lit(img), lit(1))).as("a"),
        Multimodal.bmpPixelStats(lit(img)).as("b"),
        // factor collapsing a dimension below one block -> null
        call_function("graft_bmp_resize", lit(img), lit(8)).as("c"),
        // truncated pixel array -> null, never a partial image
        call_function("graft_bmp_resize",
          lit(img.take(54 + 3)), lit(2)).as("d"))
      .collect()(0)
    assert(idAndHostile.getStruct(0) == idAndHostile.getStruct(1))
    assert(idAndHostile.isNullAt(2) && idAndHostile.isNullAt(3))
    // top-down input keeps its orientation: resized twins still agree
    val stride = (w * 3 + 3) / 4 * 4
    val topDown = img.clone()
    for (fr <- 0 until h)
      System.arraycopy(img, 54 + (h - 1 - fr) * stride,
        topDown, 54 + fr * stride, stride)
    for (i <- 0 until 4)
      topDown(22 + i) = (((-h) >> (8 * i)) & 0xFF).toByte
    val tw = spark.range(1).select(
        Multimodal.bmpAHash(call_function("graft_bmp_resize",
          lit(img), lit(2))).as("a"),
        Multimodal.bmpAHash(call_function("graft_bmp_resize",
          lit(topDown), lit(2))).as("t"))
      .collect()(0)
    assert(!tw.isNullAt(0) && !tw.isNullAt(1))
    // note: blocks group over FILE rows; for odd h the truncated row
    // differs between layouts (bottom-up drops the visual TOP row,
    // top-down the visual BOTTOM row), so exact hash equality is only
    // guaranteed at even h — here we pin decodability + orientation
    // plumbing, and check equality on an even-height twin below
    val (we, he) = (4, 4)
    val even = BmpPixelStatsFn.synth(seed, we, he)
    val strideE = (we * 3 + 3) / 4 * 4
    val evenTd = even.clone()
    for (fr <- 0 until he)
      System.arraycopy(even, 54 + (he - 1 - fr) * strideE,
        evenTd, 54 + fr * strideE, strideE)
    for (i <- 0 until 4)
      evenTd(22 + i) = (((-he) >> (8 * i)) & 0xFF).toByte
    val eq = spark.range(1).select(
        Multimodal.bmpAHash(call_function("graft_bmp_resize",
          lit(even), lit(2))).as("a"),
        Multimodal.bmpAHash(call_function("graft_bmp_resize",
          lit(evenTd), lit(2))).as("t"))
      .collect()(0)
    assert(eq.getStruct(0) == eq.getStruct(1),
      "even-dim resize must be layout-invariant end to end")
  }

  test("wavFeatures: serial replay of crossings and silence runs; hostile inputs null") {
    import etlmudah.expr.WavSampleStatsFn
    // seed*31 = 32736: samples start at -32 and climb 17 per step, so
    // the stream crosses zero at i=2 and stays inside the silence band
    val (seed, nf) = (1056L, 40)
    val wav = WavSampleStatsFn.synth(seed, 1, 8000, nf)
    val samples = (0 until nf)
      .map(i => (Math.floorMod(seed * 31 + i * 17, 65536L) - 32768).toInt)
    val thresh = 8000
    val expZc = samples.sliding(2)
      .count(p => p.head.toLong * p(1) < 0).toLong
    val silentFlags = samples.map(v => math.abs(v) <= thresh)
    val runLens = silentFlags.foldLeft(List.empty[Long]) {
      case (acc, true) if acc.nonEmpty && acc.head > 0 =>
        (acc.head + 1) :: acc.tail
      case (acc, true) => 1L :: acc
      case (acc, false) => 0L :: acc
    }.filter(_ > 0)
    val out = spark.range(1).select(
        call_function("graft_wav_features", lit(wav), lit(thresh)).as("f"),
        call_function("graft_wav_features",
          lit(wav.take(50)), lit(thresh)).as("bad"))
      .select(col("f.n_samples"), col("f.n_zero_cross"),
        col("f.n_silent"), col("f.n_silence_runs"),
        col("f.max_silence_run"), col("bad"))
      .collect()(0)
    assert(out.getLong(0) == nf.toLong)
    assert(out.getLong(1) == expZc)
    assert(out.getLong(2) == silentFlags.count(identity).toLong)
    assert(out.getLong(3) == runLens.size.toLong)
    assert(out.getLong(4) == (if (runLens.isEmpty) 0L else runLens.max))
    assert(out.isNullAt(5), "truncated WAV must be null")
    assert(expZc > 0 && silentFlags.exists(identity),
      "fixture must exercise both features")
  }

  test("fake media synth: closed forms hold verbatim for negative seeds (floorMod)") {
    // BMP: stats replay from the documented floorMod pixel rule
    val (seed, w, h) = (-5L, 3, 2)
    val st = spark.range(1).select(Multimodal.bmpPixelStats(
        Multimodal.fakeBmp24(lit(seed), lit(w), lit(h))).as("s"))
      .select(col("s.b_min"), col("s.b_max"), col("s.b_sum")).collect()(0)
    val bs = for (fr <- 0 until h; c <- 0 until w)
      yield Math.floorMod(seed * 7 + fr * 3 + c, 256L)
    assert(st.getInt(0) == bs.min && st.getInt(1) == bs.max &&
      st.getLong(2) == bs.sum)
    // WAV: decoded samples equal the documented floorMod closed form
    val (ws, ch, nf) = (-9L, 1, 6)
    val row = spark.range(1).select(Multimodal.wavSampleStats(
        Multimodal.fakeWav16(lit(ws), lit(ch), lit(8000L), lit(nf))).as("s"))
      .select(col("s.s_min"), col("s.s_max"), col("s.s_sum")).collect()(0)
    val samples = (0 until ch * nf)
      .map(i => (Math.floorMod(ws * 31 + i * 17, 65536L) - 32768).toInt)
    val naive = (0 until ch * nf)
      .map(i => ((ws * 31 + i * 17) % 65536L - 32768).toInt)
    assert(samples != naive, "fixture must exercise the negative-remainder divergence")
    assert(row.getInt(0) == samples.min && row.getInt(1) == samples.max &&
      row.getLong(2) == samples.map(_.toLong).sum)
  }
}
