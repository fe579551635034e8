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
      ("png_trunc", hx("89504E470D0A1A0A" + "0000"))
    )
    val out = fixtures.toDF("id", "media")
      .select(col("id"), Multimodal.mediaMeta(col("media")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out("png640") == (("png", Some(640), Some(480))))
    assert(out("gif320") == (("gif", Some(320), Some(200))))
    assert(out("jpeg320") == (("jpeg", Some(320), Some(240))))
    assert(out("jpeg_sof2") == (("jpeg", Some(17), Some(19))))
    assert(out("not_media")._1 == "unknown" && out("not_media")._2.isEmpty)
    assert(out("png_trunc")._1 == "png" && out("png_trunc")._2.isEmpty)
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
      assert(m.getInt(1) == w && m.getInt(2) == h,
        s"$fmt $w x $h -> ${m.getInt(1)} x ${m.getInt(2)}")
    }
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
}
