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
