package etlmudah.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("jsonInt: extracts, coerces, nulls on malformed/missing") {
    import spark.implicits._
    val df = Seq("""{"k": 87}""", """{"k": "x"}""", """{"j": 1}""", "not json", "")
      .toDF("props")
    val out = df.select(Ingest.jsonInt(col("props"), "$.k").as("k")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(87), None, None, None, None))
  }

  test("flattenEvents: regex gate + null-key drop + clip") {
    import spark.implicits._
    val df = Seq(
      (1L, "click", """{"k": 5}""", 250.0),
      (2L, "BAD-TYPE", """{"k": 5}""", 1.0),   // fails ^[a-z]+$ gate
      (3L, "view", """{"nope": 1}""", 2.0),    // k missing -> dropped
      (4L, "view", """{"k": 7}""", 50.0)
    ).toDF("event_id", "event_type", "props", "value")
    val out = Ingest.flattenEvents(df).orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L))
    assert(out.head.getAs[Double]("value_clip") == 100.0)   // 250 clipped
    assert(out.last.getAs[Double]("value_clip") == 50.0)
  }

  test("withAge: frozen nowYear arithmetic, null on dirty year") {
    import spark.implicits._
    val df = Seq("2020", "bad", "1999").toDF("year")
    val out = Ingest.withAge(df, "year", 2026).collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getInt(1)))
    assert(out.toSeq == Seq(Some(6), None, Some(27)))
  }
}
