package etlmudah.analytics

import graft.SparkSpec

class SetOpsSpec extends SparkSpec {

  private def df(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("unionAll resolves by name, not position") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq(("y", 2)).toDF("v", "id")   // reversed column order
    val out = SetOps.unionAll(a, b).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "x"), (2, "y")))
  }

  test("unionDistinct / intersect / except semantics") {
    val a = df((1, "x"), (2, "y"), (2, "y"))
    val b = df((2, "y"), (3, "z"))
    assert(SetOps.unionDistinct(a, b).count() == 3)
    assert(SetOps.intersect(a, b).collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(SetOps.except(a, b).collect().map(_.getInt(0)).toSeq == Seq(1))
  }
}
