package etlmudah.analytics

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profileTable: nulls, exact distincts, typed min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("x"), Option(2.5)),
      (2L, None, Option(1.0)),
      (3L, Option("y"), None),
      (4L, Option("x"), Option(2.5))
    ).toDF("id", "s", "v")
    val p = Profile.profileTable(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "x" && s.getString(7) == "y")
    val v = p("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 1.0 && v.getDouble(5) == 2.5)
  }

  test("profileTable: timestamps format as yyyy-MM-dd HH:mm:ss strings") {
    val orders = etlmudah.Tables.orders(spark, sf0001)
    val p = Profile.profileTable(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    val d = p("o_orderdate")
    assert(d.getString(6).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
    assert(d.getString(6) <= d.getString(7))
    // row count is consistent across all columns
    assert(p.values.map(_.getLong(1)).toSet.size == 1)
  }
}
