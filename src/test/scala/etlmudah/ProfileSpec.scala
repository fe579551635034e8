package etlmudah.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

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

  test("driftPsi: hand-computed shares and terms; identical snapshots give PSI 0") {
    import spark.implicits._
    // base: bins 0 (2 rows), 1 (2 rows); next: bins 0 (3 rows), 2 (1 row)
    val base = Seq(5.0, 9.0, 15.0, 19.0).toDF("v")
    val next = Seq(5.0, 6.0, 7.0, 25.0).toDF("v")
    val out = Profile.driftPsi(base, next, "v", binWidth = 10.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    def term(pb: Double, pn: Double) =
      BigDecimal((pn - pb) * math.log(pn / pb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (0L, 2L, 3L, 0.5, 0.75, term(0.5, 0.75)),
      (1L, 2L, 0L, 0.5, 1e-6, term(0.5, 1e-6)),
      (2L, 0L, 1L, 1e-6, 0.25, term(1e-6, 0.25))), out.toSeq.toString)
    // no drift -> every term 0
    val same = Profile.driftPsi(base, base, "v", binWidth = 10.0).collect()
    assert(same.forall(_.getDouble(5) == 0.0))
  }

  test("schemaDiff: added/removed/retyped/unchanged classified; identical schemas all unchanged") {
    import spark.implicits._
    val base = Seq((1L, "a", 1.0)).toDF("id", "s", "v")
    val next = base.drop("s")
      .withColumn("v", col("v").cast("float"))
      .withColumn("extra", lit(true))
    val got = Profile.schemaDiff(base, next).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      ("extra", "added", null, "boolean"),
      ("id", "unchanged", "bigint", "bigint"),
      ("s", "removed", "string", null),
      ("v", "retyped", "double", "float")), got.toSeq.toString)
    assert(Profile.schemaDiff(base, base).collect()
      .forall(_.getString(1) == "unchanged"))
  }
}
