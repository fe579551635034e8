package etlmudah.quality

import graft.SparkSpec
import etlmudah.Tables
import etlmudah.quality.Validate.{FkRule, RowRule, UniqueRule}
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {

  test("report: all three tiers, exact counts and minimal witnesses") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, "A"), (2L, -5.0, "A"), (3L, 0.0, "B"),
      (3L, 7.0, "C"), (4L, 2.0, null))
      .toDF("id", "price", "grp")
    val parent = Seq("A", "B").toDF("g")
    val got = Validate.report(df, "id",
        rowRules = Seq(
          RowRule("price_positive", col("price") > 0),
          RowRule("grp_not_null", col("grp").isNotNull)),
        uniqueRules = Seq(UniqueRule("id_unique", Seq("id"))),
        fkRules = Seq(FkRule("grp_covered", "grp", parent, "g")))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(5)) null else r.getString(5)))).toMap
    // price > 0 fails on -5 (id 2) and 0 (id 3)
    assert(got("price_positive") == (("row", 5L, 2L, "2")))
    assert(got("grp_not_null") == (("row", 5L, 1L, "4")))
    // id 3 appears twice -> one surplus row
    assert(got("id_unique") == (("unique", 5L, 1L, "3")))
    // null grp is NOT checked (4 rows checked); 'C' is uncovered
    assert(got("grp_covered") == (("fk", 4L, 1L, "C")))
  }

  test("row rules: a NULL predicate verdict is a failure, not a pass") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "x")
    val r = Validate.report(df, "id",
        rowRules = Seq(RowRule("x_big", col("x") > 1.0)))
      .collect()(0)
    assert(r.getLong(3) == 1L && r.getString(5) == "2",
      "null comparison must count as failed")
  }

  test("row rules: the whole suite costs ONE scan of the frame") {
    val orders = Tables.orders(spark, sf0001)
    val plan = Validate.rowReport(orders, "o_orderkey", Seq(
        RowRule("a", col("o_totalprice") > 0),
        RowRule("b", col("o_orderstatus").isin("P", "O", "F")),
        RowRule("c", col("o_orderpriority").startsWith("1"))))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one scan, got $scans\n" + plan.take(800))
  }

  test("report: passing rules report zero failures and a null example") {
    val orders = Tables.orders(spark, sf0001)
    val rows = Validate.report(orders, "o_orderkey",
        rowRules = Seq(RowRule("status_known",
          col("o_orderstatus").isin("P", "O", "F"))),
        uniqueRules = Seq(UniqueRule("key_unique", Seq("o_orderkey"))),
        fkRules = Seq(FkRule("cust_covered", "o_custkey",
          Tables.customer(spark, sf0001), "c_custkey")))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L, s"${r.getString(0)} should pass")
      assert(r.getDouble(4) == 0.0)
      assert(r.isNullAt(5), "a passing rule has no witness")
    }
  }

  test("checksumDiff: identical == empty; value change, dropped row, and even-multiplicity dup all surface") {
    import spark.implicits._
    val cols = Seq("id", "v")
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "w"))
      .toDF("id", "v")
    // identical multisets -> empty diff, at any partitioning
    assert(Validate.checksumDiff(a, a.repartition(5), cols, 8)
      .count() == 0L)
    // a single value change surfaces
    val changed = Seq((1L, "x"), (2L, "CHANGED"), (3L, "z"), (4L, "w"))
      .toDF("id", "v")
    assert(Validate.checksumDiff(a, changed, cols, 8).count() > 0L)
    // a dropped row surfaces
    assert(Validate.checksumDiff(a, a.where(col("id") =!= 3L), cols, 8)
      .count() > 0L)
    // THE xor blind spot: duplicating a row TWICE cancels in xor —
    // count and mod-sum must still catch it
    val dupTwice = a.unionByName(a.where(col("id") === 1L))
      .unionByName(a.where(col("id") === 1L))
    val d = Validate.checksumDiff(a, dupTwice, cols, 8).collect()
    assert(d.nonEmpty, "even-multiplicity dup must surface")
    assert(d.exists(r => r.getAs[Long]("xor_a") == r.getAs[Long]("xor_b")),
      "xor alone is blind here — the companions carry the catch")
    // nulls are distinct from empty strings in the hash
    val withNull = Seq((1L, Option("x")), (2L, None)).toDF("id", "v")
    val withEmpty = Seq((1L, Option("x")), (2L, Option("")))
      .toDF("id", "v")
    assert(Validate.checksumDiff(withNull, withEmpty, cols, 8)
      .count() > 0L)
  }
}
