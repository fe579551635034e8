package etlmudah.joins

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("lineitemStar: row count equals lineitem (dims are 1:1 lookups)") {
    val star = Joins.lineitemStar(
      Tables.lineitem(spark, sf0001), Tables.orders(spark, sf0001),
      Tables.customer(spark, sf0001), Tables.nation(spark, sf0001))
    assert(star.count() == Tables.lineitem(spark, sf0001).count())
  }

  test("bandJoin: only pairs within tolerance survive") {
    import spark.implicits._
    val l = Seq((1L, "b1", 10.0), (2L, "b1", 50.0)).toDF("lid", "brand", "v")
    val r = Seq((10L, "b1", 12.0), (11L, "b1", 30.0), (12L, "b2", 10.0))
      .toDF("rid", "brand2", "v2")
    val out = Joins.bandJoin(l, r, Seq(("brand", "brand2")), ("v", "v2"), 5.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(out.toSet == Set((1L, 10L)))   // same brand, |10-12|<=5
  }

  test("asofJoin: inclusive <=, latest-wins, null on no prior, per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L),   // key 100, ts 10: right at 10 matches (inclusive)
      (2L, 100L, 25L),   // latest prior is ts 20, not ts 10
      (3L, 100L, 5L),    // nothing at or before ts 5 -> null
      (4L, 200L, 50L))   // other key: only key-200 history visible
      .toDF("lid", "k", "t")
      .withColumn("t", timestamp_micros(col("t")))
    val right = Seq(
      (91L, 100L, 10L), (92L, 100L, 20L), (93L, 100L, 30L),
      (94L, 200L, 49L), (95L, 300L, 1L))
      .toDF("rid", "k", "t")
      .withColumn("t", timestamp_micros(col("t")))
    val out = Joins.asofJoin(left, right, "k", "t", Seq("rid" -> "matched"))
      .select("lid", "matched").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 91L), (2L, 92L), (3L, -1L), (4L, 94L)))
  }

  test("saltedJoin: same result as a plain join, keys spread over salts") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customers = Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val plain = orders.join(customers, "o_custkey")
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect().head
    val salted = Joins.saltedJoin(orders, customers, "o_custkey", 8)
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect().head
    assert(plain == salted)
  }

  test("skewReport: hot key surfaces with correct share and x_avg") {
    import spark.implicits._
    // 10 rows of key 1, one row each of keys 2..6 -> 15 rows, 6 keys
    val df = (Seq.fill(10)(1L) ++ (2L to 6L)).map(Tuple1(_)).toDF("k")
    val top = Joins.skewReport(df, "k", topK = 2).collect()
    assert(top.length == 2)
    val hot = top.head
    assert(hot.getLong(0) == 1L && hot.getLong(1) == 10L)
    assert(math.abs(hot.getDouble(2) - 10 * 100.0 / 15) < 1e-6)
    assert(math.abs(hot.getDouble(3) - 4.0) < 1e-6) // 10 / (15/6 avg)
  }

  test("fkCoverage: orphans, null FKs, and coverage ratio") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(9L), None)
      .map(Tuple1(_)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("pk")
    val r = Joins.fkCoverage(child, parent, "fk", "pk").collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(math.abs(r.getDouble(3) - 0.6) < 1e-9)
  }

  test("intervalJoin: brute-force parity, each pair exactly once, at several bin widths") {
    import spark.implicits._
    // boundary touches, bin straddles, zero-length points, containment,
    // duplicates, an inverted interval (dropped)
    val lefts = Seq((1L, 0L, 10L), (2L, 10L, 10L), (3L, 25L, 80L),
      (4L, 99L, 101L), (5L, 0L, 300L), (6L, 170L, 160L), (7L, 25L, 80L))
    val rights = Seq((101L, 5L, 9L), (102L, 10L, 24L), (103L, 80L, 99L),
      (104L, 101L, 150L), (105L, 300L, 300L), (106L, 400L, 500L))
    val expected = (for {
      (li, ls, le) <- lefts if ls <= le
      (ri, rs, re) <- rights
      if ls <= re && rs <= le
    } yield (li, ri)).sorted
    val ldf = lefts.toDF("lid", "ls", "le")
    val rdf = rights.toDF("rid", "rs", "re")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Joins.intervalJoin(ldf, rdf, "ls", "le", "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expected, s"binWidth=$w")
    }
  }
}
