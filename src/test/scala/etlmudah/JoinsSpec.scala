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
}
