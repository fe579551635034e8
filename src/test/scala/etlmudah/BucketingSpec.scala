package etlmudah.sinks

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without a runtime exchange") {
    Writers.writeBucketed(Tables.orders(spark, sf0001), "orders_b", 8,
      Seq("o_orderkey"))
    Writers.writeBucketed(
      Tables.lineitem(spark, sf0001).select("l_orderkey", "l_extendedprice"),
      "lineitem_b", 8, Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the only exchange allowed is the one for the final groupBy —
      // neither join side may reshuffle (bucketing pre-paid it)
      val joinSection = plan.split("SortMergeJoin").last
      assert(!joinSection.contains("Exchange"),
        s"join inputs should be exchange-free, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
