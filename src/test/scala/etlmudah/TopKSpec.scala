package etlmudah.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private def windowTopN(rows: Seq[(String, Double, String)], n: Int) = {
    import spark.implicits._
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("t").asc)
    rows.toDF("g", "s", "t")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select("g", "rank", "s", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getString(3))).toSet
  }

  private def aggTopN(rows: Seq[(String, Double, String)], n: Int,
                      parts: Int) = {
    import spark.implicits._
    Analytics.topNPerGroupAgg(
        rows.toDF("g", "s", "t").repartition(parts), Seq("g"),
        col("s"), col("t"), n)
      .select(col("g"), col("rank"), col("score"), col("tag"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getString(3))).toSet
  }

  test("topNPerGroupAgg equals the window definition, at any partitioning") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (s"g${i % 7}", (rng.nextInt(40) / 4.0), f"t$i%04d")
    }
    val want = windowTopN(rows, 5)
    assert(aggTopN(rows, 5, 1) == want)
    assert(aggTopN(rows, 5, 13) == want)
  }

  test("score ties break on the tag string — deterministic across partitionings") {
    // every score identical: the top-k is decided purely by tag order
    val rows = (0 until 100).map(i => ("g", 1.0, f"t${99 - i}%03d"))
    val want = windowTopN(rows, 3)
    assert(want.map(_._4) == Set("t000", "t001", "t002"))
    assert(aggTopN(rows, 3, 1) == want)
    assert(aggTopN(rows, 3, 11) == want)
  }

  test("k larger than the group returns the whole group, ranked") {
    val rows = Seq(("a", 2.0, "x"), ("a", 1.0, "y"), ("b", 5.0, "z"))
    val got = aggTopN(rows, 10, 2)
    assert(got == Set(("a", 1L, 2.0, "x"), ("a", 2L, 1.0, "y"),
      ("b", 1L, 5.0, "z")))
  }

  test("null score or null tag rows are skipped, not ranked") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(3.0), Some("a")),
      ("g", None, Some("b")),
      ("g", Some(9.0), None),
      ("g", Some(1.0), Some("c"))
    ).toDF("g", "s", "t")
      .select(col("g"), col("s").cast("double").as("s"), col("t"))
    val got = Analytics.topNPerGroupAgg(df, Seq("g"), col("s"), col("t"), 5)
      .select("rank", "tag").collect().map(r => (r.getLong(0),
        r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "c")))
  }

  test("duplicate (score, tag) rows occupy multiple ranks — multiset semantics") {
    val rows = Seq(("g", 2.0, "x"), ("g", 2.0, "x"), ("g", 1.0, "y"))
    val got = aggTopN(rows, 2, 3)
    assert(got == Set(("g", 1L, 2.0, "x"), ("g", 2L, 2.0, "x")))
  }

  test("plan partial-aggregates: no Window node, exchange after a partial graft_topk") {
    import spark.implicits._
    val df = (0 until 50).map(i => (s"g${i % 3}", i.toDouble, s"t$i"))
      .toDF("g", "s", "t").repartition(4)
    val plan = Analytics.topNPerGroupAgg(df, Seq("g"), col("s"), col("t"), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_graft_topk"), plan)
  }
}
