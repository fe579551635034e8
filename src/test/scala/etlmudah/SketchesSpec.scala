package etlmudah.scale

import graft.SparkSpec
import etlmudah.Tables
import etlmudah.expr.CountMinSketchAgg
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private def bruteGrid(keys: Seq[String], depth: Int,
                        width: Int): Array[Long] = {
    val g = new Array[Long](depth * width)
    keys.foreach { k =>
      val hex = CountMinSketchAgg.md5Hex(k)
      (0 until depth).foreach(d =>
        g(d * width + CountMinSketchAgg.lane(hex, d, width)) += 1L)
    }
    g
  }

  test("cmsSketch: grid equals the serial brute-force fold; merge order cannot matter") {
    import spark.implicits._
    val keys = (0 until 500).map(i => s"k${i % 37}")
    val (depth, width) = (4, 16)
    // 7 partitions forces real partial grids + merges
    val got = cmsSketch(keys.toDF("k").repartition(7), "k", depth, width)
      .collect()(0).getSeq[Long](0)
    val one = cmsSketch(keys.toDF("k").coalesce(1), "k", depth, width)
      .collect()(0).getSeq[Long](0)
    val want = bruteGrid(keys, depth, width).toSeq
    assert(got == want, "distributed grid must equal the serial fold")
    assert(one == got, "merge across partitions must equal one partition")
    assert(got.sum == 500L * depth, "each row buckets every key once")
  }

  private def cmsSketch(df: org.apache.spark.sql.DataFrame, k: String,
                        d: Int, w: Int) = Sketches.cmsSketch(df, k, d, w)

  test("cms: SQL probe bucket stays in lockstep with the aggregate's JVM lane") {
    import spark.implicits._
    val keys = Seq("", "a", "1-BUILD#SM CASE", "日本語", "O'Reilly \\ x",
      "5-LOW", "k36")
    val width = 53 // prime, not a lane divisor
    val rows = keys.toDF("k")
      .select(col("k") +: (0 until 4).map(d =>
        Sketches.cmsBucket(col("k"), d, width).as(s"b$d")): _*)
      .collect()
    rows.foreach { r =>
      val hex = CountMinSketchAgg.md5Hex(r.getString(0))
      (0 until 4).foreach { d =>
        assert(r.getLong(d + 1) == CountMinSketchAgg.lane(hex, d, width),
          s"key='${r.getString(0)}' lane $d")
      }
    }
  }

  test("cmsHeavyHitters: estimates never under-count; exact at collision-free width") {
    val docs = Tables.documents(spark, sf0001)
    // narrow width -> collisions are certain; the guarantee must hold
    val tight = Sketches.cmsHeavyHitters(docs, "source",
      depth = 2, width = 2, topN = 10).collect()
    assert(tight.nonEmpty)
    tight.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-counted ${r.getString(0)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // generous width: few distinct sources, 4 independent rows of 4096
    // buckets -> a cross-key collision in EVERY row is (~n/4096)^4,
    // impossible for n(distinct) < 20; estimates are exact
    val wide = Sketches.cmsHeavyHitters(docs, "source",
      depth = 4, width = 4096, topN = 10).collect()
    wide.foreach { r =>
      assert(r.getLong(2) == r.getLong(1),
        s"collision-free grid must be exact for ${r.getString(0)}")
    }
  }

  test("cms: null keys are skipped, not bucketed") {
    import spark.implicits._
    val got = Sketches.cmsSketch(
        Seq(Some("x"), None, Some("x"), None).toDF("k"), "k", 2, 8)
      .collect()(0).getSeq[Long](0)
    assert(got.sum == 2L * 2, "only the two non-null rows may count")
  }

  test("cms: plan carries PARTIAL aggregation — one grid per partition over the exchange") {
    val plan = Sketches.cmsSketch(
        Tables.documents(spark, sf0001), "source", 4, 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_cms"),
      "the sketch must fold map-side; keys must never cross the exchange\n" +
        plan.take(600))
    assert(plan.contains("Exchange SinglePartition"), plan.take(600))
  }

  test("cms: grid survives the serializer round trip (agg buffer contract)") {
    val agg = CountMinSketchAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      depth = 3, width = 11)
    val buf = agg.createAggregationBuffer()
    buf(0) = 5L; buf(17) = 42L; buf(32) = Long.MaxValue / 2
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq == buf.toSeq)
  }

  test("hll registers: JVM md5 replay, duplicate-blindness, partition invariance") {
    import spark.implicits._
    val b = 6
    val keys = (0 until 400).map(i => s"u${i % 123}") // heavy duplication
    val got = Sketches.hllRegisterTable(
        keys.toDF("k").repartition(7), "k", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = Sketches.hllRegisterTable(keys.toDF("k").coalesce(1), "k", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == one, "registers must not depend on partitioning")
    // serial replay from the md5 lane
    val want = keys.distinct.map { k =>
      val lane = java.lang.Long.parseLong(
        CountMinSketchAgg.md5Hex(k).substring(0, 8), 16)
      val suf = lane & ((1L << (32 - b)) - 1)
      val bitlen =
        if (suf == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(suf)
      (lane >>> (32 - b), ((32 - b) - bitlen + 1).toLong)
    }.groupBy(_._1).map { case (bk, rs) => bk -> rs.map(_._2).max }
    assert(got == want)
    // duplicates cannot move a register: 400 rows, 123 distinct keys
    val distinctOnly = Sketches.hllRegisterTable(
        keys.distinct.toDF("k"), "k", b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == distinctOnly, "registers are a function of the key SET")
  }

  test("hllUnionReport: merged row IS the whole-frame sketch; union < per-group sum under overlap") {
    val orders = Tables.orders(spark, sf0001)
    val rep = Sketches.hllUnionReport(orders, "o_custkey",
        "o_orderpriority", b = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // the merged tier equals the direct whole-frame report EXACTLY —
    // union-by-max is an identity, not an approximation
    val whole = Sketches.hllReport(orders, "o_custkey", b = 6).collect()(0)
    assert(rep("__all__") == ((whole.getLong(0), whole.getLong(1),
      whole.getLong(2), whole.getLong(3), whole.getDouble(4))))
    // customers order at several priorities: the union estimate must
    // sit well below the sum of the per-group estimates
    val perSum = rep.filterNot(_._1 == "__all__").values.map(_._5).sum
    assert(rep("__all__")._5 < 0.6 * perSum,
      s"union ${rep("__all__")._5} vs per-group sum $perSum")
  }

  test("hllReport: exact integer fields, estimate within HLL error on testdata") {
    val orders = Tables.orders(spark, sf0001)
    val r = Sketches.hllReport(orders, "o_custkey", b = 6).collect()(0)
    val (m, nZero, maxreg, s, est) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(m == 64)
    val nTrue = orders.select(countDistinct(col("o_custkey")))
      .collect()(0).getLong(0)
    // S consistency: every register contributes a power of two <= 2^27
    assert(s > 0 && s <= m * (1L << 27))
    assert(maxreg >= 1 && maxreg <= 27)
    assert(nZero >= 0 && nZero < m)
    // standard error for m=64 is ~1.04/8 = 13%; allow 4 sigma
    assert(math.abs(est - nTrue) < 0.52 * nTrue,
      s"est=$est true=$nTrue")
  }

  test("cmsJoinSizeEstimate: exact at collision-free width, total-mass product at width 1") {
    import spark.implicits._
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val wide = Sketches.cmsJoinSizeEstimate(a, "k", b, "k",
      depth = 4, width = 1024).collect().head
    assert(wide.getAs[Long]("true_join_size") == 4L)   // 2*1 + 1*2
    assert(wide.getAs[Long]("est_join_size") == 4L)
    assert(wide.getAs[Double]("overestimate_ratio") == 1.0)
    // width 1: every key collides -> the estimate degrades to
    // |A|*|B|, the documented worst case — still never an undercount
    val narrow = Sketches.cmsJoinSizeEstimate(a, "k", b, "k",
      depth = 2, width = 1).collect().head
    assert(narrow.getAs[Long]("est_join_size") == 12L)
    assert(narrow.getAs[Long]("est_join_size") >=
      narrow.getAs[Long]("true_join_size"))
    // disjoint key sets: zero true join, null ratio
    val dis = Sketches.cmsJoinSizeEstimate(a, "k",
      Seq("zzz").toDF("k"), "k", depth = 4, width = 1024).collect().head
    assert(dis.getAs[Long]("true_join_size") == 0L)
    assert(dis.isNullAt(dis.fieldIndex("overestimate_ratio")))
  }

  test("latticeQuantiles: rank convention, width-bounded error, partition invariance") {
    import spark.implicits._
    // 100 values 0..99, width 10 -> buckets 0..9 with 10 each.
    // q500: thresh = ceil(100*0.5) = 50 -> first cum >= 50 is bucket 4
    // (cum 50); q250 -> thresh 25 -> bucket 2 (cum 30); q990 ->
    // thresh 99 -> bucket 9
    val rows = (0 until 100).map(i => ("g", i.toDouble))
    Seq(1, 7).foreach { parts =>
      val r = Sketches.latticeQuantiles(
          rows.toDF("k", "v").repartition(parts), "k", col("v"),
          width = 10.0, qsPerMille = Seq(250, 500, 990))
        .collect()(0)
      assert(r.getAs[Long]("n") == 100L)
      assert(r.getAs[Long]("q250_bucket") == 2L, s"parts=$parts")
      assert(r.getAs[Long]("q500_bucket") == 4L)
      assert(r.getAs[Long]("q990_bucket") == 9L)
      assert(r.getAs[Double]("q500_est") == 40.0)
    }
    // width-bounded error vs the exact quantile: |est - exact| <= width
    val exact = rows.map(_._2).sorted.apply(49)          // 49.0
    val est = Sketches.latticeQuantiles(rows.toDF("k", "v"), "k",
        col("v"), 10.0, Seq(500)).collect()(0)
      .getAs[Double]("q500_est")
    assert(math.abs(est - exact) <= 10.0)
    // single-value group: every quantile is its bucket
    val one = Sketches.latticeQuantiles(
        Seq(("s", 42.0)).toDF("k", "v"), "k", col("v"), 10.0,
        Seq(1, 1000)).collect()(0)
    assert(one.getAs[Long]("q1_bucket") == 4L &&
      one.getAs[Long]("q1000_bucket") == 4L)
  }
}
