package etlmudah.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PagedSourceSpec extends SparkSpec {

  private def read(opts: Map[String, String]) = {
    val r = spark.read.format("etlmudah.sources.PagedSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("S1/S2: pagination covers every (region, offset) exactly once") {
    val df = read(Map("regions" -> "3", "perRegion" -> "450", "pageSize" -> "200"))
    assert(df.count() == 1350)
    assert(df.select("listing_id").distinct().count() == 1350)
    val perRegion = df.groupBy("region_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRegion == Map(0 -> 450L, 1 -> 450L, 2 -> 450L))
    // 450 = 2 full pages + 1 short page per region; values deterministic
    val row = df.filter(col("listing_id") === 1000001L).collect().head
    assert(row.getAs[String]("title") == "listing-1000001")
  }

  test("S2: one input partition per region") {
    val df = read(Map("regions" -> "4", "perRegion" -> "10"))
    assert(df.rdd.getNumPartitions == 4)
  }

  test("S4: simulated 429s are retried and the data still arrives complete") {
    PagedSource.retriedThrottles.set(0)
    val df = read(Map("regions" -> "2", "perRegion" -> "600",
      "pageSize" -> "100", "failEveryNPages" -> "2"))
    assert(df.count() == 1200)
    assert(PagedSource.retriedThrottles.get() >= 6)   // pages 0,2,4 x 2 regions
  }

  test("S3: rate limit enforces a minimum gap between fetches") {
    val t0 = System.nanoTime()
    val df = read(Map("regions" -> "1", "perRegion" -> "400",
      "pageSize" -> "100", "rateLimitMs" -> "50"))
    assert(df.count() == 400)   // 4 pages, >= 3 enforced gaps
    assert((System.nanoTime() - t0) / 1e6 >= 150)
  }
}
