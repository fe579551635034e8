package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.scale.Dedup

/** Throwaway profiling probe for the near-dup pipeline at sf0.1. */
object ProbeDedup {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("PROBE_MAXFIELDS"))
      spark.conf.set("spark.sql.codegen.maxFields", sys.env("PROBE_MAXFIELDS"))
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    // warm the scan
    docs.count()

    val sh = Dedup.shingleRows(docs, "text", "doc_id", 3)
    time("shingleRows count")(println(sh.count()))
    time("shingleRows count again")(println(sh.count()))
    val buckets = Dedup.minhashBandsRows(sh, 128, 32)
    time("buckets count")(println(buckets.count()))
    time("full nearDupPairs")(
      println(Dedup.nearDupPairs(docs, "text", "doc_id", minJaccard = 0.8).count()))
    time("full nearDupPairs again")(
      println(Dedup.nearDupPairs(docs, "text", "doc_id", minJaccard = 0.8).count()))
    time("simhashNearDups")(
      println(Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 6).count()))
    spark.stop()
  }
}
