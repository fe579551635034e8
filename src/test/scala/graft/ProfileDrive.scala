package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.scale._
import etlmudah.text.TextStats

/** Dev-only phase profiler for the heavy scale operators.
  * `sbt "Test/runMain graft.ProfileDrive"` */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    time("warmup scan")(docs.count())

    val sh = Dedup.shingleRows(docs, "text", "doc_id", 3)
    time("shingleRows only")(sh.write.format("noop").mode("overwrite").save())

    val buckets = Dedup.minhashBandsRows(sh, 128, 32)
    time("minhash+bands")(buckets.write.format("noop").mode("overwrite").save())

    time("full nearDupPairs")(
      Dedup.nearDupPairs(docs, "text", "doc_id", minJaccard = 0.8)
        .write.format("noop").mode("overwrite").save())

    time("full again (warm)")(
      Dedup.nearDupPairs(docs, "text", "doc_id", minJaccard = 0.8)
        .write.format("noop").mode("overwrite").save())

    // media decoders: the walk must run against an attribute blob, not
    // an inlined synth tree (the q163 62s regression this pins)
    time("q163 audio roundtrip")(
      SparkEntry.queries("q163_audio_meta_roundtrip")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("q155 media roundtrip")(
      SparkEntry.queries("q155_media_meta_roundtrip")(spark, dir)
        .write.format("noop").mode("overwrite").save())

    // q167: checkpointed per-doc counts feed both rank branches.
    // MEASUREMENT NOTE: an in-JVM back-to-back A/B here once suggested
    // a no-checkpoint two-branch variant was ~30% faster, but the bench
    // harness (query re-constructed inside each rep, best-of-3 across
    // separate runs) showed it ~2x SLOWER — the corpus-scale explode
    // dominates and runs twice. Same-JVM ordering bias (JIT + page
    // cache) inverted the comparison; trust the bench shape.
    time("q167 rank-profile classify")(
      SparkEntry.queries("q167_rank_profile_classify")(spark, dir)
        .write.format("noop").mode("overwrite").save())

    println("=== q02 star join plan ===")
    SparkEntry.queries("q02_stats_by_nation")(spark, dir).explain("formatted")
    println("=== q32 pushdown plan ===")
    SparkEntry.queries("q32_filter_pipeline")(spark, dir).explain("formatted")

    spark.stop()
  }
}
