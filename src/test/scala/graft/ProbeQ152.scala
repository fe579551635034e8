package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler for the portable MinHash tier. */
object ProbeQ152 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sh = etlmudah.scale.Dedup.shingleRows(docs, "text", "doc_id", 3)
      .localCheckpoint(true)
    println("sh rows " + sh.count())
    val k = 128; val bands = 32; val rowsPerBand = 4
    val nSeeds = 32
    val hashed = sh.select(col("id") +: (0 until nSeeds).map(j =>
      md5(concat(lit(s"$j:"), col("shingle")).cast("binary")).as(s"h$j")): _*)
    def lane(i: Int) =
      substring(col(s"h${i / 4}"), 1 + 8 * (i % 4), 8)
    val minAggs = (0 until k).map(i => min(lane(i)).as(s"m$i"))
    secs("md5-only")(hashed.write.format("noop").mode("overwrite").save())
    val sig = hashed.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
    secs("sig-agg")(sig.write.format("noop").mode("overwrite").save())
    val sigC = sig.localCheckpoint(true)
    val bandKeys = (0 until bands).map { b =>
      concat_ws(":", (0 until rowsPerBand).map(j => col(s"m${b * rowsPerBand + j}")): _*)
    }
    val buckets = sigC.select(col("id"), posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    val cand = buckets.select(col("band"), col("bkey"), col("id").as("id_a"))
      .join(buckets.select(col("band"), col("bkey"), col("id").as("id_b")), Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    secs("banding+cand")(cand.write.format("noop").mode("overwrite").save())
    secs("full")(etlmudah.scale.Dedup.minhashPortablePairs(docs, "text", "doc_id",
      3, 128, 32, 0.8).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
