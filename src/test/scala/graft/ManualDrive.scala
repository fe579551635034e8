package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.scale.Similarity

/** Dev-only drive harness: exercises library operators end-to-end on the
  * sf0.001 testdata. Run with `sbt "Test/runMain graft.ManualDrive"`.
  * Not a ScalaTest suite — a manual smoke surface for quick verification.
  */
object ManualDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    println("== semanticDedup: drop list on sf0.001 embeddings")
    val emb = Tables.embeddings(spark, dir)
    val drops = Similarity.semanticDedup(emb, "vec_id", "embedding",
      simThreshold = 0.35, nlist = 8)
    drops.show(10)
    println(s"drop rows = ${drops.count()}")

    println("== q100 registered query (same path as Verify)")
    val q = SparkEntry.queries("q100_semantic_dedup")(spark, dir)
    println(s"q100 rows = ${q.count()}")
    q.show(5)

    println("== plan (no cartesian; bounded broadcast only)")
    q.explain("formatted")

    spark.stop()
  }
}
