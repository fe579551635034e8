package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: times the cluster-consuming dedup trio at sf0.1 with the
  * Bench session config — quick feedback for mining-tier changes. */
object ProbeDedupTrio {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    for (name <- Seq("q63_jaccard_pairs", "q108_prefix_jaccard",
        "q64_dedup_clusters", "q66_dedup_apply",
        "q82_dedup_survivor_quality")) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name min=${times.min}%.2f max=${times.max}%.2f")
    }
    spark.stop()
  }
}
