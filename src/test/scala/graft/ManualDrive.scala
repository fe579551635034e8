package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only drive harness: exercises library operators end-to-end on the
  * testdata. Run with `sbt "Test/runMain graft.ManualDrive"`.
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
    val dir = "/root/testdata/sf0.01"

    println("== q101 incremental dedup on sf0.01, dumped for DuckDB comparison")
    val q = SparkEntry.queries("q101_incremental_dedup")(spark, dir)
    q.show(25)
    q.coalesce(1).write.mode("overwrite").parquet("/tmp/q101_spark")

    spark.stop()
  }
}
