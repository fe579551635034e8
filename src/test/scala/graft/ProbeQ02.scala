package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: timing + plan for the flagship star (q02) at sf0.1. */
object ProbeQ02 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    val q = SparkEntry.queries("q02_stats_by_nation")
    val times = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"q02 times: ${times.map(t => f"$t%.2f").mkString(", ")}")
    q(spark, dir).explain("formatted")
    spark.stop()
  }
}
