package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time one registered query N times in a warmed session. */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop")
        .mode("overwrite").save()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
