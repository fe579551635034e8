package graft
import org.apache.spark.sql.SparkSession
object ProbeQ25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q25_near_dup_pairs")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"Q25 rep $rep: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
