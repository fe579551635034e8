package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timing probe for the q63/q64 dedup-cluster path at sf0.1.
  * Run with `sbt "Test/runMain graft.ProbeCC"`. */
object ProbeCC {
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
    for (q <- Seq("q25_near_dup_pairs", "q47_decontamination")) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q: min ${times.min}%.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
