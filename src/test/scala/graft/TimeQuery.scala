package graft

import org.apache.spark.sql.SparkSession

/** Dev-only exclusive timing loop for specific registered queries:
  * `sbt "Test/runMain graft.TimeQuery sfDir reps q1 q2 ..."` — prints
  * per-rep wall seconds per query (the tail-hunting companion to
  * Bench, which runs everything).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
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
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      println(f"TIME $name rows=${times.head._2} " +
        times.map(t => f"${t._1}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
