package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: flags queries whose physical plan contains a
  * cartesian product, nested-loop join, or a surprising exchange count.
  * Run with `sbt "Test/runMain graft.ProbePlans"`. */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val skip = Set("q33_ml_importances") // trains a model; no single plan
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          val cart = "CartesianProduct".r.findAllIn(plan).length
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
          val ex = "Exchange".r.findAllIn(plan).length
          val flag = if (cart > 0 || bnlj > 0) "  <<< REVIEW" else ""
          println(f"$name%-28s exchanges=$ex%2d cartesian=$cart bnlj=$bnlj$flag")
        } catch { case e: Throwable => println(s"$name ERROR $e") }
      }
    }
    spark.stop()
  }
}
