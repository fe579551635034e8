package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.analytics._
import etlmudah.expr._

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
    val li = Tables.lineitem(spark, dir)

    println("== SparkEntry.entry smoke (driver contract)")
    val e = SparkEntry.entry(spark)
    println(s"entry rows = ${e.count()}")
    e.show(3)

    println("== standardize with absent keys (ANSI crash path)")
    li.select(Exprs.standardize(col("l_returnflag"), Map("N" -> "None")).as("flag"))
      .groupBy("flag").count().orderBy("flag").show()

    println("== clipUpper null preservation")
    li.select(when(col("l_quantity") > 25, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("q"))
      .select(Exprs.clipUpper(col("q"), 10.0).as("clipped"))
      .agg(sum(when(col("clipped").isNull, 1).otherwise(0)).as("nulls_preserved"),
           max("clipped").as("max_clip")).show()

    println("== statsBy multi-measure")
    Analytics.statsBy(li, col("l_returnflag"), "flag", col("l_extendedprice"),
      Seq(round(avg(col("l_quantity")), 2).as("avg_qty"))).show()

    println("== freqTable ordering")
    Analytics.freqTable(li, "l_linestatus").show()

    println("== docTokenProfile explode form (changed operator)")
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    val langs = Seq(
      "en" -> Seq("the", "a", "of", "and", "to"),
      "ms" -> Seq("yang", "dan", "di", "untuk", "dengan"),
      "de" -> Seq("der", "die", "und", "das", "ist"))
    val prof = etlmudah.text.TextStats.docTokenProfile(
      Tables.documents(spark, dir), "text", "doc_id", stops, langs,
      carryCols = Seq("source", "lang"))
    println(s"profile rows = ${prof.count()} (docs = ${Tables.documents(spark, dir).count()})")
    prof.orderBy("id").show(5)
    println("== q21/q22 registered queries over the new path")
    SparkEntry.queries("q21_doc_quality_by_source")(spark, dir).show(5)
    SparkEntry.queries("q22_langid_agreement")(spark, dir).show(10)

    println("== IVF top-k with driver-side sampled quantizer (changed operator)")
    val ivf = etlmudah.scale.Similarity.ivfTopKAll(
      Tables.embeddings(spark, dir), "vec_id", "embedding", k = 5)
    println(s"ivf rows = ${ivf.count()}")
    ivf.filter(col("qid") < 3).show(20)
    println("== q38 registered query over the new path")
    SparkEntry.queries("q38_ivf_topk")(spark, dir).show(10)

    spark.stop()
  }
}
