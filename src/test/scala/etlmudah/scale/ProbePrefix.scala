package etlmudah.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import etlmudah.Tables

/** Dev probe: OLD (pre length/positional filter) vs NEW prefix tier,
  * same JVM, interleaved reps — robust to ambient host drift. */
object ProbePrefix {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** The round-4 shape: prefix-lemma candidates only, distinct pairs,
    * verify join, then two size joins. */
  def oldPrefixJaccard(df: DataFrame, minJaccard: Double): DataFrame = {
    val sh = Dedup.shingleHashRows(df, "text", "doc_id", 3).localCheckpoint(true)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val wDf = Window.partitionBy(col("shingle"))
    val wN = Window.partitionBy(col("id"))
    val wRk = Window.partitionBy(col("id"))
      .orderBy(col("__df").asc, col("shingle").asc)
    val prefix = sh
      .withColumn("__df", count(lit(1)).over(wDf))
      .withColumn("__n", count(lit(1)).over(wN))
      .withColumn("__rk", row_number().over(wRk))
      .filter(col("__rk") <=
        col("__n") - ceil(lit(minJaccard) * col("__n") - lit(1e-9)) + 1)
      .select(col("id"), col("shingle"))
    val cand = prefix.select(col("id").as("id_a"), col("shingle"))
      .join(prefix.select(col("id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("jac",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

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
    val docs = Tables.documents(spark, dir)
    docs.count()

    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      time("OLD prefix tier")(
        println(oldPrefixJaccard(docs, 0.8).count()))
      time("NEW prefix tier")(
        println(Dedup.prefixJaccardPairs(docs, "text", "doc_id",
          minJaccard = 0.8).count()))
    }
    spark.stop()
  }
}
