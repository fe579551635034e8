package etlmudah

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (TESTDATA.md).
  *
  * Every reader is a plain parquet scan so Catalyst's column pruning and
  * predicate pushdown reach the file source — callers `.select`/`.filter`
  * and the scan narrows automatically. At cluster scale these would be
  * partitioned table locations; the API is identical.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "events")

  /** events with `ts` as a proper TimestampType. The file stores
    * TIMESTAMP(NANOS) which Spark lacks; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong` so `ts` arrives as epoch-nanos
    * LongType, converted here with integer division (a double `/` would
    * lose precision above 2^53 nanos ≈ 1970+104 days). */
  def eventsTyped(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
