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

  /** events with `ts` as a proper (UTC-instant) TimestampType,
    * adapting to however the file stores it:
    *  - TIMESTAMP(NANOS) + `spark.sql.legacy.parquet.nanosAsLong` →
    *    epoch-nanos LongType, converted with integer division (a double
    *    `/` would lose precision above 2^53 nanos ≈ 1970+104 days);
    *  - timestamp[us] with isAdjustedToUTC=false → TIMESTAMP_NTZ, cast
    *    to TimestampType (sessions pin timeZone=UTC, so the cast is the
    *    identity on the underlying micros);
    *  - already TimestampType → pass through. */
  def eventsTyped(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
    val raw = events(spark, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
