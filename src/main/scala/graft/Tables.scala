package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (TESTDATA.md).
  *
  * Parquet is self-describing so no schema inference happens in the hot
  * path; the one normalization applied is the events.ts nanosecond column
  * (parquet TIMESTAMP(NANOS) → Long nanos → TimestampType micros, which is
  * exactly DuckDB's `CAST(ts AS TIMESTAMP)` truncation).
  */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Engine.tune(spark)
    spark.read.parquet(path(sfDir, name))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  /** events with ts converted from Long nanos to TimestampType (micros). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    read(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** events filtered to [startDate, endDateInclusive] BEFORE the ns→µs
    * conversion: the predicate lands on the raw bigint column, so it pushes
    * into the parquet scan (a filter over the converted timestamp cannot).
    * On lake-written tables the same role is played by partition pruning
    * over the year/month/day/hour layout.
    */
  def eventsInRange(spark: SparkSession, sfDir: String,
                    startDate: String, endDateInclusive: String): DataFrame = {
    def nanos(d: String): Long =
      java.time.LocalDate.parse(d).toEpochDay * 86400L * 1000000000L
    read(spark, sfDir, "events")
      .filter(col("ts") >= nanos(startDate) &&
        col("ts") < nanos(java.time.LocalDate.parse(endDateInclusive).plusDays(1).toString))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
