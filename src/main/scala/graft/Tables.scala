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
}
