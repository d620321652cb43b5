package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (TESTDATA.md).
  *
  * Parquet is self-describing so no schema inference happens in the hot
  * path; the one normalization applied is the events.ts column, which the
  * driver has shipped under different physical types across rounds
  * (TIMESTAMP(NANOS) read as Long nanos; timestamp[us] read as
  * TIMESTAMP_NTZ). Both normalize to session-zone TimestampType micros,
  * which with the UTC session zone is exactly DuckDB's
  * `CAST(ts AS TIMESTAMP)` value.
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

  import org.apache.spark.sql.types.{LongType, TimestampType}

  /** Normalize whatever physical type the scan produced for `ts` to
    * session-zone TimestampType micros. Long = legacy nanos epoch;
    * TIMESTAMP_NTZ casts by reinterpreting the wall clock in the session
    * zone (UTC), which preserves the stored instant.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }

  /** events with ts normalized to TimestampType (micros). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(read(spark, sfDir, "events"))

  /** events filtered to [startDate, endDateInclusive] BEFORE the ts
    * normalization: the predicate lands on the raw scan column (bigint or
    * TIMESTAMP_NTZ), so it pushes into the parquet scan (a filter placed
    * above a cast cannot). On lake-written tables the same role is played
    * by partition pruning over the year/month/day/hour layout.
    */
  def eventsInRange(spark: SparkSession, sfDir: String,
                    startDate: String, endDateInclusive: String): DataFrame = {
    val endExclusive = java.time.LocalDate.parse(endDateInclusive).plusDays(1).toString
    val raw = read(spark, sfDir, "events")
    val filtered = raw.schema("ts").dataType match {
      case LongType =>
        def nanos(d: String): Long =
          java.time.LocalDate.parse(d).toEpochDay * 86400L * 1000000000L
        raw.filter(col("ts") >= nanos(startDate) && col("ts") < nanos(endExclusive))
      case TimestampType =>
        raw.filter(col("ts") >= expr(s"TIMESTAMP '$startDate 00:00:00'") &&
          col("ts") < expr(s"TIMESTAMP '$endExclusive 00:00:00'"))
      case _ =>
        raw.filter(col("ts") >= expr(s"TIMESTAMP_NTZ '$startDate 00:00:00'") &&
          col("ts") < expr(s"TIMESTAMP_NTZ '$endExclusive 00:00:00'"))
    }
    normalizeTs(filtered)
  }
}
