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

  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Normalize whatever physical type the scan produced for `ts` to
    * session-zone TimestampType micros. Long = legacy nanos epoch;
    * TIMESTAMP_NTZ casts by reinterpreting the wall clock in the session
    * zone (UTC), which preserves the stored instant. Any OTHER physical
    * type fails fast: the driver has changed this column's shape across
    * rounds, and a best-effort cast of an unanticipated shape (string,
    * int32 seconds, …) would be quietly wrong rather than loudly new.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unanticipated physical type $other; " +
          "extend Tables.normalizeTs/eventsInRange deliberately instead of best-effort casting")
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
    // Both bounds parse BEFORE splicing into any literal: a malformed
    // startDate fails here with a DateTimeParseException, not an opaque
    // analysis error from inside a TIMESTAMP literal.
    val start = java.time.LocalDate.parse(startDate)
    val endExclusive = java.time.LocalDate.parse(endDateInclusive).plusDays(1)
    val raw = read(spark, sfDir, "events")
    val filtered = raw.schema("ts").dataType match {
      case LongType =>
        def nanos(d: java.time.LocalDate): Long = d.toEpochDay * 86400L * 1000000000L
        raw.filter(col("ts") >= nanos(start) && col("ts") < nanos(endExclusive))
      case TimestampType =>
        raw.filter(col("ts") >= expr(s"TIMESTAMP '$start 00:00:00'") &&
          col("ts") < expr(s"TIMESTAMP '$endExclusive 00:00:00'"))
      case TimestampNTZType =>
        raw.filter(col("ts") >= expr(s"TIMESTAMP_NTZ '$start 00:00:00'") &&
          col("ts") < expr(s"TIMESTAMP_NTZ '$endExclusive 00:00:00'"))
      case other => throw new IllegalStateException(
        s"events.ts arrived as unanticipated physical type $other; " +
          "extend Tables.normalizeTs/eventsInRange deliberately instead of best-effort casting")
    }
    normalizeTs(filtered)
  }
}
