package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Cleansing
import graft.validate.{Rule, Validators}

/** CRM streaming pipeline (SURVEY.md §3.2; ref producer.py, lambda_function.py,
  * alerting_lambda.py).
  *
  * Record-level validate → clean → route (valid / DLQ), loyalty aggregate,
  * and the hourly negative-interaction alert — over the synthetic `events`
  * table (customer ≈ user_id, rating ≈ floor(value)%7, channel ≈ props).
  * The real-schema ingest used by streaming/unit tests is `cleanRecords`.
  */
object Crm {

  /** Ref validate+clean (lambda_function.py:70-117) on the CRM schema:
    * required non-null customer_id/interaction_type/timestamp (P4), positive
    * customer_id (P9), rating 1..5 else null (P10), channel trim-to-null
    * (E6), epoch→timestamp (E2). Returns (clean, dlq).
    */
  def cleanRecords(raw: DataFrame): (DataFrame, DataFrame) = {
    val rules = Seq(
      Rule("missing_customer_id", col("customer_id").isNotNull),
      Rule("missing_interaction_type", Validators.requiredNonBlank(col("interaction_type"))),
      Rule("missing_timestamp", col("timestamp").isNotNull),
      Rule("invalid_customer_id", col("customer_id") > 0))
    val (valid, dlq) = Validators.split(raw, rules)
    val clean = valid
      .withColumn("channel", Cleansing.trimToNull(col("channel")))
      .withColumn("message_excerpt", Cleansing.trimToNull(col("message_excerpt")))
      .withColumn("rating", Cleansing.cleanRating(col("rating")))
      .withColumn("event_ts", Cleansing.epochToTs(col("timestamp")))
    (clean, dlq)
  }

  // ---- registered queries over the synthetic tables -----------------------

  private def rating = Cleansing.cleanRating(Cleansing.syntheticRating(col("value")))
  private val ratingSql =
    "CASE WHEN (CAST(FLOOR(value) AS INTEGER) % 7) BETWEEN 1 AND 5 THEN (CAST(FLOOR(value) AS INTEGER) % 7) END"

  /** P4/P5/P9/P10/E6 — the record-level clean path (valid side). */
  def clean(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(
        col("event_id").isNotNull && col("user_id").isNotNull &&
          Validators.requiredNonBlank(col("event_type")) && col("user_id") > 0)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        Cleansing.trimToNull(col("props")).as("channel"),
        rating.as("rating"))
      .orderBy(col("event_id"))

  /** K6 — the DLQ side with first-failing-rule reasons. */
  def dlq(spark: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      Rule("missing_event_type", Validators.requiredNonBlank(col("event_type"))),
      Rule("invalid_user_id", col("user_id") > 0))
    val (_, rejected) = Validators.split(Tables.events(spark, dir), rules)
    rejected.select(col("event_id"), col("user_id"), col("reject_reason"))
      .orderBy(col("event_id"))
  }

  /** A7-A9/E10 — loyalty metrics per customer (script.sql:77-90 shape). */
  def loyaltyMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_interactions"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("loyalty_interactions"),
        avg(rating).as("avg_rating"))
      .withColumn("loyalty_rate",
        Cleansing.guardedPct(col("loyalty_interactions"), col("total_interactions")))
      .orderBy(col("user_id"))

  /** A12/T6 — hourly negative-interaction counts over the alert threshold
    * (ref alerting_lambda.py:24,51-57 with threshold scaled to the data).
    */
  private val AlertThreshold = 5

  def negativeAlert(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(rating.between(1, 2))
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("negative_count"))
      .filter(col("negative_count") >= AlertThreshold)
      .select(unix_micros(col("hour_ts")).as("hour_us"), col("negative_count"))
      .orderBy(col("hour_us"))

  /** P13 — the fixed one-hour window count the reference's alert SQL uses. */
  private val WindowStart = "2024-01-30 20:00:00"
  private val WindowEnd = "2024-01-30 21:00:00"

  def lastHourCount(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(
        col("ts") >= to_timestamp(lit(WindowStart)) &&
          col("ts") < to_timestamp(lit(WindowEnd)) && rating.between(1, 2))
      .agg(count(lit(1)).as("negative_count"))

  /** The hourly alerting lambda as a function (ref alerting_lambda.py:
    * 24,47-57,96-109): count negative interactions in [windowStart,
    * windowStart+1h) over a processed table; at/above threshold → alert
    * message for the notification sink (K7).
    */
  def evaluateAlert(
      processed: DataFrame, tsCol: String, ratingCol: String,
      windowStart: java.time.Instant, threshold: Int = 10): Option[String] = {
    val start = java.sql.Timestamp.from(windowStart)
    val end = java.sql.Timestamp.from(windowStart.plusSeconds(3600))
    val n = processed
      .filter(col(tsCol) >= lit(start) && col(tsCol) < lit(end) && col(ratingCol).between(1, 2))
      .count()
    if (n >= threshold)
      Some(s"ALERT: $n negative interactions in hour starting $windowStart (threshold $threshold)")
    else None
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "crm_clean" -> (clean _),
    "crm_dlq" -> (dlq _),
    "crm_loyalty_metrics" -> (loyaltyMetrics _),
    "crm_negative_alert" -> (negativeAlert _),
    "crm_last_hour_count" -> (lastHourCount _))

  val oracles: Map[String, String] = Map(
    "crm_clean" ->
      s"""SELECT event_id, user_id, event_type,
         |  CASE WHEN TRIM(props) = '' THEN NULL ELSE TRIM(props) END AS channel,
         |  $ratingSql AS rating
         |FROM events
         |WHERE event_id IS NOT NULL AND user_id IS NOT NULL
         |  AND event_type IS NOT NULL AND TRIM(event_type) <> '' AND user_id > 0
         |ORDER BY event_id""".stripMargin,
    "crm_dlq" ->
      """SELECT event_id, user_id,
        |  CASE WHEN NOT COALESCE(event_type IS NOT NULL AND TRIM(event_type) <> '', FALSE) THEN 'missing_event_type'
        |       WHEN NOT COALESCE(user_id > 0, FALSE) THEN 'invalid_user_id' END AS reject_reason
        |FROM events
        |WHERE NOT COALESCE((event_type IS NOT NULL AND TRIM(event_type) <> '') AND user_id > 0, FALSE)
        |ORDER BY event_id""".stripMargin,
    "crm_loyalty_metrics" ->
      s"""SELECT user_id, COUNT(*) AS total_interactions,
         |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS loyalty_interactions,
         |  AVG($ratingSql) AS avg_rating,
         |  CASE WHEN COUNT(*) > 0 THEN 100.0 * CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) ELSE 0.0 END AS loyalty_rate
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "crm_negative_alert" ->
      s"""SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us, COUNT(*) AS negative_count
         |FROM events
         |WHERE ($ratingSql) BETWEEN 1 AND 2
         |GROUP BY 1 HAVING COUNT(*) >= $AlertThreshold ORDER BY 1""".stripMargin,
    "crm_last_hour_count" ->
      s"""SELECT COUNT(*) AS negative_count FROM events
         |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$WindowStart'
         |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$WindowEnd'
         |  AND ($ratingSql) BETWEEN 1 AND 2""".stripMargin)
}
