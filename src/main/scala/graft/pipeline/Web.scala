package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Cleansing
import graft.validate.{Rule, Validators}

/** WEB analytics pipeline (SURVEY.md §3.3; ref script.sql, transformation.py).
  *
  * The three Athena queries (engagement / session metrics / loyalty join)
  * are re-expressed as declarative DataFrame plans over the synthetic
  * `events` table (FIXTURES.md: events plays weblogs; user_id ≈ session
  * key, props ≈ page, value ≈ rating surrogate). The ingest cleansing path
  * (anon-id impute, sec-vs-ms heuristic, required-field checks) runs over
  * the reference's weblog schema — see `ingest` — and is unit-tested against
  * FIXTURES.md record shapes.
  *
  * Scale notes: every query is a single hash-aggregate after a pruned scan;
  * the loyalty join joins two pre-aggregated inputs (both ≤ |users|), which
  * Catalyst broadcast-joins automatically.
  */
object Web {

  /** Reference ingest path (transformation.py:55-129): validate session_id
    * (P3), impute anon user_id (E8), epoch heuristic (E1), project to the
    * declared schema (P1). Returns (clean, rejected-with-reason).
    */
  def ingest(raw: DataFrame, deterministicIds: Boolean = true): (DataFrame, DataFrame) = {
    val rules = Seq(
      Rule("missing_session_id", Validators.requiredNonBlank(col("session_id"))),
      Rule("missing_timestamp", col("timestamp").isNotNull))
    val (valid, rejected) = Validators.split(raw, rules)
    val anon = if (deterministicIds) Cleansing.anonId(col("session_id")) else Cleansing.anonIdRandom()
    val clean = valid
      .withColumn("user_id",
        when(Validators.requiredNonBlank(col("user_id")), col("user_id")).otherwise(anon))
      .withColumn("event_time", Cleansing.epochAutoToTs(col("timestamp")))
      .select("session_id", "user_id", "page", "device_type", "browser", "event_type", "event_time")
    (clean, rejected)
  }

  // ---- registered queries over the synthetic tables -----------------------

  private val RangeStart = "2024-01-05"
  private val RangeEnd = "2024-01-20"
  private val LoyaltySplit = "2024-01-15"

  /** script.sql:1-17 — engagement metrics per session (A1-A5, E12, P11, O1).
    * The date-range predicate (P11) is applied as a raw-epoch range before
    * the ns→µs conversion so it pushes into the parquet scan.
    */
  def engagement(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsInRange(spark, dir, RangeStart, RangeEnd)
      .groupBy(col("user_id"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("total_events"),
        countDistinct(col("props")).as("unique_pages"),
        min(col("event_type")).as("entry_event"),
        max(col("event_type")).as("exit_event"))
      .withColumn("session_duration_sec",
        (col("session_end_us") - col("session_start_us")) / lit(1000000.0))
      .orderBy(col("user_id"))

  /** script.sql:19-48 — daily session metrics with engagement score (A6/E9). */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("session_date", to_date(col("ts")))
      .groupBy(col("user_id"), col("session_date"))
      .agg(
        count(lit(1)).as("total_events"),
        sum(Cleansing.engagementScoreSynthetic(col("event_type"))).as("engagement_score"),
        countDistinct(col("props")).as("unique_pages"))
      .orderBy(col("user_id"), col("session_date"))

  /** script.sql:51-103 — the cross-pipeline LEFT JOIN (J1/E11/E13/E10/A7-A9):
    * session aggregate joined to a loyalty aggregate on a string→int cast
    * key, COALESCE defaults for join misses.
    */
  def loyalty(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val s = ev
      .groupBy(col("user_id").cast("string").as("session_user"))
      .agg(
        count(lit(1)).as("total_events"),
        unix_micros(min(col("ts"))).as("first_seen_us"))
    val rating = Cleansing.cleanRating(Cleansing.syntheticRating(col("value")))
    val l = ev
      .filter(to_date(col("ts")) < lit(LoyaltySplit))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_interactions"),
        sum(when(col("event_type") === "signup", 1).otherwise(0)).as("loyalty_interactions"),
        avg(rating).as("avg_rating"))
      .withColumn("loyalty_rate",
        Cleansing.guardedPct(col("loyalty_interactions"), col("total_interactions")))
    s.join(l, s("session_user").cast("int") === l("user_id"), "left")
      .select(
        s("session_user").cast("int").as("user_id"),
        s("total_events"),
        s("first_seen_us"),
        coalesce(l("loyalty_interactions"), lit(0)).as("loyalty_interactions"),
        coalesce(l("loyalty_rate"), lit(0.0)).as("loyalty_rate"),
        coalesce(l("avg_rating"), lit(0.0)).as("avg_rating"))
      .orderBy(col("user_id"))
  }

  /** E1 — the sec-vs-ms epoch heuristic over a mixed epoch column. */
  def tsHeuristic(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val mixedEpoch = when(col("event_id") % 2 === 0, unix_micros(col("ts")) / lit(1000.0))
      .otherwise(floor(unix_micros(col("ts")) / lit(1000000.0)))
    ev.select(
        col("event_id"),
        Cleansing.epochAutoSeconds(mixedEpoch).as("epoch_sec"))
      .orderBy(col("event_id"))
  }

  /** E8/P3 — deterministic anon-id imputation (verify-mode variant). */
  def anonImpute(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        when(col("user_id") % 5 === 0, Cleansing.anonId(col("event_id")))
          .otherwise(col("user_id").cast("string")).as("resolved_user"))
      .orderBy(col("event_id"))

  /** O1/O2 — global sort + limit (top events by value). */
  def topEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(10)

  /** True event-time sessionization (beyond the reference, which groups by
    * a pre-existing session key — SURVEY.md §2.8 note): a new session
    * starts after a 30-minute inactivity gap. One window shuffle per user.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, dir)
      .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(byTime)))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** S3/JSON surface: parse the nested JSON props payload with a declared
    * schema (from_json — the engine-side form of the reference's per-record
    * json.loads) and aggregate on the extracted field.
    */
  def propsExtract(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy((floor(col("k") / 10) * 10).cast("int").as("k_decade"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("k_decade"))
  }

  /** Funnel conversion: of users who signed up, how many purchased AFTER
    * their first signup (temporal conditional aggregation).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perUser = ev.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
      max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
    perUser
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("first_signup").isNotNull, 1).otherwise(0)).as("n_signed_up"),
        sum(when(col("first_signup").isNotNull && col("last_purchase") > col("first_signup"), 1)
          .otherwise(0)).as("n_converted"))
      .withColumn("conversion_pct",
        Cleansing.guardedPct(col("n_converted"), col("n_signed_up")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "web_funnel" -> (funnel _),
    "web_props_extract" -> (propsExtract _),
    "web_sessionize" -> (sessionize _),
    "web_engagement" -> (engagement _),
    "web_sessions" -> (sessions _),
    "web_loyalty" -> (loyalty _),
    "web_ts_heuristic" -> (tsHeuristic _),
    "web_anon_impute" -> (anonImpute _),
    "web_top_events" -> (topEvents _))

  val oracles: Map[String, String] = Map(
    "web_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
        |    MAX(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS last_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signed_up,
        |  CAST(SUM(CASE WHEN first_signup IS NOT NULL AND last_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CASE WHEN CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) > 0
        |       THEN 100.0 * CAST(SUM(CASE WHEN first_signup IS NOT NULL AND last_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT)
        |            / CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |       ELSE 0.0 END AS conversion_pct
        |FROM per_user""".stripMargin,
    "web_props_extract" ->
      """SELECT CAST(FLOOR(CAST(json_extract(props, '$.k') AS INTEGER) / 10) * 10 AS INTEGER) AS k_decade,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "web_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |y AS (
        |  SELECT user_id, tsx,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsx, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  epoch_us(MIN(tsx)) AS session_start_us, epoch_us(MAX(tsx)) AS session_end_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "web_engagement" ->
      s"""SELECT user_id,
         |  epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS session_start_us,
         |  epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS session_end_us,
         |  COUNT(*) AS total_events,
         |  COUNT(DISTINCT props) AS unique_pages,
         |  MIN(event_type) AS entry_event,
         |  MAX(event_type) AS exit_event,
         |  (epoch_us(MAX(CAST(ts AS TIMESTAMP))) - epoch_us(MIN(CAST(ts AS TIMESTAMP)))) / 1000000.0 AS session_duration_sec
         |FROM events
         |WHERE CAST(ts AS DATE) BETWEEN DATE '$RangeStart' AND DATE '$RangeEnd'
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "web_sessions" ->
      """SELECT user_id, CAST(ts AS DATE) AS session_date, COUNT(*) AS total_events,
        |  CAST(SUM(CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 1 WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4 ELSE 1 END) AS BIGINT) AS engagement_score,
        |  COUNT(DISTINCT props) AS unique_pages
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "web_loyalty" ->
      s"""WITH s AS (
         |  SELECT CAST(user_id AS VARCHAR) AS session_user, COUNT(*) AS total_events,
         |         epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS first_seen_us
         |  FROM events GROUP BY 1),
         |l AS (
         |  SELECT user_id, COUNT(*) AS total_interactions,
         |         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS loyalty_interactions,
         |         AVG(CASE WHEN (CAST(FLOOR(value) AS INTEGER) % 7) BETWEEN 1 AND 5 THEN (CAST(FLOOR(value) AS INTEGER) % 7) END) AS avg_rating
         |  FROM events WHERE CAST(ts AS DATE) < DATE '$LoyaltySplit' GROUP BY 1)
         |SELECT CAST(s.session_user AS INTEGER) AS user_id, s.total_events, s.first_seen_us,
         |       COALESCE(l.loyalty_interactions, 0) AS loyalty_interactions,
         |       COALESCE(CASE WHEN l.total_interactions > 0 THEN 100.0 * l.loyalty_interactions / l.total_interactions ELSE 0.0 END, 0.0) AS loyalty_rate,
         |       COALESCE(l.avg_rating, 0.0) AS avg_rating
         |FROM s LEFT JOIN l ON CAST(s.session_user AS INTEGER) = l.user_id
         |ORDER BY user_id""".stripMargin,
    "web_ts_heuristic" ->
      """SELECT event_id,
        |  CASE WHEN (CASE WHEN event_id % 2 = 0 THEN epoch_us(CAST(ts AS TIMESTAMP)) / 1000.0 ELSE FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0) END) > 100000000000.0
        |       THEN (CASE WHEN event_id % 2 = 0 THEN epoch_us(CAST(ts AS TIMESTAMP)) / 1000.0 ELSE FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0) END) / 1000
        |       ELSE (CASE WHEN event_id % 2 = 0 THEN epoch_us(CAST(ts AS TIMESTAMP)) / 1000.0 ELSE FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0) END) END AS epoch_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "web_anon_impute" ->
      """SELECT event_id,
        |  CASE WHEN user_id % 5 = 0 THEN 'anon' || substr(sha256(CAST(event_id AS VARCHAR)), 1, 8)
        |       ELSE CAST(user_id AS VARCHAR) END AS resolved_user
        |FROM events ORDER BY event_id""".stripMargin,
    "web_top_events" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY value DESC, event_id LIMIT 10""".stripMargin)
}
