package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables
import graft.expr.Exact

/** Temporal join operators Spark has no built-in for: as-of
  * (point-in-time) join and interval/range join. Beyond the reference's
  * surface (SURVEY.md §2.6 notes it has neither) — these are the two
  * joins a training-data / feature-store pipeline hits first: "attach
  * the last known state at event time" and "collect events inside a
  * window".
  *
  * Both are built from Spark primitives the scale-correct way:
  *
  *  - `asOf` is ONE shuffle (hash by key) + a per-key sort-merge done by
  *    a window over the unioned sides — the classic union-tag-window
  *    formulation. No join node at all, so there is no candidate
  *    explosion: cost is sort(|L|+|R|) per key, the information-theoretic
  *    floor for an as-of merge. A range-partitioned sort at 100 TB is
  *    exactly what the exchange already does.
  *  - `rangeJoin` blocks time into fixed bins and equi-joins on
  *    (key, bin), then applies the exact predicate — the standard
  *    bin-blocked interval join. Explode factor is bounded by
  *    interval-length / binSeconds + 1 (pick binSeconds ≈ the typical
  *    interval length, here = it), so candidate volume stays linear where
  *    a theta-join would be |L|×|R| per key.
  */
object Joins {

  /** As-of join: for each left row, the latest right row with the same
    * key and right.ts <= left.ts (inclusive). Returns every left column
    * plus `outCol`, a struct of the matched right row (null when no
    * right row precedes).
    *
    * Ties: right rows sort before left rows at equal ts (at-or-before
    * includes the simultaneous reading); among right rows with equal
    * (key, ts) the one with the greatest `tieCol` wins — deterministic
    * on any partitioning.
    *
    * The matched row is carried as ONE struct through a single
    * `last(ignoreNulls)` window, so its fields can never mix rows (a
    * per-attribute last() would, whenever a right attribute is null).
    *
    * `tolerance` (an SQL interval body, e.g. "10 MINUTES") nulls the
    * match when the right row is older than left.ts − tolerance — the
    * feature-store staleness bound.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           tieCol: String, outCol: String = "asof",
           tolerance: Option[String] = None): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val lNorm = left.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"), lit(1).as("_side"),
      col(tieCol).as("_tie"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(rType).as("_r"))
    // a right row with null key or null ts cannot be ordered — it must
    // never surface as a "latest state" (NULLS FIRST would otherwise
    // slot it before every real row and let left rows match it); left
    // rows with null ts sort first and correctly match nothing
    val rNorm = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
        col(keyCol).as("_k"), col(tsCol).as("_t"), lit(0).as("_side"),
        col(tieCol).as("_tie"),
        lit(null).cast(lType).as("_l"),
        struct(right.columns.map(col): _*).as("_r"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lNorm.unionByName(rNorm)
      .withColumn(outCol, last(col("_r"), ignoreNulls = true).over(w))
    val bounded = tolerance.fold(matched) { t =>
      matched.withColumn(outCol,
        when(col(s"$outCol.$tsCol") >= col("_t") - expr(s"INTERVAL $t"), col(outCol)))
    }
    bounded
      .filter(col("_side") === 1)
      .select(col("_l.*"), col(outCol))
  }

  /** Interval/range join: pairs each interval row with every point row
    * sharing its key whose timestamp falls inside [startCol, endCol]
    * (boundary inclusion per the flags). Point columns come back
    * prefixed with `ptPrefix`. Intervals must satisfy start <= end: a
    * reversed interval THROWS under `strict` (default — corrupted
    * interval data should fail loudly, not vanish); `strict = false`
    * drops reversed intervals instead, documented for callers that
    * construct intervals defensively.
    *
    * Each point lands in exactly one bin, so a matched pair appears
    * exactly once — no post-join distinct needed.
    */
  def rangeJoin(intervals: DataFrame, points: DataFrame,
                ivKeyCol: String, startCol: String, endCol: String,
                ptKeyCol: String, ptTsCol: String,
                binSeconds: Long,
                includeStart: Boolean = true, includeEnd: Boolean = true,
                ptPrefix: String = "pt_", strict: Boolean = true): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binUs = binSeconds * 1000000L
    val pts = points.select(
      (points.columns.map(c => col(c).as(ptPrefix + c)) :+
        floor(unix_micros(col(ptTsCol)) / binUs).as("_pbin")): _*)
    // a Filter node is never pruned away, so the strict check always runs
    val wellFormed =
      if (strict)
        intervals.filter(
          when(col(endCol) < col(startCol),
            raise_error(concat(lit(s"rangeJoin: reversed interval ($startCol > $endCol): "),
              col(startCol).cast("string"), lit(" > "), col(endCol).cast("string")))
              .cast("boolean"))
            .otherwise(lit(true)))
      else intervals.filter(col(endCol) >= col(startCol))
    val ivs = wellFormed
      .withColumn("_bin",
        explode(sequence(floor(unix_micros(col(startCol)) / binUs),
          floor(unix_micros(col(endCol)) / binUs))))
    val pTs = col(ptPrefix + ptTsCol)
    val startPred = if (includeStart) pTs >= col(startCol) else pTs > col(startCol)
    val endPred = if (includeEnd) pTs <= col(endCol) else pTs < col(endCol)
    ivs.join(pts,
        col(ivKeyCol) === col(ptPrefix + ptKeyCol) &&
          col("_bin") === col("_pbin") && startPred && endPred)
      .drop("_bin", "_pbin")
  }

  // ---- registered queries -------------------------------------------------

  /** For each click, the user's most recent error at-or-before it
    * (feature-store point-in-time lookup; null-safe when no error
    * precedes). Timestamps exported as epoch micros.
    */
  def asofQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    asOf(clicks, errors, "user_id", "ts", "event_id")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        unix_micros(col("asof.ts")).as("last_error_us"),
        col("asof.value").as("last_error_value"))
      .orderBy(col("event_id"))
  }

  /** Error impact: count + exact sum of the same user's events in the
    * 10 minutes after each error (start-exclusive, end-inclusive).
    * Zero-impact errors stay in the result with (0, 0.0).
    */
  def errorImpactQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts").as("t0"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("t1"))
    val pts = ev.select(col("user_id"), col("ts"), col("value"))
    val matched = rangeJoin(errors, pts, "user_id", "t0", "t1", "user_id", "ts",
      binSeconds = 600, includeStart = false, includeEnd = true)
    val agg = matched.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_follow"), Exact.moneySum(col("pt_value")).as("sum_value"))
    errors.select(col("event_id"), col("user_id"))
      .join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_follow"), lit(0L)).as("n_follow"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_last_error" -> (asofQuery _),
    "events_error_impact" -> (errorImpactQuery _))

  val oracles: Map[String, String] = Map(
    // independent formulation: DuckDB's native ASOF JOIN (ties on equal
    // error ts cannot arise — (user_id, ts) is unique in the table, and
    // the Spark side is tie-deterministic regardless via event_id)
    "events_asof_last_error" ->
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value,
        |  epoch_us(e.ts) AS last_error_us, e.value AS last_error_value
        |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin,
    "events_error_impact" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'error'),
        |f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT e.event_id, e.user_id,
        |  COUNT(f.user_id) AS n_follow,
        |  COALESCE(CAST(ROUND(SUM(CAST(f.value AS DECIMAL(38,6))), 2) AS DOUBLE), 0.0) AS sum_value
        |FROM e LEFT JOIN f ON f.user_id = e.user_id
        |  AND f.ts > e.ts AND f.ts <= e.ts + INTERVAL 10 MINUTE
        |GROUP BY e.event_id, e.user_id
        |ORDER BY e.event_id""".stripMargin)
}
