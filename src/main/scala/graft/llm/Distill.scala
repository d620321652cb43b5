package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distill the Gopher rule ensemble into a linear quality scorer by
  * distributed logistic-regression training — in FIXED-POINT integer
  * arithmetic end to end, so the entire training trajectory (not just
  * the final weights) replays bit-for-bit in the DuckDB oracle as an
  * unrolled CTE chain. This is the supervised-training counterpart of
  * the BPE trainer: a full-batch gradient-descent loop whose per-round
  * work is ONE distributed aggregation, with the model (4 scaled
  * BIGINTs) as the bounded driver artifact.
  *
  * The pieces that make it exactly replayable:
  *  - hard sigmoid σ(z) ≈ clamp((z+2)/4, 0, 1) — no exp, so the
  *    activation is integer clamp arithmetic;
  *  - features and labels in INTEGER form (3n ≤ len instead of
  *    awl ≥ 3.0, 10(n−dis) ≤ 6n instead of dup ≤ 0.6 — algebraically
  *    identical for integer len/n, no float seam);
  *  - integer-mean centering (SUM div N, exact both engines);
  *  - all divisions truncate toward zero in Scala, Spark `div`, and
  *    DuckDB `//` alike (verified — floor-vs-truncate on negative
  *    gradient sums is THE cross-engine hazard here).
  *
  * The distillation is honest about being lossy: a linear scorer can
  * only soft-OR the ensemble's thresholds (the registered run reaches
  * ~0.71 accuracy against a 0.60 majority class at sf0.01) — the point
  * is the exactly-gateable distributed training loop, the same reason
  * the k-means and BPE trainers are oracle-replayed. Scale: each round
  * aggregates 4 integer sums over the corpus (map-side combined); the
  * driver holds 4 longs; nothing else crosses the cluster.
  */
object Distill {

  private val S = 65536L         // fixed-point 1.0
  private val Iterations = 20
  // per-term learning-rate divisors (update = Σgrad div (D · N)),
  // tuned once on the sf0.01 corpus and frozen as part of the operator
  private val D0 = 4L
  private val D1 = 1024L
  private val D2 = 32L
  private val D3 = 256L

  /** Integer features + label: r1 = capped token count, r2 = capped
    * stopword hits, r3 = duplicate-token percentage; y = the Gopher
    * verdict in integer form.
    */
  private[llm] def rawFeatures(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(
        size(split(lower(trim(col(textCol))), "\\s+")).cast("long").as("nn"),
        size(array_distinct(split(lower(trim(col(textCol))), "\\s+"))).cast("long").as("dis"),
        regexp_count(lower(col(textCol)), lit(TextAnalysis.gopherStops)).cast("long").as("stops"),
        length(col(textCol)).cast("long").as("len"))
      .selectExpr(
        "least(nn, 128L) AS r1",
        "least(stops, 16L) AS r2",
        "(100 * (nn - dis)) div nn AS r3",
        """CAST(nn BETWEEN 25 AND 1000 AND 3*nn <= len AND len <= 10*nn
          |  AND stops >= 2 AND 10*(nn - dis) <= 6*nn AS BIGINT) AS y""".stripMargin)

  /** One row: the trained fixed-point weights and the training-set
    * confusion counts of the final scorer (predict pass ⟺ z > 0).
    *
    * ONE distributed job, not one per round. The integer features live
    * in a FINITE domain — r1 ∈ [0,128], r2 ∈ [0,16], r3 ∈ [0,99],
    * y ∈ {0,1}: ≤ 129·17·100·2 = 438,600 cells no matter how large the
    * corpus — so the (r1,r2,r3,y)-histogram is an exact sufficient
    * statistic for the whole trajectory: every per-round gradient sum is
    * the count-weighted sum over cells (integer addition is associative/
    * commutative, so cell-grouped sums are bit-identical to row sums),
    * and the confusion counts fall out of the same cells. The 20-round
    * loop then runs on the driver over a DOMAIN-bounded artifact —
    * bounded by the feature space, not the row count, so the single
    * map-side-combined aggregation is the only cluster work at any
    * scale. Math.*Exact mirrors the ANSI-mode aggregation's loud
    * overflow instead of silently wrapping where Spark would throw.
    */
  def distillQuality(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import java.lang.Math.{addExact => add, multiplyExact => mul, subtractExact => sub}
    val allCells = rawFeatures(docs, textCol)
      .groupBy("r1", "r2", "r3", "y").agg(count(lit(1)).as("cnt"))
      .collect()
    // A null text row collapses to the ONE possible null-carrying cell
    // (r1=128, r2=16, r3=NULL, y=NULL): least(NULL, k) skips nulls in
    // both engines, so r1/r2 stay non-null while r3/y (plain arithmetic/
    // AND over nulls) do not. The row-wise aggregation therefore counted
    // such rows in N and in the r1/r2 centering sums, and skipped them in
    // the r3 sum, every gradient (err is null), and every confusion cell
    // (null conditions fall to otherwise(0)) — replicated here exactly,
    // because the DuckDB oracle computes the same SQL semantics.
    val (nullCells, cells0) = allCells.partition(_.isNullAt(3))
    val cells = cells0
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // integer-mean centering from the same histogram (3 longs + N)
    val n = allCells.foldLeft(0L)((a, r) => add(a, r.getLong(4)))
    require(n > 0, "empty corpus")
    def colSum(i: Int, rows: Array[org.apache.spark.sql.Row]): Long =
      rows.foldLeft(0L)((a, r) => add(a, mul(r.getLong(i), r.getLong(4))))
    val c1 = colSum(0, allCells) / n
    val c2 = colSum(1, allCells) / n
    val c3 = colSum(2, cells0) / n
    val feat = cells.map { case (r1, r2, r3, y, cnt) => (r1 - c1, r2 - c2, r3 - c3, y, cnt) }
    var w = Array(0L, 0L, 0L, 0L)
    def zOf(c: (Long, Long, Long, Long, Long)): Long =
      add(add(add(w(0), mul(w(1), c._1)), mul(w(2), c._2)), mul(w(3), c._3))
    for (_ <- 1 to Iterations) {
      val g = Array(0L, 0L, 0L, 0L)
      feat.foreach { c =>
        // every term add/mul/subExact: the loud-overflow contract is
        // uniform, not argued per-expression from today's constants
        val p4 = math.max(0L, math.min(mul(4L, S), add(zOf(c), mul(2L, S))))
        val err = mul(sub(mul(mul(4L, S), c._4), p4), c._5) // Σ over the cell's cnt rows
        g(0) = add(g(0), err)
        g(1) = add(g(1), mul(err, c._1))
        g(2) = add(g(2), mul(err, c._2))
        g(3) = add(g(3), mul(err, c._3))
      }
      w = Array(
        add(w(0), g(0) / mul(D0, n)), add(w(1), g(1) / mul(D1, n)),
        add(w(2), g(2) / mul(D2, n)), add(w(3), g(3) / mul(D3, n)))
    }
    val conf = Array(0L, 0L, 0L, 0L) // tp, fp, fn, tn
    feat.foreach { c =>
      val i = (if (zOf(c) > 0) 0 else 2) + (if (c._4 == 1) 0 else 1)
      conf(i) = add(conf(i), c._5)
    }
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3), conf(0), conf(1), conf(2), conf(3)))
      .toDF("w0", "w1", "w2", "w3", "tp", "fp", "fn", "tn")
  }

  // ---- registered query ---------------------------------------------------

  def distillQuery(spark: SparkSession, dir: String): DataFrame =
    distillQuality(Tables.documents(spark, dir), "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_quality_distill" -> (distillQuery _))

  private val featSql =
    """raw AS MATERIALIZED (
      |  SELECT
      |    CAST(least(len(string_split_regex(lower(trim(text)), '\s+')), 128) AS BIGINT) AS r1,
      |    CAST(least(len(regexp_extract_all(lower(text), '\b(the|a|and|of|to)\b')), 16) AS BIGINT) AS r2,
      |    CAST((100 * (len(string_split_regex(lower(trim(text)), '\s+')) - len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))))
      |      // len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS r3,
      |    CAST(CASE WHEN len(string_split_regex(lower(trim(text)), '\s+')) BETWEEN 25 AND 1000
      |          AND 3 * len(string_split_regex(lower(trim(text)), '\s+')) <= length(text)
      |          AND length(text) <= 10 * len(string_split_regex(lower(trim(text)), '\s+'))
      |          AND len(regexp_extract_all(lower(text), '\b(the|a|and|of|to)\b')) >= 2
      |          AND 10 * (len(string_split_regex(lower(trim(text)), '\s+')) - len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))) <= 6 * len(string_split_regex(lower(trim(text)), '\s+'))
      |         THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM documents),
      |ctr AS (SELECT SUM(r1)//COUNT(*) AS c1, SUM(r2)//COUNT(*) AS c2, SUM(r3)//COUNT(*) AS c3, COUNT(*) AS nn FROM raw),
      |feat AS MATERIALIZED (SELECT r1 - c1 AS x1, r2 - c2 AS x2, r3 - c3 AS x3, y, nn FROM raw CROSS JOIN ctr)""".stripMargin

  private def iterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT
       |    CAST(MIN(w0) + SUM((${4 * S}*y - p4)) // ($D0 * MIN(nn)) AS BIGINT) AS w0,
       |    CAST(MIN(w1) + SUM((${4 * S}*y - p4) * x1) // ($D1 * MIN(nn)) AS BIGINT) AS w1,
       |    CAST(MIN(w2) + SUM((${4 * S}*y - p4) * x2) // ($D2 * MIN(nn)) AS BIGINT) AS w2,
       |    CAST(MIN(w3) + SUM((${4 * S}*y - p4) * x3) // ($D3 * MIN(nn)) AS BIGINT) AS w3
       |  FROM (SELECT f.*, w.w0, w.w1, w.w2, w.w3,
       |          GREATEST(0, LEAST(${4 * S}, (w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) + ${2 * S})) AS p4
       |        FROM feat f CROSS JOIN $prev w))""".stripMargin

  val oracles: Map[String, String] = Map(
    // the full unrolled training trajectory — every round's weights are
    // the same integers the engine's loop produces (BPE-oracle style)
    "llm_quality_distill" -> {
      val chain = (1 to Iterations)
        .map(i => iterSql(if (i == 1) "wi" else s"w${i - 1}", s"w$i"))
        .mkString(",\n")
      s"""WITH $featSql,
         |wi AS (SELECT CAST(0 AS BIGINT) w0, CAST(0 AS BIGINT) w1, CAST(0 AS BIGINT) w2, CAST(0 AS BIGINT) w3),
         |$chain
         |SELECT MIN(ww0) AS w0, MIN(ww1) AS w1, MIN(ww2) AS w2, MIN(ww3) AS w3,
         |  CAST(SUM(CASE WHEN z > 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN z > 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN z <= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN z <= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |FROM (SELECT f.y, (w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) AS z,
         |             w.w0 AS ww0, w.w1 AS ww1, w.w2 AS ww2, w.w3 AS ww3
         |      FROM feat f CROSS JOIN w$Iterations w)""".stripMargin
    })
}
