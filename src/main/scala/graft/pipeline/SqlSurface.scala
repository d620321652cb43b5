package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The reference's analyst entry point is SQL text submitted to an engine
  * (script.sql via Athena — SURVEY.md §3.3). The same surface here:
  * register the tables as temp views, run Spark SQL. Each statement is the
  * Spark-SQL dialect of the corresponding DataFrame query in Web/Crm/Pos —
  * parity between the two APIs is asserted in SqlSurfaceSpec.
  */
object SqlSurface {

  def registerViews(spark: SparkSession, dir: String): Unit = {
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
  }

  /** script.sql:1-17 equivalent (engagement metrics). */
  val engagementSql: String =
    """SELECT user_id,
      |  unix_micros(MIN(ts)) AS session_start_us,
      |  unix_micros(MAX(ts)) AS session_end_us,
      |  COUNT(*) AS total_events,
      |  COUNT(DISTINCT props) AS unique_pages,
      |  MIN(event_type) AS entry_event,
      |  MAX(event_type) AS exit_event,
      |  (unix_micros(MAX(ts)) - unix_micros(MIN(ts))) / 1e6 AS session_duration_sec
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-20'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** script.sql:19-48 equivalent (daily sessions with engagement score). */
  val sessionsSql: String =
    """SELECT user_id, CAST(ts AS DATE) AS session_date, COUNT(*) AS total_events,
      |  SUM(CASE event_type WHEN 'click' THEN 2 WHEN 'view' THEN 1
      |      WHEN 'signup' THEN 3 WHEN 'purchase' THEN 4 ELSE 1 END) AS engagement_score,
      |  COUNT(DISTINCT props) AS unique_pages
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** transfom_pos.py:126-129 equivalent (sales KPI). */
  val salesKpiSql: String =
    """SELECT l_partkey AS product_id, CAST(l_shipdate AS DATE) AS sale_date,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_sales
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def engagement(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(engagementSql)
  }

  def sessions(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sessionsSql)
  }

  def salesKpi(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(salesKpiSql)
  }
}
