package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the four record types + the derived KPI table
  * (SURVEY.md §1.2). Readers always pass these explicitly — schema
  * inference never runs in the hot path (§1.3).
  */
object Schemas {

  /** weblogs (ref transformation.py:140-148, api.py:35). */
  val weblogs: StructType = StructType(Seq(
    StructField("session_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = true),
    StructField("page", StringType, nullable = true),
    StructField("device_type", StringType, nullable = true),
    StructField("browser", StringType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("timestamp", DoubleType, nullable = false)))

  /** crm_data (ref lambda_function.py:58-67; Athena DDL README.md:227-239). */
  val crm: StructType = StructType(Seq(
    StructField("customer_id", IntegerType, nullable = false),
    StructField("interaction_type", StringType, nullable = false),
    StructField("timestamp", DoubleType, nullable = false),
    StructField("channel", StringType, nullable = true),
    StructField("rating", IntegerType, nullable = true),
    StructField("message_excerpt", StringType, nullable = true)))

  /** inventory (ref inventory_validate.py:33-41). */
  val inventory: StructType = StructType(Seq(
    StructField("inventory_id", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("warehouse_id", IntegerType, nullable = false),
    StructField("stock_level", IntegerType, nullable = false),
    StructField("restock_threshold", IntegerType, nullable = true),
    StructField("last_updated", DoubleType, nullable = false)))

  /** pos (ref transfom_pos.py:30-38). */
  val pos: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("store_id", IntegerType, nullable = false),
    StructField("product_id", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("revenue", FloatType, nullable = false),
    StructField("discount_applied", FloatType, nullable = true),
    StructField("timestamp", DoubleType, nullable = false)))

  /** sales_per_product KPI (ref transfom_pos.py:126-129). */
  val salesKpi: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("total_sales", DoubleType, nullable = false)))
}

/** Typed record views (Dataset[T] API surface, SURVEY.md §1.3). */
object Records {
  case class WebEvent(
      session_id: String, user_id: Option[String], page: Option[String],
      device_type: Option[String], browser: Option[String],
      event_type: Option[String], timestamp: Double)

  case class CrmInteraction(
      customer_id: Int, interaction_type: String, timestamp: Double,
      channel: Option[String], rating: Option[Int], message_excerpt: Option[String])

  case class InventoryRecord(
      inventory_id: Int, product_id: Int, warehouse_id: Int,
      stock_level: Int, restock_threshold: Option[Int], last_updated: Double)

  case class PosTransaction(
      transaction_id: String, store_id: Int, product_id: Int,
      quantity: Int, revenue: Float, discount_applied: Option[Float], timestamp: Double)
}
