package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Crm, Inventory, Pos, Web}
import graft.validate.Validators

/** FIXTURES.md record shapes driven through the reference-schema paths. */
class PipelineFixtureSpec extends SparkSpec {
  import spark.implicits._

  test("WEB ingest: heuristic ts, anon impute, session_id rejection (FIXTURES §4)") {
    val raw = Seq(
      // (session_id, user_id, page, device_type, browser, event_type, timestamp)
      ("s-001", "42", "/home", "mobile", "Chrome", "Click", 1721033100.0),
      ("s-002", null, "/cart", "desktop", "Firefox", "View", 1721033100123.0), // ms + anon
      (null, "7", "/x", "d", "b", "Click", 1721033100.0), // missing session → reject
      ("  ", "8", "/y", "d", "b", "Scroll", 1721033100.0) // blank session → reject
    ).toDF("session_id", "user_id", "page", "device_type", "browser", "event_type", "timestamp")
    val (clean, rejected) = Web.ingest(raw)
    val byId = clean.collect().map(r => r.getString(0) -> r).toMap
    assert(clean.count() == 2)
    assert(rejected.count() == 2)
    assert(rejected.select("reject_reason").as[String].collect().toSet == Set("missing_session_id"))
    // ms-epoch row lands on the same instant as the sec-epoch row
    val times = clean.select(unix_timestamp($"event_time")).as[Long].collect().toSet
    assert(times == Set(1721033100L))
    // anon id imputed for the null user
    assert(byId("s-002").getString(1).matches("anon[0-9a-f]{8}"))
    assert(byId("s-001").getString(1) == "42")
  }

  test("CRM clean: trim channel, null bad rating, DLQ non-positive ids (FIXTURES §5)") {
    val raw = Seq(
      (7, "Loyalty", 1721033100.5, " email ", 4, "  great support  "),
      (8, "Support", 1721033101.0, "  ", 0, null), // rating 0 → null; channel → null
      (0, "Loyalty", 1721033102.0, "web", 3, null), // id 0 → DLQ
      (-1, "Other", 1721033103.0, "web", 6, null) // id -1 → DLQ; rating 6 would null
    ).toDF("customer_id", "interaction_type", "timestamp", "channel", "rating", "message_excerpt")
    val (clean, dlq) = Crm.cleanRecords(raw)
    assert(clean.count() == 2)
    val r7 = clean.filter($"customer_id" === 7).head()
    assert(r7.getAs[String]("channel") == "email")
    assert(r7.getAs[String]("message_excerpt") == "great support")
    assert(r7.getAs[Int]("rating") == 4)
    val r8 = clean.filter($"customer_id" === 8).head()
    assert(r8.getAs[String]("channel") == null)
    assert(r8.isNullAt(r8.fieldIndex("rating"))) // rating nulled, record kept
    assert(dlq.select("reject_reason").as[String].collect().toSet == Set("invalid_customer_id"))
  }

  test("POS transform: dedup, KPI rounding, date derivation (FIXTURES §2)") {
    val raw = Seq(
      ("T1001", 101, 2001, 2, 50.5f, Some(0.1f), 1721033100.0),
      ("T1001", 101, 2001, 2, 50.5f, Some(0.1f), 1721033100.0), // exact dup → dropped
      ("T1002", 102, 2001, 3, 75.333f, None, 1721034000.0)
    ).toDF("transaction_id", "store_id", "product_id", "quantity", "revenue", "discount_applied", "timestamp")
    val (curated, kpi) = Pos.transform(raw)
    assert(curated.count() == 2)
    val k = kpi.head()
    assert(k.getAs[Int]("product_id") == 2001)
    assert(k.getAs[java.sql.Date]("date").toString == "2024-07-15")
    assert(math.abs(k.getAs[Double]("total_sales") - 125.83) < 1e-9)
  }

  test("Inventory: business rules + whole-file gate (FIXTURES §3)") {
    val now = 1697059200.0
    val good = Seq(
      (1, 101, 201, 100, Some(20), 1697059200.0),
      (2, 102, 201, 0, None, 1697062800.0)
    ).toDF("inventory_id", "product_id", "warehouse_id", "stock_level", "restock_threshold", "last_updated")
    val bad = Seq(
      (3, 103, 202, -5, Some(10), 1697059200.0), // negative stock
      (4, 104, 202, 10, Some(-1), 1697059200.0), // negative threshold
      (5, 105, 202, 10, None, now + 100 * 3600) // >24h future
    ).toDF("inventory_id", "product_id", "warehouse_id", "stock_level", "restock_threshold", "last_updated")
    assert(Inventory.fileIsValid(good, now))
    assert(!Inventory.fileIsValid(bad, now))
    val summary = Validators.fileSummary(bad, Inventory.inventoryRules(now)).head()
    assert((1 to 3).map(summary.getLong) == Seq(1, 1, 1))
  }

  test("Inventory: latest-per-key dedup keeps max last_updated (J2)") {
    val df = Seq(
      (1, 100, 1697059200.0), (1, 150, 1697062800.0), (2, 7, 1697000000.0)
    ).toDF("inventory_id", "stock_level", "last_updated")
    val got = Inventory.latestPerKey(df, "inventory_id", Seq("last_updated"))
      .select("inventory_id", "stock_level").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 150), (2, 7)))
  }

  test("POS CSV read uses the declared schema (no inference)") {
    val dir = java.nio.file.Files.createTempDirectory("posread").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pos_20240715_120000.csv"),
      "transaction_id,store_id,product_id,quantity,revenue,discount_applied,timestamp\n" +
        "T1001,101,2001,2,50.5,0.1,1721033100.0\nT1002,102,2002,3,75.0,,1721034000.0\n")
    val df = Pos.readCsv(spark, dir)
    // file sources relax nullability; names+types must match the declaration
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Pos.posSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(df.count() == 2)
    assert(df.filter($"discount_applied".isNull).count() == 1)
  }
}
