package graft

import java.nio.file.{Files, Paths}
import graft.pipeline.{Crm, Orchestrate}

class InventoryOrchestrateSpec extends SparkSpec {
  import spark.implicits._

  test("inventory run: file gate, latest-wins dedup, replace upsert across two batches") {
    val root = Files.createTempDirectory("inv_orch").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    val now = 1697059200.0
    Files.writeString(Paths.get(s"$landing/inv_1.jsonl"),
      """{"inventory_id": 1, "product_id": 101, "warehouse_id": 201, "stock_level": 100, "restock_threshold": 20, "last_updated": 1697059200.0}
        |{"inventory_id": 1, "product_id": 101, "warehouse_id": 201, "stock_level": 90, "restock_threshold": 20, "last_updated": 1697062800.0}
        |{"inventory_id": 2, "product_id": 102, "warehouse_id": 201, "stock_level": 5, "restock_threshold": null, "last_updated": 1697059200.0}
        |""".stripMargin)
    Files.writeString(Paths.get(s"$landing/inv_bad.jsonl"),
      """{"inventory_id": 3, "product_id": 103, "warehouse_id": 201, "stock_level": -4, "restock_threshold": 1, "last_updated": 1697059200.0}
        |""".stripMargin) // negative stock → whole file rejected
    val r1 = Orchestrate.runInventoryBatch(spark, landing, s"$root/lake", now)
    assert(r1.processedFiles == 1 && r1.quarantinedFiles == 1 && r1.transformed)
    val state1 = graft.store.Versioned.read(spark, s"$root/lake/inventory_state")
      .select("inventory_id", "stock_level").as[(Int, Int)].collect().toMap
    assert(state1 == Map(1 -> 90, 2 -> 5)) // latest-per-key won
    assert(Files.exists(Paths.get(s"$root/lake/rejected/inv_bad.jsonl")))

    // second batch updates key 1, inserts key 4
    Files.writeString(Paths.get(s"$landing/inv_2.jsonl"),
      """{"inventory_id": 1, "product_id": 101, "warehouse_id": 201, "stock_level": 70, "restock_threshold": 20, "last_updated": 1697070000.0}
        |{"inventory_id": 4, "product_id": 104, "warehouse_id": 202, "stock_level": 7, "restock_threshold": 2, "last_updated": 1697070000.0}
        |""".stripMargin)
    val r2 = Orchestrate.runInventoryBatch(spark, landing, s"$root/lake", now)
    assert(r2.processedFiles == 1 && r2.transformed)
    val state2 = graft.store.Versioned.read(spark, s"$root/lake/inventory_state")
      .select("inventory_id", "stock_level").as[(Int, Int)].collect().toMap
    assert(state2 == Map(1 -> 70, 2 -> 5, 4 -> 7)) // replaced on match, inserted new
  }

  test("CRM alert evaluator fires at and above threshold only") {
    val base = java.time.Instant.parse("2024-07-15T10:00:00Z")
    def mk(n: Int) = (1 to n).map(i =>
      (java.sql.Timestamp.from(base.plusSeconds(i * 60L)), 1)).toDF("ts", "rating")
    assert(Crm.evaluateAlert(mk(10), "ts", "rating", base).isDefined)
    assert(Crm.evaluateAlert(mk(9), "ts", "rating", base).isEmpty)
    // negatives outside the window don't count
    val outside = (1 to 20).map(i =>
      (java.sql.Timestamp.from(base.plusSeconds(4000L + i)), 1)).toDF("ts", "rating")
    assert(Crm.evaluateAlert(outside, "ts", "rating", base).isEmpty)
  }
}
