package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.Schemas

/** Reader semantics from SURVEY §2.1: JSONL vs top-level-array JSON (S4)
  * and corrupt-record routing (S3) — malformed records are quarantined,
  * never silently dropped.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S4: JSONL and top-level-array files parse to the same records") {
    val root = Files.createTempDirectory("src").toString
    val rec1 = """{"inventory_id": 1, "product_id": 101, "warehouse_id": 201, "stock_level": 100, "restock_threshold": 20, "last_updated": 1697059200.0}"""
    val rec2 = """{"inventory_id": 2, "product_id": 102, "warehouse_id": 201, "stock_level": 0, "restock_threshold": null, "last_updated": 1697062800.0}"""
    Files.writeString(Paths.get(s"$root/a.jsonl"), s"$rec1\n$rec2\n")
    Files.createDirectories(Paths.get(s"$root/arr"))
    Files.writeString(Paths.get(s"$root/arr/a.json"), s"[$rec1,\n $rec2]")
    val jsonl = spark.read.schema(Schemas.inventory).json(s"$root/a.jsonl")
    val array = spark.read.schema(Schemas.inventory).option("multiLine", true).json(s"$root/arr")
    assert(jsonl.collect().toSet == array.collect().toSet)
    assert(jsonl.count() == 2)
  }

  test("S3: malformed records land in the corrupt-record column, valid ones parse") {
    val root = Files.createTempDirectory("src").toString
    Files.writeString(Paths.get(s"$root/mixed.jsonl"),
      """{"customer_id": 7, "interaction_type": "Loyalty", "timestamp": 1721033100.5, "channel": "web", "rating": 4, "message_excerpt": null}
        |this is not json at all
        |{"customer_id": "not-an-int", "interaction_type": "x", "timestamp": 1.0, "channel": null, "rating": null, "message_excerpt": null}
        |""".stripMargin)
    val withCorrupt = StructType(Schemas.crm.fields :+ StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$root/mixed.jsonl")
      .cache() // corrupt-record column requires the full row; cache keeps the scan consistent
    val ok = df.filter($"_corrupt_record".isNull)
    val bad = df.filter($"_corrupt_record".isNotNull)
    assert(ok.count() == 1 && ok.select("customer_id").as[Int].head() == 7)
    assert(bad.count() == 2) // junk line + type-mismatched record, both preserved
    df.unpersist()
  }
}
