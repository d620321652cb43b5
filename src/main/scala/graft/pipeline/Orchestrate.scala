package graft.pipeline

import scala.util.control.NonFatal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.{Lake, Upsert}
import graft.validate.Validators

// (Inventory/Pos provide the per-pipeline transforms; this module owns the
// control flow between them.)

/** The reference's Step-Function orchestration (SURVEY.md §3.1: validate →
  * Choice on processed_files > 0 → transform → merge → notify/archive, with
  * Retry/Catch) collapsed into ordinary control flow around Spark actions.
  * SNS notifications become the `notify` callback; state-machine Retry
  * becomes `withRetry` (the reference's 3-5 attempts with backoff,
  * api.py:19, producer.py:25).
  */
object Orchestrate {

  final case class RunReport(
      processedFiles: Long,
      quarantinedFiles: Long,
      transformed: Boolean,
      error: Option[String])

  /** Retry with exponential backoff, capped (ref producer.py:25: cap 30 s;
    * test-friendly baseDelayMs).
    */
  def withRetry[T](attempts: Int = 3, baseDelayMs: Long = 100, capMs: Long = 30000)(f: => T): T = {
    var delay = baseDelayMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case NonFatal(e) =>
          last = e
          i += 1
          if (i < attempts) { Thread.sleep(delay); delay = math.min(delay * 2, capMs) }
      }
    }
    throw last
  }

  /** POS batch run (§3.1): file-level validate (whole file quarantined on
    * any violation), Choice on surviving files, transform + KPI additive
    * merge, archive, notify on failure — single-writer, replayable.
    */
  def runPosBatch(
      spark: SparkSession,
      landingDir: String,
      lakeRoot: String,
      notify: String => Unit = _ => ()): RunReport = {
    try {
      val files = Option(new java.io.File(landingDir).listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".csv")).map(_.getPath).toSeq
      if (files.isEmpty) {
        notify("no input files")
        return RunReport(0, 0, transformed = false, None)
      }
      // validate per file: required columns present + no nulls in not-null cols
      val required = Seq("transaction_id", "store_id", "product_id", "quantity", "revenue", "timestamp")
      val (valid, quarantined) = files.partition { f =>
        val df = Pos.readCsv(spark, f)
        Validators.missingColumns(df, required).isEmpty && {
          val row = df.select(
            required.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*).head()
          (0 until row.length).forall(i => row.getLong(i) == 0L)
        }
      }
      quarantined.foreach { f =>
        Lake.archiveByFilenameDate(Seq(f), Lake.zone(lakeRoot, Lake.Zones.Rejected))
      }
      // Choice state: zero processed files → notify and stop (ASL :63-73)
      if (valid.isEmpty) {
        notify("all files quarantined")
        return RunReport(0, quarantined.size, transformed = false, None)
      }
      val raw = Pos.readCsv(spark, valid)
      val (curated, kpi) = Pos.transform(raw)
      withRetry() {
        Lake.writeDatePartitioned(curated, "date", s"$lakeRoot/curated", org.apache.spark.sql.SaveMode.Append)
      }
      val kpiPath = s"$lakeRoot/kpi"
      val merged =
        if (new java.io.File(kpiPath).exists())
          Upsert.additive(spark.read.parquet(kpiPath), kpi, Seq("product_id", "date"), "total_sales")
        else kpi
      withRetry() { Lake.atomicOverwrite(spark, merged, kpiPath) }
      valid.foreach { f =>
        Lake.archiveByFilenameDate(Seq(f), Lake.zone(lakeRoot, Lake.Zones.Archive))
      }
      RunReport(valid.size, quarantined.size, transformed = true, None)
    } catch {
      case NonFatal(e) => // Catch state → SNS fail (ASL :183-191)
        notify(s"transformation_error: ${e.getMessage}")
        RunReport(0, 0, transformed = false, Some(e.getMessage))
    }
  }

  /** Inventory batch run (SURVEY.md §2 P8/J2/J4; ref inventory ASL):
    * whole-file business-rule gate → latest-per-key dedup → replace-on-match
    * upsert into the state table → archive. `nowEpoch` is injected so the
    * not-too-future rule is replayable.
    */
  def runInventoryBatch(
      spark: SparkSession,
      landingDir: String,
      lakeRoot: String,
      nowEpoch: Double,
      notify: String => Unit = _ => ()): RunReport = {
    try {
      val files = Option(new java.io.File(landingDir).listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".jsonl")).map(_.getPath).toSeq
      if (files.isEmpty) { notify("no input files"); return RunReport(0, 0, transformed = false, None) }
      val (valid, quarantined) = files.partition { f =>
        val df = spark.read.schema(graft.schema.Schemas.inventory).json(f)
        Validators.missingColumns(df, Seq("inventory_id", "product_id", "warehouse_id", "stock_level", "last_updated")).isEmpty &&
          Inventory.fileIsValid(df, nowEpoch)
      }
      quarantined.foreach { f =>
        val target = java.nio.file.Paths.get(
          Lake.zone(lakeRoot, Lake.Zones.Rejected), java.nio.file.Paths.get(f).getFileName.toString)
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.move(java.nio.file.Paths.get(f), target)
      }
      if (valid.isEmpty) { notify("all files quarantined"); return RunReport(0, quarantined.size, transformed = false, None) }
      val raw = spark.read.schema(graft.schema.Schemas.inventory).json(valid: _*)
      val deduped = Inventory.latestPerKey(raw, "inventory_id", Seq("last_updated"))
      val statePath = s"$lakeRoot/inventory_state"
      val merged =
        if (new java.io.File(statePath).exists())
          Upsert.replaceOnMatch(spark.read.parquet(statePath), deduped, Seq("inventory_id"))
        else deduped
      withRetry() { Lake.atomicOverwrite(spark, merged, statePath) }
      valid.foreach { f =>
        val target = java.nio.file.Paths.get(
          Lake.zone(lakeRoot, Lake.Zones.Archive), java.nio.file.Paths.get(f).getFileName.toString)
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.move(java.nio.file.Paths.get(f), target)
      }
      RunReport(valid.size, quarantined.size, transformed = true, None)
    } catch {
      case NonFatal(e) =>
        notify(s"transformation_error: ${e.getMessage}")
        RunReport(0, 0, transformed = false, Some(e.getMessage))
    }
  }
}
