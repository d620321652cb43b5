package graft

import graft.pipeline.{Orchestrate, Pos, SqlSurface, Web}

/** The spark.sql surface returns exactly what the DataFrame API returns. */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect().map(_.toSeq).toSeq
  }

  test("SQL engagement ≡ DataFrame engagement") {
    assert(rows(SqlSurface.engagement(spark, dir)) == rows(Web.engagement(spark, dir)))
  }

  test("SQL sessions ≡ DataFrame sessions") {
    assert(rows(SqlSurface.sessions(spark, dir)) == rows(Web.sessions(spark, dir)))
  }

  test("SQL sales KPI ≡ DataFrame sales KPI") {
    assert(rows(SqlSurface.salesKpi(spark, dir)) == rows(Pos.salesKpi(spark, dir)))
  }

  test("SQL graft_mg_summary aggregate ≡ DataFrame mgSummary") {
    import spark.implicits._
    val toks = (Seq.fill(40)("hot") ++ (1 to 60).map(i => s"t$i")).toDF("token")
    toks.createOrReplaceTempView("mg_toks")
    val viaSql = spark.sql("SELECT graft_mg_summary(token, 5) AS c FROM mg_toks")
      .selectExpr("explode(c) AS t").as[String].collect().toSet
    val viaDf = toks.agg(graft.llm.FrequentItems.mgSummary($"token", 5).as("c"))
      .selectExpr("explode(c) AS t").as[String].collect().toSet
    assert(viaSql == viaDf && viaSql.contains("hot"))
  }

  test("typed Dataset surface round-trips the record types") {
    import spark.implicits._
    import graft.schema.Records._
    val ds = Seq(
      PosTransaction("T1", 1, 2, 3, 9.5f, Some(0.1f), 1721033100.0),
      PosTransaction("T2", 1, 2, 1, 2.5f, None, 1721033200.0)).toDS()
    assert(ds.filter(_.discount_applied.isEmpty).count() == 1)
    assert(ds.map(_.revenue).collect().sum == 12.0f)
  }

  test("typed Aggregator surface: revenue sum per store via groupByKey") {
    import spark.implicits._
    import graft.schema.Records._
    val ds = Seq(
      PosTransaction("T1", 1, 2, 3, 10.0f, None, 1.0),
      PosTransaction("T2", 1, 3, 1, 2.5f, None, 2.0),
      PosTransaction("T3", 2, 2, 1, 7.0f, None, 3.0)).toDS()
    val got = ds.groupByKey(_.store_id).agg(RevenueSum.toColumn.name("rev"))
      .collect().toMap
    assert(got == Map(1 -> 12.5, 2 -> 7.0))
  }
}

/** Typed Aggregator (top-level: must not capture the suite for serialization). */
object RevenueSum extends org.apache.spark.sql.expressions.Aggregator[
    graft.schema.Records.PosTransaction, Double, Double] {
  def zero = 0.0
  def reduce(acc: Double, t: graft.schema.Records.PosTransaction) = acc + t.revenue
  def merge(a: Double, b: Double) = a + b
  def finish(acc: Double) = acc
  def bufferEncoder = org.apache.spark.sql.Encoders.scalaDouble
  def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}

/** Event-time sessionization gap semantics. */
class SessionizeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("a gap of exactly 30min does NOT split; 30min+1us does") {
    val base = 1704067200000000L // 2024-01-01T00:00Z in micros
    val gap = 30L * 60 * 1000000
    val rows = Seq(
      (0L, 7L, base),
      (1L, 7L, base + gap), // exactly 30min later → same session
      (2L, 7L, base + 2 * gap + 1), // 30min + 1us after previous → new session
      (3L, 8L, base)) // other user → own session
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    rows.toDF("event_id", "user_id", "us")
      .select($"event_id", ($"us" * 1000).as("ts"), $"user_id",
        lit("click").as("event_type"), lit(1.0).as("value"), lit("p").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val got = pipeline.Web.sessionize(spark, dir)
      .select("user_id", "session_idx", "n_events").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }
}

/** Step-function-style orchestration as plain control flow (§3.1). */
class OrchestrateSpec extends SparkSpec {
  import java.nio.file.{Files, Paths}

  test("POS run: validate → choice → transform → merge → archive, with notify") {
    val root = Files.createTempDirectory("orch").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(s"$landing/pos_20240715_120000.csv"),
      "transaction_id,store_id,product_id,quantity,revenue,discount_applied,timestamp\n" +
        "T1,101,2001,2,50.5,0.1,1721033100.0\n")
    Files.writeString(Paths.get(s"$landing/pos_20240716_120000.csv"),
      "transaction_id,store_id,product_id,quantity,revenue,discount_applied,timestamp\n" +
        ",101,2001,2,50.5,0.1,1721033100.0\n") // null transaction_id → file quarantined
    var notes = List.empty[String]
    val report = Orchestrate.runPosBatch(spark, landing, s"$root/lake", n => notes ::= n)
    assert(report.processedFiles == 1 && report.quarantinedFiles == 1 && report.transformed)
    assert(spark.read.parquet(s"$root/lake/kpi").count() == 1)
    assert(Files.exists(Paths.get(s"$root/lake/archive/2024-07-15/pos_20240715_120000.csv")))
    assert(Files.exists(Paths.get(s"$root/lake/rejected/2024-07-16/pos_20240716_120000.csv")))
    // second run: empty landing → choice short-circuits with a notification
    val report2 = Orchestrate.runPosBatch(spark, landing, s"$root/lake", n => notes ::= n)
    assert(!report2.transformed && notes.contains("no input files"))
  }

  test("POS run: header-only file is valid-but-empty; bad filename rejected at discovery") {
    val root = Files.createTempDirectory("orch2").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    val header = "transaction_id,store_id,product_id,quantity,revenue,discount_applied,timestamp\n"
    Files.writeString(Paths.get(s"$landing/pos_20240715_120000.csv"),
      header + "T1,101,2001,2,50.5,0.1,1721033100.0\n")
    Files.writeString(Paths.get(s"$landing/pos_20240716_120000.csv"), header) // zero rows
    Files.writeString(Paths.get(s"$landing/notes.csv"), header) // un-archivable name
    val report = Orchestrate.runPosBatch(spark, landing, s"$root/lake")
    // header-only file: no rows → no violations → processed + archived
    assert(report.processedFiles == 2 && report.quarantinedFiles == 1 && report.transformed)
    assert(report.error.isEmpty)
    assert(Files.exists(Paths.get(s"$root/lake/archive/2024-07-16/pos_20240716_120000.csv")))
    assert(Files.exists(Paths.get(s"$root/lake/rejected/notes.csv")))
    // landing fully drained → replay is a no-op, the KPI cannot double-count
    assert(Option(new java.io.File(landing).listFiles()).getOrElse(Array.empty).isEmpty)
    assert(spark.read.parquet(s"$root/lake/kpi").count() == 1)
  }

  test("withRetry: retries then succeeds; exhausts then throws") {
    var n = 0
    val got = Orchestrate.withRetry(attempts = 3, baseDelayMs = 1) { n += 1; if (n < 3) sys.error("boom"); 42 }
    assert(got == 42 && n == 3)
    intercept[RuntimeException] {
      Orchestrate.withRetry(attempts = 2, baseDelayMs = 1) { sys.error("always") }
    }
  }
}
