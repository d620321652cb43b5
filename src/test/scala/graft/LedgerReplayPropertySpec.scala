package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.store.{Lake, Versioned}
import graft.stream.MicroBatch

/** ONE exactly-once contract, asserted over every file-ledgered stream
  * family — the shared property the per-family StreamingSpec cases each
  * pinned separately: for ANY kill point, a stream that crashes in the
  * worst window (artifacts appended, snapshot not yet flipped, source
  * checkpoint lost entirely) and then replays converges to EXACTLY the
  * state of a run that never crashed — artifacts, counters, AND the
  * compacted ledger itself. A tenth family joins the table below
  * instead of re-deriving the semantics.
  *
  * Crash simulation is the real window, not a stub: the versioned state
  * pointer is rolled back one flip (the partitions the batch appended
  * stay behind as unledgered orphans) and the checkpoint is wiped (the
  * file source redelivers the WHOLE landing history — a superset of the
  * one-batch redelivery a real crash produces, so passing here covers
  * both). The first kill point fires while the snapshot has a single
  * version — checkpoint loss alone, no pointer to roll back — and the
  * never-flipped-pointer window has its own FileLedgerSpec case. The
  * kpi family has no
  * versioned snapshot — its ledger is marker files that flip AFTER the
  * data commit — so its kill is checkpoint loss alone (rolling its
  * ledger back would simulate the documented one-batch-wide
  * non-transactional gap, not the contract).
  */
class LedgerReplayPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Family(
      name: String,
      land: (String, Int) => Unit,
      stream: (SparkSession, String) => StreamingQuery,
      rollbackDirs: String => Seq[String],
      artifact: String => Seq[String],
      ledgerKey: String = "key",
      fileLedgered: Boolean = true) // sessions dedup by content watermark, not files

  private val nFiles = 4
  private val killPoints = Set(1, 3)

  // -- shared drivers --------------------------------------------------------

  /** Crash between append and flip: revert the pointer one version —
    * the appended partitions stay as orphans the ledger never saw.
    */
  private def rollback(stateRoot: String): Unit =
    Versioned.currentVersion(stateRoot).filter(_ >= 2).foreach { n =>
      Files.writeString(Paths.get(stateRoot, "CURRENT"), (n - 1).toString)
    }

  /** The harsher window: a crash BEFORE the very first state flip — the
    * artifact partitions exist but the pointer never did. `rollback`
    * can't reach it (no earlier version); deleting the single-version
    * state dir simulates it exactly. The replay's orphan drop then
    * empties the artifact table entirely — the dir exists with zero
    * data partitions — which is the window that used to wedge
    * `visibleLedgered` on schema inference (ADVICE r12, high).
    */
  private def hardRollback(stateRoot: String): Unit =
    Versioned.currentVersion(stateRoot) match {
      case Some(n) if n >= 2 =>
        Files.writeString(Paths.get(stateRoot, "CURRENT"), (n - 1).toString)
      case _ => Lake.deleteRecursive(Paths.get(stateRoot))
    }

  private def drive(fam: Family, root: String, crashAfter: Set[Int],
                    hard: Boolean = false): Unit = {
    Files.createDirectories(Paths.get(s"$root/in"))
    var q = fam.stream(spark, root)
    for (i <- 1 to nFiles) {
      fam.land(s"$root/in", i)
      q.processAllAvailable()
      if (crashAfter(i)) {
        q.stop(); q.awaitTermination()
        fam.rollbackDirs(root).foreach(if (hard) hardRollback else rollback)
        Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
        q = fam.stream(spark, root)
      }
    }
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
  }

  /** The mg snapshot names its key column `token`, the rest `key`. */
  private def ledgerRows(stateRoot: String, keyCol: String = "key"): Seq[String] =
    if (!Versioned.exists(stateRoot)) Seq.empty
    else Versioned.read(spark, stateRoot)
      .filter(col("kind").isin("file", "hwm"))
      .select(col("kind"), col(keyCol)).as[(String, String)]
      .collect().sorted.map(t => s"ledger:${t._1}=${FileLedgerSpecHelp.base(t._2)}").toSeq

  // -- families --------------------------------------------------------------

  private def jl(rows: Seq[String], in: String, i: Int): Unit =
    Files.writeString(Paths.get(s"$in/b$i.jsonl"), rows.mkString("\n"))

  private val triSchema = StructType(Seq(
    StructField("o", LongType), StructField("p", LongType)))

  private def triangle = Family(
    "triangle",
    land = (in, i) => jl(Seq(i, i + 1, i + 2).map(p => s"""{"o":${100 + i},"p":$p}"""), in, i),
    stream = (sp, root) => MicroBatch.triangleIngestStream(sp, s"$root/in", triSchema,
      s"$root/edges", s"$root/state", s"$root/ckpt"),
    rollbackDirs = root => Seq(s"$root/state"),
    artifact = root => {
      val cnt = Versioned.read(spark, s"$root/state")
        .filter($"kind" === "cnt").select($"n").as[Long].head()
      val edges = MicroBatch.readLedgeredTable(spark, s"$root/edges", s"$root/state",
        StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
        .as[(Long, Long)].collect().sorted.map(_.toString).toSeq
      (s"cnt=$cnt" +: edges) ++ ledgerRows(s"$root/state")
    })

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("payload_b64", StringType)))
  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)

  private def video = Family(
    "video",
    land = (in, i) => {
      val codec = new graft.llm.Multimodal.VideoCodec.Codec
      def clip(id: Long) = s"""{"media_id":$id,"payload_b64":"${b64(
        codec.encodeGrayAvi(8, 8, 24, 1, 4,
          (f, x, y) => ((id + (f / 2) * 200L + y * 8 + x) % 256).toInt))}"}"""
      val rows = Seq(clip(10L * i)) ++
        (if (i == 2) Seq(s"""{"media_id":99,"payload_b64":"${b64("junk".getBytes)}"}""")
         else Seq.empty)
      jl(rows, in, i)
    },
    stream = (sp, root) => MicroBatch.videoIngestStream(sp, s"$root/in", mediaSchema,
      s"$root/scenes", s"$root/state", s"$root/ckpt"),
    rollbackDirs = root => Seq(s"$root/state"),
    artifact = root => {
      val corrupt = Versioned.read(spark, s"$root/state")
        .filter($"kind" === "corrupt").select($"n").as[Long].head()
      val idx = MicroBatch.readSceneIndex(spark, s"$root/scenes", s"$root/state")
        .as[(Long, Int, Long)].collect().sorted.map(_.toString).toSeq
      (s"corrupt=$corrupt" +: idx) ++ ledgerRows(s"$root/state")
    })

  private def image = Family(
    "image",
    land = (in, i) => {
      val codec = new graft.llm.Multimodal.ImageCodec.Codec
      val md = java.security.MessageDigest.getInstance("SHA-256")
      def pix(seed: Long, shift: Int)(x: Int, y: Int): Int = {
        val d = md.digest(s"$seed:${y * 8 + x}:prop".getBytes("UTF-8"))
        ((d(0) & 0xFF) + shift) % 256
      }
      // files 1 and 3 carry variants of seed 1 (a cross-batch pair);
      // file 2 adds a corrupt payload; file 4 is unrelated
      def img(id: Long, seed: Long, shift: Int) =
        s"""{"media_id":$id,"payload_b64":"${b64(codec.encodeGrayPng(8, 8, pix(seed, shift)))}"}"""
      val rows = i match {
        case 1 => Seq(img(10, 1, 0), img(11, 1, 2))
        case 2 => Seq(img(20, 2, 0),
          s"""{"media_id":21,"payload_b64":"${b64("junk".getBytes)}"}""")
        case 3 => Seq(img(30, 1, 2))
        case _ => Seq(img(40, 4, 0))
      }
      jl(rows, in, i)
    },
    stream = (sp, root) => MicroBatch.imageIngestStream(sp, s"$root/in", mediaSchema,
      s"$root/hashes", s"$root/pairs", s"$root/state", s"$root/ckpt"),
    rollbackDirs = root => Seq(s"$root/state"),
    artifact = root => {
      val corrupt = Versioned.read(spark, s"$root/state")
        .filter($"kind" === "corrupt").select($"n").as[Long].head()
      val hashes = MicroBatch.readImageHashes(spark, s"$root/hashes", s"$root/state")
        .as[(Long, Long)].collect().sorted.map(_.toString).toSeq
      val pairs = MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state")
        .as[(Long, Long, Int)].collect().sorted.map(_.toString).toSeq
      (s"corrupt=$corrupt" +: (hashes ++ pairs)) ++ ledgerRows(s"$root/state")
    })

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def mg = Family(
    "mg",
    land = (in, i) => jl(Seq(
      s"""{"doc_id":$i,"text":"${("hot " * (4 * i)).trim} w${i}a w${i}b w${i}c"}"""), in, i),
    stream = (sp, root) => MicroBatch.mgIngestStream(sp, s"$root/in", docSchema,
      "text", k = 3, stateDir = s"$root/state", checkpointDir = s"$root/ckpt"),
    rollbackDirs = root => Seq(s"$root/state"),
    artifact = root =>
      Versioned.read(spark, s"$root/state").filter($"kind" === "cnt")
        .select($"token", $"cnt").as[(String, Long)]
        .collect().sorted.map(_.toString).toSeq ++ ledgerRows(s"$root/state", "token"),
    ledgerKey = "token")

  private val sessSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts_us", LongType)))

  /** Content-keyed rather than file-ledgered: the open table IS the
    * versioned state (per-user watermarks), and closed rows commit via
    * the deterministic batch-key overwrite — the same kill window
    * (closed partition appended, open pointer not yet flipped) maps to
    * the same rollback simulation.
    */
  private def sessions = Family(
    "sessions",
    land = (in, i) => {
      val M = 60L * 1000000
      // each file advances both users in event-time order; user 1's
      // t jumps by 40 min on file 3 (closes a session mid-stream)
      def row(e: Long, u: Long, tMin: Long) =
        s"""{"event_id":$e,"user_id":$u,"ts_us":${tMin * M}}"""
      val t0 = if (i >= 3) i * 100L else i * 10L
      jl(Seq(row(i * 10L, 1, t0), row(i * 10L + 1, 2, t0 + 5)), in, i)
    },
    stream = (sp, root) => MicroBatch.sessionIngestStream(sp, s"$root/in", sessSchema,
      gapUs = 30L * 60L * 1000000, openDir = s"$root/open",
      closedDir = s"$root/closed", checkpointDir = s"$root/ckpt"),
    rollbackDirs = root => Seq(s"$root/open"),
    artifact = root => {
      val closed =
        if (!new java.io.File(s"$root/closed").exists) Seq.empty
        else spark.read.parquet(s"$root/closed")
          .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
          .as[(Long, Long, Long, Long, Long)].collect().sorted.map(_.toString).toSeq
      val open = Versioned.read(spark, s"$root/open")
        .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.map(_.toString).toSeq
      ("closed:" +: closed) ++ ("open:" +: open)
    },
    fileLedgered = false)

  private val posSchema = StructType(Seq(
    StructField("product_id", LongType), StructField("date", StringType),
    StructField("total_sales", DoubleType)))

  private def kpi = Family(
    "kpi",
    land = (in, i) => jl(Seq(
      s"""{"product_id":${i % 2},"date":"2024-07-0$i","total_sales":${i * 10.0}}""",
      s"""{"product_id":${i % 2},"date":"2024-07-01","total_sales":1.5}"""), in, i),
    stream = (sp, root) => MicroBatch.kpiIngestStream(sp, s"$root/in", posSchema,
      Seq("product_id"), "total_sales", "date", s"$root/table", s"$root/ckpt"),
    rollbackDirs = _ => Seq.empty, // marker ledger: kill = checkpoint loss
    artifact = root => {
      val rows = spark.read.parquet(s"$root/table")
        .select($"product_id", $"date", $"total_sales")
        .as[(Long, String, Double)].collect().sorted.map(_.toString).toSeq
      val hwm = graft.store.Upsert.fileLedgerHwm(s"$root/table")
        .map(w => s"ledger:hwm=$w").toSeq
      rows ++ hwm
    })

  // -- the property ----------------------------------------------------------

  private def check(fam: Family): Unit = {
    val ref = Files.createTempDirectory(s"prop_${fam.name}_ref").toString
    val hurt = Files.createTempDirectory(s"prop_${fam.name}_crash").toString
    drive(fam, ref, crashAfter = Set.empty)
    drive(fam, hurt, crashAfter = killPoints)
    val (a, b) = (fam.artifact(ref), fam.artifact(hurt))
    assert(a == b, s"${fam.name}: crash run diverged\n ref=$a\n got=$b")
    assert(a.nonEmpty, s"${fam.name}: degenerate reference artifact")
    // the converged ledger is COMPACT: landing fully applied -> the
    // whole history sits behind one watermark, no per-file rows
    if (fam.fileLedgered) fam.rollbackDirs(ref).foreach { st =>
      val l = ledgerRows(st, fam.ledgerKey)
      assert(l == Seq(s"ledger:hwm=b$nFiles.jsonl"),
        s"${fam.name}: ledger not compacted after catch-up: $l")
    }
  }

  test("triangle ingest: kill+replay at any point converges to the no-crash run") {
    check(triangle)
  }
  test("video ingest: kill+replay at any point converges to the no-crash run") {
    check(video)
  }
  test("image ingest: kill+replay at any point converges to the no-crash run") {
    check(image)
  }
  test("mg ingest: kill+replay at any point converges to the no-crash run") {
    check(mg)
  }
  test("kpi ingest: kill+replay at any point converges to the no-crash run") {
    check(kpi)
  }
  test("sessions ingest: kill+replay at any point converges to the no-crash run") {
    check(sessions)
  }
}

/** Shared tiny helper (basename) without importing store internals. */
private object FileLedgerSpecHelp {
  def base(s: String): String = s.substring(s.lastIndexOf('/') + 1)
}
