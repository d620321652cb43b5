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
  * never-flipped-pointer window has its own FileLedgerSpec case PLUS
  * the HARD variant below (`hard = true`): the single-version state dir
  * is deleted outright, so the replay's orphan drop empties the
  * artifact table entirely before any flip — the `visibleLedgered`
  * None-path window. Families without a versioned pointer take
  * checkpoint loss as their whole crash model (`rollbackDirs` empty):
  * kpi's ledger is marker files that flip AFTER the data commit, and
  * er/quality are plain appends deduped per-id against their own
  * at-rest tables — rolling anything back there would simulate the
  * documented non-transactional gap, not the contract.
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
      fileLedgered: Boolean = true, // sessions dedup by content watermark, not files
      setup: String => Unit = _ => ()) // once per run root, before the first stream start

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
    fam.setup(root)
    var q = fam.stream(spark, root)
    for (i <- 1 to nFiles) {
      fam.land(s"$root/in", i)
      q.processAllAvailable()
      if (crashAfter(i)) {
        q.stop(); q.awaitTermination()
        fam.rollbackDirs(root).foreach { st =>
          (if (hard) hardRollback _ else rollback _)(st)
          // a SIGKILL'd writer also leaves its _WRITER_LOCK (the finally
          // never ran) with a now-dead pid: the restarted writer must
          // break it immediately — not corrupt, not stall a lease
          graft.store.Fs.writeString(s"$st/_WRITER_LOCK",
            s"999999999@${System.currentTimeMillis()}")
        }
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

  private val erSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("seg", StringType)))

  /** Plain parquet appends deduped per-id against the at-rest tables —
    * no versioned pointer exists, so the WHOLE crash model is
    * checkpoint loss (`rollbackDirs` empty, like kpi): the real
    * append-committed-but-offsets-not window is a one-batch redelivery,
    * a subset of the full-history redelivery the wipe produces.
    */
  private def er = Family(
    "er",
    land = (in, i) => jl(Seq(
      // block key = name minus last 2 chars: "cust${i}X" shares master
      // "cust${i}0"'s block at edit distance 1 (match); "pros${i}Z" has
      // no master block (pending)
      s"""{"id":${100 + i},"name":"cust${i}X","seg":"a"}""",
      s"""{"id":${200 + i},"name":"pros${i}Z","seg":"a"}"""), in, i),
    stream = (sp, root) => MicroBatch.erIngestStream(sp, s"$root/in", erSchema,
      masterDir = s"$root/master", matchesDir = s"$root/matches",
      pendingDir = s"$root/pending", checkpointDir = s"$root/ckpt"),
    rollbackDirs = _ => Seq.empty,
    artifact = root => {
      val m = spark.read.parquet(s"$root/matches")
        .select($"new_id", $"master_custkey", $"edit_dist".cast("long"))
        .as[(Long, Long, Long)].collect().sorted.map(t => s"match:$t").toSeq
      val p = spark.read.parquet(s"$root/pending")
        .select($"id", $"name", $"seg")
        .as[(Long, String, String)].collect().sorted.map(t => s"pending:$t").toSeq
      m ++ p
    },
    fileLedgered = false,
    setup = root => Seq((1L, "cust10", "a"), (2L, "cust20", "a"),
        (3L, "cust30", "a"), (4L, "cust40", "a")).toDF("id", "name", "seg")
      .write.mode("overwrite").parquet(s"$root/master"))

  private val scd2Schema = StructType(Seq(
    StructField("cust_id", LongType), StructField("effective_day", LongType),
    StructField("status", StringType), StructField("priority", StringType)))

  /** Versioned history, NO file ledger: convergence rests on the per-key
    * monotonic guard (stale redelivered days never apply) plus the
    * change-point collapse (identical redelivery is all-no-ops). The
    * kill window is the documented one — history flipped, offsets lost
    * — simulated by the shared pointer rollback + checkpoint wipe.
    */
  private def scd2 = Family(
    "scd2",
    land = (in, i) => jl(Seq(
      // cust 1 changes every file; cust 2 changes on files 1 and 3 and
      // repeats the open attributes on files 2 and 4 (no-op events)
      s"""{"cust_id":1,"effective_day":$i,"status":"s$i","priority":"p"}""",
      s"""{"cust_id":2,"effective_day":$i,"status":"v${(i + 1) / 2}","priority":"p"}"""),
      in, i),
    stream = (sp, root) => MicroBatch.scd2IngestStream(sp, s"$root/in", scd2Schema,
      keyCol = "cust_id", compareCols = Seq("status", "priority"),
      tableDir = s"$root/hist", checkpointDir = s"$root/ckpt",
      maxFilesPerTrigger = 1),
    rollbackDirs = root => Seq(s"$root/hist"),
    artifact = root => Versioned.read(spark, s"$root/hist")
      .select($"cust_id", $"status", $"priority", $"valid_from", $"valid_to")
      .collect().map(_.toString).sorted.toSeq,
    fileLedgered = false)

  /** Corpus side deduped per-id (effectively-once), quarantine side an
    * at-least-once DLQ by CONTRACT — so the artifact takes the reject
    * SET, which must converge even where row counts may not.
    */
  private def quality = Family(
    "quality",
    land = (in, i) => {
      val words = (1 to 28).map(w => f"w${i}word$w%02d").mkString(" ")
      jl(Seq(
        // 30 words, awl ~7, two stopwords, zero dup: passes every rule
        s"""{"doc_id":${10 * i},"text":"the and $words"}""",
        s"""{"doc_id":${10 * i + 1},"text":"tiny"}"""), in, i)
    },
    stream = (sp, root) => MicroBatch.qualityGatedIngestStream(sp, s"$root/in",
      docSchema, textCol = "text", idCol = "doc_id",
      corpusDir = s"$root/corpus", rejectDir = s"$root/reject",
      checkpointDir = s"$root/ckpt"),
    rollbackDirs = _ => Seq.empty,
    artifact = root => {
      val c = spark.read.parquet(s"$root/corpus")
        .select($"doc_id", $"text")
        .as[(Long, String)].collect().sorted.map(t => s"corpus:$t").toSeq
      val r = spark.read.json(s"$root/reject")
        .select($"doc_id").distinct()
        .as[Long].collect().sorted.map(id => s"reject:$id").toSeq
      c ++ r
    },
    fileLedgered = false)

  // NOT foldable here: `stream_exact_uniques`/`stream_approx_uniques`
  // are STATELESS batch aggregations over the events table (the
  // `stream_` prefix is their gate name, kept for surface stability) —
  // no at-rest state table, ledger, or checkpoint exists, so there is
  // nothing to kill or replay; their correctness is fully carried by
  // the driver's per-round oracle rows.

  // -- the property ----------------------------------------------------------

  private def check(fam: Family, kills: Set[Int] = killPoints,
                    hard: Boolean = false): Unit = {
    val ref = Files.createTempDirectory(s"prop_${fam.name}_ref").toString
    val hurt = Files.createTempDirectory(s"prop_${fam.name}_crash").toString
    drive(fam, ref, crashAfter = Set.empty)
    drive(fam, hurt, crashAfter = kills, hard = hard)
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
  test("er ingest: kill+replay at any point converges to the no-crash run") {
    check(er)
  }
  test("scd2 ingest: kill+replay at any point converges to the no-crash run") {
    check(scd2)
  }
  test("quality ingest: kill+replay at any point converges to the no-crash run") {
    check(quality)
  }

  // -- the hard window: crash BEFORE the very first state flip ---------------
  // The artifact partitions exist but the pointer never did; the
  // replay's orphan drop then EMPTIES the artifact table (dir present,
  // zero data partitions) — the window that wedged `visibleLedgered` on
  // schema inference until it learned to return None there. These two
  // fail if that empty-table path is ever reverted.

  test("triangle ingest: hard first-batch crash (state lost pre-flip) recovers") {
    check(triangle, kills = Set(1), hard = true)
  }
  test("image ingest: hard first-batch crash (state lost pre-flip) recovers") {
    check(image, kills = Set(1), hard = true)
  }
  // video/mg take no hard case on purpose: neither reads its own
  // artifact table INSIDE the batch (video demuxes per-clip, mg's
  // state is the snapshot itself), so the emptied-table window has no
  // in-batch read to wedge — the at-rest read path they share is
  // pinned by the unit test below.
  test("sessions ingest: hard first-batch crash (open state lost pre-flip) recovers") {
    // openDir deleted with no version to roll back to: the replay takes
    // the missing-open branch (single crashed first batch -> watermark
    // "" -> full reprocess), not the out-of-band refusal
    check(sessions, kills = Set(1), hard = true)
  }

  test("visibleLedgered: existing dir with zero data partitions is None, not a schema-inference throw") {
    val dir = Files.createTempDirectory("vl_empty").toString
    // the shape dropFreshOrphans leaves behind: the table dir survives
    // (with at most stray marker files), every partition deleted
    Files.writeString(Paths.get(dir, "_SUCCESS"), "")
    assert(MicroBatch.visibleLedgered(spark, dir, Seq.empty).isEmpty,
      "empty-but-existing table must read as None (the first-batch-crash wedge)")
    // and the typed read substitutes the caller's empty frame
    val df = MicroBatch.readLedgeredTable(spark, dir, s"$dir/nostate", triSchema)
    assert(df.schema == triSchema && df.count() == 0)
  }
}

/** Shared tiny helper (basename) without importing store internals. */
private object FileLedgerSpecHelp {
  def base(s: String): String = s.substring(s.lastIndexOf('/') + 1)
}
