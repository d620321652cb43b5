package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.store.{FileLedger, Lake, Upsert}

/** The compacted replay ledger (`FileLedger`) and its two storage
  * forms: in-snapshot rows (the Versioned streams) and marker files
  * (`Upsert`'s `_ledger`), plus the flat→hive layout migration the
  * triangle stream runs at start.
  */
class FileLedgerSpec extends SparkSpec {
  import FileLedger.{State, compact}

  private def p(b: String) = s"file:///land/$b"

  test("compact retires the applied prefix behind the watermark; frontier rows survive") {
    // everything landed is applied -> one watermark, zero file rows
    val all = compact(State(None, Set.empty), Set(p("a1"), p("a2"), p("a3")),
      landed = Set("a1", "a2", "a3"))
    assert(all == State(Some("a3"), Set.empty))
    // an unapplied landed file below the max holds the watermark back,
    // and the out-of-order applied file above it stays as a row
    val gap = compact(State(None, Set.empty), Set(p("a1"), p("a3")),
      landed = Set("a1", "a2", "a3"))
    assert(gap == State(Some("a1"), Set(p("a3"))))
    // the gap fills -> next compaction folds the frontier row away
    assert(compact(gap, Set(p("a2")), landed = Set("a1", "a2", "a3"))
      == State(Some("a3"), Set.empty))
  }

  test("watermark never regresses, and applied() covers retired + frontier + nothing else") {
    val st = compact(State(Some("b5"), Set(p("b7"))), Set.empty, landed = Set("b6", "b7"))
    assert(st.hwm.contains("b5"), s"b6 is landed-unapplied, hwm must hold: $st")
    assert(st.applied(p("b4")) && st.applied(p("b5")), "retired names are applied")
    assert(st.applied(p("b7")) && !st.applied(p("b6")) && !st.applied(p("b8")))
    // an empty landing listing (compaction disabled / dir archived
    // whole) still never regresses the watermark
    assert(compact(st, Set(p("b6")), landed = Set.empty).hwm.contains("b7"))
  }

  test("snapshot round-trip: rows encode hwm + frontier and load back identically") {
    val st = State(Some("c2"), Set(p("c4"), p("c9")))
    assert(FileLedger.fromRows(FileLedger.toRows(st)) == st)
    // pre-compaction snapshots (file rows only) load as uncompacted
    assert(FileLedger.fromRows(Seq(("file", p("c1"), 0L), ("cnt", "x", 3L)))
      == State(None, Set(p("c1"))))
  }

  test("marker-file ledger compacts behind HWM; containment honors both forms") {
    val tbl = Files.createTempDirectory("marker_ledger").toString
    val land = Files.createTempDirectory("marker_land").toString
    def landFile(b: String): String = {
      Files.writeString(Paths.get(land, b), "{}")
      // record with the URI shape input_file_name() reports
      s"file://$land/$b"
    }
    val f1 = landFile("k1.jsonl"); val f2 = landFile("k2.jsonl")
    Upsert.fileLedgerRecord(tbl, f1)
    Upsert.fileLedgerRecord(tbl, f2)
    assert(Upsert.fileLedgerContains(tbl, f1) && Upsert.fileLedgerContains(tbl, f2))
    Upsert.fileLedgerCompact(tbl, FileLedger.landedBasenames(land))
    // both markers retired behind one HWM file
    import scala.jdk.CollectionConverters._
    val left = Files.list(Paths.get(tbl, "_ledger")).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(left == Seq("HWM"), s"markers must retire: $left")
    assert(Upsert.fileLedgerHwm(tbl).contains("k2.jsonl"))
    assert(Upsert.fileLedgerContains(tbl, f1) && Upsert.fileLedgerContains(tbl, f2),
      "retired files must still test as applied via the watermark")
    assert(!Upsert.fileLedgerContains(tbl, s"file://$land/k3.jsonl"))
    // an in-flight landed file holds the watermark at its predecessor
    Files.writeString(Paths.get(land, "k3.jsonl"), "{}")
    val f4 = landFile("k4.jsonl")
    Upsert.fileLedgerRecord(tbl, f4)
    Upsert.fileLedgerCompact(tbl, FileLedger.landedBasenames(land))
    assert(Upsert.fileLedgerHwm(tbl).contains("k2.jsonl"), "k3 is pending")
    assert(Upsert.fileLedgerContains(tbl, f4), "frontier marker must survive")
    assert(!Upsert.fileLedgerContains(tbl, s"file://$land/k3.jsonl"))
  }

  test("migrateFlatPartitions rewrites a flat table into hive layout, idempotently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("flat_migrate").toString + "/edges"
    // the pre-partitioned layout: src_file as a plain data column
    Seq((1L, 2L, p("e1")), (2L, 3L, p("e1")), (3L, 4L, p("e2")))
      .toDF("a", "b", "src_file").write.parquet(dir)
    assert(new java.io.File(dir).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")), "precondition: flat layout")
    assert(Lake.migrateFlatPartitions(spark, dir, "src_file"))
    val after = new java.io.File(dir).listFiles().filterNot(_.getName.startsWith("."))
    assert(after.forall(f => f.isDirectory && f.getName.startsWith("src_file=")),
      s"root must hold only partition dirs: ${after.map(_.getName).mkString(",")}")
    val rows = spark.read.parquet(dir).select($"a", $"b", $"src_file")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, 2L, p("e1")), (2L, 3L, p("e1")), (3L, 4L, p("e2"))))
    // second call: nothing flat left, a no-op
    assert(!Lake.migrateFlatPartitions(spark, dir, "src_file"))
    assert(spark.read.parquet(dir).count() == 3L)
    // crash resume: a leftover staged file (the crash-between-sweep-and-
    // rewrite window) is folded in without duplicating migrated rows
    Seq((9L, 9L, p("e3"))).toDF("a", "b", "src_file")
      .write.parquet(s"$dir/_flat_legacy")
    assert(Lake.migrateFlatPartitions(spark, dir, "src_file"))
    val rows2 = spark.read.parquet(dir).select($"a", $"b").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(rows2 == Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 9L)), rows2.toString)
  }

  test("landing archival behind the watermark: applied files move, replay stays a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("archive_land").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val q = graft.stream.MicroBatch.mgIngestStream(spark, in, schema, "text", k = 3,
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def snap() = graft.store.Versioned.read(spark, s"$root/state")
      .select($"kind", $"token", $"cnt").as[(String, String, Long)].collect().sorted.toSeq
    Files.writeString(Paths.get(s"$in/b1.jsonl"), """{"doc_id":1,"text":"hot hot hot"}""")
    Files.writeString(Paths.get(s"$in/b2.jsonl"), """{"doc_id":2,"text":"hot cold"}""")
    run()
    val s1 = snap()
    // archival lags ONE snapshot flip: b2 is covered only by the LIVE
    // watermark — if the last batch's source-offset commit was lost,
    // the source must still be able to re-read it — so only b1 (behind
    // the PREVIOUS flip's watermark) moves
    val moved = graft.stream.MicroBatch.archiveRetiredLanding(
      spark, in, s"$root/archive", s"$root/state")
    assert(moved.map(FileLedger.basename) == Seq("b1.jsonl"), s"archival moved $moved")
    assert(Files.exists(Paths.get(s"$root/archive/b1.jsonl")))
    assert(FileLedger.landedBasenames(in) == Set("b2.jsonl"))
    // a wiped checkpoint redelivers only the unarchived tail; the
    // ledger makes that a no-op and the state is unchanged
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    assert(snap() == s1, "replay after archival changed state")
    // the stream continues past the archived prefix; the watermark
    // advances over the new file without regressing, and the next
    // archival picks up the file the previous flip retired
    Files.writeString(Paths.get(s"$in/b3.jsonl"), """{"doc_id":3,"text":"hot warm"}""")
    run()
    val hwm = snap().collectFirst { case ("hwm", w, _) => w }
    assert(hwm.contains("b3.jsonl"), s"watermark after archival+catchup: ${snap()}")
    // an in-flight (unapplied) file above the watermark never moves
    Files.writeString(Paths.get(s"$in/b4.jsonl"), """{"doc_id":4,"text":"x"}""")
    val moved2 = graft.stream.MicroBatch.archiveRetiredLanding(
      spark, in, s"$root/archive", s"$root/state")
    assert(moved2.map(FileLedger.basename) == Seq("b2.jsonl") &&
      FileLedger.landedBasenames(in) == Set("b3.jsonl", "b4.jsonl"),
      s"second archival: $moved2")
  }

  test("compactLedger=false keeps the uncompacted per-file ledger (non-monotone naming opt-out)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("nocompact").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val q = graft.stream.MicroBatch.mgIngestStream(spark, in, schema, "text", k = 3,
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt",
        compactLedger = false)
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    Files.writeString(Paths.get(s"$in/b1.jsonl"), """{"doc_id":1,"text":"x y"}""")
    Files.writeString(Paths.get(s"$in/b2.jsonl"), """{"doc_id":2,"text":"x z"}""")
    run()
    val rows = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "file" || $"kind" === "hwm")
      .select($"kind", $"token").as[(String, String)].collect().sorted.toSeq
    assert(rows.map(_._1) == Seq("file", "file") &&
      rows.map(t => FileLedger.basename(t._2)) == Seq("b1.jsonl", "b2.jsonl"),
      s"opt-out must keep per-file rows and never write a watermark: $rows")
    // a naturally-numbered tenth file is applied, not watermark-shadowed
    Files.writeString(Paths.get(s"$in/b10.jsonl"), """{"doc_id":10,"text":"x w"}""")
    run()
    val after = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "file").select($"token").as[String]
      .collect().map(FileLedger.basename).sorted.toSeq
    assert(after == Seq("b1.jsonl", "b10.jsonl", "b2.jsonl"), s"b10 must apply: $after")
  }

  test("a fresh readLedgeredTable over a table whose snapshot never flipped serves nothing") {
    import spark.implicits._
    // the ADVICE crash window: first-ever batch appended its partitions
    // and died before the state pointer existed — the read must treat
    // the whole table as orphaned, not throw
    val root = Files.createTempDirectory("no_snap").toString
    Seq((1L, 99L)).toDF("media_id", "dhash")
      .withColumn("src_file", lit(p("x1")))
      .write.partitionBy("src_file").parquet(s"$root/hashes")
    val got = graft.stream.MicroBatch.readImageHashes(
      spark, s"$root/hashes", s"$root/state")
    assert(got.count() == 0L, "orphans of a never-flipped snapshot leaked")
  }
}
