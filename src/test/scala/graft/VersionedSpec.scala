package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import graft.store.{Lake, Versioned}

/** Versioned table overwrite: pointer-flip snapshots, concurrent-reader
  * safety, retention, crash-orphan handling.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("overwrite then read round-trips; versions increment; old snapshots expire") {
    val root = Files.createTempDirectory("versioned").toString
    assert(!Versioned.exists(root))
    assert(Versioned.overwrite(Seq((1, "a")).toDF("k", "v"), root, keep = 1) == 1L)
    assert(Versioned.read(spark, root).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    assert(Versioned.overwrite(Seq((2, "b")).toDF("k", "v"), root, keep = 1) == 2L)
    assert(Versioned.currentVersion(root).contains(2L))
    assert(Versioned.read(spark, root).as[(Int, String)].collect().toSeq == Seq((2, "b")))
    // keep=1: after v3 lands, v1 expires but v2 (just superseded) survives
    Versioned.overwrite(Seq((3, "c")).toDF("k", "v"), root, keep = 1)
    assert(!Files.exists(Paths.get(root, "v_00000001")), "expired version not deleted")
    assert(Files.exists(Paths.get(root, "v_00000002")), "retention window violated")
    Lake.deleteRecursive(Paths.get(root))
  }

  test("a resolved snapshot is immutable under later overwrites") {
    val root = Files.createTempDirectory("versioned_pin").toString
    Versioned.overwrite((1 to 100).toDF("x"), root)
    val pinned = Versioned.read(spark, root) // resolves v1's path now
    Versioned.overwrite((1 to 5).toDF("x"), root)
    // the pinned frame still scans v1's files: full old row count
    assert(pinned.count() == 100)
    assert(Versioned.read(spark, root).count() == 5)
    Lake.deleteRecursive(Paths.get(root))
  }

  test("crash orphan: an unreferenced next-version dir is replaced by the next writer") {
    val root = Files.createTempDirectory("versioned_orphan").toString
    Versioned.overwrite(Seq(1).toDF("x"), root)
    // simulate a writer that crashed mid-write of v2: partial dir, no flip
    val orphan = Paths.get(root, "v_00000002")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    assert(Versioned.currentVersion(root).contains(1L)) // pointer untouched
    assert(Versioned.read(spark, root).count() == 1)    // reads stay clean
    Versioned.overwrite(Seq(2, 3).toDF("x"), root)      // rewrites the orphan slot
    assert(Versioned.currentVersion(root).contains(2L))
    assert(Versioned.read(spark, root).count() == 2)
    Lake.deleteRecursive(Paths.get(root))
  }

  test("time travel: retained superseded snapshots stay readable; expired/orphan versions are not offered") {
    val root = Files.createTempDirectory("versioned_tt").toString
    Versioned.overwrite(Seq((1, "a")).toDF("k", "v"), root, keep = 2)
    Versioned.overwrite(Seq((2, "b")).toDF("k", "v"), root, keep = 2)
    Versioned.overwrite(Seq((3, "c")).toDF("k", "v"), root, keep = 2)
    assert(Versioned.listVersions(root) == Seq(1L, 2L, 3L))
    // VERSION AS OF: each retained snapshot reads back its own content
    assert(Versioned.readVersion(spark, root, 1L).as[(Int, String)].head() == ((1, "a")))
    assert(Versioned.readVersion(spark, root, 2L).as[(Int, String)].head() == ((2, "b")))
    // a crashed writer's orphan (on disk, never referenced) is not readable
    Files.createDirectories(Paths.get(root, "v_00000009"))
    assert(Versioned.listVersions(root) == Seq(1L, 2L, 3L))
    intercept[IllegalStateException] { Versioned.readVersion(spark, root, 9L) }
    // expire v1 by age: vacuum with a zero horizon drops all superseded
    // versions older than now, never the current one
    val dropped = Versioned.vacuum(root, retainMillis = 0L,
      nowMillis = System.currentTimeMillis() + 60000L)
    assert(dropped == Seq(1L, 2L))
    assert(Versioned.listVersions(root) == Seq(3L))
    intercept[IllegalStateException] { Versioned.readVersion(spark, root, 1L) }
    assert(Versioned.read(spark, root).as[(Int, String)].head() == ((3, "c")))
    // a generous horizon deletes nothing
    assert(Versioned.vacuum(root, retainMillis = Long.MaxValue / 2).isEmpty)
    Lake.deleteRecursive(Paths.get(root))
  }

  test("no missing-path window: reader loops across 100 swaps without path-not-found") {
    val root = Files.createTempDirectory("versioned_concurrent").toString
    Versioned.overwrite(Seq((0, 0)).toDF("swap", "i"), root)
    val failure = new AtomicReference[Throwable](null)
    @volatile var stop = false
    val reader = new Thread(() => {
      try {
        while (!stop) {
          // resolve + scan, the racing read path; every swap publishes a
          // single-value frame so a torn read would also surface as a
          // mixed-swap result set
          val swaps = Versioned.read(spark, root)
            .select(col("swap")).distinct().as[Int].collect()
          assert(swaps.length == 1, s"torn snapshot: ${swaps.toSeq}")
        }
      } catch { case t: Throwable => failure.set(t) }
    })
    reader.start()
    // keep=3 default: writer cadence (a full parquet write each) dwarfs
    // the reader's resolve-to-scan latency, so the horizon never
    // overtakes an in-flight read
    for (s <- 1 to 100 if failure.get() == null) {
      Versioned.overwrite((1 to 4).map(i => (s, i)).toDF("swap", "i"), root)
    }
    stop = true
    reader.join(30000)
    assert(failure.get() == null,
      s"concurrent reader failed: ${Option(failure.get()).map(_.toString).orNull}")
    assert(Versioned.currentVersion(root).contains(101L))
    Lake.deleteRecursive(Paths.get(root))
  }

  test("adoptLegacy: a pre-versioned in-place table becomes v_00000001") {
    val root = Files.createTempDirectory("versioned_legacy").toString
    val t = s"$root/t"
    // the OLD layout: part files at the table root (Lake.atomicOverwrite)
    Seq((1, "a"), (2, "b")).toDF("k", "v").write.parquet(t)
    assert(!Versioned.exists(t))
    assert(Versioned.adoptLegacy(t))
    assert(Versioned.currentVersion(t).contains(1L))
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // no stray data files left at the root; idempotent thereafter
    import scala.jdk.CollectionConverters._
    assert(!Files.list(Paths.get(t)).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".parquet")))
    assert(!Versioned.adoptLegacy(t))
    // ordinary life continues on top of the adopted snapshot
    Versioned.overwrite(Seq((3, "c")).toDF("k", "v"), t)
    assert(Versioned.read(spark, t).as[(Int, String)].collect().toSeq == Seq((3, "c")))
    Lake.deleteRecursive(Paths.get(root))
  }

  test("adoptLegacy: crash windows resume via the _ADOPTING marker; orphans never adopted") {
    val root = Files.createTempDirectory("versioned_legacy_crash").toString
    // crash MID-MOVE: marker present, some files moved, some still at the
    // root — the next call must move the REMAINDER (deleting the partial
    // target here would lose the already-moved rows: the lost-file window
    // the marker exists to close, since listing order is unspecified)
    val t1 = s"$root/t1"
    Seq((1, "a"), (2, "b")).toDF("k", "v").repartition(2).write.parquet(t1)
    import scala.jdk.CollectionConverters._
    val parts = Files.list(Paths.get(t1)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(parts.size == 2)
    Files.write(Paths.get(t1, "_ADOPTING"), Array.emptyByteArray)
    Files.createDirectories(Paths.get(t1, "v_00000001"))
    Files.move(parts.head, Paths.get(t1, "v_00000001", parts.head.getFileName.toString))
    assert(Versioned.adoptLegacy(t1))
    assert(Versioned.read(spark, t1).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")), "mid-move resume lost rows")
    assert(!Files.exists(Paths.get(t1, "_ADOPTING")))
    // crash AFTER the moves, BEFORE the pointer flip: marker + complete
    // v dir, empty root → next call just flips and cleans the marker
    val t2 = s"$root/t2"
    Seq((3, "c")).toDF("k", "v").write.parquet(s"$t2/v_00000001")
    Files.write(Paths.get(t2, "_ADOPTING"), Array.emptyByteArray)
    assert(Versioned.adoptLegacy(t2))
    assert(Versioned.read(spark, t2).as[(Int, String)].collect().toSeq == Seq((3, "c")))
    assert(!Files.exists(Paths.get(t2, "_ADOPTING")))
    // a crashed FIRST overwrite (v dir, NO marker, no legacy root files)
    // must stay an orphan, not become current — even with _SUCCESS inside
    // (a complete-but-uncommitted write is still uncommitted)
    val t3 = s"$root/t3"
    Seq((4, "d")).toDF("k", "v").write.parquet(s"$t3/v_00000001")
    assert(!Versioned.adoptLegacy(t3))
    assert(!Versioned.exists(t3))
    // fresh/empty dirs and already-versioned tables are untouched
    assert(!Versioned.adoptLegacy(s"$root/missing"))
    Lake.deleteRecursive(Paths.get(root))
  }

  test("writer lock: a live contender is refused loudly; a stale lease is broken; release is clean") {
    val root = Files.createTempDirectory("versioned_lock").toString
    // a LIVE lock (fresh mtime) must fail a second writer fast
    graft.store.Fs.writeString(s"$root/_WRITER_LOCK", "contender@now")
    val ex = intercept[IllegalStateException] {
      Versioned.overwrite(Seq((1, "a")).toDF("k", "v"), root)
    }
    assert(ex.getMessage.contains("single-writer"), ex.getMessage)
    assert(!Versioned.exists(root), "refused write must not flip a pointer")
    // a lock whose pid is provably ALIVE on this host is never broken,
    // even past the lease — a legitimately long rewrite must not have
    // its lock stolen mid-swap (lease only governs unverifiable locks)
    graft.store.Fs.writeString(s"$root/_WRITER_LOCK",
      s"${ProcessHandle.current().pid()}@0")
    Files.setLastModifiedTime(Paths.get(root, "_WRITER_LOCK"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 31L * 60 * 1000))
    intercept[IllegalStateException] {
      Versioned.overwrite(Seq((9, "x")).toDF("k", "v"), root)
    }
    assert(!Versioned.exists(root), "live-pid lock must refuse, not break")
    // a FRESH lock whose recorded pid is provably dead on this host is a
    // kill -9'd writer's — broken immediately, not after the lease
    // (restart-after-crash must not stall 30 min)
    graft.store.Fs.writeString(s"$root/_WRITER_LOCK",
      s"999999999@${System.currentTimeMillis()}")
    assert(Versioned.overwrite(Seq((0, "z")).toDF("k", "v"), root) == 1L)
    // a STALE lock (older than the lease) is a crashed writer's — broken
    graft.store.Fs.writeString(s"$root/_WRITER_LOCK", "contender@now")
    Files.setLastModifiedTime(Paths.get(root, "_WRITER_LOCK"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 31L * 60 * 1000))
    assert(Versioned.overwrite(Seq((1, "a")).toDF("k", "v"), root) == 2L)
    // the lock releases on completion: the next writer proceeds normally
    assert(!Files.exists(Paths.get(root, "_WRITER_LOCK")), "lock must release")
    assert(Versioned.overwrite(Seq((2, "b")).toDF("k", "v"), root) == 3L)
    // reentrancy: a holder's nested overwrite of the same root proceeds
    Versioned.withWriterLock(root) {
      assert(Versioned.overwrite(Seq((3, "c")).toDF("k", "v"), root) == 4L)
    }
    assert(Versioned.read(spark, root).as[(Int, String)].collect().toSeq == Seq((3, "c")))
    Lake.deleteRecursive(Paths.get(root))
  }
}
