package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lock-free table overwrite: versioned directories + an atomically
  * swapped current-pointer file — the snapshot mechanism every table
  * format (Delta's `_last_checkpoint`, Iceberg's `version-hint.text`,
  * Hive's ACID base dirs) uses to give readers a consistent view while
  * a writer replaces the table.
  *
  * `Lake.atomicOverwrite` swaps IN PLACE (canonical path = the data
  * dir), which keeps plain `spark.read.parquet(dir)` compatibility but
  * has an unavoidable two-move window where the canonical path does not
  * exist — its documented no-concurrent-reader caveat. Here the
  * canonical path always exists: writers stage a complete new
  * `v_########` dir and then flip `CURRENT` with one atomic rename;
  * a reader resolves the pointer and scans an immutable snapshot dir
  * that no writer will ever mutate. Concurrent readers across unlimited
  * swaps see either the old or the new version, never a missing path
  * (VersionedSpec drives 100 swaps under a reader thread).
  *
  * Retention: `overwrite` keeps the last `keep` superseded versions and
  * deletes older ones. A reader that resolved the pointer keeps reading
  * its (immutable) snapshot even after newer flips — it only needs the
  * snapshot to outlive the read, so `keep` × writer-cadence must exceed
  * the slowest reader. At production scale make vacuuming time-based
  * (delete versions older than the max query runtime), exactly like
  * `VACUUM`'s retention horizon in Delta.
  *
  * Crash safety, single writer (the same contract the reference's
  * MaxConcurrentRuns-1 orchestration gives): a crash mid-write leaves an
  * orphan version dir that `CURRENT` never references; the next
  * overwrite deletes and rewrites it. A crash between "write pointer
  * temp" and "rename" leaves only a stale temp file. No recovery step is
  * ever required to read — the pointer always names a complete snapshot.
  */
object Versioned {

  private val Pointer = "CURRENT"

  private def vname(n: Long): String = f"v_$n%08d"

  /** The live version number, if the table exists. */
  def currentVersion(root: String): Option[Long] = {
    val p = Paths.get(root, Pointer)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p)).trim.toLong)
  }

  /** Absolute path of the live snapshot dir, if the table exists. */
  def currentPath(root: String): Option[String] =
    currentVersion(root).map(n => Paths.get(root, vname(n)).toString)

  def exists(root: String): Boolean = currentPath(root).isDefined

  /** Read the live snapshot. The returned frame is pinned to the
    * resolved version dir: later overwrites never mutate it, so the
    * plan can be consumed at leisure (subject to the retention horizon).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(root).getOrElse(
      throw new IllegalStateException(s"no versioned table at $root")))

  /** Every version still on disk, ascending — the set `readVersion` can
    * time-travel to (current plus the retained superseded snapshots).
    */
  def listVersions(root: String): Seq[Long] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) Seq.empty
    else {
      val cur = currentVersion(root)
      Lake.listDir(p).iterator
        .map(_.getFileName.toString)
        .filter(_.startsWith("v_"))
        .map(_.drop(2).toLong)
        // an on-disk version NEWER than the pointer is a crashed writer's
        // orphan, not a snapshot — never surface it as readable
        .filter(n => cur.exists(n <= _))
        .toSeq.sorted
    }
  }

  /** Time travel: read a specific retained snapshot — what Delta calls
    * `VERSION AS OF`. Fails loudly for expired or never-written versions.
    */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val p = Paths.get(root, vname(version))
    if (!listVersions(root).contains(version))
      throw new IllegalStateException(
        s"version $version of $root is not retained (have: ${listVersions(root).mkString(",")})")
    spark.read.parquet(p.toString)
  }

  /** Time-based retention, the production complement of `overwrite`'s
    * count-based `keep` (Delta's `VACUUM RETAIN n HOURS`): delete
    * superseded snapshots whose files are all older than `retainMillis`,
    * never the current one. Run it on the writer's cadence with a horizon
    * longer than the slowest reader and in-flight reads stay safe at any
    * overwrite frequency.
    */
  def vacuum(root: String, retainMillis: Long, nowMillis: Long = System.currentTimeMillis()): Seq[Long] = {
    val cur = currentVersion(root).getOrElse(return Seq.empty)
    import scala.jdk.CollectionConverters._
    val expired = listVersions(root).filter(_ < cur).filter { n =>
      val newest = Files.walk(Paths.get(root, vname(n))).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => Files.getLastModifiedTime(f).toMillis)
        .foldLeft(0L)(math.max)
      nowMillis - newest > retainMillis
    }
    expired.foreach(n => Lake.deleteRecursive(Paths.get(root, vname(n))))
    expired
  }

  /** Adopt a pre-versioned IN-PLACE parquet table (the layout
    * `Lake.atomicOverwrite` maintains: part files at the root, no
    * pointer) as snapshot v_00000001 — the upgrade path for state dirs
    * written before they moved to the versioned layout. Without this, a
    * caller checking `exists` sees `false` over a legacy table and
    * silently abandons previously merged state (the old part files
    * linger beside fresh v_ dirs, never read again).
    *
    * Returns true when an adoption (or the completion of a crashed one)
    * happened. Crash safety under the single-writer contract hangs on an
    * explicit `_ADOPTING` marker written BEFORE the first move (file
    * listing order is unspecified, so no moved file — not even _SUCCESS —
    * can serve as the "moves started" signal without a lost-file window):
    * a crash anywhere between marker and pointer flip leaves the marker,
    * and the next call resumes — moves whatever still sits at the root
    * into the same v dir and flips the pointer. Without the marker, a
    * v_00000001 next to (or without) legacy root files is a crashed
    * `overwrite`'s staging — never adopted, never mixed into; it stays an
    * orphan for `overwrite` to clean.
    */
  def adoptLegacy(root: String): Boolean = {
    val p = Paths.get(root)
    val marker = p.resolve("_ADOPTING")
    if (currentVersion(root).isDefined) {
      // crash between pointer flip and marker cleanup: finish the cleanup
      Files.deleteIfExists(marker)
      return false
    }
    if (!Files.exists(p)) return false
    def rootDataFiles = Lake.listDir(p)
      .filter(Files.isRegularFile(_))
      .filter { f => val n = f.getFileName.toString
        n.endsWith(".parquet") || n == "_SUCCESS" }
    val target = Paths.get(root, vname(1L))
    val pending = rootDataFiles
    val resuming = Files.exists(marker)
    // not a legacy table: no data files at the root and no adoption to
    // finish (an empty dir, or a crashed first overwrite's orphan v dir)
    if (!resuming && pending.forall(_.getFileName.toString == "_SUCCESS")) return false
    if (!resuming) {
      // fresh adoption: any pre-existing v_00000001 is a crashed
      // overwrite's partial staging — rebuild, never mix into it
      Lake.deleteRecursive(target)
      Files.write(marker, Array.emptyByteArray)
    }
    Files.createDirectories(target)
    pending.foreach(f =>
      Files.move(f, target.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING))
    val tmp = Paths.get(root, s".$Pointer.tmp")
    Files.write(tmp, "1".getBytes)
    Files.move(tmp, Paths.get(root, Pointer),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    Files.deleteIfExists(marker)
    true
  }

  /** Replace the table: stage the full result as the next version dir,
    * flip the pointer atomically, expire versions older than the last
    * `keep` superseded ones. Returns the new version number.
    */
  def overwrite(df: DataFrame, root: String, keep: Int = 3): Long = {
    require(keep >= 1, "keep >= 1: the just-superseded version must survive in-flight readers")
    Files.createDirectories(Paths.get(root))
    val next = currentVersion(root).getOrElse(0L) + 1L
    val target = Paths.get(root, vname(next))
    Lake.deleteRecursive(target) // orphan from a crashed writer, if any
    df.write.mode(SaveMode.Overwrite).parquet(target.toString)
    val tmp = Paths.get(root, s".$Pointer.tmp")
    Files.write(tmp, next.toString.getBytes)
    Files.move(tmp, Paths.get(root, Pointer),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    // expire: everything at or below (next - 1 - keep)
    val horizon = next - 1L - keep
    if (horizon > 0) {
      Lake.listDir(Paths.get(root)).iterator
        .filter(p => p.getFileName.toString.startsWith("v_"))
        .filter(p => p.getFileName.toString.drop(2).toLong <= horizon)
        .foreach(Lake.deleteRecursive)
    }
    next
  }
}
