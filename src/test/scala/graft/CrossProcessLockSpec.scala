package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.store.{Fs, Versioned}

/** Child JVM entry for [[CrossProcessLockSpec]]: acquire the writer lock
  * on `args(0)` through the REAL protocol (`Versioned.withWriterLock` →
  * `Fs.createExclusive`), signal acquisition with a `_HELD` marker, then
  * hold until killed. No SparkSession — the lock family is pure driver
  * file I/O by design.
  */
object CrossProcessLockHolder {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    Versioned.withWriterLock(root) {
      Files.write(Paths.get(root, "_HELD"), Array.emptyByteArray)
      Thread.sleep(600000L)
    }
  }
}

/** Child JVM entry for the two-writer interleave: one `Versioned`
  * commit of a single-row table through the REAL protocol (own
  * SparkSession, own writer-lock acquisition). Exits 0 on a committed
  * version, 7 on the live-writer refusal — the parent asserts on the
  * exit code, so refusal vs success is unambiguous across the process
  * boundary.
  */
object CrossProcessCommitter {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val value = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("xcommit").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Files.createTempDirectory("xwh").toString)
      .getOrCreate()
    import spark.implicits._
    try {
      val v = Versioned.overwrite(Seq(value).toDF("v"), root)
      println(s"COMMITTED $v")
      spark.stop()
      sys.exit(0)
    } catch {
      case e: IllegalStateException if e.getMessage.contains("LIVE writer") =>
        println("REFUSED")
        spark.stop()
        sys.exit(7)
    }
  }
}

/** Child JVM entry for the mid-flip crash test (r19 verdict #8):
  * through the REAL writer protocol — own SparkSession, real lock
  * acquisition, real parquet staging — acquire the lock, STAGE the next
  * version dir fully, then signal `_MIDFLIP` and hold. The parent
  * kill -9s at the marker, leaving exactly the crash state
  * [[Versioned.overwrite]]'s contract describes: a complete
  * staged-but-unreferenced version dir plus a dead holder's lock. The
  * staging layout (v_%08d) is replicated deliberately — the vname
  * helper is private, and the point is to die BETWEEN the two real
  * steps, which no public entry point survives long enough to expose.
  */
object CrossProcessCrashWriter {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val value = args(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("xcrash").master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", Files.createTempDirectory("xwh").toString)
      .getOrCreate()
    import spark.implicits._
    Versioned.withWriterLock(root) {
      val next = Versioned.currentVersion(root).getOrElse(0L) + 1L
      val target = f"$root/v_$next%08d"
      Seq(value).toDF("v").write.mode("overwrite").parquet(target)
      Files.write(Paths.get(root, "_MIDFLIP"), Array.emptyByteArray)
      Thread.sleep(600000L)
    }
  }
}

/** The pid@epoch@host lock protocol under REAL cross-process contention —
  * a second JVM, not a same-JVM thread or a hand-written lock file: a
  * live foreign holder must draw the loud single-writer refusal, and a
  * `kill -9`'d holder must be broken by pid-liveness alone (no lease
  * wait). This is the test the r15 verdict asked for to turn the
  * protocol's reasoning into evidence.
  */
class CrossProcessLockSpec extends AnyFunSuite {

  private def codeLocation(c: Class[_]): String =
    Paths.get(c.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  // child classpath: graft main + test classes, scala-library, and the
  // directory holding the spark/hadoop jars (wildcard), each resolved
  // from THIS JVM's loaded classes, not hardcoded paths
  private def childCp: String = Seq(
    codeLocation(Versioned.getClass),
    codeLocation(CrossProcessLockHolder.getClass),
    codeLocation(classOf[scala.Option[_]]),
    Paths.get(codeLocation(classOf[org.apache.hadoop.conf.Configuration]))
      .getParent.toString + "/*"
  ).mkString(java.io.File.pathSeparator)

  // Spark-in-child needs the same JDK17 module opens build.sbt forks with
  private def jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launchChild(main: String, root: String, value: String,
                          log: java.io.File): Process = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = (Seq(javaBin) ++ jdk17AddOpens ++
      Seq("-Xmx2g", "-cp", childCp, main, root, value))
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(log))
    pb.start()
  }

  private def launchCommitter(root: String, value: String, log: java.io.File): Process =
    launchChild("graft.CrossProcessCommitter", root, value, log)

  test("writer lock cross-process: live refusal, then kill -9 pid-liveness stale break") {
    val root = Files.createTempDirectory("xlock").toString
    // child classpath: graft main + test classes, scala-library, and the
    // directory holding the hadoop client jars (wildcard), each resolved
    // from THIS JVM's loaded classes, not hardcoded paths
    val cp = Seq(
      codeLocation(Versioned.getClass),
      codeLocation(CrossProcessLockHolder.getClass),
      codeLocation(classOf[scala.Option[_]]),
      Paths.get(codeLocation(classOf[org.apache.hadoop.conf.Configuration]))
        .getParent.toString + "/*"
    ).mkString(java.io.File.pathSeparator)
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val log = new java.io.File(root, "_child.log")
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.CrossProcessLockHolder", root)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.to(log))
    val child = pb.start()
    def childLog(): String =
      try new String(Files.readAllBytes(log.toPath)) catch { case _: Exception => "<no log>" }
    try {
      val held = Paths.get(root, "_HELD")
      val deadline = System.currentTimeMillis() + 60000L
      while (!Files.exists(held) && System.currentTimeMillis() < deadline) {
        assert(child.isAlive, s"child JVM died before acquiring:\n${childLog()}")
        Thread.sleep(50)
      }
      assert(Files.exists(held), s"child never acquired the lock:\n${childLog()}")

      val lock = s"$root/_WRITER_LOCK"
      val claim = Fs.readString(lock)
      assert(claim.startsWith(s"${child.pid()}@"),
        s"lock claims '$claim', expected child pid ${child.pid()}")

      // a LIVE foreign holder (real pid, alive) → loud refusal, lock intact
      val ex = intercept[IllegalStateException] { Versioned.withWriterLock(root)(()) }
      assert(ex.getMessage.contains("LIVE writer"), ex.getMessage)
      assert(Fs.readString(lock) == claim, "refusal must leave the holder's lock untouched")

      // kill -9 the holder; waitFor reaps it so ProcessHandle.isAlive
      // goes false (a zombie would still read alive)
      child.destroyForcibly()
      assert(child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "child did not die")

      // pid-liveness-first staleness: the dead pid's FRESH lease (epoch
      // is seconds old) must be broken immediately, no lease-expiry wait
      var heldByUs = false
      Versioned.withWriterLock(root) {
        heldByUs = Fs.readString(lock).startsWith(s"${ProcessHandle.current().pid()}@")
      }
      assert(heldByUs, "after the stale break, the lock inside f must carry OUR claim")
      assert(!Fs.exists(lock), "our lock must release on exit")
    } finally {
      child.destroyForcibly()
      child.waitFor()
    }
  }

  test("two-writer interleave: refused while held, commits serialize after release") {
    val spark = SparkSpec.session
    import spark.implicits._
    val root = Files.createTempDirectory("xcommit").toString
    def logOf(f: java.io.File): String =
      try new String(Files.readAllBytes(f.toPath)) catch { case _: Exception => "<no log>" }

    // writer #1 (this process) commits v1
    assert(Versioned.overwrite(Seq("A").toDF("v"), root) == 1L)

    // while #1 holds the writer lock, writer #2 (a REAL second JVM with
    // its own SparkSession) must be refused — exit 7, version unmoved
    val log1 = new java.io.File(root, "_child_refused.log")
    Versioned.withWriterLock(root) {
      val p = launchCommitter(root, "B", log1)
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"refused committer never exited:\n${logOf(log1)}")
      assert(p.exitValue() == 7,
        s"expected live-writer refusal (exit 7), got ${p.exitValue()}:\n${logOf(log1)}")
    }
    assert(Versioned.currentVersion(root).contains(1L), "a refused commit advanced the table")

    // after #1 releases, #2 commits v2. While it runs, poll the pointer:
    // CURRENT must always name a COMPLETE snapshot (_SUCCESS present) —
    // the never-torn invariant under a foreign writer
    val log2 = new java.io.File(root, "_child_commit.log")
    val p2 = launchCommitter(root, "B", log2)
    while (p2.isAlive) {
      Versioned.currentPath(root).foreach { dir =>
        assert(Fs.exists(s"$dir/_SUCCESS"), s"CURRENT pointed at a torn dir: $dir")
      }
      Thread.sleep(25)
    }
    assert(p2.exitValue() == 0, s"handoff commit failed:\n${logOf(log2)}")
    assert(Versioned.currentVersion(root).contains(2L), s"child log:\n${logOf(log2)}")

    // handoff back: #1 serializes v3 on top of the foreign commit
    assert(Versioned.overwrite(Seq("C").toDF("v"), root) == 3L)
    assert(!Fs.exists(s"$root/_WRITER_LOCK"), "lock must be released after the last commit")

    // both writers' snapshots are durable and time travel sees the full
    // interleave in commit order
    def vals(v: Long): Seq[String] =
      Versioned.readVersion(spark, root, v).as[String].collect().toSeq
    assert(vals(1L) == Seq("A") && vals(2L) == Seq("B") && vals(3L) == Seq("C"))
    assert(Versioned.read(spark, root).as[String].collect().toSeq == Seq("C"))
    assert(Fs.readString(s"$root/CURRENT").trim == "3")
  }

  test("mid-flip kill in a foreign writer JVM: readers never torn, orphan invisible, next writer recovers") {
    // the forced mid-flip crash (r19 verdict #8): a SECOND JVM stages
    // v2 through the real protocol and is kill -9'd between staging and
    // the pointer flip — the exact window Versioned's crash contract
    // reasons about, now exercised across a process boundary instead of
    // simulated by hand-creating an orphan dir (VersionedSpec's
    // in-process variant)
    val spark = SparkSpec.session
    import spark.implicits._
    val root = Files.createTempDirectory("xcrash").toString
    def logOf(f: java.io.File): String =
      try new String(Files.readAllBytes(f.toPath)) catch { case _: Exception => "<no log>" }
    assert(Versioned.overwrite(Seq("A").toDF("v"), root) == 1L)
    val log = new java.io.File(root, "_crash.log")
    val p = launchChild("graft.CrossProcessCrashWriter", root, "B", log)
    try {
      val mid = Paths.get(root, "_MIDFLIP")
      val deadline = System.currentTimeMillis() + 180000L
      while (!Files.exists(mid) && System.currentTimeMillis() < deadline) {
        assert(p.isAlive, s"crash writer died before staging:\n${logOf(log)}")
        // reader invariant WHILE the foreign writer stages: the pointer
        // only ever names the complete old snapshot
        assert(Versioned.read(spark, root).as[String].collect().toSeq == Seq("A"))
        Thread.sleep(25)
      }
      assert(Files.exists(mid), s"crash writer never staged:\n${logOf(log)}")
      p.destroyForcibly()
      assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS), "crash writer did not die")
      // the crash state: a fully staged v2 on disk that CURRENT never
      // references, plus the dead pid's lock
      assert(Fs.exists(s"$root/v_00000002"), "fixture broken: nothing was staged")
      assert(Fs.exists(s"$root/_WRITER_LOCK"), "fixture broken: dead writer left no lock")
      assert(Versioned.currentVersion(root).contains(1L), "a killed writer moved the pointer")
      assert(Versioned.read(spark, root).as[String].collect().toSeq == Seq("A"))
      // the orphan is INVISIBLE to time travel (never offered)
      assert(Versioned.listVersions(root) == Seq(1L),
        s"orphan offered to readers: ${Versioned.listVersions(root)}")
      // the next writer: breaks the dead pid's lock by liveness, deletes
      // and rewrites the orphan dir, commits v2 — full recovery with no
      // manual intervention
      assert(Versioned.overwrite(Seq("C").toDF("v"), root) == 2L)
      assert(Versioned.read(spark, root).as[String].collect().toSeq == Seq("C"))
      assert(Versioned.readVersion(spark, root, 2L).as[String].collect().toSeq == Seq("C"),
        "recovered v2 must carry the RECOVERING writer's rows, not the dead one's")
      assert(!Fs.exists(s"$root/_WRITER_LOCK"), "recovery must release the lock")
    } finally {
      p.destroyForcibly()
      p.waitFor()
    }
  }
}
