package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.store.{Fs, Versioned}

/** The Hadoop-FileContext storage seam, driven against the local
  * filesystem (the "local impl in tests" half of the deployability
  * contract — the same calls resolve to hdfs:///s3a:// by path scheme).
  */
class FsSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_fs").toString

  test("write/read/exists/list round-trip, no checksum side files") {
    val root = tmp()
    assert(!Fs.exists(s"$root/a.txt"))
    Fs.writeString(s"$root/a.txt", "hello")
    assert(Fs.exists(s"$root/a.txt") && Fs.isFile(s"$root/a.txt"))
    assert(Fs.readString(s"$root/a.txt") == "hello")
    Fs.mkdirs(s"$root/sub/deep")
    val names = Fs.list(root).map(_.name).toSet
    assert(names == Set("a.txt", "sub"))
    // RawLocalFs contract: no .crc pollution — a dir written through the
    // seam and through java.nio must look identical
    assert(!Files.list(Paths.get(root)).iterator().asScala.exists(
      _.getFileName.toString.endsWith(".crc")))
    assert(Fs.list(root).find(_.name == "sub").exists(_.isDir))
    assert(Fs.list(s"$root/missing").isEmpty)
  }

  test("writeStringAtomic publishes under the canonical name and overwrites") {
    val root = tmp()
    Fs.writeStringAtomic(s"$root/CURRENT", "1")
    assert(Fs.readString(s"$root/CURRENT") == "1")
    Fs.writeStringAtomic(s"$root/CURRENT", "2")
    assert(Fs.readString(s"$root/CURRENT") == "2")
    // staging temp never lingers after a completed publish
    assert(Fs.list(root).map(_.name) == Seq("CURRENT"))
  }

  test("rename refuses an existing destination; renameOverwrite replaces a file") {
    val root = tmp()
    Fs.writeString(s"$root/a", "A")
    Fs.writeString(s"$root/b", "B")
    intercept[Exception](Fs.rename(s"$root/a", s"$root/b"))
    assert(Fs.readString(s"$root/b") == "B")
    Fs.renameOverwrite(s"$root/a", s"$root/b")
    assert(Fs.readString(s"$root/b") == "A" && !Fs.exists(s"$root/a"))
  }

  test("directory rename moves the whole tree; delete is recursive and idempotent") {
    val root = tmp()
    Fs.writeString(s"$root/d/x/f1", "1")
    Fs.writeString(s"$root/d/f2", "2")
    Fs.rename(s"$root/d", s"$root/e")
    assert(Fs.readString(s"$root/e/x/f1") == "1")
    assert(!Fs.exists(s"$root/d"))
    assert(Fs.listFilesRecursive(s"$root/e").map(_.name).toSet == Set("f1", "f2"))
    Fs.delete(s"$root/e")
    assert(!Fs.exists(s"$root/e"))
    Fs.delete(s"$root/e") // idempotent on missing
  }

  test("listFilesRecursive carries len and a sane mtime (fingerprint inputs)") {
    val root = tmp()
    Fs.writeString(s"$root/t/f", "abcd")
    val e = Fs.listFilesRecursive(s"$root/t").head
    assert(e.len == 4L)
    assert(math.abs(e.mtime - System.currentTimeMillis()) < 60000L)
    // path is scheme-stripped for local entries: java.nio can resolve it
    assert(Files.exists(Paths.get(e.path)))
  }

  test("Versioned pointer flip rides the seam end-to-end") {
    val root = tmp() + "/vt"
    import spark.implicits._
    Versioned.overwrite(Seq(1, 2, 3).toDF("n"), root)
    Versioned.overwrite(Seq(4, 5).toDF("n"), root)
    assert(Versioned.currentVersion(root).contains(2L))
    assert(Versioned.read(spark, root).count() == 2L)
    assert(Versioned.readVersion(spark, root, 1L).count() == 3L)
  }

  test("Versioned pointer flip works over a non-file scheme (remote renameOverwrite branch)") {
    // the local pointer flip takes java.nio ATOMIC_MOVE; a scheme-ful
    // path takes the FileContext OVERWRITE branch — exercised nowhere
    // else in the suite. Registered mock store, real dispatch.
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.AbstractFileSystem.mockobj.impl", classOf[MockObjectStoreFs].getName)
    hc.set("fs.mockobj.impl", classOf[MockObjectStoreFileSystem].getName)
    Fs.resetEnvCacheForTests()
    try {
      import spark.implicits._
      val root = s"mockobj:${Files.createTempDirectory("vers_mock")}/vt"
      Versioned.overwrite(Seq(1, 2, 3).toDF("n"), root)
      Versioned.overwrite(Seq(4, 5).toDF("n"), root)
      assert(Versioned.currentVersion(root).contains(2L))
      assert(Versioned.read(spark, root).count() == 2L)
      assert(Versioned.readVersion(spark, root, 1L).count() == 3L)
    } finally {
      hc.unset("fs.AbstractFileSystem.mockobj.impl")
      hc.unset("fs.mockobj.impl")
      Fs.resetEnvCacheForTests()
    }
  }

  test("renameOverwrite falls back to copy+delete across filesystems (EXDEV)") {
    // the bulk-move family (archive/quarantine/landing moves) may cross
    // mounts; before the fallback every such move threw
    // AtomicMoveNotSupportedException (r15 advice, medium)
    val shm = Paths.get("/dev/shm")
    assume(Files.isDirectory(shm) && Files.isWritable(shm))
    val src = Files.createTempFile("fs_xdev", ".txt")
    assume(Files.getFileStore(src) != Files.getFileStore(shm),
      "need two mounts to exercise EXDEV")
    Files.writeString(src, "payload")
    val dstDir = Files.createTempDirectory(shm, "fs_xdev")
    try {
      val dst = dstDir.resolve("moved.txt")
      Fs.renameOverwrite(src.toString, dst.toString)
      assert(Files.readString(dst) == "payload")
      assert(!Files.exists(src), "cross-device move must delete the source")
      // replacing an EXISTING cross-device destination works too
      val src2 = Files.createTempFile("fs_xdev2", ".txt")
      Files.writeString(src2, "payload2")
      Fs.renameOverwrite(src2.toString, dst.toString)
      assert(Files.readString(dst) == "payload2")
      assert(!Files.exists(src2))
    } finally graft.store.Lake.deleteRecursive(dstDir)
  }
}
