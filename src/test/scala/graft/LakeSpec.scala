package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.store.{Lake, Upsert}
import graft.pipeline.Pos

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("K2: date-partitioned write produces hive layout") {
    val root = Files.createTempDirectory("lake").toString
    val df = Seq((1, "2024-07-15"), (2, "2024-07-16"))
      .toDF("id", "d").withColumn("d", to_date($"d"))
    Lake.writeDatePartitioned(df, "d", s"$root/t")
    val dirs = new java.io.File(s"$root/t").listFiles().map(_.getName).filter(_.startsWith("d="))
    assert(dirs.toSet == Set("d=2024-07-15", "d=2024-07-16"))
    assert(spark.read.parquet(s"$root/t").count() == 2)
  }

  test("J4 at rest: atomicOverwrite swaps the table in place") {
    val root = Files.createTempDirectory("lake").toString
    val dest = s"$root/state"
    Lake.atomicOverwrite(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), dest)
    assert(spark.read.parquet(dest).count() == 2)
    val merged = Upsert.replaceOnMatch(
      spark.read.parquet(dest), Seq((2, "b2"), (3, "c")).toDF("k", "v"), Seq("k"))
    Lake.atomicOverwrite(spark, merged, dest)
    val got = spark.read.parquet(dest).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b2"), (3, "c")))
    assert(!Files.exists(Paths.get(dest + ".staging")))
    assert(!Files.exists(Paths.get(dest + ".old")))
  }

  test("compaction: many small files become few, data and partition layout identical") {
    val root = Files.createTempDirectory("compact").toString
    val t = s"$root/t"
    // simulate 12 micro-batch appends -> 12+ files per partition dir
    (0 until 12).foreach { i =>
      Seq((i, s"2024-07-${15 + i % 2}"))
        .toDF("id", "d").withColumn("d", to_date($"d"))
        .write.mode("append").partitionBy("d").parquet(t)
    }
    def parquetFiles(dir: String): Seq[String] = {
      val b = java.nio.file.Files.walk(Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        b.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
      } finally b.close()
    }
    val before = spark.read.parquet(t).orderBy($"id").collect().toSeq
    assert(parquetFiles(t).size >= 12)
    Lake.compact(spark, t, targetRowsPerFile = 1000000L, partitionCols = Seq("d"))
    val afterFiles = parquetFiles(t)
    assert(afterFiles.size <= 4, s"still ${afterFiles.size} files") // ~1 per partition dir
    val after = spark.read.parquet(t).orderBy($"id").collect().toSeq
    assert(after == before) // byte-identical data, hive layout preserved
    val dirs = new java.io.File(t).listFiles().map(_.getName).filter(_.startsWith("d=")).toSet
    assert(dirs == Set("d=2024-07-15", "d=2024-07-16"))
  }

  test("swap crash window: stranded .old backup is restored on the next call") {
    val root = Files.createTempDirectory("swapcrash").toString
    val t = s"$root/t"
    Seq((1, "a"), (2, "b")).toDF("id", "s").write.parquet(t)
    val before = spark.read.parquet(t).orderBy($"id").collect().toSeq
    // simulate a crash between the two moves: table at .old, canonical gone
    Files.move(Paths.get(t), Paths.get(t + ".old"))
    assert(!Files.exists(Paths.get(t)))
    Lake.compact(spark, t) // heals, then compacts
    assert(spark.read.parquet(t).orderBy($"id").collect().toSeq == before)
    assert(!Files.exists(Paths.get(t + ".old")))
  }

  test("data skipping: manifest prunes files for a range read, rows stay exact") {
    val root = Files.createTempDirectory("skip").toString
    val table = s"$root/events"
    // range-partitioned write → each file covers a narrow id band
    spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2)
      .repartitionByRange(8, col("id"))
      .write.parquet(table)
    Lake.writeManifest(spark, table, Seq("id"))
    // manifest is invisible to plain readers (underscore path)
    assert(spark.read.parquet(table).count() == 1000)
    val full = spark.read.parquet(table)
      .filter(col("id") >= 100 && col("id") <= 140)
    val pruned = Lake.readSkipping(spark, table, "id", 100L, 140L)
    assert(pruned.select("id", "v").collect().map(_.toSeq).toSet ==
      full.select("id", "v").collect().map(_.toSeq).toSet)
    // the point: the pruned plan touches strictly fewer files
    assert(pruned.inputFiles.length < spark.read.parquet(table).inputFiles.length,
      s"no files skipped: ${pruned.inputFiles.length}")
    // empty overlap reads nothing and returns schema-compatible empty
    assert(Lake.readSkipping(spark, table, "id", 5000L, 6000L).count() == 0)
  }

  test("data skipping on a hive-partitioned table keeps partition columns") {
    val root = Files.createTempDirectory("skip_hive").toString
    val table = s"$root/events"
    spark.range(0, 1000).toDF("id")
      .withColumn("day", (col("id") / 250).cast("int"))
      .withColumn("v", col("id") * 2)
      .repartitionByRange(8, col("id"))
      .write.partitionBy("day").parquet(table)
    Lake.writeManifest(spark, table, Seq("id", "day"))
    // ranges on the data column AND the partition column: without the
    // basePath option the pruned explicit-file read drops `day` from the
    // schema and the re-applied partition-column filter cannot resolve
    val pruned = Lake.readSkippingRanges(spark, table,
      Seq(("id", 100L, 140L), ("day", 0, 0)))
    val want = spark.read.parquet(table)
      .filter(col("id").between(100, 140) && col("day") === 0)
      .select("id", "day", "v").collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(pruned.select("id", "day", "v").collect().map(_.toSeq).toSet == want)
    assert(pruned.inputFiles.length < spark.read.parquet(table).inputFiles.length,
      s"no files skipped: ${pruned.inputFiles.length}")
  }

  test("zvalue: bit interleave matches hand-computed cases, nulls clamp to 0") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (3L, 2L), (null, 5L)
    ).toDF("a", "b")
    val got = df.select(graft.store.ZOrder.zvalue(col("a"), col("b"), bits = 4))
      .as[Long].collect().toSeq
    // z = Σ a_k·2^(2k) + b_k·2^(2k+1); (null,5): b bits 0 and 2 → 2 + 32
    assert(got == Seq(0L, 1L, 2L, 3L, 14L, 13L, 34L))
  }

  test("z-order + manifest: a 2-D box prunes files a linear layout cannot") {
    val root = Files.createTempDirectory("zorder").toString
    val grid = spark.range(0, 4096).toDF("i")
      .select((col("i") % 64).as("x"), (col("i") / 64).cast("long").as("y"))
    // z-ordered layout: both columns bounded per file
    graft.store.ZOrder.writeZOrdered(grid, s"$root/z", "x", "y", bits = 6, nFiles = 16)
    // linear layout: sorted by x only, same manifest machinery
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$root/linear")
    Lake.writeManifest(spark, s"$root/linear", Seq("x", "y"))
    // box spanning all of x but a thin y band: linear files all overlap
    // (each covers every y), z-order files mostly don't
    val ranges = Seq(("x", 0L, 63L), ("y", 8L, 15L))
    val zRead = Lake.readSkippingRanges(spark, s"$root/z", ranges)
    val linRead = Lake.readSkippingRanges(spark, s"$root/linear", ranges)
    val want = grid.filter(col("y") >= 8 && col("y") <= 15)
      .select("x", "y").collect().map(_.toSeq).toSet
    assert(zRead.select("x", "y").collect().map(_.toSeq).toSet == want)
    assert(linRead.select("x", "y").collect().map(_.toSeq).toSet == want)
    assert(linRead.inputFiles.length == 16, "linear layout cannot skip on y")
    assert(zRead.inputFiles.length * 2 <= linRead.inputFiles.length,
      s"z-order should halve touched files at worst: ${zRead.inputFiles.length} vs ${linRead.inputFiles.length}")
  }

  test("optimize: small files become few z-clustered files; manifest survives the swap") {
    val root = Files.createTempDirectory("optimize").toString
    val table = s"$root/events"
    // simulate streaming appends: 8 unclustered micro-batch files
    val grid = spark.range(0, 4096).toDF("i")
      .select((col("i") % 64).as("x"), (col("i") / 64).cast("long").as("y"))
    for (b <- 0 until 8)
      grid.filter(col("i") % 8 === b).drop("i")
        .coalesce(1).write.mode("append").parquet(table)
    val before = spark.read.parquet(table).inputFiles.length
    Lake.optimize(spark, table, "x", "y", targetRowsPerFile = 1024L, bits = 6)
    val after = spark.read.parquet(table)
    assert(after.inputFiles.length < before, s"${after.inputFiles.length} vs $before")
    assert(after.count() == 4096)
    // the swapped-in manifest prunes a 2-D box (paths are table-relative,
    // so they stayed valid across the rename)
    val pruned = Lake.readSkippingRanges(spark, table,
      Seq(("x", 0L, 15L), ("y", 0L, 15L)))
    assert(pruned.count() == 256)
    assert(pruned.inputFiles.length < after.inputFiles.length,
      s"no pruning after optimize: ${pruned.inputFiles.length}")
  }

  test("K10/E15: archive moves files into date dirs parsed from filename") {
    val root = Files.createTempDirectory("lake").toString
    val f1 = s"$root/pos_20240715_120000.csv"
    val f2 = s"$root/not_a_pos_file.txt"
    Files.writeString(Paths.get(f1), "x")
    Files.writeString(Paths.get(f2), "y")
    val moved = Lake.archiveByFilenameDate(Seq(f1, f2), s"$root/archive")
    assert(moved == Seq(s"$root/archive/2024-07-15/pos_20240715_120000.csv"))
    assert(!Files.exists(Paths.get(f1)))
    assert(Files.exists(Paths.get(f2))) // non-matching files left alone
  }

  test("K8: validation summary JSON drives the downstream branch") {
    val root = Files.createTempDirectory("lake").toString
    val summary = Seq((2L, 1L)).toDF("processed_files", "quarantined_files")
    Lake.writeSummary(summary, s"$root/summary")
    val back = spark.read.json(s"$root/summary")
    assert(back.select("processed_files").as[Long].head() == 2L)
  }

  test("partition-scoped additive merge leaves untouched partition files byte-identical") {
    val root = Files.createTempDirectory("addpart_lake").toString
    val tbl = s"$root/kpi"
    def kpi(rows: Seq[(Int, String, Double)]) = rows.toDF("product_id", "d", "total_sales")
      .select($"product_id", to_date($"d").as("date"), $"total_sales")
    Upsert.additivePartitioned(spark, tbl,
      kpi(Seq((1, "2024-07-01", 10.0), (2, "2024-07-02", 20.0))),
      Seq("product_id"), "total_sales", "date")
    // snapshot the partition the next delta does NOT touch
    def snapshot(dir: String): Map[String, (Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length, f.lastModified))).toMap
    val before = snapshot(s"$tbl/date=2024-07-01")
    Upsert.additivePartitioned(spark, tbl,
      kpi(Seq((2, "2024-07-02", 5.0), (3, "2024-07-02", 7.0))),
      Seq("product_id"), "total_sales", "date")
    // the day-01 partition was never read, never rewritten: same files,
    // same sizes, same mtimes — the per-batch full-table rewrite is gone
    assert(snapshot(s"$tbl/date=2024-07-01") == before)
    val got = spark.read.parquet(tbl)
      .select($"product_id", $"date".cast("string"), $"total_sales")
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "2024-07-01", 10.0), (2, "2024-07-02", 25.0),
      (3, "2024-07-02", 7.0)))
  }

  test("POS batch end-to-end through zones: csv -> validate -> transform -> KPI merge -> archive") {
    val root = Files.createTempDirectory("pos_e2e").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(s"$landing/pos_20240715_120000.csv"),
      "transaction_id,store_id,product_id,quantity,revenue,discount_applied,timestamp\n" +
        "T1,101,2001,2,50.5,0.1,1721033100.0\nT2,102,2001,3,75.0,,1721033200.0\n")
    // validate (P4/P7 record-level gate on the file)
    val raw = Pos.readCsv(spark, landing)
    val required = Seq("transaction_id", "store_id", "product_id", "quantity", "revenue", "timestamp")
    val nullViolations = raw.select(
      required.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*).head()
    assert((0 until nullViolations.length).forall(i => nullViolations.getLong(i) == 0L))
    // transform + KPI
    val (curated, kpi) = Pos.transform(raw)
    Lake.writeDatePartitioned(curated, "date", s"$root/curated")
    Lake.atomicOverwrite(spark, kpi, s"$root/kpi")
    // next-day batch merges additively
    val kpi2 = kpi.withColumn("total_sales", lit(10.0))
    val merged = Upsert.additive(spark.read.parquet(s"$root/kpi"), kpi2,
      Seq("product_id", "date"), "total_sales")
    Lake.atomicOverwrite(spark, merged, s"$root/kpi")
    val total = spark.read.parquet(s"$root/kpi").select("total_sales").as[Double].head()
    assert(math.abs(total - 135.5) < 1e-9) // 125.5 + 10
    // archive
    val moved = Lake.archiveByFilenameDate(
      Seq(s"$landing/pos_20240715_120000.csv"), s"$root/archive")
    assert(moved.size == 1 && Files.exists(Paths.get(moved.head)))
  }

  test("incremental compaction: only small-file-heavy partitions rewrite; cold ones byte-identical") {
    val root = Files.createTempDirectory("compact_inc").toString
    val t = s"$root/t"
    // cold partition: ONE file
    Seq((1, "2024-07-01")).toDF("x", "d")
      .write.partitionBy("d").mode("append").parquet(t)
    // hot partitions: 6 appends of one file each
    for (i <- 1 to 6)
      Seq((10 * i, "2024-07-02"), (100 * i, "2024-07-03")).toDF("x", "d")
        .write.partitionBy("d").mode("append").parquet(t)
    def files(day: String) = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(t, s"d=$day")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, Files.size(p),
          Files.getLastModifiedTime(p).toMillis)).toSet
    }
    val cold = files("2024-07-01")
    assert(files("2024-07-02").size == 6)
    val before = spark.read.parquet(t).as[(Int, String)].collect().toSet
    val compacted = Lake.compactPartitions(spark, t, "d", maxFilesPerPartition = 4)
    assert(compacted == Seq("2024-07-02", "2024-07-03"))
    // hot dirs re-packed to one file, cold dir untouched, data identical
    assert(files("2024-07-02").size == 1, files("2024-07-02").toString)
    assert(files("2024-07-03").size == 1)
    assert(files("2024-07-01") == cold, "cold partition was rewritten")
    assert(spark.read.parquet(t).as[(Int, String)].collect().toSet == before)
    // idempotent: nothing left above the threshold
    assert(Lake.compactPartitions(spark, t, "d", maxFilesPerPartition = 4).isEmpty)
    Lake.deleteRecursive(Paths.get(root))
  }

  test("incremental compaction handles path-escaped partition values") {
    val root = Files.createTempDirectory("compact_esc").toString
    val t = s"$root/t"
    // value with a space and colon: Spark %-escapes it in the dir name;
    // the hot-dir filter must compare against the UNESCAPED column value
    val v = "2024-07-02 10:00"
    for (i <- 1 to 6)
      Seq((i, v)).toDF("x", "k").write.partitionBy("k").mode("append").parquet(t)
    val before = spark.read.parquet(t).as[(Int, String)].collect().toSet
    val compacted = Lake.compactPartitions(spark, t, "k", maxFilesPerPartition = 4)
    assert(compacted == Seq(v), compacted.toString)
    assert(spark.read.parquet(t).as[(Int, String)].collect().toSet == before)
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.walk(Paths.get(t)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(dataFiles == 1, s"expected 1 data file after compaction, found $dataFiles")
    Lake.deleteRecursive(Paths.get(root))
  }

  test("incremental compaction handles null and timestamp partition values") {
    // partition types whose SQL string form differs from the path value
    // form: null → __HIVE_DEFAULT_PARTITION__, timestamps gain :ss in
    // the dir name. The per-dir read-and-overwrite form must actually
    // rewrite them, not report them compacted while matching nothing.
    val root = Files.createTempDirectory("compact_null_ts").toString
    val t = s"$root/t"
    for (i <- 1 to 6)
      Seq((i, Option.empty[String]), (10 * i, Some("2024-07-02 10:00:00")))
        .toDF("x", "k")
        .withColumn("k", $"k".cast("timestamp"))
        .write.partitionBy("k").mode("append").parquet(t)
    val before = spark.read.parquet(t)
      .select($"x", $"k".cast("string")).as[(Int, Option[String])].collect().toSet
    val compacted = Lake.compactPartitions(spark, t, "k", maxFilesPerPartition = 4)
    assert(compacted.size == 2 && compacted.contains("__HIVE_DEFAULT_PARTITION__"),
      compacted.toString)
    assert(spark.read.parquet(t)
      .select($"x", $"k".cast("string")).as[(Int, Option[String])].collect().toSet == before)
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.walk(Paths.get(t)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    assert(dataFiles == 2, s"expected 1 data file per partition dir, found $dataFiles")
    // nothing left above threshold
    assert(Lake.compactPartitions(spark, t, "k", maxFilesPerPartition = 4).isEmpty)
    Lake.deleteRecursive(Paths.get(root))
  }

  test("ORC interchange: partitioned round-trip, predicates pushed to the ORC scan") {
    val root = Files.createTempDirectory("orc_lake").toString
    val df = (0L until 200L).map(i => (i, s"v$i", s"p${i % 4}"))
      .toDF("id", "payload", "part")
    Lake.writeOrcPartitioned(df, "part", s"$root/t")
    val back = Lake.readOrc(spark, s"$root/t")
    // identical data after the format hop (partition col round-trips too)
    assert(back.count() == 200)
    assert(back.select("id", "payload", "part").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq ==
      df.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
    // partition pruning: a part filter reads only that directory's files
    val pruned = back.filter($"part" === "p1")
    assert(pruned.count() == 50)
    val scan = pruned.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 of 4 partitions, scanned ${scan.selectedPartitions.partitionCount}")
    // row-level predicate reaches the ORC scan (PushedFilters non-empty)
    val plan = back.filter($"id" > 100L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)]")
      || plan.contains("GreaterThan(id,100)"), plan.take(800))
  }

  test("registered orc_roundtrip: price predicate pushed to the ORC scan, build memoized") {
    val dir = "/root/testdata/sf0.001"
    val df = Lake.orcRoundtripQuery(spark, dir)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Format: ORC"), plan.take(600))
    assert(plan.contains("GreaterThan(o_totalprice,100000.0)"),
      s"price predicate not pushed to the ORC scan:\n${plan.take(1200)}")
    // the one-off build is memoized: a second invocation rewrites nothing
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val root = scan.relation.location.rootPaths.head.toString
    def listing = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(root.stripPrefix("file:"))).iterator().asScala
        .map(_.toString).toSeq.sorted
    }
    val before = listing
    val nRows = df.count()
    assert(Lake.orcRoundtripQuery(spark, dir).count() == nRows)
    assert(listing == before, "re-invocation rewrote the ORC table")
    // clearCaches drops the ORC scratch table with the other memos
    Engine.clearCaches(spark)
    assert(!Files.exists(Paths.get(root.stripPrefix("file:")).getParent),
      "ORC scratch root survived clearCaches")
    // and the next invocation transparently rebuilds
    assert(Lake.orcRoundtripQuery(spark, dir).count() == nRows)
  }

  test("in-place swap family fails fast under a live sibling writer lock") {
    import spark.implicits._
    val tdir = Files.createTempDirectory("lake_lock").toString + "/t"
    Seq((1, "a")).toDF("k", "v").write.parquet(tdir)
    // a LIVE contender's lock beside the table: the swap must refuse
    // loudly and leave the table untouched
    graft.store.Fs.writeString(tdir + ".lock", "contender@now")
    val ex = intercept[IllegalStateException] {
      Lake.atomicOverwrite(spark, Seq((2, "b")).toDF("k", "v"), tdir)
    }
    assert(ex.getMessage.contains("single-writer"), ex.getMessage)
    assert(spark.read.parquet(tdir).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    // released/removed lock: the swap proceeds; its own lock cleans up
    graft.store.Fs.deleteIfExists(tdir + ".lock")
    Lake.atomicOverwrite(spark, Seq((2, "b")).toDF("k", "v"), tdir)
    assert(spark.read.parquet(tdir).as[(Int, String)].collect().toSeq == Seq((2, "b")))
    assert(!graft.store.Fs.exists(tdir + ".lock"), "sibling lock must release")
  }

  test("catalog table sees newly landed partitions only after re-recoverPartitions (K9 incremental)") {
    // the reference registers each landing batch's partition with Athena
    // DDL (lambda per batch); the Spark-native replacement re-runs ONE
    // recoverPartitions after new hive dirs land. Both directions
    // matter: an unregistered dir must be INVISIBLE to the catalog read
    // (that is what makes registration a consistency boundary), and one
    // recover call must surface it.
    import spark.implicits._
    val root = Files.createTempDirectory("cat_incr").toString
    val t = "graft_cat_incr_t"
    def land(id: Long, day: String): Unit =
      Seq((id, day)).toDF("id", "d").withColumn("d", to_date($"d"))
        .write.mode("append").partitionBy("d").parquet(s"$root/t")
    land(1L, "2024-07-01")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, d DATE) USING PARQUET " +
      s"PARTITIONED BY (d) LOCATION '$root/t'")
    try {
      spark.catalog.recoverPartitions(t)
      assert(spark.table(t).count() == 1)
      land(2L, "2024-07-02")
      assert(spark.table(t).count() == 1,
        "unrecovered partition leaked into the catalog read")
      spark.catalog.recoverPartitions(t)
      assert(spark.table(t).as[(Long, java.sql.Date)].collect().map(_._1).toSet ==
        Set(1L, 2L), "re-recover did not surface the landed partition")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("dir-rename gate: in-place swaps refuse object-store schemes, knob opts back in") {
    import spark.implicits._
    import graft.store.Fs
    // register mockobj as a REAL, functional scheme (local-disk-backed):
    // the refusal below is then provably the gate, not an incidental
    // unknown-scheme resolution error
    spark.sparkContext.hadoopConfiguration.set(
      "fs.AbstractFileSystem.mockobj.impl", classOf[MockObjectStoreFs].getName)
    Fs.resetEnvCacheForTests()
    try {
      val root = Files.createTempDirectory("gate").toString
      Fs.writeString(s"mockobj:$root/probe.txt", "alive")
      assert(Fs.readString(s"mockobj:$root/probe.txt") == "alive",
        "mockobj scheme must be functional through the seam")
      assert(Fs.schemeOf(s"mockobj:$root/t") == "mockobj")
      assert(!Fs.supportsAtomicDirRename(s"mockobj:$root/t"))
      val df = Seq((1, "a")).toDF("k", "v")
      val e1 = intercept[UnsupportedOperationException] {
        Lake.atomicOverwrite(spark, df, s"mockobj:$root/t")
      }
      assert(e1.getMessage.contains("Versioned"), e1.getMessage)
      assert(e1.getMessage.contains("mockobj"), e1.getMessage)
      // the gate trips BEFORE any lock/staging write touches the store
      assert(Fs.list(root).map(_.name).toSet == Set("probe.txt"),
        "refusal must happen before anything is staged")
      intercept[UnsupportedOperationException] {
        Lake.compact(spark, s"mockobj:$root/t")
      }
      intercept[UnsupportedOperationException] {
        Lake.optimize(spark, s"mockobj:$root/t", "a", "b")
      }
      // a maintenance pass with nothing to do keeps its silent `false`
      // even on the object-store scheme (missing table here) — only a
      // pass that would actually move data refuses
      assert(!graft.stream.MicroBatch.compactLedgeredTable(
        spark, s"mockobj:$root/t", s"$root/state"))
      locally {
        import graft.store.Versioned
        // fabricate a ledgered table with one foldable partition and an
        // hwm snapshot: now the pass WOULD move data, so it refuses loudly
        val t = s"$root/hashes"
        Files.createDirectories(Paths.get(s"$t/src_file=b1.jsonl"))
        Versioned.overwrite(
          Seq(("hwm", "b1.jsonl", 0L)).toDF("kind", "k", "n"), s"$root/state")
        val e3 = intercept[UnsupportedOperationException] {
          graft.stream.MicroBatch.compactLedgeredTable(
            spark, s"mockobj:$t", s"$root/state")
        }
        assert(e3.getMessage.contains("compactLedgeredTable") &&
          e3.getMessage.contains("mockobj"), e3.getMessage)
      }
      // never-registered object-store schemes refuse cleanly too — the
      // gate is URI-string work, no connector needed (the real s3a case:
      // no hadoop-aws jar in this env)
      assert(!Fs.supportsAtomicDirRename("s3a://bucket/table"))
      val e2 = intercept[UnsupportedOperationException] {
        Lake.atomicOverwrite(spark, df, "s3a://bucket/table")
      }
      assert(e2.getMessage.contains("s3a"), e2.getMessage)
      // knob: a store whose dir rename is known atomic opts back in
      sys.props("graft.fs.atomicDirRenameSchemes") = "ofs, mockobj"
      try {
        assert(Fs.supportsAtomicDirRename(s"mockobj:$root/t"))
        Fs.requireAtomicDirRename(s"mockobj:$root/t", "test") // must not throw
      } finally sys.props.remove("graft.fs.atomicDirRenameSchemes")
      // the atomic schemes are untouched by the gate
      assert(Fs.supportsAtomicDirRename(root))
      assert(Fs.supportsAtomicDirRename("hdfs://nn:8020/warehouse/t"))
      assert(Fs.supportsAtomicDirRename("viewfs://cluster/warehouse/t"))
    } finally {
      spark.sparkContext.hadoopConfiguration.unset("fs.AbstractFileSystem.mockobj.impl")
      Fs.resetEnvCacheForTests()
    }
  }

  test("with the knob, the whole swap path runs end-to-end on a non-file scheme") {
    import spark.implicits._
    import graft.store.Fs
    // deployability proof beyond the gate: Spark's parquet writes, the
    // sibling lock's exclusive create, and every FileContext rename in
    // atomicOverwrite all resolve through the registered scheme — the
    // same dispatch a real hdfs:// deployment takes, driven against the
    // local-disk-backed mock store
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.AbstractFileSystem.mockobj.impl", classOf[MockObjectStoreFs].getName)
    hc.set("fs.mockobj.impl", classOf[MockObjectStoreFileSystem].getName)
    Fs.resetEnvCacheForTests()
    sys.props("graft.fs.atomicDirRenameSchemes") = "mockobj"
    try {
      val root = Files.createTempDirectory("gate_knob").toString
      val dest = s"mockobj:$root/t"
      Lake.atomicOverwrite(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), dest)
      assert(spark.read.parquet(dest).count() == 2)
      // second overwrite exercises the existing-table swap (backup move,
      // staged move, backup delete) on the mock scheme
      Lake.atomicOverwrite(spark, Seq((2, "b2"), (3, "c")).toDF("k", "v"), dest)
      val got = spark.read.parquet(dest).as[(Int, String)].collect().toSet
      assert(got == Set((2, "b2"), (3, "c")))
      assert(!Fs.exists(s"$dest.staging") && !Fs.exists(s"$dest.old"))
      assert(!Fs.exists(s"$dest.lock"), "sibling lock must release on the mock scheme")
    } finally {
      sys.props.remove("graft.fs.atomicDirRenameSchemes")
      hc.unset("fs.AbstractFileSystem.mockobj.impl")
      hc.unset("fs.mockobj.impl")
      Fs.resetEnvCacheForTests()
    }
  }
}
