package graft.stream

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.Tables
import graft.store.{Lake, Snapshot, Versioned}

/** The streaming state tables, deterministically replayed through the
  * CORRECTNESS gate (SURVEY.md §2.9 T2/T4/T5 — the at-rest side).
  *
  * The streaming operators' specs prove replay/idempotence/cross-batch
  * mechanics, but the tables `kpiIngestStream` and `scd2IngestStream`
  * PRODUCE never reached the driver's oracle. Here both streams run
  * over fixed landing batches derived from the synthetic tables, and
  * the resulting at-rest state is registered as ordinary batch queries
  * whose DuckDB oracles compute the same fold declaratively:
  *
  *  - `stream_kpi_state`: the additive per-partition merge (ref
  *    transfom_pos.py:140-152 — total = target + source) over 7
  *    year-sliced landing files, 2 files per micro-batch. The fold is
  *    order-free BY CONSTRUCTION: months are disjoint across year
  *    slices and the measure is a BIGINT sum, so any batch composition
  *    yields the bit-identical table the oracle computes in one GROUP
  *    BY — which is exactly the property that makes the merge additive.
  *  - `stream_scd2_state`: the Type-2 close-and-reopen fold over
  *    quarter-granular dimension-change events (one landing file per
  *    year, one file per micro-batch, mtime-ordered so event time
  *    ascends across batches — the in-order delivery the declarative
  *    form assumes; out-of-order delivery is the monotonic guard's
  *    job, proven in StreamingSpec). The oracle derives the identical
  *    history with LAG/LEAD change-point windows: a row opens where
  *    the attribute tuple differs from the key's previous event and
  *    closes at the key's next change point.
  *
  * Build cost is paid once per (session, source-dir, source
  * fingerprint) — the ORC/bucketed/IVF memo discipline — so repeated
  * invocations (bench passes) read the already-built tables.
  */
object StreamReplay {

  private val KpiFilesPerTrigger = 2
  private val Scd2FromYear = 1995

  private val kpiSchema = StructType(Seq(
    StructField("product_id", LongType),
    StructField("sale_ym", LongType),
    StructField("total_qty", LongType)))

  private val scd2Schema = StructType(Seq(
    StructField("cust_id", LongType),
    StructField("effective_day", LongType),
    StructField("status", StringType),
    StructField("priority", StringType)))

  // ---- scratch memo (per session × source dir × source fingerprint) ------
  //
  // Two layers. In-JVM: a TrieMap memo, as every other session-scoped
  // build. Cross-JVM: the built root is PERSISTED content-addressed by
  // (source fingerprint, compiled-code fingerprint) under
  // /tmp/graft_replay_cache — within one round the driver's verify run,
  // the bench run, and any chunked sweep are separate JVMs over the SAME
  // classes dir and testdata, so each used to pay the full ~15-25 s
  // 9-family streaming build on its first stream_* query; now only the
  // first JVM builds and the rest adopt. Staleness is structural, not
  // TTL'd: any recompile changes the classes-tree fingerprint and any
  // testdata rewrite changes the source fingerprint, so a cache entry
  // can only ever be adopted by the code+data that built it. A crashed
  // build never publishes (the `_COMPLETE`-marked dir is renamed into
  // place only after every family finished). Opt out with
  // SPARK_GRAFT_REPLAY_CACHE=0 (falls back to per-JVM temp roots).

  private val built =
    scala.collection.concurrent.TrieMap.empty[SparkSession, (String, Long, String, Boolean)]

  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      built.values.foreach { case (_, _, root, owned) =>
        if (owned) Lake.deleteRecursive(Paths.get(root))
      }))

  private[graft] def clearReplayCache(spark: SparkSession): Unit =
    built.remove(spark).foreach { case (_, _, root, owned) =>
      if (owned) Lake.deleteRecursive(Paths.get(root))
    }

  private def sourceFingerprint(dir: String): Long =
    (((Snapshot.fingerprint(dir, "lineitem.parquet") * 1000003L ^
      Snapshot.fingerprint(dir, "orders.parquet")) * 1000003L ^
      Snapshot.fingerprint(dir, "documents.parquet")) * 1000003L ^
      Snapshot.fingerprint(dir, "customer.parquet")) * 1000003L ^
      Snapshot.fingerprint(dir, "events.parquet")

  /** Fingerprint of the compiled `graft` classes (or the enclosing jar):
    * name × size × mtime over the tree, the same signal
    * `Snapshot.fingerprint` uses for data. Any `sbt compile` touches the
    * class files, so cross-JVM reuse is only possible between runs of
    * the IDENTICAL build — the property that makes persisting streaming
    * state safe at all.
    */
  private def codeFingerprint(): Option[Long] = {
    // getCodeSource (or its location) is null under some classloaders
    // (bundled/boot-classpath launchers); no code identity means no safe
    // cross-JVM cache key, so callers fall back to a per-JVM temp root
    // instead of NPE-ing every stream_* query (r15 advice).
    val locOpt = for {
      pd  <- Option(MicroBatch.getClass.getProtectionDomain)
      cs  <- Option(pd.getCodeSource)
      loc <- Option(cs.getLocation)
    } yield loc
    locOpt.map(loc => codeFingerprintAt(Paths.get(loc.toURI)))
  }

  private def codeFingerprintAt(base: Path): Long = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(base)) {
      // classes dir (plain JVM / tests): RELATIVE path + size + mtime —
      // mtimes only move on recompile, which is exactly the staleness
      // signal wanted
      val root = base.resolve("graft")
      if (!Files.exists(root)) return 0L
      Files.walk(root).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => (base.relativize(p).toString.hashCode.toLong * 1000003L)
          ^ Files.size(p)
          ^ java.lang.Long.rotateLeft(Files.getLastModifiedTime(p).toMillis, 17))
        .foldLeft(31L)(_ ^ _)
    } else {
      // jar: `sbt runMain` repackages the SAME classes into a jar under
      // a RANDOM per-run target/bg-jobs path, so neither the jar path
      // nor its mtime is usable — fingerprint entry name + size + CRC
      // (content-derived, central-directory read only), which is
      // identical across repackagings of unchanged code
      val zf = new java.util.zip.ZipFile(base.toFile)
      try zf.entries().asScala
        .filter(e => !e.isDirectory && e.getName.startsWith("graft/"))
        .map(e => (e.getName.hashCode.toLong * 1000003L)
          ^ e.getSize ^ java.lang.Long.rotateLeft(e.getCrc, 17))
        .foldLeft(31L)(_ ^ _)
      finally zf.close()
    }
  }

  private def cacheEnabled: Boolean =
    sys.props.get("graft.replay.cache")
      .orElse(sys.env.get("SPARK_GRAFT_REPLAY_CACHE"))
      .forall(_ != "0")

  /** Test hook: drop the in-JVM memo AND the persisted entry for `dir`,
    * so the next query provably re-runs the full streaming build (the
    * rebuild-determinism property needs a real rebuild to test — with
    * the persistent cache, `clearReplayCache` alone just re-adopts).
    */
  private[graft] def dropPersistentCache(spark: SparkSession, dir: String): Unit = {
    clearReplayCache(spark)
    codeFingerprint().foreach { cfp =>
      val key = f"r_${sourceFingerprint(dir)}%016x_${cfp}%016x"
      Lake.deleteRecursive(cacheBase.resolve(key))
    }
  }

  private def cacheBase: Path =
    Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_replay_cache")

  private def replayRoot(spark: SparkSession, dir: String): String = {
    val fp = sourceFingerprint(dir)
    built.get(spark) match {
      case Some((d, f, root, owned)) if d == dir && f == fp =>
        // a hit on an ADOPTED (shared-cache) root refreshes its mtime so
        // the 24h reap tests last USE, not adoption time: a session
        // querying the same root for >24h must not lose it to a
        // concurrent builder's cleanup mid-session (r15 advice)
        if (!owned)
          try Files.setLastModifiedTime(Paths.get(root),
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: java.io.IOException => () }
        root
      case stale =>
        stale.foreach { case (_, _, old, owned) =>
          if (owned) Lake.deleteRecursive(Paths.get(old)) }
        exitHook
        // no code identity (null code source under bundled/boot
        // classloaders) → no safe cross-JVM key → per-JVM temp root
        val codeFp = codeFingerprint()
        val useCache = cacheEnabled && codeFp.isDefined
        val key = f"r_${fp}%016x_${codeFp.getOrElse(0L)}%016x"
        val cached = cacheBase.resolve(key)
        if (useCache && Files.exists(cached.resolve("_COMPLETE"))) {
          Console.err.println(s"[stream-replay] adopting cached root $cached")
          // bump the root's mtime: the 24h reap below must test LAST USE,
          // not build time, or a long-lived adopter could lose its root
          // to another JVM's cleanup mid-session
          try Files.setLastModifiedTime(cached,
            java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case _: java.io.IOException => () }
          built(spark) = (dir, fp, cached.toString, false)
          return cached.toString
        }
        val root =
          if (useCache) {
            Files.createDirectories(cacheBase)
            // reap: any sibling is stale by construction (different code
            // or data) once old enough that no concurrent JVM still reads
            // it (adoption refreshes the mtime above); crashed builds
            // leave .building dirs reaped the same way. Per-entry Try:
            // a concurrent reaper may delete between list and stat.
            Lake.listDir(cacheBase).foreach { p =>
              scala.util.Try {
                if (Files.getLastModifiedTime(p).toMillis <
                    System.currentTimeMillis() - 24L * 3600 * 1000)
                  Lake.deleteRecursive(p)
              }
            }
            Files.createTempDirectory(cacheBase, s"$key.building.").toString
          } else Files.createTempDirectory("graft_stream").toString
        // The 7 state families are fully independent — disjoint landing
        // dirs, checkpoints, and output tables — and each one's cost is
        // dominated by per-micro-batch FIXED overhead (trigger waits,
        // tiny sequential jobs), not data volume. Building them
        // CONCURRENTLY overlaps those idle gaps, so the whole replay
        // build (which lands on the first stream_* query's cold pass)
        // costs ~the slowest family instead of the sum. Measured at
        // sf0.1: 68s sequential → bounded by scd2's ~26s. Determinism is
        // untouched: batch ORDER only matters WITHIN a family's landing
        // dir (mtime-stamped there), never across families.
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(9)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        def timed(name: String)(f: => Unit): Future[Unit] = Future {
          val t0 = System.nanoTime()
          f
          Console.err.println(
            f"[stream-replay] $name built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
        }
        val builds = Seq(
          timed("kpi")(buildKpi(spark, dir, root)),
          timed("scd2")(buildScd2(spark, dir, root)),
          timed("quality")(buildQualityCorpus(spark, dir, root)),
          timed("er")(buildEr(spark, dir, root)),
          timed("sessions")(buildSessions(spark, dir, root)),
          timed("mg")(buildMgState(spark, dir, root)),
          timed("triangles")(buildTriangles(spark, dir, root)),
          timed("video")(buildVideoScenes(spark, dir, root)),
          timed("dhash")(buildImageHashes(spark, dir, root)))
        // On a family failure, fail the whole memo — but only after EVERY
        // builder has stopped: a fail-fast Await(Future.sequence) would
        // leave the other six still streaming under a root that `built`
        // never records (so neither clearReplayCache nor the exit hook
        // deletes it), and a retry would then race the strays against a
        // second root. Await each future to completion, then delete the
        // half-built root before rethrowing so retries start clean.
        val outcomes =
          try builds.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
          finally pool.shutdown()
        outcomes.collectFirst { case scala.util.Failure(e) => e }.foreach { e =>
          Lake.deleteRecursive(Paths.get(root))
          throw e
        }
        if (useCache) {
          // publish: mark complete INSIDE the staging dir, then one
          // rename — a crash before the rename leaves only a .building
          // dir (reaped above); losing the rename race to a concurrent
          // builder just means adopting theirs
          Files.write(Paths.get(root, "_COMPLETE"), Array.emptyByteArray)
          try {
            Files.move(Paths.get(root), cached)
            built(spark) = (dir, fp, cached.toString, false)
            cached.toString
          } catch {
            case _: java.nio.file.FileAlreadyExistsException
                 | _: java.nio.file.DirectoryNotEmptyException =>
              Lake.deleteRecursive(Paths.get(root))
              built(spark) = (dir, fp, cached.toString, false)
              cached.toString
          }
        } else {
          built(spark) = (dir, fp, root, true)
          root
        }
    }
  }

  /** Move a one-file JSON write to `dest` and stamp its mtime — the file
    * source orders pending files by modification time, so explicit,
    * strictly increasing stamps make the replay's batch ORDER (not just
    * its content) deterministic across filesystems and build speeds.
    */
  private def writeLandingFile(df: DataFrame, dest: Path, mtimeMillis: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmpdir")
    df.coalesce(1).write.mode("overwrite").json(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".json"))
      .getOrElse(throw new IllegalStateException(s"no json part file under $tmp"))
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Lake.deleteRecursive(tmp)
    Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(mtimeMillis))
  }

  /** Year-sliced landing files → `kpiIngestStream` → partitioned KPI
    * table. BIGINT quantities (not the double revenue) keep every
    * per-month sum exact, so the additive fold is bit-reproducible
    * under ANY batch composition.
    */
  private def buildKpi(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "kpi_landing")
    Files.createDirectories(landing)
    val li = Tables.lineitem(spark, dir)
      .select(
        col("l_partkey").as("product_id"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("sale_ym"),
        col("l_quantity").cast("long").as("total_qty"))
      .localCheckpoint() // one lineitem scan feeds every year slice
    val years = li.select((col("sale_ym") / 100).cast("int").as("y")).distinct()
      .collect().map(_.getInt(0)).sorted
    val base = System.currentTimeMillis() - (years.length + 2) * 2000L
    years.zipWithIndex.foreach { case (y, i) =>
      writeLandingFile(
        li.filter((col("sale_ym") / 100).cast("int") === y),
        landing.resolve(f"kpi_$y%04d.json"), base + i * 2000L)
    }
    li.unpersist(blocking = false)
    MicroBatch.runToCompletion(MicroBatch.kpiIngestStream(
      spark, landing.toString, kpiSchema,
      keys = Seq("product_id"), valueCol = "total_qty", partitionCol = "sale_ym",
      tableDir = s"$root/kpi_table", checkpointDir = s"$root/kpi_ckpt",
      maxFilesPerTrigger = KpiFilesPerTrigger))
  }

  /** Quarter-granular dimension-change events (one row per (customer,
    * quarter): attribute tuple aggregated deterministically), one
    * landing file per year, one file per batch, ascending mtimes →
    * `scd2IngestStream` → versioned Type-2 history.
    */
  private def buildScd2(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "scd2_landing")
    Files.createDirectories(landing)
    val ev = Tables.orders(spark, dir)
      .filter(pmod(col("o_custkey"), lit(5L)) === 2 &&
        year(col("o_orderdate")) >= Scd2FromYear)
      .groupBy(col("o_custkey").as("cust_id"),
        expr("CAST(year(o_orderdate)*4 + (month(o_orderdate)-1) div 3 AS BIGINT)")
          .as("effective_day"))
      .agg(max(col("o_orderstatus")).as("status"),
        min(col("o_orderpriority")).as("priority"))
      .localCheckpoint() // one orders scan feeds every year slice
    val years = ev.select(expr("effective_day div 4").cast("int").as("y")).distinct()
      .collect().map(_.getInt(0)).sorted
    val base = System.currentTimeMillis() - (years.length + 2) * 2000L
    years.zipWithIndex.foreach { case (y, i) =>
      writeLandingFile(
        ev.filter(expr("effective_day div 4").cast("int") === y),
        landing.resolve(f"scd2_$y%04d.json"), base + i * 2000L)
    }
    ev.unpersist(blocking = false)
    MicroBatch.runToCompletion(MicroBatch.scd2IngestStream(
      spark, landing.toString, scd2Schema,
      keyCol = "cust_id", compareCols = Seq("status", "priority"),
      tableDir = s"$root/scd2_table", checkpointDir = s"$root/scd2_ckpt",
      maxFilesPerTrigger = 1))
  }

  /** Documents land as JSONL → `qualityGatedIngestStream` → the Gopher
    * gate decides per micro-batch which enter the training corpus. The
    * gate is a pure per-document function and the corpus guard is a
    * per-id anti-join, so the accepted set is batching-invariant — the
    * declarative restatement of the rules IS the corpus.
    */
  private def buildQualityCorpus(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = s"$root/quality_landing"
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(4, pmod(col("doc_id"), lit(4L)))
      .write.json(landing)
    MicroBatch.runToCompletion(MicroBatch.qualityGatedIngestStream(
      spark, landing,
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))),
      textCol = "text", idCol = "doc_id",
      corpusDir = s"$root/quality_corpus",
      rejectDir = s"$root/quality_reject",
      checkpointDir = s"$root/quality_ckpt"))
  }

  /** Arrival records (the typo'd-twin + prospect rig shared with the
    * batch `er_incremental` query) land in 4 mtime-ordered files, one
    * per micro-batch → `erIngestStream` links them against the seeded
    * customer master. The verdict is a pure per-record function of
    * (arrival, governed master), so the at-rest link and pending
    * tables are batching-invariant — gated by the SAME declarative
    * oracle as the batch twin.
    */
  private def buildEr(spark: SparkSession, dir: String, root: String): Unit = {
    import graft.ops.Linkage
    val landing = Paths.get(root, "er_landing")
    Files.createDirectories(landing)
    Linkage.customerMaster(spark, dir)
      .write.mode("overwrite").parquet(s"$root/er_master")
    val arrivals = Linkage.customerArrivals(spark, dir).localCheckpoint()
    val base = System.currentTimeMillis() - 6 * 2000L
    (0 until 4).foreach { s =>
      // slice on id div 40: twin ids are ≡0 and prospect ids ≡1 mod 40,
      // so a mod-4 split on the RAW id would put every twin in file 0
      // and every prospect in file 1 (two homogeneous batches, two empty
      // files); div-40 interleaves both kinds through all 4 batches
      writeLandingFile(
        arrivals.filter(pmod(expr("id div 40"), lit(4L)) === s),
        landing.resolve(f"arrivals_$s%02d.json"), base + s * 2000L)
    }
    arrivals.unpersist(blocking = false)
    MicroBatch.runToCompletion(MicroBatch.erIngestStream(
      spark, landing.toString, erSchema,
      masterDir = s"$root/er_master",
      matchesDir = s"$root/er_matches",
      pendingDir = s"$root/er_pending",
      checkpointDir = s"$root/er_ckpt"))
  }

  private val erSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("seg", StringType)))

  private val sessionSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("ts_us", LongType)))

  /** Events in six contiguous event-time slices, ascending mtimes, one
    * file per micro-batch → `sessionIngestStream`. Slicing is by
    * ABSOLUTE timestamp position inside the corpus's [min, max] span —
    * not calendar day-of-month, which silently dropped a day-31 and
    * interleaved out-of-order under a multi-month fixture — so the
    * landing provably partitions the corpus (asserted below) and
    * satisfies the stream's in-order contract (each user's events
    * ascend across batches) for ANY time span. 30-min sessions
    * straddling a slice boundary exercise the open-session merge on
    * every boundary — the final closed ∪ open table must still equal
    * the batch window fold, which is what the oracle states.
    */
  private def buildSessions(spark: SparkSession, dir: String, root: String): Unit = {
    import spark.implicits._
    val landing = Paths.get(root, "sess_landing")
    Files.createDirectories(landing)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .localCheckpoint() // one events scan feeds every slice
    val (lo, hi, total) = ev.agg(min("ts_us"), max("ts_us"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    // floor((ts-lo)·6/span) ∈ [0,6) for every ts in [lo,hi]: the six
    // slices are exhaustive and disjoint BY CONSTRUCTION; the count
    // assert turns any future regression into a loud build failure
    // instead of a silently thinner stream
    val span = hi - lo + 1
    val slice = floor((col("ts_us") - lit(lo)) * lit(6L) / lit(span))
    val base = System.currentTimeMillis() - 8 * 2000L
    val written = (0 until 6).map { s =>
      val rows = ev.filter(slice === s)
      writeLandingFile(rows, landing.resolve(f"sess_$s%02d.json"), base + s * 2000L)
      rows.count()
    }.sum
    require(written == total,
      s"session landing slices must partition the events corpus: $written != $total")
    graft.store.Checkpoints.free(ev)
    MicroBatch.runToCompletion(MicroBatch.sessionIngestStream(
      spark, landing.toString, sessionSchema,
      gapUs = 30L * 60 * 1000000,
      openDir = s"$root/sess_open", closedDir = s"$root/sess_closed",
      checkpointDir = s"$root/sess_ckpt",
      maxFilesPerTrigger = 1))
  }

  /** Documents in four id-sliced JSONL files, one per micro-batch →
    * `mgIngestStream` folds the Misra-Gries frequent-terms state across
    * batches (k = 128). The state content is merge-order-dependent IN
    * GENERAL, but the retention guarantee is not: every ≥ 1% token
    * survives any batch composition, so the downstream exact recount —
    * which is what the oracle gates — is batching-invariant.
    */
  private def buildMgState(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "mg_landing")
    Files.createDirectories(landing)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val base = System.currentTimeMillis() - 6 * 2000L
    (0 until 4).foreach { s =>
      writeLandingFile(
        docs.filter(pmod(col("doc_id"), lit(4L)) === s),
        landing.resolve(f"mg_$s%02d.json"), base + s * 2000L)
    }
    docs.unpersist(blocking = false)
    MicroBatch.runToCompletion(MicroBatch.mgIngestStream(
      spark, landing.toString,
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))),
      textCol = "text", k = 128,
      stateDir = s"$root/mg_state", checkpointDir = s"$root/mg_ckpt"))
  }

  /** Exact ≥1% frequent terms from the STREAM-MAINTAINED sketch state:
    * candidates are the at-rest summary's tokens, the recount is exact
    * over the same corpus the stream ingested. A green hash proves the
    * cross-batch merge rule retained every qualifying token — the
    * mergeable-summaries guarantee, enforced by the driver's gate.
    */
  def mgFrequentQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    val candidates = Versioned.read(spark, s"$root/mg_state")
      .filter(col("kind") === "cnt").select(col("token"))
    val toks = Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .localCheckpoint()
    val total = toks.count()
    val out = toks.join(candidates, Seq("token"), "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") * lit(100L) >= lit(total))
      .orderBy(col("n").desc, col("token"))
      .localCheckpoint() // bounded result; the token scratch is released
    toks.unpersist(blocking = false)
    out
  }

  /** Part-sampled lineitem rows in four BASKET-sliced files (slicing on
    * l_orderkey keeps each order's items together — a split basket
    * would lose its cross-file pairs), ascending mtimes →
    * `triangleIngestStream` maintains the triangle counter
    * incrementally. The oracle recounts from scratch, so a green hash
    * proves the per-batch delta algebra (smallest-new-edge attribution)
    * sums to the true count — incremental view maintenance, gated.
    */
  private def buildTriangles(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "tri_landing")
    Files.createDirectories(landing)
    val li = Tables.lineitem(spark, dir)
      .filter(pmod(col("l_partkey"), lit(4L)) === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .localCheckpoint()
    val base = System.currentTimeMillis() - 6 * 2000L
    (0 until 4).foreach { s =>
      writeLandingFile(
        li.filter(pmod(col("o"), lit(4L)) === s),
        landing.resolve(f"tri_$s%02d.json"), base + s * 2000L)
    }
    li.unpersist(blocking = false)
    MicroBatch.runToCompletion(MicroBatch.triangleIngestStream(
      spark, landing.toString,
      StructType(Seq(StructField("o", LongType), StructField("p", LongType))),
      edgesDir = s"$root/tri_edges", stateDir = s"$root/tri_state",
      checkpointDir = s"$root/tri_ckpt"))
  }

  /** Scene-structured synthetic AVIs (real RIFF containers, incl. the
    * planted corrupt payloads) land base64 in four id-sliced JSONL
    * files, one per micro-batch → `videoIngestStream` demuxes each
    * batch once and maintains the shot-boundary index + corrupt counter
    * at rest. The oracle restates the scene lattice declaratively —
    * the same SQL that gates the batch detector gates the streamed
    * index (stream ≡ batch).
    */
  private def buildVideoScenes(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "video_landing")
    Files.createDirectories(landing)
    val vids = graft.llm.Multimodal.syntheticSceneVideos(spark, dir).toDF()
      .select(col("media_id"), base64(col("payload")).as("payload_b64"))
      .localCheckpoint()
    val base = System.currentTimeMillis() - 6 * 2000L
    (0 until 4).foreach { s =>
      writeLandingFile(
        vids.filter(pmod(col("media_id"), lit(4L)) === s),
        landing.resolve(f"video_$s%02d.json"), base + s * 2000L)
    }
    graft.store.Checkpoints.free(vids)
    MicroBatch.runToCompletion(MicroBatch.videoIngestStream(
      spark, landing.toString,
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload_b64", StringType))),
      scenesDir = s"$root/video_scenes", stateDir = s"$root/video_state",
      checkpointDir = s"$root/video_ckpt"))
  }

  /** The dHash corpus (originals + planted brightness variants, incl.
    * corrupt payloads) lands base64 in four id-sliced JSONL files, one
    * per micro-batch → `imageIngestStream` maintains the at-rest hash
    * table and the incremental near-dup pair table. A variant shares
    * its original's pmod slice (10⁹ ≡ 0 mod 4), so planted pairs
    * exercise the within-batch half; cross-slice accidental structure
    * exercises the new×ledgered half. The oracles are LITERALLY the
    * batch detector's — every pair surfaces exactly once, in the batch
    * where its later member lands, so the streamed union equals the
    * batch answer under any batching.
    */
  private def buildImageHashes(spark: SparkSession, dir: String, root: String): Unit = {
    val landing = Paths.get(root, "dhash_landing")
    Files.createDirectories(landing)
    val imgs = graft.llm.Multimodal.syntheticImagesForDHash(spark, dir).toDF()
      .select(col("media_id"), base64(col("payload")).as("payload_b64"))
      .localCheckpoint()
    val base = System.currentTimeMillis() - 6 * 2000L
    (0 until 4).foreach { s =>
      writeLandingFile(
        imgs.filter(pmod(col("media_id"), lit(4L)) === s),
        landing.resolve(f"dhash_$s%02d.json"), base + s * 2000L)
    }
    graft.store.Checkpoints.free(imgs)
    MicroBatch.runToCompletion(MicroBatch.imageIngestStream(
      spark, landing.toString,
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload_b64", StringType))),
      hashesDir = s"$root/dhash_hashes", pairsDir = s"$root/dhash_pairs",
      stateDir = s"$root/dhash_state", checkpointDir = s"$root/dhash_ckpt"))
  }

  /** The streamed hash table at rest, ledger-enforced. */
  def imageHashesQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.readImageHashes(spark, s"$root/dhash_hashes", s"$root/dhash_state")
      .orderBy(col("media_id"))
  }

  /** The incrementally streamed near-dup pair table at rest. */
  def imageNearDupStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.readImagePairs(spark, s"$root/dhash_pairs", s"$root/dhash_state")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The streamed shot-boundary index at rest, ledger-enforced. */
  def videoScenesQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.readSceneIndex(spark, s"$root/video_scenes", s"$root/video_state")
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** The exactly-once corrupt-payload counter from the snapshot. */
  def videoCorruptQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    Versioned.read(spark, s"$root/video_state")
      .filter(col("kind") === "corrupt")
      .select(col("n").as("n_corrupt"))
  }

  /** The incrementally-maintained counter + the at-rest edge table
    * size, read back from the snapshot.
    */
  def graphTrianglesQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    val snap = Versioned.read(spark, s"$root/tri_state")
    // the ledger is compacted behind a high-watermark, so "ledgered"
    // is a predicate (hwm + frontier rows + consolidation blessing),
    // not a joinable row set — read through the stream's own shared
    // visibility rule (ledger complement, bounded by one crashed batch)
    val snapRows = snap.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toIndexedSeq
    val nEdges = MicroBatch.visibleLedgered(spark, s"$root/tri_edges", snapRows)
      .map(_.select(col("a"), col("b")).distinct().count()).getOrElse(0L)
    val nTri = snap.filter(col("kind") === "cnt").select(col("n"))
      .head().getLong(0)
    import spark.implicits._
    Seq((nEdges, nTri)).toDF("n_edges", "n_triangles")
  }

  // ---- registered queries -------------------------------------------------

  /** The KPI table the stream maintained, read back at rest. */
  def kpiStateQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${replayRoot(spark, dir)}/kpi_table")
      .select(col("product_id"),
        // hive partition inference types "199201" as INT; cast is a no-op
        // there and pins the schema if inference rules ever shift
        col("sale_ym").cast("int").as("sale_ym"),
        col("total_qty"))
      .orderBy(col("product_id"), col("sale_ym"))

  /** The Type-2 history the stream maintained, via the versioned pointer. */
  def scd2StateQuery(spark: SparkSession, dir: String): DataFrame =
    Versioned.read(spark, s"${replayRoot(spark, dir)}/scd2_table")
      .select(col("cust_id"), col("status"), col("priority"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("cust_id"), col("valid_from"))

  /** The quality-gated corpus the stream admitted, read back at rest
    * (doc_id + char length — enough to prove id selection AND that the
    * text itself survived the JSON → gate → parquet hop intact).
    */
  def qualityCorpusQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${replayRoot(spark, dir)}/quality_corpus")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  /** Every session the stream produced: the closed table plus the
    * still-open rows (real sessions, just not yet known-closed —
    * exactly the rows the batch operator also emits for each user's
    * last activity).
    */
  def sessionsQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    val cols = Seq(col("user_id"), col("session_idx"), col("n_events"),
      col("start_us").as("session_start_us"), col("end_us").as("session_end_us"))
    spark.read.parquet(s"$root/sess_closed").select(cols: _*)
      .unionByName(Versioned.read(spark, s"$root/sess_open").select(cols: _*))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** The link table the stream maintained, read back at rest. */
  def erMatchesQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${replayRoot(spark, dir)}/er_matches")
      .orderBy(col("new_id"), col("master_custkey"))

  /** The stewardship queue: arrivals that linked to nothing. */
  def erPendingQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"${replayRoot(spark, dir)}/er_pending")
      .select(col("id"), col("name"), col("seg"))
      .orderBy(col("id"))

  /** The scene index read back AFTER at-rest consolidation
    * (`MicroBatch.compactLedgeredTable` folds every retired per-file
    * partition into one blessed `_retired:<hwm>` dir) — registered
    * against LITERALLY the uncompacted query's oracle, so the driver's
    * hash gate re-proves every round that consolidation is
    * content-invariant. First call pays the one-time fold; later calls
    * fast-path out (nothing new behind the watermark).
    */
  def videoScenesCompactedQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.compactLedgeredTable(spark, s"$root/video_scenes", s"$root/video_state")
    videoScenesQuery(spark, dir)
  }

  /** Triangle counter + edge census with the edge table consolidated —
    * the incremental delta algebra and the ledger visibility rule must
    * both survive the layout change (same oracle as the uncompacted
    * query).
    */
  def graphTrianglesCompactedQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.compactLedgeredTable(spark, s"$root/tri_edges", s"$root/tri_state")
    graphTrianglesQuery(spark, dir)
  }

  /** The image near-dup pair table read back AFTER consolidation — the
    * third `compactLedgeredTable` consumer joins the video/triangle
    * twins under the driver's hash gate (the same oracle as the
    * uncompacted read). Both image tables share ONE state snapshot, so
    * the fold is exercised on a two-table ledger: each table blesses
    * its own `retired:<base>:<hwm>` row.
    */
  def imageNearDupCompactedQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.compactLedgeredTable(spark, s"$root/dhash_pairs", s"$root/dhash_state")
    imageNearDupStreamQuery(spark, dir)
  }

  /** The streamed hash table after consolidation — same oracle as the
    * uncompacted read (content-invariance, gated).
    */
  def imageHashesCompactedQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = replayRoot(spark, dir)
    MicroBatch.compactLedgeredTable(spark, s"$root/dhash_hashes", s"$root/dhash_state")
    imageHashesQuery(spark, dir)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_video_scenes_compacted" -> (videoScenesCompactedQuery _),
    "stream_graph_triangles_compacted" -> (graphTrianglesCompactedQuery _),
    "stream_image_neardup_compacted" -> (imageNearDupCompactedQuery _),
    "stream_image_hashes_compacted" -> (imageHashesCompactedQuery _),
    "stream_kpi_state" -> (kpiStateQuery _),
    "stream_scd2_state" -> (scd2StateQuery _),
    "stream_quality_corpus" -> (qualityCorpusQuery _),
    "stream_er_matches" -> (erMatchesQuery _),
    "stream_er_pending" -> (erPendingQuery _),
    "stream_sessions" -> (sessionsQuery _),
    "stream_frequent_terms" -> (mgFrequentQuery _),
    "stream_graph_triangles" -> (graphTrianglesQuery _),
    "stream_video_scenes" -> (videoScenesQuery _),
    "stream_video_corrupt" -> (videoCorruptQuery _),
    "stream_image_hashes" -> (imageHashesQuery _),
    "stream_image_neardup" -> (imageNearDupStreamQuery _))

  val oracles: Map[String, String] = Map(
    // the whole multi-batch additive fold collapses to one GROUP BY —
    // that equivalence IS the additive-merge contract
    "stream_kpi_state" ->
      """SELECT l_partkey AS product_id,
        |  CAST(year(l_shipdate)*100 + month(l_shipdate) AS INTEGER) AS sale_ym,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the Gopher rules restated declaratively (the same measures as the
    // llm_gopher_filter oracle), filtered to the passing set — exactly
    // what the stream's gate admitted to the corpus, any batching
    "stream_quality_corpus" ->
      """WITH m AS MATERIALIZED (
        |  SELECT doc_id, length(text) AS n_chars,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n,
        |    CAST(length(text) AS DOUBLE)
        |      / len(string_split_regex(lower(trim(text)), '\s+')) AS awl,
        |    1.0 - CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
        |      / len(string_split_regex(lower(trim(text)), '\s+')) AS dup_frac,
        |    len(regexp_extract_all(lower(text), '\b(the|a|and|of|to)\b')) AS stops
        |  FROM documents)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM m
        |WHERE n >= 25 AND n <= 1000 AND awl BETWEEN 3.0 AND 10.0
        |  AND stops >= 2 AND dup_frac <= 0.6
        |ORDER BY doc_id""".stripMargin,
    // change-point derivation: a history row opens where the attribute
    // tuple differs from the key's previous event (no-op events never
    // close anything) and closes at the key's next change point
    "stream_scd2_state" ->
      s"""WITH ev AS (
         |  SELECT o_custkey AS cust_id,
         |    CAST(year(o_orderdate)*4 + (month(o_orderdate)-1)//3 AS BIGINT) AS q,
         |    max(o_orderstatus) AS status, min(o_orderpriority) AS priority
         |  FROM orders
         |  WHERE o_custkey % 5 = 2 AND year(o_orderdate) >= $Scd2FromYear
         |  GROUP BY 1, 2),
         |lagged AS (
         |  SELECT *, LAG(status) OVER w AS ps, LAG(priority) OVER w AS pp
         |  FROM ev WINDOW w AS (PARTITION BY cust_id ORDER BY q)),
         |changes AS (
         |  SELECT * FROM lagged
         |  WHERE ps IS NULL OR status <> ps OR priority <> pp)
         |SELECT cust_id, status, priority,
         |  q AS valid_from,
         |  LEAD(q) OVER (PARTITION BY cust_id ORDER BY q) AS valid_to
         |FROM changes ORDER BY cust_id, valid_from""".stripMargin,
    // the SAME declarative statement that gates the batch er_incremental
    // query — a green hash proves the streamed link table equals it
    "stream_er_matches" -> graft.ops.Linkage.incrementalMatchesSql,
    "stream_er_pending" -> graft.ops.Linkage.incrementalPendingSql,
    // the multi-batch open/merge/close fold collapses to the batch
    // operator's ONE window pass — the same SQL that gates
    // web_sessionize gates the streamed table (stream ≡ batch, not
    // stream ≈ spec)
    "stream_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsx,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |         OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
        |y AS (
        |  SELECT user_id, tsx,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsx, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  epoch_us(MIN(tsx)) AS session_start_us, epoch_us(MAX(tsx)) AS session_end_us
        |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // retention guarantee + exact recount make the cross-batch sketch
    // fold invisible to the answer: the oracle is the plain exact form
    // (identical to llm_frequent_terms_mg — stream ≡ batch ≡ declarative)
    "stream_frequent_terms" -> graft.llm.FrequentItems.oracles("llm_frequent_terms_mg"),
    // full recount from the landed data: a green hash proves the
    // incremental smallest-new-edge delta algebra sums to the truth
    "stream_graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |      WHERE l_partkey % 4 = 0),
        |e AS (SELECT x.p AS a, y.p AS b FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2)
        |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT COUNT(*)
        |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin,
    // the streamed shot-boundary index must equal the batch detector's
    // answer under any batching — literally the same oracle
    "stream_video_scenes" -> graft.llm.Multimodal.oracles("mm_video_scene_cuts"),
    // every planted corrupt payload counted exactly once across batches
    // and replays
    "stream_video_corrupt" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_corrupt
        |FROM documents WHERE doc_id < 8""".stripMargin,
    // the streamed incremental perceptual dedup must equal the batch
    // detector under any batching — literally the same oracles
    "stream_image_hashes" -> graft.llm.Multimodal.oracles("mm_image_dhash"),
    "stream_image_neardup" -> graft.llm.Multimodal.oracles("mm_image_neardup"),
    // consolidation is content-invariant: the compacted reads are gated
    // by the SAME oracles as their uncompacted twins
    "stream_video_scenes_compacted" -> graft.llm.Multimodal.oracles("mm_video_scene_cuts"),
    "stream_image_neardup_compacted" -> graft.llm.Multimodal.oracles("mm_image_neardup"),
    "stream_image_hashes_compacted" -> graft.llm.Multimodal.oracles("mm_image_dhash"),
    "stream_graph_triangles_compacted" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |      WHERE l_partkey % 4 = 0),
        |e AS (SELECT x.p AS a, y.p AS b FROM li x JOIN li y ON x.o = y.o AND x.p < y.p
        |      GROUP BY 1, 2)
        |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
        |       (SELECT COUNT(*)
        |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin)
}
