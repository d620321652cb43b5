package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Web
import graft.stream.MicroBatch

/** End-to-end micro-batch ingestion (T1–T5): JSONL landing dir → validate/
  * clean → hive-partitioned parquet + quarantine, via Structured Streaming.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val webSchema = StructType(Seq(
    StructField("session_id", StringType), StructField("user_id", StringType),
    StructField("page", StringType), StructField("device_type", StringType),
    StructField("browser", StringType), StructField("event_type", StringType),
    StructField("timestamp", DoubleType)))

  test("file-source stream: partitioned append + quarantine, batch/stream parity") {
    val root = Files.createTempDirectory("stream").toString
    val in = s"$root/landing"; Files.createDirectories(Paths.get(in))
    Files.writeString(Paths.get(s"$in/batch1.jsonl"),
      """{"session_id":"s-1","user_id":"42","page":"/a","device_type":"m","browser":"C","event_type":"Click","timestamp":1721033100.0}
        |{"session_id":"s-2","user_id":null,"page":"/b","device_type":"d","browser":"F","event_type":"View","timestamp":1721033100123.0}
        |{"session_id":null,"user_id":"9","page":"/c","device_type":"d","browser":"F","event_type":"Click","timestamp":1721033100.0}
        |""".stripMargin)
    val q = MicroBatch.ingest(
      spark, in, webSchema, Web.ingest(_), "event_time",
      s"$root/processed", s"$root/quarantine", s"$root/ckpt")
    MicroBatch.runToCompletion(q)

    val processed = spark.read.parquet(s"$root/processed")
    assert(processed.count() == 2)
    // hive partition layout from event_time (2024-07-15 08:45 UTC)
    assert(processed.select("year", "month", "day", "hour").distinct().head() ===
      org.apache.spark.sql.Row(2024, 7, 15, 8))
    val quarantined = spark.read.json(s"$root/quarantine")
    assert(quarantined.count() == 1)
    assert(quarantined.select("reject_reason").as[String].head() == "missing_session_id")

    // T5: re-delivering the same file through a NEW checkpoint (replay)
    // appends again — at-least-once, as documented in the reference
    val q2 = MicroBatch.ingest(
      spark, in, webSchema, Web.ingest(_), "event_time",
      s"$root/processed", s"$root/quarantine", s"$root/ckpt2")
    MicroBatch.runToCompletion(q2)
    assert(spark.read.parquet(s"$root/processed").count() == 4)
  }

  test("keyed sink: every key confined to one shard dir; bounded layout (K5)") {
    val root = Files.createTempDirectory("keyed").toString
    val df = (1 to 200).map(i => (s"session-${i % 37}", i)).toDF("session_id", "seq")
    graft.store.Lake.writeKeyed(df, "session_id", s"$root/keyed", shards = 4)
    // hive layout: shard=N dirs only, count bounded by `shards` not by keys
    val dirs = new java.io.File(s"$root/keyed").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.matches("shard=\\d")) && dirs.length <= 4)
    // Kinesis contract: a key's records never straddle shards
    val back = spark.read.parquet(s"$root/keyed")
    val spread = back.groupBy($"session_id")
      .agg(countDistinct($"shard").as("n_shards"))
      .filter($"n_shards" > 1).count()
    assert(spread == 0)
    assert(back.count() == 200)
  }

  test("streaming ANN ingest: appended vectors land in their lists and become searchable") {
    import graft.llm.Similarity
    val root = Files.createTempDirectory("ann_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val idx = s"$root/index"
    // build the at-rest index from an initial corpus
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val codes = Similarity.trainCentroidCodes(emb, nlist = 8, sampleSize = 40, iters = 2)
    Similarity.buildIvfIndex(emb, codes, idx)
    val before = spark.read.parquet(s"$idx/lists").count()
    // stream in new vectors: a near-copy of query vector 0 plus noise rows
    val q0 = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Seq[Float]].head().toArray
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    def row(id: Long, v: Array[Float]) =
      s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
    val rnd = new scala.util.Random(3)
    val stream = MicroBatch.annIngestStream(spark, in, schema, idx, s"$root/ckpt")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1000L, q0.map(x => x + 0.001f)),
        row(1001L, Array.fill(64)(rnd.nextGaussian().toFloat))).mkString("\n"))
    stream.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      row(1002L, Array.fill(64)(rnd.nextGaussian().toFloat)))
    stream.processAllAvailable()
    stream.stop(); stream.awaitTermination()
    // all streamed vectors are in the lists...
    assert(spark.read.parquet(s"$idx/lists").count() == before + 3)
    // ...and the near-copy of vector 0 is now vector 0's top neighbor
    val top = Similarity.ivfKnnIndexed(spark, idx,
        emb.filter($"vec_id" === 0), nprobe = 4, k = 3)
      .filter($"rank" === 1).select($"neighbor_id").as[Long].head()
    assert(top == 1000L, s"planted near-copy not retrieved first: $top")

    // replay: wipe the checkpoint so the file source redelivers EVERY
    // landed file (the worst-case at-least-once crash), restart the
    // stream — the vec_id anti-join must neutralize the whole replay
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    val replay = MicroBatch.annIngestStream(spark, in, schema, idx, s"$root/ckpt")
    replay.processAllAvailable()
    replay.stop(); replay.awaitTermination()
    val after = spark.read.parquet(s"$idx/lists")
    assert(after.count() == before + 3,
      s"replayed batch duplicated vectors: ${after.count()} != ${before + 3}")
    val dupIds = after.groupBy($"vec_id").count().filter($"count" > 1).count()
    assert(dupIds == 0, s"$dupIds vec_ids duplicated after replay")
  }

  test("streaming corpus ingest: near-dup and exact gates hold across micro-batches") {
    val root = Files.createTempDirectory("corpus_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val base = "the quick brown fox jumps over the lazy dog while morning light settles across the quiet harbor town"
    val q = MicroBatch.corpusIngestStream(spark, in, schema, "text", "doc_id",
      s"$root/corpus", s"$root/ckpt")
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(doc(0, base),
        doc(1, base), // in-batch exact dup → dropped, lowest id kept
        doc(2, "totally different first story about glaciers calving into a grey arctic sea")).mkString("\n"))
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(doc(10, base), // cross-batch exact dup → dropped
        doc(11, base.replace("quiet harbor town", "quiet harbor village")), // near-dup → dropped
        doc(12, "genuinely new reporting on deep sea vents and the creatures gathered there")).mkString("\n"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val ids = spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(0L, 2L, 12L), s"got ${ids.toSeq}")
  }

  test("quality-gated ingest routes per Gopher verdicts; corpus side replay-safe") {
    val root = Files.createTempDirectory("quality_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // 30 varied tokens with stopwords → passes every Gopher rule
    val good = "the morning light settles across the quiet harbor town and " +
      "fishing boats drift out past the old stone pier while gulls wheel " +
      "over nets spread to dry along the wall"
    // 45 tokens, 3 distinct → r_dup fails; "the" ×15 keeps r_stop green
    val spam = ("the buy now " * 15).trim
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val q = MicroBatch.qualityGatedIngestStream(spark, in, schema, "text", "doc_id",
      s"$root/corpus", s"$root/reject", s"$root/ckpt")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(doc(0, good), doc(1, spam)).mkString("\n"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val kept = spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(0L), kept.toSeq.toString)
    val rej = spark.read.json(s"$root/reject")
    assert(rej.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // the quarantine carries the per-rule audit: spam fails r_dup, not r_stop
    val row = rej.selectExpr("r_dup", "r_stop").head
    assert(row.getLong(0) == 0 && row.getLong(1) == 1, row.toString)

    // worst-case at-least-once: wipe the checkpoint, redeliver everything —
    // the id anti-join must keep the corpus side idempotent
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    val replay = MicroBatch.qualityGatedIngestStream(spark, in, schema, "text", "doc_id",
      s"$root/corpus", s"$root/reject", s"$root/ckpt")
    replay.processAllAvailable()
    replay.stop(); replay.awaitTermination()
    val after = spark.read.parquet(s"$root/corpus").select("doc_id").as[Long].collect()
    assert(after.toSeq == Seq(0L), s"replay duplicated corpus rows: ${after.toSeq}")
  }

  test("streaming ER ingest: matches link the governed master only; wipe-and-replay is a no-op") {
    val root = Files.createTempDirectory("er_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("seg", StringType)))
    Seq((1L, "acme corp", "A"), (2L, "bolt llc!", "B"))
      .toDF("id", "name", "seg")
      .write.parquet(s"$root/master")
    def rec(id: Long, name: String, seg: String) =
      s"""{"id":$id,"name":"$name","seg":"$seg"}"""
    def run(): Unit = {
      val q = MicroBatch.erIngestStream(spark, in, schema, s"$root/master",
        s"$root/matches", s"$root/pending", s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    // batch 1: a typo'd twin of master #1 and an unlinkable prospect
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(rec(10, "acme corq", "A"), rec(11, "fresh name", "A")).mkString("\n"))
    run()
    // batch 2: a twin of master #2, and a near-copy of PENDING #11 —
    // which must stay pending: the stream links the governed master,
    // never earlier arrivals (batching-invariance)
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(rec(12, "bolt llc?", "B"), rec(13, "fresh namq", "A")).mkString("\n"))
    run()
    val matches = spark.read.parquet(s"$root/matches")
      .select($"new_id", $"master_custkey").as[(Long, Long)].collect().toSet
    assert(matches == Set((10L, 1L), (12L, 2L)), matches.toString)
    val pending = spark.read.parquet(s"$root/pending")
      .select($"id").as[Long].collect().sorted
    assert(pending.toSeq == Seq(11L, 13L), pending.toSeq.toString)
    // worst-case at-least-once: wipe the checkpoint, redeliver everything
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    val m2 = spark.read.parquet(s"$root/matches").count()
    val p2 = spark.read.parquet(s"$root/pending").count()
    assert(m2 == 2 && p2 == 2, s"replay duplicated rows: matches=$m2 pending=$p2")
  }

  test("streaming winnow ingest: landed docs probe-able by near-copies; redelivery appends nothing") {
    val root = Files.createTempDirectory("winnow_stream").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val postings = s"$root/postings"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val story = "the quick brown fox jumps over the lazy dog while seventeen zebras watch intently from afar"
    val other = "completely unrelated content about databases and distributed systems architecture patterns"
    val q = MicroBatch.winnowIngestStream(spark, in, schema, postings, s"$root/ckpt")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      s"""{"doc_id":1,"text":"$story"}
         |{"doc_id":2,"text":"$other"}""".stripMargin)
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      s"""{"doc_id":3,"text":"yet more filler prose with no resemblance to anything else indexed"}""")
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    // banded hive layout; every doc landed
    val table = spark.read.parquet(postings)
    assert(table.select("doc_id").distinct().count() == 3)
    assert(table.columns.contains("band"))
    val nRows = table.count()
    // a NEAR-COPY of doc 1's text (prefix edit) finds doc 1 as the top
    // candidate through the banded probe — the index is live
    val probe = graft.llm.TextAnalysis.winnowProbe(spark, postings,
      Seq((100L, s"INTRO EDIT $story")).toDF("qid", "qtext"), "qtext", "qid")
      .as[(Long, Long, Long)].collect()
    assert(probe.nonEmpty && probe.head._2 == 1L, probe.mkString(","))
    // redelivery under a wiped checkpoint: the doc-id guard appends nothing
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    val replay = MicroBatch.winnowIngestStream(spark, in, schema, postings, s"$root/ckpt")
    replay.processAllAvailable()
    replay.stop(); replay.awaitTermination()
    assert(spark.read.parquet(postings).count() == nRows, "redelivery duplicated postings")
  }

  test("append-table streams tolerate existing-but-DATALESS output dirs (crashed-first-append wedge class)") {
    // a crash during the very first append can leave the output dir
    // existing with zero data files (_temporary only); the replay then
    // re-reads it as the dedup gate — a schema-less read would throw
    // 'Unable to infer schema' on EVERY restart (permanent wedge, the
    // visibleLedgered class). Every gate read is schema-pinned now;
    // this drives each one over a pre-created empty dir.
    val root = Files.createTempDirectory("dataless_dirs").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def land(in: String, name: String, rows: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(in))
      Files.writeString(Paths.get(in, name), rows.mkString("\n"))
    }
    val good = "the morning light settles across the quiet harbor town and " +
      "fishing boats drift out past the old stone pier while gulls wheel " +
      "over nets spread to dry along the wall"

    // corpus ingest: near-dup gate reads the corpus with the landing schema
    Files.createDirectories(Paths.get(s"$root/c/corpus"))
    land(s"$root/c/in", "b1.jsonl", Seq(s"""{"doc_id":1,"text":"$good"}"""))
    val qc = MicroBatch.corpusIngestStream(spark, s"$root/c/in", docSchema,
      "text", "doc_id", s"$root/c/corpus", s"$root/c/ckpt")
    qc.processAllAvailable(); qc.stop(); qc.awaitTermination()
    assert(spark.read.parquet(s"$root/c/corpus").count() == 1)

    // quality-gated ingest: id anti-join over the corpus
    Files.createDirectories(Paths.get(s"$root/q/corpus"))
    land(s"$root/q/in", "b1.jsonl", Seq(s"""{"doc_id":7,"text":"$good"}"""))
    val qq = MicroBatch.qualityGatedIngestStream(spark, s"$root/q/in", docSchema,
      "text", "doc_id", s"$root/q/corpus", s"$root/q/reject", s"$root/q/ckpt")
    qq.processAllAvailable(); qq.stop(); qq.awaitTermination()
    assert(spark.read.parquet(s"$root/q/corpus").count() == 1)

    // er ingest: id anti-joins over matches AND pending
    val erSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("seg", StringType)))
    Seq((1L, "acme corp", "A")).toDF("id", "name", "seg")
      .write.parquet(s"$root/e/master")
    Files.createDirectories(Paths.get(s"$root/e/matches"))
    Files.createDirectories(Paths.get(s"$root/e/pending"))
    land(s"$root/e/in", "b1.jsonl",
      Seq(s"""{"id":10,"name":"acme corq","seg":"A"}""",
        s"""{"id":11,"name":"fresh name","seg":"A"}"""))
    val qe = MicroBatch.erIngestStream(spark, s"$root/e/in", erSchema,
      s"$root/e/master", s"$root/e/matches", s"$root/e/pending", s"$root/e/ckpt")
    qe.processAllAvailable(); qe.stop(); qe.awaitTermination()
    assert(spark.read.parquet(s"$root/e/matches").count() == 1)
    assert(spark.read.parquet(s"$root/e/pending").count() == 1)

    // winnow ingest: doc-id guard over the banded postings
    Files.createDirectories(Paths.get(s"$root/w/postings"))
    land(s"$root/w/in", "b1.jsonl", Seq(s"""{"doc_id":3,"text":"$good"}"""))
    val qw = MicroBatch.winnowIngestStream(spark, s"$root/w/in", docSchema,
      s"$root/w/postings", s"$root/w/ckpt")
    qw.processAllAvailable(); qw.stop(); qw.awaitTermination()
    assert(spark.read.parquet(s"$root/w/postings").count() > 0)

    // the kpi stream's per-batch merge reads the table it maintains
    Files.createDirectories(Paths.get(s"$root/k/tbl"))
    graft.store.Upsert.additivePartitioned(spark, s"$root/k/tbl",
      Seq((1L, "2024-07-01", 5L)).toDF("product_id", "date", "total_qty"),
      keys = Seq("product_id"), valueCol = "total_qty", partitionCol = "date")
    val kpi = spark.read.parquet(s"$root/k/tbl")
      .select($"product_id", $"total_qty").as[(Long, Long)].collect().toSeq
    assert(kpi == Seq((1L, 5L)), kpi.toString)
  }

  test("streaming additive KPI: partition-scoped merge per batch, untouched dates byte-identical, redelivery no-op") {
    val root = Files.createTempDirectory("kpi_stream").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val tbl = s"$root/kpi"
    val schema = StructType(Seq(
      StructField("product_id", LongType), StructField("date", StringType),
      StructField("total_sales", DoubleType)))
    def row(p: Long, d: String, v: Double) =
      s"""{"product_id":$p,"date":"$d","total_sales":$v}"""
    def partFiles(day: String) = {
      val d = Paths.get(tbl, s"date=$day")
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, Files.size(p),
          Files.getLastModifiedTime(p).toMillis)).toSet
    }
    def totals = spark.read.parquet(tbl)
      .select($"product_id", $"date".cast("string"), $"total_sales")
      .as[(Long, String, Double)].collect().toSet
    val q = MicroBatch.kpiIngestStream(spark, in, schema,
      Seq("product_id"), "total_sales", "date", tbl, s"$root/ckpt")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1, "2024-07-01", 10.0), row(1, "2024-07-01", 2.5),
        row(2, "2024-07-02", 20.0)).mkString("\n"))
    q.processAllAvailable()
    assert(totals == Set((1L, "2024-07-01", 12.5), (2L, "2024-07-02", 20.0)))
    val files01 = partFiles("2024-07-01")
    // second batch touches ONLY 07-02: 07-01's files must stay byte-identical
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(row(2, "2024-07-02", 5.0), row(3, "2024-07-02", 1.0)).mkString("\n"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    assert(partFiles("2024-07-01") == files01,
      "streamed batch rewrote an untouched date partition")
    assert(totals == Set((1L, "2024-07-01", 12.5), (2L, "2024-07-02", 25.0),
      (3L, "2024-07-02", 1.0)))
    // at-least-once redelivery: wipe the checkpoint so the source replays
    // from scratch under already-ledgered batch ids — the merge must no-op
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    val filesAll = (partFiles("2024-07-01"), partFiles("2024-07-02"))
    val replay = MicroBatch.kpiIngestStream(spark, in, schema,
      Seq("product_id"), "total_sales", "date", tbl, s"$root/ckpt")
    replay.processAllAvailable()
    replay.stop(); replay.awaitTermination()
    assert(totals == Set((1L, "2024-07-01", 12.5), (2L, "2024-07-02", 25.0),
      (3L, "2024-07-02", 1.0)), "redelivered batches double-counted")
    assert((partFiles("2024-07-01"), partFiles("2024-07-02")) == filesAll,
      "redelivery rewrote partitions")
    // checkpoint wiped WHILE NEW FILES LANDED: the replayed batch 0 now
    // bundles the never-applied b3 with the already-applied b1/b2 under
    // a reused id. The FILE-grain ledger must apply exactly b3's rows —
    // id-keyed dedup would either drop b3 (skip) or double-count b1/b2
    // (apply)
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    Files.writeString(Paths.get(s"$in/b3.jsonl"), row(4, "2024-07-04", 9.0))
    val mixed = MicroBatch.kpiIngestStream(spark, in, schema,
      Seq("product_id"), "total_sales", "date", tbl, s"$root/ckpt")
    mixed.processAllAvailable()
    mixed.stop(); mixed.awaitTermination()
    assert(totals == Set((1L, "2024-07-01", 12.5), (2L, "2024-07-02", 25.0),
      (3L, "2024-07-02", 1.0), (4L, "2024-07-04", 9.0)),
      "mixed replay bundle mis-applied")
    assert(partFiles("2024-07-01") == filesAll._1,
      "mixed replay rewrote an untouched partition")
  }

  test("kpi stream under Spark's own checkpoint recovery: kept-checkpoint restart replaying the last batch id converges to the uninterrupted run") {
    // the replay harness proves kill-anywhere convergence of the ENGINE's
    // ledger; this case proves it composes with SPARK's batch-id replay:
    // stop the query, erase the last batch's COMMIT marker (the exact
    // crash window — offsets written, commit not), restart on the SAME
    // checkpoint so Spark re-runs that batch id over the same files, and
    // compare the final table to an uninterrupted twin run.
    val root = Files.createTempDirectory("kpi_ckpt_restart").toString
    val schema = StructType(Seq(
      StructField("product_id", LongType), StructField("date", StringType),
      StructField("total_sales", DoubleType)))
    def row(p: Long, d: String, v: Double) =
      s"""{"product_id":$p,"date":"$d","total_sales":$v}"""
    val b1 = Seq(row(1, "2024-07-01", 10.0), row(2, "2024-07-02", 20.0)).mkString("\n")
    val b2 = Seq(row(2, "2024-07-02", 5.0), row(3, "2024-07-03", 1.0)).mkString("\n")
    def start(tag: String) = {
      Files.createDirectories(Paths.get(s"$root/$tag/in"))
      MicroBatch.kpiIngestStream(spark, s"$root/$tag/in", schema,
        Seq("product_id"), "total_sales", "date", s"$root/$tag/kpi", s"$root/$tag/ckpt")
    }
    def totals(tag: String) = spark.read.parquet(s"$root/$tag/kpi")
      .select($"product_id", $"date".cast("string"), $"total_sales")
      .as[(Long, String, Double)].collect().toSet
    def partFiles(tag: String, day: String) = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s"$root/$tag/kpi", s"date=$day")).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, Files.size(p))).toSet
    }
    // twin A: uninterrupted b1 then b2
    val qa = start("a")
    Files.writeString(Paths.get(s"$root/a/in/b1.jsonl"), b1)
    qa.processAllAvailable()
    Files.writeString(Paths.get(s"$root/a/in/b2.jsonl"), b2)
    qa.processAllAvailable(); qa.stop(); qa.awaitTermination()
    // twin B: b1, stop, drop the newest commit marker, restart, b2
    val qb = start("b")
    Files.writeString(Paths.get(s"$root/b/in/b1.jsonl"), b1)
    qb.processAllAvailable(); qb.stop(); qb.awaitTermination()
    val files01 = partFiles("b", "2024-07-01")
    val commits = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s"$root/b/ckpt/commits")).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
    }
    assert(commits.nonEmpty, "no commit markers written — checkpoint layout changed?")
    val lastCommit = commits.maxBy(_.getFileName.toString.toLong)
    Files.delete(lastCommit)
    // the local ChecksumFileSystem shadows every metadata file with a
    // .name.crc sibling; leaving it behind makes the replayed batch's
    // commit REWRITE fail its checksum and Spark mis-reports it as a
    // concurrent-queries conflict
    Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    val qb2 = start("b") // same checkpoint: Spark replays the uncommitted batch id
    qb2.processAllAvailable()
    assert(totals("b") == Set((1L, "2024-07-01", 10.0), (2L, "2024-07-02", 20.0)),
      "replayed batch id double-applied or dropped")
    assert(partFiles("b", "2024-07-01") == files01,
      "the replayed batch rewrote an already-applied partition")
    Files.writeString(Paths.get(s"$root/b/in/b2.jsonl"), b2)
    qb2.processAllAvailable(); qb2.stop(); qb2.awaitTermination()
    assert(totals("b") == totals("a"),
      "kept-checkpoint restart diverged from the uninterrupted run")
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("kpi stream refuses a pre-file-grain batch-id ledger (no silent double count)") {
    val root = Files.createTempDirectory("kpi_legacy_ledger").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val tbl = s"$root/kpi"
    Files.createDirectories(Paths.get(tbl, "_ledger"))
    Files.writeString(Paths.get(tbl, "_ledger", "3"), "") // old batch-id marker
    val schema = StructType(Seq(
      StructField("product_id", LongType), StructField("date", StringType),
      StructField("total_sales", DoubleType)))
    val ex = intercept[IllegalStateException] {
      MicroBatch.kpiIngestStream(spark, in, schema,
        Seq("product_id"), "total_sales", "date", tbl, s"$root/ckpt")
    }
    assert(ex.getMessage.contains("batch-id markers"), ex.getMessage)
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("streaming SCD2: history accrues across batches; full replay is a no-op") {
    val root = Files.createTempDirectory("scd2_stream").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val tbl = s"$root/dim"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("seg", StringType),
      StructField("bal", DoubleType), StructField("effective_day", LongType)))
    def row(k: Long, seg: String, bal: Double, d: Long) =
      s"""{"k":$k,"seg":"$seg","bal":$bal,"effective_day":$d}"""
    val q = MicroBatch.scd2IngestStream(spark, in, schema, "k",
      Seq("seg", "bal"), tbl, s"$root/ckpt")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1, "A", 10.0, 10), row(2, "B", 20.0, 10)).mkString("\n"))
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(row(1, "A", 99.0, 20),            // change → close + reopen
        row(1, "A", 50.0, 15),              // earlier day, SAME batch → own version
        row(2, "B", 20.0, 20)).mkString("\n")) // identical → no-op
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val hist = graft.store.Versioned.read(spark, tbl)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    // the per-day fold records the day-15 intermediate version with its
    // own valid window — trigger boundaries don't change history shape
    assert(hist == Seq(
      (1L, "A", 10.0, 10L, Some(15L)),
      (1L, "A", 50.0, 15L, Some(20L)),
      (1L, "A", 99.0, 20L, None),
      (2L, "B", 20.0, 10L, None)), hist.toString)

    // wipe the checkpoint → every file redelivers; the history must not grow
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    val replay = MicroBatch.scd2IngestStream(spark, in, schema, "k",
      Seq("seg", "bal"), tbl, s"$root/ckpt")
    replay.processAllAvailable()
    // the WORST replay: a stale producer re-sends only the FIRST batch's
    // old values after newer versions landed — the monotonic guard must
    // refuse to regress the open rows
    Files.writeString(Paths.get(s"$in/b3_stale_resend.jsonl"),
      Seq(row(1, "A", 10.0, 10), row(2, "B", 20.0, 10)).mkString("\n"))
    replay.processAllAvailable()
    replay.stop(); replay.awaitTermination()
    val after = graft.store.Versioned.read(spark, tbl)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(after == hist, s"replay mutated history: $after")
  }

  test("SCD2 stream under Spark's own checkpoint recovery: replayed batch id leaves the order-sensitive history identical") {
    // the kpi case proves the ADDITIVE family composes with Spark's
    // batch-id replay; SCD2 is the ORDER-SENSITIVE one — a replayed
    // close-and-reopen batch applied twice would close rows against
    // themselves. Same crash window: offsets written, commit marker
    // erased, restart on the SAME checkpoint re-runs the batch id.
    val root = Files.createTempDirectory("scd2_ckpt_restart").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("seg", StringType),
      StructField("bal", DoubleType), StructField("effective_day", LongType)))
    def row(k: Long, seg: String, bal: Double, d: Long) =
      s"""{"k":$k,"seg":"$seg","bal":$bal,"effective_day":$d}"""
    val b1 = Seq(row(1, "A", 10.0, 10), row(2, "B", 20.0, 10)).mkString("\n")
    val b2 = Seq(row(1, "A", 99.0, 20), row(2, "B", 20.0, 20)).mkString("\n")
    def start(tag: String) = {
      Files.createDirectories(Paths.get(s"$root/$tag/in"))
      MicroBatch.scd2IngestStream(spark, s"$root/$tag/in", schema, "k",
        Seq("seg", "bal"), s"$root/$tag/dim", s"$root/$tag/ckpt")
    }
    def hist(tag: String) = graft.store.Versioned.read(spark, s"$root/$tag/dim")
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    // twin A: uninterrupted
    val qa = start("a")
    Files.writeString(Paths.get(s"$root/a/in/b1.jsonl"), b1)
    qa.processAllAvailable()
    Files.writeString(Paths.get(s"$root/a/in/b2.jsonl"), b2)
    qa.processAllAvailable(); qa.stop(); qa.awaitTermination()
    // twin B: b1 → erase the commit marker → restart replays b1's batch id
    val qb = start("b")
    Files.writeString(Paths.get(s"$root/b/in/b1.jsonl"), b1)
    qb.processAllAvailable(); qb.stop(); qb.awaitTermination()
    val h1 = hist("b")
    val commits = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s"$root/b/ckpt/commits")).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
    }
    val lastCommit = commits.maxBy(_.getFileName.toString.toLong)
    Files.delete(lastCommit)
    Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    val qb2 = start("b")
    qb2.processAllAvailable()
    assert(hist("b") == h1, "replayed SCD2 batch mutated the history")
    Files.writeString(Paths.get(s"$root/b/in/b2.jsonl"), b2)
    qb2.processAllAvailable(); qb2.stop(); qb2.awaitTermination()
    assert(hist("b") == hist("a"),
      "kept-checkpoint SCD2 restart diverged from the uninterrupted run")
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("compacted ledgered family under Spark's checkpoint recovery: batch-id replay composes with consolidation") {
    // SCD2 proves order-sensitive state composes with Spark's batch-id
    // replay; this is the COMPACTED family's composition: consolidate
    // the table to one _retired partition while the stream is stopped,
    // erase the last commit marker, restart on the SAME checkpoint —
    // Spark re-runs the batch id against the consolidated table, and
    // neither the visible rows nor the layout may change (a replay that
    // re-wrote the folded file's partition would resurrect reclaimed
    // space and double rows once blessed).
    val root = Files.createTempDirectory("compact_ckpt_restart").toString
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("payload_b64", StringType)))
    val codec = new graft.llm.Multimodal.ImageCodec.Codec
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def pixel(seed: Long, shift: Int)(x: Int, y: Int): Int = {
      val d = md.digest(s"$seed:${y * 8 + x}:cckpt".getBytes("UTF-8"))
      ((d(0) & 0xFF) + shift) % 256
    }
    def img(id: Long, seed: Long, shift: Int): String = {
      val b = java.util.Base64.getEncoder
        .encodeToString(codec.encodeGrayPng(8, 8, pixel(seed, shift)))
      s"""{"media_id":$id,"payload_b64":"$b"}"""
    }
    val b1 = Seq(img(10, seed = 1, shift = 0), img(11, seed = 1, shift = 2)).mkString("\n")
    val b2 = img(30, seed = 1, shift = 4) // cross-batch near-dup of 10/11
    def start(tag: String) = {
      Files.createDirectories(Paths.get(s"$root/$tag/in"))
      MicroBatch.imageIngestStream(spark, s"$root/$tag/in", schema,
        hashesDir = s"$root/$tag/hashes", pairsDir = s"$root/$tag/pairs",
        stateDir = s"$root/$tag/state", checkpointDir = s"$root/$tag/ckpt")
    }
    def hashes(tag: String): Seq[(Long, Long)] =
      MicroBatch.readImageHashes(spark, s"$root/$tag/hashes", s"$root/$tag/state")
        .as[(Long, Long)].collect().sorted.toSeq
    def pairs(tag: String): Seq[(Long, Long)] =
      MicroBatch.readImagePairs(spark, s"$root/$tag/pairs", s"$root/$tag/state")
        .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).sorted.toSeq
    def partNames(dir: String): Seq[String] =
      Option(new java.io.File(dir).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("src_file="))
        .map(f => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(f.getName.stripPrefix("src_file="))).sorted

    // twin A: uninterrupted, with the same mid-stream compaction point
    val qa = start("a")
    Files.writeString(Paths.get(s"$root/a/in/b1.jsonl"), b1)
    qa.processAllAvailable()
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/a/hashes", s"$root/a/state"))
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/a/pairs", s"$root/a/state"))
    Files.writeString(Paths.get(s"$root/a/in/b2.jsonl"), b2)
    qa.processAllAvailable(); qa.stop(); qa.awaitTermination()

    // twin B: b1 → stop → consolidate → erase the last commit marker →
    // restart from the SAME checkpointLocation (replays b1's batch id)
    val qb = start("b")
    Files.writeString(Paths.get(s"$root/b/in/b1.jsonl"), b1)
    qb.processAllAvailable(); qb.stop(); qb.awaitTermination()
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/b/hashes", s"$root/b/state"))
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/b/pairs", s"$root/b/state"))
    assert(partNames(s"$root/b/hashes") == Seq("_retired:b1.jsonl"))
    val h1 = hashes("b"); val p1 = pairs("b")
    assert(p1 == Seq((10L, 11L)), p1.toString)
    locally {
      import scala.jdk.CollectionConverters._
      val commits = Files.list(Paths.get(s"$root/b/ckpt/commits")).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      val lastCommit = commits.maxBy(_.getFileName.toString.toLong)
      Files.delete(lastCommit)
      Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    }
    val qb2 = start("b")
    qb2.processAllAvailable()
    assert(hashes("b") == h1 && pairs("b") == p1,
      "replayed batch mutated the consolidated tables")
    assert(partNames(s"$root/b/hashes") == Seq("_retired:b1.jsonl"),
      s"replay resurrected folded partitions: ${partNames(s"$root/b/hashes")}")
    // the restarted stream keeps going: the cross-batch near-dup is found
    // by the band join reading the CONSOLIDATED hash partition
    Files.writeString(Paths.get(s"$root/b/in/b2.jsonl"), b2)
    qb2.processAllAvailable(); qb2.stop(); qb2.awaitTermination()
    assert(hashes("b") == hashes("a"),
      "restarted+compacted hashes diverged from the uninterrupted twin")
    assert(pairs("b") == pairs("a") && pairs("b").contains((10L, 30L)),
      s"restarted+compacted pairs diverged: ${pairs("b")} vs ${pairs("a")}")
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("session stream under Spark's checkpoint recovery: replayed batch id leaves sessions and layout identical") {
    // KPI (additive), SCD2 (order-sensitive) and the compacted ledger
    // prove their state classes compose with Spark's batch-id replay;
    // this is the SESSION-WINDOW family's turn — the most state-shaped
    // remaining one (open-session snapshot behind a versioned pointer +
    // append-only batch-keyed closed table). Erase the last commit
    // marker, restart on the SAME checkpoint: Spark re-runs b1's batch
    // id, the per-user (ts, event_id) watermark must drop every
    // replayed row (no duplicate closed sessions, no bump-suffixed
    // orphan partition), and the restarted stream must then converge
    // with an uninterrupted twin on b2.
    val root = Files.createTempDirectory("sess_ckpt_restart").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val M = 60L * 1000000
    def row(e: Long, u: Long, tMin: Long) =
      s"""{"event_id":$e,"user_id":$u,"ts_us":${tMin * M}}"""
    val b1 = Seq(row(1, 1, 0), row(2, 1, 20), row(3, 2, 0), row(4, 2, 50)).mkString("\n")
    val b2 = Seq(row(5, 1, 45), row(6, 2, 100), row(7, 3, 0)).mkString("\n")
    def start(tag: String) = {
      Files.createDirectories(Paths.get(s"$root/$tag/in"))
      MicroBatch.sessionIngestStream(spark, s"$root/$tag/in", schema,
        gapUs = 30 * M, openDir = s"$root/$tag/open",
        closedDir = s"$root/$tag/closed", checkpointDir = s"$root/$tag/ckpt")
    }
    def sessions(tag: String): Seq[(Long, Long, Long, Long, Long)] =
      spark.read.parquet(s"$root/$tag/closed")
        .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
        .unionByName(graft.store.Versioned.read(spark, s"$root/$tag/open")
          .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us"))
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    def keys(tag: String): Seq[String] =
      Option(new java.io.File(s"$root/$tag/closed").listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("batch_key="))
        .map(_.getName).sorted

    // twin A: uninterrupted (b1 and b2 as separate micro-batches)
    val qa = start("a")
    Files.writeString(Paths.get(s"$root/a/in/b1.jsonl"), b1)
    qa.processAllAvailable()
    Files.writeString(Paths.get(s"$root/a/in/b2.jsonl"), b2)
    qa.processAllAvailable(); qa.stop(); qa.awaitTermination()

    // twin B: b1 → stop → erase the last commit marker → restart on the
    // SAME checkpoint (Spark replays b1's batch id against committed state)
    val qb = start("b")
    Files.writeString(Paths.get(s"$root/b/in/b1.jsonl"), b1)
    qb.processAllAvailable(); qb.stop(); qb.awaitTermination()
    val s1 = sessions("b"); val k1 = keys("b")
    assert(s1.nonEmpty && k1.nonEmpty, s"no committed state to replay over: $s1 / $k1")
    locally {
      import scala.jdk.CollectionConverters._
      val commits = Files.list(Paths.get(s"$root/b/ckpt/commits")).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      val lastCommit = commits.maxBy(_.getFileName.toString.toLong)
      Files.delete(lastCommit)
      Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    }
    val qb2 = start("b")
    qb2.processAllAvailable()
    assert(sessions("b") == s1,
      s"replayed batch mutated sessions: ${sessions("b")} vs $s1")
    assert(keys("b") == k1,
      s"replay grew the closed layout (orphan/bumped partition): ${keys("b")} vs $k1")
    // the restarted stream keeps sessionizing: boundary merge for user 1,
    // new sessions for users 2/3 — identical to the uninterrupted twin
    Files.writeString(Paths.get(s"$root/b/in/b2.jsonl"), b2)
    qb2.processAllAvailable(); qb2.stop(); qb2.awaitTermination()
    assert(sessions("b") == sessions("a"),
      s"restarted sessions diverged: ${sessions("b")} vs ${sessions("a")}")
    assert(keys("b") == keys("a"),
      s"restarted layout diverged: ${keys("b")} vs ${keys("a")}")
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("ER stream under Spark's checkpoint recovery: replayed batch id leaves link and pending tables identical") {
    // KPI (additive), SCD2 (order-sensitive), the compacted ledger and
    // session windows are proven; this is the ER family's turn (r18
    // verdict #4) — TWO at-rest tables per batch (link appends + the
    // stewardship queue), each with its own per-id replay anti-join.
    // Erase the last commit marker, restart on the SAME checkpoint:
    // Spark re-runs b1's batch id, both guards must drop every replayed
    // row (no duplicate links, no duplicate pending entries), and the
    // restarted stream must then converge with an uninterrupted twin.
    val root = Files.createTempDirectory("er_ckpt_restart").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("seg", StringType)))
    // governed master: one linkable entity per block (block key strips
    // the last 2 name chars, so the typo'd twins below stay in-block)
    Seq((500L, "node42aa", "A"), (501L, "node77aa", "B"))
      .toDF("id", "name", "seg")
      .write.mode("overwrite").parquet(s"$root/master")
    def row(i: Long, n: String, s: String) = s"""{"id":$i,"name":"$n","seg":"$s"}"""
    // per batch: one twin (same block, edit distance 1, same segment)
    // and one prospect whose block exists nowhere in the master
    val b1 = Seq(row(10, "node42ab", "A"), row(11, "zzsolo99", "B")).mkString("\n")
    val b2 = Seq(row(12, "node77ab", "B"), row(13, "qqlone11", "A")).mkString("\n")
    def start(tag: String) = {
      Files.createDirectories(Paths.get(s"$root/$tag/in"))
      MicroBatch.erIngestStream(spark, s"$root/$tag/in", schema,
        masterDir = s"$root/master",
        matchesDir = s"$root/$tag/matches",
        pendingDir = s"$root/$tag/pending",
        checkpointDir = s"$root/$tag/ckpt")
    }
    def state(tag: String): (Seq[(Long, Long, Int)], Seq[Long]) = (
      spark.read.parquet(s"$root/$tag/matches")
        .select($"new_id", $"master_custkey", $"edit_dist")
        .as[(Long, Long, Int)].collect().sorted.toSeq,
      spark.read.parquet(s"$root/$tag/pending")
        .select($"id").as[Long].collect().sorted.toSeq)

    // twin A: uninterrupted (b1 and b2 as separate micro-batches)
    val qa = start("a")
    Files.writeString(Paths.get(s"$root/a/in/b1.jsonl"), b1)
    qa.processAllAvailable()
    Files.writeString(Paths.get(s"$root/a/in/b2.jsonl"), b2)
    qa.processAllAvailable(); qa.stop(); qa.awaitTermination()

    // twin B: b1 → stop → erase the last commit marker → restart on the
    // SAME checkpoint (Spark replays b1's batch id over committed state)
    val qb = start("b")
    Files.writeString(Paths.get(s"$root/b/in/b1.jsonl"), b1)
    qb.processAllAvailable(); qb.stop(); qb.awaitTermination()
    val s1 = state("b")
    assert(s1._1 == Seq((10L, 500L, 1)) && s1._2 == Seq(11L),
      s"b1 did not produce the expected link/pending state: $s1")
    locally {
      import scala.jdk.CollectionConverters._
      val commits = Files.list(Paths.get(s"$root/b/ckpt/commits")).iterator().asScala
        .filter(p => p.getFileName.toString.forall(_.isDigit)).toSeq
      val lastCommit = commits.maxBy(_.getFileName.toString.toLong)
      Files.delete(lastCommit)
      Files.deleteIfExists(lastCommit.resolveSibling(s".${lastCommit.getFileName}.crc"))
    }
    val qb2 = start("b")
    qb2.processAllAvailable()
    assert(state("b") == s1,
      s"replayed batch mutated the link/pending tables: ${state("b")} vs $s1")
    // the restarted stream keeps linking: master-501 twin links, the new
    // prospect queues — identical to the uninterrupted twin
    Files.writeString(Paths.get(s"$root/b/in/b2.jsonl"), b2)
    qb2.processAllAvailable(); qb2.stop(); qb2.awaitTermination()
    assert(state("b") == state("a"),
      s"restarted ER state diverged: ${state("b")} vs ${state("a")}")
    assert(state("b")._1 == Seq((10L, 500L, 1), (12L, 501L, 1)) &&
      state("b")._2 == Seq(11L, 13L),
      s"final ER state wrong: ${state("b")}")
    graft.store.Lake.deleteRecursive(Paths.get(root))
  }

  test("streaming SCD2: mixed-day batch keeps per-key days; later update not mis-dropped") {
    val root = Files.createTempDirectory("scd2_days").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val tbl = s"$root/dim"
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("seg", StringType),
      StructField("bal", DoubleType), StructField("effective_day", LongType)))
    def row(k: Long, seg: String, bal: Double, d: Long) =
      s"""{"k":$k,"seg":"$seg","bal":$bal,"effective_day":$d}"""
    val q = MicroBatch.scd2IngestStream(spark, in, schema, "k",
      Seq("seg", "bal"), tbl, s"$root/ckpt")
    // ONE batch: key 1 changes on day 5 AND day 7; key 2 on day 9 (the
    // batch max a single-apply form would wrongly stamp everyone with)
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1, "A", 1.0, 5), row(1, "A", 2.0, 7), row(2, "B", 5.0, 9))
        .mkString("\n"))
    q.processAllAvailable()
    val hist1 = graft.store.Versioned.read(spark, tbl)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    // one key, days {5, 7}, one batch → a CLOSED day-5 row and an OPEN
    // day-7 row, each stamped with its own day
    assert(hist1 == Seq(
      (1L, "A", 1.0, 5L, Some(7L)),
      (1L, "A", 2.0, 7L, None),
      (2L, "B", 5.0, 9L, None)), hist1.toString)
    // a later day-8 update for key 1 must APPLY (8 > its own open day 7);
    // under a batch-max stamp its open row would read day 9 and the
    // legitimate update would be mis-dropped as stale
    Files.writeString(Paths.get(s"$in/b2.jsonl"), row(1, "A", 3.0, 8))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val hist2 = graft.store.Versioned.read(spark, tbl)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(hist2 == Seq(
      (1L, "A", 1.0, 5L, Some(7L)),
      (1L, "A", 2.0, 7L, Some(8L)),
      (1L, "A", 3.0, 8L, None),
      (2L, "B", 5.0, 9L, None)), hist2.toString)
  }

  test("streaming data card converges to the batch rollup across micro-batches") {
    import MicroBatch.DocEvent
    val root = Files.createTempDirectory("card_stream").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in).as[DocEvent]
    val q = MicroBatch.dataCardStream(src)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("card_stream").start()
    def doc(id: Long, text: String, s: String) =
      s"""{"doc_id":$id,"text":"$text","source":"$s"}"""
    val texts = Seq(
      (0L, "the morning light settles across the quiet harbor", "sA"),
      (1L, "one two three", "sA"),
      (2L, "the cat is here now and the dog is too", "sB"),
      (3L, "gulls wheel over the nets spread to dry", "sA"))
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      texts.take(2).map(t => doc(t._1, t._2, t._3)).mkString("\n"))
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      texts.drop(2).map(t => doc(t._1, t._2, t._3)).mkString("\n"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    // latest update per source == the batch data card on the full corpus
    val streamed = spark.table("card_stream")
      .groupBy($"source").agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"n_docs", $"n_tokens", $"mean_quality")).as("s"))
      .select($"source", $"s.n_docs", $"s.n_tokens", $"s.mean_quality")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val batch = graft.llm.TextAnalysis.dataCard(texts.toDF("doc_id", "text", "source"))
      .select($"source", $"n_docs", $"n_tokens", $"mean_quality")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(streamed.keySet == Set("sA", "sB"))
    for (s <- streamed.keySet) {
      assert(streamed(s)._2 == batch(s)._2 && streamed(s)._3 == batch(s)._3, s)
      assert(math.abs(streamed(s)._4 - batch(s)._4) < 1e-9,
        s"$s: ${streamed(s)._4} != ${batch(s)._4}")
    }
  }

  test("mapGroupsWithState keeps per-customer state across micro-batches (T4)") {
    import MicroBatch.{CustomerUpdate, Interaction}
    val root = Files.createTempDirectory("state").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("customer_id", IntegerType), StructField("rating", IntegerType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in).as[Interaction]
    val q = MicroBatch.customerRunningState(src)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("cust_state").start()
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      """{"customer_id":1,"rating":1}
        |{"customer_id":1,"rating":2}
        |{"customer_id":2,"rating":5}""".stripMargin)
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      """{"customer_id":1,"rating":5}
        |{"customer_id":2,"rating":1}""".stripMargin)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val last = spark.table("cust_state").as[CustomerUpdate].collect()
      .groupBy(_.customer_id).view.mapValues(_.maxBy(_.total)).toMap
    // customer 1: 3 interactions, streak reset by the rating-5 batch
    assert(last(1).total == 3 && last(1).negativeStreak == 0)
    // customer 2: 2 interactions, currently on a 1-negative streak
    assert(last(2).total == 2 && last(2).negativeStreak == 1)
  }

  test("streaming exact dedup drops duplicate keys across micro-batches, bounded state") {
    val root = Files.createTempDirectory("sdedup").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("event_time", TimestampType)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
    val q = MicroBatch.dedupStream(src, Seq("id"), "event_time")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("sdedup").start()
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      """{"id":1,"event_time":"2024-01-01T00:00:00Z"}
        |{"id":1,"event_time":"2024-01-01T00:01:00Z"}
        |{"id":2,"event_time":"2024-01-01T00:02:00Z"}""".stripMargin)
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      """{"id":2,"event_time":"2024-01-01T00:30:00Z"}
        |{"id":3,"event_time":"2024-01-01T00:31:00Z"}""".stripMargin)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    // id 1's same-batch dup and id 2's cross-batch dup both dropped
    val ids = spark.table("sdedup").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment: broadcast dim attrs attached per micro-batch, unmatched keys kept") {
    val root = Files.createTempDirectory("enrich").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("customer_id", LongType), StructField("amount", LongType)))
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("customer_id", "tier")
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
    val q = MicroBatch.enrichStream(src, dim, Seq("customer_id"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("enriched").start()
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      """{"customer_id":1,"amount":10}
        |{"customer_id":9,"amount":20}""".stripMargin)
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      """{"customer_id":2,"amount":30}""".stripMargin)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val rows = spark.table("enriched")
      .select($"customer_id", $"amount", $"tier")
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, 10L, Some("gold")),
      (2L, 30L, Some("basic")),
      (9L, 20L, None))) // late-dimension key kept with null attrs
  }

  test("stream-stream interval join: clicks attribute to impressions within the window") {
    val root = Files.createTempDirectory("ssjoin").toString
    val impDir = s"$root/imp"; val clkDir = s"$root/clk"
    Files.createDirectories(Paths.get(impDir)); Files.createDirectories(Paths.get(clkDir))
    val impSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("imp_time", TimestampType)))
    val clkSchema = StructType(Seq(
      StructField("ad_id", LongType), StructField("click_time", TimestampType)))
    val imps = spark.readStream.schema(impSchema).option("maxFilesPerTrigger", 1).json(impDir)
    val clks = spark.readStream.schema(clkSchema).option("maxFilesPerTrigger", 1).json(clkDir)
    val q = MicroBatch.intervalJoinStreams(imps, clks, "ad_id", "imp_time", "click_time")
      .select($"l.ad_id".as("ad_id"), $"imp_time", $"click_time")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("attributed").start()
    Files.writeString(Paths.get(s"$impDir/i1.jsonl"),
      """{"ad_id":1,"imp_time":"2024-01-01T00:00:00Z"}
        |{"ad_id":2,"imp_time":"2024-01-01T00:00:00Z"}""".stripMargin)
    Files.writeString(Paths.get(s"$clkDir/c1.jsonl"),
      """{"ad_id":1,"click_time":"2024-01-01T00:05:00Z"}
        |{"ad_id":2,"click_time":"2024-01-01T00:20:00Z"}
        |{"ad_id":3,"click_time":"2024-01-01T00:02:00Z"}""".stripMargin)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val rows = spark.table("attributed").select($"ad_id").as[Long].collect().toSeq
    // ad 1 clicks inside 10 min -> attributed; ad 2 at +20 min -> outside;
    // ad 3 has no impression -> no match
    assert(rows == Seq(1L))
  }

  test("streaming sessionization: gap closes sessions, late-but-in-gap rows merge") {
    val root = Files.createTempDirectory("ssess").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
    val q = MicroBatch.sessionizeStream(src, "user_id", "ts", gap = "10 minutes")
      .writeStream.outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("sessions").start()
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      """{"user_id":1,"ts":"2024-01-01T00:00:00Z"}
        |{"user_id":1,"ts":"2024-01-01T00:05:00Z"}
        |{"user_id":1,"ts":"2024-01-01T00:30:00Z"}
        |{"user_id":2,"ts":"2024-01-01T00:00:00Z"}""".stripMargin)
    q.processAllAvailable()
    // a late row inside user 1's first session gap extends/merges it
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      """{"user_id":1,"ts":"2024-01-01T00:08:00Z"}""".stripMargin)
    q.processAllAvailable()
    q.stop(); q.awaitTermination()
    val sess = spark.table("sessions")
      .select($"user_id", $"n_events").as[(Long, Long)].collect().sorted.toSeq
    // user 1: session {00:00,00:05,00:08} (3 events) + session {00:30};
    // user 2: one singleton session
    assert(sess == Seq((1L, 1L), (1L, 3L), (2L, 1L)))
  }

  test("session ingest: boundary sessions merge across batches; wipe-and-replay is a no-op") {
    val root = Files.createTempDirectory("sess_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val M = 60L * 1000000 // one minute in micros
    def run(): Unit = {
      val q = MicroBatch.sessionIngestStream(spark, in, schema,
        gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def row(e: Long, u: Long, tMin: Long) =
      s"""{"event_id":$e,"user_id":$u,"ts_us":${tMin * M}}"""
    // batch 1: user 1 has an open 2-event session ending t=20; user 2
    // closes one in-batch (gap 0->50 > 30) and leaves one open
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1, 1, 0), row(2, 1, 20), row(3, 2, 0), row(4, 2, 50)).mkString("\n"))
    run()
    // batch 2: user 1's t=45 continues the open session (gap 25 <= 30);
    // user 2's t=100 starts a NEW session (gap 50 > 30); user 3 appears
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(row(5, 1, 45), row(6, 2, 100), row(7, 3, 0)).mkString("\n"))
    run()
    def sessions() = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .unionByName(graft.store.Versioned.read(spark, s"$root/open")
        .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us"))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val want = Seq(
      (1L, 1L, 3L, 0 * M, 45 * M),   // merged across the batch boundary
      (2L, 1L, 1L, 0 * M, 0 * M),
      (2L, 2L, 1L, 50 * M, 50 * M),  // closed by batch 2's gap
      (2L, 3L, 1L, 100 * M, 100 * M),
      (3L, 1L, 1L, 0 * M, 0 * M))
    assert(sessions() == want, s"got ${sessions()}")
    // wipe the checkpoint: the file source redelivers EVERY file; the
    // per-user (ts, event_id) watermark must neutralize the whole replay
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    assert(sessions() == want, s"replay changed state: ${sessions()}")
  }

  test("monotonicBatchKey: late-deriving batches key above the watermark, in-order batches reset") {
    // in-order: derived above the last committed key passes through
    assert(MicroBatch.monotonicBatchKey("b_09", Some("b_05")) == "b_09")
    // nothing committed yet / legacy snapshot: derived passes through
    assert(MicroBatch.monotonicBatchKey("b_09", Some("")) == "b_09")
    assert(MicroBatch.monotonicBatchKey("b_09", None) == "b_09")
    // late new-user batch deriving BELOW (or AT) the watermark: suffix —
    // strictly above in the lexicographic order the orphan sweep uses
    assert(MicroBatch.monotonicBatchKey("b_03", Some("b_05")) == "b_05_r0000000001")
    assert(MicroBatch.monotonicBatchKey("b_05", Some("b_05")) == "b_05_r0000000001")
    // consecutive late batches BUMP the fixed-width counter (constant
    // key length — a chained append would grow the dir name per late
    // batch until the filesystem's name limit wedged the stream)
    assert(MicroBatch.monotonicBatchKey("b_03", Some("b_05_r0000000001"))
      == "b_05_r0000000002")
    assert(MicroBatch.monotonicBatchKey("b_03", Some("b_05_r0000000002"))
      == "b_05_r0000000003")
    assert("b_05_r0000000002" > "b_05_r0000000001" && "b_05_r0000000001" > "b_05")
    // an in-order batch after a bumped run resets to its derived key
    assert(MicroBatch.monotonicBatchKey("b_09", Some("b_05_r0000000002")) == "b_09")
    // counter exhaustion fails LOUDLY: an 11-digit bump would sort BELOW
    // the 10-digit watermark and silently break the orphan-sweep
    // invariant (duplicate closed sessions), so the boundary must throw
    assert(MicroBatch.monotonicBatchKey("b_03", Some("b_05_r9999999998"))
      == "b_05_r9999999999")
    intercept[IllegalArgumentException] {
      MicroBatch.monotonicBatchKey("b_03", Some("b_05_r9999999999"))
    }
  }

  test("session ingest: late new-user batch commits ABOVE the watermark (orphan sweep stays sound)") {
    // user 2's events are HOURS behind user 1's, and user 2 is brand-new
    // (no per-user hi-watermark drops them) — the derived batch key
    // would sort below batch 1's commit key, putting a would-be crash
    // orphan below the sweep's watermark; the monotonic key must land
    // the partition strictly above it instead
    val root = Files.createTempDirectory("sess_late_batch").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val M = 60L * 1000000
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    def run(): Unit = {
      val q = MicroBatch.sessionIngestStream(spark, in, schema,
        gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def row(e: Long, u: Long, tMin: Long) =
      s"""{"event_id":$e,"user_id":$u,"ts_us":${tMin * M}}"""
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(row(1, 1, 1000), row(2, 1, 1001)).mkString("\n"))
    run()
    def maxCommitKey() = graft.store.Versioned.read(spark, s"$root/open")
      .agg(max($"commit_key")).as[String].head()
    val k1 = maxCommitKey()
    // batch 2: new user 2, all events far in the past; the 90-min
    // in-batch gap closes one session, so a partition IS written
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(row(3, 2, 10), row(4, 2, 100)).mkString("\n"))
    run()
    val k2 = maxCommitKey()
    assert(k2 > k1, s"late batch's commit key must exceed the watermark: $k2 <= $k1")
    assert(k2 == k1 + "_r0000000001", s"expected suffix form, got $k2 vs $k1")
    val dirs = Option(new java.io.File(s"$root/closed").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("batch_key=")).map(_.getName).sorted
    assert(dirs == Seq(s"batch_key=$k2"), s"closed layout: $dirs")
    // and the closure itself is the late user's session
    val closed = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(closed == Seq((2L, 1L, 1L, 10 * M, 10 * M)), s"got $closed")
  }

  test("session ingest: lost open snapshot over migrated legacy history REFUSES the first-batch sweep") {
    // open state lost out of band while a batch_key=_legacy history
    // survives: a single crashed FIRST batch can never produce this
    // (legacy migration implies a prior deployment, which had an open
    // snapshot), so proceeding would re-close every legacy session as
    // a duplicate — the stream must refuse, loudly, and leave the
    // closed table untouched
    val root = Files.createTempDirectory("sess_lost_open").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val M = 60L * 1000000
    Seq((1L, 1L, 2L, 0L, 10 * M))
      .toDF("user_id", "session_idx", "n_events", "start_us", "end_us")
      .write.parquet(s"$root/closed/batch_key=_legacy")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      s"""{"event_id":9,"user_id":1,"ts_us":${500 * M}}""")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val q = MicroBatch.sessionIngestStream(spark, in, schema,
      gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
      checkpointDir = s"$root/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    var c: Throwable = ex; var found = false; var depth = 0
    while (c != null && depth < 10 && !found) {
      found = c.isInstanceOf[IllegalStateException] && c.getMessage != null &&
        c.getMessage.contains("unreachable from a single crashed batch")
      c = c.getCause; depth += 1
    }
    assert(found, s"expected the refusal IllegalStateException, got: $ex")
    // the legacy history survives the refusal byte-identical in content
    val kept = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(kept == Seq((1L, 1L, 2L, 0L, 10 * M)), s"legacy history touched: $kept")
  }

  test("session ingest: lost open snapshot over a BUMP-SUFFIXED partition REFUSES the sweep") {
    // a _r########## key is unreachable from a first batch (the first
    // batch sees watermark "" and monotonicBatchKey never bumps), so a
    // single bump-suffixed partition under a missing open dir proves
    // committed history was lost out of band — the one-crashed-batch
    // sweep would DELETE that committed partition; it must refuse
    val root = Files.createTempDirectory("sess_lost_open_bump").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val M = 60L * 1000000
    Seq((1L, 1L, 2L, 0L, 10 * M))
      .toDF("user_id", "session_idx", "n_events", "start_us", "end_us")
      .write.parquet(s"$root/closed/batch_key=b_${"0" * 18}600000000_${"0" * 19}2_r0000000001")
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      s"""{"event_id":9,"user_id":1,"ts_us":${500 * M}}""")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val q = MicroBatch.sessionIngestStream(spark, in, schema,
      gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
      checkpointDir = s"$root/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    var c: Throwable = ex; var found = false; var depth = 0
    while (c != null && depth < 10 && !found) {
      found = c.isInstanceOf[IllegalStateException] && c.getMessage != null &&
        c.getMessage.contains("unreachable from a single crashed batch")
      c = c.getCause; depth += 1
    }
    assert(found, s"expected the refusal IllegalStateException, got: $ex")
    // the committed bumped partition survives the refusal
    val kept = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(kept == Seq((1L, 1L, 2L, 0L, 10 * M)), s"committed history touched: $kept")
  }

  test("session ingest: legacy upgrade batch over a DATALESS closed dir runs, not a schema-inference wedge") {
    // the one transitional batch: a commit_key-less open snapshot takes
    // the old (user_id, start_us) anti-join path — which must be guarded
    // on actual data partitions, because a closedDir that exists with a
    // fileless batch_key dir (crashed legacy write, deleted part files)
    // would otherwise throw 'Unable to infer schema' on EVERY restart
    val root = Files.createTempDirectory("sess_legacy_empty").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val M = 60L * 1000000
    // legacy open snapshot: pre-commit_key schema, one open session
    graft.store.Versioned.overwrite(
      Seq((1L, 1L, 2L, 0L, 10 * M, 10 * M, 2L))
        .toDF("user_id", "session_idx", "n_events", "start_us", "end_us",
          "hi_us", "hi_eid"),
      s"$root/open")
    // closedDir exists, holds a partition dir with ZERO data files
    Files.createDirectories(Paths.get(s"$root/closed/batch_key=_legacy"))
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      s"""{"event_id":5,"user_id":1,"ts_us":${100 * M}}""")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val q = MicroBatch.sessionIngestStream(spark, in, schema,
      gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
      checkpointDir = s"$root/ckpt")
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    // the 90-min gap closed the legacy open session; the new open row is
    // commit_key-stamped, so every later batch takes the O(1) sweep path
    val closed = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(closed == Seq((1L, 1L, 2L, 0L, 10 * M)), s"got $closed")
    val open = graft.store.Versioned.read(spark, s"$root/open")
      .select($"user_id", $"session_idx", $"n_events", $"commit_key".isNotNull)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(open == Seq((1L, 2L, 1L, true)), s"got $open")
  }

  test("MG ingest: sketch state folds across batches; wipe-and-replay leaves the snapshot intact") {
    val root = Files.createTempDirectory("mg_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(): Unit = {
      val q = MicroBatch.mgIngestStream(spark, in, schema, "text", k = 4,
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    // "hot" dominates batch 1 and KEEPS dominating through batch 2's
    // noise — with k=4 and N=40, retention covers anything over N/5=8
    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(doc(1, ("hot " * 12).trim), doc(2, "n1 n2 n3 n4")).mkString("\n"))
    run()
    Files.writeString(Paths.get(s"$in/b2.jsonl"),
      Seq(doc(3, ("hot " * 8).trim + " m1 m2 m3 m4"), doc(4, "p1 p2 p3 p4 p5 p6 p7 p8")).mkString("\n"))
    run()
    def snap() = graft.store.Versioned.read(spark, s"$root/state")
      .select($"kind", $"token", $"cnt").as[(String, String, Long)].collect().sorted.toSeq
    val s1 = snap()
    val counters = s1.filter(_._1 == "cnt")
    assert(counters.map(_._2).contains("hot"),
      s"'hot' (tf=20 > N/(k+1)=8) must survive the cross-batch merge: $s1")
    assert(counters.size <= 4, s"summary over k: $counters")
    // both landed files retired behind one compacted watermark row
    assert(s1.filter(t => t._1 == "file" || t._1 == "hwm").map(t => (t._1, t._2))
      == Seq(("hwm", "b2.jsonl")), s"compacted ledger expected: $s1")
    // wipe the checkpoint: the source redelivers both files; the in-
    // snapshot file ledger must make the whole replay a no-op
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    assert(snap() == s1, s"replay changed the snapshot: ${snap()} vs $s1")
  }

  test("triangle ingest: multi-new-edge closures count once; wipe-and-replay is a no-op") {
    val root = Files.createTempDirectory("tri_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("o", LongType), StructField("p", LongType)))
    def run(): Unit = {
      val q = MicroBatch.triangleIngestStream(spark, in, schema,
        edgesDir = s"$root/edges", stateDir = s"$root/state",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def cnt(): Long = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "cnt").select($"n").head().getLong(0)
    def basket(o: Long, ps: Long*): String = ps.map(p => s"""{"o":$o,"p":$p}""").mkString("\n")
    // batch 1: basket {1,2,3} -> triangle with ALL THREE edges new in
    // one batch (worst attribution case: must count exactly once)
    Files.writeString(Paths.get(s"$in/b1.jsonl"), basket(100, 1, 2, 3))
    run(); assert(cnt() == 1L, s"after b1: ${cnt()}")
    // batch 2: basket {2,3,4} -> edge (2,3) already exists; the new
    // edges (2,4),(3,4) close ONE triangle using one old + two new
    Files.writeString(Paths.get(s"$in/b2.jsonl"), basket(200, 2, 3, 4))
    run(); assert(cnt() == 2L, s"after b2: ${cnt()}")
    // batch 3: basket {1,4} -> single new edge closes TWO triangles
    // ({1,2,4} and {1,3,4}) against purely old adjacency
    Files.writeString(Paths.get(s"$in/b3.jsonl"), basket(300, 1, 4))
    run(); assert(cnt() == 4L, s"after b3: ${cnt()}")
    // wipe the checkpoint: full redelivery must be invisible (the file
    // ledger lives inside the counter's own snapshot)
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run(); assert(cnt() == 4L, s"after replay: ${cnt()}")
    // and the counter equals a from-scratch recount of the edge table
    val edges = spark.read.parquet(s"$root/edges").select($"a", $"b").distinct()
    assert(graft.ops.Graph.triangleCount(edges).head().getLong(0) == 4L)
  }

  test("triangle ingest: unledgered orphan edges are invisible and prune at the scan") {
    val root = Files.createTempDirectory("tri_orphan").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("o", LongType), StructField("p", LongType)))
    def run(): Unit = {
      val q = MicroBatch.triangleIngestStream(spark, in, schema,
        edgesDir = s"$root/edges", stateDir = s"$root/state",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def cnt(): Long = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "cnt").select($"n").head().getLong(0)
    def basket(o: Long, ps: Long*): String = ps.map(p => s"""{"o":$o,"p":$p}""").mkString("\n")
    Files.writeString(Paths.get(s"$in/b1.jsonl"), basket(100, 1, 2, 3))
    Files.writeString(Paths.get(s"$in/b2.jsonl"), basket(200, 1, 4))
    run(); assert(cnt() == 1L)
    // edge table is hive-partitioned by src_file — the layout the O(1)
    // ledger-complement filter's partition pruning depends on
    val parts = new java.io.File(s"$root/edges").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.startsWith("src_file=")), parts.mkString(","))
    // simulate a crash between the edge append and the snapshot flip:
    // edge (4,5) lands under a src_file the ledger never recorded
    Seq((4L, 5L)).toDF("a", "b")
      .withColumn("src_file", lit("file:///crashed/never_ledgered.jsonl"))
      .write.partitionBy("src_file").mode("append").parquet(s"$root/edges")
    // the stream's own read path must exclude the orphan via a scan-level
    // partition filter (NOT IN over the bounded complement), not a
    // ledger-sized IN list
    val pruned = spark.read.parquet(s"$root/edges")
      .filter(!$"src_file".isin("file:///crashed/never_ledgered.jsonl"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("src_file"),
      s"orphan exclusion must reach PartitionFilters:\n$scan")
    // land a basket whose new edge (1,5) closes a triangle ONLY IF the
    // orphan is visible: {1,4,5} needs old (1,4) + orphan (4,5) + new (1,5)
    Files.writeString(Paths.get(s"$in/b3.jsonl"), basket(300, 1, 5))
    run()
    assert(cnt() == 1L, s"orphan edge leaked into the union graph: ${cnt()}")
    // once the orphan's triangle re-lands THROUGH the stream it counts
    Files.writeString(Paths.get(s"$in/b4.jsonl"), basket(400, 4, 5))
    run(); assert(cnt() == 2L, s"after legitimate (4,5): ${cnt()}")
  }

  test("video ingest: scene index and corrupt counter are exactly-once across batches and replays") {
    val root = Files.createTempDirectory("video_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("payload_b64", StringType)))
    val codec = new graft.llm.Multimodal.VideoCodec.Codec
    def b64(bytes: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(bytes)
    // clip(id): 4 frames, scenes of length 2 (base jump 200 at frame 2)
    def clip(id: Long): String = {
      val avi = codec.encodeGrayAvi(8, 8, 24, 1, 4,
        (f, x, y) => ((id + (f / 2) * 200L + y * 8 + x) % 256).toInt)
      s"""{"media_id":$id,"payload_b64":"${b64(avi)}"}"""
    }
    def corrupt(id: Long): String =
      s"""{"media_id":$id,"payload_b64":"${b64(s"junk-$id".getBytes)}"}"""
    def run(): Unit = {
      val q = MicroBatch.videoIngestStream(spark, in, schema,
        scenesDir = s"$root/scenes", stateDir = s"$root/state",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def corruptCount(): Long = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "corrupt").select($"n").head().getLong(0)
    def index(): Seq[(Long, Int, Long)] =
      MicroBatch.readSceneIndex(spark, s"$root/scenes", s"$root/state")
        .as[(Long, Int, Long)].collect().sorted.toSeq
    Files.writeString(Paths.get(s"$in/b1.jsonl"), Seq(clip(10), corrupt(11)).mkString("\n"))
    Files.writeString(Paths.get(s"$in/b2.jsonl"), Seq(clip(12), corrupt(13)).mkString("\n"))
    run()
    assert(corruptCount() == 2L)
    val idx = index()
    // each clip cuts exactly at frame 2 (the one scene boundary), with
    // the kernel's delta sum — pin one value against the formula
    assert(idx.map(t => (t._1, t._2)) == Seq((10L, 2), (12L, 2)), idx.toString)
    idx.foreach { case (id, f, d) =>
      val exp = (for (y <- 0 until 8; x <- 0 until 8) yield {
        val v = (s: Long) => (id + s * 200L + y * 8 + x) % 256
        math.abs(v(f / 2) - v((f - 1) / 2))
      }).sum
      assert(d == exp, s"id $id delta")
    }
    // wipe the checkpoint: full redelivery must change neither artifact
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    assert(corruptCount() == 2L, "corrupt counter double-applied on replay")
    assert(index() == idx, "scene index changed on replay")
    // a crash between the index append and the snapshot flip leaves
    // rows under an unledgered source file — the read side must not
    // serve them (same complement filter the triangle stream reads through)
    Seq((99L, 1, 12345L)).toDF("media_id", "frame_idx", "delta_sum")
      .withColumn("src_file", lit("file:///crashed/never_ledgered.jsonl"))
      .write.partitionBy("src_file").mode("append").parquet(s"$root/scenes")
    assert(index() == idx, "unledgered orphan rows leaked into the scene index")
  }

  test("image ingest: incremental near-dup pairs surface exactly once, any batching") {
    val root = Files.createTempDirectory("img_ingest").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("payload_b64", StringType)))
    val codec = new graft.llm.Multimodal.ImageCodec.Codec
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def pixel(seed: Long, shift: Int)(x: Int, y: Int): Int = {
      val d = md.digest(s"$seed:${y * 8 + x}:test".getBytes("UTF-8"))
      ((d(0) & 0xFF) + shift) % 256
    }
    def img(id: Long, seed: Long, shift: Int): String = {
      val b = java.util.Base64.getEncoder
        .encodeToString(codec.encodeGrayPng(8, 8, pixel(seed, shift)))
      s"""{"media_id":$id,"payload_b64":"$b"}"""
    }
    def run(): Unit = {
      val q = MicroBatch.imageIngestStream(spark, in, schema,
        hashesDir = s"$root/hashes", pairsDir = s"$root/pairs",
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def pairs(): Set[(Long, Long)] =
      MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state")
        .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSet
    // batch 1: image 10 and its within-batch brightness variant 11,
    // plus unrelated 12 and a corrupt payload 13
    Files.writeString(Paths.get(s"$in/b1.jsonl"), Seq(
      img(10, seed = 1, shift = 0), img(11, seed = 1, shift = 2),
      img(12, seed = 2, shift = 0),
      s"""{"media_id":13,"payload_b64":"${java.util.Base64.getEncoder.encodeToString("junk".getBytes)}"}"""
    ).mkString("\n"))
    run()
    assert(pairs() == Set((10L, 11L)), s"within-batch pair: ${pairs()}")
    // simulate a crash between the artifact appends and the snapshot
    // flip for the UPCOMING file: poisoned half-written rows land under
    // b2's src_file tag with no ledger entry. They must stay invisible
    // now, and b2's real processing must REPLACE them (dynamic
    // partition overwrite), not append alongside
    val b1Path = new java.io.File(s"$root/hashes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("src_file="))
      .map(f => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(f.getName.stripPrefix("src_file=")))
      .head
    val b2Path = b1Path.replace("b1.jsonl", "b2.jsonl")
    Seq((999L, 1000L, 0)).toDF("id_a", "id_b", "hamming")
      .withColumn("src_file", lit(b2Path))
      .write.partitionBy("src_file").mode("append").parquet(s"$root/pairs")
    Seq((999L, 42L)).toDF("media_id", "dhash")
      .withColumn("src_file", lit(b2Path))
      .write.partitionBy("src_file").mode("append").parquet(s"$root/hashes")
    assert(pairs() == Set((10L, 11L)), s"unledgered orphan rows leaked: ${pairs()}")
    // batch 2: a CROSS-batch variant of 10 and a variant of unrelated 12
    // -> both halves of the incremental join fire; (10,11) must NOT
    // re-surface
    Files.writeString(Paths.get(s"$in/b2.jsonl"), Seq(
      img(20, seed = 1, shift = 2), img(21, seed = 2, shift = 2)).mkString("\n"))
    run()
    // 20 pairs with both 10 (orig) and 11 (same-shift twin -> hamming 0)
    val expect = Set((10L, 11L), (10L, 20L), (11L, 20L), (12L, 21L))
    assert(pairs() == expect, s"after batch 2: ${pairs()}")
    val corrupt = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "corrupt").select($"n").head().getLong(0)
    assert(corrupt == 1L)
    // the poisoned orphan rows were REPLACED by b2's deterministic
    // processing — exact row counts, not just set membership
    val pairRows = MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state").count()
    assert(pairRows == expect.size.toLong,
      s"crash-window orphan rows survived the partition overwrite: $pairRows")
    val hashRows = MicroBatch.readImageHashes(spark, s"$root/hashes", s"$root/state")
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq
    assert(hashRows == Seq(10L, 11L, 12L, 20L, 21L),
      s"hash table rows after orphan replace: $hashRows")
    // wipe-and-replay is a no-op for both artifacts
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run()
    assert(pairs() == expect, "replay changed the pair table")
    assert(MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state").count()
      == expect.size.toLong, "replay duplicated pair rows")
    // the compacted ledger: both landed files retired behind one
    // high-watermark row — snapshot size is frontier-bounded, not
    // stream-age-bounded
    val ledgerRows = graft.store.Versioned.read(spark, s"$root/state")
      .filter($"kind" === "file" || $"kind" === "hwm")
      .select($"kind", $"key").as[(String, String)].collect().toSeq
    assert(ledgerRows == Seq(("hwm", "b2.jsonl")),
      s"ledger should compact to one watermark row: $ledgerRows")
  }

  test("image ingest: crash + RE-SLICED replay leaves no stale pair rows (empty-result replacement)") {
    // The reviewer scenario for the isEmpty-guard hole: a crashed batch
    // bundling TWO files wrote a cross-file pair tagged by the greater
    // id's file; the replay arrives re-sliced one file per batch, and
    // the batch holding the greater id alone finds NO pair — the
    // orphan partition must be DELETED (dropFreshOrphans), not skipped,
    // or it becomes visible stale data once its file's ledger row lands.
    val root = Files.createTempDirectory("img_reslice").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("payload_b64", StringType)))
    val codec = new graft.llm.Multimodal.ImageCodec.Codec
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def pix(seed: Long, shift: Int)(x: Int, y: Int): Int = {
      val d = md.digest(s"$seed:${y * 8 + x}:rs".getBytes("UTF-8"))
      ((d(0) & 0xFF) + shift) % 256
    }
    def img(id: Long, seed: Long, shift: Int): String = {
      val b = java.util.Base64.getEncoder
        .encodeToString(codec.encodeGrayPng(8, 8, pix(seed, shift)))
      s"""{"media_id":$id,"payload_b64":"$b"}"""
    }
    def run(mft: Int): Unit = {
      val q = MicroBatch.imageIngestStream(spark, in, schema,
        hashesDir = s"$root/hashes", pairsDir = s"$root/pairs",
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt",
        maxFilesPerTrigger = mft)
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    Files.writeString(Paths.get(s"$in/b1.jsonl"), img(10, seed = 1, shift = 0))
    run(mft = 2)
    // b2 holds the GREATER id (100), b3 its near-dup twin (50): bundled
    // in one batch, the (50,100) pair is tagged b2 (greater id's file)
    Files.writeString(Paths.get(s"$in/b2.jsonl"), img(100, seed = 9, shift = 0))
    Files.writeString(Paths.get(s"$in/b3.jsonl"), img(50, seed = 9, shift = 2))
    run(mft = 2)
    def pairRows() = MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state")
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSeq.sorted
    assert(pairRows() == Seq((50L, 100L)), s"bundled batch: ${pairRows()}")
    // crash between the artifact appends and the snapshot flip: roll
    // the state pointer back past the {b2,b3} batch and wipe the
    // checkpoint — the pair partition tagged b2 is now an orphan
    val n = graft.store.Versioned.currentVersion(s"$root/state").get
    Files.writeString(Paths.get(s"$root/state/CURRENT"), (n - 1).toString)
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    // replay RE-SLICED one file per batch: the {b2} batch finds no pair
    // (50 is not visible yet) and must REMOVE the stale b2 partition;
    // the {b3} batch then re-finds (50,100) tagged b3 — exactly once
    run(mft = 1)
    assert(pairRows() == Seq((50L, 100L)),
      s"re-sliced replay duplicated or lost the pair: ${pairRows()}")
    val hashes = MicroBatch.readImageHashes(spark, s"$root/hashes", s"$root/state")
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq
    assert(hashes == Seq(10L, 50L, 100L), s"hash rows: $hashes")
  }

  test("session ingest: crash + RE-BUNDLED replay leaves no duplicate closed sessions") {
    // The batch-key close is exactly-once even when the replay bundles
    // the crashed file with a NEW one (different batch key): partitions
    // above the open table's last committed key are crashed orphans and
    // are deleted before the rewrite.
    val root = Files.createTempDirectory("sess_rebundle").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts_us", LongType)))
    val M = 60L * 1000000
    def run(mft: Int): Unit = {
      val q = MicroBatch.sessionIngestStream(spark, in, schema,
        gapUs = 30 * M, openDir = s"$root/open", closedDir = s"$root/closed",
        checkpointDir = s"$root/ckpt", maxFilesPerTrigger = mft)
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def row(e: Long, u: Long, tMin: Long) =
      s"""{"event_id":$e,"user_id":$u,"ts_us":${tMin * M}}"""
    Files.writeString(Paths.get(s"$in/b1.jsonl"), row(1, 1, 0))
    run(mft = 1)
    // b2 closes user 1's first session (gap 100 > 30)
    Files.writeString(Paths.get(s"$in/b2.jsonl"), row(2, 1, 100))
    run(mft = 1)
    def closedRows() = spark.read.parquet(s"$root/closed")
      .select($"user_id", $"session_idx", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(closedRows() == Seq((1L, 1L, 1L, 0L, 0L)), s"setup: ${closedRows()}")
    // crash: closed partition for b2's batch written, open flip lost
    val n = graft.store.Versioned.currentVersion(s"$root/open").get
    Files.writeString(Paths.get(s"$root/open/CURRENT"), (n - 1).toString)
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    // a NEW file lands before the restart; the replay bundles b2 with
    // b3 into ONE batch whose key differs from the crashed write's
    Files.writeString(Paths.get(s"$in/b3.jsonl"), row(3, 1, 200))
    run(mft = 4)
    // t=200 closes the t=100 session too; history must hold each
    // session exactly once — the crashed b_<key(b2)> partition is gone
    assert(closedRows() == Seq((1L, 1L, 1L, 0L, 0L), (1L, 2L, 1L, 100 * M, 100 * M)),
      s"re-bundled replay duplicated closures: ${closedRows()}")
  }

  test("streaming negative-interaction alert fires at the threshold (T6)") {
    val root = Files.createTempDirectory("alert").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    // 5 negative (rating 1-2) in hour A, 2 in hour B, threshold 5
    val rows = (1 to 5).map(i => s"""{"customer_id":$i,"rating":1,"ts":"2024-07-15T10:0$i:00.000Z"}""") ++
      Seq("""{"customer_id":6,"rating":2,"ts":"2024-07-15T11:01:00.000Z"}""",
        """{"customer_id":7,"rating":1,"ts":"2024-07-15T11:02:00.000Z"}""",
        """{"customer_id":8,"rating":5,"ts":"2024-07-15T10:30:00.000Z"}""")
    Files.writeString(Paths.get(s"$in/i.jsonl"), rows.mkString("\n"))
    val schema = StructType(Seq(
      StructField("customer_id", IntegerType), StructField("rating", IntegerType),
      StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema).json(in)
    val alerts = MicroBatch.negativeAlertStream(src, "ts", "rating", threshold = 5)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("alerts_out").start()
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows; with a single batch
    // the 10:00 window closes via the max event time (11:02 - 2h watermark
    // keeps it open) — so check the complete-mode equivalent instead
    val q2 = MicroBatch.negativeAlertStream(
      spark.readStream.schema(schema).json(in), "ts", "rating", threshold = 5)
      .writeStream.outputMode("complete").format("memory").queryName("alerts_all").start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("alerts_all")
      .select(date_format($"hour_start", "HH").as("h"), $"negative_count")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("10", 5L))) // hour 11 has only 2 → below threshold
  }
}
