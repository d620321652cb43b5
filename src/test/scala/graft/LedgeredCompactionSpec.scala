package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.Versioned
import graft.stream.MicroBatch

/** At-rest consolidation of retired stream partitions
  * (`MicroBatch.compactLedgeredTable`): a partition-per-landed-file
  * table stays O(open frontier + 1) hive dirs at any stream age, the
  * stream keeps reading/writing through it, and every crash window is
  * invisible to readers.
  */
class LedgeredCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType), StructField("payload_b64", StringType)))
  private def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)

  private def partNames(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("src_file="))
      .map(f => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(f.getName.stripPrefix("src_file="))).sorted

  test("image tables consolidate to one retired partition; the stream keeps joining through it") {
    val root = Files.createTempDirectory("compact_img").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val codec = new graft.llm.Multimodal.ImageCodec.Codec
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def pix(seed: Long, shift: Int)(x: Int, y: Int): Int = {
      val d = md.digest(s"$seed:${y * 8 + x}:cmp".getBytes("UTF-8"))
      ((d(0) & 0xFF) + shift) % 256
    }
    def img(id: Long, seed: Long, shift: Int) =
      s"""{"media_id":$id,"payload_b64":"${b64(codec.encodeGrayPng(8, 8, pix(seed, shift)))}"}"""
    def run(): Unit = {
      val q = MicroBatch.imageIngestStream(spark, in, mediaSchema,
        hashesDir = s"$root/hashes", pairsDir = s"$root/pairs",
        stateDir = s"$root/state", checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def hashes() = MicroBatch.readImageHashes(spark, s"$root/hashes", s"$root/state")
      .as[(Long, Long)].collect().sorted.toSeq
    def pairs() = MicroBatch.readImagePairs(spark, s"$root/pairs", s"$root/state")
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).sorted.toSeq

    Files.writeString(Paths.get(s"$in/b1.jsonl"),
      Seq(img(10, 1, 0), img(11, 1, 2)).mkString("\n"))
    Files.writeString(Paths.get(s"$in/b2.jsonl"), img(20, 2, 0))
    run()
    val h0 = hashes(); val p0 = pairs()
    assert(p0 == Seq((10L, 11L)) && h0.map(_._1) == Seq(10L, 11L, 20L))

    // an UNBLESSED consolidated dir (a crashed compaction's staging that
    // got as far as the move) must be invisible to reads
    Seq((666L, 1L)).toDF("media_id", "dhash")
      .withColumn("src_file", lit(MicroBatch.retiredValue("b2.jsonl")))
      .write.partitionBy("src_file").mode("append").parquet(s"$root/hashes")
    assert(hashes() == h0, "unblessed consolidation leaked into the read")

    // real compaction: replaces the crashed staging, blesses, reclaims
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/hashes", s"$root/state"))
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/pairs", s"$root/state"))
    assert(partNames(s"$root/hashes") == Seq("_retired:b2.jsonl"),
      s"hashes partitions: ${partNames(s"$root/hashes")}")
    assert(partNames(s"$root/pairs") == Seq("_retired:b2.jsonl"))
    assert(hashes() == h0 && pairs() == p0, "consolidation changed visible rows")
    // idempotent: nothing new to fold
    assert(!MicroBatch.compactLedgeredTable(spark, s"$root/hashes", s"$root/state"))

    // the stream continues: a cross-batch near-dup of 10 must be found
    // by the band join reading the CONSOLIDATED hash partition
    Files.writeString(Paths.get(s"$in/b3.jsonl"), img(30, 1, 2))
    run()
    assert(pairs() == Seq((10L, 11L), (10L, 30L), (11L, 30L)),
      s"incremental join missed the consolidated side: ${pairs()}")
    // second compaction folds the old consolidation + b3's partition
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/hashes", s"$root/state"))
    assert(partNames(s"$root/hashes") == Seq("_retired:b3.jsonl"))
    assert(hashes().map(_._1) == Seq(10L, 11L, 20L, 30L))
    // pairs table: b3's pair partition is still per-file (pairs state
    // not yet compacted) — compact and confirm the single-dir layout
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/pairs", s"$root/state"))
    assert(partNames(s"$root/pairs") == Seq("_retired:b3.jsonl"))
    assert(pairs() == Seq((10L, 11L), (10L, 30L), (11L, 30L)))
  }

  test("triangle counter keeps incrementing against a consolidated edge table") {
    val root = Files.createTempDirectory("compact_tri").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(StructField("o", LongType), StructField("p", LongType)))
    def run(): Unit = {
      val q = MicroBatch.triangleIngestStream(spark, in, schema,
        edgesDir = s"$root/edges", stateDir = s"$root/state",
        checkpointDir = s"$root/ckpt")
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    def cnt(): Long = Versioned.read(spark, s"$root/state")
      .filter($"kind" === "cnt").select($"n").head().getLong(0)
    def basket(o: Long, ps: Long*): String = ps.map(p => s"""{"o":$o,"p":$p}""").mkString("\n")
    Files.writeString(Paths.get(s"$in/b1.jsonl"), basket(100, 1, 2, 3))
    Files.writeString(Paths.get(s"$in/b2.jsonl"), basket(200, 2, 3, 4))
    run(); assert(cnt() == 2L)
    assert(MicroBatch.compactLedgeredTable(spark, s"$root/edges", s"$root/state"))
    assert(partNames(s"$root/edges") == Seq("_retired:b2.jsonl"))
    // a single new edge closing triangles against purely CONSOLIDATED
    // adjacency: {1,2,4} and {1,3,4} via old (1,2),(2,4),(1,3),(3,4)
    Files.writeString(Paths.get(s"$in/b3.jsonl"), basket(300, 1, 4))
    run(); assert(cnt() == 4L, s"delta against consolidated edges: ${cnt()}")
    // wipe-and-replay stays a no-op with a consolidated table at rest
    graft.store.Lake.deleteRecursive(Paths.get(s"$root/ckpt"))
    run(); assert(cnt() == 4L)
    // the retired blessing survived the stream's own state rewrites
    val retired = Versioned.read(spark, s"$root/state")
      .filter($"kind" === "retired").select($"key").as[String].collect().toSeq
    assert(retired == Seq("edges:b2.jsonl"), s"blessing lost across batches: $retired")
  }
}
