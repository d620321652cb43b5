package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.{MediaRow, StubCodec}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(256)(_.toByte), 16, 16, 0, 1),
    MediaRow(2L, "audio", Array.tabulate(1024)(i => (i * 7).toByte), 0, 0, 16000, 0),
    MediaRow(3L, "video", Array.tabulate(4096)(i => (i * 3).toByte), 64, 64, 0, 16),
    MediaRow(4L, "image", Array.emptyByteArray, 0, 0, 0, 0)
  ).toDS()

  test("feature extraction: fixed dim, deterministic, empty-payload safe") {
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(feats.size == 4)
    assert(feats.values.forall(_.feature.length == StubCodec.FeatureDim))
    assert(feats(1L).n_bytes == 256)
    assert(feats(4L).n_bytes == 0)
    // deterministic across evaluations
    val again = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f.checksum).toMap
    assert(feats.view.mapValues(_.checksum).toMap == again)
  }

  test("stub codec honors its SQL contract: sha256-prefix values, ASCII corpus") {
    // sha256("abc") = ba7816bf8f01cfea...; checksum = first 15 hex chars
    assert(StubCodec.checksum("abc".getBytes("UTF-8")) ==
      java.lang.Long.parseLong("ba7816bf8f01cfe", 16))
    // feature 0 of a 1-byte payload: stride 1 → window = whole payload;
    // sha256("a") = ca978112ca1bbdca... → 0xca9781 / 2^24
    val f = StubCodec.decodeFeatures("a".getBytes("UTF-8"))
    assert(f.length == StubCodec.FeatureDim)
    assert(f(0) == java.lang.Long.parseLong("ca9781", 16).toFloat / (1 << 24))
    // the oracle equates VARCHAR substr with byte windows — valid iff the
    // documents corpus is pure ASCII
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(docs.filter(octet_length(col("text").cast("binary")) =!= length(col("text"))).count() == 0)
  }

  test("frame sampling: every stride-th fixed-size window") {
    val frames = Multimodal.sampleFrames(media.filter(_.media_id == 3L), frameBytes = 256, stride = 4)
      .collect()
    // 4096 / 256 = 16 frames, stride 4 → frames 0,4,8,12
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 4, 8, 12))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 256))
  }

  test("modality repartitioning spreads rows across partitions") {
    val df = Multimodal.repartitionByModality(media.toDF(), partitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 4)
  }

  test("payload dedup: byte-identical rips collapse to the lowest id") {
    val bytes = Array.tabulate(512)(_.toByte)
    val rows = Seq(
      MediaRow(5L, "image", bytes, 16, 16, 0, 1),
      MediaRow(9L, "image", bytes.clone(), 16, 16, 0, 1), // identical rip
      MediaRow(7L, "image", bytes.map(b => (b ^ 1).toByte), 16, 16, 0, 1)
    ).toDS()
    val got = Multimodal.payloadDedup(rows)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((5L, 2L, 512L), (7L, 1L, 0L)), got.toString)
  }
}
