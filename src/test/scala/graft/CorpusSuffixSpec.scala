package graft

import org.apache.spark.sql.functions._

import graft.llm.CorpusSuffix

/** Corpus-level (global) suffix ranks and cross-document overlap against
  * independent driver-side references.
  */
class CorpusSuffixSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  /** Driver-side reference: global DENSE rank of each (doc, pos) suffix
    * over suffix VALUES (equal suffixes share a rank).
    */
  private def bruteGlobalRanks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for ((id, t) <- docs; p <- 1 to t.length) yield ((id, p.toLong), t.substring(p - 1))
    val rankOf = sfx.map(_._2).distinct.sorted.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    sfx.map { case (k, s) => k -> rankOf(s) }.toMap
  }

  /** Driver-side reference: longest common substring between any two
    * DIFFERENT documents (O(n^2 len) over start pairs).
    */
  private def bruteCrossLcs(docs: Seq[(Long, String)]): Long = {
    var best = 0L
    for ((ia, a) <- docs; (ib, b) <- docs if ia < ib; i <- 0 until a.length; j <- 0 until b.length) {
      var k = 0
      while (i + k < a.length && j + k < b.length && a.charAt(i + k) == b.charAt(j + k)) k += 1
      if (k > best) best = k.toLong
    }
    best
  }

  private val fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a lazy dog sleeps while the quick brown cat watches"),
    (3L, "entirely unrelated text about glaciers"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact twin of 1 -> full-length tie
    (5L, "zz"))

  test("corpusSuffixRanks matches driver-side global suffix sort (with cross-doc ties)") {
    val docs = fixture.toDF("doc_id", "text")
    val got = CorpusSuffix.corpusSuffixRanks(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = bruteGlobalRanks(fixture)
    assert(got.size == want.size)
    for ((k, r) <- want)
      assert(got(k) == r, s"suffix $k: got ${got(k)}, want $r")
  }

  test("corpusSuffixRanks matches driver-side global sort on real documents") {
    val sample = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 12).select("doc_id", "text")
    val local = sample.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = CorpusSuffix.corpusSuffixRanks(sample, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = bruteGlobalRanks(local)
    assert(got == want)
  }

  test("crossDocAdjacent max equals brute-force longest cross-document substring") {
    val docs = fixture.toDF("doc_id", "text")
    val ranks = CorpusSuffix.corpusSuffixRanks(docs, "text", "doc_id")
    val adj = CorpusSuffix.crossDocAdjacent(ranks, docs, "text", "doc_id")
    val gotMax = adj.agg(max(col("shared_len"))).head().getLong(0)
    assert(gotMax == bruteCrossLcs(fixture), s"got $gotMax, want ${bruteCrossLcs(fixture)}")
    // the full-doc twin pair must surface with the whole document as overlap
    val full = adj.filter(col("shared_len") === fixture.head._2.length &&
      col("pos_a") === 1 && col("pos_b") === 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 4L)) || full == Set((4L, 1L)), s"got $full")
  }

  test("crossDocAdjacent on real documents matches brute force") {
    val sample = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 12).select("doc_id", "text")
    val local = sample.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ranks = CorpusSuffix.corpusSuffixRanks(sample, "text", "doc_id")
    val gotMax = CorpusSuffix.crossDocAdjacent(ranks, sample, "text", "doc_id")
      .agg(max(col("shared_len"))).head().getLong(0)
    assert(gotMax == bruteCrossLcs(local), s"got $gotMax, want ${bruteCrossLcs(local)}")
  }

  /** Per-doc reference: the longest substring doc `a` shares with ANY
    * other document.
    */
  private def bruteCrossMaxPerDoc(docs: Seq[(Long, String)]): Map[Long, Long] =
    docs.map { case (ia, a) =>
      var best = 0L
      for ((ib, b) <- docs if ib != ia; i <- 0 until a.length; j <- 0 until b.length) {
        var k = 0
        while (i + k < a.length && j + k < b.length && a.charAt(i + k) == b.charAt(j + k)) k += 1
        if (k > best) best = k.toLong
      }
      ia -> best
    }.toMap

  test("crossDocMax equals brute force per document (runs, ties, unrelated docs)") {
    val docs = fixture.toDF("doc_id", "text")
    val ranks = CorpusSuffix.corpusSuffixRanks(docs, "text", "doc_id")
    val got = CorpusSuffix.crossDocMax(ranks, docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = bruteCrossMaxPerDoc(fixture)
    assert(got == want, s"got $got want $want")
    // twins share their full length; the glacier doc shares only scraps
    assert(got(1L) == fixture.head._2.length && got(4L) == fixture.head._2.length)
    assert(got(3L) < 10)
  }

  test("crossDocMax on real documents matches brute force") {
    val sample = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 10).select("doc_id", "text")
    val local = sample.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ranks = CorpusSuffix.corpusSuffixRanks(sample, "text", "doc_id")
    val got = CorpusSuffix.crossDocMax(ranks, sample, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteCrossMaxPerDoc(local))
  }

  test("property: random small-alphabet corpora match global sort and per-doc cross max") {
    import org.scalacheck.Gen
    val textGen = for {
      n <- Gen.choose(1, 25)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    forAll(Gen.choose(2, 5).flatMap(k => Gen.listOfN(k, textGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val ranks = CorpusSuffix.corpusSuffixRanks(df, "text", "doc_id")
      val got = ranks.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == bruteGlobalRanks(docs), s"corpus $docs")
      val mx = CorpusSuffix.crossDocMax(ranks, df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(mx == bruteCrossMaxPerDoc(docs), s"corpus $docs: got $mx")
    }
  }

  test("clearCaches drops the suffix-rank memos and the queries rebuild identically") {
    val dir = "/root/testdata/sf0.001"
    // cold-start the memos so the block accounting below sees THIS build
    Engine.clearCaches(spark)
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val before = CorpusSuffix.corpusSaQuery(spark, dir).collect().map(_.toSeq).toSeq
    val beforePerDoc = graft.llm.Suffix.suffixArrayQuery(spark, dir).collect().map(_.toSeq).toSeq
    // the memos hold localCheckpoint-backed frames -> their blocks are
    // live persistent RDDs the clear must release PROMPTLY (r10 advice:
    // Dataset.unpersist alone leaves checkpointed blocks to the
    // ContextCleaner's GC whim)
    val created = spark.sparkContext.getPersistentRDDs.keySet -- pre
    assert(created.nonEmpty, "memo build should have checkpointed blocks")
    Engine.clearCaches(spark)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.intersect(created)
    assert(leaked.isEmpty, s"clearCaches left checkpointed RDD blocks live: $leaked")
    val after = CorpusSuffix.corpusSaQuery(spark, dir).collect().map(_.toSeq).toSeq
    val afterPerDoc = graft.llm.Suffix.suffixArrayQuery(spark, dir).collect().map(_.toSeq).toSeq
    assert(after == before && afterPerDoc == beforePerDoc)
  }

  test("cross_prefix_len edge semantics") {
    val df = Seq(("abcdef", 2L, "xbcde", 2L), ("abc", 1L, "abc", 1L),
                 ("abc", 3L, "zzc", 3L), ("a", 1L, "b", 1L)).toDF("ta", "pa", "tb", "pb")
    val got = df.select(CorpusSuffix.crossLcp(
      col("ta"), col("pa"), col("tb"), col("pb"))).as[Long].collect().toSeq
    assert(got == Seq(4L, 3L, 1L, 0L))
  }
}
