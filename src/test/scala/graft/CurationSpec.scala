package graft

import graft.llm.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog while the clever cat watches and " +
      "the birds sing songs of morning to the bright sun and the wind moves softly " +
      "through the tall green trees near the old stone wall by the winding river"
  private val goodNear = good.replace("winding river", "winding ocean") // J ≈ 0.9
  private val junk = "zz qq xx yy ww vv" // no stopwords, tiny → fails quality floor

  test("curation drops near-dups, format-dups and low-quality docs; attrition per stage") {
    val docs = Seq(
      (0L, good, "en", "s", good.length.toLong),
      (1L, good.toUpperCase, "en", "s", good.length.toLong), // format-dup → exact dedup
      (2L, goodNear, "en", "s", goodNear.length.toLong), // near-dup → LSH stage
      (3L, junk, "en", "s", junk.length.toLong), // quality reject
      (4L, ("der die das und ist immer wieder hier und der hund ist gut und das haus ist alt " * 4).trim, "de", "s", 100L), // language reject
      (5L, ("spam " * 100).trim, "en", "s", 499L) // dup-token frac 0.99 → repetition reject
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L))
    val report = Curation.report(docs).as[(String, Long)].collect().toMap
    assert(report == Map(
      "kept" -> 1L, "language_filter" -> 1L, "quality_filter" -> 1L,
      "repetition_filter" -> 1L, "exact_dedup" -> 1L, "near_dedup" -> 1L))
  }

  test("curation is idempotent: curating the curated corpus is a no-op") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val once = Curation.curate(docs)
    val twice = Curation.curate(once)
    assert(once.count() == twice.count())
  }

  test("annotate bounds its cache footprint to one survivor frame") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // DIFFERENT inputs per call — each produces a distinct survivor plan,
    // so the old frame must actually be released (the r3 version leaked
    // one persisted frame per call, session-lifetime); same-input repeats
    // share one CacheManager entry and are covered by the final repeat
    (1 to 2).foreach(i => Curation.curate(docs.filter($"doc_id" % 7 === i)).count())
    val cached = spark.sparkContext.getPersistentRDDs.size
    (3 to 5).foreach(i => Curation.curate(docs.filter($"doc_id" % 7 === i)).count())
    Curation.curate(docs.filter($"doc_id" % 7 === 5)).count() // same-input repeat
    assert(spark.sparkContext.getPersistentRDDs.size <= cached)
  }
}
