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

  test("curation drops near-dups, format-dups and low-quality docs; keeps attrition") {
    val docs = Seq(
      (0L, good, "en", "s", good.length.toLong),
      (1L, good.toUpperCase, "en", "s", good.length.toLong), // format-dup → exact dedup
      (2L, goodNear, "en", "s", goodNear.length.toLong), // near-dup → LSH stage
      (3L, junk, "en", "s", junk.length.toLong), // quality reject
      (4L, ("der die das und ist immer wieder hier und der hund ist gut und das haus ist alt " * 4).trim, "de", "s", 100L) // language reject
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = Curation.curate(docs)
    val kept = res.curated.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L))
    val report = res.report.as[(String, Long, Long)].collect()
      .map { case (s, i, o) => s -> (i, o) }.toMap
    assert(report("input") == ((5L, 5L)))
    assert(report("language_filter") == ((5L, 4L)))
    assert(report("quality_filter") == ((4L, 3L)))
    assert(report("exact_dedup") == ((3L, 2L)))
    assert(report("near_dedup") == ((2L, 1L)))
  }

  test("curation is idempotent: curating the curated corpus is a no-op") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val once = Curation.curate(docs).curated
    val twice = Curation.curate(once).curated
    assert(once.count() == twice.count())
  }
}
