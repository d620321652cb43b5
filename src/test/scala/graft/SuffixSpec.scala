package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.llm.Suffix

/** Suffix-array build and LRS against independent driver-side references. */
class SuffixSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  /** Driver-side reference: rank of each suffix by sorting the actual
    * suffix strings (what the DuckDB oracle does).
    */
  private def bruteRanks(text: String): Map[Int, Int] = {
    val sfx = (1 to text.length).map(p => (p, text.substring(p - 1)))
    sfx.sortBy(_._2).zipWithIndex.map { case ((p, _), i) => p -> (i + 1) }.toMap
  }

  /** Driver-side reference LRS: longest substring occurring >= 2 times,
    * O(n^2) over all start-pair common prefixes.
    */
  private def bruteLrs(text: String): Int = {
    val n = text.length
    var best = 0
    for (i <- 0 until n; j <- (i + 1) until n) {
      var k = 0
      while (j + k < n && text.charAt(i + k) == text.charAt(j + k)) k += 1
      if (k > best) best = k
    }
    best
  }

  test("suffixRanks matches driver-side suffix sort on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 20)
    val got = Suffix.suffixRanks(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.nonEmpty)
    for ((id, text) <- texts; (p, rank) <- bruteRanks(text))
      assert(got((id, p)) == rank, s"doc $id pos $p: got ${got((id, p))}, want $rank")
    assert(got.size == texts.values.map(_.length).sum)
  }

  test("suffixRanks handles pathological repetition and tiny docs") {
    val cases = Seq(
      (1L, "aaaaaaaaaa"),   // all ranks decided only at the last doubling round
      (2L, "abababab"),
      (3L, "a"),            // single suffix
      (4L, "ba"),
      (5L, "mississippi"))
    val docs = cases.toDF("doc_id", "text")
    val got = Suffix.suffixRanks(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
    for ((id, text) <- cases; (p, rank) <- bruteRanks(text))
      assert(got((id, p)) == rank, s"doc $id pos $p: got ${got((id, p))}, want $rank")
  }

  test("longestRepeatedSubstring matches brute force") {
    val cases = Seq(
      (1L, "aaaaaaaaaa"),   // lrs = 9 ("a"*9 twice, overlapping)
      (2L, "abcabcabc"),
      (3L, "abcdefg"),      // nothing repeats -> 0
      (4L, "x"),            // no adjacent pair -> 0
      (5L, "banana"),
      (6L, "the cat sat on the mat the cat ran"))
    val docs = cases.toDF("doc_id", "text")
    val got = Suffix.longestRepeatedSubstring(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    for ((id, text) <- cases)
      assert(got(id) == bruteLrs(text), s"doc $id: got ${got(id)}, want ${bruteLrs(text)}")
    assert(got.size == 6)
  }

  test("longestRepeatedSubstring matches brute force on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 15)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Suffix.longestRepeatedSubstring(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    for ((id, text) <- texts)
      assert(got(id) == bruteLrs(text), s"doc $id: got ${got(id)}, want ${bruteLrs(text)}")
  }

  test("property: random small-alphabet corpora match driver-side suffix sort and brute LRS") {
    import org.scalacheck.Gen
    // a 2-3 letter alphabet forces heavy repetition: deep doubling
    // rounds, long tie chains, and nontrivial LRS in nearly every doc
    val textGen = for {
      n <- Gen.choose(1, 40)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    forAll(Gen.choose(2, 6).flatMap(k => Gen.listOfN(k, textGen))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val ranks = Suffix.suffixRanks(df, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
      for ((id, t) <- docs; (p, want) <- bruteRanks(t))
        assert(ranks((id, p)) == want, s"doc $id ('$t') pos $p")
      val lrs = Suffix.longestRepeatedSubstring(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      for ((id, t) <- docs)
        assert(lrs(id) == bruteLrs(t), s"doc $id ('$t'): got ${lrs(id)}, want ${bruteLrs(t)}")
    }
  }

  test("common_prefix_len edge semantics") {
    val df = Seq(("abcabd", 1L, 4L), ("abcabd", 4L, 1L), ("aaaa", 1L, 2L),
                 ("abc", 3L, 3L), ("ab", 1L, 2L)).toDF("t", "p1", "p2")
    val got = df.select(Suffix.lcp(col("t"), col("p1"), col("p2"))).as[Long].collect()
    // "abcabd": suffixes "abcabd" vs "abd" share "ab"; symmetric; overlap
    // counts self-match to end-of-string; identical offsets match to end
    assert(got.toSeq == Seq(2L, 2L, 3L, 1L, 0L))
  }

  test("materialized and declarative builds agree (seed + early exit vs full rounds)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").filter(col("doc_id") < 25)
    def key(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val eager = Suffix.suffixRanks(docs, "text", "doc_id").collect().map(key).toSet
    val lazyB = Suffix.suffixRanks(docs, "text", "doc_id", materializeRounds = false)
      .collect().map(key).toSet
    assert(eager == lazyB)
  }

  test("suffix family plans stay inside one doc partitioning (no cartesian, no global sort before ranks)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").filter(col("doc_id") < 50)
    val plan = Suffix.suffixRanks(docs, "text", "doc_id", materializeRounds = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    // every Exchange in the rank build must be hash(doc_id) -- a range/
    // single partition exchange would mean a corpus-wide sort snuck in
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(_ == "hashpartitioning"),
      s"unexpected exchange kinds: $exchanges\n$plan")
  }
}
