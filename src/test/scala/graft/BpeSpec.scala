package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.llm.Bpe

/** BPE vocabulary training vs an independent in-memory reference. */
class BpeSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  // naive reference trainer: same semantics, written against plain
  // collections with no shared code beyond the Merge shape
  private def naiveMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: naiveMerge(rest, a, b)
      case x :: rest => x :: naiveMerge(rest, a, b)
      case Nil => Nil
    }

  // code-point split (NOT split("")): the reference must agree with the
  // engine and the DuckDB oracle above the BMP
  private def cps(s: String): List[String] =
    s.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))

  private def naiveTrain(words: Map[String, Long], n: Int): List[(String, String, Long)] = {
    var state: List[(List[String], Long)] =
      words.toList.map { case (w, f) => (cps(w), f) }
    val out = mutable.ListBuffer.empty[(String, String, Long)]
    var t = 0
    var done = false
    while (t < n && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      state.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, cnt))
        state = state.map { case (syms, f) => (naiveMerge(syms, a, b), f) }
        t += 1
      }
    }
    out.toList
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("mergeOnce is greedy left-to-right, non-overlapping") {
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
    assert(Bpe.mergeOnce(Array("x"), "a", "b").toSeq == Seq("x"))
    assert(Bpe.mergeOnce(Array.empty[String], "a", "b").toSeq == Seq.empty)
  }

  test("trainer matches the naive reference on the classic corpus") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", nMerges = 8).map(m => (m.left, m.right, m.pairCount))
    val want = naiveTrain(wordFreqs(texts), 8)
    assert(got == want, s"got $got\nwant $want")
    // the cluster-side round loop is bit-identical to the driver-local one
    val dist = Bpe.train(docs, "text", nMerges = 8, distributedRounds = true)
      .map(m => (m.left, m.right, m.pairCount))
    assert(dist == got, s"distributed $dist != local $got")
    // and the first merges look like the published example's shape:
    // "es" then "est" dominate the newest/widest mass
    assert(got.head._1 == "e" && got.head._2 == "s", s"unexpected first merge: ${got.head}")
  }

  test("encoding a corpus word replays its final training state") {
    val docs = Seq((1L, "banana band bandana banana band")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 6)
    // final state via the naive path
    val finalState = wordFreqs(Seq("banana band bandana banana band")).map { case (w, _) =>
      var syms = cps(w)
      merges.foreach(m => syms = naiveMerge(syms, m.left, m.right))
      w -> syms
    }
    val encoded = Seq("banana", "band", "bandana").toDF("word")
      .select($"word", Bpe.encode($"word", merges).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    finalState.foreach { case (w, want) =>
      assert(encoded(w) == want, s"$w: ${encoded(w)} != $want")
    }
    // subwords always reassemble the word
    encoded.foreach { case (w, syms) => assert(syms.mkString == w) }
  }

  test("early stop: single-char vocabulary yields no merges") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", nMerges = 5).isEmpty)
  }

  test("BPE packing agrees with the token-budget query on subword counts") {
    val got = Bpe.queries("llm_pack_bpe")(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_subwords".cast("long")).as[(Long, Long)].collect().toMap
    val want = Bpe.queries("llm_bpe_tokens")(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_subwords").as[(Long, Long)].collect().toMap
    assert(got == want, "pack budgets must count the same subwords the token query reports")
    assert(got.nonEmpty)
  }

  test("fertility rolls the token query's subword counts up by language") {
    val fert = Bpe.queries("llm_bpe_fertility")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect()
    assert(fert.nonEmpty)
    // fertility ≥ 1 (a word is at least one subword) and exactly the ratio
    fert.foreach { case (lang, w, s, f) =>
      assert(s >= w && w > 0, s"$lang: $s subwords < $w words")
      assert(f == math.round(s.toDouble / w * 1e6) / 1e6, s"$lang ratio")
    }
    // totals agree with the per-doc token query
    val perDoc = Bpe.queries("llm_bpe_tokens")(spark, "/root/testdata/sf0.001")
      .agg(sum($"n_words"), sum($"n_subwords")).as[(Long, Long)].head()
    assert((fert.map(_._2).sum, fert.map(_._3).sum) == perDoc)
  }

  test("property: trainer ≡ naive trainer (ties, parens, astral plane; both round loops)") {
    // tiny alphabet forces heavy pair-count ties, exercising the
    // (count desc, left, right) tie-break end to end; parens are in the
    // alphabet because the ORACLE's old state encoding choked on them
    // (r4 advice) — words keep punctuation under whitespace splitting;
    // 𝕏 (U+1D54F, outside the BMP) catches any UTF-16 code-unit split
    // sneaking back into trainer, encoder, or naive reference
    val word = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "(", ")", "𝕏")).map(_.mkString))
    val corpus = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word))
    var sample = 0
    forAll(corpus) { words =>
      val text = words.mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val got = Bpe.train(docs, "text", nMerges = 4).map(m => (m.left, m.right, m.pairCount))
      assert(got == naiveTrain(wordFreqs(Seq(text)), 4))
      // the cluster round loop gets randomized coverage too (r5 advice) —
      // on a subsample, since Spark rounds cost whole jobs per merge
      if (sample % 3 == 0) {
        val dist = Bpe.train(docs, "text", nMerges = 4, distributedRounds = true)
          .map(m => (m.left, m.right, m.pairCount))
        assert(dist == got, s"distributed $dist != local $got on '$text'")
      }
      sample += 1
    }
  }
}
