package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.llm.{Unigram, UnigramExprs}

/** Unigram-LM tokenizer vs an independent in-memory reference: the
  * Viterbi kernel against brute-force segmentation enumeration, the
  * trainer against hand-checkable corpora, and the determinism /
  * coverage contracts the DuckDB oracle rides on.
  */
class UnigramSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  // code-point split (NOT split("")): reference must agree with the
  // engine above the BMP
  private def cps(s: String): List[String] =
    s.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))

  // naive reference: enumerate EVERY vocab-covered segmentation, score
  // each by its left-to-right probability product (the same
  // multiplication order the DP uses, so products are bit-comparable)
  private def allSegs(syms: List[String], probs: Map[String, Double],
                      maxLen: Int): List[List[String]] =
    if (syms.isEmpty) List(Nil)
    else (1 to math.min(maxLen, syms.length)).toList.flatMap { l =>
      val piece = syms.take(l).mkString
      if (probs.contains(piece)) allSegs(syms.drop(l), probs, maxLen).map(piece :: _)
      else Nil
    }

  private def bestScore(word: String, probs: Map[String, Double],
                        maxLen: Int): Option[(Double, Int)] = {
    val segs = allSegs(cps(word), probs, maxLen)
    if (segs.isEmpty) None
    else {
      val scored = segs.map(s => (s.foldLeft(1.0)((acc, p) => acc * probs(p)), s.length))
      // optimum = max product; among those, fewest pieces
      val vMax = scored.map(_._1).max
      Some((vMax, scored.filter(_._1 == vMax).map(_._2).min))
    }
  }

  private val wordGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "𝄞")).map(_.mkString))

  private val vocabGen: Gen[Map[String, Double]] = for {
    extras <- Gen.listOf(Gen.choose(2, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "𝄞")).map(_.mkString)))
    probs <- Gen.listOfN(extras.size + 4, Gen.choose(1, 1000))
  } yield {
    val pieces = List("a", "b", "c", "𝄞") ++ extras
    val t = probs.sum.toDouble
    pieces.zip(probs).map { case (p, c) => p -> c / t }.toMap
  }

  test("viterbi matches brute-force enumeration on (product, piece count)") {
    forAll(wordGen, vocabGen) { (word, probs) =>
      val got = Unigram.viterbiPath(word, probs, 4)
      val want = bestScore(word, probs, 4)
      assert(want.isDefined, s"reference found no segmentation of '$word'")
      val gotV = got.foldLeft(1.0)((acc, p) => acc * probs(p))
      assert((gotV, got.length) == want.get,
        s"'$word': got ${(gotV, got.length)} via ${got.toSeq}, want ${want.get}")
      // the chosen path must actually spell the word
      assert(got.mkString == word)
    }
  }

  test("viterbi is deterministic and prefers longer final pieces on full ties") {
    // p(ab)·p(c) == p(a)·p(bc) by construction: equal products, equal
    // counts — the split-point tie-break must pick the SMALLER j at the
    // final position (the longer last piece "bc")
    val probs = Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "ab" -> 0.125, "bc" -> 0.125)
    assert(Unigram.viterbiPath("abc", probs, 2).toSeq == Seq("a", "bc"))
    // and fewer pieces beat more pieces at equal product
    val p2 = Map("a" -> 0.5, "aa" -> 0.25)
    assert(Unigram.viterbiPath("aa", p2, 2).toSeq == Seq("aa"))
  }

  test("viterbi throws on uncoverable words") {
    intercept[IllegalArgumentException] {
      Unigram.viterbiPath("axb", Map("a" -> 0.5, "b" -> 0.5), 4)
    }
  }

  test("substrings expression counts per occurrence position") {
    val rows = Seq("aaa").toDF("word")
      .select(explode(UnigramExprs.substrings(col("word"), 4)).as("s"))
      .select(col("s.piece"), col("s.cp"))
      .as[(String, Int)].collect().toSeq
    assert(rows.count(_._1 == "a") == 3)
    assert(rows.count(_._1 == "aa") == 2)
    assert(rows.count(_._1 == "aaa") == 1)
    assert(rows.forall { case (p, cp) => cps(p).length == cp })
  }

  test("trainer keeps every single codepoint, covers the corpus, and balances usage") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vocab = Unigram.train(docs, "text")
    val chars = texts.flatMap(t => cps(t.toLowerCase)).filterNot(_.trim.isEmpty).toSet
    assert(chars.subsetOf(vocab.map(_.piece).toSet),
      s"missing chars: ${chars -- vocab.map(_.piece).toSet}")
    // coverage: the smoothed encoder segments every corpus word
    val words = texts.flatMap(_.split("\\s+")).distinct
    val enc = words.toDF("word")
      .select(col("word"), UnigramExprs.viterbi(col("word"), {
        val t1 = vocab.map(_.usage).sum.toDouble
        val v = vocab.size.toDouble
        vocab.map(p => p.piece -> (p.usage + 1L) / (t1 + v)).toMap
      }, 4).as("pieces"))
      .as[(String, Seq[String])].collect()
    enc.foreach { case (w, ps) => assert(ps.mkString == w, s"$w → $ps") }
    // usage bookkeeping: Σ piece usage == Σ freq(word)·|best path(word)|,
    // both recomputed independently from the seed probabilities
    val freqs = texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val seeds = freqs.toSeq.flatMap { case (w, f) =>
      val cs = cps(w)
      for {
        i <- cs.indices
        l <- 1 to math.min(4, cs.length - i)
      } yield (cs.slice(i, i + l).mkString, l, f)
    }.groupBy(_._1).map { case (p, occ) => (p, occ.head._2, occ.map(_._3).sum) }
      .filter { case (_, cp, cnt) => cp == 1 || cnt >= 2L }
    val t0 = seeds.map(_._3).sum.toDouble
    val p0 = seeds.map { case (p, _, c) => p -> c / t0 }.toMap
    val expectedTotal = freqs.map { case (w, f) =>
      f * Unigram.viterbiPath(w, p0, 4).length
    }.sum
    val usageTotal = vocab.map(_.usage).sum
    // every used piece survives pruning here (tiny vocab), so totals match
    assert(usageTotal == expectedTotal, s"usage $usageTotal != $expectedTotal")
  }

  test("tokens query: n_pieces ≤ n_chars and ≥ n_words, per doc") {
    val docs = Seq((1L, "banana band bandana"), (2L, "aa aa aa b")).toDF("doc_id", "text")
    val vocab = Unigram.train(docs, "text")
    val got = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"), col("word"),
        size(Unigram.encode(col("word"), vocab)).as("n"))
      .as[(Long, String, Int)].collect()
    got.foreach { case (_, w, n) =>
      assert(n >= 1 && n <= cps(w).length, s"$w segmented into $n pieces")
    }
  }
}
