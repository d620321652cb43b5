package graft

import org.apache.spark.sql.functions._

import graft.llm.FrequentItems

/** Misra-Gries aggregate: retention guarantee under partitioning, exact
  * two-pass output, merge-path coverage.
  */
class FrequentItemsSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  /** 1000 tokens: "hot" x 200, "warm" x 60, long tail of singletons.
    * With k = 9 the guarantee covers anything over N/(k+1) = 100.
    */
  private val stream: Seq[String] =
    Seq.fill(200)("hot") ++ Seq.fill(60)("warm") ++ (1 to 740).map(i => s"tail_$i")

  test("retention guarantee holds under every partitioning (serialize+merge path)") {
    // shuffle deterministically so partitions interleave hot and tail
    val data = stream.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000983 }
      .map(_._1)
    for (parts <- Seq(1, 3, 8, 32)) {
      val cand = data.toDF("token").repartition(parts)
        .agg(FrequentItems.mgSummary(col("token"), 9).as("c"))
        .select(explode(col("c")).as("t")).as[String].collect().toSet
      assert(cand.contains("hot"), s"parts=$parts lost 'hot' (tf=200 > N/10=100): $cand")
      assert(cand.size <= 9, s"parts=$parts summary over k: ${cand.size}")
    }
  }

  test("two-pass frequent tokens equal the exact answer") {
    val docs = Seq.tabulate(50) { i =>
      // every doc repeats "alpha"; half repeat "beta"; noise is unique
      val noise = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"alpha ${if (i % 2 == 0) "beta beta" else ""} alpha $noise")
    }.toDF("doc_id", "text")
    val got = FrequentItems.frequentTokens(docs, "text", k = 128, pctDenom = 20)
      .as[(String, Long)].collect().toSeq
    // exact reference
    val toks = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").as[String].collect()
    val n = toks.length
    val want = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter { case (_, c) => c * 20 >= n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(got == want, s"got $got want $want")
    assert(got.map(_._1).contains("alpha"))
  }

  test("property: random zipf-ish streams never lose a guaranteed-frequent token") {
    import org.scalacheck.Gen
    val streamGen = for {
      hotCopies <- Gen.choose(30, 120)
      tail <- Gen.choose(20, 150)
      parts <- Gen.oneOf(1, 2, 5, 16)
      seed <- Gen.choose(0, 1000)
    } yield (hotCopies, tail, parts, seed)
    forAll(streamGen) { case (hotCopies, tail, parts, seed) =>
      val k = 7
      val data = (Seq.fill(hotCopies)("hot") ++ (1 to tail).map(i => s"t${seed}_$i"))
      val n = data.size
      val shuffled = data.zipWithIndex
        .sortBy { case (_, i) => ((i + seed) * 2654435761L) % 999983 }.map(_._1)
      val cand = shuffled.toDF("token").repartition(parts)
        .agg(FrequentItems.mgSummary(col("token"), k).as("c"))
        .select(explode(col("c")).as("t")).as[String].collect().toSet
      assert(cand.size <= k)
      if (hotCopies.toLong * (k + 1) > n)
        assert(cand.contains("hot"),
          s"lost 'hot' (tf=$hotCopies > N/${k + 1}=${n / (k + 1)}) parts=$parts")
    }
  }

  test("threshold below the sketch guarantee is refused") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      FrequentItems.frequentTokens(docs, "text", k = 50, pctDenom = 100)
    }
  }

  test("registered query is deterministic across runs") {
    val a = FrequentItems.frequentTokensQuery(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    val b = FrequentItems.frequentTokensQuery(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
