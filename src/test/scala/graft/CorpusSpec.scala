package graft

import org.apache.spark.sql.functions._
import graft.llm.Corpus

class CorpusSpec extends SparkSpec with PropertyCheck {
  import org.scalacheck.Gen
  import spark.implicits._

  private def docs = (0L until 400L).map { i =>
    (i, (s"w$i " * (1 + (i % 150).toInt)).trim, if (i % 4 == 0) "de" else "en")
  }.toDF("doc_id", "text", "lang")

  test("hash split: deterministic, exhaustive, disjoint, ~90/5/5") {
    val s1 = Corpus.splitAssign(docs, "doc_id").select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val s2 = Corpus.splitAssign(docs, "doc_id").select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)                       // re-run reproduces the split
    assert(s1.size == 400)                 // exhaustive, one assignment each
    val bySplit = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 320 && bySplit("train") < 390) // ~360 ± binomial noise
    // a different salt draws a genuinely different split
    val v2 = Corpus.splitAssign(docs, "doc_id", ":split:v2")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(v2 != s1)
  }

  test("stratified sample: per-stratum hash rates, full-rate stratum untouched") {
    val kept = Corpus.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 1000, "de" -> 250))
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(kept.count(_._2 == "en") == 300)          // rate 1000‰ keeps all en
    val de = kept.count(_._2 == "de")
    assert(de > 8 && de < 45, s"de kept $de of 100 at 250‰") // ~25 ± noise
    // absent stratum is dropped entirely
    val none = Corpus.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1000))
    assert(none.filter($"lang" === "de").count() == 0)
  }

  test("chunking: count formula, width bound, stride starts, reconstruction") {
    val d = Seq((7L, (1 to 200).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Corpus.chunk(d, "text", "doc_id", width = 64, stride = 48)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"chunk_text", $"n_chunk_tokens")
      .as[(Int, String, Int)].collect()
    assert(chunks.length == 1 + (200 - 1) / 48)      // 5 chunks
    chunks.foreach { case (cid, text, n) =>
      val toks = text.split(" ")
      assert(toks.length == n && n <= 64)
      assert(toks.head == s"t${cid * 48 + 1}")        // starts every stride tokens
    }
    // every token appears in at least one chunk, in order
    val covered = chunks.flatMap { case (cid, text, _) =>
      text.split(" ").zipWithIndex.map { case (t, j) => (cid * 48 + j, t) }
    }.toMap
    assert((0 until 200).forall(i => covered(i) == s"t${i + 1}"))
    // short doc: exactly one chunk, equal to the trimmed text
    val one = Corpus.chunk(Seq((1L, "a b c")).toDF("doc_id", "text"), "text", "doc_id")
      .select($"chunk_text").as[String].collect()
    assert(one.toSeq == Seq("a b c"))
  }

  test("packing: per-shard running total, budget blocks, deterministic") {
    val packed = Corpus.packSequences(docs, "text", "doc_id", budget = 512, shards = 4)
      .as[(Long, Long, Int, Long)].collect()
    assert(packed.length == 400 && packed.map(_._2).distinct.sorted.toSeq.forall(_ < 4))
    // recompute the expected layout shard-by-shard from first principles
    // (window order is (hash-bucket, doc_id); fetch all buckets in one job)
    val bucket = docs.select($"doc_id",
        Corpus.hashBucket(col("doc_id"), ":pack:v1").as("b"))
      .as[(Long, Long)].collect().toMap
    packed.groupBy(_._2).values.foreach { rows =>
      val ordered = rows.sortBy(r => (bucket(r._1), r._1))
      var cum = 0L
      ordered.foreach { case (_, _, n, packId) =>
        assert(packId == cum / 512, s"pack mismatch at cum=$cum")
        cum += n
      }
    }
  }

  test("chunking property: full in-order coverage at any (n, width, stride)") {
    val gen = for {
      n <- Gen.choose(1, 300)
      stride <- Gen.choose(1, 80)
      extra <- Gen.choose(0, 40)
    } yield (n, stride + extra, stride) // width >= stride
    forAll(gen) { case (n, width, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = Corpus.chunk(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id",
          width = width, stride = stride)
        .select($"chunk_id", $"chunk_text", $"n_chunk_tokens")
        .as[(Int, String, Int)].collect().sortBy(_._1)
      assert(chunks.length == 1 + (n - 1) / stride)
      val rebuilt = chunks.flatMap { case (cid, t, len) =>
        val toks = t.split(" ")
        assert(toks.length == len && len <= width)
        toks.zipWithIndex.map { case (tok, j) => (cid * stride + j) -> tok }
      }.toMap
      assert(rebuilt.size == n && (0 until n).forall(i => rebuilt(i) == s"t${i + 1}"))
    }
  }

  test("decontamination: flags exactly the train docs sharing an 8-gram with the benchmark") {
    val shared = "one two three four five six seven eight nine ten"
    val train = Seq(
      (1L, s"prefix words here $shared suffix tail"),        // contains the shared 10-gram
      (2L, "totally different content with no overlap at all whatsoever in any window"),
      (3L, shared)                                           // exact benchmark text
    ).toDF("doc_id", "text")
    val bench = Seq((100L, shared)).toDF("doc_id", "text")
    val got = Corpus.decontaminate(train, "doc_id", "text", bench)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 3L))
    // the 10-token benchmark has three distinct 8-grams; both docs embed
    // the full run, so all three windows match in each
    assert(got(3L) == 3L && got(1L) == 3L)
  }

  test("pii redaction: typed placeholders, clean text untouched") {
    val redacted = Corpus.redactPii(lit(
      "mail me at jane.doe+x@corp.example.org or call 555-123-4567; ssn 123-45-6789 stays out"))
    val out = spark.range(1).select(redacted.as("t")).as[String].head()
    assert(out == "mail me at <EMAIL> or call <PHONE>; ssn <SSN> stays out")
    val clean = "no personal data in this perfectly ordinary sentence"
    assert(spark.range(1).select(Corpus.redactPii(lit(clean)).as("t")).as[String].head() == clean)
  }

  test("scale shape: split/sample/chunk plan with zero exchanges; packing never single-partition") {
    // the scan-speed ops must not shuffle at all
    Seq(
      Corpus.splitAssign(docs, "doc_id"),
      Corpus.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 500)),
      Corpus.chunk(docs, "text", "doc_id")
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    }
    // packing shuffles by shard (bounded partitions), never into ONE
    // partition — the failure mode of a global-order window
    val packPlan = Corpus.packSequences(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(packPlan.contains("Exchange hashpartitioning"), packPlan)
    assert(!packPlan.contains("SinglePartition"), s"global window in:\n$packPlan")
  }

  test("target mixture: rates follow weights, cap at 1, absent stratum dropped, deterministic") {
    // skewed fixture: 300 en / 100 de; weights pull toward de
    val kept = Corpus.targetMixture(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 3.0), budgetFrac = 0.5)
    val byLang = kept.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    // N=400, ΣW=4: rate_en = .5*400*1/(4*300) = 1/6 → ~50 of 300
    // rate_de = .5*400*3/(4*100) = 1.5 → capped at 1 → all 100
    assert(byLang("de") == 100L)
    assert(byLang("en") > 25 && byLang("en") < 80, s"en kept ${byLang("en")}")
    // deterministic re-run
    val again = Corpus.targetMixture(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 3.0), budgetFrac = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept.select($"doc_id").as[Long].collect().toSet)
    // stratum without a weight is dropped entirely
    val enOnly = Corpus.targetMixture(docs, "doc_id", "lang",
      Map("en" -> 1.0), budgetFrac = 0.5)
    assert(enOnly.filter($"lang" === "de").count() == 0)
    // output schema is the input schema (no internal rate column, same order)
    assert(kept.columns.toSeq == docs.columns.toSeq)
  }

  test("quality-weighted sampling keeps good docs at a higher rate, deterministically") {
    val rich = "the quick brown fox jumps over the lazy dog and the story " +
      "keeps going with many varied plain words across the whole line of text"
    val junk = "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"
    val docs = ((0L until 200L).map(i => (i, rich)) ++
      (200L until 400L).map(i => (i, junk))).toDF("doc_id", "text")
    val kept = Corpus.qualityWeightedSample(docs, "text", "doc_id")
    val again = Corpus.qualityWeightedSample(docs, "text", "doc_id")
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq ==
      again.select($"doc_id").as[Long].collect().sorted.toSeq)
    val goodRate = kept.filter($"doc_id" < 200).count() / 200.0
    val junkRate = kept.filter($"doc_id" >= 200).count() / 200.0
    assert(goodRate > junkRate + 0.2, s"good $goodRate vs junk $junkRate")
    // soft, not hard: the keep threshold is the score itself
    assert(kept.filter($"draw" >= $"keep_below").count() == 0)
  }

  test("temperatureMixture flattens the source distribution (α = 1/2)") {
    // head: 80 docs × 10 tokens; tail: 20 docs × 10 tokens → p = 0.8 / 0.2
    val line = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = ((0L until 80L).map(i => (i, line, "head")) ++
      (80L until 100L).map(i => (i, line, "tail"))).toDF("doc_id", "text", "source")
    val got = Corpus.temperatureMixture(docs, "text", "source", budgetFrac = 0.5)
      .orderBy($"source")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (head, tail) = (got("head"), got("tail"))
    assert(head._2 == 80L && head._3 == 800L && tail._3 == 200L)
    // sqrt flattening: weights ∝ √0.8 : √0.2 → ~0.667 : ~0.333 — the tail's
    // weight share EXCEEDS its 0.2 token share, the head's shrinks below 0.8
    assert(tail._4 > 0.2 && tail._4 < 0.5, s"tail weight ${tail._4}")
    assert(head._4 < 0.8 && head._4 > 0.5, s"head weight ${head._4}")
    assert(math.abs(head._4 + tail._4 - 1.0) < 1e-4)
    // 50-doc budget splits ~2:1
    assert(head._5 + tail._5 == 50L, s"targets ${head._5} + ${tail._5}")
    assert(tail._5 >= 16L && tail._5 <= 17L)
  }

  test("dsir weights are partition-invariant (property)") {
    import org.scalacheck.Gen
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val gen = for {
      n <- Gen.choose(4, 10)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf(words)).map(_.take(6)))
      flags <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield docs.zip(flags).zipWithIndex.map { case ((ws, f), i) =>
      (i.toLong, ws.mkString(" "), f)
    }
    forAll(gen) { rows =>
      val df = rows.toDF("doc_id", "text", "is_ref")
      val a = Corpus.dsirWeights(df, "text", "doc_id", col("is_ref"), buckets = 32)
        .as[(Long, Boolean, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
      // quantized BIGINT terms: the shuffle/combine order of a different
      // physical layout can never change a weight or a selection
      val b = Corpus.dsirWeights(df.repartition(5), "text", "doc_id", col("is_ref"),
          buckets = 32)
        .as[(Long, Boolean, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
      assert(a == b)
    }
  }

  test("eval sample: exact size per stratum, layout-invariant draw") {
    val docs = (0L until 40L).map(i => (i, s"doc $i", s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.evalSample(docs, "doc_id", "source", perStratum = 4)
      .as[(Long, String, Int)].collect().sortBy(r => (r._2, r._3))
    // exactly 4 per stratum, ranks 1..4
    assert(got.length == 12)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == Seq(1, 2, 3, 4))
    }
    // stratum integrity + repartition invariance
    got.foreach { case (id, src, _) => assert(s"s${id % 3}" == src) }
    val again = Corpus.evalSample(docs.repartition(7), "doc_id", "source", 4)
      .as[(Long, String, Int)].collect().sortBy(r => (r._2, r._3))
    assert(got.toSeq == again.toSeq)
  }

  test("contamination report: overlap fractions complete over the corpus") {
    val leak = "alpha beta gamma delta epsilon zeta eta theta" // one 8-gram
    val train = Seq(
      (0L, leak + " iota kappa"),                      // 3 shingles, 1 shared
      (1L, "one two three four five six seven eight nine ten")) // clean
      .toDF("doc_id", "text")
    val bench = Seq((100L, leak)).toDF("doc_id", "text")
    val got = Corpus.contaminationReport(train, "doc_id", "text", bench)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.length == 2) // the clean doc is still reported
    assert(got(0) == ((0L, 3L, 1L, 0.333333, true)), got(0).toString)
    assert(got(1)._3 == 0L && got(1)._4 == 0.0 && !got(1)._5, got(1).toString)
  }

  test("curriculum: global rank/prefix-sum exact, partition-layout invariant") {
    val docs = Seq(
      0L -> "the light settles across the quiet harbor and boats drift out past the pier",
      1L -> "x y",                                    // low quality: short, no stops
      2L -> "the morning train is late again and the platform fills with people to watch",
      3L -> "z",                                      // lowest
      4L -> "gulls wheel over the nets spread to dry along the old stone wall while the tide turns"
    ).toDF("doc_id", "text")
    val got = Corpus.curriculum(docs, "text", "doc_id")
      .as[(Long, Long, Double, Long, String)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (1L to 5L), got.mkString(","))
    // rank order is (quality desc, doc_id asc)
    val order = got.map(r => (-r._3, r._1)).toSeq
    assert(order == order.sorted, got.mkString(","))
    // prefix sums: cum at rank k = sum of token counts in rank order
    val toks = docs.collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").length.toLong).toMap
    var run = 0L
    for (r <- got) { run += toks(r._1); assert(r._4 == run, s"cum at rank ${r._2}") }
    // warm-up = the ceil(10%) token prefix
    val budget = math.ceil(toks.values.sum * 0.1)
    for (r <- got) assert((r._5 == "warmup") == (r._4 <= budget), r.toString)
    // physical layout cannot perturb the total order
    val again = Corpus.curriculum(docs.repartition(7), "text", "doc_id")
      .as[(Long, Long, Double, Long, String)].collect().sortBy(_._2)
    assert(got.toSeq == again.toSeq)
  }

  test("leakage-safe split: dup groups intact, singletons match the plain split") {
    val docs = Seq(
      (0L, "unique zero"), (1L, "same dup text"), (2L, "unique two"),
      (3L, "unique three"), (4L, "Same  DUP   text"), (5L, "unique five"))
      .toDF("doc_id", "text") // 4 normalizes to 1's content
    val got = Corpus.splitLeakageSafe(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got.size == 6)
    // the dup pair shares its canon (min id) and therefore its split
    assert(got(1L)._2 == 1L && got(4L)._2 == 1L)
    assert(got(4L)._3 == got(1L)._3 && got(4L)._4 == got(1L)._4)
    // singletons draw exactly the plain split's assignment (same salt)
    val plain = Corpus.splitAssign(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    for (id <- Seq(0L, 2L, 3L, 5L)) assert(got(id)._4 == plain(id))
    // the higher-id dup follows its canon's draw, not its own
    assert(got(4L)._4 == plain(1L))
  }

  test("dsir: target-like docs outscore off-target, selection is value-closed top slice") {
    val ref = "alpha beta gamma delta alpha beta"
    val docs = Seq(
      (0L, ref, true), (1L, ref, true), (2L, ref, true), (3L, ref, true),
      (4L, "alpha beta gamma delta epsilon", false),  // shares target bigrams
      (5L, "alpha beta gamma zulu yankee", false),
      (6L, "zulu yankee xray whiskey victor", false), // disjoint from target
      (7L, "zulu yankee xray whiskey victor", false),
      (8L, "quebec papa oscar november mike", false),
      (9L, "lima kilo juliett india hotel", false))
      .toDF("doc_id", "text", "is_ref")
    // keep 3: the four target docs TIE at the top value — a value-closed
    // slice can't split a tie, so nothing qualifies under k=3
    val none = Corpus.dsirWeights(docs, "text", "doc_id", col("is_ref"),
        buckets = 64, keepPermille = 300)
      .filter(col("selected")).count()
    assert(none == 0L)
    val got = Corpus.dsirWeights(docs, "text", "doc_id", col("is_ref"),
        buckets = 64, keepPermille = 500)
      .orderBy($"doc_id")
      .as[(Long, Boolean, Long, Double, Boolean)].collect()
    assert(got.length == 10)
    // every doc has n-1 bigram occurrences
    assert(got.forall(r => r._3 == (if (r._1 <= 3) 5 else 4)), got.mkString(","))
    // target-exclusive bigrams push target-like docs above disjoint ones
    val w = got.map(r => r._1 -> r._4).toMap
    assert(w(4L) > w(6L), s"target-like ${w(4L)} !> disjoint ${w(6L)}")
    assert(w(0L) > w(8L))
    // selection under k=5: at most 5 docs, value-monotone — every
    // selected weight >= every unselected weight
    val sel = got.filter(_._5).map(_._4)
    assert(sel.nonEmpty && sel.length <= 5, got.mkString(","))
    val unsel = got.filterNot(_._5).map(_._4)
    for (s <- sel; u <- unsel) assert(s >= u, s"$s < $u")
    // the target-like raw doc makes the cut; the disjoint one never does
    val selIds = got.filter(_._5).map(_._1).toSet
    assert(selIds.contains(4L) && !selIds.contains(6L), selIds.toString)
    // deterministic: a re-run reproduces the same frame
    val again = Corpus.dsirWeights(docs, "text", "doc_id", col("is_ref"),
        buckets = 64, keepPermille = 500)
      .orderBy($"doc_id")
      .as[(Long, Boolean, Long, Double, Boolean)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("corpus drift: identical halves score 0, disjoint vocabularies score 1, layout-invariant") {
    // source "same": both snapshots draw the same text; "moved": snapshot
    // A says only "alpha", B only "beta" (disjoint buckets w.h.p.);
    // "only_a": nothing in snapshot B -> null tv, not a crash
    val docs = Seq(
      (0L, "x y z", "same"), (1L, "x y z", "same"),
      (2L, "alpha alpha", "moved"), (3L, "beta beta", "moved"),
      (4L, "solo text", "only_a")
    ).toDF("doc_id", "text", "source")
    val got = Corpus.corpusDrift(docs, "text", "source", col("doc_id") % 2 === 1)
      .as[(String, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got("same")._4.contains(0.0), got("same").toString)
    assert(got("moved")._4.contains(1.0), got("moved").toString)
    assert(got("only_a")._4.isEmpty && got("only_a")._2 == 2, got("only_a").toString)
    // exact integer numerator: any physical layout yields the same score
    val again = Corpus.corpusDrift(docs.repartition(7), "text", "source",
      col("doc_id") % 2 === 1)
      .as[(String, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got == again)
    // known middle case: A = {a:2, b:1}, B = {a:1, b:2} (distinct buckets
    // w.h.p.) -> TV = |2*3-1*3|/(2*3*3) * 2 terms = 1/3
    val mid = Seq((0L, "aaa aaa bbb", "m"), (1L, "aaa bbb bbb", "m"))
      .toDF("doc_id", "text", "source")
    val tv = Corpus.corpusDrift(mid, "text", "source", col("doc_id") % 2 === 1)
      .as[(String, Long, Long, Option[Double])].head()._4
    assert(tv.contains(0.333333), tv.toString)
  }

  test("pps sample: exact size, zero weights excluded, multiplicity, layout-invariant") {
    // one doc outweighs a full stride (w=500 vs W/m≈56) -> copies >= 2
    val d = ((0L until 60L).map(i => (i, 1L + (i % 10))) :+ (60L, 500L) :+ (61L, 0L))
      .toDF("doc_id", "w0")
    val m = 12
    val got = Corpus.ppsSystematicSample(d, "doc_id", col("w0"), m)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).sum == m, s"sum of copies must be exactly m: $got")
    assert(got.forall(_._3 >= 1))
    assert(!got.exists(_._1 == 61L), "zero-weight doc can never be drawn")
    assert(got.find(_._1 == 60L).exists(_._3 >= 2),
      "a doc heavier than one stride W/m must appear with multiplicity")
    // physical layout cannot perturb the draw (range partition + sha order)
    val again = Corpus.ppsSystematicSample(d.repartition(7), "doc_id", col("w0"), m)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("pps draw key: string order of the 15-char hex prefix == numeric order") {
    // The r9 driver gate's one red row traced to the oracle's
    // CAST('0x…' AS BIGINT) hex parse; the fix orders by the fixed-width
    // lowercase hex substring AS A STRING on both sides. This test pins
    // the equivalence the fix relies on: for fixed-width lowercase hex,
    // lexicographic order is EXACTLY the numeric order, so dropping the
    // numeric cast cannot change the draw.
    val ids = spark.range(0, 2000).toDF("doc_id")
    val hexS = substring(sha2(concat(col("doc_id").cast("string"), lit(":pps:v1")), 256), 1, 15)
    val hexN = conv(hexS, 16, 10).cast("long")
    val byString = ids.select(col("doc_id")).orderBy(hexS, col("doc_id"))
      .as[Long].collect().toSeq
    val byNumber = ids.select(col("doc_id")).orderBy(hexN, col("doc_id"))
      .as[Long].collect().toSeq
    assert(byString == byNumber, "hex-string order must equal numeric order")
    // and the keys really are fixed-width lowercase hex (the property
    // the lexicographic==numeric argument needs)
    val bad = ids.select(hexS.as("h")).filter(!col("h").rlike("^[0-9a-f]{15}$")).count()
    assert(bad == 0L)
  }

  test("pps oracle: copies is cast back to BIGINT (the only HUGEINT on the surface)") {
    // Two rounds of driver hash-red traced (r10 judge) to the oracle's
    // `copies` being DuckDB HUGEINT: SUM(w) OVER widens to INT128 and the
    // widening survives LEAST/// arithmetic, so a type-canonical result
    // hasher mismatched the engine's long while every VALUE was identical.
    // Pin the fix: the published oracle text must cast copies to BIGINT,
    // and the engine side must emit LongType so the Arrow types align.
    val sql = SparkEntry.oracleSql("llm_sample_pps")
    assert(sql.contains("AS BIGINT) AS copies"),
      "llm_sample_pps oracle must CAST the copies expression to BIGINT")
    val d = (0L until 20L).map(i => (i, 1L + i)).toDF("doc_id", "w0")
    val schema = Corpus.ppsSystematicSample(d, "doc_id", col("w0"), 5).schema
    assert(schema.fields.forall(_.dataType == org.apache.spark.sql.types.LongType),
      s"engine pps output must be all LongType: $schema")
  }

  test("pps sample: inclusion tracks weight (property) and guards fire") {
    // m points at stride W/m: systematic sampling picks a doc of weight
    // w either floor(w·m/W) or ceil(w·m/W) times — never outside
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 30L)).map {
      case ws if ws.sum > 0 => ws
      case ws => 5L :: ws.tail // keep W > 0 without discarding the case
    }
    forAll(gen) { ws =>
      val W = ws.sum
      val d = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w0")
      val m = 7
      val got = Corpus.ppsSystematicSample(d, "doc_id", col("w0"), m)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
      assert(got.values.sum == m)
      ws.zipWithIndex.foreach { case (w, i) =>
        val c = got.getOrElse(i.toLong, 0L)
        val exact = w.toDouble * m / W
        assert(c >= math.floor(exact).toLong && c <= math.ceil(exact).toLong,
          s"doc $i weight $w drawn $c times, expected within [floor, ceil] of $exact")
      }
    }
    // guards: negative weight (task-side require) and zero total (driver)
    val neg = intercept[Exception] {
      Corpus.ppsSystematicSample(Seq((1L, -3L), (2L, 5L)).toDF("doc_id", "w0"),
        "doc_id", col("w0"), 2)
    }
    val msgs = Iterator.iterate[Throwable](neg)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("negative weight")), msgs.mkString(" | "))
    val zero = intercept[IllegalArgumentException] {
      Corpus.ppsSystematicSample(Seq((1L, 0L)).toDF("doc_id", "w0"), "doc_id", col("w0"), 2)
    }
    assert(zero.getMessage.contains("total weight"))
  }
}
