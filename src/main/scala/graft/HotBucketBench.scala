package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Similarity, TextAnalysis}

/** Adversarial hot-bucket scale harness (r16 verdict #3): the scaling
  * curves replicate structure per copy, so BY CONSTRUCTION they cannot
  * produce the one production hazard data skew brings — a single LSH
  * bucket / fingerprint / duplicate family that GROWS with the corpus.
  * This harness plants exactly that and measures that the shipped caps
  * hold. At each scale k (default 10, 20) it rewrites ~1% of the scaled
  * documents to one shared template (plus a per-doc tail token: true
  * near-dups, not exact dups that upstream exact-dedup would fold) and
  * ~1% of the embeddings to one shared vector family (last dims carry a
  * per-id perturbation), then records per cap family —
  * minhash band cap, hyperplane band cap, winnow df-cap —
  *
  *   - `raw_pairs`: the candidate volume an UNCAPPED banded join would
  *     expand, computed from bucket sizes (Σ sz·(sz−1)/2) because
  *     materializing it IS the quadratic blow-up (the hot family alone
  *     contributes ~(0.01·n)²/2 per band, k² growth);
  *   - `capped_pairs` vs `pair_bound` = bandedRows·(maxBucket−1)/2: the
  *     cap's linear-in-corpus guarantee, checked per corpus, not argued;
  *   - the wall time of the REAL capped pair join on the hot corpus
  *     next to the unskewed control at the same scale;
  *   - `family_recall`, reported honestly: a family whose buckets are
  *     ALL oversized is dropped by design (degenerate buckets carry no
  *     near-dup signal; identical/templated mass is the exact-dedup and
  *     containment families' job), so found/expected pairs on the
  *     planted family is published in the artifact rather than hidden
  *     behind the candidate numbers.
  *
  * The agg side of the same skew (one hot group key) is covered by
  * map-side partial aggregation in the sizing counts here and by the
  * salting pattern `skew_spend_salted` demonstrates for value aggs.
  *
  * Output: one JSON line → `scale_curves_hotbucket.json`
  * (env: SPARK_GRAFT_SCALES=10,20; SPARK_GRAFT_BENCH_OUT=…).
  */
object HotBucketBench {

  private val HotMod = 100L // doc_id % 100 == 7 → ~1% of rows
  private val HotRes = 7L
  private val Template = Seq.tabulate(120)(i => s"hotspan$i word$i").mkString(" ")

  private def isHot(c: String) = pmod(col(c), lit(HotMod)) === HotRes

  /** ~1% of docs rewritten to the shared template + unique tail token. */
  def hotDocs(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(isHot("doc_id"),
        concat(lit(Template + " tail"), col("doc_id").cast("string")))
        .otherwise(col("text")))

  /** ~1% of embeddings rewritten to a shared template vector; the last
    * 4 dims carry a small per-(id, dim) HASH value so every family
    * member is pairwise distinct — near-dups (cosine ≈ 1−ε), never
    * bit-identical vectors. (A first cut used vec_id mod 11 here, which
    * made ids sharing a residue exact duplicates — the mass the doc side
    * explicitly excludes via its unique tail token. A second cut drew
    * from only 97 values per dim: an all-4-dim collision is ~1.1e-8 per
    * pair, negligible at 20× but quadratic in scale — 100003 values per
    * dim puts an accidental exact dup at ~1e-20 per pair, impossible at
    * any scale this bench will see, at the same ≤0.2 magnitude.)
    */
  def hotEmbeddings(emb: DataFrame): DataFrame =
    emb.withColumn("embedding",
      when(isHot("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i < 60, ((pmod(i, lit(7)) + lit(1)) * lit(0.25)).cast("float"))
            .otherwise((pmod(xxhash64(col("vec_id"), i), lit(100003L)) * lit(0.0000019))
              .cast("float"))))
        .otherwise(col("embedding")))

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** (total pairs, planted-family pairs) of a pair frame in one job. */
  private def pairCounts(pairs: DataFrame, idA: String, idB: String): (Long, Long) = {
    val r = pairs.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(isHot(idA) && isHot(idB), 1L).otherwise(0L)), lit(0L)).as("fam"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Representatives per oversized bucket for the overflow measurement —
    * the maxBucket default, so overflow work per bucket matches the cap's
    * own per-bucket ceiling.
    */
  private val OverflowReps = 64

  /** Containment df-cap for the hot cell — pinned below the family size
    * at the smallest scale point so the viral-passage blindness ENGAGES
    * in every cell (the default 64 only binds once the family outgrows
    * it; the overflow semantics are cap-value-independent).
    */
  private val ContainMaxDf = 16

  private def statsJson(s: Dedup.LshCandidateStats): String =
    s"""{"max_bucket":${s.maxBucket},"banded_rows":${s.bandedRows},"buckets":${s.buckets},""" +
      s""""dropped_buckets":${s.droppedBuckets},"largest_bucket":${s.largestBucket},""" +
      s""""raw_pairs":${s.rawPairs},"capped_pairs":${s.cappedPairs},""" +
      s""""pair_bound":${s.pairBound},"capped_under_bound":${s.cappedPairs <= s.pairBound},""" +
      s""""oversized_rows":${s.oversizedRows},""" +
      s""""overflow_bound":${s.overflowBound(OverflowReps)}}"""

  /** Fraction of a frame's hot-family members appearing in ≥1 found
    * family pair — the data-quality outcome (pairs→clusters keeps one
    * representative per cluster, so a member in any family pair is
    * deduplicated; one outside every pair escapes entirely).
    */
  private def memberRecall(pairs: DataFrame, idA: String, idB: String,
                           famTotal: Long): Double = {
    if (famTotal == 0) return 0.0
    val fam = pairs.filter(isHot(idA) && isHot(idB))
    val members = fam.select(col(idA).as("id"))
      .unionByName(fam.select(col(idB).as("id")))
      .distinct().count()
    members.toDouble / famTotal
  }

  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    import BenchSweep.num
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "10,20")
      .split(",").map(_.trim.toInt).toSeq
    val sections = scales.map { k =>
      val dir = ScaleBench.ensureScaled(spark, srcDir, k)
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val hDocs = hotDocs(docs)
      val famDocs = docs.filter(isHot("doc_id")).count()
      val famDocPairs = famDocs * (famDocs - 1) / 2

      // -- text: minhash band cap ------------------------------------
      val mhStats = Dedup.minhashCandidateStats(hDocs, "text", "doc_id")
      val ((mhPairs, mhFam), tHot) =
        timed(pairCounts(Dedup.minhashPairs(hDocs, "text", "doc_id"), "id_a", "id_b"))
      val (mhCtl, tCtl) = timed(Dedup.minhashPairs(docs, "text", "doc_id").count())
      // overflow path: capped family members still reach representatives
      val mhOv = Dedup.minhashPairs(hDocs, "text", "doc_id",
        overflowReps = OverflowReps)
      val ((mhOvPairs, mhOvFam), tHotOv) = timed(pairCounts(mhOv, "id_a", "id_b"))
      val mhOvMembers = memberRecall(mhOv, "id_a", "id_b", famDocs)

      // -- embeddings: hyperplane band cap ---------------------------
      val hEmb = hotEmbeddings(emb)
      val famVecs = emb.filter(isHot("vec_id")).count()
      val famVecPairs = famVecs * (famVecs - 1) / 2
      val n = emb.count()
      val (bits, bands) = Similarity.hyperplaneParams(n, 0.9)
      val hpStats = Similarity.nearDupCandidateStats(hEmb, bits, bands)
      val ((hpPairs, hpFam), tHotE) = timed(pairCounts(
        Similarity.embeddingNearDupsLsh(hEmb, bits, bands, minCosine = 0.9),
        "id_a", "id_b"))
      val (hpCtl, tCtlE) =
        timed(Similarity.embeddingNearDupsLsh(emb, bits, bands, minCosine = 0.9).count())
      val hpOv = Similarity.embeddingNearDupsLsh(hEmb, bits, bands,
        minCosine = 0.9, overflowReps = OverflowReps)
      val ((hpOvPairs, hpOvFam), tHotEOv) = timed(pairCounts(hpOv, "id_a", "id_b"))
      val hpOvMembers = memberRecall(hpOv, "id_a", "id_b", famVecs)
      // the DEPLOYABLE composition (r19): auto-derived banding feeding
      // overflowReps through embeddingNearDupsLshAuto itself — the cell
      // proving the production entry point carries the rescue, not just
      // the pinned-parameter form above
      val hpAuto = Similarity.embeddingNearDupsLshAuto(hEmb, minCosine = 0.9,
        overflowReps = OverflowReps)
      val ((hpAutoPairs, hpAutoFam), tHotAuto) =
        timed(pairCounts(hpAuto, "id_a", "id_b"))
      val hpAutoMembers = memberRecall(hpAuto, "id_a", "id_b", famVecs)

      // -- text: simhash chunk cap -----------------------------------
      val shStats = Dedup.simhashCandidateStats(hDocs, "text", "doc_id")
      val ((shPairs, shFam), tHotS) =
        timed(pairCounts(Dedup.simhashPairs(hDocs, "text", "doc_id"), "id_a", "id_b"))
      val shOv = Dedup.simhashPairs(hDocs, "text", "doc_id", overflowReps = OverflowReps)
      val ((shOvPairs, shOvFam), tHotSOv) = timed(pairCounts(shOv, "id_a", "id_b"))
      val shOvMembers = memberRecall(shOv, "id_a", "id_b", famDocs)

      // -- text: containment df-cap (r20, the viral-passage overflow:
      // the planted template family IS a viral passage — every family
      // shingle's df equals the family size, crossing the pinned cap at
      // every scale point, so the capped inverted index produces zero
      // family candidates and only the overflow star recovers the
      // family). maxDf pinned BELOW the family size at 10× (the
      // SimOvfMaxBucket discipline); containment pairs are ORDERED, so
      // pair recall is against famDocs·(famDocs−1).
      val famDocPairsOrd = famDocs * (famDocs - 1)
      val cCapped = Dedup.containmentPairs(hDocs, "text", "doc_id", n = 3,
        minContainment = 0.9, maxDf = ContainMaxDf)
      val ((cPairs, cFam), tHotC) = timed(pairCounts(cCapped, "id_a", "id_b"))
      val cMembers = memberRecall(cCapped, "id_a", "id_b", famDocs)
      val cOv = Dedup.containmentPairs(hDocs, "text", "doc_id", n = 3,
        minContainment = 0.9, maxDf = ContainMaxDf, overflowReps = OverflowReps)
      val ((cOvPairs, cOvFam), tHotCOv) = timed(pairCounts(cOv, "id_a", "id_b"))
      val cOvMembers = memberRecall(cOv, "id_a", "id_b", famDocs)

      // -- text: winnow df-cap (postings accounting only — the overlap
      // report pipeline df-gates before any expansion, same cap) ------
      val wStats = TextAnalysis.winnowCandidateStats(hDocs, "text", "doc_id")

      s""""x$k":{
         |"family_docs":$famDocs,"family_doc_pairs":$famDocPairs,
         |"minhash":{"stats":${statsJson(mhStats)},
         |  "pairs_found":$mhPairs,"family_pairs_found":$mhFam,
         |  "family_recall":${num(if (famDocPairs == 0) 0.0 else mhFam.toDouble / famDocPairs, 6)},
         |  "hot_sec":${num(tHot, 3)},"control_pairs":$mhCtl,"control_sec":${num(tCtl, 3)},
         |  "overflow":{"reps":$OverflowReps,"pairs_found":$mhOvPairs,
         |    "family_pairs_found":$mhOvFam,
         |    "family_pair_recall":${num(if (famDocPairs == 0) 0.0 else mhOvFam.toDouble / famDocPairs, 6)},
         |    "family_member_recall":${num(mhOvMembers, 6)},"hot_sec":${num(tHotOv, 3)}}},
         |"family_vecs":$famVecs,"family_vec_pairs":$famVecPairs,
         |"hyperplane":{"bits":$bits,"bands":$bands,"stats":${statsJson(hpStats)},
         |  "pairs_found":$hpPairs,"family_pairs_found":$hpFam,
         |  "family_recall":${num(if (famVecPairs == 0) 0.0 else hpFam.toDouble / famVecPairs, 6)},
         |  "hot_sec":${num(tHotE, 3)},"control_pairs":$hpCtl,"control_sec":${num(tCtlE, 3)},
         |  "overflow":{"reps":$OverflowReps,"pairs_found":$hpOvPairs,
         |    "family_pairs_found":$hpOvFam,
         |    "family_pair_recall":${num(if (famVecPairs == 0) 0.0 else hpOvFam.toDouble / famVecPairs, 6)},
         |    "family_member_recall":${num(hpOvMembers, 6)},"hot_sec":${num(tHotEOv, 3)}},
         |  "auto_overflow":{"reps":$OverflowReps,"pairs_found":$hpAutoPairs,
         |    "family_pairs_found":$hpAutoFam,
         |    "family_pair_recall":${num(if (famVecPairs == 0) 0.0 else hpAutoFam.toDouble / famVecPairs, 6)},
         |    "family_member_recall":${num(hpAutoMembers, 6)},"hot_sec":${num(tHotAuto, 3)}}},
         |"simhash":{"stats":${statsJson(shStats)},
         |  "pairs_found":$shPairs,"family_pairs_found":$shFam,
         |  "family_recall":${num(if (famDocPairs == 0) 0.0 else shFam.toDouble / famDocPairs, 6)},
         |  "hot_sec":${num(tHotS, 3)},
         |  "overflow":{"reps":$OverflowReps,"pairs_found":$shOvPairs,
         |    "family_pairs_found":$shOvFam,
         |    "family_pair_recall":${num(if (famDocPairs == 0) 0.0 else shOvFam.toDouble / famDocPairs, 6)},
         |    "family_member_recall":${num(shOvMembers, 6)},"hot_sec":${num(tHotSOv, 3)}}},
         |"containment":{"max_df":$ContainMaxDf,
         |  "pairs_found":$cPairs,"family_pairs_found":$cFam,
         |  "family_pair_recall":${num(if (famDocPairsOrd == 0) 0.0 else cFam.toDouble / famDocPairsOrd, 6)},
         |  "family_member_recall":${num(cMembers, 6)},"hot_sec":${num(tHotC, 3)},
         |  "overflow":{"reps":$OverflowReps,"pairs_found":$cOvPairs,
         |    "family_pairs_found":$cOvFam,
         |    "family_pair_recall":${num(if (famDocPairsOrd == 0) 0.0 else cOvFam.toDouble / famDocPairsOrd, 6)},
         |    "family_member_recall":${num(cOvMembers, 6)},"hot_sec":${num(tHotCOv, 3)}}},
         |"winnow":{"stats":${statsJson(wStats)}}
         |}""".stripMargin.replace("\n", "")
    }
    val line =
      s"""{"metric":"scale_curves_hotbucket","scales":[${scales.mkString(",")}],""" +
        s""""hot_pct":1.0,"boot_epoch":${BenchSweep.bootEpoch},"src":"$srcDir",${sections.mkString(",")}}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "scale_curves_hotbucket.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
