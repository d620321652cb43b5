package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-preparation operators a training-data pipeline runs after
  * curation: reproducible splits, stratified sampling, chunking, and
  * token-budget sequence packing. (Beyond the reference's surface — the
  * builder brief's training-pipeline layer; ref has no analogue.)
  *
  * Everything here is deterministic by construction — assignment comes
  * from SHA-256 of the document id plus a versioned salt, never from
  * `rand()` — so a re-run (or a different engine: see the DuckDB oracles)
  * reproduces the same split/sample/pack bit-for-bit. That property is
  * what makes 100 TB experiments comparable: the val set never silently
  * drifts when the corpus is re-partitioned or the job is re-executed.
  *
  * Scale notes: split/sample/chunk are scan-speed column maps (no
  * shuffle; chunking explodes by at most len/stride). Packing needs a
  * running token total, which would be a single-partition window if done
  * over a global order — instead it packs independently inside hash
  * shards (each shard is a window partition), which is both scale-safe
  * and how multi-worker training actually consumes packed shards.
  */
object Corpus {

  /** 0..999 assignment bucket: first 60 bits of sha256(id || salt) mod
    * 1000. The salt versions the split — bump it to draw a fresh one.
    */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(sha2(concat(id.cast("string"), lit(salt)), 256), 1, 15), 16, 10)
      .cast("long") % 1000

  /** Reproducible train/val/test split: 90/5/5 by hash bucket. */
  def splitAssign(docs: DataFrame, idCol: String, salt: String = ":split:v1"): DataFrame =
    docs.withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test"))

  /** Leakage-safe split: identical/near-identical content must never
    * straddle train and test (a duplicated doc split across them leaks
    * the test set into training — the standard eval-contamination bug).
    * Docs group by normalized-content hash; every member draws its
    * bucket from the GROUP's canonical id (min doc_id), so a whole dup
    * group lands in one split, while singleton docs get exactly the
    * same assignment as `splitAssign` (same salt, same draw — the two
    * splits agree everywhere except where leakage was possible).
    * One shuffle, on the 32-byte content hash; text never moves.
    */
  def splitLeakageSafe(docs: DataFrame, idCol: String, textCol: String,
                       salt: String = ":split:v1"): DataFrame = {
    val canon = docs
      .select(col(idCol).as("doc_id"), Dedup.normHash(col(textCol)).as("h"))
      .withColumn("canon_id", min(col("doc_id")).over(Window.partitionBy(col("h"))))
    canon.withColumn("bucket", hashBucket(col("canon_id"), salt))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("canon_id"), col("bucket"), col("split"))
  }

  /** Stratified sampling: per-stratum keep-rates (permille), applied via
    * an independent hash draw — e.g. downsample over-represented
    * languages. Rows of strata absent from `ratesPermille` are dropped.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       ratesPermille: Map[String, Int],
                       salt: String = ":sample:v1"): DataFrame = {
    val rate = ratesPermille.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(hashBucket(col(idCol), salt) < rate)
  }

  /** Deterministic m-per-stratum sample — eval/holdout set construction:
    * the first `perStratum` documents of each stratum in sha-draw order
    * (hash of id + versioned salt, id tie-break). Unlike rate-based
    * `stratifiedSample`, the output SIZE is exact per stratum — what an
    * eval suite needs — and the draw is reproducible on any engine and
    * stable under corpus repartitioning. The window is partitioned by
    * stratum (never global), so it scales with the widest stratum's
    * sort, and at 100 TB the same draw can pre-filter with a bucket
    * threshold first so the window sees a small superset.
    */
  def evalSample(docs: DataFrame, idCol: String, stratumCol: String,
                 perStratum: Int, salt: String = ":eval:v1"): DataFrame = {
    val h = conv(substring(sha2(concat(col(idCol).cast("string"), lit(salt)), 256), 1, 15), 16, 10)
      .cast("long")
    docs.withColumn("h", h)
      .withColumn("draw_rank", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("h"), col(idCol))))
      .filter(col("draw_rank") <= perStratum)
      .select(col(idCol), col(stratumCol), col("draw_rank"))
  }

  /** Exact-size weighted sample: probability-proportional-to-size (PPS)
    * SYSTEMATIC sampling — m docs drawn with inclusion probability
    * proportional to an integer weight (token mass, chars), the
    * survey-sampling classic re-expressed for training-data selection
    * ("sample 1M docs, long docs proportionally more often, exact budget,
    * reproducible"). `evalSample` is the uniform exact-size draw;
    * `qualityWeightedSample` is weighted but soft-sized; this is the
    * missing corner: weighted AND exact-size.
    *
    * Construction (all integer, so any engine replays it bit-for-bit —
    * the Efraimidis–Spirakis u^(1/w) key would hinge on libm `ln`/`pow`
    * ulps and is NOT cross-engine stable):
    * docs are laid on a line in sha-draw order (deterministic,
    * layout-invariant), each owning the interval [cum−w, cum) of its
    * cumulative weight; the m sample points sit at W·(2i+1)/(2m). A doc
    * is picked once per point inside its interval — `copies` ≥ 2 means
    * the doc outweighs a full stride W/m (PPS multiplicity semantics).
    * Σ copies = m exactly, zero-weight docs are never picked.
    *
    * Scale shape: ONE range-partitioned sort on the draw key + the same
    * two-pass per-partition prefix sum `curriculum` uses (pass 1 ships
    * one (partition, weight-sum) row per partition to the driver — a
    * numPartitions-sized artifact, never data); selection itself is
    * per-row integer arithmetic at scan speed. Overflow guard: the
    * scaled positions reach 2·m·W, which must fit a signed 64 — at
    * 100 TB weight mass, chunk the draw per stratum or downscale weights
    * (the require makes the failure loud, not wrong).
    */
  def ppsSystematicSample(docs: DataFrame, idCol: String, weightCol: Column,
                          m: Int, salt: String = ":pps:v1"): DataFrame = {
    require(m > 0, "sample size m must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // Draw key: the 15-char sha256 hex prefix AS A STRING. Fixed-width
    // lowercase hex means lexicographic order == numeric order, so no
    // engine ever has to parse the 60-bit magnitude (a hex-literal CAST
    // is the one construct whose parse can drift between engines; the
    // string comparison cannot).
    val h = substring(sha2(concat(col(idCol).cast("string"), lit(salt)), 256), 1, 15)
    val ds = docs.select(col(idCol).cast("long").as("doc_id"),
        weightCol.cast("long").as("w"), h.as("h"))
      .as[(Long, Long, String)]
      .repartitionByRange(col("h"), col("doc_id"))
      .sortWithinPartitions(col("h"), col("doc_id"))
    val sorted = ds.rdd.localCheckpoint() // both passes read the sorted runs
    val (offs, totalW) = graft.ops.TwoPass.prefixAndTotal[(Long, Long, String), Long](
      sorted, 0L,
      (s, r) => {
        require(r._2 >= 0, s"negative weight ${r._2} for doc ${r._1}")
        s + r._2
      }, _ + _)
    require(totalW > 0, "total weight must be positive")
    // the largest intermediate is 2mW + (W-1) inside nBelow, so the
    // bound is (2m+1)·W — a plain 2m·W check would let the addition
    // wrap for W in the top 1/(2m+1) sliver and return WRONG copies
    require(totalW <= Long.MaxValue / (2L * m + 1),
      s"(2m+1)*W = ${2L * m + 1}*$totalW overflows 64-bit; chunk the draw or downscale weights")
    val mL = m.toLong
    val out = sorted.mapPartitionsWithIndex { case (i, it) =>
      var cum = offs(i)
      // #points strictly below scaled position x: points are W·(2i+1)
      def nBelow(x: Long): Long = math.min(mL, (x + totalW - 1) / (2L * totalW))
      it.flatMap { case (id, w, _) =>
        val lo = nBelow(2L * mL * cum)
        cum += w
        val copies = nBelow(2L * mL * cum) - lo
        if (copies >= 1) Some((id, w, copies)) else None
      }
    }
    out.toDF("doc_id", "w", "copies")
  }

  /** Overlapping token windows: chunk i covers tokens [i*stride,
    * i*stride + width); starts every `stride` tokens while inside the
    * doc, so a doc of n tokens yields 1 + floor((n-1)/stride) chunks.
    * Explode factor is bounded by len/stride — linear in corpus size.
    */
  def chunk(docs: DataFrame, textCol: String, idCol: String,
            width: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && width >= stride, "need 0 < stride <= width")
    val toks = split(trim(col(textCol)), "\\s+")
    docs
      .withColumn("toks", toks)
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((size(col("toks")) - 1) / stride).cast("int"))))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("toks"), col("chunk_id") * lit(stride) + 1, lit(width)), " ")
          .as("chunk_text"),
        least(size(col("toks")) - col("chunk_id") * stride, lit(width))
          .as("n_chunk_tokens"))
  }

  /** Token-budget sequence packing: documents are laid head-to-tail in
    * hash order inside each of `shards` hash shards, and a doc's pack is
    * the `budget`-token block its first token lands in — the standard
    * concat-then-cut pretraining layout. The running total is a window
    * over one shard, never the whole corpus.
    */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    budget: Int = 2048, shards: Int = 8,
                    salt: String = ":pack:v1"): DataFrame =
    packSequencesBy(docs, idCol, size(split(trim(col(textCol)), "\\s+")),
      budget, shards, salt)

  /** Quality-WEIGHTED sampling: keep probability proportional to the
    * document's quality score (p = score ∈ [0,1]) — the soft curation
    * filter modern pipelines favor over a hard threshold (borderline
    * docs are downsampled, not erased, so diversity survives). The draw
    * is the same deterministic sha-bucket as splits/sampling: no RNG,
    * reproducible on any engine and partitioning, and a doc's fate is a
    * pure function of (id, its own text) — re-runs and backfills agree.
    */
  def qualityWeightedSample(docs: DataFrame, textCol: String, idCol: String,
                            salt: String = ":qsample:v1"): DataFrame = {
    val t = TextAnalysis.tokenCount(col(textCol))
    val stop = TextAnalysis.stopwordHits(col(textCol), TextAnalysis.langStopwords.head._2)
    val awl = length(col(textCol)) / t
    val score = TextAnalysis.qualityScore(t, stop, awl)
    docs.select(col(idCol),
        hashBucket(col(idCol), salt).as("draw"),
        round(score * 1000).cast("long").as("keep_below"))
      .filter(col("draw") < col("keep_below"))
  }

  /** Packing by an arbitrary per-row token-count column — the budget a
    * TRAINED tokenizer yields (see Bpe.packBpeQuery) packs with the
    * same shard/window machinery as whitespace counts.
    */
  def packSequencesBy(docs: DataFrame, idCol: String, nTokens: Column,
                      budget: Int, shards: Int, salt: String): DataFrame = {
    // two-column order (hash bucket, then id): unique and deterministic at
    // ANY id range — a composite bucket*K+id key collides once ids reach K,
    // and window RANGE-frame peers would then double-count token spans
    val w = Window.partitionBy(col("shard")).orderBy(col("ord_bucket"), col(idCol))
    docs
      .select(col(idCol), nTokens.as("n_tokens"),
        (hashBucket(col(idCol), salt + ":shard") % shards).as("shard"),
        hashBucket(col(idCol), salt).as("ord_bucket"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("start_tok") / budget).cast("long").as("pack_id"))
  }

  /** Domain-mixture reweighting: resample so strata approach target
    * weight proportions under a total budget. Keep-rate per stratum s is
    * min(1, budgetFrac·N·w_s / (ΣW·N_s)) — i.e. the rate that hits the
    * target mixture exactly wherever it doesn't require upsampling —
    * applied through the same deterministic hash draw as the other
    * samplers. Strata without a weight are dropped. All rate arithmetic
    * is plain double products of exact counts, so assignments reproduce
    * cross-engine (no pow/ln).
    *
    * Scale shape: counts are one map-side-combined aggregate; the rate
    * table is stratum-cardinality rows, broadcast onto the corpus; the
    * draw is scan-speed. Nothing shuffles the corpus.
    */
  def targetMixture(docs: DataFrame, idCol: String, stratumCol: String,
                    weights: Map[String, Double], budgetFrac: Double,
                    salt: String = ":mix:v1"): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1, "budgetFrac in (0,1]")
    val wSum = weights.values.sum
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_s"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("keep_rate",
        least(lit(1.0), lit(budgetFrac) * col("n_total") * wCol / (lit(wSum) * col("n_s"))))
      .select(col(stratumCol), col("keep_rate"))
    docs.join(broadcast(rates), Seq(stratumCol))
      .filter(hashBucket(col(idCol), salt).cast("double") < col("keep_rate") * 1000.0)
      .select(docs.columns.map(col): _*) // original schema, like the sibling samplers
  }

  /** Train/test decontamination: flag train-split docs sharing any word
    * n-gram with a benchmark (here: the corpus's own test split, so the
    * op composes with splitAssign). Both sides explode to (shingle, id)
    * and meet in an equi-join — never a cross join; the benchmark side
    * is a distinct shingle set, tiny next to train, so Spark broadcasts
    * it. Lowercased shingles match Dedup's (n-gram parity is already
    * oracle-proven there).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, n: Int = 8): DataFrame = {
    val trainShingles = docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("shingle"))
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    trainShingles
      .join(broadcast(benchShingles), "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared_ngrams"))
  }

  /** Contamination REPORT — the audit sibling of `decontaminate`: every
    * train document with its distinct-shingle count, how many of those
    * shingles appear in the benchmark, the overlap fraction, and the
    * flag verdict at `maxFrac` (eval-contamination reports publish the
    * overlap distribution, not just the drop list — "0.3 % of train
    * docs carry ≥ 5 % benchmark 8-grams" is the headline number).
    * Zero-overlap docs stay in the report (LEFT join), so the output is
    * corpus-complete. Same join shape as `decontaminate`: benchmark
    * shingles broadcast, train side explodes once.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          benchmark: DataFrame, n: Int = 8,
                          maxFrac: Double = 0.05): DataFrame = {
    val base = docs.select(col(idCol), Dedup.shingles(col(textCol), n).as("sh"))
    val benchShingles = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    val shared = base
      .select(col(idCol), explode(col("sh")).as("shingle"))
      .join(broadcast(benchShingles), "shingle")
      .groupBy(col(idCol))
      .agg(countDistinct(col("shingle")).as("n_shared"))
    // shuffle_hash on the per-doc contamination counts (round 19):
    // PlanDiag measured this LeftOuter flipping broadcast → SortMergeJoin
    // at 80× — sorting BOTH doc-count-scaled sides to attach one skinny
    // (id, n_shared) row per doc. The hinted side hash-builds per
    // partition; AQE still broadcasts it when runtime-small
    base.select(col(idCol), size(col("sh")).cast("long").as("n_shingles"))
      .join(shared.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        col("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("overlap_frac"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_shingles") > maxFrac)
          .as("flagged"))
  }

  /** PII redaction: scrub emails, SSN-shaped and phone-shaped numbers to
    * typed placeholders. One codegen'd regexp_replace chain — scan-speed,
    * and the patterns are deliberately POSIX-portable (the DuckDB oracle
    * runs the identical regexes).
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
    regexp_replace(ssn, "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>")
  }

  // ---- registered queries -------------------------------------------------

  def splitQuery(spark: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))

  def sampleQuery(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 1000, "de" -> 500, "es" -> 250, "fr" -> 125))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  def chunkQuery(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("doc_id"), col("chunk_id"))

  def packQuery(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Train docs contaminated by the test split (shared 8-grams). */
  def decontaminateQuery(spark: SparkSession, dir: String): DataFrame = {
    val assigned = splitAssign(Tables.documents(spark, dir), "doc_id")
    decontaminate(
      assigned.filter(col("split") === "train"), "doc_id", "text",
      assigned.filter(col("split") === "test"))
      .orderBy(col("doc_id"))
  }

  /** Contamination audit of the train split against the test split. */
  def contaminationReportQuery(spark: SparkSession, dir: String): DataFrame = {
    val assigned = splitAssign(Tables.documents(spark, dir), "doc_id")
    contaminationReport(
      assigned.filter(col("split") === "train"), "doc_id", "text",
      assigned.filter(col("split") === "test"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-scaled mixture weights per source (w_s ∝ p_s^α at
    * α = 1/2, the mT5/XLM-R multinomial up/down-sampling rule): flattens
    * the token-mass distribution so head sources shrink and tail sources
    * grow, and reports each source's normalized weight plus its document
    * allocation under a `budgetFrac` corpus budget. α is fixed at 1/2
    * because IEEE-754 requires sqrt to be correctly rounded (pow is not),
    * and the weights are floored to integer micro-units before
    * normalization — every downstream ratio is a ratio of exact integers,
    * so the DuckDB oracle agrees bit-for-bit at any scale.
    *
    * Scale shape: ONE distributed per-source aggregate; everything after
    * runs on the source-cardinality frame via broadcast joins, so the
    * corpus is scanned once and never reshuffled.
    */
  def temperatureMixture(docs: DataFrame, textCol: String, srcCol: String,
                         budgetFrac: Double): DataFrame = {
    val perSrc = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(lower(trim(col(textCol))), "\\s+")).cast("long")).as("n_tokens"))
    val tot = perSrc.agg(sum(col("n_tokens")).as("tot_tokens"),
      sum(col("n_docs")).as("tot_docs"))
    val wm = perSrc.crossJoin(broadcast(tot))
      .withColumn("wm",
        floor(sqrt(col("n_tokens").cast("double") / col("tot_tokens")) * lit(1000000.0))
          .cast("long"))
    val wsum = wm.agg(sum(col("wm")).as("w_sum"))
    wm.crossJoin(broadcast(wsum))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("wm").cast("double") / col("w_sum"), 6).as("weight"),
        round(floor(col("tot_docs") * lit(budgetFrac)) * col("wm").cast("double") / col("w_sum"))
          .cast("long").as("target_docs"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-bigram profile is — the
    * log-likelihood ratio of the doc's features under the add-one-
    * smoothed target vs raw bucket distributions — and select the
    * top `keepPermille`/1000 of the corpus by weight. `targetPred`
    * marks the in-corpus exemplar set (e.g. a trusted language or
    * source); at 100 TB the same shape scores a web crawl against a
    * small high-quality reference corpus.
    *
    * Determinism & scale (the `perplexityBuckets` playbook): bigrams
    * hash into `buckets` cells via the engine's sha-prefix draw, so
    * both engines build the identical feature table; per-(doc,bucket)
    * log-ratio terms quantize to 1/2^16 BEFORE the BIGINT sum
    * (associative — groupBy order can't flip a selection); the bucket
    * distributions live in a `buckets`-row broadcast frame; selection
    * thresholds come from a milli-weight histogram (value-closed top
    * slice, ties excluded), never a global row sort. One corpus scan:
    * the (doc, bucket, tf) aggregate is checkpointed and feeds the
    * distributions AND the per-doc scoring join.
    */
  /** Distribution drift between two corpus snapshots, per source: total
    * variation distance over hashed unigram buckets — the monitoring
    * operator a refreshed training corpus needs ("did source X's
    * language shift since the last crawl?"). TV = ½·Σ_b |p_b − q_b|
    * computed EXACTLY as integers: with bucket counts n/m and totals
    * N/M, the numerator Σ|n_b·M − m_b·N| is a DECIMAL(38,0) sum of
    * exact products (never a float subtraction of tiny probabilities),
    * divided once at the end — so the score reproduces bit-for-bit on
    * any engine and any partitioning, and a drift ALERT threshold
    * compares deterministically.
    *
    * Scale shape: one corpus scan explodes tokens into `buckets` hashed
    * cells per source (the DSIR bucket trick — vocabulary never
    * materializes); everything after the (source, bucket) aggregate is
    * sources×buckets cells, constant in corpus size. Sources absent
    * from one snapshot emit a null tv (no distribution to compare), not
    * a crash.
    */
  def corpusDrift(docs: DataFrame, textCol: String, sourceCol: String,
                  snapshotPred: Column, buckets: Int = 64,
                  salt: String = ":drift:v1"): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val cells = docs
      .select(col(sourceCol).as("source"), snapshotPred.as("in_b"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .withColumn("bucket",
        conv(substring(sha2(concat(col("tok"), lit(salt)), 256), 1, 15), 16, 10)
          .cast("long") % buckets)
      .groupBy(col("source"), col("bucket"))
      .agg(sum(when(col("in_b"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("in_b"), 1L).otherwise(0L)).as("n_b"))
    val tot = cells.groupBy(col("source"))
      .agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    cells.join(broadcast(tot), Seq("source"))
      .select(col("source"), col("ta"), col("tb"),
        abs(col("n_a").cast(dec) * col("tb") - col("n_b").cast(dec) * col("ta"))
          .as("d"))
      .groupBy(col("source"), col("ta"), col("tb"))
      .agg(sum(col("d")).as("num"))
      .select(col("source"), col("ta").as("tokens_a"), col("tb").as("tokens_b"),
        when(col("ta") > 0 && col("tb") > 0,
          round(col("num").cast("double") / (lit(2.0) * col("ta") * col("tb")), 6))
          .as("tv"))
  }

  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
                  targetPred: Column, buckets: Int = 256,
                  keepPermille: Int = 200,
                  salt: String = ":dsir:v1"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val feats = docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"), toks.as("t"))
      .select(col("doc_id"), col("is_target"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("bucket",
        conv(substring(sha2(concat(col("bg"), lit(salt)), 256), 1, 15), 16, 10)
          .cast("long") % buckets)
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val bs = feats.groupBy(col("bucket")).agg(
      coalesce(sum(when(col("is_target"), col("tf"))), lit(0L)).as("tgt"),
      sum(col("tf")).as("raw"))
    val st = bs.agg(sum(col("tgt")).as("n_tgt"), sum(col("raw")).as("n_raw"))
    val lr = bs.crossJoin(broadcast(st))
      .select(col("bucket"),
        (log2((col("tgt") + lit(1L)).cast("double") / (col("n_tgt") + lit(buckets)).cast("double"))
          - log2((col("raw") + lit(1L)).cast("double") / (col("n_raw") + lit(buckets)).cast("double")))
          .as("lr"))
    val perDoc = feats.join(broadcast(lr), Seq("bucket"))
      .withColumn("term_q", round(col("tf") * col("lr") * lit(65536.0), 0).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("n_grams"), sum(col("term_q")).as("logw_q"))
    // LEFT join: a one-token doc has no bigrams — it must still get a row
    val scored = docs
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logw_q"), lit(0L)).as("logw_q"))
      .withColumn("logw", col("logw_q").cast("double") / lit(65536.0))
      .withColumn("logw_m", floor(col("logw") * lit(1000.0)).cast("long"))
      .localCheckpoint() // feeds the histogram AND the final select
    val hist = scored.groupBy(col("logw_m")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum(col("c")).over(
      Window.orderBy(col("logw_m").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = scored.agg(count(lit(1)).as("n_docs"))
    val th = cum.crossJoin(broadcast(tot)).agg(
      min(when(col("cum") <= ceil(col("n_docs") * lit(keepPermille) / lit(1000.0)),
        col("logw_m"))).as("t"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("is_target"), col("n_grams"), col("logw"),
        coalesce(col("logw_m") >= col("t"), lit(false)).as("selected"))
  }

  /** Curriculum ordering: the corpus in training order — highest-quality
    * documents first (quality-descending, doc_id tie-break), each with
    * its GLOBAL rank, running token total, and phase tag (the first
    * `warmupFrac` of token mass is the warm-up slice; curriculum
    * schedules feed cleanest data to early optimization).
    *
    * Global rank and prefix sum WITHOUT a single-partition window — the
    * two-pass shape a 100 TB total order actually uses: range-partition
    * by the sort key, sort within partitions, collect per-partition
    * (row count, token sum) — a num-partitions-sized driver artifact —
    * scan-left into per-partition offsets, then one mapPartitions pass
    * adds offsets to local running totals. Where the range bounds fall
    * is irrelevant to the answer: the (quality, id) order is total and
    * unique, so ranks/prefix sums are identical for ANY partitioning —
    * sampling variance in the partitioner can't perturb the output.
    * Quality is the ×10⁶-quantized score (the data-card convention), so
    * the sort key is an integer — no float comparator anywhere.
    */
  def curriculum(docs: DataFrame, textCol: String, idCol: String,
                 warmupFrac: Double = 0.1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = TextAnalysis.tokenCount(col(textCol))
    val stop = TextAnalysis.stopwordHits(col(textCol), TextAnalysis.langStopwords.head._2)
    val awl = length(col(textCol)) / t
    val ds = docs.select(
        col(idCol).cast("long").as("doc_id"),
        round(TextAnalysis.qualityScore(t, stop, awl) * lit(1000000.0), 0)
          .cast("long").as("q_q"),
        t.cast("long").as("n_toks"))
      .as[(Long, Long, Long)]
      .repartitionByRange(col("q_q").desc, col("doc_id"))
      .sortWithinPartitions(col("q_q").desc, col("doc_id"))
    val sorted = ds.rdd.localCheckpoint() // both passes read the sorted runs
    val (offs, totals) = graft.ops.TwoPass.prefixAndTotal[(Long, Long, Long), (Long, Long)](
      sorted, (0L, 0L),
      { case ((n, tok), r) => (n + 1, tok + r._3) },
      { case ((a, b), (c, d)) => (a + c, b + d) })
    val warmupBudget = math.ceil(totals._2 * warmupFrac)
    val out = sorted.mapPartitionsWithIndex { case (i, it) =>
      var rank = offs(i)._1; var cum = offs(i)._2
      it.map { case (id, q, toks) =>
        rank += 1; cum += toks
        (id, rank, q / 1000000.0, cum,
          if (cum <= warmupBudget) "warmup" else "main")
      }
    }
    out.toDF("doc_id", "rank", "quality", "cum_tokens", "phase")
  }

  /** The 20 synthetic sources reweighted into 4 weight tiers under a
    * half-size budget (sf-invariant: rates derive from counts).
    */
  val MixWeights: Seq[(String, Double)] =
    (0 until 20).map(i => s"src$i" -> (1.0 + (i % 4)))
  private val MixBudgetFrac = 0.5

  def mixQuery(spark: SparkSession, dir: String): DataFrame =
    targetMixture(Tables.documents(spark, dir), "doc_id", "source",
      MixWeights.toMap, MixBudgetFrac)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  def mixTemperatureQuery(spark: SparkSession, dir: String): DataFrame =
    temperatureMixture(Tables.documents(spark, dir), "text", "source", MixBudgetFrac)
      .orderBy(col("source"))

  def redactQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), redactPii(col("text")).as("clean_text"))
      .orderBy(col("doc_id"))

  /** 5 docs per source in sha-draw order (exact-size eval sample). */
  def evalSampleQuery(spark: SparkSession, dir: String): DataFrame =
    evalSample(Tables.documents(spark, dir), "doc_id", "source", perStratum = 5)
      .orderBy(col("source"), col("draw_rank"))

  /** Exact-200-doc PPS draw weighted by character mass. */
  def ppsSampleQuery(spark: SparkSession, dir: String): DataFrame =
    ppsSystematicSample(Tables.documents(spark, dir), "doc_id",
      col("n_chars"), m = PpsSampleM)
      .orderBy(col("doc_id"))

  private val PpsSampleM = 200

  /** Drift between the even- and odd-doc_id halves, per source. */
  def driftQuery(spark: SparkSession, dir: String): DataFrame =
    corpusDrift(Tables.documents(spark, dir), "text", "source",
      col("doc_id") % 2 === 1)
      .orderBy(col("source"))

  /** Curriculum order over documents. */
  def curriculumQuery(spark: SparkSession, dir: String): DataFrame =
    curriculum(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("doc_id"))

  /** Leakage-safe split over documents (dup groups stay intact). */
  def splitLeakageSafeQuery(spark: SparkSession, dir: String): DataFrame =
    splitLeakageSafe(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** DSIR weights against the English slice as the target exemplar set. */
  def dsirQuery(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(spark, dir), "text", "doc_id",
      col("lang") === "en")
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mix_target" -> (mixQuery _),
    "llm_mix_temperature" -> (mixTemperatureQuery _),
    "llm_split" -> (splitQuery _),
    "llm_sample_stratified" -> (sampleQuery _),
    "llm_sample_quality" -> ((s: SparkSession, dir: String) =>
      qualityWeightedSample(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id"))),
    "llm_chunks" -> (chunkQuery _),
    "llm_pack" -> (packQuery _),
    "llm_decontaminate" -> (decontaminateQuery _),
    "llm_pii_redact" -> (redactQuery _),
    "llm_dsir_select" -> (dsirQuery _),
    "llm_split_leakage_safe" -> (splitLeakageSafeQuery _),
    "llm_curriculum" -> (curriculumQuery _),
    "llm_contamination_report" -> (contaminationReportQuery _),
    "llm_eval_sample" -> (evalSampleQuery _),
    "llm_sample_pps" -> (ppsSampleQuery _),
    "llm_corpus_drift" -> (driftQuery _))

  // the hash draw in ANSI SQL (documents.doc_id is BIGINT in both engines,
  // so the string concat matches byte-for-byte)
  private[llm] def bucketSql(salt: String, idExpr: String = "doc_id") =
    s"CAST(CONCAT('0x', substr(sha256(CAST($idExpr AS VARCHAR) || '$salt'), 1, 15)) AS BIGINT) % 1000"

  // 8-gram shingles, same construction the 3-gram dedup oracles proved
  private val shingle8Sql: String = {
    val toks = "string_split_regex(lower(trim(text)), '\\s+')"
    val terms = (0 until 8).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, greatest(len($toks) - 7, 1)), i -> $terms))"
  }

  // mixQuery's weight CASE and ΣW as SQL literals (sum of small integers
  // in double is exact, so the literal equals the Scala fold exactly)
  private val mixWeightSql: String =
    "(CASE " + MixWeights.map { case (k, v) => s"WHEN source = '$k' THEN $v" }
      .mkString(" ") + " ELSE 0.0 END)::DOUBLE"
  private val mixWSum: Double = MixWeights.map(_._2).sum

  val oracles: Map[String, String] = Map(
    "llm_mix_target" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
         |n AS (SELECT COUNT(*) AS n_total FROM documents),
         |r AS (
         |  SELECT source,
         |    least(1.0::DOUBLE,
         |      $MixBudgetFrac::DOUBLE * n_total * $mixWeightSql / ($mixWSum::DOUBLE * n_s)) AS keep_rate
         |  FROM c, n)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN r USING (source)
         |WHERE CAST(${bucketSql(":mix:v1")} AS DOUBLE) < keep_rate * 1000.0
         |ORDER BY d.doc_id""".stripMargin,
    "llm_mix_temperature" ->
      s"""WITH c AS MATERIALIZED (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         |             CAST(SUM(n_docs) AS BIGINT) AS tot_docs FROM c),
         |w AS (SELECT source, n_docs, n_tokens, tot_docs,
         |        CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / tot_tokens) * 1000000.0) AS BIGINT) AS wm
         |      FROM c, t),
         |s AS (SELECT CAST(SUM(wm) AS BIGINT) AS w_sum FROM w)
         |SELECT source, n_docs, n_tokens,
         |  round(CAST(wm AS DOUBLE) / w_sum, 6) AS weight,
         |  CAST(round(floor(tot_docs * $MixBudgetFrac) * CAST(wm AS DOUBLE) / w_sum) AS BIGINT) AS target_docs
         |FROM w, s ORDER BY source""".stripMargin,
    "llm_split" ->
      s"""SELECT doc_id, ${bucketSql(":split:v1")} AS bucket,
         |  CASE WHEN ${bucketSql(":split:v1")} < 900 THEN 'train'
         |       WHEN ${bucketSql(":split:v1")} < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_sample_quality" -> {
      // the same score replica llm_text_quality proves, driving the
      // same sha-bucket draw the split/sample oracles prove
      val toks = "len(regexp_split_to_array(trim(text), '\\s+'))"
      val stops = """len(regexp_extract_all(lower(text), '\b(the|and|is|of|to)\b'))"""
      val score = s"""0.4 * least(1.0, $toks / 100.0)
         |    + 0.3 * least(1.0, $stops * 10.0 / $toks)
         |    + 0.3 * (CASE WHEN (length(text) / $toks) BETWEEN 3.0 AND 10.0
         |             THEN 1.0 ELSE 0.0 END)""".stripMargin
      s"""SELECT doc_id,
         |  ${bucketSql(":qsample:v1")} AS draw,
         |  CAST(round(1000 * ($score)) AS BIGINT) AS keep_below
         |FROM documents
         |WHERE ${bucketSql(":qsample:v1")} < round(1000 * ($score))
         |ORDER BY doc_id""".stripMargin
    },
    "llm_sample_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${bucketSql(":sample:v1")} <
         |  CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 500
         |            WHEN 'es' THEN 250 WHEN 'fr' THEN 125 ELSE 0 END
         |ORDER BY doc_id""".stripMargin,
    "llm_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    CAST(unnest(range((len(toks) - 1) // 48 + 1)) AS INTEGER) AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ') AS chunk_text,
        |  CAST(least(len(toks) - chunk_id * 48, 64) AS INTEGER) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "llm_pack" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
         |    CAST(CONCAT('0x', substr(sha256(CAST(doc_id AS VARCHAR) || ':pack:v1:shard'), 1, 15)) AS BIGINT) % 1000 % 8 AS shard,
         |    ${bucketSql(":pack:v1")} AS ord_bucket
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, shard, n_tokens,
         |    coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord_bucket, doc_id), 0) - n_tokens AS start_tok
         |  FROM base)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(start_tok // 2048 AS BIGINT) AS pack_id
         |FROM cum ORDER BY doc_id""".stripMargin,
    "llm_decontaminate" ->
      s"""WITH sp AS (
         |  SELECT doc_id, text,
         |    CASE WHEN ${bucketSql(":split:v1")} < 900 THEN 'train'
         |         WHEN ${bucketSql(":split:v1")} < 950 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |tr AS (SELECT doc_id, unnest($shingle8Sql) AS shingle FROM sp WHERE split = 'train'),
         |te AS (SELECT DISTINCT unnest($shingle8Sql) AS shingle FROM sp WHERE split = 'test')
         |SELECT tr.doc_id, COUNT(DISTINCT tr.shingle) AS n_shared_ngrams
         |FROM tr JOIN te USING (shingle)
         |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // the report sibling: every train doc, overlap fraction, flag verdict
    "llm_contamination_report" ->
      s"""WITH sp AS (
         |  SELECT doc_id, text,
         |    CASE WHEN ${bucketSql(":split:v1")} < 900 THEN 'train'
         |         WHEN ${bucketSql(":split:v1")} < 950 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |base AS MATERIALIZED (
         |  SELECT doc_id, $shingle8Sql AS sh FROM sp WHERE split = 'train'),
         |tr AS (SELECT doc_id, unnest(sh) AS shingle FROM base),
         |te AS (SELECT DISTINCT unnest($shingle8Sql) AS shingle FROM sp WHERE split = 'test'),
         |sh AS (SELECT tr.doc_id, COUNT(DISTINCT tr.shingle) AS n_shared
         |       FROM tr JOIN te USING (shingle) GROUP BY tr.doc_id)
         |SELECT base.doc_id, CAST(len(base.sh) AS BIGINT) AS n_shingles,
         |  CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
         |  round(CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) / len(base.sh), 6) AS overlap_frac,
         |  CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) / len(base.sh) > 0.05 AS flagged
         |FROM base LEFT JOIN sh USING (doc_id)
         |ORDER BY base.doc_id""".stripMargin,
    "llm_pii_redact" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |  '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the full sha draw as an ORDER key (the bucket oracle's construction
    // without the % 1000)
    "llm_eval_sample" ->
      """SELECT doc_id, source,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY CAST(CONCAT('0x', substr(sha256(CAST(doc_id AS VARCHAR) || ':eval:v1'), 1, 15)) AS BIGINT), doc_id) AS BIGINT) AS draw_rank
        |FROM documents
        |QUALIFY draw_rank <= 5
        |ORDER BY source, draw_rank""".stripMargin,
    // the TV numerator replayed in HUGEINT (exact, like Spark's
    // DECIMAL(38,0)); one double division + round at the end
    "llm_corpus_drift" ->
      """WITH t AS (SELECT source, doc_id % 2 = 1 AS in_b,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT source,
        |    CAST(CONCAT('0x', substr(sha256(tok || ':drift:v1'), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CAST(SUM(CASE WHEN in_b THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM t GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(n_a) AS BIGINT) AS ta,
        |    CAST(SUM(n_b) AS BIGINT) AS tb FROM c GROUP BY 1),
        |terms AS (SELECT c.source, t.ta, t.tb,
        |    abs(CAST(c.n_a AS HUGEINT) * t.tb - CAST(c.n_b AS HUGEINT) * t.ta) AS d
        |  FROM c JOIN tot t USING (source))
        |SELECT source, ta AS tokens_a, tb AS tokens_b,
        |  CASE WHEN ta > 0 AND tb > 0
        |       THEN ROUND(CAST(SUM(d) AS DOUBLE) / (2.0 * ta * tb), 6) END AS tv
        |FROM terms GROUP BY source, ta, tb
        |ORDER BY source""".stripMargin,
    // the engine's two-pass partition prefix sum stated as one window
    // cumsum; the point-counting floor divisions replay exactly (// is
    // DuckDB's integer floor division). The draw ORDER is the 15-char
    // sha256 hex prefix compared AS A STRING on both sides — fixed-width
    // lowercase hex sorts lexicographically == its numeric value, so
    // neither engine parses a 60-bit hex magnitude. `copies` must be cast
    // back to BIGINT: DuckDB widens SUM(w) OVER to HUGEINT (INT128) and
    // the widening survives LEAST/// arithmetic, so without the cast the
    // oracle emits the surface's only INT128 column and a type-canonical
    // result hasher mismatches the engine's long even when every value is
    // bit-identical. Lossless: copies <= m = $PpsSampleM.
    "llm_sample_pps" ->
      s"""WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |    substr(sha256(CAST(doc_id AS VARCHAR) || ':pps:v1'), 1, 15) AS h
         |  FROM documents),
         |c AS (SELECT doc_id, w,
         |    SUM(w) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(w) OVER () AS tw
         |  FROM d),
         |s AS (SELECT doc_id, w,
         |    CAST(LEAST($PpsSampleM, (2*$PpsSampleM*cum + tw - 1) // (2*tw)) -
         |      LEAST($PpsSampleM, (2*$PpsSampleM*(cum - w) + tw - 1) // (2*tw))
         |      AS BIGINT) AS copies
         |  FROM c)
         |SELECT doc_id, w, copies FROM s WHERE copies >= 1
         |ORDER BY doc_id""".stripMargin,
    // the engine computes rank/prefix-sum via two-pass range partitioning;
    // the oracle states the SAME total order declaratively — the (q_q,
    // doc_id) key is unique, so both formulations are one answer
    "llm_curriculum" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(round((0.4 * least(1.0, len(regexp_split_to_array(trim(text), '\s+')) / 100.0)
        |      + 0.3 * least(1.0, len(regexp_extract_all(lower(text), '\b(the|and|is|of|to)\b')) * 10.0 / len(regexp_split_to_array(trim(text), '\s+')))
        |      + 0.3 * (CASE WHEN (length(text) / len(regexp_split_to_array(trim(text), '\s+'))) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)) * 1000000.0, 0) AS BIGINT) AS q_q,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |r AS (SELECT doc_id, q_q, n_toks,
        |        ROW_NUMBER() OVER (ORDER BY q_q DESC, doc_id) AS rank,
        |        SUM(n_toks) OVER (ORDER BY q_q DESC, doc_id) AS cum_tokens
        |      FROM d),
        |t AS (SELECT SUM(n_toks) AS total FROM d)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, q_q / 1000000.0 AS quality,
        |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CASE WHEN cum_tokens <= ceil(total * 0.1) THEN 'warmup' ELSE 'main' END AS phase
        |FROM r CROSS JOIN t ORDER BY doc_id""".stripMargin,
    // the split draw over the GROUP CANON id: same hash construction the
    // llm_split oracle proves, keyed on min(doc_id) per normalized hash
    "llm_split_leakage_safe" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    MIN(doc_id) OVER (PARTITION BY
         |      sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))) AS canon_id
         |  FROM documents)
         |SELECT doc_id, canon_id, ${bucketSql(":split:v1", "canon_id")} AS bucket,
         |  CASE WHEN ${bucketSql(":split:v1", "canon_id")} < 900 THEN 'train'
         |       WHEN ${bucketSql(":split:v1", "canon_id")} < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM c ORDER BY doc_id""".stripMargin,
    // replays the full DSIR pipeline: identical sha-prefix bucket draw,
    // identical log2(a)-log2(b) structure, terms quantized to 1/2^16
    // before the BIGINT sum, selection via the DESC milli-weight
    // histogram (value-closed top slice, boundary ties excluded)
    "llm_dsir_select" ->
      """WITH t AS (
        |  SELECT doc_id, lang = 'en' AS is_target,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, is_target,
        |        unnest(list_transform(generate_series(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
        |f AS MATERIALIZED (
        |  SELECT doc_id, is_target,
        |    CAST(CONCAT('0x', substr(sha256(bg || ':dsir:v1'), 1, 15)) AS BIGINT) % 256 AS bucket,
        |    COUNT(*) AS tf
        |  FROM b GROUP BY 1, 2, 3),
        |bs AS (SELECT bucket,
        |         CAST(COALESCE(SUM(CASE WHEN is_target THEN tf END), 0) AS BIGINT) AS tgt,
        |         CAST(SUM(tf) AS BIGINT) AS raw
        |       FROM f GROUP BY 1),
        |st AS (SELECT CAST(SUM(tgt) AS BIGINT) AS n_tgt, CAST(SUM(raw) AS BIGINT) AS n_raw FROM bs),
        |lr AS (SELECT bucket,
        |         log2(CAST(tgt + 1 AS DOUBLE) / CAST(st.n_tgt + 256 AS DOUBLE))
        |           - log2(CAST(raw + 1 AS DOUBLE) / CAST(st.n_raw + 256 AS DOUBLE)) AS lr
        |       FROM bs CROSS JOIN st),
        |d AS (SELECT f.doc_id, CAST(SUM(f.tf) AS BIGINT) AS n_grams,
        |        CAST(SUM(CAST(round(f.tf * lr.lr * 65536.0, 0) AS BIGINT)) AS BIGINT) AS logw_q
        |      FROM f JOIN lr USING (bucket) GROUP BY 1),
        |s AS MATERIALIZED (
        |  SELECT t.doc_id, t.is_target,
        |    COALESCE(d.n_grams, 0) AS n_grams,
        |    CAST(COALESCE(d.logw_q, 0) AS DOUBLE) / 65536.0 AS logw,
        |    CAST(floor(CAST(COALESCE(d.logw_q, 0) AS DOUBLE) / 65536.0 * 1000.0) AS BIGINT) AS logw_m
        |  FROM t LEFT JOIN d USING (doc_id)),
        |h AS (SELECT logw_m, COUNT(*) AS c FROM s GROUP BY 1),
        |cum AS (SELECT logw_m, SUM(c) OVER (ORDER BY logw_m DESC) AS cum FROM h),
        |tot AS (SELECT COUNT(*) AS n_docs FROM s),
        |th AS (SELECT MIN(CASE WHEN cum <= ceil(n_docs * 200 / 1000.0) THEN logw_m END) AS t
        |       FROM cum CROSS JOIN tot)
        |SELECT s.doc_id, s.is_target, s.n_grams, s.logw,
        |  COALESCE(s.logw_m >= th.t, FALSE) AS selected
        |FROM s CROSS JOIN th ORDER BY s.doc_id""".stripMargin)
}
