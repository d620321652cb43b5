package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data curation: the llm operators composed into the
  * pipeline an LLM data team actually runs. Fully lazy: every document is
  * annotated with the stage that eliminated it (or "kept") in ONE composed
  * plan — no eager per-stage counts, no recompute cascade; the attrition
  * report is a single aggregation over the same plan.
  *
  * Stages: normalize → language allowlist → quality floor → exact dedup
  * (normalized-hash, keep lowest id) → MinHash-LSH near-dup removal
  * (greedy: for each verified pair, the higher id is dropped — cheap and
  * order-deterministic; a union-find pass can replace it when cluster-level
  * canonicalization matters).
  */
object Curation {

  final case class Config(
      allowedLangs: Set[String] = Set("en"),
      minQuality: Double = 0.5,
      nearDupJaccard: Double = 0.8)

  val Stages: Seq[String] =
    Seq("language_filter", "quality_filter", "exact_dedup", "near_dedup", "kept")

  /** Each input doc + `status`: which stage eliminated it, or "kept". */
  def annotate(docs: DataFrame, config: Config = Config()): DataFrame = {
    val normText = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    val scores = TextAnalysis.langStopwords.map { case (lang, words) =>
      lang -> TextAnalysis.stopwordHits(col("norm_text"), words)
    }
    val t = TextAnalysis.tokenCount(col("norm_text"))
    val stop = TextAnalysis.stopwordHits(col("norm_text"), TextAnalysis.langStopwords.head._2)
    val awl = length(col("norm_text")) / t

    val base = docs
      .withColumn("norm_text", normText)
      .withColumn("lang_ok",
        TextAnalysis.langPredict(scores).isin(config.allowedLangs.toSeq: _*))
      .withColumn("quality_ok", TextAnalysis.qualityScore(t, stop, awl) >= config.minQuality)

    // NB: the survivors subtree feeds four downstream branches and is
    // recomputed per branch — measured cheaper than materializing it
    // (localCheckpoint variant benchmarked 20% slower; codegen'd regex
    // scoring recomputes faster than block-store round-trips)
    val survivors = base.filter(col("lang_ok") && col("quality_ok"))
      .select(col("doc_id"), col("norm_text"))
    // exact dedup: lowest id per normalized-content hash survives
    val exactKeep = survivors
      .groupBy(sha2(col("norm_text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("exact_keep"))
    // near-dup: LSH candidates over exact survivors → exact verify → drop high ids
    val exactSurvivors = survivors.join(exactKeep.drop("exact_keep"), "doc_id")
    val nearDrop = Dedup.jaccardVerify(
        Dedup.minhashPairs(exactSurvivors, "norm_text", "doc_id", minJaccard = 0.5)
          .select(col("id_a"), col("id_b")),
        exactSurvivors, "norm_text", "doc_id", n = 3)
      .filter(col("jaccard") >= config.nearDupJaccard)
      .select(col("id_b").as("doc_id")).distinct()
      .withColumn("near_drop", lit(true))

    base
      .join(exactKeep, Seq("doc_id"), "left")
      .join(nearDrop, Seq("doc_id"), "left")
      .withColumn("status",
        when(!col("lang_ok"), "language_filter")
          .when(!col("quality_ok"), "quality_filter")
          .when(col("exact_keep").isNull, "exact_dedup")
          .when(col("near_drop").isNotNull, "near_dedup")
          .otherwise("kept"))
      .drop("norm_text", "lang_ok", "quality_ok", "exact_keep", "near_drop")
  }

  /** The curated corpus (original columns only). */
  def curate(docs: DataFrame, config: Config = Config()): DataFrame =
    annotate(docs, config).filter(col("status") === "kept")
      .select(docs.columns.map(col): _*)

  /** Attrition report: docs eliminated per stage + kept, one aggregation. */
  def report(docs: DataFrame, config: Config = Config()): DataFrame =
    annotate(docs, config)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("status"))

  // ---- registered queries -------------------------------------------------

  /** The curated corpus ids (rows-only: the near-dup stage is LSH-based). */
  def curatedQuery(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Per-stage attrition (rows-only; deterministic). */
  def reportQuery(spark: SparkSession, dir: String): DataFrame =
    report(Tables.documents(spark, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_curation" -> (curatedQuery _),
    "llm_curation_report" -> (reportQuery _))

  val oracles: Map[String, String] = Map.empty
}
