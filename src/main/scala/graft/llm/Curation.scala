package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data curation: the llm operators composed into the
  * pipeline an LLM data team actually runs, with a per-stage attrition
  * report. Every stage is a DataFrame transform — the whole pipeline is
  * one lazy plan per stage boundary, nothing quadratic, nothing on the
  * driver except the stage row counts in the report.
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

  final case class Result(curated: DataFrame, report: DataFrame)

  def curate(docs: DataFrame, config: Config = Config()): Result = {
    val spark = docs.sparkSession
    import spark.implicits._

    val n0 = docs.count()

    // 1. normalize
    val normalized = docs.withColumn("norm_text",
      regexp_replace(trim(lower(col("text"))), "\\s+", " "))

    // 2. language allowlist (stopword-score heuristic)
    val scores = TextAnalysis.langStopwords.map { case (lang, words) =>
      lang -> TextAnalysis.stopwordHits(col("norm_text"), words)
    }
    val withLang = normalized.withColumn("pred_lang", TextAnalysis.langPredict(scores))
    val langKept = withLang.filter(col("pred_lang").isin(config.allowedLangs.toSeq: _*))
    val n1 = langKept.count()

    // 3. quality floor
    val t = TextAnalysis.tokenCount(col("norm_text"))
    val stop = TextAnalysis.stopwordHits(col("norm_text"), TextAnalysis.langStopwords.head._2)
    val awl = length(col("norm_text")) / t
    val qualKept = langKept
      .withColumn("quality", TextAnalysis.qualityScore(t, stop, awl))
      .filter(col("quality") >= config.minQuality)
    val n2 = qualKept.count()

    // 4. exact dedup on the normalized content hash, keep lowest id
    val keepIds = qualKept
      .groupBy(sha2(col("norm_text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactKept = qualKept.join(keepIds, "doc_id")
    val n3 = exactKept.count()

    // 5. near-dup removal: LSH candidates → exact n-gram verify → drop the
    // higher id of each surviving pair
    val pairs = Dedup.jaccardVerify(
        Dedup.minhashPairs(exactKept, "norm_text", "doc_id", minJaccard = 0.5)
          .select(col("id_a"), col("id_b")),
        exactKept, "norm_text", "doc_id", n = 3)
      .filter(col("jaccard") >= config.nearDupJaccard)
    val dropIds = pairs.select(col("id_b").as("doc_id")).distinct()
    val curated = exactKept.join(dropIds, Seq("doc_id"), "left_anti")
      .select(docs.columns.map(col): _*)
    val n4 = curated.count()

    val report = Seq(
      ("input", n0, n0),
      ("language_filter", n0, n1),
      ("quality_filter", n1, n2),
      ("exact_dedup", n2, n3),
      ("near_dedup", n3, n4))
      .toDF("stage", "rows_in", "rows_out")
    Result(curated, report)
  }

  // ---- registered queries -------------------------------------------------

  /** The curated corpus ids (rows-only: the near-dup stage is LSH-based). */
  def curatedQuery(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir)).curated
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Per-stage attrition (rows-only; deterministic). */
  def reportQuery(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir)).report

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_curation" -> (curatedQuery _),
    "llm_curation_report" -> (reportQuery _))

  val oracles: Map[String, String] = Map.empty
}
