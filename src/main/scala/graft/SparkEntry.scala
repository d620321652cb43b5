package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.llm.{Bpe, Corpus, CorpusSuffix, Curation, Dedup, Distill, FrequentItems, Multimodal, Similarity, Suffix, TextAnalysis, Unigram}
import graft.ops.{Graph, Joins, Linkage}
import graft.pipeline.{Analytics, Crm, Inventory, Pos, Web}
import graft.store.{Bucketed, Lake, ZOrder}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query
  * over the driver's synthetic tables, with an equivalent DuckDB oracle
  * where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Web.queries, Web.oracles),
      (Crm.queries, Crm.oracles),
      (Pos.queries, Pos.oracles),
      (Inventory.queries, Inventory.oracles),
      (Analytics.queries, Analytics.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Dedup.queries, Dedup.oracles),
      (Similarity.queries, Similarity.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (Curation.queries, Curation.oracles),
      (Corpus.queries, Corpus.oracles),
      (Suffix.queries, Suffix.oracles),
      (CorpusSuffix.queries, CorpusSuffix.oracles),
      (FrequentItems.queries, FrequentItems.oracles),
      (Distill.queries, Distill.oracles),
      (Joins.queries, Joins.oracles),
      (Graph.queries, Graph.oracles),
      (Linkage.queries, Linkage.oracles),
      (Bucketed.queries, Bucketed.oracles),
      (graft.store.CatalogTable.queries, graft.store.CatalogTable.oracles),
      (Bpe.queries, Bpe.oracles),
      (Unigram.queries, Unigram.oracles),
      (ZOrder.queries, ZOrder.oracles),
      (Lake.queries, Lake.oracles),
      (graft.stream.StreamReplay.queries, graft.stream.StreamReplay.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Web.engagement(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.map(_._2).reduce(_ ++ _)
}
