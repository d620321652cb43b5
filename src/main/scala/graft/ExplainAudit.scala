package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.ops.Joins
import graft.pipeline.{Analytics, Pos, Web}

/** Prints formatted physical plans for representative queries so the scan
  * pushdown / pruning / join strategy can be audited (run manually).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("audit", "local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n======== $name ========")
      df.explain("formatted")
    }

    show("web_engagement")(Web.engagement(spark, dir))
    // round-16 addition: the catalog-read twin — expect the same
    // aggregate over a CATALOG FileScan with the date range as a
    // PartitionFilter on event_date (registered-partition pruning, the
    // Athena behavior K9 replaces); build-asserted in PlanInvariantsSpec
    show("web_engagement_catalog")(
      graft.store.CatalogTable.engagementCatalogQuery(spark, dir))
    show("pos_sales_kpi")(Pos.salesKpi(spark, dir))
    show("sales_by_nation")(Analytics.salesByNation(spark, dir))
    show("top_customers")(Analytics.topCustomers(spark, dir))
    // round-2 reworks: shared-scan merge (expect ReusedExchange, one
    // lineitem scan), scan-speed IVF assignment (expect no Exchange
    // between the corpus scan and the centroid argmax)
    show("pos_merge_additive")(Pos.mergeAdditive(spark, dir))
    show("llm_ann_ivf")(Similarity.ivfQuery(spark, dir))
    show("llm_embed_neardup_lsh")(Similarity.nearDupLshQuery(spark, dir))
    // round-3 additions: as-of via union-tag-window (expect ONE Exchange,
    // no join node), bin-blocked range join (equi-join, no nested loop),
    // integer ADC scan over broadcast query codes
    show("events_asof_last_error")(Joins.asofQuery(spark, dir))
    show("events_error_impact")(Joins.errorImpactQuery(spark, dir))
    show("llm_knn_quantized")(Similarity.knnQuantizedQuery(spark, dir))
    // round-4 additions: blocked all-pairs (expect nBlocks broadcast
    // builds, EACH above a pmod slice filter — never the whole corpus),
    // trained-centroid IVF (same no-shuffle assignment as llm_ann_ivf),
    // salted star join (salt widens the shuffle key; result ≡ unsalted)
    show("llm_embed_neardup")(Similarity.nearDupQuery(spark, dir))
    show("llm_ann_ivf_kmeans")(Similarity.ivfKmeansQuery(spark, dir))
    show("skew_spend_salted")(Analytics.spendByNation(spark, dir, Some(8)))
    // containment: expect the shared-rare COUNT aggregation (scalar
    // shuffle) strictly BEFORE any branch carrying shingle arrays joins in
    show("llm_dedup_containment")(graft.llm.Dedup.containmentQuery(spark, dir))
    // round-4 additions: PQ ADC scan (corpus side carries codes only),
    // IVFPQ composition (probe join on centroid_id, still codes-only),
    // bucketed join+agg (ZERO hash exchanges anywhere in the plan),
    // projection/BPE-budget (scan-speed expressions, one aggregation)
    show("llm_knn_pq")(Similarity.knnPqQuery(spark, dir))
    show("llm_knn_ivfpq")(Similarity.knnIvfPqQuery(spark, dir))
    show("llm_knn_ivfpq_res")(Similarity.knnIvfPqResQuery(spark, dir))
    show("bucketed_spend")(graft.store.Bucketed.spendBucketedQuery(spark, dir))
    show("llm_embed_project")(Similarity.projectQuery(spark, dir))
    show("llm_vocab_coverage")(graft.llm.TextAnalysis.vocabQuery(spark, dir))
    show("llm_bpe_tokens")(graft.llm.Bpe.tokensQuery(spark, dir))
    // round-6 additions: perplexity/DSIR (ONE exploded-token/bigram scan
    // feeding model + scoring via a checkpointed aggregate; thresholds
    // from histogram frames, no global row sort), semdedup (pair join
    // scoped to the cluster key), hard negatives (anchors broadcast, one
    // checkpointed scored scan for both aggs), k-center assignment
    // (centers ride as literals — no join, no shuffle below the scan)
    show("llm_perplexity")(graft.llm.TextAnalysis.perplexityQuery(spark, dir))
    show("llm_dsir_select")(graft.llm.Corpus.dsirQuery(spark, dir))
    show("llm_semdedup")(Similarity.semDedupQuery(spark, dir))
    show("llm_hard_negatives")(Similarity.hardNegativesQuery(spark, dir))
    show("llm_kcenter_select")(Similarity.kCenterQuery(spark, dir))
    show("llm_split_leakage_safe")(graft.llm.Corpus.splitLeakageSafeQuery(spark, dir))
    // curriculum: expect range-partition Exchange + per-partition sort,
    // NO partition-less Window; quantiles/data-card: histogram/rollup
    // frames only, windows partitioned by source
    show("llm_curriculum")(graft.llm.Corpus.curriculumQuery(spark, dir))
    show("llm_quality_quantiles")(graft.llm.TextAnalysis.qualityQuantilesQuery(spark, dir))
    show("llm_data_card")(graft.llm.TextAnalysis.dataCardQuery(spark, dir))
    show("llm_contamination_report")(graft.llm.Corpus.contaminationReportQuery(spark, dir))
    // standardize: stats fold into ONE broadcast struct array (same
    // two-pass shape as quantizeUint8); scoring is a scan-speed zip_with
    show("llm_embed_standardize")(Similarity.standardizeQuery(spark, dir))
    // round-8 addition: ORC round-trip — expect Format: ORC with the
    // price predicate in PushedFilters and the status predicate as a
    // PartitionFilter (directory pruning), ReadSchema = 2 data columns
    show("orc_roundtrip")(graft.store.Lake.orcRoundtripQuery(spark, dir))
    // winnow overlap: ONE checkpointed winnow scan (the RDDScan) feeding
    // sizes/df/join; the pair join carries (doc_id, fp) only — no text
    // column survives past the scan. Shown via the split-out LAZY plan
    // (r19): the registered query checkpoint-severs its own plan, and
    // the flip-prone joins (now shuffle_hash-pinned) live in the lazy
    // form — same split as the probe below
    locally {
      val (sel, plan) = graft.llm.TextAnalysis.winnowOverlapPlan(
        Tables.documents(spark, dir), "text", "doc_id")
      show("llm_winnow_overlap")(plan)
      sel.unpersist(blocking = false)
    }
    // round-9 addition: winnow probe over the banded at-rest postings —
    // expect the postings FileScan with a band PartitionFilter (only the
    // probed band dirs are listed) and the checkpointed query fps as an
    // RDDScan; the registered query's own plan is checkpoint-severed, so
    // the audit shows the split-out lazy plan the checkpoint materializes
    locally {
      val queries = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(25L)) === 7)
      val root = graft.llm.TextAnalysis.winnowPostingsRoot(spark, dir)
      val (q, plan) = graft.llm.TextAnalysis.winnowProbePlan(
        spark, s"$root/postings", queries, "text", "doc_id",
        graft.llm.TextAnalysis.WinnowBands.toInt,
        graft.llm.TextAnalysis.WinnowMinShared,
        dfCap = Some(graft.llm.TextAnalysis.WinnowDfCap)) // the registered query's exact parameters
      show("llm_winnow_probe")(plan)
      q.unpersist(blocking = false)
    }

    // round-11 media additions: video/scene/audio are narrow
    // mapPartitions chains (one modality-spread shuffle, reductions
    // beside the decoder, long-sized shuffle rows); the dHash near-dup
    // must read BOTH band-join sides from the checkpointed hash
    // RDDScan — never two decode scans
    show("mm_video_scene_cuts")(graft.llm.Multimodal.videoSceneCutsQuery(spark, dir))
    show("mm_audio_energy")(graft.llm.Multimodal.audioEnergyQuery(spark, dir))
    show("mm_image_neardup")(graft.llm.Multimodal.imageNearDupQuery(spark, dir))

    // round-9 additions: entity resolution — expect the scalar block-size
    // gate (aggregate + LeftSemi) strictly BEFORE the pair equi-join
    // (SortMergeJoin/ShuffledHashJoin on bk, never CartesianProduct or
    // BroadcastNestedLoopJoin), levenshtein evaluated only on surviving
    // within-block candidates; clusters append ONE groupByKey exchange
    // for the per-block union-find (MapGroups) — no iterative rounds
    show("er_customer_pairs")(graft.ops.Linkage.customerPairs(spark, dir))
    show("er_customer_clusters")(graft.ops.Linkage.customerClusters(spark, dir))
    // transitions: the sequencing window hashpartitions on user_id (never
    // SinglePartition); everything above the lead() is a tiny aggregate
    show("events_transitions")(Analytics.eventTransitions(spark, dir))
    // graph family: triangles must plan the oriented wedge join with a
    // LEFT SEMI close (no materialized wedge output); pagerank's rounds
    // are join+partial-agg pairs over the checkpointed edge frame
    show("graph_triangles")(graft.ops.Graph.trianglesQuery(spark, dir))
    show("graph_pagerank")(graft.ops.Graph.pageRankQuery(spark, dir))
    // suffix ranks (declarative build, no per-round checkpoints so the
    // whole doubling stack is visible): every Exchange hashpartitioning
    // on doc_id — per-document window sorts only, no corpus-wide sort
    show("llm_suffix_ranks_build")(graft.llm.Suffix.suffixRanks(
      Tables.documents(spark, dir).filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(10)) === 0),
      "text", "doc_id", materializeRounds = false))

    // timing repeats to separate plan cost from variance
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      time(s"top_customers#$i")(Analytics.topCustomers(spark, dir).count())
      time(s"sales_by_nation#$i")(Analytics.salesByNation(spark, dir).count())
    }
    spark.stop()
  }
}
