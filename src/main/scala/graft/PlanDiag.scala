package graft

/** Plan inspector for scale-dependent plan flips: prints the join and
  * sort operators in a registered query's physical plan per scaled dir,
  * to catch static-estimate-driven flips (broadcast → SortMergeJoin)
  * between curve points — the class of bend the containment 40→80×
  * investigation found (round 18).
  * Usage: SPARK_GRAFT_SCALES=40,80 SPARK_GRAFT_PLAN_QUERY=llm_dedup_minhash
  *        sbt "runMain graft.PlanDiag"
  */
object PlanDiag {

  /** Queries whose REGISTERED form eagerly localCheckpoints the result
    * (releasing the postings cache per call): the returned frame's plan
    * is just the in-memory tail, so the flip-prone joins are invisible
    * to inspection. These build the same pipeline LAZILY (the
    * `winnowProbePlan`/`winnowOverlapPlan` split) — what the diag must
    * look at instead. Each entry returns (lazy plan, checkpointed frame
    * the plan reads); the caller unpersists the second after inspecting
    * the first, the contract the plan-split helpers document — a sweep
    * over many scales must not pin one block set per scale point.
    */
  private val lazyPlans: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Map(
    "llm_winnow_overlap" -> ((s, d) => graft.llm.TextAnalysis.winnowOverlapPlan(
      Tables.documents(s, d), "text", "doc_id").swap),
    "llm_winnow_probe" -> ((s, d) => {
      val root = graft.llm.TextAnalysis.winnowPostingsRoot(s, d)
      val queries = Tables.documents(s, d)
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(25L)) === 7)
      graft.llm.TextAnalysis.winnowProbePlan(s, s"$root/postings", queries,
        "text", "doc_id",
        nBands = graft.llm.TextAnalysis.WinnowBands.toInt,
        minShared = graft.llm.TextAnalysis.WinnowMinShared,
        dfCap = Some(graft.llm.TextAnalysis.WinnowDfCap)).swap
    }),
    // the minhash-verify family (ngram_jaccard / similar_docs / clusters /
    // dedup_minhash all serve from the verifiedPairs memo): nothing to
    // unpersist — the lazy form is never executed here
    "llm_dedup_ngram_jaccard" -> ((s, d) =>
      (graft.llm.Dedup.verifiedPairsPlan(s, d), null)),
    // the corpus-SA cross-doc family: the SA build is memoized and
    // inherently roundwise; the flip-prone LCP-stage joins come back lazy
    "llm_cross_doc_max" -> ((s, d) =>
      graft.llm.CorpusSuffix.crossDocMaxPlanQuery(s, d).swap),
    "llm_cross_doc_spans" -> ((s, d) =>
      graft.llm.CorpusSuffix.crossDocSpansPlanQuery(s, d).swap))

  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "40,80")
      .split(",").map(_.trim.toInt).toSeq
    // comma-separated: queries sharing a session-memoized build (the
    // corpus-SA ranks, the winnow postings) sweep it once per scale
    val qnames = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERY", "llm_dedup_containment")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // every name validated BEFORE the scales loop (r19 advice #3): with a
    // comma-separated list, a typo in the second name used to surface only
    // after ensureScaled and the first name's potentially expensive sweep
    // (an SA build at 40×) had already run
    val registered = SparkEntry.queries
    val unknown = qnames.filterNot(q => lazyPlans.contains(q) || registered.contains(q))
    require(unknown.isEmpty,
      s"unknown SPARK_GRAFT_PLAN_QUERY name(s): ${unknown.mkString(", ")} " +
        "(must be a lazyPlans key or a SparkEntry.queries key)")
    scales.foreach { k =>
      val dir = ScaleBench.ensureScaled(spark, srcDir, k)
      qnames.foreach { qname =>
        val fn = lazyPlans.get(qname)
          .getOrElse { (s: org.apache.spark.sql.SparkSession, d: String) =>
            (SparkEntry.queries(qname)(s, d), null: org.apache.spark.sql.DataFrame)
          }
        val (frame, pinned) = fn(spark, dir)
        val plan = frame.queryExecution.executedPlan.toString
        if (pinned ne null) pinned.unpersist(blocking = false)
        val joins = plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Sort "))
          .map(_.trim.take(160)).toSeq
        println(s"=== $qname x$k joins/sorts ===")
        joins.foreach(println)
      }
    }
    spark.stop()
  }
}
