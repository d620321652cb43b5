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
    * look at instead.
    */
  private val lazyPlans: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "llm_winnow_overlap" -> ((s, d) => graft.llm.TextAnalysis.winnowOverlapPlan(
      Tables.documents(s, d), "text", "doc_id")._2),
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
        dfCap = Some(graft.llm.TextAnalysis.WinnowDfCap))._2
    }))

  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "40,80")
      .split(",").map(_.trim.toInt).toSeq
    val qname = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERY", "llm_dedup_containment")
    val fn = lazyPlans.getOrElse(qname, SparkEntry.queries(qname))
    scales.foreach { k =>
      val dir = ScaleBench.ensureScaled(spark, srcDir, k)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Sort "))
        .map(_.trim.take(160)).toSeq
      println(s"=== $qname x$k joins/sorts ===")
      joins.foreach(println)
    }
    spark.stop()
  }
}
