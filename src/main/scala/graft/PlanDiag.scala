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
  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "40,80")
      .split(",").map(_.trim.toInt).toSeq
    val qname = sys.env.getOrElse("SPARK_GRAFT_PLAN_QUERY", "llm_dedup_containment")
    val fn = SparkEntry.queries(qname)
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
