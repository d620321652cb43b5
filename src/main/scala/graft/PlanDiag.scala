package graft

/** One-off plan inspector: prints the join operators in
  * llm_dedup_containment's physical plan per scaled dir, to catch
  * data-size-dependent plan flips (broadcast → SMJ) between curve
  * points. Usage: SPARK_GRAFT_SCALES=40,80 sbt "runMain graft.PlanDiag"
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "40,80")
      .split(",").map(_.trim.toInt).toSeq
    scales.foreach { k =>
      val dir = ScaleBench.ensureScaled(spark, srcDir, k)
      val plan = graft.llm.Dedup.containmentQuery(spark, dir)
        .queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Sort "))
        .map(_.trim.take(160)).toSeq
      println(s"=== x$k joins/sorts ===")
      joins.foreach(println)
    }
    spark.stop()
  }
}
