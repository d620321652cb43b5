package graft

import org.apache.spark.sql.functions._

import graft.llm.Distill

class DistillSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: org.apache.spark.sql.DataFrame) =
    Distill.distillQuality(docs, "text").head()

  test("distilled scorer beats the majority class on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = run(docs)
    val (tp, fp, fn, tn) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    val total = tp + fp + fn + tn
    val pos = tp + fn
    val majority = math.max(pos, total - pos)
    assert(tp + tn > majority,
      s"accuracy ${tp + tn}/$total does not beat majority $majority/$total")
  }

  test("a one-threshold corpus distills near-perfectly") {
    // label hinges ONLY on token count (stops and dup neutral on both
    // sides): a clean linear margin the scorer must find
    val stopsPad = "the a of and to"
    def doc(words: Int, tag: String): String =
      (stopsPad.split(" ") ++ (1 to (words - 5)).map(i => s"${tag}_w$i")).mkString(" ")
    val docs = ((1 to 40).map(i => (i.toLong, doc(8, s"s$i"))) ++
      (41 to 80).map(i => (i.toLong, doc(60, s"l$i")))).toDF("doc_id", "text")
    val r = run(docs)
    val (tp, fp, fn, tn) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(tp + fn == 40 && fp + tn == 40, s"labels drifted: $r")
    assert(tp + tn >= 72, s"clean margin not learned: tp=$tp fp=$fp fn=$fn tn=$tn")
  }

  test("training is bit-deterministic under repartition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = run(docs.repartition(1)).toSeq
    val b = run(docs.repartition(13)).toSeq
    assert(a == b, s"$a vs $b")
  }

  test("null text rows count toward N and nothing else (the row-wise aggregation's semantics)") {
    // the histogram path must keep the old behavior: a null text row
    // nulled every feature, so it fell out of all sums/confusion cells
    // but was still counted by count(lit(1)) in the update divisor
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
    val clean = run(base).toSeq
    val withNull = run(base.select(col("doc_id"),
      when(col("doc_id") =!= base.select(min("doc_id")).head().getLong(0), col("text"))
        .as("text"))).toSeq
    // one doc nulled: n changes by 1, so the trajectory may shift — the
    // assertion is completion plus conservation of the confusion mass
    val conf = withNull.drop(4).map(_.asInstanceOf[Long]).sum
    assert(conf == base.count() - 1, s"confusion mass $conf != docs-1")
    assert(clean.size == 8 && withNull.size == 8)
  }

  test("cluster work is one histogram job, independent of the round count") {
    // the 20-round trajectory replays on the driver from the finite-domain
    // feature histogram — the per-ROUND aggregation jobs (>= 22 before the
    // sufficient-statistic rewrite) must never come back. AQE may split
    // the one aggregation into a couple of stage-jobs, hence <= 4, but any
    // per-iteration scheduling (>= Iterations = 20) trips the bound.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.count() // settle the scan's file-index jobs outside the window
    val sc = spark.sparkContext
    sc.setJobGroup("distill-jobcount", "DistillSpec job-count window")
    val jobs = try { run(docs); sc.statusTracker.getJobIdsForGroup("distill-jobcount").length }
    finally sc.clearJobGroup()
    assert(jobs <= 4, s"distill launched $jobs jobs — per-round cluster work is back")
  }
}
