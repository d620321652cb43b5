package graft

import org.apache.spark.sql.functions._

/** Containment candidate-mass accounting per scale — the diagnostic
  * behind the 40→80× bend investigation (round 18). The operator's
  * contract is cost ∝ Σ df² over retained shingles (df > 1, ≤ maxDf);
  * this main prints that mass and its neighbors (posting rows, retained
  * shingle types, the shared-pair group count, verified pairs) so a
  * superlinear WALL can be attributed either to the engine (mass linear,
  * wall not) or to the corpus (mass itself superlinear — e.g. the
  * documented cross-copy digit-shingle leak, whose df grows with the
  * copy-family size until the cap drops it).
  *
  * Usage: SPARK_GRAFT_SCALES=40,80 sbt "runMain graft.ContainmentDiag"
  */
object ContainmentDiag {
  def main(args: Array[String]): Unit = {
    val (spark, srcDir) = BenchSweep.buildSession()
    import BenchSweep.num
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "40,80")
      .split(",").map(_.trim.toInt).toSeq
    val maxDf = 64
    val sections = scales.map { k =>
      val dir = ScaleBench.ensureScaled(spark, srcDir, k)
      val docs = Tables.documents(spark, dir)
      val sh = docs.select(col("doc_id").as("id"),
        graft.llm.Dedup.shingles(col("text"), 3).as("sh"))
      val posting = sh.select(col("id"), explode(col("sh")).as("g"))
      val dfs = posting.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val r = dfs.agg(
        count(lit(1)).as("types"),
        coalesce(sum(when(col("df") > 1 && col("df") <= maxDf, 1L)
          .otherwise(0L)), lit(0L)).as("retained_types"),
        coalesce(sum(when(col("df") > 1 && col("df") <= maxDf,
          col("df") * col("df")).otherwise(0L)), lit(0L)).as("sum_df2"),
        coalesce(sum(when(col("df") > maxDf, 1L).otherwise(0L)), lit(0L))
          .as("capped_types"),
        coalesce(sum(when(col("df") > maxDf, col("df")).otherwise(0L)), lit(0L))
          .as("capped_rows"),
        coalesce(sum(col("df")), lit(0L)).as("posting_rows"))
        .head()
      // the shared-pair group count (the groupBy(id_a, id_b) output) —
      // the stage the wall actually pays after Σ df² candidate rows
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val v = f; (v, (System.nanoTime() - t0) / 1e9)
      }
      val rare = dfs.filter(col("df") > 1 && col("df") <= maxDf).select(col("g"))
      val indexed = posting.join(rare, Seq("g"), "left_semi")
        .localCheckpoint(false)
      val (_, tIndex) = timed(indexed.count())
      val (sharedPairs, tShared) = timed(indexed.as("a").join(indexed.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count())
      // isolate the PAIR-EXPANSION cost from the per-pair agg: same join,
      // global count only (no (id_a, id_b) grouping state)
      val (joinRows, tJoin) = timed(indexed.as("a").join(indexed.as("b"),
          col("a.g") === col("b.g") && col("a.id") < col("b.id")).count())
      // engine-truth for the wall: task metrics over ONE fresh full run —
      // if executorRunTime scales like the (linear) work but wall does
      // not, the box is oversubscribed; if GC/spill grow superlinearly,
      // it's memory; if run time itself bends, it's per-row cost.
      val acc = new java.util.concurrent.atomic.AtomicLongArray(6)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            acc.addAndGet(0, m.executorRunTime)
            acc.addAndGet(1, m.jvmGCTime)
            acc.addAndGet(2, m.memoryBytesSpilled)
            acc.addAndGet(3, m.diskBytesSpilled)
            acc.addAndGet(4, m.shuffleReadMetrics.totalBytesRead)
            acc.addAndGet(5, m.shuffleWriteMetrics.bytesWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val (verified, tFull) = timed(
        graft.llm.Dedup.containmentPairs(docs, "text", "doc_id").count())
      Thread.sleep(3000) // drain the listener bus (private API in Spark 4)
      spark.sparkContext.removeSparkListener(listener)
      // WARM runs (metrics detached): the warm wall the scale curves
      // compare (r18's 40→80× warm exp 1.40 is a warm number) — one
      // cold point alone can't separate per-scale one-time cost from
      // the steady-state bend the memory-envelope experiment is after.
      // Multiple samples with a min, because this box shows ±40%
      // contention noise plus ~10 s external stalls (PERF.md): a
      // two-sample envelope comparison at 48 GB read 22.7 vs 47.7 s on
      // IDENTICAL work — min-of-N inside one JVM is the only stable
      // statistic here.
      val warmRuns = sys.env.getOrElse("SPARK_GRAFT_WARM_RUNS", "1").toInt
      val warms = (1 to warmRuns).map { _ =>
        timed(graft.llm.Dedup.containmentPairs(docs, "text", "doc_id").count())._2
      }
      val tWarm = warms.min
      s""""x$k":{"posting_rows":${r.getLong(5)},"shingle_types":${r.getLong(0)},""" +
        s""""retained_types":${r.getLong(1)},"sum_df2":${r.getLong(2)},""" +
        s""""capped_types":${r.getLong(3)},"capped_rows":${r.getLong(4)},""" +
        s""""join_rows":$joinRows,"shared_pair_groups":$sharedPairs,""" +
        s""""verified_pairs":$verified,""" +
        s""""index_sec":${num(tIndex, 3)},"join_sec":${num(tJoin, 3)},""" +
        s""""shared_sec":${num(tShared, 3)},"full_sec":${num(tFull, 3)},""" +
        s""""warm_sec":${num(tWarm, 3)},""" +
        s""""warm_secs":[${warms.map(num(_, 3)).mkString(",")}],""" +
        s""""task_run_sec":${num(acc.get(0) / 1e3, 1)},""" +
        s""""task_gc_sec":${num(acc.get(1) / 1e3, 1)},""" +
        s""""mem_spill_mb":${acc.get(2) / 1048576},"disk_spill_mb":${acc.get(3) / 1048576},""" +
        s""""shuffle_read_mb":${acc.get(4) / 1048576},"shuffle_write_mb":${acc.get(5) / 1048576}}"""
    }
    // the memory envelope is the experiment's independent variable
    // (r18 verdict #2) — record it so two artifact lines are
    // self-describing without reconstructing the launch env. heap/cpus
    // are MEASURED from the live JVM/session, not echoed from env vars:
    // the local[n] heap actually comes from sbt's own -mem/SBT_OPTS, so
    // an env-claimed label could disagree with the envelope the tasks
    // really ran under (the experiment's whole point is ≈heap/cpus per
    // task); the env labels stay alongside for launch reproduction
    // `schema: 2` marks the r19 field rename (heap → heap_max_mb, cpus
    // string → number): external tooling comparing against r18 lines can
    // branch on the marker instead of breaking silently (r19 advice #2)
    val line =
      s"""{"metric":"containment_diag","schema":2,"scales":[${scales.mkString(",")}],""" +
        s""""boot_epoch":${BenchSweep.bootEpoch},""" +
        s""""heap_max_mb":${Runtime.getRuntime.maxMemory / 1048576},""" +
        s""""cpus":${spark.sparkContext.defaultParallelism},""" +
        s""""heap_env":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "")}",""" +
        s""""cpus_env":"${sys.env.getOrElse("SPARK_GRAFT_CPUS", "")}",""" +
        s""""max_df":$maxDf,"src":"$srcDir",${sections.mkString(",")}}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "containment_diag.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
