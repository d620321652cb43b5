package graft
object Bench {
  def main(args: Array[String]): Unit = {
    // session + conf overrides + codegen warmup shared with BenchSweep
    val (spark, sfDir) = BenchSweep.buildSession()
    // min over `passes` full sweeps: single-shot timings on a shared box
    // showed ±35% noise plus occasional ~10s external stalls. Sweeps are
    // interleaved (all queries pass 1, then pass 2) so one stall cannot
    // cover both measurements of the same query; the min is steady state.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // Stabilization (r14 verdict: totals drifted 15% round-over-round
    // with zero per-query regressions — pure box noise): a query's min
    // is only trusted once a SECOND observation lands within
    // `minGapPct` of it; queries whose fastest two samples disagree by
    // more get extra interleaved passes (bounded) until they agree, so
    // the reported min is corroborated steady state, not a lucky draw.
    val minGapPct = sys.env.getOrElse("SPARK_GRAFT_BENCH_MINGAP", "25").toDouble
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXEXTRA", "4").toInt
    // optional focus list for targeted experiments: "q1,q2"
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // parsed BEFORE the sweep: a malformed value must fail fast, not
    // after an hour of measurement with nothing published
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "1.5").toDouble
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // Settle windows only matter when the load gate is load-bearing — a
    // gated publish (REQUIRE_QUIET) or a FULL sweep (the driver's
    // artifact, the closing pair). Targeted SPARK_GRAFT_BENCH_ONLY
    // experiments without the gate skip them entirely (150 s of idle
    // wall per quick look otherwise); their advisory load samples are
    // immediate and load_ok reads as such. Start settle is tunable
    // independently (r17 advice: both were slaved to one knob).
    val settleEndMs = sys.env.get("SPARK_GRAFT_BENCH_SETTLE_MS").map(_.toLong)
      .getOrElse(
        if (sys.env.contains("SPARK_GRAFT_BENCH_REQUIRE_QUIET") || only.isEmpty) 90000L
        else 0L)
    val settleStartMs = sys.env.get("SPARK_GRAFT_BENCH_SETTLE_START_MS")
      .map(_.toLong).getOrElse(settleEndMs * 2 / 3)
    // the start sample also settles first: sbt/JVM startup itself leaves
    // ~1.6 in the 1-min average by the time main() runs on an idle box —
    // a self-inflicted spike, same class as the end sample's final burst
    if (settleStartMs > 0) Thread.sleep(settleStartMs)
    val loadStart = osBean.getSystemLoadAverage
    // a sample is Right(sec) on success, Left(error) on failure — a
    // query that starts throwing must NOT silently improve the total
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val errs = scala.collection.mutable.Map.empty[String, String]
    var firsts = Map.empty[String, Double]
    def sweep(names: Set[String]): Unit =
      ordered.filter { case (n, _) => names(n) }.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          errs.getOrElseUpdate(name, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    val all = ordered.map(_._1).toSet
    (1 to passes).foreach { p =>
      sweep(all)
      if (p == 1) firsts = times.view.mapValues(_.head).toMap
    }
    def minGap(ts: Vector[Double]): Double = {
      val s = ts.sorted
      if (s.size < 2 || s.head <= 0) Double.PositiveInfinity
      else (s(1) - s.head) / s.head * 100.0
    }
    var extra = 0
    // single-pass runs are an explicit quick-look request: one sample can
    // never self-corroborate, so stabilization would re-run EVERY query
    // maxExtra times against the caller's intent — skip it entirely
    var unstable =
      if (passes < 2) Set.empty[String]
      else all.filter(n => errs.get(n).isEmpty && minGap(times(n)) > minGapPct)
    while (unstable.nonEmpty && extra < maxExtra) {
      sweep(unstable)
      extra += 1
      unstable = unstable.filter(n => errs.get(n).isEmpty && minGap(times(n)) > minGapPct)
    }
    // Load gate (r16 verdict: the closing artifact was taken at load_avg
    // 2.81 and three rows crossed the regression rule on noise alone).
    // The START sample must show a quiet box (<= maxLoad). The END sample
    // is taken after a 90 s settle: sampled at the instant the sweep
    // finishes, the 1-min average reads the sweep's OWN final burst — on
    // this tree it lands 3.1-3.4 on a provably idle box (three r17 runs
    // with quiet 0.6-1.0 starts and 0.5-2% min-gaps all "failed" an
    // immediate-sample bound), indistinguishable from an externally
    // loaded box. After 90 s the self-burst decays by e^-1.5 (~3.3 →
    // ~0.7) while genuinely sustained external load keeps the average
    // up, so the settled bound can be TIGHTER (+0.5, was +1.0) and still
    // separate the two cases the immediate sample conflates; a transient
    // external spike mid-run is the per-query min-gap corroboration's
    // job either way. A failing run is machine-flagged in the artifact
    // (`load_ok:false`), and with SPARK_GRAFT_BENCH_REQUIRE_QUIET set it
    // refuses to publish — the closing-pair discipline (the refused
    // measurement is still written to <out>.refused.json for audit).
    // Negative load = platform can't say; counts as ok but stays visible.
    if (settleEndMs > 0) Thread.sleep(settleEndMs)
    val loadEnd = osBean.getSystemLoadAverage
    val loadOk = loadStart <= maxLoad && loadEnd <= maxLoad + 0.5
    // failed = any sweep errored; reported as value -1 plus an errors map,
    // and excluded from the total (a partial total plus explicit errors is
    // machine-detectable; a silently shrunken one is not)
    val results = ordered.map { case (name, _) =>
      name -> (errs.get(name) match {
        case Some(e) => Left(e)
        case None => Right(times(name).min)
      })
    }
    // per-query noise spread (max/min - 1, %) over ALL samples — the
    // historical field; min_gap_pct below is the stability verdict (how
    // closely the best two samples agree)
    val spreads = ordered.flatMap { case (name, _) =>
      val ts = times(name)
      if (ts.size >= 2 && ts.min > 0) Some(name -> (ts.max - ts.min) / ts.min * 100.0)
      else None
    }
    val gaps = ordered.flatMap { case (name, _) =>
      val g = minGap(times(name))
      if (g.isFinite) Some(name -> g) else None
    }
    import BenchSweep.{jstr, num}
    val qs = results.map { case (k, v) => jstr(k) + ":" + v.fold(_ => "-1", _.toString) }
      .mkString("{", ",", "}")
    // one-time build cost, first-class: pass 1 pays every session memo
    // (suffix ranks, corpus SA, stream replays, IVF index, bucketed
    // tables); later passes ride the cache. `first` is the cold per-query
    // time; builds_sec = Σ(first − min) is the total one-time cost the
    // min-based `queries` column deliberately excludes. Reported
    // separately so the steady-state contract (`queries` = min) is
    // unchanged while cold cost is machine-readable, not reverse-
    // engineered from spread_pct.
    val firstJson = firsts.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v.toString }
      .mkString("{", ",", "}")
    val buildsTotal = firsts.map { case (name, f) =>
      results.toMap.get(name).flatMap(_.toOption).fold(0.0)(m => math.max(0.0, f - m))
    }.sum
    val errorsJson = results.collect { case (k, Left(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    val spreadJson = spreads
      .map { case (k, v) => jstr(k) + ":" + num(v, 1) }
      .mkString("{", ",", "}")
    val gapJson = gaps
      .map { case (k, v) => jstr(k) + ":" + num(v, 1) }
      .mkString("{", ",", "}")
    // host-instance marker shared with every other artifact writer
    // (BenchSweep.bootEpoch; r19 reboot confound, r19 advice #1)
    val bootEpoch: Long = BenchSweep.bootEpoch
    // Field ORDER is load-bearing (r19 verdict #5): the driver captures
    // only the last 2000 chars of sbt output, so a line that LEADS with
    // the totals loses them to truncation on every 184-query run
    // (BENCH_rN `parsed: null` since r01). The bulky per-query maps go
    // first; the headline totals, errors, and identity fields trail, so
    // the surviving tail always carries them.
    val line =
      s"""{"metric":"total","queries":$qs,"first":$firstJson,"spread_pct":$spreadJson,"min_gap_pct":$gapJson,"builds_sec":${num(buildsTotal, 3)},"passes":$passes,"extra_passes":$extra,"unstable_after":${unstable.size},"load_avg":[${num(loadStart, 2)},${num(loadEnd, 2)}],"load_ok":$loadOk,"settle_start_ms":$settleStartMs,"settle_end_ms":$settleEndMs,"settled":${settleEndMs > 0},"boot_epoch":$bootEpoch,"value":$total,"unit":"sec","errors":$errorsJson,"sf":"$sfDir"}"""
    if (!loadOk && sys.env.contains("SPARK_GRAFT_BENCH_REQUIRE_QUIET")) {
      System.err.println(s"[bench] REFUSING to publish: load_avg " +
        s"[$loadStart, $loadEnd] exceeds the $maxLoad quiet-box bound " +
        "(SPARK_GRAFT_BENCH_REQUIRE_QUIET set) — re-run on a quiet box")
      // the refused measurement stays DIAGNOSABLE (which query stretch the
      // load hit, whether per-query minima still corroborated) without
      // touching the publish path — a refusal that destroys its own
      // evidence can't be audited
      val refusedOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json") +
        ".refused.json"
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(refusedOut), line + "\n")
      catch { case _: Throwable => () }
      spark.stop()
      sys.exit(3)
    }
    // print FIRST and also persist: the driver reads only the sbt tail, so a
    // post-run log line can push the JSON out of its window (BENCH_r01's
    // `parsed` was null for exactly that reason)
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () } // the printed line remains the contract
    spark.stop()
  }
}
