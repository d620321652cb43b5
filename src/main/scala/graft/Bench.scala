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
    // optional focus list for targeted experiments: "q1,q2"
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // a sweep records Right(sec) on success, Left(error) on failure — a
    // query that starts throwing must NOT silently improve the total
    val sweeps = (1 to passes).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        name -> r
      }.toMap
    }
    // failed = any sweep errored; reported as value -1 plus an errors map,
    // and excluded from the total (a partial total plus explicit errors is
    // machine-detectable; a silently shrunken one is not)
    val results = ordered.map { case (name, _) =>
      val rs = sweeps.map(_(name))
      val errs = rs.collect { case Left(e) => e }
      name -> (if (errs.nonEmpty) Left(errs.head) else Right(rs.collect { case Right(t) => t }.min))
    }
    // per-query noise spread (max/min - 1, %): the reader's evidence for
    // separating "min moved" (real regression) from "max wandered"
    // (shared-box noise) without a separate BenchSweep run
    val spreads = ordered.flatMap { case (name, _) =>
      val ts = sweeps.map(_(name)).collect { case Right(t) => t }
      if (ts.size == passes && ts.min > 0)
        Some(name -> (ts.max - ts.min) / ts.min * 100.0)
      else None
    }
    // escape ALL control chars — an exception message with a tab or \r
    // would otherwise emit invalid JSON, the exact machine-unreadable
    // failure this line exists to prevent
    def jstr(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
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
    val firsts = ordered.flatMap { case (name, _) =>
      sweeps.head(name).toOption.map(name -> _)
    }
    val firstJson = firsts
      .map { case (k, v) => jstr(k) + ":" + v.toString }
      .mkString("{", ",", "}")
    val buildsTotal = firsts.map { case (name, f) =>
      results.toMap.get(name).flatMap(_.toOption).fold(0.0)(m => math.max(0.0, f - m))
    }.sum
    val errors = results.collect { case (k, Left(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(t)) => t }.sum
    // Locale.ROOT: the f interpolator uses the JVM default locale, and a
    // comma-decimal locale would corrupt the JSON line
    val spreadJson = spreads
      .map { case (k, v) => jstr(k) + ":" + BenchSweep.num(v, 1) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,"queries":$qs,"first":$firstJson,"builds_sec":${BenchSweep.num(buildsTotal, 3)},"spread_pct":$spreadJson,"errors":$errors,"sf":"$sfDir"}"""
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
