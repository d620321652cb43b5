package graft

import org.apache.spark.sql.SparkSession

/** Noise-attribution harness (PERF.md's min-of-N interleaved sweep as a
  * runnable): times every registered query over `SPARK_GRAFT_BENCH_PASSES`
  * interleaved sweeps (all queries pass 1, then pass 2, … — so one
  * external stall cannot cover both measurements of the same query) and
  * emits ONE JSON line with per-query min / max / spread plus every raw
  * sample. Spread is the verdict: a query whose min sits at the old
  * level while its max wanders is a shared-box noise blip; a query whose
  * MIN moved is a real regression. Focus with
  * `SPARK_GRAFT_BENCH_ONLY=q1,q2`; `SPARK_GRAFT_BENCH_OUT` persists the
  * line (default bench_sweep.json).
  */
object BenchSweep {

  private[graft] def buildSession(): (SparkSession, String) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    (spark, sfDir)
  }

  def jstr(s: String): String = "\"" + s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Fixed-point number for the JSON line, Locale.ROOT: the f
    * interpolator formats through the JVM default locale, and a
    * comma-decimal locale (de_DE, fr_FR, …) would emit `12,3` — invalid
    * JSON on the one machine-read line these mains exist to produce.
    */
  def num(v: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", v.asInstanceOf[AnyRef])

  /** Host-instance marker shared by EVERY bench-artifact writer (Bench,
    * ScaleBench, ContainmentDiag, HotBucketBench, PlanDiag): artifacts
    * from different BOOTS of this box are not comparable at face value
    * (r19: a mid-round reboot shifted every query 1.25-1.6×, proven on
    * untouched control queries). Stamping the boot epoch lets any
    * cross-artifact comparison detect an instance change mechanically
    * instead of inferring it from uniform drift. -1 = platform can't
    * say (no /proc/stat btime).
    */
  def bootEpoch: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines()
        .collectFirst { case l if l.startsWith("btime ") => l.drop(6).trim.toLong }
        .getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = buildSession()
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val sweeps = (1 to passes).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        name -> r
      }.toMap
    }
    val qjson = ordered.map { case (name, _) =>
      val rs = sweeps.map(_(name))
      val errs = rs.collect { case Left(e) => e }
      val ts = rs.collect { case Right(t) => t }
      val body =
        if (ts.isEmpty) s"""{"error":${jstr(errs.head)}}"""
        else {
          val (mn, mx) = (ts.min, ts.max)
          val spreadPct = if (mn > 0) (mx - mn) / mn * 100 else 0.0
          s"""{"min":${num(mn, 4)},"max":${num(mx, 4)},"spread_pct":${num(spreadPct, 1)},"times":[${ts.map(num(_, 4)).mkString(",")}]}"""
        }
      jstr(name) + ":" + body
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"sweep","passes":$passes,"queries":$qjson,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_sweep.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
