package graft

/** Every registered query runs and the oracle keys are consistent. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("every query is oracle-backed") {
    // a new query landing without an oracle silently weakens the gate to
    // rows-only — make that a deliberate, reviewed decision (since r9
    // even the HLL query is gated: exact counts + tolerance flags)
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
  }

  test("documented totals equal the measured surface (no hand-written drift)") {
    // three rounds of verdicts flagged stale hand-written counts; the
    // docs now fail the build when they lag the code
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val coverage = new String(Files.readAllBytes(Paths.get("COVERAGE.md")))
    val m = raw"Totals: (\d+) registered queries \((\d+) oracle-backed, (\d+) rows-only[^)]*\), (\d+) tests"
      .r.findFirstMatchIn(coverage)
      .getOrElse(fail("COVERAGE.md Totals line missing or reformatted"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"COVERAGE.md says ${m.group(1)} queries, code registers ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"COVERAGE.md says ${m.group(2)} oracle-backed, code has ${SparkEntry.oracleSql.size}")
    assert(m.group(3).toInt == SparkEntry.queries.size - SparkEntry.oracleSql.size)
    val testCount = Files.walk(Paths.get("src/test/scala/graft")).iterator().asScala
      .filter(_.toString.endsWith("Spec.scala"))
      .map(p => raw"(?m)^\s*test\(".r
        .findAllIn(new String(Files.readAllBytes(p))).size)
      .sum
    assert(m.group(4).toInt == testCount,
      s"COVERAGE.md says ${m.group(4)} tests, suites define $testCount")
  }

  test("no registered query plans a cartesian; nested-loop joins only where reviewed") {
    // the scale killers a query can smuggle in silently, asserted over
    // the WHOLE surface so a new query can't regress it. A
    // BroadcastNestedLoopJoin is legitimate exactly when its build side
    // is a bounded scalar frame (a corpus total, quantile cuts, a fixed
    // query-vector set) cross-joined onto the data — those queries are
    // reviewed onto this list; anything else fails the build.
    val scalarBroadcastReviewed = Set(
      "llm_vocab_coverage", "llm_tfidf_top_terms", "llm_knn_pq", "rfm_scores",
      "llm_dsir_select", "llm_unigram_common", "llm_knn_quantized",
      "llm_mix_temperature", "llm_knn_brute", "llm_perplexity",
      "llm_embed_standardize", "llm_embed_quantize", "mm_feature_knn",
      "llm_mix_target")
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !scalarBroadcastReviewed.contains(name)
        if (cartesian) Some(s"$name (cartesian)")
        else if (bnlj) Some(s"$name (unreviewed nested-loop)")
        else None
      } catch { case _: Throwable => None } // execution failures belong to the smoke test
    }
    assert(offenders.isEmpty, s"scale-killer plans: $offenders")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
