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

  test("every query is oracle-backed except the declared sketch query") {
    // a new query landing without an oracle silently weakens the gate to
    // rows-only — make that a deliberate, reviewed decision
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled == Set("stream_approx_uniques"),
      s"queries without an oracle: $unoracled")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
