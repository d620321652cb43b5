package graft

import org.apache.spark.sql.functions._
import graft.llm.{DotProduct, VectorExprs}

/** The SparkSessionExtensions surface: injected SQL functions and the
  * dot-product fusion rule (both active in the shared test session via
  * spark.sql.extensions=graft.plans.GraftExtensions).
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.5, 0.0, -1.0), Array(2.0, 8.0, 2.0))
  ).toDF("id", "a", "b")

  test("injected SQL functions reach the custom kernels from pure SQL") {
    vecs.createOrReplaceTempView("vecs_ext")
    val got = spark.sql(
      "SELECT id, graft_dot(a, b) AS dot, graft_cosine_sim(a, b) AS cos FROM vecs_ext ORDER BY id")
      .as[(Long, Double, Double)].collect()
    assert(got(0)._2 == 32.0)
    assert(got(1)._2 == -1.0)
    assert(math.abs(got(0)._3 - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)

    val text = spark.sql(
      """SELECT graft_simhash(split('a b c a', ' ')) AS sh,
        |  graft_shingles(split('a b c d', ' '), 2) AS sg,
        |  graft_dup_token_frac('a b c a') AS dup,
        |  graft_rolling_fingerprint('abcdefghijklmnopqrstuvwxyz', 16) AS fp,
        |  graft_minhash_sig(split('a b c d e', ' '), 3, 8) AS sig""".stripMargin).head()
    assert(text.getSeq[String](text.fieldIndex("sg")).toList == List("a b", "b c", "c d"))
    assert(text.getAs[Double]("dup") == 0.25)
    assert(text.getSeq[Long](text.fieldIndex("sig")).length == 8)
    // SQL results equal the DataFrame-helper results (same expression class)
    val viaDf = spark.range(1)
      .select(graft.llm.Fingerprints.simhash64(split(lit("a b c a"), " ")).as("sh"))
      .head().getAs[Long]("sh")
    assert(text.getAs[Long]("sh") == viaDf)
  }

  test("FuseVectorKernels rewrites the declarative dot idiom into the kernel") {
    // a file-backed relation: over a LocalRelation the optimizer constant-
    // folds the whole projection away before any plan survives inspection
    val dir = java.nio.file.Files.createTempDirectory("fuse_dot").toString
    vecs.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val composed = stored.select($"id",
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("dot"))
    val fusedExprs = composed.queryExecution.optimizedPlan.expressions
    assert(fusedExprs.exists(_.exists(_.isInstanceOf[DotProduct])),
      s"no DotProduct in optimized plan:\n${composed.queryExecution.optimizedPlan}")
    val got = composed.orderBy($"id").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 32.0), (2L, -1.0)))
    // reversed multiplication order fuses too
    val rev = stored.select(
      aggregate(zip_with($"a", $"b", (x, y) => y * x), lit(0.0), (acc, v) => acc + v).as("dot"))
    assert(rev.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProduct])))
  }

  test("fusion preserves the composable form's null semantics exactly") {
    val ragged = Seq(
      (1L, Array(1.0, 2.0), Array(1.0, 2.0, 3.0)), // length mismatch → null
      (2L, Array(1.0, 2.0), Array(3.0, 4.0))
    ).toDF("id", "a", "b")
    val out = ragged.select($"id",
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("dot"))
      .orderBy($"id").as[(Long, Option[Double])].collect()
    assert(out.toSeq == Seq((1L, None), (2L, Some(11.0))))
    // the kernel invoked directly agrees
    val direct = ragged.select($"id", VectorExprs.dot($"a", $"b").as("dot"))
      .orderBy($"id").as[(Long, Option[Double])].collect()
    assert(direct.toSeq == out.toSeq)
  }

  test("integer idioms are deliberately NOT fused (overflow semantics differ)") {
    val ints = Seq((1L, Array(1, 2, 3), Array(4, 5, 6))).toDF("id", "a", "b")
    val composed = ints.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("dot"))
    assert(!composed.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProduct])))
    assert(composed.as[Long].head() == 32L)
  }
}
