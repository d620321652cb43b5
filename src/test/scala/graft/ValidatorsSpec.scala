package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.validate.{Rule, Validators}

class ValidatorsSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  private val rules = Seq(
    Rule("neg_id", col("id") > 0),
    Rule("blank_name", Validators.requiredNonBlank(col("name"))))

  test("split routes rows with first-failing-rule reason") {
    val df = Seq((1, "ok"), (-1, "x"), (2, "  "), (-5, null)).toDF("id", "name")
    val (valid, rejected) = Validators.split(df, rules)
    assert(valid.as[(Int, String)].collect().toSet == Set((1, "ok")))
    val reasons = rejected.select($"id", $"reject_reason").as[(Int, String)].collect().toMap
    assert(reasons == Map(-1 -> "neg_id", 2 -> "blank_name", -5 -> "neg_id"))
  }

  test("property: valid ∪ rejected is a disjoint cover of the input") {
    val rowGen = Gen.zip(Gen.chooseNum(-5, 5), Gen.oneOf("a", "", "  ", "b", null))
    forAll(Gen.listOfN(30, rowGen)) { rows =>
      val df = rows.zipWithIndex.map { case ((id, nm), i) => (i, id, nm) }.toDF("pk", "id", "name")
      val (valid, rejected) = Validators.split(df, rules)
      val v = valid.select("pk").as[Int].collect().toSet
      val r = rejected.select("pk").as[Int].collect().toSet
      assert(v.intersect(r).isEmpty)
      assert(v.union(r) == rows.indices.toSet)
    }
  }

  test("fileSummary counts violations per rule; null fails the rule") {
    val df = Seq((1, "ok"), (-1, "x"), (2, " "), (0, null)).toDF("id", "name")
    val row = Validators.fileSummary(df, rules).head()
    assert(row.getLong(0) == 4) // total
    assert(row.getLong(1) == 2) // neg_id: -1, 0
    assert(row.getLong(2) == 2) // blank_name: " ", null
  }

  test("missing/extra column detection (P2/P6)") {
    val df = Seq((1, "a")).toDF("id", "extra1")
    assert(Validators.missingColumns(df, Seq("id", "name")) == Seq("name"))
    assert(Validators.extraColumns(df, Seq("id")) == Seq("extra1"))
  }
}
