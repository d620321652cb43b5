package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.store.Upsert

class UpsertSpec extends SparkSpec with PropertyCheck {
  import spark.implicits._

  test("J4: replace-on-match replaces matched keys, inserts new ones") {
    val existing = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("k", "v")
    val updates = Seq((2, "new2"), (4, "new4")).toDF("k", "v")
    val got = Upsert.replaceOnMatch(existing, updates, Seq("k"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "old1"), (2, "new2"), (3, "old3"), (4, "new4")))
  }

  test("property: J4 is idempotent — applying the same update twice = once") {
    val kv = Gen.listOfN(15, Gen.zip(Gen.chooseNum(0, 8), Gen.alphaStr.map(_.take(4))))
    forAll(kv, kv) { (ex, up) =>
      val existing = ex.toDF("k", "v").dropDuplicates("k")
      val updates = up.toDF("k", "v").dropDuplicates("k")
      val once = Upsert.replaceOnMatch(existing, updates, Seq("k"))
      val twice = Upsert.replaceOnMatch(once, updates, Seq("k"))
      assert(once.as[(Int, String)].collect().toSet == twice.as[(Int, String)].collect().toSet)
    }
  }

  test("J5: additive merge adds on match, inserts on no-match") {
    val existing = Seq((1, 10.0), (2, 20.0)).toDF("k", "total")
    val delta = Seq((2, 5.0), (3, 7.0)).toDF("k", "total")
    val got = Upsert.additive(existing, delta, Seq("k"), "total")
      .as[(Int, Double)].collect().toSet
    assert(got == Set((1, 10.0), (2, 25.0), (3, 7.0)))
  }

  test("property: J5 ≡ groupBy-sum over concatenated batches (additivity)") {
    val batchGen = Gen.listOfN(12, Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(1, 100)))
    forAll(batchGen, batchGen) { (b1, b2) =>
      def kpi(b: List[(Int, Int)]) =
        b.toDF("k", "v").groupBy("k").agg(sum($"v".cast("double")).as("total"))
      val merged = Upsert.additive(kpi(b1), kpi(b2), Seq("k"), "total")
        .as[(Int, Double)].collect().toMap
      val direct = kpi(b1 ++ b2).as[(Int, Double)].collect().toMap
      assert(merged == direct)
    }
  }

  test("exactly-once variant: ledgered additive merge ignores replayed batches") {
    val s0 = Upsert.LedgeredState(Seq((1, 10.0)).toDF("k", "total"), Set.empty)
    val delta = Seq((1, 5.0), (2, 1.0)).toDF("k", "total")
    val s1 = Upsert.additiveIdempotent(s0, delta, "batch-001", Seq("k"), "total")
    val s2 = Upsert.additiveIdempotent(s1, delta, "batch-001", Seq("k"), "total") // replay
    assert(s2.state.as[(Int, Double)].collect().toSet == Set((1, 15.0), (2, 1.0)))
    val s3 = Upsert.additiveIdempotent(s2, delta, "batch-002", Seq("k"), "total") // new batch
    assert(s3.state.as[(Int, Double)].collect().toSet == Set((1, 20.0), (2, 2.0)))
    // manifest round-trips through its persisted DataFrame form, and a
    // rehydrated state still rejects the replay
    val reloaded = Upsert.LedgeredState.load(s3.state, s3.ledger)
    assert(reloaded.appliedBatches == Set("batch-001", "batch-002"))
    val s4 = Upsert.additiveIdempotent(reloaded, delta, "batch-002", Seq("k"), "total")
    assert(s4.state.as[(Int, Double)].collect().toSet == Set((1, 20.0), (2, 2.0)))
  }

  test("property: partition-scoped persisted merge ≡ whole-table re-agg") {
    import graft.store.Lake
    val dates = Gen.oneOf("2024-07-01", "2024-07-02", "2024-07-03")
    val batchGen = Gen.listOfN(10, Gen.zip(Gen.chooseNum(0, 3), dates, Gen.chooseNum(1, 100)))
    forAll(batchGen, batchGen) { (b1, b2) =>
      val root = java.nio.file.Files.createTempDirectory("addpart").toString
      def kpi(b: List[(Int, String, Int)]) = b.toDF("product_id", "d", "v")
        .select($"product_id", to_date($"d").as("date"),
          $"v".cast("double").as("total_sales"))
      Seq(b1, b2).foreach { b =>
        Upsert.additivePartitioned(spark, s"$root/kpi", kpi(b),
          Seq("product_id"), "total_sales", "date")
      }
      val got = spark.read.parquet(s"$root/kpi")
        .select($"product_id", $"date".cast("string"), $"total_sales")
        .as[(Int, String, Double)].collect().toSet
      val direct = kpi(b1 ++ b2).groupBy($"product_id", $"date")
        .agg(sum($"total_sales").as("total_sales"))
        .select($"product_id", $"date".cast("string"), $"total_sales")
        .as[(Int, String, Double)].collect().toSet
      assert(got == direct)
      Lake.deleteRecursive(java.nio.file.Paths.get(root))
    }
  }

  test("partition-scoped merge is safe on an UN-TUNED session (write-scoped dynamic overwrite)") {
    import graft.store.Lake
    // newSession shares the context but NOT runtime session conf, so it has
    // the static-overwrite default — the exact caller shape that would lose
    // every untouched partition if the guarantee lived only in Engine.tune.
    val untuned = spark.newSession()
    assert(untuned.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"))
    import untuned.implicits._
    val root = java.nio.file.Files.createTempDirectory("addpart_untuned").toString
    val tbl = s"$root/kpi"
    def kpi(rows: Seq[(Int, String, Double)]) = rows.toDF("product_id", "d", "total_sales")
      .select($"product_id", to_date($"d").as("date"), $"total_sales")
    Upsert.additivePartitioned(untuned, tbl,
      kpi(Seq((1, "2024-07-01", 10.0), (2, "2024-07-02", 20.0), (3, "2024-07-03", 30.0))),
      Seq("product_id"), "total_sales", "date")
    def partFiles(day: String) = {
      val d = java.nio.file.Paths.get(tbl, s"date=$day")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => (p.getFileName.toString, java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis)).toSet
    }
    val before01 = partFiles("2024-07-01")
    val before03 = partFiles("2024-07-03")
    // one-date delta on an un-tuned session: only 07-02 may be rewritten
    Upsert.additivePartitioned(untuned, tbl,
      kpi(Seq((2, "2024-07-02", 5.0))), Seq("product_id"), "total_sales", "date")
    assert(partFiles("2024-07-01") == before01, "untouched partition rewritten or deleted")
    assert(partFiles("2024-07-03") == before03, "untouched partition rewritten or deleted")
    val got = untuned.read.parquet(tbl)
      .select($"product_id", $"date".cast("string"), $"total_sales")
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "2024-07-01", 10.0), (2, "2024-07-02", 25.0), (3, "2024-07-03", 30.0)))
    Lake.deleteRecursive(java.nio.file.Paths.get(root))
  }

  test("T5 documented semantics: additive merge double-counts on replay (at-least-once)") {
    val existing = Seq((1, 10.0)).toDF("k", "total")
    val delta = Seq((1, 5.0)).toDF("k", "total")
    val replayed = Upsert.additive(Upsert.additive(existing, delta, Seq("k"), "total"),
      delta, Seq("k"), "total")
    // the reference's MERGE has the same at-least-once caveat — replicated, not fixed
    assert(replayed.as[(Int, Double)].head() == ((1, 20.0)))
  }

  test("SCD2 apply: changed keys close+reopen, unchanged no-op, new keys insert, history survives") {
    val current = Seq(
      (1L, "A", 10.0, 0L, Some(50L)),  // already-closed history row
      (1L, "B", 11.0, 50L, None),      // open; update CHANGES it
      (2L, "C", 20.0, 0L, None),       // open; update equals → no-op
      (3L, "D", 30.0, 0L, None)        // open; not in update batch
    ).toDF("k", "seg", "bal", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "B", 99.0),                 // changed balance
      (2L, "C", 20.0),                 // identical
      (9L, "Z", 1.0)                   // brand-new key
    ).toDF("k", "seg", "bal")
    val got = Upsert.scd2Apply(current, updates, Seq("k"), Seq("seg", "bal"), 100L)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(got == Seq(
      (1L, "A", 10.0, 0L, Some(50L)),  // closed history untouched
      (1L, "B", 11.0, 50L, Some(100L)),// old open version closed at 100
      (1L, "B", 99.0, 100L, None),     // new version opened
      (2L, "C", 20.0, 0L, None),       // identical update: untouched
      (3L, "D", 30.0, 0L, None),       // unmatched current: untouched
      (9L, "Z", 1.0, 100L, None)       // new key inserted open
    ), got.toString)
    // applying the SAME batch again is a no-op (idempotent history)
    val again = Upsert.scd2Apply(
        Upsert.scd2Apply(current, updates, Seq("k"), Seq("seg", "bal"), 100L),
        updates, Seq("k"), Seq("seg", "bal"), 200L)
      .as[(Long, String, Double, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(again == got, again.toString)
  }
}
