package graft

import org.apache.spark.sql.functions._
import graft.stream.StreamReplay

/** The deterministic stream replays behind `stream_kpi_state` /
  * `stream_scd2_state`: the at-rest tables the streams maintain must
  * equal the same folds computed declaratively in one batch plan —
  * engine-side twins of the DuckDB oracles, so a divergence is caught
  * here before the driver gate runs.
  */
class StreamReplaySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed additive KPI table equals the one-shot batch aggregation") {
    val streamed = StreamReplay.kpiStateQuery(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    val batch = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("product_id"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("sale_ym"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streamed SCD2 history equals the change-point derivation") {
    import org.apache.spark.sql.expressions.Window
    val streamed = StreamReplay.scd2StateQuery(spark, dir)
      .as[(Long, String, String, Long, Option[Long])].collect().toSet
    val ev = Tables.orders(spark, dir)
      .filter(pmod(col("o_custkey"), lit(5L)) === 2 &&
        year(col("o_orderdate")) >= 1995)
      .groupBy(col("o_custkey").as("cust_id"),
        expr("CAST(year(o_orderdate)*4 + (month(o_orderdate)-1) div 3 AS BIGINT)").as("q"))
      .agg(max(col("o_orderstatus")).as("status"),
        min(col("o_orderpriority")).as("priority"))
    val w = Window.partitionBy(col("cust_id")).orderBy(col("q"))
    val batch = ev
      .withColumn("ps", lag(col("status"), 1).over(w))
      .withColumn("pp", lag(col("priority"), 1).over(w))
      .filter(col("ps").isNull || col("status") =!= col("ps") || col("priority") =!= col("pp"))
      .withColumn("valid_to", lead(col("q"), 1).over(
        Window.partitionBy(col("cust_id")).orderBy(col("q"))))
      .select(col("cust_id"), col("status"), col("priority"),
        col("q").as("valid_from"), col("valid_to"))
      .as[(Long, String, String, Long, Option[Long])].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // history invariants: one open row per key, contiguous close/open days
    val openPerKey = streamed.toSeq.filter(_._5.isEmpty).groupBy(_._1).view.mapValues(_.size)
    assert(openPerKey.values.forall(_ == 1), "a key has more than one open version")
  }

  test("dropping BOTH cache layers rebuilds identical state; clearCaches alone re-adopts") {
    val before = StreamReplay.kpiStateQuery(spark, dir).count()
    // layer 1: the in-JVM memo — clearing it re-adopts the PERSISTED
    // root (cross-JVM reuse is the point), same content
    Engine.clearCaches(spark)
    assert(StreamReplay.kpiStateQuery(spark, dir).count() == before)
    // layer 2: drop the persisted entry too — the next query must run
    // the full streaming build again and land on identical state (the
    // rebuild-determinism property needs a REAL rebuild to mean anything)
    StreamReplay.dropPersistentCache(spark, dir)
    assert(StreamReplay.kpiStateQuery(spark, dir).count() == before)
  }

  test("cache-disabled mode builds an owned temp root and clearCaches deletes it") {
    sys.props("graft.replay.cache") = "0"
    try {
      StreamReplay.dropPersistentCache(spark, dir)
      assert(StreamReplay.kpiStateQuery(spark, dir).count() > 0)
      val owned = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
        .toArray.map(_.toString).filter(_.contains("graft_stream"))
      assert(owned.nonEmpty, "owned temp root expected under /tmp/graft_stream*")
      Engine.clearCaches(spark) // owned root must be deleted with the memo
      val after = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
        .toArray.map(_.toString).filter(_.contains("graft_stream"))
      assert(after.length < owned.length,
        s"owned replay root survived clearCaches: ${after.length} of ${owned.length}")
    } finally sys.props.remove("graft.replay.cache")
  }
}
