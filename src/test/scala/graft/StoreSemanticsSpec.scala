package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.store.{Lake, Upsert}
import graft.stream.MicroBatch

/** At-scale storage semantics: partition-scoped rewrites, partition
  * pruning, and streaming upsert state.
  */
class StoreSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("J4 at scale: dynamic partition overwrite rewrites only touched partitions") {
    val root = Files.createTempDirectory("dyn").toString
    val t = s"$root/table"
    Seq((1, "2024-07-15", "a"), (2, "2024-07-16", "b"), (3, "2024-07-17", "c"))
      .toDF("id", "d", "v").withColumn("d", to_date($"d"))
      .write.partitionBy("d").parquet(t)
    val before16 = new java.io.File(s"$t/d=2024-07-16").lastModified()
    Thread.sleep(1100)
    // overwrite containing ONLY the 07-15 partition (Engine.tune sets
    // partitionOverwriteMode=dynamic): 07-16/17 must survive untouched
    Seq((9, "2024-07-15", "a2")).toDF("id", "d", "v").withColumn("d", to_date($"d"))
      .write.partitionBy("d").mode(SaveMode.Overwrite).parquet(t)
    val got = spark.read.parquet(t).select("id", "v").as[(Int, String)].collect().toSet
    assert(got == Set((9, "a2"), (2, "b"), (3, "c")))
    assert(new java.io.File(s"$t/d=2024-07-16").lastModified() == before16)
  }

  test("P12: partition filters prune the scan to matching directories") {
    val root = Files.createTempDirectory("prune").toString
    val df = Seq(
      (1, java.sql.Timestamp.valueOf("2024-07-15 08:30:00")),
      (2, java.sql.Timestamp.valueOf("2024-07-15 09:30:00")),
      (3, java.sql.Timestamp.valueOf("2024-07-16 08:30:00"))).toDF("id", "ts")
    Lake.appendPartitioned(df, "ts", s"$root/t")
    val q = spark.read.parquet(s"$root/t")
      .filter($"year" === 2024 && $"month" === 7 && $"day" === 15 && $"hour" === 8)
    assert(q.collect().map(_.getAs[Int]("id")).toSeq == Seq(1))
    // pruning evidence: the executed scan read exactly one of the three
    // partition directories (numFiles metric of the executed scan node —
    // metrics only populate on the plan instance that ran, hence q.collect)
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numFiles").value == 1)
  }

  test("T4: streaming foreachBatch maintains additive KPI state across batches") {
    val root = Files.createTempDirectory("stream_kpi").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    val schema = StructType(Seq(
      StructField("product_id", IntegerType), StructField("revenue", DoubleType)))
    val kpiPath = s"$root/kpi"
    def runBatchFile(name: String, lines: String): Unit = {
      Files.writeString(Paths.get(s"$in/$name"), lines)
      val q = spark.readStream.schema(schema).json(in)
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val delta = batch.groupBy("product_id").agg(sum("revenue").as("total_sales"))
            val merged =
              if (new java.io.File(kpiPath).exists())
                Upsert.additive(spark.read.parquet(kpiPath), delta, Seq("product_id"), "total_sales")
              else delta
            Lake.atomicOverwrite(spark, merged, kpiPath)
          }
          ()
        }.start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
    }
    runBatchFile("b1.jsonl", """{"product_id":1,"revenue":10.0}
                               |{"product_id":2,"revenue":5.0}""".stripMargin)
    runBatchFile("b2.jsonl", """{"product_id":1,"revenue":2.5}""".stripMargin)
    val got = spark.read.parquet(kpiPath).as[(Int, Double)].collect().toMap
    assert(got == Map(1 -> 12.5, 2 -> 5.0))
  }

  test("Engine.clearCaches drops every session memo and deletes the index scratch dir") {
    val dir = "/root/testdata/sf0.001"
    // populate the four memos
    graft.llm.Similarity.queries("llm_embed_neardup")(spark, dir).count()
    graft.llm.Similarity.queries("llm_ann_ivf_indexed")(spark, dir).count()
    graft.llm.Dedup.queries("llm_dedup_ngram_jaccard")(spark, dir).count()
    graft.llm.Curation.queries("llm_curation")(spark, dir).count()
    val idxDirs = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
      .toArray.map(_.toString).filter(_.contains("ivf_index"))
    graft.Engine.clearCaches(spark)
    // the index scratch dir of THIS session is gone; queries still work
    // (memos rebuild on next use)
    val idxAfter = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
      .toArray.map(_.toString).filter(_.contains("ivf_index"))
    assert(idxAfter.length < idxDirs.length || idxDirs.isEmpty,
      s"index scratch dir not deleted: ${idxAfter.length} of ${idxDirs.length} remain")
    assert(graft.llm.Similarity.queries("llm_ann_ivf_indexed")(spark, dir).count() > 0)
  }
}
