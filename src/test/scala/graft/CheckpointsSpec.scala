package graft

import org.apache.spark.sql.functions._

import graft.store.Checkpoints

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("free releases localCheckpoint blocks promptly, through derived plans") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val ck = spark.range(0, 1000).toDF("x").localCheckpoint()
    val created = spark.sparkContext.getPersistentRDDs.keySet -- pre
    assert(created.nonEmpty, "localCheckpoint must register persistent blocks")
    // Dataset.unpersist alone is a no-op for checkpoint blocks — the
    // frame is not in the CacheManager; prove the hazard free() fixes
    ck.unpersist(blocking = false)
    assert(spark.sparkContext.getPersistentRDDs.keySet.intersect(created) == created,
      "plain Dataset.unpersist should NOT have released checkpoint blocks")
    // free() must find the LogicalRDD under derived operators (the memo
    // caches store renamed/projected frames, not the raw checkpoint)
    val derived = ck.withColumnRenamed("x", "y").filter(col("y") >= 0)
    Checkpoints.free(derived)
    assert(spark.sparkContext.getPersistentRDDs.keySet.intersect(created).isEmpty,
      "free must unpersist the checkpointed RDD itself")
  }

  test("free on a plain (never-persisted) frame is a harmless no-op") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    Checkpoints.free(df)
    assert(df.count() == 2L, "frame must stay computable after free")
  }
}
