package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "salting for skew").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions overwhelm a task, or when AQE is unavailable (streaming
  * foreachBatch joins). The big side gets a deterministic per-row salt in
  * [0, factor); the small side is replicated `factor` times; the join key
  * becomes (key, salt), spreading a hot key over `factor` tasks.
  */
object Skew {

  /** Equi-join big ⋈ small on `keys`, salted with `factor`. Inner joins
    * only (replication of the small side makes outer semantics subtle).
    * Result equals the unsalted join (verified by property test).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    require(factor > 0)
    // deterministic salt: hash of the whole big-side row spreads rows of
    // the same key uniformly without an RNG (replayable)
    val rowHash = xxhash64(big.columns.map(col): _*)
    val saltedBig = big.withColumn("_salt", pmod(rowHash, lit(factor)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(saltedSmall, keys :+ "_salt").drop("_salt")
  }

  /** Top-N heaviest keys of `df` on `keys` — the observability half of
    * skew handling (decide whether to salt, and with what factor).
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
