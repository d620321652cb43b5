package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over an embedding column (builder brief): brute-force
  * cosine top-k as the exact baseline, an IVF-partitioned variant as the
  * scale path, and random-hyperplane LSH bucketing for near-dup detection.
  *
  * Scale design: queries are broadcast (small side), so brute force is a
  * broadcast nested-loop whose cost is |queries| × |corpus| dot products
  * with no shuffle of the corpus. IVF cuts that by nprobe/nlist by routing
  * each query to its nearest inverted lists; the corpus is partitioned by
  * centroid id, so a probe touches only those partitions.
  */
object Similarity {

  /** Cosine similarity between two numeric-array columns, computed in
    * double in a single pass (custom expression; bit-identical to the
    * composable aggregate(zip_with(…)) form but ~10× cheaper per pair).
    */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosineSim(a, b)

  /** Brute-force exact top-k neighbors for each query vector. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rn").as("rank"), round(col("sim"), 4).as("sim_r"))
  }

  /** IVF assignment: nearest of `nlist` fixed seed centroids (deterministic
    * "training": the first nlist vectors serve as centroids — at real scale
    * swap in k-means centroids; the routing/partitioning plumbing is
    * identical).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cdist").desc, col("centroid_id"))
    corpus.crossJoin(broadcast(cent))
      .withColumn("cdist", cosine(col("embedding"), col("cent_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF search: probe the `nprobe` nearest inverted lists per query, then
    * exact cosine within them.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val centroids = corpus.filter(col("vec_id") < nlist)
    val assigned = ivfAssign(corpus, centroids)
    val qProbes = ivfProbes(queries, centroids, nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    assigned
      .join(broadcast(qProbes), Seq("centroid_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rn").as("rank"), round(col("sim"), 4).as("sim_r"))
  }

  private def ivfProbes(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val cent = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("centroid_id"))
    queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cent))
      .withColumn("cdist", cosine(col("q_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("centroid_id"))
  }

  /** Random-hyperplane LSH bucket signature: `nbits` sign bits of dot
    * products with deterministic pseudo-random hyperplanes (hash-derived,
    * so executors need no shared RNG state).
    */
  def lshBucket(emb: Column, dim: Int, nbits: Int): Column = {
    val bits = (0 until nbits).map { b =>
      // hyperplane component h(b, i) in [-1, 1): derived from xxhash64
      val d = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)), (x, i) =>
          x.cast("double") * (pmod(xxhash64(lit(b), i), lit(2000001L)).cast("double") / lit(1000000.0) - lit(1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-duplicate pairs: same LSH bucket, exact cosine ≥ τ. */
  def embeddingNearDups(corpus: DataFrame, dim: Int, nbits: Int, minCosine: Double): DataFrame = {
    val bucketed = corpus.select(
      col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), dim, nbits).as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= minCosine)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), round(col("sim"), 4).as("sim_r"))
  }

  // ---- registered queries -------------------------------------------------

  private val NumQueries = 8
  private val K = 5

  /** Brute-force cosine top-k (exact ANN baseline). */
  def knnQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    bruteForceKnn(emb, emb.filter(col("vec_id") < NumQueries), K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN (scale path; recall measured against brute force in tests). */
  def ivfQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    ivfKnn(emb, emb.filter(col("vec_id") < NumQueries), nlist = 16, nprobe = 4, k = K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed embedding near-dups (threshold tuned to the synthetic
    * embedding distribution, whose max pairwise cosine is ≈ 0.51).
    */
  def nearDupQuery(spark: SparkSession, dir: String): DataFrame =
    embeddingNearDups(Tables.embeddings(spark, dir), dim = 64, nbits = 4, minCosine = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_knn_brute" -> (knnQuery _),
    "llm_ann_ivf" -> (ivfQuery _),
    "llm_embed_neardup" -> (nearDupQuery _))

  val oracles: Map[String, String] = Map(
    "llm_knn_brute" ->
      s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS INTEGER) AS rank,
         |  ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS sim_r
         |FROM embeddings q, embeddings c
         |WHERE q.vec_id < $NumQueries AND q.vec_id <> c.vec_id
         |QUALIFY rank <= $K
         |ORDER BY query_id, rank""".stripMargin)
}
