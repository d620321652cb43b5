package graft

import org.apache.spark.sql.functions._
import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 0
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)) // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val q = vecs.filter($"vec_id" === 0).select($"embedding".as("q"))
    val got = vecs.crossJoin(q)
      .select($"vec_id", Similarity.cosine($"embedding", $"q").as("sim"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(0L) - 1.0) < 1e-12)
    assert(math.abs(got(2L)) < 1e-12)
    assert(math.abs(got(4L) + 1.0) < 1e-12)
    assert(got(1L) > 0.99)
  }

  test("brute-force knn ranks the closest vector first") {
    val got = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(got.find(_._2 == 1).map(_._1).contains(1L))
  }

  test("IVF with full probing matches brute force exactly") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 4)
    val brute = Similarity.bruteForceKnn(emb, queries, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ivfFull = Similarity.ivfKnn(emb, queries, nlist = 8, nprobe = 8, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(ivfFull == brute)
  }

  test("embedding near-dups: identical vectors are always found (same LSH bucket)") {
    val emb = Seq(
      (0L, Array(0.3f, -0.2f, 0.9f, 0.1f)),
      (1L, Array(0.3f, -0.2f, 0.9f, 0.1f)), // exact duplicate of 0
      (2L, Array(-0.5f, 0.8f, 0.0f, -0.3f)),
      (3L, Array(0.31f, -0.19f, 0.89f, 0.11f)) // near-dup of 0
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(emb, dim = 4, nbits = 4, minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical → identical sign bits → same bucket
    assert(pairs.contains((0L, 3L)) == pairs.contains((1L, 3L))) // symmetry w.r.t. dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("IVF with partial probing achieves reasonable recall vs brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceKnn(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKnn(emb, queries, nlist = 16, nprobe = 4, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
