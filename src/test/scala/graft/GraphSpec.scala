package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  test("triangle counting: known shapes") {
    // K4: 4 triangles
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Graph.triangleCount(k4).head().getLong(0) == 4L)
    // square: 0
    val sq = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(Graph.triangleCount(sq).head().getLong(0) == 0L)
    // triangle + pendant: 1
    val tp = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(Graph.triangleCount(tp).head().getLong(0) == 1L)
  }

  test("degree-oriented count equals the naive all-wedge count on a random graph") {
    val rnd = new scala.util.Random(7)
    val es = (for (i <- 1L to 30L; j <- (i + 1) to 30L if rnd.nextDouble() < 0.2)
      yield (i, j)).distinct
    val adj = es.toSet
    def has(x: Long, y: Long) = adj.contains((x min y, x max y))
    val naive = (for {
      (a, b) <- es; c <- 1L to 30L
      if c != a && c != b && has(a, c) && has(b, c)
    } yield Set(a, b, c)).toSet.size
    val got = Graph.triangleCount(edges(es: _*)).head().getLong(0)
    assert(got == naive.toLong, s"got $got want $naive over ${es.size} edges")
  }

  test("components query shape: disconnected families label by min member") {
    // two components + the shared-kernel contract (id, cluster_id)
    val e = edges((10L, 20L), (20L, 30L), (40L, 50L))
      .select(col("a").as("id_a"), col("b").as("id_b"))
    val got = graft.llm.Dedup.connectedComponents(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 40L, 50L -> 40L))
  }

  test("pagerank: symmetry, hub dominance, determinism under repartition") {
    // 4-cycle: all nodes identical by symmetry
    val cyc = Graph.pageRank(edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
      .select("r").as[Long].collect().toSet
    assert(cyc.size == 1, s"cycle ranks diverged: $cyc")
    // star: the hub out-ranks every leaf
    val star = Graph.pageRank(edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L, 5L).forall(l => star(1L) > star(l)), s"$star")
    // fixed-point arithmetic: identical bits whatever the partitioning
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val one = Graph.pageRank(e.repartition(1)).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val many = Graph.pageRank(e.repartition(7)).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(one == many)
  }
}
