package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank fixed point of a 2-cycle is uniform") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "tgt")
    val r = Graph.pageRank(nodes, "id", edges, iters = 7)
      .as[(Long, Double)].collect().toMap
    // uniform is the exact fixed point: 0.15/2 + 0.85*0.5 = 0.5
    assert(r(0L) == 0.5 && r(1L) == 0.5)
  }

  test("dangling mass is redistributed — total rank stays 1") {
    // 0 -> 1 -> 2, node 2 dangling
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "tgt")
    val r = Graph.pageRank(nodes, "id", edges, iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6, s"sum=${r.values.sum}")
    // the chain accumulates: 2 receives everything 1 had plus its share
    assert(r(2L) > r(1L) && r(1L) > r(0L))
  }

  test("pseudoEdges are deterministic, self-loop-free, in range") {
    val nodes = spark.range(50).toDF("doc_id")
    val e1 = Graph.pseudoEdges(nodes, "doc_id", 50).as[(Long, Long)]
      .collect().toSet
    val e2 = Graph.pseudoEdges(nodes, "doc_id", 50).as[(Long, Long)]
      .collect().toSet
    assert(e1 == e2)
    assert(e1.forall { case (s, t) => s != t && t >= 0 && t < 50 })
    assert(e1.groupBy(_._1).forall(_._2.size <= 3))
  }

  private def triangles(edges: (Long, Long)*): Long =
    Graph.triangleCount(edges.toSeq.toDF("src", "tgt")).as[Long].head()

  test("triangleCount: exact counts on hand graphs") {
    // one triangle, noisy encoding: reversed direction + parallel edge
    // + self loop must all collapse away
    assert(triangles((1L, 2L), (3L, 2L), (1L, 3L), (2L, 1L), (3L, 3L)) == 1L)
    // square without a diagonal: zero; with one diagonal: two
    assert(triangles((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)) == 0L)
    assert(triangles((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)) == 2L)
    // K4: exactly C(4,3) = 4
    assert(triangles((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) == 4L)
  }
}
