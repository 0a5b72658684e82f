package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters on axes 0 and 1; ids 10/11/12 are
  // near-identical within cluster A, id 20 is alone in cluster B,
  // id 21 duplicates 10 but sits slightly off-axis
  private def vec(axis: Int, scale: Double, eps: Double = 0.0): Seq[Double] =
    Seq.tabulate(4)(d =>
      (if (d == axis) scale else 0.0) + (if (d == 3) eps else 0.0))

  private lazy val centroids = Seq(
    (0L, vec(0, 1.0)), (1L, vec(1, 1.0))
  ).toDF("cid", "cvec")

  private lazy val vectors = Seq(
    (10L, vec(0, 1.0)),
    (11L, vec(0, 2.0)),          // same direction as 10 → cosine 1
    (12L, vec(0, 1.0, 0.02)),    // near-dup of 10
    (20L, vec(1, 1.0)),
    (21L, vec(1, 1.0, 0.02))     // near-dup of 20, cluster B
  ).toDF("vec_id", "embedding")

  test("within-cluster duplicates collapse to the smallest id") {
    val kept = Similarity.semanticDedup(vectors, centroids, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L), s"kept $kept")
  }

  test("threshold bounds what counts as duplicate") {
    // 12 and 21 are ~0.9998 cosine to their cluster-mates; a stricter
    // threshold above that keeps them
    val kept = Similarity.semanticDedup(vectors, centroids, threshold = 0.99999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 12L, 20L, 21L), s"kept $kept")
  }

  test("survivors carry their cluster id and keep rule is a fixpoint") {
    val out = Similarity.semanticDedup(vectors, centroids, threshold = 0.99)
    assert(out.columns.toSeq == Seq("vec_id", "centroid_id"))
    val again = Similarity.semanticDedup(
      vectors.join(out.select("vec_id"), Seq("vec_id"), "left_semi"),
      centroids, threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(again == Set(10L, 20L), "re-running dedup must be a no-op")
  }
}
