package graft.ops

import graft.SparkSpec

/** Embedding-space audits: isotropy via the Gram identity (mean
  * pairwise cosine with no pair join) and the top-principal-component
  * share via integer-pinned power iteration. Hand-computable planted
  * geometries pin the algebra; the q380/q381 oracles pin the
  * cross-engine arithmetic.
  */
class EmbeddingAuditSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingIsotropy: orthogonal pair = 0, aligned = 1, opposed = -1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), "orth"), (1L, Array(0.0f, 1.0f), "orth"),
      (2L, Array(1.0f, 0.0f), "same"), (3L, Array(1.0f, 0.0f), "same"),
      (4L, Array(1.0f, 0.0f), "anti"), (5L, Array(-1.0f, 0.0f), "anti"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity
      .embeddingIsotropy(emb, "vec_id", "embedding", "label")
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // orth: S=(1e6,1e6), Q per dim 1e12 → ΣS²=2e12 = ΣQ → pair dot 0
    assert(got("orth") == (("orth", 2L, 2L, 2000000000000L, 0L, 1.0,
      Some(0.0))))
    // same: S=(2e6,0) → ΣS²=4e12, ΣQ=2e12 → pair 2e12, /2/1e12 = 1
    assert(got("same") == (("same", 2L, 2L, 2000000000000L,
      2000000000000L, 1.0, Some(1.0))))
    // anti: S=0 → pair −2e12 → −1
    assert(got("anti") == (("anti", 2L, 2L, 2000000000000L,
      -2000000000000L, 1.0, Some(-1.0))))
  }

  test("embeddingIsotropy: singleton group has no pairs — null cosine") {
    val emb = Seq((0L, Array(1.0f, 0.0f), "solo"))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity
      .embeddingIsotropy(emb, "vec_id", "embedding", "label")
      .as[(String, Long, Long, Long, Long, Double, Option[Double])]
      .collect()
    assert(got.toSeq == Seq(("solo", 1L, 2L, 1000000000000L, 0L, 1.0,
      None)))
  }

  test("topComponentShare: rank-one cloud puts ALL energy in one direction") {
    val emb = (0L to 4L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity
      .topComponentShare(emb, "vec_id", "embedding", iters = 4)
      .as[(Long, Long, Long, Option[Double], Long)].collect()
    // M = [[5e12, 0], [0, 0]]; u converges to (1e6, 0) in one round;
    // λ = 5e12 = trace → share exactly 1
    assert(got.toSeq == Seq((5L, 2L, 5000000000000L, Some(1.0), 0L)))
  }

  test("topComponentShare: 3:1 axis split converges to the heavy axis") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val (n, d, trace, share, topDim) = Similarity
      .topComponentShare(emb, "vec_id", "embedding", iters = 4)
      .as[(Long, Long, Long, Option[Double], Long)].head()
    assert((n, d, trace, topDim) == ((4L, 2L, 4000000000000L, 0L)))
    // M = diag(3e12, 1e12): Rayleigh share after 4 truncating rounds
    // sits between the uniform 0.25·4=… start and the pure-axis 3/4
    assert(share.exists(s => s > 0.74 && s <= 0.75))
  }
}
