package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling ([[Sampling.dsirSelect]]): the add-one
  * unigram importance weights computed by hand on a pocket corpus, and
  * the selection law — target-like raw docs outrank target-unlike ones.
  */
class DsirSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta alpha", "en"),   // target
      (2L, "alpha gamma", "en"),        // target
      (10L, "alpha beta", "de"),        // raw, target-like
      (11L, "zeta zeta", "de"),         // raw, target-unlike
      (12L, "alpha zeta", "fr")         // raw, mixed
    ).toDF("doc_id", "text", "lang")
  }

  test("hand-computed weights and ranking") {
    val out = Sampling.dsirSelect(corpus, "text", "doc_id",
      col("lang") === "en", k = 10).collect()
    // vocab counts: alpha ct=3 cr=2 · beta ct=1 cr=1 · gamma ct=1 cr=0
    // · zeta ct=0 cr=3; nt=5, nr=6, v=4
    def w(ct: Long, cr: Long): Long =
      math.round(1e6 * math.log(((ct + 1.0) * (6 + 4)) / ((cr + 1.0) * (5 + 4))))
    val wAlpha = w(3, 2); val wBeta = w(1, 1); val wZeta = w(0, 3)
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(10L)._1 == wAlpha + wBeta)
    assert(byId(11L)._1 == 2 * wZeta)
    assert(byId(12L)._1 == wAlpha + wZeta)
    // ranking: target-like first, target-unlike last
    assert(byId(10L)._3 == 1L && byId(11L)._3 == 3L)
    assert(byId(10L)._2 == 2L) // n_words
    // target docs never appear in the selection
    assert(!byId.contains(1L) && !byId.contains(2L))
  }

  test("k caps the selection deterministically") {
    val one = Sampling.dsirSelect(corpus, "text", "doc_id",
      col("lang") === "en", k = 1).collect()
    assert(one.length == 1 && one.head.getLong(0) == 10L)
  }
}
