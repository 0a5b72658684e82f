package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf("sf0.01")).cache()
  private lazy val corpus = emb.filter(col("vec_id") > 0)
  private lazy val queryDf = emb.filter(col("vec_id") === 0)
    .select(Similarity.asDouble(col("embedding")).as("qvec"))

  test("codes are m values in [0, ksub)") {
    val cb = Pq.trainCodebooks(corpus, m = 8, ksub = 16)
    assert(cb.words.size == 8 && cb.words.forall(_.size == 16)
      && cb.words.forall(_.forall(_.size == 8)))
    val codes = corpus
      .select(Pq.encodeCol(Similarity.asDouble(col("embedding")), cb).as("c"))
      .select(size(col("c")).as("n"),
        array_max(col("c")).as("mx"), array_min(col("c")).as("mn"))
      .agg(max("n"), min("n"), max("mx"), min("mn")).head()
    assert(codes.getInt(0) == 8 && codes.getInt(1) == 8)
    assert(codes.getInt(2) < 16 && codes.getInt(3) >= 0)
  }

  test("ADC ranking recalls the exact top-k after re-rank") {
    val exact = Similarity.bruteForceTopK(corpus, queryDf, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.pqTopK(corpus, queryDf, k = 10, m = 8, ksub = 32,
      rerankFactor = 8).select("vec_id").as[Long].collect().toSet
    // candidates are approximate, but the re-ranked head should agree
    // with brute force on most of the top 10 — a recall floor, not
    // exactness (that's what the q78 oracle pins down end to end)
    assert(pq.intersect(exact).size >= 7,
      s"PQ recall collapsed: pq=$pq exact=$exact")
  }

  test("pqTopK is stable under repartitioning") {
    val a = Pq.pqTopK(corpus, queryDf, 10).collect().map(_.toString).toSeq
    val b = Pq.pqTopK(corpus.repartition(7), queryDf, 10)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  /** The refinement trade, measured (documented in ARCHITECTURE.md):
    * Lloyd iterations are a descent on the per-subspace quantization
    * objective, so reconstruction MSE MUST drop — that's the guaranteed
    * half. Recall follows in aggregate (a single query can tie-flip when
    * near-equal candidates straddle a moved cell boundary), so recall is
    * asserted as a sum over an 8-query panel, at both rerankFactor=1
    * (raw ADC head — pure codebook quality, no exact re-rank to paper
    * over it) and the production rerankFactor. Measured on this corpus:
    * MSE 0.599 → 0.443, panel recall 23 → 30 (rf=1), 49 → 58 (rf=4).
    */
  test("Lloyd-refined codebooks: MSE drops, panel recall@10 >= deterministic") {
    // corpus excludes the 8 panel queries so every recall is out-of-sample
    val cached = emb.filter(col("vec_id") >= 16).cache()
    val det = Pq.trainCodebooks(cached, m = 8, ksub = 32)
    val refined = Pq.refineCodebooks(cached, det, iters = 3)
    def mse(cb: Pq.Codebook): Double = {
      val cbLit = typedLit(cb.words)
      cached.select(Similarity.asDouble(col("embedding")).as("e"))
        .select(col("e"), Pq.encodeCol(col("e"), cb).as("c"))
        .select(aggregate(sequence(lit(0), lit(cb.m - 1)), lit(0.0), (acc, s) => {
          val sub = slice(col("e"), s * cb.dsub + 1, lit(cb.dsub))
          val cw = element_at(element_at(cbLit, s + 1),
            element_at(col("c"), s + 1) + 1)
          acc + aggregate(zip_with(sub, cw, (a, b) => (a - b) * (a - b)),
            lit(0.0), (x, y) => x + y)
        }).as("err"))
        .agg(avg("err")).head.getDouble(0)
    }
    val (mDet, mRef) = (mse(det), mse(refined))
    info(s"reconstruction MSE deterministic=$mDet refined=$mRef")
    assert(mRef < mDet, s"Lloyd refinement did not reduce MSE: $mRef >= $mDet")
    def panelRecall(cb: Pq.Codebook, rf: Int): Int = (0 until 8).map { qid =>
      val queryDf = emb.filter(col("vec_id") === qid)
        .select(Similarity.asDouble(col("embedding")).as("qvec"))
      val exact = Similarity.bruteForceTopK(cached, queryDf, k = 10)
        .select("vec_id").as[Long].collect().toSet
      Pq.pqTopKWithCodebook(cached, cb, queryDf, k = 10, rerankFactor = rf)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    }.sum
    for (rf <- Seq(1, 4)) {
      val (rDet, rRef) = (panelRecall(det, rf), panelRecall(refined, rf))
      info(s"panel recall@10 rf=$rf deterministic=$rDet refined=$rRef")
      assert(rRef >= rDet, s"refinement regressed panel recall at rf=$rf: $rRef < $rDet")
    }
  }
}
