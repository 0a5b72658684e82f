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
}
