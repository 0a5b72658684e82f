package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf("sf0.01")).cache()
  private lazy val centroids = emb.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cid"), Similarity.asDouble(col("embedding")).as("cvec"))
  private lazy val corpus = emb.filter(col("vec_id") >= 16)
  private lazy val queryDf = emb.filter(col("vec_id") === 0)
    .select(Similarity.asDouble(col("embedding")).as("qvec"))

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("ivfpq")
      .resolve("idx").toString
    Pq.buildIvfPqIndex(corpus, centroids, p, m = 8, ksub = 32)
    p
  }

  test("index stores codes, not embeddings") {
    val idx = spark.read.parquet(path)
    assert(idx.columns.toSet == Set("vec_id", "codes", "centroid_id"),
      s"unexpected index columns: ${idx.columns.mkString(",")}")
    assert(idx.count() == corpus.count())
    // codebook sidecar round-trips
    val cb = Pq.loadCodebooks(spark, s"$path.pq")
    assert(cb.m == 8 && cb.ksub == 32 && cb.dsub == 8)
  }

  test("probe scan is partition-pruned to nProbe buckets") {
    val res = Pq.ivfPqTopKIndexed(path, centroids, corpus, queryDf,
      k = 10, nProbe = 2, rerankFactor = 3)
    val scans = res.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains(path.split("/").last))
    assert(scans.exists(_.contains("PartitionFilters")),
      s"expected PartitionFilters on the index scan:\n${scans.mkString("\n")}")
    assert(res.count() == 10)
  }

  test("append upserts codes with the frozen codebook") {
    val p = java.nio.file.Files.createTempDirectory("ivfpq-app")
      .resolve("idx").toString
    val base = emb.filter(col("vec_id") >= 16 && col("vec_id") < 400)
    val cb = Pq.buildIvfPqIndex(base, centroids, p, m = 8, ksub = 32)
    val before = spark.read.parquet(p).count()
    // new ids + one re-ingested id (same embedding → same codes/centroid)
    val batch = emb.filter(col("vec_id") >= 400 || col("vec_id") === 20)
      .filter(col("vec_id") >= 16)
    Pq.appendToIvfPqIndex(batch, centroids, p)
    val after = spark.read.parquet(p)
    // exactly one row per id (the re-ingest replaced, not duplicated)
    assert(after.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    assert(after.count() == before + batch.count() - 1)
    // appended codes match a fresh encode under the SAVED codebook
    val expected = batch
      .select(col("vec_id"),
        Pq.encodeCol(Similarity.asDouble(col("embedding")), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val stored = after.join(batch.select("vec_id"), Seq("vec_id"), "left_semi")
      .select("vec_id", "codes")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(stored == expected)
  }

  test("recall floor vs the IVF-exact search at the same probes") {
    val exact = Similarity.ivfTopK(corpus, centroids, queryDf, k = 10, nProbe = 2)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.ivfPqTopKIndexed(path, centroids, corpus, queryDf,
      k = 10, nProbe = 2, rerankFactor = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(pq.intersect(exact).size >= 7,
      s"IVFPQ recall collapsed: pq=$pq exact=$exact")
  }
}
