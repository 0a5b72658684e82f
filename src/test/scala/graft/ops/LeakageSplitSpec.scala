package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Leakage-safe splitting: a near-dup cluster must land WHOLE on one
  * side of a train/val/test split (the held-out set leaks training
  * content otherwise) — the q148 composition's core invariant.
  */
class LeakageSplitSpec extends SparkSpec {

  import spark.implicits._

  private def splitByCluster(docs: org.apache.spark.sql.DataFrame) = {
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5))
    val withCluster = docs.select(col("doc_id"))
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    Sampling.hashSplit(withCluster, "cluster",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
  }

  test("every near-dup cluster lands in exactly one split; every doc assigned") {
    val docs = Tables.documents(spark, sf())
    val res = splitByCluster(docs).cache()
    assert(res.count() == docs.count(), "every doc gets a split")
    val violating = res.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(violating == 0, "a cluster split across sides leaks")
    // multi-doc clusters exist at this SF, so the invariant is non-vacuous
    val multi = res.groupBy("cluster").count().where(col("count") > 1).count()
    assert(multi > 0, "fixture must contain non-trivial clusters")
    res.unpersist()
  }

  test("doc-keyed split DOES leak on the same corpus — the failure q148 exists to prevent") {
    val docs = Tables.documents(spark, sf())
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5))
    val naive = Sampling.hashSplit(docs.select(col("doc_id")), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val leaked = clusters.withColumnRenamed("id", "doc_id")
      .join(naive, "doc_id")
      .groupBy("cluster").agg(countDistinct(col("split")).as("n"))
      .where(col("n") > 1).count()
    assert(leaked > 0,
      "per-doc hashing must split at least one near-dup cluster here " +
        "(otherwise this corpus cannot distinguish the two policies)")
  }
}
