package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The materialized IVF index must (a) return exactly what the inline IVF
  * search returns, and (b) reach the parquet source as PartitionFilters —
  * i.e. be an index, not a full scan per query.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf())
  private lazy val centroids = emb.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cid"), Similarity.asDouble(col("embedding")).as("cvec"))
  private lazy val queryDf = emb.filter(col("vec_id") === 0)
    .select(Similarity.asDouble(col("embedding")).as("qvec"))
  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("ivf-index").resolve("idx").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") >= 16), centroids, p)
    p
  }

  test("indexed IVF search equals inline IVF search") {
    val inline = Similarity.ivfTopK(emb.filter(col("vec_id") >= 16), centroids,
      queryDf, k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = Similarity.ivfTopKIndexed(indexPath, centroids,
      queryDf, k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline.nonEmpty && inline == indexed)
  }

  test("probed search is partition-pruned at the parquet source") {
    val indexed = Similarity.ivfTopKIndexed(indexPath, centroids,
      queryDf, k = 10, nProbe = 2)
    // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf) — unwrap first
    val plan = indexed.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivf-index")))
    assert(scans.nonEmpty, "expected a parquet scan over the index")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "centroid_id")),
      s"expected centroid_id PartitionFilters, got: ${scan.partitionFilters}")
    // pruning must be real: the scan reads strictly fewer partitions than
    // the index holds (nProbe=2 of 16 centroids)
    val read = scan.relation.location.listFiles(scan.partitionFilters, Nil).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(read < total && read <= 2,
      s"expected <=2 probed partitions of $total, read $read")
  }
}
