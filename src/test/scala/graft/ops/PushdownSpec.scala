package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scan hygiene for the 100 TB contract: filters must reach the parquet
  * source as PushedFilters and projections must shrink ReadSchema — a
  * scan that reads every column for a two-column query, or filters in
  * the executor instead of the reader, multiplies the dominant cost at
  * scale (the scan) by the full table width.
  */
class PushdownSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect { case s: FileSourceScanExec => s }
  }

  test("filter + narrow projection reach the documents scan") {
    // sf0.01, not the default sf0.001: OpsSpec caches the sf0.001
    // documents table in the shared session, and a cache hit would swap
    // the parquet scan under assertion for an InMemoryTableScan
    val df = Tables.documents(spark, sf("sf0.01"))
      .filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    val s = scans(df).head
    val pushed = s.metadata("PushedFilters")
    assert(pushed.contains("LessThan(doc_id,500)"), s"filters not pushed: $pushed")
    assert(s.requiredSchema.fieldNames.toSet == Set("doc_id", "text"),
      s"scan reads more than the projection: ${s.requiredSchema.fieldNames.toSeq}")
  }

  test("join + aggregate prunes every scan to the referenced columns") {
    val df = graft.queries.RelationalQueries.q03RevenueByNation(spark, sf())
    val byTable = scans(df).map(s =>
      s.relation.location.rootPaths.head.getName -> s.requiredSchema.fieldNames.toSet).toMap
    assert(byTable("orders.parquet") == Set("o_custkey", "o_totalprice"),
      s"orders over-read: ${byTable("orders.parquet")}")
    assert(byTable("customer.parquet") == Set("c_custkey", "c_nationkey"),
      s"customer over-read: ${byTable("customer.parquet")}")
    assert(byTable("nation.parquet") == Set("n_nationkey", "n_regionkey", "n_name"))
    assert(byTable("region.parquet") == Set("r_regionkey", "r_name"))
  }

  test("numeric range filter is pushed for the orders scan") {
    val df = Tables.orders(spark, sf())
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"))
    val s = scans(df).head
    assert(s.metadata("PushedFilters").contains("GreaterThan(o_totalprice,300000.0)"),
      s"got: ${s.metadata("PushedFilters")}")
    assert(s.requiredSchema.fieldNames.toSet == Set("o_orderkey", "o_totalprice"))
  }

  private def broadcastJoins(df: DataFrame): Int = {
    // count BHJs anywhere in the (possibly adaptive, possibly staged)
    // physical plan — the string form sees through AQE's lazy stages
    df.queryExecution.executedPlan.toString()
      .split("BroadcastHashJoin").length - 1
  }

  test("blocklistFilter joins the term list as a broadcast, never a shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "a slow b")).toDF("doc_id", "text")
    val df = TextOps.blocklistFilter(docs, "text", "doc_id",
      Seq("slow", "noise"))
    assert(broadcastJoins(df) >= 1,
      s"term list must broadcast:\n${df.queryExecution.executedPlan}")
    assert(!df.queryExecution.executedPlan.toString()
      .contains("SortMergeJoin"),
      "a sort-merge join against a constant term list is the anti-pattern")
  }

  test("kmeansInteger assigns via a broadcast of the centroid table") {
    import spark.implicits._
    val emb = Seq((0L, Array(0.0f, 1.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val df = Similarity.kmeansInteger(emb, "vec_id", "embedding",
      k = 2, iters = 2)
    assert(broadcastJoins(df) >= 1,
      s"centroids must broadcast:\n${df.queryExecution.executedPlan}")
  }

  test("filterOverlapReport is ONE aggregate pass — a single exchange") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i % 7)).toDF("id", "v")
    val plan = Cleaning.filterOverlapReport(df, "id", Seq(
        "a" -> (col("v") < 2), "b" -> (col("v") > 5)))
      .queryExecution.executedPlan.toString()
    // one shuffle for the global aggregate, nothing per rule
    assert(plan.split("Exchange").length - 1 <= 1,
      s"expected at most one exchange:\n$plan")
  }

  test("uniMaxAllocation's windows never touch data-sized rows") {
    import spark.implicits._
    // the corpus reduces to source cardinality BEFORE any window: the
    // plan's window operators must sit above the grouped aggregate
    val docs = (1L to 100L).map(i => (s"t$i word word", s"s${i % 5}"))
      .toDF("text", "source")
    val qe = Sampling.uniMaxAllocation(docs, "text", "source",
      budget = 100L).queryExecution
    val plan = qe.executedPlan.toString()
    assert(plan.contains("Window"))
    // the aggregate that bounds the frame appears below the windows in
    // the tree: equivalently, the window's input is an Aggregate, not
    // the raw scan — check via the optimized logical plan shape
    val logical = qe.optimizedPlan.toString()
    val winIdx = logical.indexOf("Window")
    val aggIdx = logical.indexOf("Aggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must run over the aggregated source frame:\n$logical")
  }

  test("contaminationAttribution's top-1 is a WindowGroupLimit map-side prune") {
    import spark.implicits._
    val eval = (1L to 20L).map(i => (i, "a b c d")).toDF("doc_id", "text")
    val train = (100L to 110L).map(i => (i, "a b x y")).toDF("doc_id", "text")
    val plan = Dedup.contaminationAttribution(eval, train,
        "text", "doc_id", n = 2)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"rn=1 must prune map-side:\n$plan")
  }
}
