package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The incremental-ingest dedup loop: a materialized band index stands in
  * for re-deriving the whole corpus's signatures per batch, and each
  * admitted batch extends the index so later batches are checked against
  * it too.
  */
class NearDupIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf())
    .filter(col("doc_id") < 1000)
  private lazy val corpus = docs.filter(col("doc_id") % 2 === 0)
  private lazy val batch = docs.filter(col("doc_id") % 2 === 1)

  test("indexed cross-corpus pairs equal the inline derivation") {
    val inline = Dedup.crossCorpusNearDupPairs(batch, corpus, "text", "doc_id",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val path = java.nio.file.Files.createTempDirectory("ndidx").resolve("idx").toString
    Dedup.buildNearDupIndex(corpus, "text", "doc_id", path)
    val indexed = Dedup.crossCorpusNearDupPairsIndexed(batch, corpus, path,
      "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inline.nonEmpty && inline == indexed)
  }

  test("admission drops exactly the batch docs with a corpus near-dup") {
    val path = java.nio.file.Files.createTempDirectory("ndidx2").resolve("idx").toString
    Dedup.buildNearDupIndex(corpus, "text", "doc_id", path)
    val dupIds = Dedup.crossCorpusNearDupPairs(batch, corpus, "text", "doc_id",
      threshold = 0.5).select("a").distinct()
      .collect().map(_.getLong(0)).toSet
    val admitted = Dedup.dedupBatchAgainstIndex(batch, corpus, path,
      "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupIds.nonEmpty && admitted == all.diff(dupIds))
  }

  test("a later batch is checked against an earlier batch's admitted docs") {
    // corpus: one seed doc; batch1: a fresh doc X (admitted, appended);
    // batch2: a near-copy of X — it must be REJECTED even though X was
    // never part of the original corpus. This is the property that makes
    // the loop incremental rather than a one-shot filter.
    val seed = Seq((1L, "completely unrelated seed text about query engines and columnar scans today"))
      .toDF("doc_id", "text")
    val x = "the migrating geese crossed the autumn sky in long wavering lines tonight"
    val batch1 = Seq((100L, x)).toDF("doc_id", "text")
    val batch2 = Seq(
      (200L, x + " again"),
      (201L, "nothing like either corpus document appears anywhere in this sentence at all"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("ndidx3").resolve("idx").toString
    Dedup.buildNearDupIndex(seed, "text", "doc_id", path)
    var corpusDocs = seed
    val admitted1 = Dedup.dedupBatchAgainstIndex(batch1, corpusDocs, path,
      "text", "doc_id", threshold = 0.5)
    assert(admitted1.select("doc_id").as[Long].collect().toSet == Set(100L))
    Dedup.appendToNearDupIndex(admitted1, "text", "doc_id", path)
    corpusDocs = corpusDocs.unionByName(admitted1)
    val admitted2 = Dedup.dedupBatchAgainstIndex(batch2, corpusDocs, path,
      "text", "doc_id", threshold = 0.5)
    assert(admitted2.select("doc_id").as[Long].collect().toSet == Set(201L),
      "the near-copy of an earlier ADMITTED doc must be rejected")
  }
}
