package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Streaming NEAR-dup admission — the ingest guard [[StreamingDedup]]
  * provides for exact duplicates, upgraded to minhash/LSH similarity: each
  * micro-batch is checked inside `foreachBatch` against the accepted
  * corpus's materialized band index ([[Dedup.dedupBatchAgainstIndex]] over
  * a [[Dedup.buildNearDupIndex]] table), and the batch's ADMITTED
  * documents immediately extend both the accepted-docs table and the band
  * index — so batch k+1 is deduplicated against everything admitted
  * through batch k, not just the initial corpus.
  *
  * Scale shape: per batch the work is the indexed cross-corpus path's —
  * batch bands × stored index bands (candidates), verification shingles
  * only for matched ids — plus an append of the batch's band rows;
  * nothing re-derives the corpus. State lives in the index table, not the
  * streaming state store, so it survives restarts and is shared with the
  * batch ingest path (q66): a corpus can interleave batch and streaming
  * ingestion against the same index.
  *
  * Admission semantics are ORDER-DEPENDENT by nature (a doc admits or
  * not depending on what was admitted before it), so the oracle contract
  * is prefix-equivalence: the admitted set equals running the BATCH
  * admission operator sequentially over the same micro-batch
  * decomposition. Rejected docs do NOT extend the index — a later doc
  * similar only to a rejected one is admitted (the rejected doc's
  * near-dup content is already represented by whatever rejected it).
  */
object StreamingNearDup {

  /** One micro-batch admission step (shared by any streaming source):
    * dedup `batch` against the current index, append survivors to the
    * accepted-docs table and their band rows to the index. The first
    * batch against a not-yet-existing index is admitted wholesale and
    * founds both tables.
    */
  def admitBatch(batch: DataFrame, acceptedDocsPath: String, indexPath: String,
      textCol: String, idCol: String, shingleN: Int = 3, numHashes: Int = 12,
      rowsPerBand: Int = 3, threshold: Double = 0.8): Unit = {
    val spark = batch.sparkSession
    val indexExists = new java.io.File(indexPath).exists()
    val admitted = (if (!indexExists) batch
      else Dedup.dedupBatchAgainstIndex(batch,
        spark.read.parquet(acceptedDocsPath), indexPath, textCol, idCol,
        shingleN, numHashes, rowsPerBand, threshold))
      .localCheckpoint(true) // evaluated twice below (docs + band rows)
    admitted.write.mode("append").parquet(acceptedDocsPath)
    Dedup.appendToNearDupIndex(admitted, textCol, idCol, indexPath,
      shingleN, numHashes, rowsPerBand)
  }

  /** Drive a deterministic multi-batch admission run from an in-memory
    * source: `batches(k)` becomes exactly micro-batch k (each `addData`
    * is fully processed before the next is offered), every batch flowing
    * through [[admitBatch]]. Returns the accepted-docs table. A
    * production deployment swaps the memory source for Kafka/files and
    * keeps the identical `foreachBatch` body; the in-memory harness is
    * what makes the batch decomposition — and therefore the admitted
    * set — reproducible for the oracle.
    */
  def admitInBatches(spark: SparkSession, batches: Seq[Seq[(Long, String)]],
      acceptedDocsPath: String, indexPath: String, shingleN: Int = 3,
      numHashes: Int = 12, rowsPerBand: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = source.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        admitBatch(b.toDF(), acceptedDocsPath, indexPath, "text", "doc_id",
          shingleN, numHashes, rowsPerBand, threshold)
      }
      .start()
    try batches.foreach { rows =>
      source.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(acceptedDocsPath)
  }
}
