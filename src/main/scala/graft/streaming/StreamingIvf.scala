package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Similarity

/** Streaming ingestion for the IVF vector index — the embedding-side
  * sibling of [[StreamingNearDup]]'s text admission loop: each micro-batch
  * of (id, embedding) rows is folded into the centroid-partitioned index
  * inside `foreachBatch`, so the SAME materialized index serves batch
  * builds ([[Similarity.buildIvfIndex]]), batch appends
  * ([[Similarity.appendToIvfIndex]]) and a live stream — one maintenance
  * story, not three index formats.
  *
  * Per batch the work is the incremental-upsert contract's: assignment is
  * a broadcast join against the (frozen, drift-safe) centroid table, and
  * the rewrite touches only the batch's own centroid partitions plus the
  * previous homes of re-ingested ids (sidecar-pruned). State lives in the
  * index table, not the streaming state store — it survives restarts, and
  * the at-least-once crash-repair discipline documented on
  * [[Similarity.upsertCentroidPartitionedIndex]] is exactly what
  * `foreachBatch`'s replayed-batch semantics deliver.
  *
  * Unlike near-dup admission, ingestion is ORDER-INDEPENDENT on disjoint
  * ids: the final index is a pure function of the union of batches
  * (id-keyed upsert, frozen centroids), so any batch decomposition yields
  * the same index as one batch build — which is why the streaming query
  * shares the batch path's oracle verbatim.
  */
object StreamingIvf {

  /** One micro-batch step: found the index on first contact, upsert
    * after. `batch` is (idCol, vecCol) rows; `centroids` is the frozen
    * (cid, cvec) table.
    */
  def appendBatch(batch: DataFrame, centroids: DataFrame, path: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    if (!new java.io.File(path).exists())
      Similarity.buildIvfIndex(batch, centroids, path, idCol, vecCol)
    else
      Similarity.appendToIvfIndex(batch, centroids, path, idCol, vecCol)

  /** Drive a deterministic multi-batch ingest from an in-memory source:
    * `batches(k)` becomes exactly micro-batch k, each flowing through
    * [[appendBatch]]. A production deployment swaps the memory source
    * for Kafka/files and keeps the identical `foreachBatch` body; the
    * in-memory harness makes the batch decomposition reproducible (and
    * by order-independence, irrelevant to the final index).
    */
  def ingestInBatches(spark: SparkSession,
      batches: Seq[Seq[(Long, Seq[Double])]], centroids: DataFrame,
      path: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Seq[Double])]
    val q = source.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        appendBatch(b.toDF(), centroids, path)
      }
      .start()
    try batches.foreach { rows =>
      source.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
  }
}
