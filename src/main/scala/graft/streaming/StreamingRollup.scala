package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Analytics

/** Streaming incremental rollup — the materialized-view-maintenance
  * pattern run at ingest time: each micro-batch's partial hourly stats
  * ([[Analytics.partialHourlyStats]] — the commutative (cnt, sum, min,
  * max) monoid) are merged into a stored rollup table inside
  * `foreachBatch`, so the rollup is always current without ever
  * rescanning history. The q116 batch operator proves merge ≡ recompute
  * for any merge tree; this wires the same monoid into the streaming
  * runtime, where the "merge tree" is whatever micro-batch decomposition
  * the source happens to deliver — which is exactly why the oracle can
  * compare the streamed result against one batch recompute over all
  * events.
  *
  * Scale shape: per batch the work is batch-partials (narrow + one
  * map-side-combined aggregate) plus a merge against stored state that
  * is groups-sized, never history-sized. The full-table overwrite here
  * is the bounded-drain harness simplification; a production deployment
  * partitions the rollup by time bucket and rewrites only the buckets
  * the batch touched (the [[graft.ops.Similarity]] index family's
  * dynamic-partition-overwrite discipline), leaving cold history
  * untouched on disk.
  *
  * State lives in the rollup TABLE, not the streaming state store — it
  * survives restarts and is shared with the batch path: a pipeline can
  * interleave batch backfills (q116) and streaming ingest against the
  * same rollup, the same table-as-state contract as
  * [[StreamingNearDup]].
  */
object StreamingRollup {

  /** One micro-batch maintenance step: fold the batch's partials into
    * the stored rollup (founding it on first batch).
    */
  def mergeBatch(batch: DataFrame, rollupPath: String): Unit = {
    val spark = batch.sparkSession
    val partial = Analytics.partialHourlyStats(batch)
    val exists = new java.io.File(rollupPath).exists()
    val merged =
      if (!exists) partial
      else Analytics.mergePartialStats(spark.read.parquet(rollupPath), partial)
    // materialize BEFORE overwriting the table the plan reads from
    merged.localCheckpoint(true)
      .write.mode("overwrite").parquet(rollupPath)
  }

  /** Drive a deterministic multi-batch maintenance run from an
    * in-memory source (`batches(k)` = exactly micro-batch k, rows are
    * (event_id, ts, user_id, value)); returns the finalized rollup.
    * Production swaps the memory source for Kafka/files and keeps the
    * identical `foreachBatch` body — the in-memory harness makes the
    * batch decomposition reproducible for the oracle.
    */
  def rollupInBatches(spark: SparkSession,
      batches: Seq[Seq[(Long, java.sql.Timestamp, Long, Double)]],
      rollupPath: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = source.toDF().toDF("event_id", "ts", "user_id", "value")
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeBatch(b.toDF(), rollupPath)
      }
      .start()
    try batches.foreach { rows =>
      source.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    Analytics.finalizeStats(spark.read.parquet(rollupPath))
  }
}
