package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Sketches

/** Streaming sketch maintenance — the [[StreamingRollup]] pattern
  * applied to a MERGEABLE SKETCH instead of an exact monoid: each
  * micro-batch's HLL register table ([[Sketches.hllRegisters]]) folds
  * into a stored register table by per-register max
  * ([[Sketches.hllMergeRegisters]] — associative, commutative,
  * idempotent), so a live distinct-users-per-segment estimate is always
  * current without rescanning history AND without unbounded state:
  * the stored table is O(groups · buckets) regardless of how much
  * stream has passed — the whole point of sketch-backed streaming
  * analytics at 100 TB/day.
  *
  * Because the merge is exactly associative/commutative/idempotent,
  * ANY micro-batch decomposition (including replays — idempotence
  * absorbs at-least-once delivery) yields the register table of the
  * one-shot batch build. That law IS the oracle gate: the streamed
  * estimate must hash-equal the q166-style batch SQL rebuild.
  *
  * State lives in the register TABLE, not the streaming state store —
  * shared with the batch path, restart-safe, the same table-as-state
  * contract as [[StreamingRollup]] and [[StreamingNearDup]].
  */
object StreamingSketch {

  /** One maintenance step: fold the batch's registers into the stored
    * table (founding it on the first batch).
    */
  def mergeBatch(batch: DataFrame, regPath: String, groupCol: String,
      valueCol: String, buckets: Int, maxRank: Int): Unit = {
    val spark = batch.sparkSession
    val partial = Sketches.hllRegisters(batch, groupCol, valueCol,
      buckets, maxRank)
    val exists = new java.io.File(regPath).exists()
    val merged =
      if (!exists) partial
      else Sketches.hllMergeRegisters(spark.read.parquet(regPath), partial)
    // materialize BEFORE overwriting the table the plan reads from
    merged.localCheckpoint(true)
      .write.mode("overwrite").parquet(regPath)
  }

  /** Drive a deterministic multi-batch maintenance run from an
    * in-memory source (rows are (event_id, user_id, event_type));
    * returns the per-event_type estimate off the final register table.
    * Production swaps the memory source for Kafka/files and keeps the
    * identical `foreachBatch` body.
    */
  def distinctUsersInBatches(spark: SparkSession,
      batches: Seq[Seq[(Long, Long, String)]], regPath: String,
      buckets: Int = 1024, maxRank: Int = 40): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Long, String)]
    val q = source.toDF().toDF("event_id", "user_id", "event_type")
      .writeStream
      .foreachBatch { (b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeBatch(b.toDF(), regPath, "event_type", "user_id",
          buckets, maxRank)
      }
      .start()
    try batches.foreach { rows =>
      source.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    Sketches.hllEstimate(spark.read.parquet(regPath), buckets, maxRank)
      .withColumnRenamed("g", "event_type")
  }
}
