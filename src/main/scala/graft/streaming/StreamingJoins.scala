package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join (SURVEY.md §2.10): the funnel primitive a
  * training-data/event pipeline uses to attribute one event stream to
  * another — each left event matched to every right event of the same key
  * within `(leftTs, leftTs + maxGap]`.
  *
  * Spark-first shape: two watermarked streams, inner equi-join on the key
  * with an event-time range conjunct. The range condition is what lets the
  * state store evict: a buffered left row is droppable once the right
  * watermark passes `leftTs + maxGap`, a buffered right row once the left
  * watermark passes its `rightTs` — Spark derives both bounds from the
  * join condition, so state is O(watermark horizon × rate), not O(stream).
  *
  * Scale notes: one shuffle per side on the join key; skewed keys behave
  * like any stream-stream join (state for a hot user grows with its rate
  * × horizon, not with corpus size). The batch plan of the same expression
  * is a plain sort-merge/broadcast join — the declaration is shared, which
  * is the point: `intervalJoin` is callable with batch OR streaming inputs.
  */
object StreamingJoins {

  /** Generic interval join: rows of `left` matched to rows of `right` with
    * equal `key` and `right.ts` in `(left.ts, left.ts + maxGap]`.
    * Column names must be disjoint apart from `key` (both sides are
    * prefixed internally, and the caller selects from the returned frame).
    * Works unchanged on batch and streaming frames; for streaming inputs
    * both sides must already carry a watermark on their `ts`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      maxGap: String): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
  }

  /** The oracle-gated funnel query: each `view` joined to the same user's
    * `purchase` events within 6 hours. Gap reported in integer ms (µs
    * difference floor-divided — exact on both engines, no float).
    */
  def viewToPurchase(events: DataFrame, maxGap: String = "6 hours",
      watermark: Option[(String, String)] = None): DataFrame = {
    def side(tpe: String, idAs: String, delay: String) = {
      val base = events.filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs), col("ts"))
      watermark.fold(base)(_ => base.withWatermark("ts", delay))
    }
    // right watermark must cover the 6 h horizon behind the left one for
    // no-late-drop semantics; AvailableNow single-batch drains are exact
    // regardless, but this is the continuous-run configuration.
    val (viewDelay, purchDelay) = watermark.getOrElse(("1 hour", "7 hours"))
    val views = side("view", "view_id", viewDelay)
    val purchases = side("purchase", "purchase_id", purchDelay)
    intervalJoin(views, purchases, "user_id", maxGap)
      .select(col("l_user_id").as("user_id"), col("l_view_id").as("view_id"),
        col("r_purchase_id").as("purchase_id"),
        expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000").as("gap_ms"))
  }

  /** Streaming drain: two file-source streams over the events table,
    * watermarked, interval-joined, appended to a memory sink until the
    * source is exhausted (`AvailableNow`).
    */
  def runAvailableNow(spark: SparkSession, dir: String,
      tableName: String): DataFrame = {
    val stream = StreamingSessions.readEventsStream(spark, dir)
    StreamingSessions.drainAvailableNow(spark,
      viewToPurchase(stream, watermark = Some(("1 hour", "7 hours"))),
      tableName,
      org.apache.spark.sql.streaming.OutputMode.Append(),
      noDataBatch = false) // INNER join: matches emit on arrival, none on close
  }

  /** Stream-STATIC enrichment — the most common streaming join in any
    * event pipeline: each micro-batch of the event stream left-joins a
    * broadcast dimension table (no watermark, no state — the static
    * side is re-broadcast per batch, which is what makes slowly-updated
    * dims pick up mid-stream), then rolls up per dimension attribute.
    * Unmatched events keep a sentinel group instead of vanishing — a
    * left join, because an enrichment that silently drops unmatched
    * traffic under-counts exactly when the dim is stale.
    *
    * Exact aggregates only (counts + milli-scaled value sums), so the
    * streamed Complete-mode result equals the batch rollup row-for-row.
    */
  def enrichedSegmentRollup(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("UNMATCHED")).as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(coalesce(round(col("value") * 1000).cast("long"), lit(0L)))
          .as("sum_mv"))

  /** Drain the stream-static enrichment over the events file stream. */
  def runEnrichAvailableNow(spark: SparkSession, dir: String,
      tableName: String): DataFrame =
    StreamingSessions.drainAvailableNow(spark,
      enrichedSegmentRollup(
        StreamingSessions.readEventsStream(spark, dir),
        graft.queries.Tables.customer(spark, dir)),
      tableName, noDataBatch = false) // Complete mode: teardown-only batch
}
