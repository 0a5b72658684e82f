package graft.streaming

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingSpec extends SparkSpec {

  test("session_window stream drains and matches batch gap-sessionization") {
    val streamed = StreamingSessions.runAvailableNow(spark, sf(), "spec_sessions")
      .cache()
    assert(streamed.count() > 0)
    // batch re-derivation with the same µs gap logic
    val ev = Tables.events(spark, sf())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val batch = ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") >= 1800000000L, 1).otherwise(0))
      .withColumn("sess", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg((min(col("us")) / 1000).cast("long").as("session_start_ms"),
        ((max(col("us")) + 1800000000L) / 1000).cast("long").as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .drop("sess")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("incremental stateful sessionization carries open sessions across micro-batches") {
    import spark.implicits._
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamingSessions.Ev]
    val minUs = 60L * 1000000
    val q = StreamingSessions.statefulSessionize(mem.toDS(), gapUs = 30 * minUs,
        flushOpen = false)
      .writeStream.format("memory").queryName("inc_sessions")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("inc-ckpt").toString)
      .start()
    try {
      // batch 1: two events 1 min apart — session stays open, nothing emitted
      mem.addData(StreamingSessions.Ev(1L, 0), StreamingSessions.Ev(1L, minUs))
      q.processAllAvailable()
      assert(spark.table("inc_sessions").count() == 0)
      // batch 2: +2 min continues the session; +50 min closes it and opens anew
      mem.addData(StreamingSessions.Ev(1L, 2 * minUs), StreamingSessions.Ev(1L, 52 * minUs))
      q.processAllAvailable()
      val emitted = spark.table("inc_sessions").collect()
      assert(emitted.length == 1)
      val sess = emitted.head
      assert(sess.getAs[Long]("session_start_ms") == 0L)
      // closed session: last event at +2 min, end = +2min + 30min gap
      assert(sess.getAs[Long]("session_end_ms") == (2 + 30) * 60000L)
      assert(sess.getAs[Long]("n_events") == 3L)
    } finally q.stop()
  }

  test("incremental sessionizer: a late cross-batch event cannot regress the open session") {
    import spark.implicits._
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamingSessions.Ev]
    val minUs = 60L * 1000000
    val q = StreamingSessions.statefulSessionize(mem.toDS(), gapUs = 30 * minUs,
        flushOpen = false)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("late-ckpt").toString)
      .start()
    try {
      // open session ends at t=100min
      mem.addData(StreamingSessions.Ev(1L, 80 * minUs), StreamingSessions.Ev(1L, 100 * minUs))
      q.processAllAvailable()
      // late event at t=60min + on-time event at t=105min: both continue
      // the SAME session (gap from 100min is 5min) — before the fix, the
      // late event regressed lastUs to 60min and 105min falsely closed it
      mem.addData(StreamingSessions.Ev(1L, 60 * minUs), StreamingSessions.Ev(1L, 105 * minUs))
      q.processAllAvailable()
      assert(spark.table("late_sessions").count() == 0,
        "no session may close: all events are within the gap of the open one")
      // events far older than the open session's reach are emitted as
      // orphan sessions, not merged across a >gap silence — and adjacent
      // orphans within the gap of each other merge into ONE session
      mem.addData(StreamingSessions.Ev(1L, 10 * minUs),
        StreamingSessions.Ev(1L, 12 * minUs))
      q.processAllAvailable()
      val orphans = spark.table("late_sessions").collect()
      assert(orphans.length == 1)
      assert(orphans.head.getAs[Long]("session_start_ms") == 10 * 60000L)
      assert(orphans.head.getAs[Long]("session_end_ms") == (12 + 30) * 60000L)
      assert(orphans.head.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("event-time timeout flushes open sessions once the watermark proves the gap") {
    import spark.implicits._
    implicit val s = spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[StreamingSessions.EvT]
    // base offset keeps every event strictly above the initial watermark
    // (0): FlatMapGroupsWithStateExec drops input rows at-or-below the
    // watermark, so a t=0 event would silently vanish in batch 1
    val base = 100L
    def ts(min: Long) = new java.sql.Timestamp((base + min) * 60000L)
    def ms(min: Long) = (base + min) * 60000L
    val q = StreamingSessions.statefulSessionizeWithTimeout(mem.toDS(),
        gapUs = 30L * 60 * 1000000, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("timeout_sessions")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("to-ckpt").toString)
      .start()
    try {
      // batch 1: user 1 has two events; session deadline = 1 + 30 = 31 min.
      // nothing can be emitted yet and state holds the open session.
      mem.addData(StreamingSessions.EvT(1L, ts(0)), StreamingSessions.EvT(1L, ts(1)))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").count() == 0)
      // batch 2: an unrelated user's event at t=120min pushes the
      // watermark to 110min — past user 1's deadline. The timeout fires
      // WITHOUT user 1 ever sending another event (the quiet-user flush
      // the NoTimeout variant cannot do).
      mem.addData(StreamingSessions.EvT(2L, ts(120)))
      q.processAllAvailable()
      val emitted = spark.table("timeout_sessions")
        .filter($"user_id" === 1L).collect()
      assert(emitted.length == 1, "user 1's open session must flush on timeout")
      assert(emitted.head.getAs[Long]("session_start_ms") == ms(0))
      assert(emitted.head.getAs[Long]("session_end_ms") == ms(31))
      assert(emitted.head.getAs[Long]("n_events") == 2L)
      // state hygiene: user 1's state is gone — a new event opens a fresh
      // session rather than resurrecting the flushed one, and no
      // duplicate of the flushed session is ever re-emitted
      mem.addData(StreamingSessions.EvT(1L, ts(125)))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").filter($"user_id" === 1L).count() == 1)
      // batch 4: watermark far ahead (t=300min → wm=290min) times out the
      // remaining open sessions of BOTH users — state drains to empty
      mem.addData(StreamingSessions.EvT(3L, ts(300)))
      q.processAllAvailable()
      val afterDrain = spark.table("timeout_sessions").collect()
      assert(afterDrain.count(_.getAs[Long]("user_id") == 1L) == 2)
      assert(afterDrain.count(_.getAs[Long]("user_id") == 2L) == 1)
      val u1Fresh = afterDrain.filter(r =>
        r.getAs[Long]("user_id") == 1L && r.getAs[Long]("session_start_ms") == ms(125))
      assert(u1Fresh.length == 1 &&
        u1Fresh.head.getAs[Long]("session_end_ms") == ms(155))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer agrees with session_window on a drain") {
    import spark.implicits._
    implicit val s = spark
    val evs = Tables.events(spark, sf())
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[StreamingSessions.Ev]
    val stateful = StreamingSessions.statefulSessionize(evs, 1800000000L).toDF()
    val declarative = StreamingSessions.sessionWindowAgg(
      Tables.events(spark, sf()))
      .select("user_id", "session_start_ms", "session_end_ms", "n_events")
    assert(stateful.count() == declarative.count())
    assert(stateful.except(declarative).count() == 0)
  }

  test("StreamingSketch: streamed registers equal the one-shot batch build") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, i % 97, s"t${i % 3}"))
    val path = java.nio.file.Files.createTempDirectory("graft-hll-spec")
      .resolve("regs.parquet").toString
    // 3 uneven batches PLUS a replay of batch 0 — idempotent merge must
    // absorb at-least-once delivery
    val batches = Seq(rows.filter(_._1 % 3 == 0), rows.filter(_._1 % 3 == 1),
      rows.filter(_._1 % 3 == 2), rows.filter(_._1 % 3 == 0))
    val streamed = graft.streaming.StreamingSketch
      .distinctUsersInBatches(spark, batches, path, buckets = 64, maxRank = 40)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val batch = graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllRegisters(
          rows.toDF("event_id", "user_id", "event_type"),
          "event_type", "user_id", buckets = 64, maxRank = 40),
        buckets = 64, maxRank = 40)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }
}
