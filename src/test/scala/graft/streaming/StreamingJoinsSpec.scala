package graft.streaming

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime + min * 60000L)

  test("interval join matches across micro-batches via buffered state") {
    val dir = java.nio.file.Files.createTempDirectory("sij").toString
    // batch 1: only views; batch 2: the purchases. The join must emit the
    // pairs when the right side arrives — left rows live in the state
    // store between batches.
    Seq((1L, 10L, "view", ts(0)), (1L, 11L, "view", ts(30)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq((1L, 20L, "purchase", ts(90)), (2L, 21L, "purchase", ts(95)))
      .toDF("user_id", "event_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$dir/f2")
    val ckpt = java.nio.file.Files.createTempDirectory("sij-ckpt").toString
    val stream = spark.readStream
      .schema("user_id long, event_id long, event_type string, ts timestamp")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*/part-*.parquet")
    val q = StreamingJoins
      .viewToPurchase(stream, watermark = Some(("1 hour", "7 hours")))
      .writeStream.format("memory").queryName("sij_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sij_t")
      .as[(Long, Long, Long, Long)].collect().toSet
    spark.catalog.dropTempView("sij_t")
    // user 1: both views (t0, t30) pair with purchase at t90 (gaps 90/60
    // min, inside 6 h). user 2's purchase has no view at all.
    assert(rows == Set((1L, 10L, 20L, 90L * 60000), (1L, 11L, 20L, 60L * 60000)))
  }

  test("streaming drain equals the batch interval join on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingJoins
      .runAvailableNow(spark, dir, "sij_equiv")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = StreamingJoins.viewToPurchase(Tables.events(spark, dir))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("generic intervalJoin honors the half-open (l_ts, l_ts+gap] bound") {
    val left = Seq((1L, ts(0))).toDF("k", "ts")
    val right = Seq((1L, ts(0)), (1L, ts(5)), (1L, ts(10)), (1L, ts(11)))
      .toDF("k", "ts")
    val got = StreamingJoins.intervalJoin(left, right, "k", "10 minutes")
      .select($"r_ts").as[java.sql.Timestamp].collect().toSet
    // strict lower bound excludes the simultaneous row; inclusive upper
    // keeps the exactly-10-min row; 11 min is out
    assert(got == Set(ts(5), ts(10)))
  }

  test("stream-static enrichment: streamed rollup equals batch; unmatched kept") {
    val dir = sf("sf0.001")
    val streamed = StreamingJoins.runEnrichAvailableNow(spark, dir,
        "sj_enrich_spec")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = StreamingJoins.enrichedSegmentRollup(
        graft.queries.Tables.events(spark, dir),
        graft.queries.Tables.customer(spark, dir))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // the left join's point: unmatched traffic is counted, not dropped
    val (matched, total) = (batch.toSeq.map(_._3).sum, batch.toSeq.map(_._2).sum)
    assert(batch.exists(_._1 == "UNMATCHED") || matched == total)
  }
}
