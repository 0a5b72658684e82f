package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gapFillForwardFill: grid spans min..max, fills gaps, flags them") {
    // key 1: observations in hours 0 and 3 → grid 0,1,2,3 with 1,2 filled
    // from hour 0; key 2: single observation → single-row grid
    val df = Seq((1L, ts(0), 10.0, 100L), (1L, ts(3), 30.0, 101L),
      (2L, ts(5), 50.0, 102L)).toDF("k", "t", "v", "o")
    val got = TimeSeries.gapFillForwardFill(df, "k", "t", "v", "o", 3600000L)
      .orderBy("k", "bucket_ms")
      .as[(Long, Long, Option[Double], Option[Double], Boolean)].collect()
    def ms(h: Int) = ts(h).getTime
    assert(got.toSeq == Seq(
      (1L, ms(0), Some(10.0), Some(10.0), false),
      (1L, ms(1), None, Some(10.0), true),
      (1L, ms(2), None, Some(10.0), true),
      (1L, ms(3), Some(30.0), Some(30.0), false),
      (2L, ms(5), Some(50.0), Some(50.0), false)))
  }

  test("bucket's own value is the LAST observation by the order column") {
    val df = Seq((1L, ts(0, 10), 1.0, 7L), (1L, ts(0, 50), 2.0, 9L),
      (1L, ts(0, 55), 3.0, 8L)).toDF("k", "t", "v", "o")
    val got = TimeSeries.gapFillForwardFill(df, "k", "t", "v", "o", 3600000L)
      .select("v").as[Double].collect()
    assert(got.toSeq == Seq(2.0)) // o=9 wins, not the latest timestamp
  }

  test("null key / null ts rows are dropped, not gridded") {
    val df = Seq((Some(1L), Option(ts(0)), 1.0, 1L),
      (None, Option(ts(1)), 2.0, 2L), (Some(1L), None, 3.0, 3L))
      .toDF("k", "t", "v", "o")
    val got = TimeSeries.gapFillForwardFill(df, "k", "t", "v", "o", 3600000L)
      .collect()
    assert(got.length == 1)
  }

  test("scd2: half-open succession per key, latest is current") {
    val df = Seq((1L, 10L, "A", ts(0)), (1L, 11L, "B", ts(2)),
      (2L, 20L, "C", ts(1))).toDF("k", "ver", "attr", "t")
    val got = Relational.scd2(df, "k", "t", "ver")
      .select("k", "ver", "valid_from_ms", "valid_to_ms", "is_current")
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet
    def ms(h: Int) = ts(h).getTime
    assert(got == Set(
      (1L, 10L, ms(0), Some(ms(2)), false),
      (1L, 11L, ms(2), None, true),
      (2L, 20L, ms(1), None, true)))
  }

  test("scd2 tie column orders simultaneous versions totally") {
    val df = Seq((1L, 5L, ts(0)), (1L, 6L, ts(0))).toDF("k", "ver", "t")
    val got = Relational.scd2(df, "k", "t", "ver")
      .select("ver", "valid_to_ms", "is_current")
      .as[(Long, Option[Long], Boolean)].collect().toSet
    // ver 5 precedes ver 6: zero-length interval, only 6 is current
    assert(got == Set((5L, Some(ts(0).getTime), false), (6L, None, true)))
  }
}
