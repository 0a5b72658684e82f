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

  private def zscore(rows: Seq[(Long, java.sql.Timestamp, Double, Long)],
      nPrev: Int = 2, thresh: Double = 2.0) =
    TimeSeries.rollingZscore(rows.toDF("k", "t", "v", "o"),
      "k", "t", "v", "o", nPrev, thresh)
      .orderBy("o")
      .select("o", "v", "w_cnt", "z", "is_anomaly")
      .as[(Long, Long, Long, Option[Double], Boolean)].collect().toSeq

  test("seasonalDecompose: hand MA trend, phase means, edge nulls, Q units") {
    // period 2 → Q = 4·cent. Series (cents): 10, 40, 30, 60, 50 at
    // hours 0..4 — a +10/h trend with a +20 odd-hour seasonal.
    // hr1: s1 = 10+40, s2 = 40+30 → trend_q 120, detr_q = 160−120 = 40
    // hr2: trend_q 160, detr_q = −40; hr3: trend_q 200, detr_q = 40
    // phases: ph1 mean(40, 40) = 40; ph0 mean(−40) = −40 (edges null)
    val rows = Seq((0, 0.10), (1, 0.40), (2, 0.30), (3, 0.60), (4, 0.50))
      .map { case (h, v) => ("a", ts(h), v) }.toDF("g", "ts", "v")
    val got = TimeSeries.seasonalDecompose(rows, "g", "ts", "v", period = 2)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._2).toSeq
    val base = ts(0).getTime / 3600000L
    assert(got == Seq(
      ("a", base + 0, 10L, None, Some(-40L), None),
      ("a", base + 1, 40L, Some(120L), Some(40L), Some(0L)),
      ("a", base + 2, 30L, Some(160L), Some(-40L), Some(0L)),
      ("a", base + 3, 60L, Some(200L), Some(40L), Some(0L)),
      ("a", base + 4, 50L, None, Some(-40L), None)))
  }

  test("rollingZscore: exact z over the trailing frame, current row excluded") {
    // v milli: 1000, 2000, 3000, 100000; frame = 2 rows strictly before.
    // row o=3: {1000,2000} → num = 2·5e6 − 9e6 = 1e6, z = (6000−3000)/1000 = 3
    // row o=4: {2000,3000} → num = 2·13e6 − 25e6 = 1e6, z = (200000−5000)/1000
    val got = zscore(Seq((1L, ts(0), 1.0, 1L), (1L, ts(1), 2.0, 2L),
      (1L, ts(2), 3.0, 3L), (1L, ts(3), 100.0, 4L)))
    assert(got == Seq(
      (1L, 1000L, 0L, None, false),
      (2L, 2000L, 1L, None, false),
      (3L, 3000L, 2L, Some(3.0), true),
      (4L, 100000L, 2L, Some(195.0), true)))
  }

  test("rollingZscore: zero-variance window scores null, never anomalous") {
    val got = zscore(Seq((1L, ts(0), 5.0, 1L), (1L, ts(1), 5.0, 2L),
      (1L, ts(2), 7.0, 3L)))
    assert(got.last == ((3L, 7000L, 2L, None, false)))
  }

  test("rollingZscore: keys are scored independently") {
    // key 2's single event must not see key 1's history
    val got = zscore(Seq((1L, ts(0), 1.0, 1L), (1L, ts(1), 2.0, 2L),
      (2L, ts(2), 50.0, 3L)))
    assert(got.filter(_._1 == 3L) == Seq((3L, 50000L, 0L, None, false)))
  }

  test("ohlcBars: open/close by (ts, tie) order, high/low/count per bucket") {
    val df = Seq(
      // key A, hour 9: open=5 (earliest), close=2 (latest), high=9, low=1
      ("A", ts(9, 0), 5.0, 1L), ("A", ts(9, 10), 9.0, 2L),
      ("A", ts(9, 20), 1.0, 3L), ("A", ts(9, 30), 2.0, 4L),
      // key A, hour 10: single event — open=close=high=low
      ("A", ts(10, 0), 7.0, 5L),
      // key B, hour 9: duplicate ts — tie id decides open (id 6) and
      // close (id 7)
      ("B", ts(9, 0), 3.0, 6L), ("B", ts(9, 0), 4.0, 7L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.ohlcBars(df, "k", "t", "v", "id")
      .select("k", "h", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(got == Set(
      ("A", 9L, 5.0, 9.0, 1.0, 2.0, 4L),
      ("A", 10L, 7.0, 7.0, 7.0, 7.0, 1L),
      ("B", 9L, 3.0, 4.0, 3.0, 4.0, 2L)))
  }

  test("ewmaDyadic: hand-computed dyadic weights, short-history renorm") {
    val df = Seq(("u", ts(9), 1.0, 1L), ("u", ts(10), 2.0, 2L),
      ("u", ts(11), 4.0, 3L), ("u", ts(12), 8.0, 4L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.ewmaDyadic(df, "k", "t", "id", "v", lags = 2)
      .select("id", "ewma_scaled", "w_sum", "ewma_cents")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // weights 4,2,1 over cents 100,200,400,800
    assert(got == Seq(
      (1L, 400L, 4L, 100.0),             // 100·4 / 4
      (2L, 1000L, 6L, 166.666667),       // 200·4+100·2 / 6
      (3L, 2100L, 7L, 300.0),            // 400·4+200·2+100 / 7
      (4L, 4200L, 7L, 600.0)))           // 100 truncated out of the window
  }

  test("ewmaDyadic: keys smooth independently; null value yields null") {
    val df = Seq(("a", ts(9), Some(1.0), 1L), ("b", ts(9), Some(5.0), 2L),
      ("c", ts(9), None, 3L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.ewmaDyadic(df, "k", "t", "id", "v", lags = 2)
      .select("k", "ewma_scaled", "w_sum")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 400L, 4L), ("b", 2000L, 4L), ("c", 0L, 0L)))
    val nullRow = TimeSeries.ewmaDyadic(df, "k", "t", "id", "v", lags = 2)
      .where(col("k") === "c").select("ewma_cents").collect().head
    assert(nullRow.isNullAt(0)) // w_sum 0 → null estimate, never NaN
  }

  test("timeWeightedAvg: hand trapezoid over an irregular series") {
    // value 1.00 for 1h, then 3.00 for 3h: integral = (1+3)/2·3600
    //   + (3+3)/2·10800 = 7200 + 32400 ... in cents·sec, over 14400 s
    val df = Seq(("u", ts(0), 1.0, 1L), ("u", ts(1), 3.0, 2L),
      ("u", ts(4), 3.0, 3L))
      .toDF("k", "t", "v", "id")
    val got = TimeSeries.timeWeightedAvg(df, "k", "t", "id", "v")
      .as[(String, Long, Long, Double)].head()
    // area2 = (100+300)·3600 + (300+300)·10800 = 7_920_000;
    // twa = 7_920_000 / (2·14400) = 275 cents
    assert(got == (("u", 3L, 14400L, 275.0)))
  }

  test("timeWeightedAvg: constant series averages to its value; bursts don't over-weight") {
    val bursty = Seq.tabulate(10)(i => ("c", ts(0, i), 5.0, i.toLong)) :+
      (("c", ts(10), 5.0, 99L)) // 10 samples in 9 min, one 10h later
    val got = TimeSeries.timeWeightedAvg(bursty.toDF("k", "t", "v", "id"),
      "k", "t", "id", "v")
      .as[(String, Long, Long, Double)].head()
    assert(got._4 == 500.0) // plain mean would agree here; TWA must too
  }

  test("timeWeightedAvg: singleton key has no span → null; duplicate ts zero-width") {
    val df = Seq(("s", ts(3), 9.0, 1L),
      ("d", ts(1), 1.0, 1L), ("d", ts(1), 100.0, 2L), ("d", ts(2), 1.0, 3L))
      .toDF("k", "t", "v", "id")
    val rows = TimeSeries.timeWeightedAvg(df, "k", "t", "id", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("s").isNullAt(3)) // span 0 → null, not NaN/zero
    // duplicate-instant trapezoid has zero width: only the 100→1 segment
    // counts — area2 = (10000+100)·3600 = 36_360_000 over 2·3600
    assert(rows("d").getDouble(3) == 5050.0)
  }

  test("mergeIntervals: overlap, touch, gap, and key isolation") {
    import spark.implicits._
    val iv = Seq(
      ("u", 0L, 10L), ("u", 5L, 12L),  // overlap -> one island [0,12]
      ("u", 12L, 20L),                  // touching merges
      ("u", 25L, 30L),                  // gap -> new island
      ("v", 5L, 6L),                    // other key untouched
      ("u", 26L, 27L))                  // contained interval
      .toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("u", 0L, 20L, 3L), ("u", 25L, 30L, 2L),
      ("v", 5L, 6L, 1L)))
  }

  test("mergeIntervals: late short interval cannot split a long one") {
    import spark.implicits._
    // [0,100] then [10,20]: running MAX of ends (not lag(e)) must keep
    // the island open past the short interval
    val iv = Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 50L, 60L))
      .toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("u", 0L, 100L, 3L)))
  }

  test("latenessProfile: hand lateness, power-of-4 buckets, key isolation") {
    import spark.implicits._
    // arrival order 1..5 with event times 100, 50, 100, 30, 101 ms:
    // running max 100,100,100,100,101 → lateness 0, 50, 0, 70, 0
    val df = Seq(("u", 1L, 100L), ("u", 2L, 50L), ("u", 3L, 100L),
      ("u", 4L, 30L), ("u", 5L, 101L),
      ("v", 1L, 10L)) // second key: in-order, isolated
      .toDF("k", "seq", "ms")
      .withColumn("ts", expr("timestamp_millis(ms)"))
    val got = TimeSeries.latenessProfile(df, "k", "ts", "seq")
      .as[(String, Long, Long, Long)].collect().toSet
    // 50 → bitlen 6 → 4^2 = 16; 70 → bitlen 7 → 4^3 = 64
    assert(got == Set(("u", 0L, 3L, 0L), ("u", 16L, 1L, 50L),
      ("u", 64L, 1L, 70L), ("v", 0L, 1L, 0L)))
  }

  test("effectiveAreaDownsample: spike survives, flat run collapses") {
    // 12 points on a flat line except one spike at t=70; 2 buckets →
    // keep first, last, and per-bucket argmax — the spike MUST be kept
    val pts = (0L until 12L).map(i => ("u", i, i * 10L,
      if (i == 7L) 500L else 0L)).toDF("k", "id", "t", "v")
    val got = TimeSeries.effectiveAreaDownsample(pts, "k", "t", "v", "id",
      nOut = 2).as[(String, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(got.contains((0L, 0L)) && got.contains((110L, 0L)), "endpoints")
    assert(got.contains((70L, 500L)), "spike is the bucket-2 argmax")
    assert(got.size == 4, s"2 endpoints + 2 bucket picks, got $got")
  }

  test("effectiveAreaDownsample: short series pass through whole") {
    val pts = (0L until 5L).map(i => ("u", i, i * 10L, i))
      .toDF("k", "id", "t", "v")
    val got = TimeSeries.effectiveAreaDownsample(pts, "k", "t", "v", "id",
      nOut = 8)
    assert(got.count() == 5)
  }

  test("residualAnomalies: hand median/MAD, only the true outlier flags") {
    // residuals -3,-1,1,3,100: med2 = 2 (median 1); dev2 = 8,4,0,4,198;
    // mad4 = 8 (MAD 2); flag <=> 2*dev2 > 3*8 <=> dev2 > 12 -> only 100
    val dec = Seq(
      ("a", 0L, 5L, Some(-3L)), ("a", 1L, 5L, Some(-1L)),
      ("a", 2L, 5L, Some(1L)), ("a", 3L, 5L, Some(3L)),
      ("a", 4L, 5L, Some(100L)),
      ("a", 5L, 5L, Option.empty[Long])) // edge row: no residual, no row out
      .toDF("k", "hr", "v_cent", "resid_q")
    val got = TimeSeries.residualAnomalies(dec, "k", k = 3)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.size == 5, "null-residual rows are edge rows, not output")
    assert(got(0L) == ((2L, 8L, false)))
    assert(got(4L) == ((2L, 8L, true)))
    assert(got.count(_._2._3) == 1)
  }

  test("decayedEngagement: bit-shift halving ladder, horizon cut, clock-skew loud") {
    val day = 86400000L
    val now = 30L * day
    val ev = Seq(
      (7L, 30L * day, 1.0),       // d=0: weight 2^19
      (7L, 11L * day, 1.0),       // d=19: weight 1 (ladder's last rung)
      (7L, 5L * day, 1.0),        // d=25: beyond horizon, exactly 0
      (8L, 29L * day + 1L, 2.0))  // d=0 (partial day floors to 0)
      .toDF("u", "ms", "value")
      .withColumn("ts", expr("timestamp_millis(ms)"))
    val got = TimeSeries.decayedEngagement(ev, "u", "ts", "value",
        nowMs = now, horizonDays = 20)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(7L) == ((3L, 100L * ((1L << 19) + 1L))))
    assert(got(8L) == ((1L, 200L * (1L << 19))))
    // an event after nowMs is clock skew: loud, never a silent blow-up
    val e = intercept[Exception] {
      TimeSeries.decayedEngagement(
        Seq((1L, now + 1L, 1.0)).toDF("u", "ms", "value")
          .withColumn("ts", expr("timestamp_millis(ms)")),
        "u", "ts", "value", nowMs = now).collect()
    }
    assert(e.toString.contains("decayedEngagement") ||
      Option(e.getCause).exists(_.toString.contains("decayedEngagement")))
  }

  test("watermarkPlan: exact drop ppm per candidate delay, one pass") {
    // arrival order 1..4, event times 100 s, 50 s, 200 s, 90 s ->
    // lateness 0, 50 s, 0, 110 s
    val ev = Seq((7L, 1L, 100000L), (7L, 2L, 50000L), (7L, 3L, 200000L),
      (7L, 4L, 90000L))
      .toDF("u", "seq", "ms")
      .withColumn("ts", expr("timestamp_millis(ms)"))
    val got = TimeSeries.watermarkPlan(ev, "u", "ts", "seq",
        Seq(60000L, 0L, 60000L)) // dup + unsorted candidates normalize
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 2)
    // no watermark: both late events (50 s, 110 s) drop
    assert(got(0L) == ((4L, 2L, 500000L)))
    // 60 s watermark: only the 110 s-late event drops
    assert(got(60000L) == ((4L, 1L, 250000L)))
  }

  test("residualAnomalies: zero MAD degrades to any-deviation-flags") {
    // residuals 0,0,0,10: med2 = 0, mad4 = 0 -> only the 10 row flags
    val dec = Seq(("a", 0L, 1L, 0L), ("a", 1L, 1L, 0L),
      ("a", 2L, 1L, 0L), ("a", 3L, 1L, 10L))
      .toDF("k", "hr", "v_cent", "resid_q")
    val got = TimeSeries.residualAnomalies(dec, "k")
      .collect().map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(got == Map(0L -> false, 1L -> false, 2L -> false, 3L -> true))
  }

  private def acfFrame(rows: (String, Long, Double, Long)*) =
    rows.toSeq.toDF("k", "ts_ms", "v", "id")
      .select(col("k"), timestamp_millis(col("ts_ms")).as("ts"),
        col("v"), col("id"))

  test("autocorrelation: hand ACF on an alternating series") {
    import spark.implicits._
    // c = [1,2,1,2] cents → e = 4c−6 = [−2,2,−2,2], den = 16
    // lag1 Σ = −12 → −750000; lag2 Σ = 8 → 500000; lag3 Σ = −4 → −250000
    val got = TimeSeries.autocorrelation(
        acfFrame(("a", 1000L, 0.01, 1L), ("a", 2000L, 0.02, 2L),
          ("a", 3000L, 0.01, 3L), ("a", 4000L, 0.02, 4L)),
        "k", "ts", "v", "id", maxLag = 3)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r._4).toMap
    assert(got == Map(1L -> Some(-750000L), 2L -> Some(500000L),
      3L -> Some(-250000L)))
  }

  test("autocorrelation: zero variance emits null r, short keys drop lags") {
    import spark.implicits._
    // constant series of 3 → den = 0 → null r; n = 3 ⇒ lag 3 has no row
    val got = TimeSeries.autocorrelation(
        acfFrame(("a", 1L, 0.05, 1L), ("a", 2L, 0.05, 2L),
          ("a", 3L, 0.05, 3L)),
        "k", "ts", "v", "id", maxLag = 3)
      .as[(String, Long, Long, Option[Long])].collect()
    assert(got.map(_._2).toSet == Set(1L, 2L), "lag 3 must be absent at n=3")
    assert(got.forall(_._4.isEmpty), "zero variance must yield null r")
  }

  test("autocorrelation: same-ts rows order by id (deterministic)") {
    import spark.implicits._
    // two orderings of the same values at one shared ts flip the sign
    // of the lag-1 term; the id tiebreak pins which one is computed
    val got = TimeSeries.autocorrelation(
        acfFrame(("a", 1000L, 0.01, 2L), ("a", 1000L, 0.02, 1L),
          ("a", 2000L, 0.01, 3L), ("a", 2000L, 0.02, 4L)),
        "k", "ts", "v", "id", maxLag = 1)
      .as[(String, Long, Long, Option[Long])].collect()
    // id order: (1)=2c,(2)=1c,(3)=1c,(4)=2c → e = [2,−2,−2,2]
    // lag1 Σ = −4 + 4 − 4 = −4 → (1e6·−4) div 16 = −250000
    assert(got.head._4.contains(-250000L))
  }

  test("partialAutocorrelation: hand Durbin-Levinson on the alternating series") {
    import spark.implicits._
    // ACF (proved above): r = [−750000, 500000, −250000]. By hand:
    // φ22 = ((5e11 − 5.625e11)·1e6) div 4.375e11 = −142857
    // φ21 = −750000 − (−142857·−750000 div 1e6 = 107142) = −857142
    // φ33 num = −250000 − (−428571) − 107142 = 71429
    // φ33 den = 1e6 − 642856 − (−71428) = 428572 → φ33 = 166667
    val got = TimeSeries.partialAutocorrelation(
        acfFrame(("a", 1000L, 0.01, 1L), ("a", 2000L, 0.02, 2L),
          ("a", 3000L, 0.01, 3L), ("a", 4000L, 0.02, 4L)),
        "k", "ts", "v", "id")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(got == (("a", 4L, Some(-750000L), Some(-142857L),
      Some(166667L))))
  }

  test("partialAutocorrelation: short series and zero variance go null") {
    import spark.implicits._
    // n = 3: r3 absent → pacf3 null; constant series: all null
    val got = TimeSeries.partialAutocorrelation(
        acfFrame(("a", 1L, 0.01, 1L), ("a", 2L, 0.03, 2L),
          ("a", 3L, 0.01, 3L),
          ("z", 1L, 0.05, 4L), ("z", 2L, 0.05, 5L), ("z", 3L, 0.05, 6L),
          ("z", 4L, 0.05, 7L)),
        "k", "ts", "v", "id")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a")._3.isDefined && got("a")._4.isDefined &&
      got("a")._5.isEmpty, "missing lag-3 ACF must null pacf3")
    assert(got("z")._3.isEmpty && got("z")._4.isEmpty &&
      got("z")._5.isEmpty, "zero variance must null the whole ladder")
  }

  test("autocorrelation: keys are independent") {
    import spark.implicits._
    val got = TimeSeries.autocorrelation(
        acfFrame(("a", 1L, 0.01, 1L), ("a", 2L, 0.02, 2L),
          ("b", 1L, 0.09, 3L), ("b", 2L, 0.01, 4L), ("b", 3L, 0.09, 5L)),
        "k", "ts", "v", "id", maxLag = 1)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("a" -> 2L, "b" -> 3L))
  }

  private def sen(rows: (String, Int, Double)*) =
    TimeSeries.theilSen(
      rows.map { case (k, h, v) => (k, ts(h), v) }.toDF("k", "t", "v"),
      "k", "t", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("theilSen: hand slopes, doubled-integer median, MK S") {
    // cents 100, 200, 400 at hours 0,1,2 → milli-cent y 1e5, 2e5, 4e5
    // slopes (µ/hour): 1e11, 1.5e11, 2e11 → median 1.5e11, doubled 3e11
    val got = sen(("a", 0, 1.00), ("a", 1, 2.00), ("a", 2, 4.00))
    assert(got("a") == (("a", 3L, 3L, 3L, 300000000000L)), s"$got")
  }

  test("theilSen: one wild hour cannot move the median slope") {
    // 1,2,3,4 then a 100-cent spike: 6 of 10 pair slopes are exactly
    // 1 cent/hour → median stays 1 (doubled micro-milli = 2e9)
    val got = sen(("k", 0, 0.01), ("k", 1, 0.02), ("k", 2, 0.03),
      ("k", 3, 0.04), ("k", 4, 1.00))
    assert(got("k")._5 == 2000000000L, s"$got")
    assert(got("k")._4 == 10L, "all pairs rise → S = 10")
  }

  private def lerp(rows: (String, String, Double, Long)*) =
    TimeSeries.interpolateAlign(
      rows.map { case (k, t, v, id) =>
        (k, java.sql.Timestamp.valueOf(t), v, id)
      }.toDF("k", "t", "v", "id"),
      "k", "t", "v", "id")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("interpolateAlign: exact integer lerp between the bracketing obs") {
    // obs at 00:30 (100¢) and 01:30 (300¢) → grid point 01:00 is the
    // midpoint: 200¢ = 200000 milli-cents
    val got = lerp(("a", "2024-01-01 00:30:00", 1.00, 1L),
      ("a", "2024-01-01 01:30:00", 3.00, 2L))
    val g = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    assert(got == Map(("a", g) -> 200000L), s"$got")
  }

  test("interpolateAlign: an observation exactly on the grid passes through") {
    val got = lerp(("a", "2024-01-01 01:00:00", 2.50, 1L),
      ("a", "2024-01-01 02:00:00", 7.50, 2L))
    val h1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    val h2 = java.sql.Timestamp.valueOf("2024-01-01 02:00:00").getTime
    assert(got(("a", h1)) == 250000L && got(("a", h2)) == 750000L)
  }

  test("interpolateAlign: truncating division is pinned (no rounding)") {
    // obs 0¢ at 00:00 and 1¢ at 03:00 → 01:00 = 1000/3 = 333 (trunc)
    val got = lerp(("a", "2024-01-01 00:00:00", 0.00, 1L),
      ("a", "2024-01-01 03:00:00", 0.01, 2L))
    val h1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    assert(got(("a", h1)) == 333L, s"$got")
  }

  test("interpolateAlign: no grid point before first or after last obs") {
    val got = lerp(("a", "2024-01-01 00:30:00", 1.0, 1L),
      ("a", "2024-01-01 00:45:00", 2.0, 2L))
    assert(got.isEmpty, "sub-hour span has no interior grid point")
  }

  test("theilSen: rows within an hour aggregate to a truncating mean") {
    // hour 0 holds 3¢ and 4¢ → (1000·7) div 2 = 3500 milli-cents;
    // hour 1 holds 5¢ → slope = (5000−3500)·1e6, doubled
    val got = sen(("k", 0, 0.03), ("k", 0, 0.04), ("k", 1, 0.05))
    assert(got("k") == (("k", 2L, 1L, 1L, 3000000000L)), s"$got")
  }

  test("crossCorrelation: shifted copy peaks exactly at its lag") {
    // x hourly counts [1,5,2,8,0]; y = x shifted +1 hour → [0,1,5,2,8]
    def rows(h: Int, n: Int, et: String) = (0 until n).map(i =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        h * 3600L + i)), et))
    val xs = Seq(0 -> 1, 1 -> 5, 2 -> 2, 3 -> 8).flatMap {
      case (h, n) => rows(h, n, "a") }
    val ys = Seq(1 -> 1, 2 -> 5, 3 -> 2, 4 -> 8).flatMap {
      case (h, n) => rows(h, n, "b") }
    val df = (xs ++ ys).toDF("ts", "et")
    val got = TimeSeries.crossCorrelation(df, "ts", "et", "a", "b",
        maxLag = 2)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, Some(1.0))), s"${got(1L)}")
    assert(got(0L)._2 == 5L && got(0L)._3.exists(_ < 1.0), s"${got(0L)}")
    assert(got.keySet == Set(-2L, -1L, 0L, 1L, 2L))
  }

  test("seasonalNaiveBacktest: hand MASE on a planted cycle") {
    // hourly counts [1,2,1,2,1,5]; period 2, test last 2 hours:
    // h4 err 0, h5 err 3; train naive errs 1,1,1 →
    // MASE = 1000·3·3 div (3·2) = 1500
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 1, 3 -> 2, 4 -> 1, 5 -> 5)
      .flatMap { case (h, n) => (0 until n).map(i =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          h * 3600L + i)), "a")) }
    val got = TimeSeries.seasonalNaiveBacktest(rows.toDF("ts", "et"),
        "ts", "et", period = 2, testHours = 2)
      .as[(String, Long, Long, Long, Long, Option[Long])].head()
    assert(got == (("a", 2L, 3L, 3L, 3L, Some(1500L))), s"$got")
  }

  test("interEventBurstiness: constant gaps -1, skewed gaps match hand") {
    def ev(k: String, ent: Long, secs: Long*) = secs.map(s =>
      (k, ent, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(s))))
    // g: gaps [10,10,10]s → var 0 → cv2 0, B = -1
    // p: gaps [10,30]s = [1e4,3e4] ms → cv2 = 1000·2·4e8 div 1.6e9
    //    = 500; σ = sqrt(2e8), μ = 2e4 → B = -0.171573
    val df = (ev("g", 1L, 0, 10, 20, 30) ++ ev("p", 1L, 0, 10, 40))
      .toDF("k", "ent", "ts")
    val got = TimeSeries.interEventBurstiness(df, "k", "ent", "ts")
      .as[(String, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 3L, 30000L, Some(0L), Some(-1.0))),
      s"${got("g")}")
    assert(got("p") == (("p", 2L, 40000L, Some(500L),
      Some(-0.171573))), s"${got("p")}")
  }

  test("pinballLoss: asymmetric under/over costs at two taus") {
    // counts [1,2,1,2,3,1]; period 2, test h4/h5:
    // h4 season 1, actual 3 → under by 2 (costs τ·2)
    // h5 season 2, actual 1 → over by 1 (costs (1e6−τ)·1)
    // τ=0.25: 500000+750000=1250000, mean 625 milli
    // τ=0.75: 1500000+250000=1750000, mean 875 milli
    val rows = Seq(0 -> 1, 1 -> 2, 2 -> 1, 3 -> 2, 4 -> 3, 5 -> 1)
      .flatMap { case (h, n) => (0 until n).map(i =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          h * 3600L + i)), "a")) }
    val got = TimeSeries.pinballLoss(rows.toDF("ts", "et"), "ts", "et",
        period = 2, testHours = 2, tausPpm = Seq(250000L, 750000L))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r).toMap
    assert(got(250000L) == (("a", 250000L, 2L, 1250000L, Some(625L))),
      s"${got(250000L)}")
    assert(got(750000L) == (("a", 750000L, 2L, 1750000L, Some(875L))),
      s"${got(750000L)}")
  }

  test("timeSeriesFolds: tiling test windows, leak-free by construction") {
    // 1 event per hour 0..9; 2 folds × 2 test hours: cuts at 6 and 8
    val rows = (0 until 10).map(h => Tuple1(java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(h * 3600L))))
    val got = TimeSeries.timeSeriesFolds(rows.toDF("ts"), "ts",
        nFolds = 2, testHours = 2)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 6L, 2L, Some(5L), Some(6L), true)),
      s"${got(1L)}")
    assert(got(2L) == ((2L, 8L, 8L, 2L, Some(7L), Some(8L), true)),
      s"${got(2L)}")
  }

  test("periodogram: planted 4-hour cosine dominates at its amplitude") {
    // counts [13,8,3,8]×4 = 8 + 5·cos(2πt/4): amp at p=4 is exactly
    // 5000 milli and dominant; orthogonal periods (2, 8) score 0
    val rows = (0 until 16).flatMap { t =>
      val c = Seq(13, 8, 3, 8)(t % 4)
      (0 until c).map(i => (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(t * 3600L + i)), "a"))
    }
    val got = TimeSeries.periodogram(rows.toDF("ts", "et"), "ts", "et",
        maxPeriod = 8)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(4L) == (("a", 4L, 16L, 5000L, true)), s"${got(4L)}")
    assert(got(2L)._4 == 0L && !got(2L)._5, s"${got(2L)}")
    assert(got(8L)._4 == 0L && !got(8L)._5, s"${got(8L)}")
  }
}
