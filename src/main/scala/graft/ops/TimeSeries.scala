package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify an irregular event stream onto a
  * fixed grid and carry observations forward — the resample step that
  * turns raw telemetry/metrics into the aligned matrix a training or
  * monitoring pipeline consumes.
  *
  * Spark-first shape: the grid is `sequence` + `explode` over each key's
  * [min, max] bucket span (narrow after one per-key min/max aggregate);
  * the fill is `last(_, ignoreNulls)` over an ordered per-key window —
  * one shuffle on the key, one sort, identical to the sessionization
  * window family. Grid arithmetic is integer bucket indices end-to-end
  * (µs → bucket via integer division), so engines agree exactly and no
  * timestamp-precision coupling leaks in.
  *
  * Scale: per-key grid length is (span / step), so the explode fan-out is
  * bounded by time span, not corpus size; a key with a multi-year span ×
  * tiny step is the skew case — cap it upstream (filter on span) the same
  * way the dedup family caps hot buckets.
  */
object TimeSeries {

  /** Densify + forward-fill. One output row per (key, bucket) for every
    * `stepMs` bucket between the key's first and last observation:
    * `bucket_ms` (bucket start epoch-ms), `v` (the bucket's own last
    * observation by `orderCol`, if any), `filled` (v carried forward),
    * `is_gap` (no observation in this bucket). Rows with a null key or
    * timestamp are dropped (grid semantics are per-key).
    */
  def gapFillForwardFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, orderCol: String, stepMs: Long): DataFrame = {
    // integer division (`div`, not `/` which is double) — exact bucket
    // indices on both engines; timestamps here are post-epoch so floor
    // vs truncate never diverges
    val bucket = expr(s"unix_micros(`$tsCol`) div ${stepMs * 1000L}")
    val obs = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), bucket.as("b"),
        col(valueCol).as("v"), col(orderCol).as("o"))
      .groupBy("k", "b").agg(max_by(col("v"), col("o")).as("v"))
      // feeds both the span aggregate and the grid join — materialize
      // the bucket rollup once instead of re-scanning + re-shuffling
      // the raw events for each consumer (≙ the staged hourly table a
      // production pipeline would persist)
      .localCheckpoint()
    val span = obs.groupBy("k")
      .agg(min("b").as("b0"), max("b").as("b1"))
    val grid = span.select(col("k"),
      explode(sequence(col("b0"), col("b1"))).as("b"))
    val w = Window.partitionBy("k").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("k", "b"), "left")
      .select(col("k").as(keyCol), (col("b") * stepMs).as("bucket_ms"),
        col("v"),
        last("v", ignoreNulls = true).over(w).as("filled"),
        col("v").isNull.as("is_gap"))
  }

  /** Rolling z-score anomaly detection: each observation scored against
    * the `nPrev` observations strictly before it (ROWS frame, current
    * row excluded — the score never sees the value it judges). Returns
    * one row per non-null (key, ts, value) observation: the millisecond
    * timestamp, the exact milli-scaled value `v`, the trailing window's
    * size/sum, `z` (null until the trailing window is full or while its
    * variance is zero), and `is_anomaly` (|z| > `zThreshold`).
    *
    * Exact-integer core — the reproducibility trick this family uses
    * everywhere: values are scaled to integer millis first, so the
    * frame's sum and sum-of-squares are exact BIGINTs under any
    * accumulation order (sliding-frame subtraction, segment trees,
    * sequential — all equal). The z-score then comes from two exact
    * integers through one division and one sqrt:
    * `z = (v·cnt − s) / sqrt(cnt·ss − s²)` — algebraically identical to
    * `(v − mean) / stddev_pop`, but with no intermediate float state, so
    * engines agree bit-for-bit before the 6 d.p. round.
    *
    * Plan: one exchange on the key + one sort shared by all three frame
    * aggregates — the q07/q09 rolling-window shape; scales with the
    * per-key stream like the rest of the window family.
    */
  def rollingZscore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, orderCol: String, nPrev: Int = 10,
      zThreshold: Double = 3.0): DataFrame = {
    require(nPrev >= 2, "nPrev must be >= 2")
    val base = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), col(orderCol).as("o"),
        expr(s"unix_micros(`$tsCol`)").as("us"),
        round(col(valueCol) * 1000).cast("long").as("v"))
    val w = Window.partitionBy("k").orderBy(col("us"), col("o"))
      .rowsBetween(-nPrev, -1)
    val scored = base.select(col("k").as(keyCol), col("o").as(orderCol),
      expr("us div 1000").as("ts_ms"), col("v"),
      count(col("v")).over(w).as("w_cnt"),
      sum(col("v")).over(w).as("w_sum"),
      sum(col("v") * col("v")).over(w).as("w_sumsq"))
    val num = col("w_cnt") * col("w_sumsq") - col("w_sum") * col("w_sum")
    val z = when(col("w_cnt") === nPrev && num > 0,
      round((col("v") * col("w_cnt") - col("w_sum")).cast("double") /
        sqrt(num.cast("double")), 6))
    scored.select(col(keyCol), col(orderCol), col("ts_ms"), col("v"),
      col("w_cnt"), col("w_sum"), z.as("z"),
      coalesce(abs(z) > zThreshold, lit(false)).as("is_anomaly"))
  }

  /** OHLC downsampling: per (key, hour-bucket) open/high/low/close bars —
    * the time-series compaction step (candles, telemetry rollups).
    *
    * Open/close are `min_by`/`max_by` over `struct(ts, tie)` — a fully
    * partial-aggregable argmin (each map task combines to one candidate
    * per group before the shuffle), so this is ONE map-side-combined
    * aggregation with no window sort; `tie` must be unique within a
    * bucket (an event id) to make ties deterministic. Bucket surfaces as
    * q01's integer (y, m, d, h) parts — the proven cross-engine shape.
    */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    df.groupBy(col(keyCol).as("k"),
        year(col(tsCol)).cast("long").as("y"),
        month(col(tsCol)).cast("long").as("m"),
        dayofmonth(col(tsCol)).cast("long").as("d"),
        hour(col(tsCol)).cast("long").as("h"))
      .agg(
        min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Exponentially weighted moving average with α = 1/2, truncated at
    * `lags` preceding observations — the standard smoother for drift
    * monitors and anomaly baselines, made bit-exact: dyadic weights
    * 2^(lags−k) over cent-integer values keep the weighted sum a pure
    * BIGINT (`ewma_scaled`), the weight mass actually present is summed
    * in the same integer space (`w_sum` — early rows have shorter
    * histories, the standard renormalizing form), and the only float is
    * ONE final division `round(scaled / w_sum, 6)`. Truncating at
    * `lags` loses at most 2^(−lags) of the weight mass (< 10⁻⁶ at the
    * default 20) — the price of an exactly-reproducible window instead
    * of an unboundedly recursive state.
    *
    * Scale shape: one exchange on the key and ONE per-key sort shared by
    * all `lags`+1 `lag` frames (Catalyst collapses same-spec window
    * functions into a single Window node); no state store, no self-join,
    * no recursion — the W1–W4 rolling-family plan exactly.
    */
  def ewmaDyadic(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, lags: Int = 20): DataFrame = {
    require(lags >= 1 && lags <= 40, s"lags must be in [1, 40], got $lags")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
    val cents = round(col(valueCol).cast("double") * 100).cast("long")
    val terms = (0 to lags).map { k =>
      val weight = 1L << (lags - k)
      val x = lag(cents, k).over(w)
      (coalesce(x * weight, lit(0L)), when(x.isNotNull, weight).otherwise(0L))
    }
    df.select(col(keyCol).as("k"), col(tieCol).as("id"),
        unix_micros(col(tsCol)).as("ts_us"),
        terms.map(_._1).reduce(_ + _).as("ewma_scaled"),
        terms.map(_._2).reduce(_ + _).as("w_sum"))
      .withColumn("ewma_cents",
        when(col("w_sum") > 0, // all-null history ⇒ no estimate, not NaN
          round(col("ewma_scaled").cast("double") / col("w_sum").cast("double"), 6)))
  }

  /** Time-weighted average per key — trapezoidal integration of an
    * irregularly sampled metric over its observation span, the correct
    * "average value" when sampling is event-driven (a plain mean
    * over-weights bursts; the reference's hourly means sidestep rather
    * than solve this). Piecewise-linear model between consecutive
    * observations: Σ (vᵢ + vᵢ₊₁)(tᵢ₊₁ − tᵢ) over 2·(t_n − t₁).
    *
    * Exactness: timestamps flatten to whole seconds (integer division of
    * µs), values to cents, and the DOUBLED trapezoid areas sum as exact
    * BIGINTs — the single float is the final division, 6-d.p.-rounded.
    * Duplicate timestamps contribute zero-width trapezoids (order inside
    * the instant is pinned by the tie column but cannot affect the sum).
    * Single-observation keys have no span — `twa_cents` null.
    *
    * Scale shape: one exchange on the key, ONE per-key sort shared by
    * the `lag` carries, then a map-side-combinable aggregate. Same plan
    * family as W1/W2 sessionization.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"),
      expr(s"unix_micros(`$tsCol`) div 1000000").as("tsec"),
      col(tieCol).as("tie"),
      round(col(valueCol).cast("double") * 100).cast("long").as("c"))
    val w = Window.partitionBy(col("k")).orderBy(col("tsec"), col("tie"))
    base
      .withColumn("pt", lag(col("tsec"), 1).over(w))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .groupBy("k")
      .agg(count(lit(1)).as("n"),
        (max("tsec") - min("tsec")).as("span_s"),
        sum(when(col("pt").isNotNull,
          (col("c") + col("pc")) * (col("tsec") - col("pt")))
          .otherwise(0L)).as("area2"))
      .select(col("k").as(keyCol), col("n"), col("span_s"),
        when(col("span_s") > 0,
          round(col("area2").cast("double")
            / (col("span_s") * 2).cast("double"), 6)).as("twa_cents"))
  }

  /** Merge overlapping/touching intervals per key into maximal "islands"
    * — the interval-algebra staple (session coverage, maintenance
    * windows, SLA uptime) that plain windowed aggregation can't
    * express: total covered time must NOT double-count overlaps.
    * Half-open-agnostic rule: a new island starts exactly when an
    * interval's start exceeds the running MAX of all previous ends
    * (strictly after — touching intervals [a,b],[b,c] merge). Returns
    * one row per island: `(key, island_start, island_end, n_intervals)`
    * with everything in the caller's integer time unit.
    *
    * Plan: ONE per-key sort carries all three window steps (running
    * max, island flag, island id by running sum) — a single exchange on
    * the key, no join; islands then aggregate map-side. Zero- or
    * negative-length intervals participate like any other (their end
    * may simply never advance the running max).
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.where(col(keyCol).isNotNull && col(startCol).isNotNull
        && col(endCol).isNotNull)
      .select(col(keyCol).as("k"), col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .withColumn("new_island",
        when(prevMax.isNull || col("s") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("island"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col("k").as(keyCol), col("island_start"), col("island_end"),
        col("n_intervals"))
  }

  /** Visual-fidelity downsampling by largest effective area (the
    * parallelizable sibling of LTTB, a.k.a. largest-triangle-one-bucket):
    * each interior point's importance is twice the area of the triangle
    * it forms with its immediate neighbors — computed from lag/lead in
    * EXACT BIGINT cross products (ms × milli units, |Δx·Δy| ≤ ~1e14, far
    * inside long range) — and each of `nOut` per-series index buckets
    * keeps its highest-area point (area desc, position asc tiebreak).
    * First and last points are always kept, so the envelope is anchored.
    * Series with ≤ nOut + 2 points pass through whole.
    *
    * Why not exact LTTB: its bucket choice depends on the PREVIOUS
    * bucket's selected point — an inherently sequential chain per series.
    * The fixed-neighbor variant drops that dependency, making the whole
    * operator two window passes over the (key, ts) partitioning — no
    * driver loop, no per-series recursion, same O(n) work distributed.
    *
    * `tsCol` epoch-ms and `valCol` integer (milli) columns; `ordCol`
    * breaks same-timestamp ties to pin a total order.
    */
  def effectiveAreaDownsample(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, ordCol: String, nOut: Int): DataFrame = {
    require(nOut >= 1, "nOut must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col("x"), col(ordCol))
    val pts = df.select(col(keyCol), col(tsCol).cast("long").as("x"),
        col(valCol).cast("long").as("y"), col(ordCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .withColumn("xp", lag(col("x"), 1).over(w))
      .withColumn("yp", lag(col("y"), 1).over(w))
      .withColumn("xn", lead(col("x"), 1).over(w))
      .withColumn("yn", lead(col("y"), 1).over(w))
      .withColumn("area2", abs((col("x") - col("xp")) * (col("yn") - col("yp"))
        - (col("xn") - col("xp")) * (col("y") - col("yp"))))
      // endpoints get a NULL bucket: they are kept unconditionally and
      // must not compete in (or shift, via div-vs-floor negative
      // rounding) the first/last real bucket
      .withColumn("bucket",
        when(col("rn") === 1 || col("rn") === col("n"), lit(null))
          .otherwise(expr(s"((rn - 2) * $nOut) div greatest(n - 2, 1)")))
    val wb = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col("area2").desc, col("rn"))
    pts.withColumn("pick", row_number().over(wb))
      .where(col("n") <= nOut + 2 || col("rn") === 1 || col("rn") === col("n")
        || col("pick") === 1)
      .select(col(keyCol), col("x").as(tsCol), col("y").as(valCol))
  }

  /** OUT-OF-ORDER / LATENESS profile — the diagnostic a streaming
    * pipeline tunes its watermark with: replay events per key in
    * ARRIVAL order (`seqCol` — ingestion sequence, offset, or file
    * position), track the running max event time, and measure how far
    * behind it each event arrives. Emits one row per key and lateness
    * bucket (power-of-4 ms buckets: 0, [1,4), [4,16), … — `bucket` =
    * the bucket's lower bound, pure integer log) with the count and
    * the max observed lateness; the caller reads "what watermark
    * covers 99% of my keys' traffic" straight off the histogram.
    * All epoch-ms integer algebra; one per-key sort (the W1/W2 window
    * shape), then a map-side-combinable aggregate.
    */
  /** Classical additive seasonal decomposition (STL-lite) of a per-key
    * hourly series: `value = trend + seasonal + residual` — the
    * monitoring primitive behind "is this spike load growth, the daily
    * cycle, or an anomaly?". Trend is the standard centered 2×period
    * moving average for an even period (half-weight endpoints), the
    * seasonal component is the per-(key, phase) mean of the detrended
    * series, and the residual is what neither explains.
    *
    * ENTIRELY integer, in Q = 2·period·cent units: the half-weight MA
    * `(v₋ₕ + 2Σ + vₕ)/2p` is the sum of TWO plain window sums
    * (rows −h..h−1 and −h+1..h) so no fractional weight exists;
    * `trend_q = s1+s2`, `detrended_q = 2p·v − trend_q` exact BIGINTs;
    * the seasonal mean is a TRUNCATING integer division (`div` ≡
    * DuckDB's probed integer `//`). Trend (hence detrended/residual)
    * is null at series edges where either window is short — never a
    * partial-window fake. Gaps: the series is decomposed over OBSERVED
    * hours in sequence; gap-fill first ([[gapFillForwardFill]]) when
    * calendar alignment matters.
    *
    * Plan: one map-side-combined hourly aggregate, then every window —
    * the two MA sums and the (key, phase) seasonal mean — runs on the
    * HOURLY frame (hours-per-key-bounded, not row-count; the ksDrift
    * discipline). Raw rows are touched exactly once.
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, period: Int = 24): DataFrame = {
    require(period >= 2 && period % 2 == 0, "even period, e.g. 24 hours")
    val half = period / 2
    val hourly = df.where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("k"),
        unix_millis(col(tsCol).cast("timestamp")).as("ts_ms"),
        round(col(valueCol) * 100).cast("long").as("cv"))
      .withColumn("hr", expr("ts_ms div 3600000"))
      .groupBy("k", "hr").agg(sum("cv").as("v"))
    val wA = Window.partitionBy("k").orderBy("hr")
      .rowsBetween(-half, half - 1)
    val wB = Window.partitionBy("k").orderBy("hr")
      .rowsBetween(-half + 1, half)
    val full = col("n1") === period && col("n2") === period
    val wP = Window.partitionBy("k", "ph")
    hourly
      .withColumn("s1", sum("v").over(wA))
      .withColumn("n1", count(lit(1)).over(wA))
      .withColumn("s2", sum("v").over(wB))
      .withColumn("n2", count(lit(1)).over(wB))
      .withColumn("trend_q", when(full, col("s1") + col("s2")))
      .withColumn("detr_q",
        when(full, lit(2L * period) * col("v") - col("s1") - col("s2")))
      .withColumn("ph", pmod(col("hr"), lit(period.toLong)))
      .withColumn("sd", sum("detr_q").over(wP))
      .withColumn("nd", count(col("detr_q")).over(wP))
      .select(col("k").as(keyCol), col("hr"), col("v").as("v_cent"),
        col("trend_q"),
        when(col("nd") > 0, expr("sd div nd")).as("seasonal_q"),
        when(col("detr_q").isNotNull && col("nd") > 0,
          col("detr_q") - expr("sd div nd")).as("resid_q"))
  }

  /** Robust anomaly gate over [[seasonalDecompose]] residuals — the
    * monitoring verb a metrics pipeline runs after de-trending: a row
    * is anomalous when its residual deviates from the per-key residual
    * MEDIAN by more than `k` MADs. All order statistics come from the
    * DISTINCT-residual cumulative frame (the q232 discipline — a
    * data-sized series never sorts), and the whole chain stays in
    * exact integers: doubled median (`med2`), quadrupled MAD (`mad4`),
    * flag ⇔ `2·|2·resid − med2| > k·mad4`. A zero MAD (≥ half the
    * residuals equal the median) degrades to "any deviation flags" —
    * the standard MAD edge, surfaced by the exact algebra instead of
    * hidden by an epsilon.
    */
  def residualAnomalies(decomposed: DataFrame, keyCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val r = decomposed.where(col("resid_q").isNotNull)
      .select(col(keyCol).as("g"), col("hr"), col("v_cent"), col("resid_q"))
    // doubled median (lower + upper order statistic) from the
    // distinct-value cumulative counts — value-cardinality windows only
    def med2Of(df: DataFrame, valCol: String): DataFrame = {
      val vals = df.groupBy(col("g"), col(valCol).as("x"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("g").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = vals.withColumn("cc", sum("c").over(w))
      val n = vals.groupBy("g").agg(sum("c").as("n"))
      cum.join(n, Seq("g"))
        .groupBy("g")
        .agg(
          max(when(col("cc") - col("c") < expr("(n + 1) div 2") &&
            col("cc") >= expr("(n + 1) div 2"), col("x"))).as("xlo"),
          max(when(col("cc") - col("c") < expr("n div 2 + 1") &&
            col("cc") >= expr("n div 2 + 1"), col("x"))).as("xhi"))
        .select(col("g"), (col("xlo") + col("xhi")).as("m2"))
    }
    val med = med2Of(r, "resid_q")
    val dev = r.join(med, Seq("g"))
      .withColumn("dev2", abs(lit(2L) * col("resid_q") - col("m2")))
    val mad = med2Of(dev.select(col("g"), col("dev2")), "dev2")
      .withColumnRenamed("m2", "mad4")
    dev.join(mad, Seq("g"))
      .select(col("g").as(keyCol), col("hr"), col("v_cent"),
        col("resid_q"), col("m2").as("med2_q"), col("mad4").as("mad4_q"),
        (lit(2L) * col("dev2") > lit(k.toLong) * col("mad4"))
          .as("is_anomaly"))
  }

  /** Exact time-decayed engagement score — recency weighting with a
    * one-day half-life WITHOUT a single float: age in whole days,
    * weight `2^(horizon − age)` as a pure BIT SHIFT (binary powers are
    * the one decay family exact integers can carry), contributions
    * beyond the horizon exactly 0. `score_q = Σ cent·2^(H−1−d)` — the
    * halving ladder ends at weight 1 on the horizon's last day; Q
    * units of `2^(H−1)`, one grouped aggregate, map-side combinable.
    * An event AFTER `nowMs` is clock skew that would explode the
    * weight — it fails by name, never a silent × 2^{big}.
    */
  def decayedEngagement(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, nowMs: Long, horizonDays: Int = 20): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 40,
      "horizonDays in [1, 40] (shift-exact range)")
    val rows = df
      .where(col(groupCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        round(col(valueCol) * 100).cast("long").as("cent"),
        expr(s"${nowMs}L - unix_millis(cast(${tsCol} as timestamp))")
          .as("age_ms"))
      // guard the RAW ms age: truncating `div` maps -1 ms to day 0, so
      // a day-level check would silently full-weight sub-day skew
      .withColumn("age_ms", when(col("age_ms") < 0, expr(
        "raise_error('decayedEngagement: event after nowMs (clock skew)')"))
        .otherwise(col("age_ms")))
      .withColumn("d", expr("age_ms div 86400000"))
    rows
      .withColumn("w", when(col("d") < horizonDays,
        expr(s"shiftleft(cast(1 as bigint), " +
          s"cast($horizonDays - 1 - d as int))"))
        .otherwise(lit(0L)))
      .groupBy(col("g").as(groupCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cent") * col("w")).as("score_q"))
  }

  /** Watermark planner — turns [[latenessProfile]]'s diagnostic into
    * the DECISION table: for each candidate watermark delay, how many
    * events would arrive too late and be dropped. Lateness is replayed
    * per key in arrival order (running max event-time − event-time),
    * then every candidate is ONE conditional sum in a single global
    * aggregate — the whole plan is one window + one pass, however many
    * candidates are probed. Emits `(delay_ms, n_events, n_late,
    * drop_ppm)` sorted by the caller; `drop_ppm` is exact floored ppm.
    */
  def watermarkPlan(df: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, delaysMs: Seq[Long]): DataFrame = {
    require(delaysMs.nonEmpty && delaysMs.forall(_ >= 0),
      "delaysMs must be non-empty, non-negative")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(seqCol).isNotNull)
      .select(col(keyCol), col(seqCol),
        unix_millis(col(tsCol).cast("timestamp")).as("ts_ms"))
      .withColumn("late_ms", max("ts_ms").over(w) - col("ts_ms"))
    val aggs = delaysMs.distinct.sorted.zipWithIndex.map { case (d, i) =>
      struct(lit(d).as("delay_ms"), count(lit(1)).as("n_events"),
        sum(when(col("late_ms") > d, 1L).otherwise(0L)).as("n_late"))
        .as(s"_d$i")
    }
    late.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(
        delaysMs.distinct.sorted.indices.map(i => col(s"_d$i")): _*)).as("r"))
      .select(col("r.delay_ms"), col("r.n_events"), col("r.n_late"),
        when(col("r.n_events") === 0, lit(null).cast("long"))
          .otherwise(expr("(1000000 * r.n_late) div r.n_events"))
          .as("drop_ppm"))
  }

  def latenessProfile(df: DataFrame, keyCol: String, tsCol: String,
      seqCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(seqCol).isNotNull)
      .select(col(keyCol), col(seqCol),
        unix_millis(col(tsCol).cast("timestamp")).as("ts_ms"))
      .withColumn("late_ms", max("ts_ms").over(w) - col("ts_ms"))
      // power-of-4 buckets via integer bit length: 0 → 0; else lower
      // bound 4^floor(log₄ late) as a pure BIT SHIFT — no libm pow in
      // the bucket id (both engines render bin() minimally, the
      // hllRegisters trick)
      .withColumn("bucket",
        when(col("late_ms") === 0, lit(0L)).otherwise(
          expr("shiftleft(CAST(1 AS BIGINT), " +
            "CAST(2 * ((length(bin(late_ms)) - 1) div 2) AS INT))")))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("n"), max("late_ms").as("max_late_ms"))
  }

  /** Per-key autocorrelation function at lags 1..`maxLag` — the
    * seasonality/persistence diagnostic that decides window sizes and
    * decay constants (a daily cycle shows as a peak at the daily lag;
    * white noise hovers near 0). Exact end to end: values pinned to
    * cents, centering multiplied through (`e_t = n·c_t − Σc`, an
    * integer — no rational mean ever materializes), so
    * `r_k = Σ e_t·e_{t+k} / Σ e_t²` is a ratio of exact integers,
    * emitted as one truncating ppm division. Products of two `n·c`
    * terms summed over a key overflow Long around n·c ~ 3e9, so the
    * sums widen to decimal(38) (the [[Analytics.spearmanCorr]]
    * discipline; DuckDB's HUGEINT mirrors it).
    *
    * Shape: one per-key (ts, id)-ordered window evaluating all
    * `maxLag` lags in a single pass (one shuffle + one sort), one
    * grouped aggregate, then a maxLag-row explode of the bounded
    * per-key summary. Zero-variance keys emit null r; a lag with no
    * pairs (n ≤ lag) emits no row, never a fake 0.
    */
  def autocorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, idCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = "decimal(38,0)"
    val base = df
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol).as("g"),
        round(col(valCol) * 100).cast("long").as("c"),
        col(tsCol), col(idCol))
    val st = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("c").cast(dec)).as("s"))
    val w = Window.partitionBy("g").orderBy(col(tsCol), col(idCol))
    val centered = base.join(st, "g")
      .withColumn("e", (col("n").cast(dec) * col("c") - col("s")).cast(dec))
    val lagged = (1 to maxLag).foldLeft(centered) { (d, k) =>
      d.withColumn(s"e$k", lag(col("e"), k).over(w))
    }
    val aggs = sum((col("e") * col("e")).cast(dec)).as("den") +:
      (1 to maxLag).map(k =>
        sum((col("e") * col(s"e$k")).cast(dec)).as(s"num$k"))
    val sums = lagged.groupBy("g").agg(max(col("n")).as("n"), aggs: _*)
    val perLag = (1 to maxLag).map(k =>
      sums.where(col("n") > k)
        .select(col("g"), lit(k.toLong).as("lag"), col("n"),
          when(col("den") > 0,
            expr(s"(cast(1000000 as $dec) * num$k) div den")).as("r_ppm")))
    perLag.reduce(_.unionByName(_))
      .select(col("g").as(keyCol), col("lag"), col("n"), col("r_ppm"))
  }

  /** Per-key PARTIAL autocorrelation at lags 1..3 — the AR-order
    * diagnostic [[autocorrelation]] cannot give (ACF of an AR(1) decays
    * over every lag; PACF cuts off sharply after the true order, which
    * is what picks the model). Durbin–Levinson unrolled in closed form
    * over the ppm ACF values, every step ONE truncating integer
    * division in a PINNED order (both engines truncate toward zero —
    * verified semantics, the featurePropagate lesson):
    * `φ11 = r1`, `φ22 = (r2·10⁶ − r1²)·10⁶ div (10¹² − r1²)`,
    * `φ21 = r1 − φ22·r1 div 10⁶`, and φ33 from the level-3 recursion
    * with its numerator/denominator each a chain of `div 10⁶` products.
    * A zero denominator (|r1| = 1, degenerate) yields null, as does any
    * missing ACF lag (short series) or zero-variance key — never a
    * fake 0.
    *
    * Cost on top of the ACF pass: one groups-sized pivot aggregate and
    * pure per-row arithmetic — nothing data-sized is added.
    */
  def partialAutocorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, idCol: String): DataFrame = {
    val acf = autocorrelation(df, keyCol, tsCol, valCol, idCol, maxLag = 3)
    acf.groupBy(col(keyCol))
      .agg(max("n").as("n"),
        max(when(col("lag") === 1, col("r_ppm"))).as("r1"),
        max(when(col("lag") === 2, col("r_ppm"))).as("r2"),
        max(when(col("lag") === 3, col("r_ppm"))).as("r3"))
      .withColumn("pacf1_ppm", col("r1"))
      .withColumn("pacf2_ppm", expr(
        """CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
                AND 1000000000000 - r1 * r1 <> 0
           THEN ((r2 * 1000000 - r1 * r1) * 1000000)
                div (1000000000000 - r1 * r1) END"""))
      .withColumn("_phi21",
        expr("r1 - (pacf2_ppm * r1) div 1000000"))
      .withColumn("pacf3_ppm", expr(
        """CASE WHEN r3 IS NOT NULL AND pacf2_ppm IS NOT NULL
                AND 1000000 - (_phi21 * r1) div 1000000
                  - (pacf2_ppm * r2) div 1000000 <> 0
           THEN ((r3 - (_phi21 * r2) div 1000000
                  - (pacf2_ppm * r1) div 1000000) * 1000000)
                div (1000000 - (_phi21 * r1) div 1000000
                  - (pacf2_ppm * r2) div 1000000) END"""))
      .select(col(keyCol), col("n"), col("pacf1_ppm"), col("pacf2_ppm"),
        col("pacf3_ppm"))
  }

  /** Theil–Sen robust trend + Mann–Kendall S per key, over the HOURLY
    * aggregate lattice — the outlier-immune complement to the OLS trend
    * (one wild hour cannot move a median-of-slopes the way it moves a
    * least-squares fit). The raw stream is first reduced to per-(key,
    * hour) sums — the only data-sized pass, one map-side-combinable
    * aggregate — and every pairwise statistic runs on the hour lattice,
    * whose size is fixed by the CALENDAR (720 h/month), not the data:
    * at 100 TB the pair join is the same ≤ 720²/2 rows per key it is
    * at sf0.001. Hourly means are truncating milli-cents
    * (`(1000·Σc) div n`, pinned in both engines); pair slopes are
    * truncating micro-milli-cents/hour; the median slope lives in
    * DOUBLED micro space (`percentile(2·s, 0.5)` — an even-n median
    * averages two integers, so 2× keeps it integer, the MAD-family
    * discipline). Mann–Kendall S = Σ sign(y₂ − y₁) rides the same pair
    * frame for free.
    */
  def theilSen(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    // `hourly` feeds THREE consumers (both pair-join sides + n_hours);
    // as three plan references each would re-run the data-sized
    // scan+aggregate (measured: 3 full events passes in q281's plan).
    // The lattice is keys × hours — CALENDAR-bounded, never data-sized —
    // so a LAZY localCheckpoint is the scale-safe materialize-once: all
    // references share one RDD, computed once inside the consuming
    // action, with no extra barrier job (round-15).
    // EAGER checkpoint with the row count observed during its own job
    // (round-16, the starForest discipline): the count below GATES the
    // broadcast hint, so it must exist before the pair join is planned.
    // Costs one barrier job over the lazy form; the frame is calendar ×
    // keys — materialized once either way.
    val obs = org.apache.spark.sql.Observation()
    val hourly = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull)
      .groupBy(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) div 3600000000").as("h"))
      .agg(sum(round(col(valCol) * 100).cast("long")).as("sc"),
        count(lit(1)).as("cn"))
      .select(col("k"), col("h"),
        expr(s"(cast(1000 as $dec) * sc) div cn").cast("long").as("y"))
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val latticeRows = obs.get("n").asInstanceOf[Long]
    // EXPLICIT spread of the pair-generation side + pinned broadcast of
    // the other (round-15): the lattice is tiny in BYTES, so left to AQE
    // the ≤720²/2-per-key pair fan-out and its percentile partials run
    // in one task; the pinned partition count (scale-parameterised, the
    // negativeSample discipline) keeps the coalescer off, and the
    // broadcast pin stops a sort-merge join from re-keying the spread
    // side onto the handful of distinct keys. The broadcast is GATED on
    // the observed lattice size (round-16 ADVICE): per-key rows are
    // calendar-bounded (≤720/month) but total rows scale with distinct
    // keyCol cardinality, so past ~4M rows the hint comes off and the
    // optimizer degrades gracefully to a shuffle join instead of
    // hitting the 8 GB broadcast cap / OOMing the driver.
    val shufflePartitions = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val a = hourly.select(col("k"), col("h").as("h1"), col("y").as("y1"))
      .repartition(shufflePartitions)
    val bRaw = hourly.select(col("k").as("kb"), col("h").as("h2"),
      col("y").as("y2"))
    val b = if (latticeRows <= 4000000L) broadcast(bRaw) else bRaw
    val pairs = a.join(b, col("k") === col("kb") && col("h1") < col("h2"))
      .select(col("k"),
        expr(s"(cast(1000000 as $dec) * (y2 - y1)) div (h2 - h1)")
          .cast("long").as("slope"),
        signum((col("y2") - col("y1")).cast("double")).cast("long")
          .as("sgn"))
    val nHours = hourly.groupBy("k").agg(count(lit(1)).as("n_hours"))
    pairs.groupBy("k")
      .agg(count(lit(1)).as("n_pairs"), sum("sgn").as("mk_s"),
        percentile(col("slope") * 2, lit(0.5)).cast("long")
          .as("slope2_micro"))
      .join(nHours, "k")
      .select(col("k").as(keyCol), col("n_hours"), col("n_pairs"),
        col("mk_s"), col("slope2_micro"))
  }

  /** Linear-interpolation alignment of an irregular series onto the
    * hourly grid — the resampling step that precedes any cross-series
    * join of telemetry (two sensors never tick together; aligned
    * grids join on equality). The grid covers each key's own
    * [⌈first⌉, ⌊last⌋] hours, so every grid point has BOTH a previous
    * and next observation — no extrapolation policy to disagree on.
    * Interpolation is exact integer milli-cent algebra with ONE
    * truncating division (`1000·y₁ + ((y₂−y₁)·1000·(g−t₁)) div
    * (t₂−t₁)`, decimal(38) products), pinned identically in the
    * oracle. Plan: grid + events union-sorted ONCE per key; previous/
    * next observations ride two IGNORE-NULLS running-last windows over
    * the same exchange (opposite sort orders, same partitioning).
    * Grid size is calendar-bounded — never data-sized.
    */
  def interpolateAlign(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hourUs = 3600000000L
    val ev = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        round(col(valCol) * 100).cast("long").as("cv"),
        lit(false).as("is_grid"), col(idCol).cast("long").as("id"))
    val grid = ev.groupBy("k")
      .agg(min("us").as("mn"), max("us").as("mx"))
      .select(col("k"),
        expr(s"(mn + ${hourUs - 1}L) div ${hourUs}L * ${hourUs}L").as("g0"),
        expr(s"mx div ${hourUs}L * ${hourUs}L").as("g1"))
      .where(col("g0") <= col("g1"))
      .select(col("k"),
        explode(expr(s"sequence(g0, g1, ${hourUs}L)")).as("us"),
        lit(null).cast("long").as("cv"), lit(true).as("is_grid"),
        lit(0L).as("id"))
    val u = ev.unionByName(grid)
      .withColumn("us_ev", when(!col("is_grid"), col("us")))
    val wAsc = Window.partitionBy("k")
      .orderBy(col("us").asc, col("is_grid").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("k")
      .orderBy(col("us").desc, col("is_grid").asc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u
      .withColumn("py", last("cv", ignoreNulls = true).over(wAsc))
      .withColumn("pt", last("us_ev", ignoreNulls = true).over(wAsc))
      .withColumn("ny", last("cv", ignoreNulls = true).over(wDesc))
      .withColumn("nt", last("us_ev", ignoreNulls = true).over(wDesc))
      .where(col("is_grid"))
      .select(col("k").as(keyCol), expr("us div 1000").as("g_ms"),
        when(col("nt") === col("pt"), col("py") * 1000L)
          .otherwise(expr(s"1000 * py + ((cast(ny as $dec) - py) * 1000 * " +
            s"(us - pt)) div (nt - pt)").cast("long"))
          .as("y_milli"))
  }

  /** Lead–lag cross-correlation between two event streams' hourly
    * count series — the "does A drive B, and with what delay"
    * diagnostic [[autocorrelation]] cannot give (ACF is a series
    * against itself; CCF at lag ℓ correlates x_t with y_{t+ℓ}, so a
    * peak at ℓ = +2 reads "x leads y by two hours"). Both series live
    * on the DENSE shared hour lattice spanning [min, max] over either
    * stream, absent hours counted 0 — without densification a
    * quiet-hour gap silently shifts alignment. Per lag, the five sums
    * are exact decimals over the overlap segment (per-lag centering —
    * each lag's overlap is its own sample); the one double is the
    * final `num / sqrt(dx·dy)` rounded 6 d.p. Zero-variance segments
    * (either side constant) yield null.
    *
    * Scale: two grouped counts, then everything is lattice-sized —
    * the lattice join fan-out is hours·(2·maxLag+1), a calendar
    * quantity, never row-sized.
    */
  def crossCorrelation(df: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1 && maxLag <= 168, s"maxLag out of range: $maxLag")
    val dec = "decimal(38,0)"
    val spark = df.sparkSession
    import spark.implicits._
    val hours = df.where(col(tsCol).isNotNull &&
        col(typeCol).isin(typeA, typeB))
      .select(expr(s"unix_micros($tsCol) div 3600000000").as("h"),
        col(typeCol).as("et"))
    val counts = hours.groupBy("h", "et").agg(count(lit(1)).as("c"))
    val span = counts.agg(min("h").as("h0"), max("h").as("h1"))
    val lattice = span
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
    val series = lattice
      .join(counts.where(col("et") === typeA).select(col("h"),
        col("c").as("x")), Seq("h"), "left")
      .join(counts.where(col("et") === typeB).select(col("h"),
        col("c").as("y")), Seq("h"), "left")
      .select(col("h"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .localCheckpoint() // lattice-sized; referenced twice by the pair join
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
    val pairs = series.as("a").crossJoin(broadcast(lags))
      .join(series.as("b"),
        col("b.h") === col("a.h") + col("lag"))
      .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(expr(s"cast(x as $dec) * y")).as("sxy"),
        sum(expr(s"cast(x as $dec) * x")).as("sx2"),
        sum(expr(s"cast(y as $dec) * y")).as("sy2"))
      .select(col("lag"), col("n"),
        expr(s"cast(n as $dec) * sxy - sx * sy").cast("double").as("_num"),
        expr(s"cast(n as $dec) * sx2 - sx * sx").cast("double").as("_dx"),
        expr(s"cast(n as $dec) * sy2 - sy * sy").cast("double").as("_dy"))
      .select(col("lag"), col("n"),
        when(col("_dx") > 0 && col("_dy") > 0,
          round(col("_num") / sqrt(col("_dx") * col("_dy")), 6))
          .as("r"))
  }

  /** Seasonal-naive forecast backtest with MASE — the honest baseline
    * every fancier forecaster must beat, and the evaluation metric
    * that makes "beat" well-defined: forecast hour h as the count at
    * h − `period`, score the last `testHours` hours by MAE, and scale
    * by the in-train one-step naive MAE (Hyndman's MASE — unit-free,
    * defined even when the series touches zero, where MAPE explodes).
    * `MASE·10³ = (10³·Σ|e_f|·n_naive) div (Σ|e_n|·n_test)` — exact
    * integers end to end, one truncating division; a zero-naive-error
    * train series (perfectly flat) emits null.
    *
    * Both series live on the dense shared hour lattice (the
    * [[crossCorrelation]] discipline), split at the GLOBAL last hour
    * minus testHours so every key is scored on the same horizon.
    *
    * Scale: one grouped count, then lattice-sized lag windows
    * (calendar-bounded) — nothing data-sized after the first
    * aggregate.
    */
  /** Shared dense-lattice forecast frame for [[seasonalNaiveBacktest]]
    * and [[pinballLoss]]: per (type `et`, hour `h`) the zero-filled
    * count `x`, the seasonal forecast `x_season` (lag `period`), the
    * one-step naive `x_prev`, and the global train/test `split_h`.
    */
  private def seasonalScored(df: DataFrame, tsCol: String, typeCol: String,
      period: Int, testHours: Int): DataFrame = {
    require(period >= 1 && testHours >= 1)
    val counts = df.where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div 3600000000").as("h"),
        col(typeCol).as("et"))
      .groupBy("h", "et").agg(count(lit(1)).as("c"))
    val span = counts.agg(min("h").as("h0"), max("h").as("h1"))
    val lattice = span
      .select(explode(sequence(col("h0"), col("h1"))).as("h"),
        (col("h1") - testHours).as("split_h"))
    val types = counts.select("et").distinct()
    val dense = lattice.crossJoin(broadcast(types))
      .join(counts, Seq("h", "et"), "left")
      .select(col("et"), col("h"), col("split_h"),
        coalesce(col("c"), lit(0L)).as("x"))
    val w = Window.partitionBy("et").orderBy("h")
    dense
      .withColumn("x_season", lag(col("x"), period).over(w))
      .withColumn("x_prev", lag(col("x"), 1).over(w))
  }

  def seasonalNaiveBacktest(df: DataFrame, tsCol: String, typeCol: String,
      period: Int = 24, testHours: Int = 72): DataFrame = {
    val scored = seasonalScored(df, tsCol, typeCol, period, testHours)
    scored.groupBy(col("et").as(typeCol))
      .agg(
        sum(when(col("h") > col("split_h") && col("x_season").isNotNull,
          1L).otherwise(0L)).as("n_test"),
        sum(when(col("h") > col("split_h") && col("x_season").isNotNull,
          abs(col("x") - col("x_season")))).as("sae_forecast"),
        sum(when(col("h") <= col("split_h") && col("x_prev").isNotNull,
          1L).otherwise(0L)).as("n_naive"),
        sum(when(col("h") <= col("split_h") && col("x_prev").isNotNull,
          abs(col("x") - col("x_prev")))).as("sae_naive"))
      .select(col(typeCol), col("n_test"),
        coalesce(col("sae_forecast"), lit(0L)).as("sae_forecast"),
        col("n_naive"), coalesce(col("sae_naive"), lit(0L)).as("sae_naive"))
      .withColumn("mase_milli",
        when(col("sae_naive") > 0 && col("n_test") > 0,
          expr("(1000 * sae_forecast * n_naive)" +
            " div (sae_naive * n_test)")))
  }

  /** Pinball (quantile) loss of the seasonal-naive forecast — the
    * scoring rule that makes QUANTILE forecasts honest where
    * [[seasonalNaiveBacktest]]'s MAE scores the median: for each
    * τ (ppm) the test-window loss `Σ τ·(y−ŷ)⁺ + (1−τ)·(ŷ−y)⁺` is an
    * exact integer in ppm units (under-forecasting hurts τ-fold,
    * over-forecasting (1−τ)-fold — minimized in expectation by the
    * true τ-quantile). One row per (type, τ): n_test, total ppm loss,
    * mean milli loss (`total div (1000·n)`, truncating on
    * non-negatives). Same dense shared-hour-lattice frame and global
    * split as the MASE backtest, so the two readouts are directly
    * comparable.
    *
    * Scale: the lattice window plus one grouped aggregate per the
    * (type × τ) fan-out — τ list is a broadcast literal lattice.
    */
  def pinballLoss(df: DataFrame, tsCol: String, typeCol: String,
      period: Int = 24, testHours: Int = 72,
      tausPpm: Seq[Long] = Seq(100000L, 500000L, 900000L)): DataFrame = {
    require(tausPpm.nonEmpty && tausPpm.forall(t => t > 0 && t < 1000000))
    val scored = seasonalScored(df, tsCol, typeCol, period, testHours)
      .where(col("h") > col("split_h") && col("x_season").isNotNull)
    val tauDf = scored.sparkSession.createDataFrame(
      tausPpm.map(Tuple1(_))).toDF("tau_ppm")
    scored.crossJoin(broadcast(tauDf))
      .withColumn("loss_ppm",
        when(col("x") >= col("x_season"),
          col("tau_ppm") * (col("x") - col("x_season")))
          .otherwise((lit(1000000L) - col("tau_ppm")) *
            (col("x_season") - col("x"))))
      .groupBy(col("et").as(typeCol), col("tau_ppm"))
      .agg(count(lit(1)).as("n_test"),
        sum("loss_ppm").as("loss_ppm_total"))
      .withColumn("mean_loss_milli",
        when(col("n_test") > 0,
          expr("loss_ppm_total div (1000 * n_test)")))
  }

  /** Expanding-window time-series cross-validation folds — the
    * leakage-safe backtest split a RANDOM k-fold (q304's shape) must
    * never be used for on temporal data (it trains on the future):
    * fold i trains on everything BEFORE cut_i and tests on the next
    * `testHours`, cuts spaced so the k equal test windows tile the
    * series tail back-to-back and the last ends at the series end.
    * Emits per fold the exact train/test row counts, the hour
    * boundaries, and a `leak_free` audit bit (last populated train
    * hour < first populated test hour) — trivially true by
    * construction HERE, released so the same readout shape catches a
    * miswired caller-supplied assignment.
    *
    * Scale: one grouped hour count; everything after is the
    * hour-lattice × k folds (calendar-bounded), map-side combinable.
    */
  def timeSeriesFolds(df: DataFrame, tsCol: String, nFolds: Int = 5,
      testHours: Int = 24): DataFrame = {
    require(nFolds >= 2 && nFolds <= 64 && testHours >= 1)
    val counts = df.where(col(tsCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
    val span = counts.agg(min("h").as("h0"), max("h").as("h1"))
    val folds = span.select(col("h1"),
        explode(sequence(lit(1), lit(nFolds))).as("fold"))
      .select(col("fold"),
        (col("h1") + 1 - (lit(nFolds.toLong) - col("fold")) * testHours -
          testHours).as("cut_h"))
    counts.crossJoin(broadcast(folds))
      .groupBy("fold", "cut_h")
      .agg(
        sum(when(col("h") < col("cut_h"), col("c")).otherwise(0L))
          .as("n_train"),
        sum(when(col("h") >= col("cut_h") &&
          col("h") < col("cut_h") + testHours, col("c")).otherwise(0L))
          .as("n_test"),
        max(when(col("h") < col("cut_h"), col("h"))).as("train_end_h"),
        min(when(col("h") >= col("cut_h") &&
          col("h") < col("cut_h") + testHours, col("h")))
          .as("test_start_h"))
      .select(col("fold").cast("long").as("fold"), col("cut_h"),
        col("n_train"), col("n_test"), col("train_end_h"),
        col("test_start_h"),
        (col("train_end_h").isNull || col("test_start_h").isNull ||
          col("train_end_h") < col("test_start_h")).as("leak_free"))
  }

  /** Integer-pinned periodogram — WHICH cycle dominates a keyed count
    * series, found rather than assumed (seasonalNaive/decompose take
    * the period as input; this op produces it): for every candidate
    * period p in 2..maxPeriod, the DFT power at frequency 1/p over
    * the dense mean-centered hour series, emitted as the fitted
    * cosine AMPLITUDE in original count units (milli) — "the daily
    * cycle swings ±5.2 events/hour" reads directly. Determinism: the
    * centered series is the exact integer `c_t = N·x_t − S`; cos/sin
    * pin to micro per row (one libm call on identical doubles); the
    * (key, p) sums are exact decimal integer sums — no float
    * accumulation; the one double chain (sqrt + normalization) runs
    * per released row in pinned order. `is_dominant` ranks amplitude
    * desc with period-asc ties.
    *
    * Scale: the work frame is lattice × periods (calendar-bounded ×
    * maxPeriod — never data-sized after the first grouped count).
    * Decimal(38) headroom: |Σ c_t·cos_micro| ≤ N²·max(x)·10⁶, safe
    * through ~10⁹ events/hour on a month lattice.
    */
  def periodogram(df: DataFrame, tsCol: String, typeCol: String,
      maxPeriod: Int = 48): DataFrame = {
    require(maxPeriod >= 2 && maxPeriod <= 1000)
    val dec = "decimal(38,0)"
    val counts = df.where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(expr(s"unix_micros($tsCol) div 3600000000").as("h"),
        col(typeCol).as("et"))
      .groupBy("h", "et").agg(count(lit(1)).as("c"))
    val span = counts.agg(min("h").as("h0"), max("h").as("h1"))
    val lattice = span
      .select(col("h0"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val types = counts.select("et").distinct()
    val dense = lattice.crossJoin(broadcast(types))
      .join(counts, Seq("h", "et"), "left")
      .select(col("et"), (col("h") - col("h0")).as("t"),
        coalesce(col("c"), lit(0L)).as("x"))
    val perType = dense.groupBy("et")
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec)).as("s"))
    val periods = (2 to maxPeriod).map(_.toLong)
    val cells = dense.join(perType, Seq("et"))
      .crossJoin(broadcast(df.sparkSession.createDataFrame(
        periods.map(Tuple1(_))).toDF("p")))
      .withColumn("ct", expr(s"cast(n as $dec) * x - s"))
      .withColumn("ang", lit(2.0) * lit(math.Pi) *
        (col("t") % col("p")).cast("double") / col("p").cast("double"))
      .withColumn("cosu", round(lit(1e6) * cos(col("ang"))).cast("long"))
      .withColumn("sinu", round(lit(1e6) * sin(col("ang"))).cast("long"))
    val agg = cells.groupBy(col("et").as(typeCol), col("p"))
      .agg(max("n").as("n"),
        sum(expr("ct * cosu")).as("sc"), sum(expr("ct * sinu")).as("ss"))
      .withColumn("amp_milli",
        round((lit(2000.0) * sqrt(
          col("sc").cast("double") * col("sc").cast("double") +
            col("ss").cast("double") * col("ss").cast("double"))) /
          ((col("n").cast("double") * col("n").cast("double")) *
            lit(1000000.0))).cast("long"))
    agg.withColumn("rk", row_number().over(
        Window.partitionBy(typeCol)
          .orderBy(col("amp_milli").desc, col("p").asc)))
      .select(col(typeCol), col("p"), col("n"), col("amp_milli"),
        (col("rk") === 1).as("is_dominant"))
  }

  /** Inter-event burstiness per key — are arrivals Poisson-steady or
    * bursty? Gaps are consecutive same-(key, entity) inter-event
    * times in MILLISECONDS (CV² is scale-invariant; ms keeps
    * `10³·n²·Σg²` inside decimal(38) out to ~10¹⁰ gaps per key, where
    * µs overflowed at sf0.1 already — the truncation to ms is the
    * documented unit contract, not noise); per key the profile emits
    * the exact gap CV² (variance/mean², sample form, one truncating
    * milli division with the totals cleared: `CV²·10³ =
    * (10³·n·(n·Σg² − (Σg)²)) div ((n−1)·(Σg)²)` — CV² = 1 is Poisson,
    * > 1 bursty) and the Goh–Barabási burstiness `B = (σ−μ)/(σ+μ)` as
    * the one 6 d.p. double (σ from a single sqrt over the exact
    * variance ratio; B ∈ (−1, 1), 0 = Poisson). Keys with < 2 gaps
    * emit null.
    *
    * Scale: one per-(key, entity) sort for the lag window, one
    * map-side-combinable grouped aggregate — the q07 lag-gap shape
    * with a moments tail.
    */
  def interEventBurstiness(df: DataFrame, keyCol: String,
      entityCol: String, tsCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy("k", "ent").orderBy(col("us"))
    val gaps = df.where(col(keyCol).isNotNull && col(entityCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), col(entityCol).as("ent"),
        unix_micros(col(tsCol)).as("us"))
      .withColumn("g_us", col("us") - lag(col("us"), 1).over(w))
      .withColumn("g", expr("g_us div 1000"))
      .where(col("g").isNotNull)
    gaps.groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g").cast(dec)).as("sg"),
        sum(expr(s"cast(g as $dec) * g")).as("sg2"))
      .select(col(keyCol), col("n_gaps"),
        col("sg").cast("long").as("sum_gap_ms"),
        when(col("n_gaps") >= 2 && col("sg") > 0,
          expr(s"(cast(1000 as $dec) * n_gaps * (n_gaps * sg2 - sg * sg))" +
            s" div ((n_gaps - 1) * sg * sg)").cast("long"))
          .as("cv2_milli"),
        when(col("n_gaps") >= 2 && col("sg") > 0, {
          // pinned float order: exact decimals → double, one sqrt,
          // one ratio, round 6 — the assortativity discipline
          val vd = expr(s"cast(n_gaps * sg2 - sg * sg as double)") /
            expr(s"cast(cast(n_gaps as $dec) * (n_gaps - 1) as double)")
          val md = expr("cast(sg as double)") /
            expr("cast(n_gaps as double)")
          round((sqrt(vd) - md) / (sqrt(vd) + md), 6)
        }).as("burstiness"))
  }
}
