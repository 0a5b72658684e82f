package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, tpe: String, min: Int) =
    (id, user, tpe,
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        .getTime + min * 60000L))

  private def funnel(rows: Seq[(Long, Long, String, java.sql.Timestamp)]) =
    Analytics.sessionFunnel(
      rows.toDF("event_id", "user_id", "event_type", "ts"),
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet

  test("funnel steps must be strictly ordered within the session") {
    // user 1: click BEFORE the view — click must not count; the later
    // click completes step 2, no purchase
    val got = funnel(Seq(
      ev(1, 1, "click", 0), ev(2, 1, "view", 5), ev(3, 1, "click", 10)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    assert(got == Set((1L, 1L, Some(base + 5 * 60000L),
      Some(base + 10 * 60000L), None)))
  }

  test("a missing earlier step nulls all later ones") {
    // purchase exists but no view at all → everything null
    val got = funnel(Seq(ev(1, 2, "purchase", 0), ev(2, 2, "click", 1)))
    assert(got == Set((2L, 1L, None, None, None)))
  }

  test("sessions are isolated: steps never chain across a 30-min gap") {
    // view in session 1, click 40 min later (new session) → no step 2
    val got = funnel(Seq(ev(1, 3, "view", 0), ev(2, 3, "click", 40)))
    assert(got.size == 2)
    assert(got.forall { case (_, _, s1, s2, s3) =>
      (s1.isEmpty || s2.isEmpty) && s3.isEmpty })
  }

  test("cohortRetention counts distinct users per (cohort, offset)") {
    // users 1,2 first-seen week 0; user 1 also active week 1 (twice —
    // counted once); user 3 first-seen week 1
    val wk = 7 * 24 * 60
    val rows = Seq(ev(1, 1, "view", 0), ev(2, 2, "view", 10),
      ev(3, 1, "view", wk + 1), ev(4, 1, "view", wk + 2),
      ev(5, 3, "view", wk + 3))
    val got = Analytics.cohortRetention(rows.toDF("event_id", "user_id", "event_type", "ts"))
      .as[(Long, Long, Long)].collect().toSet
    // 2024-01-01 is mid-epoch-week, so offsets may split; recompute
    // expectations from the op's own week arithmetic
    val w0 = (java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime /
      1000 / 86400) / 7
    val w1 = ((java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      (wk + 1) * 60000L) / 1000 / 86400) / 7
    if (w1 == w0) // both minutes landed in the same epoch week
      assert(got == Set((w0, 0L, 3L)))
    else
      assert(got == Set((w0, 0L, 2L), (w0, w1 - w0, 1L), (w1, 0L, 1L)))
  }

  test("sessionTransitions: chains break at session boundaries, rows normalize") {
    // user 1: view→click in session 1; 40-min gap; view→view in session 2.
    // No click→view transition across the gap.
    val rows = Seq(ev(1, 1, "view", 0), ev(2, 1, "click", 5),
      ev(3, 1, "view", 45), ev(4, 1, "view", 50))
    val got = Analytics.sessionTransitions(
        rows.toDF("event_id", "user_id", "event_type", "ts"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(("view", "click", 1L, 0.5), ("view", "view", 1L, 0.5)))
  }

  test("sessionTransitions: users never chain into each other") {
    val rows = Seq(ev(1, 1, "view", 0), ev(2, 2, "click", 1))
    val got = Analytics.sessionTransitions(
      rows.toDF("event_id", "user_id", "event_type", "ts"))
    assert(got.count() == 0)
  }

  // ——————————————————————————————— incremental rollup (partial monoid)

  private def evv(id: Long, user: java.lang.Long, min: Int, v: java.lang.Double) =
    (id, user,
      if (min < 0) null
      else new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L),
      v)

  private def evDf(rows: Seq[(Long, java.lang.Long, java.sql.Timestamp, java.lang.Double)]) =
    rows.toDF("event_id", "user_id", "ts", "value")

  test("incremental rollup: merged partials ≡ one-shot partials, any merge tree") {
    val rows = Seq(evv(1, 1L, 0, 1.5), evv(2, 1L, 10, 2.5), evv(3, 1L, 70, 9.0),
      evv(4, 2L, 5, 4.0), evv(5, 1L, 20, 0.5), evv(6, 2L, 15, 6.0))
    val all = evDf(rows)
    val parts = Seq(evDf(rows.take(2)), evDf(rows.slice(2, 4)), evDf(rows.drop(4)))
    val oneShot = Analytics.finalizeStats(Analytics.partialHourlyStats(all))
      .collect().map(_.toSeq).toSet
    val merged = Analytics.finalizeStats(Analytics.mergePartialStats(
      parts.map(Analytics.partialHourlyStats): _*)).collect().map(_.toSeq).toSet
    val nested = Analytics.finalizeStats(Analytics.mergePartialStats(
      Analytics.mergePartialStats(
        Analytics.partialHourlyStats(parts(0)), Analytics.partialHourlyStats(parts(1))),
      Analytics.partialHourlyStats(parts(2)))).collect().map(_.toSeq).toSet
    assert(oneShot.nonEmpty && merged == oneShot && nested == oneShot)
  }

  test("incremental rollup: finalized stats are exact on a hand case") {
    // user 1 hour 0: values 1.5, 2.5, 0.5 → cnt 3, sum 4500 mv, min 500,
    // max 2500, mean 1500.0
    val rows = Seq(evv(1, 1L, 0, 1.5), evv(2, 1L, 10, 2.5), evv(5, 1L, 20, 0.5),
      evv(7, null, 30, 9.9), evv(8, 1L, -1, 9.9), evv(9, 1L, 40, null))
    val got = Analytics.finalizeStats(Analytics.partialHourlyStats(evDf(rows)))
      .select("user_id", "cnt", "sum_mv", "min_mv", "max_mv", "mean_mv")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // null user / null ts / null value rows contribute nothing
    assert(got == Seq((1L, 3L, 4500L, 500L, 2500L, 1500.0)))
  }

  // ————————————————————————————————————————————— winsorized group stats

  test("winsorizedStats: hand-computed thresholds, clamp counts, mean") {
    // group A: cents 1..20. p05 = floor(1 + 0.95·1) = 1, p95 =
    // floor(19 + 0.05·1) = 19 → n_lo 0, n_hi 1 (the 20), winsorized
    // sum = (1+…+19) + 19 = 209 → mean 10.45
    val df = (1 to 20).map(i => ("A", i / 100.0)).toDF("g", "v")
    val got = Analytics.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("A", 1L, 19L, 20L, 0L, 1L, 10.45)))
  }

  test("winsorizedStats: groups are independent; null group/value dropped") {
    val df = ((1 to 10).map(i => ("A", i * 1.0)) ++ Seq(("B", 5.0)))
      .toDF("g", "v")
      .union(Seq((null: String, java.lang.Double.valueOf(9.0)),
        ("A", null: java.lang.Double)).toDF("g", "v"))
    val got = Analytics.winsorizedStats(df, "g", "v")
      .select("g", "n").as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 10L, "B" -> 1L))
  }

  test("lastTouchAttribution: latest preceding touch, window bound, no-touch null") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def us(m: Int) = ts(m).getTime * 1000
    val ev = Seq(
      (1L, 1L, "click", ts(1)), (1L, 2L, "purchase", ts(2)),   // → click 1
      (1L, 3L, "click", ts(3)), (1L, 4L, "click", ts(4)),
      (1L, 5L, "purchase", ts(5)),                              // → click 4 (latest)
      (2L, 6L, "purchase", ts(1)),                              // no touch → null
      (3L, 7L, "click", ts(1)), (3L, 8L, "purchase", ts(50)))   // beyond 10-min window
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = graft.ops.Analytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", "click",
        windowUs = 10L * 60 * 1000000)
      .select("event_id", "touch_id", "gap_us", "attributed")
      .as[(Long, Option[Long], Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (2L, Some(1L), Some(us(2) - us(1)), true),
      (5L, Some(4L), Some(us(5) - us(4)), true),
      (6L, None, None, false),
      (8L, Some(7L), Some(us(50) - us(1)), false)))
  }

  test("lastTouchAttribution: shared timestamp resolves by the (ts, id) total order") {
    // click id 1 and purchase id 2 at the SAME instant: the click sorts
    // first, so the purchase credits it — deterministic, not ambiguous
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((1L, 1L, "click", t), (1L, 2L, "purchase", t))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = graft.ops.Analytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "purchase", "click", windowUs = 1000000L)
      .select("event_id", "touch_id", "attributed")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq((2L, Some(1L), true)))
  }

  test("equiDepthBins: median boundary splits a hand fixture exactly") {
    // cents 100..1000; 2 bins → boundary = floor(p50) = 550:
    // bin 0 = {100..500}, bin 1 = {600..1000}
    val df = (1 to 10).map(i => Tuple1(i.toDouble)).toDF("v")
    val got = Analytics.equiDepthBins(df, "v", nBins = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 5L, 100L, 500L), (1L, 5L, 600L, 1000L)))
  }

  test("equiDepthBins: deciles are near-equal depth on real data; nulls dropped") {
    val li = graft.queries.Tables.lineitem(spark, sf()).select("l_extendedprice")
    val rows = li.where(col("l_extendedprice").isNotNull).count()
    val bins = Analytics.equiDepthBins(li, "l_extendedprice", nBins = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.map(_._2).sum == rows, "binning must partition the rows")
    assert(bins.length == 10)
    val depths = bins.map(_._2.toDouble)
    assert(depths.max / depths.min < 1.25,
      s"equi-depth bins should be near-equal: ${depths.toSeq}")
    // bins are ordered, non-overlapping in value space
    val sorted = bins.sortBy(_._1)
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bin ${a._1} max ${a._4} overlaps bin ${b._1} min ${b._3}")
    }
  }

  test("madOutliers: hand medians in 2×/4× space; the fence flags only the whale") {
    // group g: 1.00×5 and one 100.00 whale (cents 100,100,100,100,100,10000)
    // m2 = median(2c) = 200; dev2 = {0,0,0,0,0,19800}; mad4 = median(2·dev2)=0
    // fence: 4·dev2 > 3·0 → only the whale (dev2 19800) flags
    val df = (Seq.fill(5)(1.0) :+ 100.0).map(("g", _)).toDF("grp", "v")
    val got = Analytics.madOutliers(df, "grp", "v", k = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 200L, 0L, 6L, 1L)))
  }

  test("madOutliers: the MAD fence is whale-proof where a stddev fence is not") {
    // 99 unit values + one 10⁶ whale: the whale inflates a mean+3σ fence
    // enough that it would flag nothing but itself — and it drags the
    // mean so far that ALL normal points sit below it. The MAD fence's
    // median/MAD never move: exactly one outlier, regardless of scale.
    val df = ((1 to 99).map(i => 1.0 + (i % 3) * 0.01) :+ 1e6)
      .map(("g", _)).toDF("grp", "v")
    val got = Analytics.madOutliers(df, "grp", "v", k = 3)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got._5 == 1L, s"exactly the whale: $got")
  }

  // ——————————————————————————————— approx_percentile scale variants
  // (the 100 TB configuration of the q118/q137/q150 family: the sketch's
  //  rank error is ≤ n/accuracy, so each approx threshold must sit within
  //  that many ranks of the requested percentile — asserted against the
  //  actual data, not against the exact answer, because the guarantee is
  //  a rank envelope, not value proximity)

  test("winsorizedStats approx: thresholds within the sketch's rank-error envelope") {
    val acc = 100
    val li = graft.queries.Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val cents = li.select(col("g"), round(col("v") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) => (g, rows.map(_._2).sorted) }
    val got = Analytics.winsorizedStats(li, "g", "v", approxAccuracy = Some(acc))
      .select("g", "p_lo_c", "p_hi_c")
      .as[(String, Long, Long)].collect()
    got.foreach { case (g, lo, hi) =>
      val vs = cents(g); val n = vs.length
      def rankOf(t: Long): Double = vs.count(_ <= t).toDouble / n
      val tol = 1.0 / acc + 1.0 / n // sketch envelope + floor slack
      assert(math.abs(rankOf(lo) - 0.05) <= tol,
        s"$g p05 approx $lo rank ${rankOf(lo)} outside ±$tol")
      assert(math.abs(rankOf(hi) - 0.95) <= tol,
        s"$g p95 approx $hi rank ${rankOf(hi)} outside ±$tol")
    }
    // exact remains the default path — identical call without the flag
    // still matches the oracle-checked shape (spot-check one group count)
    val exact = Analytics.winsorizedStats(li, "g", "v")
      .select("g", "n").as[(String, Long)].collect().toMap
    got.foreach { case (g, _, _) => assert(exact(g) == cents(g).length.toLong) }
  }

  test("madOutliers approx: median/MAD within rank envelope; fence algebra intact") {
    val acc = 200
    val li = graft.queries.Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_returnflag").as("g"), col("l_quantity").as("v"))
    val got = Analytics.madOutliers(li, "g", "v", k = 3,
        approxAccuracy = Some(acc))
      .as[(String, Long, Long, Long, Long)].collect()
    val doubled = li.select(col("g"), (round(col("v") * 100).cast("long") * 2).as("c2"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, rows) => (g, rows.map(_._2).sorted) }
    got.foreach { case (g, m2, mad4, n, _) =>
      val vs = doubled(g)
      // approx m2 is an actual doubled-cent element within the envelope.
      // l_quantity is heavily tied (≈50 distinct values), so the element's
      // rank is an INTERVAL [count(<), count(≤)] — the sketch guarantee is
      // that this interval intersects p ± 1/accuracy
      assert(vs.contains(m2), s"$g: approx median $m2 must be a data element")
      val lo = vs.count(_ < m2).toDouble / vs.length
      val hi = vs.count(_ <= m2).toDouble / vs.length
      val tol = 1.0 / acc + 1.0 / vs.length
      assert(lo <= 0.5 + tol && hi >= 0.5 - tol,
        s"$g median rank interval [$lo,$hi] misses 0.5±$tol")
      assert(mad4 % 2 == 0 && n == vs.length.toLong)
    }
  }

  test("equiDepthBins approx: bins still partition rows, depths near-equal") {
    val li = graft.queries.Tables.lineitem(spark, sf("sf0.01"))
      .select("l_extendedprice")
    val rows = li.where(col("l_extendedprice").isNotNull).count()
    val bins = Analytics.equiDepthBins(li, "l_extendedprice", nBins = 10,
        approxAccuracy = Some(1000))
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.map(_._2).sum == rows, "binning must partition the rows")
    assert(bins.length == 10)
    val depths = bins.map(_._2.toDouble)
    // accuracy 1000 over ~60k rows: each boundary within 60 ranks →
    // depth skew bounded well under 5%
    assert(depths.max / depths.min < 1.1,
      s"approx deciles should stay near-equal: ${depths.toSeq}")
  }

  test("rateLimitFirstPerWindow: first per (key, hour) wins; ties break on id; suppressed counted") {
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val hourUs = 3600L * 1000000L
    val ev = Seq(
      (1L, 10L, ts(0, 5)), (1L, 11L, ts(0, 40)), (1L, 12L, ts(0, 59)), // 3 in hour 0
      (1L, 13L, ts(1, 0)),                                             // boundary: new window
      (2L, 20L, ts(0, 5)), (2L, 19L, ts(0, 5)))                        // same µs: lower id wins
      .toDF("user_id", "event_id", "ts")
    val got = graft.ops.Analytics.rateLimitFirstPerWindow(
        ev, "user_id", "ts", "event_id", hourUs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val h0 = ts(0, 0).getTime * 1000L
    assert(got == Set(
      (1L, h0, 10L, ts(0, 5).getTime * 1000L, 3L, 2L),
      (1L, h0 + hourUs, 13L, ts(1, 0).getTime * 1000L, 1L, 0L),
      (2L, h0, 19L, ts(0, 5).getTime * 1000L, 2L, 1L)))
  }

  test("columnProfile: one-scan multi-column stats, nulls counted not crashed") {
    val df = Seq(
      (Some(1L), Some("ab")), (Some(22L), None),
      (None, Some("xyz")), (Some(1L), Some("ab")))
      .toDF("k", "s")
    val got = Analytics.columnProfile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      // k: 4 rows, 1 null, 2 distinct (1, 22), lens of "1"/"22"
      ("k", 4L, 1L, 2L, Some(1L), Some(2L), 4L),
      // s: 4 rows, 1 null, 2 distinct ("ab","xyz"), lens 2/3, sum 2+3+2
      ("s", 4L, 1L, 2L, Some(2L), Some(3L), 7L)))
  }

  test("abTestZ: hand counts reproduce the pooled-SE z") {
    // users 1..40, conversion = user id in a fixed set; arms from the
    // md5 lattice — recompute everything in the test, then check z
    val conv = Set(1L, 2L, 3L, 10L, 11L, 20L, 30L)
    val ev = (1L to 40L).flatMap { u =>
      val t = new java.sql.Timestamp(1704067200000L + u * 1000)
      Seq((u, "view", t)) ++
        (if (conv(u)) Seq((u, "purchase", t)) else Nil)
    }.toDF("user_id", "event_type", "ts")
    val got = Analytics.abTestZ(ev, "user_id", "event_type", "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().head
    val (na, ca, nb, cb) = (got._1, got._2, got._3, got._4)
    assert(na + nb == 40 && ca + cb == conv.size)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val se = math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    val z = BigDecimal((pb - pa) / se)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._7.contains(z))
  }

  test("giniShares: hand distribution and the uniform zero") {
    // sizes 1,1,2,4 → Σi·x = 1+2+6+16 = 25; G = 50/32 − 5/4 = 0.3125
    val df = (Seq("a") ++ Seq("b") ++ Seq.fill(2)("c") ++ Seq.fill(4)("d"))
      .map(Tuple1(_)).toDF("g")
    val got = Analytics.giniShares(df, "g")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got == ((4L, 8L, 0.3125, 0.5)))
    val uniform = Seq.fill(3)("x").map(Tuple1(_)).toDF("g")
      .union(Seq.fill(3)("y").map(Tuple1(_)).toDF("g"))
    val g0 = Analytics.giniShares(uniform, "g")
      .as[(Long, Long, Double, Double)].collect().head
    assert(g0._3 == 0.0, s"uniform distribution has Gini 0: $g0")
  }

  test("ksDrift: hand cumulative walk; identical samples give exactly 0") {
    // a = {1,1,2}, b = {2,3,3} cents {100,200,300}: dev = |c1·n2 − c2·n1|
    // peaks at 6 for v∈{100,200} → lowest v wins; ks = 6/9
    val a = Seq(1.0, 1.0, 2.0).map(Tuple1(_)).toDF("v")
    val b = Seq(2.0, 3.0, 3.0).map(Tuple1(_)).toDF("v")
    val got = Analytics.ksDrift(a, b, "v")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got == ((3L, 3L, 100L, 6L, 0.666667)))
    val same = Analytics.ksDrift(a, a, "v")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(same._5 == 0.0)
  }

  test("fdAudit: held key, violated FDs, null-rhs ignored, null-lhs grouped") {
    val t = Seq((1L, Some("en"), "web"), (2L, Some("en"), "web"),
      (3L, Some("fr"), "web"), (3L, Some("de"), "web"),
      (4L, None, "crawl")).toDF("id", "lang", "src")
    val got = Analytics.fdAudit(t, Seq(
        (Seq("id"), "lang"), (Seq("src"), "lang"), (Seq("lang"), "src")))
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // id 3 carries two langs; id 4's null lang can't witness anything
    assert(got("id->lang") == (("id->lang", 3L, 1L, 333333L, 2L, false)))
    // one src group with 3 langs
    assert(got("src->lang") == (("src->lang", 1L, 1L, 1000000L, 3L, false)))
    // holds; the null-lang row forms its OWN lhs group (standard GROUP BY)
    assert(got("lang->src") == (("lang->src", 4L, 0L, 0L, 1L, true)))
  }

  test("psiDrift: hand bins and smoothed log terms; identical inputs give 0") {
    // old = {1,1,2,2}, new = {2,2,2,3} cents; nBins=2 → one edge =
    // floor(pctl(.5){100,100,200,200}) = 150. Old: bin0=2, bin1=2;
    // new: bin0=0, bin1=4. Smoothed p = (n+1)/(N+2) with N=4 both sides.
    val a = Seq(1.0, 1.0, 2.0, 2.0).map(Tuple1(_)).toDF("v")
    val b = Seq(2.0, 2.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    def term(nOld: Long, nNew: Long): Long = {
      val po = (nOld + 1).toDouble / 6d; val pn = (nNew + 1).toDouble / 6d
      math.round((pn - po) * math.log(pn / po) * 1000000d)
    }
    val got = Analytics.psiDrift(a, b, "v", nBins = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val t0 = term(2, 0); val t1 = term(2, 4)
    assert(got == Seq((0L, 2L, 0L, t0, t0 + t1), (1L, 2L, 4L, t1, t0 + t1)))
    assert(t0 > 0 && t1 > 0, "both drifted bins contribute positive PSI")
    val same = Analytics.psiDrift(a, a, "v", nBins = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(same.forall(r => r._4 == 0L && r._5 == 0L),
      "identical snapshots have exactly zero PSI")
  }

  test("calibrationBins: equal-count bins, integer means, observed rates") {
    val rows = (0 until 10).map(i => (i.toLong, i / 10.0, i >= 5))
      .toDF("id", "score", "y")
    val got = Analytics.calibrationBins(rows, "id", "score", "y", nBins = 2)
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 5L, 0.2, 0L, 0.0), (1L, 5L, 0.7, 5L, 1.0)))
  }

  test("cusumChangepoint: the peak lands on the last pre-shift row") {
    def ts(s: Int) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq((1L, ts(1), 0.0), (1L, ts(2), 0.0), (1L, ts(3), 0.0),
      (1L, ts(4), 10.0), (1L, ts(5), 10.0), (1L, ts(6), 10.0))
      .toDF("user_id", "ts", "value")
    val got = Analytics.cusumChangepoint(ev, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long)].collect().head
    // n=6, S=3000 cents; dev = |6·cy − i·3000| peaks at i=3 (9000)
    assert(got == ((1L, (1704067200000L + 3000L) * 1000, 9000L, 6L)))
  }

  test("multiTouchCredit: k in-window touches share 1/k; same-µs and stale excluded") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "click", ts(1)), (1L, 2L, "click", ts(2)),
      (1L, 3L, "purchase", ts(3)),                       // k=2 → 0.5 each
      (2L, 4L, "purchase", ts(1)),                       // no touches → 0, null
      (3L, 5L, "click", ts(5)), (3L, 6L, "purchase", ts(5)), // same µs: excluded
      (4L, 7L, "click", ts(1)), (4L, 8L, "purchase", ts(30))) // beyond 10-min window
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Analytics.multiTouchCredit(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", "click", windowUs = 10L * 60 * 1000000)
      .select("id", "k_touches", "credit_each")
      .as[(Long, Long, Option[Double])].collect().toSet
    assert(got == Set((3L, 2L, Some(0.5)), (4L, 0L, None),
      (6L, 0L, None), (8L, 0L, None)))
  }

  test("trendOls: hand-computed slopes, negative trend, re-based x") {
    def ts(s: Int) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    // user 1: value = 2 + 0.01·x dollars at x = 0,10,20 s → slope
    // exactly 1 cent/sec; user 2: 5 − 0.02·x at x = 0,5 → −2 cents/sec
    val ev = Seq(
      (1L, ts(100), 2.00), (1L, ts(110), 2.10), (1L, ts(120), 2.20),
      (2L, ts(0), 5.00), (2L, ts(5), 4.90))
      .toDF("user_id", "ts", "value")
    val got = Analytics.trendOls(ev, "user_id", "ts", "value")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, Some(1.0)), (2L, 2L, Some(-2.0))))
  }

  test("trendOls: a single-instant user yields null, not a blow-up") {
    val t = new java.sql.Timestamp(1704067200000L)
    val ev = Seq((1L, t, 1.0), (1L, t, 9.0), (2L, t, 3.0))
      .toDF("user_id", "ts", "value")
    val got = Analytics.trendOls(ev, "user_id", "ts", "value")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, None), (2L, 1L, None)))
  }

  test("poissonBootstrapCi: constant values collapse the CI to the mean") {
    val t = new java.sql.Timestamp(1704067200000L)
    val ev = (1L to 100L).map(i => ("g", i, t, 7.0))
      .toDF("event_type", "event_id", "ts", "value")
    val got = Analytics.poissonBootstrapCi(ev, "event_type", "event_id",
        "value", reps = 64)
      .as[(String, Long, Double, Double, Double, Long)].head()
    // every resample of a constant has the same mean — the interval is
    // a point, and n_reps proves no replicate came up empty
    assert(got == (("g", 100L, 700.0, 700.0, 700.0, 64L)))
  }

  test("poissonBootstrapCi: CI brackets the point mean, groups isolated") {
    val t = new java.sql.Timestamp(1704067200000L)
    val ev = ((1L to 200L).map(i => ("a", i, t, (i % 10).toDouble)) ++
        (201L to 400L).map(i => ("b", i, t, 1000.0 + (i % 10))))
      .toDF("event_type", "event_id", "ts", "value")
    val got = Analytics.poissonBootstrapCi(ev, "event_type", "event_id",
        "value", reps = 64)
      .as[(String, Long, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    got.values.foreach { case (g, n, mean, lo, hi, nr) =>
      assert(n == 200 && nr == 64)
      assert(lo <= mean && mean <= hi, s"$g: [$lo, $hi] vs $mean")
      assert(lo < hi, s"$g: interval should have width on varied data")
    }
    // group b's values are ~1000 apart from a's — intervals must not mix
    assert(got("a")._5 < got("b")._4)
  }

  test("quantileNormalize: shifted source maps onto the pooled scale") {
    import spark.implicits._
    // source B is source A shifted +100: after normalization, A's k-th
    // value and B's k-th value map to the SAME pooled order statistic
    val a = Seq(10L, 20L, 30L, 40L).map(("A", _))
    val b = Seq(110L, 120L, 130L, 140L).map(("B", _))
    val df = (a ++ b).toDF("src", "score")
    val out = Analytics.quantileNormalize(df, "src", "score")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    // pooled sorted: 10,20,30,40,110,120,130,140 (N=8); rank r in a
    // 4-row group targets t = (r-1)*8/4 + 1 = 1,3,5,7
    assert(out(("A", 10L)) == 10L && out(("B", 110L)) == 10L)
    assert(out(("A", 20L)) == 30L && out(("B", 120L)) == 30L)
    assert(out(("A", 30L)) == 110L && out(("B", 130L)) == 110L)
    assert(out(("A", 40L)) == 130L && out(("B", 140L)) == 130L)
  }

  test("quantileNormalize: ties share one normalized value; counts kept") {
    import spark.implicits._
    val df = (Seq.fill(3)(("A", 5L)) ++ Seq(("A", 9L)) ++
      (1L to 4L).map(v => ("B", v * 10))).toDF("src", "score")
    val rows = Analytics.quantileNormalize(df, "src", "score").collect()
    val aTies = rows.filter(r => r.getString(0) == "A" && r.getLong(1) == 5L)
    assert(aTies.length == 1 && aTies.head.getLong(2) == 3L,
      "3 tied rows collapse to one mapping row carrying n=3")
    // single-group identity: a source whose distribution IS the pooled
    // one (modulo the other group) still maps monotonically
    val bVals = rows.filter(_.getString(0) == "B")
      .sortBy(_.getLong(1)).map(_.getLong(4))
    assert(bVals.sameElements(bVals.sorted), "monotone in the source value")
  }

  test("benfordProfile: hand counts, exact ppm, absent digit = 0 row") {
    import spark.implicits._
    // 10 positive values: digit 1 ×5, digit 2 ×3, digit 9 ×2; a zero and
    // a negative must be excluded
    val vals = Seq(1L, 10L, 150L, 19L, 1999L, 2L, 25L, 200L, 9L, 900L,
      0L, -5L).toDF("v")
    val rows = Analytics.benfordProfile(vals, col("v"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 9)
    assert(rows(1L) == ((1L, 5L, 10L, 500000L, 301030L, 198970L)))
    assert(rows(2L) == ((2L, 3L, 10L, 300000L, 176091L, 123909L)))
    assert(rows(9L) == ((9L, 2L, 10L, 200000L, 45757L, 154243L)))
    assert(rows(5L) == ((5L, 0L, 10L, 0L, 79181L, -79181L)))
    // pinned expectation table sums to exactly one million
    assert(rows.values.map(_._5).sum == 1000000L)
  }

  test("profileDrift: null-rate shift flags, stable column passes") {
    import spark.implicits._
    val oldDf = (1L to 10L).map(i => (i, Some(s"v$i"))).toDF("id", "s")
    // new snapshot: 4 of 10 values null (400000 ppm null shift), ids
    // stable (distinct ratio unchanged, no flag from that side)
    val newDf = (1L to 10L)
      .map(i => (i, if (i <= 4) None else Some(s"v$i"))).toDF("id", "s")
    val got = Analytics.profileDrift(oldDf, newDf, Seq("id", "s"),
        thresholdPpm = 100000)
      .select("col_name", "null_ppm_old", "null_ppm_new", "null_dppm",
        "drifted")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s") == (("s", 0L, 400000L, 400000L, true)))
    assert(got("id") == (("id", 0L, 0L, 0L, false)))
  }

  test("spearmanCorr: monotone ±1, ties exact, constant column null") {
    import spark.implicits._
    val df = Seq(
      // g=up: y strictly increases with x (nonlinearly) → ρ = 1
      ("up", 1L, 10L), ("up", 2L, 100L), ("up", 3L, 101L), ("up", 4L, 5000L),
      // g=down: strict inverse → ρ = -1
      ("down", 1L, 9L), ("down", 2L, 7L), ("down", 3L, 2L),
      // g=tie: x = (1,2,2,3), y = (1,5,5,9): tied middles share average
      // ranks on both sides → still a perfect monotone relation, ρ = 1
      ("tie", 1L, 1L), ("tie", 2L, 5L), ("tie", 2L, 5L), ("tie", 3L, 9L),
      // g=flat: constant y → zero variance → null
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L))
      .toDF("g", "x", "y")
    val got = Analytics.spearmanCorr(df, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("up") == ((4L, Some(1.0))))
    assert(got("down") == ((3L, Some(-1.0))))
    assert(got("tie") == ((4L, Some(1.0))))
    assert(got("flat") == ((3L, None)))
  }

  test("giniSplit: pure split is 0, mixed is exact ppm, parent row rides") {
    import spark.implicits._
    // feature A → labels {x,x} (pure); B → {x,y} (50/50);
    // parent = {x,x,x,y} → 1 - (9+1)/16 = 6/16 = 375000 ppm
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x"), ("B", "y"))
      .toDF("f", "l")
    val got = Analytics.giniSplit(df, "f", "l")
      .as[(String, Option[String], Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("value", Some("A"))) == ((2L, 0L)))
    assert(got(("value", Some("B"))) == ((2L, 500000L)))
    assert(got(("parent", None)) == ((4L, 375000L)))
  }

  test("weightedPercentiles: smallest value reaching the weighted rank") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 1L))
      .toDF("k", "v", "wt")
    val got = Analytics.weightedPercentiles(df, "k", "v", "wt",
        Seq(250, 500, 1000))
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // total weight 4: p250 needs cw >= 1 -> 1; p500 needs cw >= 2 -> 2
    // (cw(1)=1 misses, cw(2)=3 reaches); p1000 needs cw = 4 -> 3
    assert(got(250L) == ((1L, 4L)))
    assert(got(500L) == ((2L, 4L)))
    assert(got(1000L) == ((3L, 4L)))
    // a non-positive weight fails by name
    val e = intercept[Exception] {
      Analytics.weightedPercentiles(
        Seq(("g", 1L, 0L)).toDF("k", "v", "wt"), "k", "v", "wt",
        Seq(500)).collect()
    }
    assert(e.toString.contains("weightedPercentiles") ||
      Option(e.getCause).exists(_.toString.contains("weightedPercentiles")))
  }

  test("targetEncode: hand LOO/smoothed ppm, singleton null, bad label loud") {
    import spark.implicits._
    val df = Seq((1L, "A", 1L), (2L, "A", 0L), (3L, "A", 1L),
      (4L, "B", 0L)).toDF("id", "cat", "y")
    val got = Analytics.targetEncode(df, "id", "cat", "y", m = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getLong(5)))).toMap
    // prior = (1e6*2) div 4 = 500000
    // A: n=3 pos=2 -> smoothed = (2e6 + 20*500000) div 23 = 521739
    //    loo(y=1) = 1e6*1 div 2 = 500000; loo(y=0) = 1e6*2 div 2 = 1e6
    assert(got(1L) == ((3L, Some(500000L), 521739L)))
    assert(got(2L) == ((3L, Some(1000000L), 521739L)))
    assert(got(3L) == ((3L, Some(500000L), 521739L)))
    // B singleton: NO leakage-safe LOO exists -> null, never a fake
    // smoothed = (0 + 1e7) div 21 = 476190
    assert(got(4L) == ((1L, None, 476190L)))
    // a non-binary label fails by name
    val e = intercept[Exception] {
      Analytics.targetEncode(Seq((1L, "A", 2L)).toDF("id", "cat", "y"),
        "id", "cat", "y").collect()
    }
    assert(e.toString.contains("targetEncode") ||
      Option(e.getCause).exists(_.toString.contains("targetEncode")))
  }

  test("expectations: row rules (null = violated), uniqueness, fk orphans") {
    import spark.implicits._
    val t = Seq(
      (Some(1L), Some(10.0)), (Some(2L), Some(200.0)),
      (Some(2L), Some(-5.0)), (None, Option.empty[Double]))
      .toDF("id", "v")
    val rows = Analytics.expectRows(t, Seq(
        "id_not_null" -> col("id").isNull,
        // v in (0, 100]: the null-v row CANNOT evaluate -> violated
        "v_range" -> !(col("v") > 0 && col("v") <= 100)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows("id_not_null") == ((4L, 1L, 250000L, false)))
    // violations: 200 (range), -5 (range), null (unevaluable) = 3
    assert(rows("v_range") == ((4L, 3L, 750000L, false)))

    val uq = Analytics.expectUnique(t, "id_unique", Seq("id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4))).head
    // null-keyed row excluded; BOTH rows of the duplicated key count
    assert(uq == ((3L, 2L, false)))

    val parent = Seq(Tuple1(1L)).toDF("pid")
    val fk = Analytics.expectFk(t, parent, "id_fk", "id", "pid")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4))).head
    // 3 non-null children checked, the two id=2 rows are orphans
    assert(fk == ((3L, 2L, false)))

    // a clean table passes with 0 ppm
    val clean = Analytics.expectRows(parent,
      Seq("pid_not_null" -> col("pid").isNull)).collect().head
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L &&
      clean.getBoolean(4))
  }

  private def cvFrame(rows: (String, Option[String])*) =
    rows.toSeq.toDF("x", "y")

  test("cramersV: perfect 2×2 association scores exactly 1") {
    import spark.implicits._
    val rows = Seq.fill(5)(("A", Option("1"))) ++
      Seq.fill(5)(("B", Option("2")))
    val got = Analytics.cramersV(cvFrame(rows: _*), Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long, Option[Double])].head()
    // every cell term = (10·n − 25)²·1e6/250 = 2.5e6 → chi2_micro = 1e7
    assert(got == (("x", "y", 10L, 2L, 2L, 10000000L, Some(1.0))))
  }

  test("cramersV: independent uniform 2×2 scores 0") {
    import spark.implicits._
    val got = Analytics.cramersV(
        cvFrame(("A", Some("1")), ("A", Some("2")),
          ("B", Some("1")), ("B", Some("2"))),
        Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long, Option[Double])].head()
    assert(got._6 == 0L && got._7.contains(0.0))
  }

  test("cramersV: single-valued side emits null v, never a fake 0") {
    import spark.implicits._
    val got = Analytics.cramersV(
        cvFrame(("A", Some("1")), ("B", Some("1"))), Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long, Option[Double])].head()
    assert(got._5 == 1L && got._7.isEmpty)
  }

  test("cramersV: a null category is a category (null-safe lattice join)") {
    import spark.implicits._
    // y = null perfectly identifies x = A: association must be exactly 1
    val rows = Seq.fill(3)(("A", Option.empty[String])) ++
      Seq.fill(3)(("B", Option("2")))
    val got = Analytics.cramersV(cvFrame(rows: _*), Seq("x", "y"))
      .as[(String, String, Long, Long, Long, Long, Option[Double])].head()
    assert(got._4 == 2L && got._5 == 2L, "null must count as a category")
    assert(got._7.contains(1.0), s"got v=${got._7}")
  }

  test("cramersV: three columns emit all three pairs") {
    import spark.implicits._
    val df = Seq(("A", "1", "x"), ("B", "2", "y"), ("A", "2", "x"))
      .toDF("p", "q", "r")
    val got = Analytics.cramersV(df, Seq("p", "q", "r"))
      .select("col_a", "col_b").as[(String, String)].collect().toSet
    assert(got == Set(("p", "q"), ("p", "r"), ("q", "r")))
  }

  private def tau(rows: (String, Long, Long)*) =
    Analytics.kendallTau(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("kendallTau: perfect concordance and perfect reversal") {
    val got = tau(("up", 1, 1), ("up", 2, 2), ("up", 3, 3),
      ("dn", 1, 3), ("dn", 2, 2), ("dn", 3, 1))
    assert(got("up") == (("up", 3L, 3L, 0L, Some(1.0))))
    assert(got("dn") == (("dn", 3L, 0L, 3L, Some(-1.0))))
  }

  test("kendallTau: hand τ-b under ties on both axes") {
    // (1,1),(1,2),(2,1): P=0, Q=1 (the (1,2)-(2,1) pair), one x-tie
    // pair and one y-tie pair → dx = dy = 2, τ-b = −1/√4 = −0.5
    val got = tau(("g", 1, 1), ("g", 1, 2), ("g", 2, 1))
    assert(got("g") == (("g", 3L, 0L, 1L, Some(-0.5))))
  }

  test("kendallTau: an all-tied axis yields null, never a fake 0") {
    val got = tau(("g", 7, 1), ("g", 7, 2), ("g", 7, 3))
    assert(got("g")._5.isEmpty, s"got ${got("g")}")
  }

  test("kendallTau: within-cell duplicates multiply pair counts") {
    // two copies of (1,1) against one (2,2): P = 2·1 = 2
    val got = tau(("g", 1, 1), ("g", 1, 1), ("g", 2, 2))
    assert(got("g")._3 == 2L && got("g")._4 == 0L)
  }

  private def iso(nBins: Int, rows: (Long, Long)*) =
    Analytics.isotonicCalibration(rows.toDF("s", "y"), "s", "y", nBins)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("isotonicCalibration: hand PAVA pools the violating pair") {
    // bin rates 0, 1, 0, 1 → PAVA fit 0, ½, ½, 1 (middle two pooled)
    val rows = Seq(
      (0L, 0L), (0L, 0L), (250000L, 1L), (250000L, 1L),
      (500000L, 0L), (500000L, 0L), (750000L, 1L), (750000L, 1L))
    val got = iso(4, rows: _*)
    assert(got.map(_._5) == Seq(0L, 500000L, 500000L, 1000000L), s"$got")
  }

  test("isotonicCalibration: an already-monotone profile is unchanged") {
    val rows = Seq((0L, 0L), (0L, 0L), (400000L, 1L), (400000L, 0L),
      (900000L, 1L), (900000L, 1L))
    val got = iso(4, rows: _*)
    assert(got.map(_._5) == got.map(_._4), s"$got")
  }

  test("isotonicCalibration: fit is monotone nondecreasing by construction") {
    // adversarial zig-zag over 8 bins
    val rows = (0 until 8).flatMap { b =>
      val pos = if (b % 2 == 0) 3 else 1
      (0 until 4).map(i => ((b * 125000).toLong, if (i < pos) 1L else 0L))
    }
    val fit = iso(8, rows: _*).map(_._5)
    assert(fit == fit.sorted, s"not monotone: $fit")
  }

  test("dwellTime: lead-based spells, open last interval excluded") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    // user 1: view(0) → click(10) → view(15) → [open]
    // user 2: click(0) → [open]
    val rows = Seq((1L, t(0), "view", 1L), (1L, t(10), "click", 2L),
      (1L, t(15), "view", 3L), (2L, t(0), "click", 4L))
      .toDF("u", "ts", "st", "id")
    val got = Analytics.dwellTime(rows, "u", "ts", "st", "id")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("view") == (("view", 1L, 600000L, 600000L, 600000L)))
    assert(got("click") == (("click", 1L, 300000L, 300000L, 300000L)),
      "user 2's open click spell must not appear")
    assert(got.size == 2)
  }

  test("mutualInfo: perfect dependence = ln 2, independence = 0") {
    val dep = Seq(("A", "1"), ("A", "1"), ("B", "2"), ("B", "2"))
      .toDF("x", "y")
    val gotDep = Analytics.mutualInfo(dep, Seq("x", "y"))
      .select("mi_nats").as[Double].head()
    assert(math.abs(gotDep - math.log(2)) < 1e-6, s"$gotDep")
    val ind = Seq(("A", "1"), ("A", "2"), ("B", "1"), ("B", "2"))
      .toDF("x", "y")
    val gotInd = Analytics.mutualInfo(ind, Seq("x", "y"))
      .select("mi_nats").as[Double].head()
    assert(gotInd == 0.0, s"$gotInd")
  }

  test("mutualInfo: null categories are categories") {
    val df = Seq((Some("A"), "1"), (None, "2"), (None, "2"))
      .toDF("x", "y")
    val got = Analytics.mutualInfo(df, Seq("x", "y"))
      .select("occupied_cells", "mi_nats").as[(Long, Double)].head()
    assert(got._1 == 2L, "null x must form its own cell")
    assert(math.abs(got._2 - (math.log(3.0) - (2.0 / 3) * math.log(2)))
      < 1e-6, s"$got")
  }

  private def kmDay(d: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
      + d * 86400000L)

  test("kaplanMeier: hand survival with censoring (never drops, never churns)") {
    // deaths: two at t=1, one at t=2; censored: t=2 and t=3 lifetimes
    // ending on the horizon day → S(1)=3/5, S(2)=(3/5)·(2/3)=2/5
    val rows = Seq(
      ("g", 1L, 0), ("g", 1L, 1), ("g", 2L, 0), ("g", 2L, 1),
      ("g", 3L, 0), ("g", 3L, 2),
      ("g", 4L, 8), ("g", 4L, 10), ("g", 5L, 7), ("g", 5L, 10))
      .map { case (g, e, d) => (g, e, kmDay(d)) }
      .toDF("g", "e", "ts")
    // 2024-01-11 is epoch day 19733
    val got = Analytics.kaplanMeier(rows, "g", "e", "ts", censorDay = 19733L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(got(1L) == (("g", 1L, 2L, 5L, 600000L)), s"$got")
    assert(got(2L) == (("g", 2L, 1L, 3L, 400000L)), s"$got")
    assert(got.size == 2, "censored lifetimes must not create steps")
  }

  test("kaplanMeier: without censoring, S(t) is the empirical survivor") {
    // lifetimes 0,1,1,2 all observed → S(0)=3/4, S(1)=1/4, S(2)=0
    val rows = Seq((1L, 0, 0), (2L, 0, 1), (3L, 0, 1), (4L, 0, 2))
      .flatMap { case (e, d0, d1) =>
        Seq(("g", e, kmDay(d0)), ("g", e, kmDay(d1))) }
      .toDF("g", "e", "ts")
    val got = Analytics.kaplanMeier(rows, "g", "e", "ts", censorDay = 99999L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(got == Map(0L -> 750000L, 1L -> 250000L, 2L -> 0L), s"$got")
  }

  private def sess(splitMin: Int, rows: (Long, Int, Long)*) = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    Analytics.resumableSessionize(
      rows.map { case (u, min, id) =>
        (u, new java.sql.Timestamp(base + min * 60000L), id)
      }.toDF("u", "t", "id"),
      "u", "t", "id", gapUs = 30L * 60000000L,
      splitUs = (base + splitMin * 60000L) * 1000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
  }

  test("resumableSessionize: a session straddling the cut is stitched") {
    // user 1: events at 0, 10 | cut at 15 | 20, 70 → the 20-min event
    // continues session 1 (gap 10 < 30); 70 starts session 2
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val got = sess(15, (1L, 0, 1L), (1L, 10, 2L), (1L, 20, 3L), (1L, 70, 4L))
    assert(got((1L, 1L)) == ((3L, base, base + 20 * 60000L)), s"$got")
    assert(got((1L, 2L)) == ((1L, base + 70 * 60000L, base + 70 * 60000L)))
  }

  test("resumableSessionize: a gap at the cut starts a fresh session") {
    val got = sess(15, (1L, 0, 1L), (1L, 50, 2L))
    assert(got.keySet == Set((1L, 1L), (1L, 2L)), s"$got")
  }

  test("resumableSessionize: keys born after the cut start at session 1") {
    val got = sess(15, (2L, 20, 1L), (2L, 25, 2L))
    assert(got.keySet == Set((2L, 1L)) && got((2L, 1L))._1 == 2L, s"$got")
  }

  test("resumableSessionize: two-phase output equals the single pass") {
    // law check on a mixed fixture: resume at any cut must reproduce
    // the full-batch result (here: cut=0 → everything in phase 2)
    val rows = Seq((1L, 0, 1L), (1L, 29, 2L), (1L, 59, 3L), (1L, 95, 4L),
      (2L, 5, 5L), (2L, 40, 6L), (3L, 90, 7L))
    val cuts = Seq(0, 15, 45, 200)
    val all = cuts.map(c => sess(c, rows: _*))
    assert(all.distinct.size == 1, s"resume law broken: $all")
  }

  test("simpsonFlip: planted reversal flips, pooled row never does") {
    // classic construction: within each stratum y falls as x rises,
    // but stratum B sits at both higher x and higher y — pooled trend
    // rises while every stratum falls
    val rows = Seq(
      ("A", 0L, 10L), ("A", 1L, 8L), ("A", 2L, 6L),
      ("B", 10L, 30L), ("B", 11L, 28L), ("B", 12L, 26L))
    val got = Analytics.simpsonFlip(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A")._3 == -1L && got("B")._3 == -1L)
    assert(got("ALL")._4 == 1L && !got("ALL")._5)
    assert(got("A")._5 && got("B")._5, s"$got")
  }

  test("simpsonFlip: zero-variance stratum signs 0 and never flips") {
    val rows = Seq(("A", 1L, 5L), ("A", 2L, 5L), ("B", 1L, 1L), ("B", 2L, 2L))
    val got = Analytics.simpsonFlip(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A")._3 == 0L && !got("A")._5)
    assert(got("B")._3 == 1L)
  }

  test("isotonicCalibration: empty bins collapse out of the lattice") {
    // only bins 0 and 3 populated — indices stay dense, fit well-defined
    val got = iso(4, (0L, 0L), (999999L, 1L))
    assert(got.map(_._1) == Seq(0L, 3L) &&
      got.map(_._5) == Seq(0L, 1000000L))
  }

  test("wasserstein1d: hand 4/3 on separated masses, identical = 0") {
    val df = (Seq(("a", 0L), ("a", 0L), ("a", 2L)) ++
      Seq(("b", 2L), ("b", 2L), ("b", 2L)) ++
      Seq(("c", 0L), ("c", 0L), ("c", 2L))).toDF("g", "v")
    val got = Analytics.wasserstein1d(df, "g", "v", Seq("a", "b", "c"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // a vs b: |F_a - F_b| = 2/3 over [0,2) → W1 = 4/3 → 1333333 micro
    assert(got(("a", "b")) == 1333333L, s"$got")
    assert(got(("a", "c")) == 0L && got(("b", "c")) == 1333333L)
  }

  test("basketRules: confidence directed, lift symmetric, support prunes") {
    val df = Seq(("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "z")).toDF("bk", "item")
    val got = Analytics.basketRules(df, "bk", "item", minPairSupport = 2)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // n_xy=2, n_x=3, n_y=2, N=3: conf x→y = 666666, lift = 1e6 both ways
    assert(got(("x", "y")) == (("x", "y", 2L, 3L, 2L, 666666L, 1000000L)))
    assert(got(("y", "x")) == (("y", "x", 2L, 2L, 3L, 1000000L, 1000000L)))
    assert(got.size == 2) // the support-1 (x,z) pair is pruned
  }

  test("diffInDiff: nets out cohort level and common trend") {
    val df = Seq((true, false, 1.0), (true, false, 3.0), (true, true, 5.0),
      (false, false, 2.0), (false, true, 3.0)).toDF("t", "p", "v")
    val got = Analytics.diffInDiff(df, "t", "p", "v")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // means: t_pre 2e6, t_post 5e6, c_pre 2e6, c_post 3e6 → DiD 2e6
    assert(got == ((2L, 2000000L, 1L, 5000000L, 1L, 2000000L, 1L,
      3000000L, 2000000L)), s"$got")
  }

  test("episodeSupport: step gap binds inside a session") {
    def ev(u: Long, id: Long, s: Long, et: String) =
      (u, id, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(s)), et)
    val df = Seq(
      // u1: view→click→purchase, 100 s steps → hit
      ev(1L, 1L, 0, "view"), ev(1L, 2L, 100, "click"),
      ev(1L, 3L, 200, "purchase"),
      // u2: click 10 min after view — same session, step gap 5 min → miss
      ev(2L, 4L, 0, "view"), ev(2L, 5L, 600, "click"),
      ev(2L, 6L, 700, "purchase"),
      // u3: no steps at all
      ev(3L, 7L, 0, "error"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Analytics.episodeSupport(df,
        Seq("view", "click", "purchase"),
        sessionGapUs = 3600L * 1000000L, stepGapUs = 300L * 1000000L)
      .as[(Long, Long, Option[Long])].head()
    assert(got == ((3L, 1L, Some(333333L))), s"$got")
  }

  test("neymanAllocation: volatile strata win, remainder pinned") {
    val df = (Seq(("a", 0L), ("a", 4L)) ++ Seq.fill(3)(("b", 1L)) ++
      Seq(("c", 0L), ("c", 2L))).toDF("h", "v")
    val got = Analytics.neymanAllocation(df, "h", "v", nSample = 10)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // std_micro: a 2828427 (√8), b 0, c 1414214 (√2); bases 6/0/3,
    // leftover 1 goes to a (largest remainder)
    assert(got("a") == (("a", 2L, 2828427L, Some(7L))), s"${got("a")}")
    assert(got("b") == (("b", 3L, 0L, Some(0L))), s"${got("b")}")
    assert(got("c") == (("c", 2L, 1414214L, Some(3L))), s"${got("c")}")
  }

  test("keyCandidates: per-combo uniqueness, nulls break keys") {
    val df = Seq((Some(1L), Some("x")), (Some(2L), Some("x")),
      (Some(3L), None: Option[String])).toDF("id", "v")
    val got = Analytics.keyCandidates(df,
        Seq(Seq("id"), Seq("v"), Seq("id", "v")))
      .as[(String, Long, Long, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 3L, 3L, 3L, Some(1000000L), true)))
    assert(got("v") == (("v", 3L, 2L, 1L, Some(500000L), false)))
    assert(got("id,v") == (("id,v", 3L, 2L, 2L, Some(1000000L), false)))
  }

  test("positionAttribution: U-shape 40/20/40, pair 50/50, solo 100%") {
    def ev(u: Long, id: Long, s: Long, et: String) =
      (u, id, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(s)), et)
    val df = Seq(
      // u1: click, view, click → purchase (k=3)
      ev(1L, 1L, 10, "click"), ev(1L, 2L, 20, "view"),
      ev(1L, 3L, 30, "click"), ev(1L, 4L, 40, "purchase"),
      // u2: view → purchase (k=1)
      ev(2L, 5L, 10, "view"), ev(2L, 6L, 20, "purchase"),
      // u3: click, view → purchase (k=2)
      ev(3L, 7L, 10, "click"), ev(3L, 8L, 20, "view"),
      ev(3L, 9L, 30, "purchase"))
      .toDF("u", "id", "ts", "et")
    val got = Analytics.positionAttribution(df, "u", "ts", "id", "et",
        "purchase", Seq("click", "view"), windowUs = 3600L * 1000000L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // click: u1 first+last 800000, u3 first 500000 → 1300000 over 3 touches
    assert(got("click") == (("click", 3L, 2L, 1300000L)), s"${got("click")}")
    // view: u1 middle 200000, u2 solo 1000000, u3 last 500000
    assert(got("view") == (("view", 3L, 3L, 1700000L)), s"${got("view")}")
  }

  test("cuped: hand theta, adjusted means, rho2") {
    // x,y pairs: ctrl (1,2),(3,4); treat (2,4),(4,6)
    // θ = cov/var = 24/20 = 1.2, ρ² = 576/(20·32) = 0.9, x̄ = 2.5
    // ctrl: ȳ 3 → adj 3 − 1.2·(2−2.5) = 3.6
    // treat: ȳ 5 → adj 5 − 1.2·(3−2.5) = 4.4
    val df = Seq((1L, 2L, false), (3L, 4L, false),
      (2L, 4L, true), (4L, 6L, true)).toDF("x", "y", "t")
    val got = Analytics.cuped(df, "x", "y", "t")
      .as[(Boolean, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got(false) == ((false, 2L, Some(3.0), Some(3.6), Some(1.2),
      Some(0.9))), s"${got(false)}")
    assert(got(true) == ((true, 2L, Some(5.0), Some(4.4), Some(1.2),
      Some(0.9))), s"${got(true)}")
  }

  test("cuped: zero pre-period variance releases null theta/adjusted") {
    val df = Seq((5L, 2L, false), (5L, 4L, true)).toDF("x", "y", "t")
    val got = Analytics.cuped(df, "x", "y", "t")
      .as[(Boolean, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got.forall(r => r._4.isEmpty && r._5.isEmpty && r._6.isEmpty),
      got.mkString(","))
    assert(got.map(r => r._1 -> r._3).toMap ==
      Map(false -> Some(2.0), true -> Some(4.0)))
  }

  test("theilIndex: equal group zero, skewed group hand value") {
    // a: three members of 2 → perfectly equal → T_a = 0
    // b: members 1 and 3 → num = 1·ln(2/4)·1e6 + 3·ln(6/4)·1e6
    //   = −693147 + 3·405465 → T_b = 523248 div 4 = 130812 micro
    // group means both 2 → between terms 0
    val df = Seq(("a", 2L), ("a", 2L), ("a", 2L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    val got = Analytics.theilIndex(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 6L, 600000L, 0L, Some(0.0))),
      s"${got("a")}")
    assert(got("b") == (("b", 2L, 4L, 400000L, 130812L, Some(0.0))),
      s"${got("b")}")
  }

  test("requiredSampleSize: textbook 10%→11% needs 14751 per arm") {
    // p1 = 0.1, relative MDE 10% → p2 = 0.11; α = .05 two-sided,
    // power 0.8: n = (1.959964·√(2·p̄q̄) + 0.841621·√(p1q1+p2q2))²/δ²
    val df = ((1 to 10).map(_ => ("g", 1L)) ++
      (1 to 90).map(_ => ("g", 0L)) ++ Seq(("z", 0L))).toDF("g", "y")
    val got = Analytics.requiredSampleSize(df, "g", "y")
      .as[(String, Long, Long, Double, Double, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 100L, 10L, 0.1, 0.11, Some(14751L))),
      s"${got("g")}")
    // zero baseline rate → no finite design
    assert(got("z") == (("z", 1L, 0L, 0.0, 0.0, None)), s"${got("z")}")
  }

  test("calibrationError: exact integer ECE/MCE over width bins") {
    // bin0: scores .2,.2 no positives → gap 400000
    // bin1: scores .8,.6 both positive → gap |1400000−2000000| = 600000
    // ECE = 1000000 div 4 = 250000; MCE = 600000 div 2 = 300000
    val df = Seq((0.2, false), (0.2, false), (0.8, true), (0.6, true))
      .toDF("score", "y")
    val got = Analytics.calibrationError(df, "score", "y", nBins = 2)
      .as[(Long, Long, Option[Long], Long)].head()
    assert(got == ((4L, 2L, Some(250000L), 300000L)), s"$got")
  }

  test("holmBonferroni: step-down blocks everything after first fail") {
    // sorted p·(m−i+1): 1000·3 ✓, 30000·2 = 60000 ✗ → stop; the
    // rank-3 p (40000·1 ≤ 50000) would pass alone but is blocked
    val tests = Seq(("t1", 1000L), ("t2", 30000L), ("t3", 40000L))
      .toDF("id", "p_ppm")
    val got = Analytics.holmBonferroni(tests, "id", "p_ppm")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("t1" -> true, "t2" -> false, "t3" -> false),
      got.toString)
  }

  test("holmBonferroni: all pass when every step clears alpha") {
    val tests = Seq(("t1", 1000L), ("t2", 5000L), ("t3", 30000L))
      .toDF("id", "p_ppm")
    val got = Analytics.holmBonferroni(tests, "id", "p_ppm")
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(_._4), got.mkString(","))
  }

  test("leaveOneOutInfluence: closed-form deltas from one aggregate") {
    // a: {1,2}, b: {6} → overall mean 3; drop a → 6 (+3);
    // drop b → 1.5 (−1.5)
    val df = Seq(("a", 1L), ("a", 2L), ("b", 6L)).toDF("g", "v")
    val got = Analytics.leaveOneOutInfluence(df, "g", "v")
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 3.0, Some(6.0), Some(3.0))),
      s"${got("a")}")
    assert(got("b") == (("b", 1L, 3.0, Some(1.5), Some(-1.5))),
      s"${got("b")}")
  }

  test("leaveOneOutInfluence: sole group releases null") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val got = Analytics.leaveOneOutInfluence(df, "g", "v")
      .as[(String, Long, Double, Option[Double], Option[Double])].head()
    assert(got == (("a", 2L, 1.5, None, None)), s"$got")
  }

  test("stratifiedAte: one-armed stratum excluded from the fold") {
    // h1: t{4,6} vs c{1,3} → diff 3e6; h2: t{10} vs c{4} → 6e6;
    // h3: t-only → null, excluded. ATE = (4·3e6 + 2·6e6) div 6 = 4e6
    val df = Seq(("h1", true, 4L), ("h1", true, 6L), ("h1", false, 1L),
      ("h1", false, 3L), ("h2", true, 10L), ("h2", false, 4L),
      ("h3", true, 7L)).toDF("h", "t", "v")
    val got = Analytics.stratifiedAte(df, "h", "t", "v")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("h1") == (("h1", 2L, 2L, Some(3000000L), Some(666666L),
      Some(4000000L))), s"${got("h1")}")
    assert(got("h2") == (("h2", 1L, 1L, Some(6000000L), Some(333333L),
      Some(4000000L))), s"${got("h2")}")
    assert(got("h3") == (("h3", 1L, 0L, None, None, Some(4000000L))),
      s"${got("h3")}")
  }

  test("mantelHaenszel: pooled OR from micro-pinned stratum terms") {
    // s1 2×2 = (2,1,1,2), s2 = (1,1,1,1):
    // R = 666667 + 250000, S = 166667 + 250000 → OR = 2.199999
    def cell(h: String, t: Boolean, y: Boolean, k: Int) =
      Seq.fill(k)((h, t, y))
    val df = (cell("s1", true, true, 2) ++ cell("s1", true, false, 1) ++
      cell("s1", false, true, 1) ++ cell("s1", false, false, 2) ++
      cell("s2", true, true, 1) ++ cell("s2", true, false, 1) ++
      cell("s2", false, true, 1) ++ cell("s2", false, false, 1))
      .toDF("h", "t", "y")
    val got = Analytics.mantelHaenszel(df, "h", "t", "y")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(got == ((2L, 916667L, 416667L, Some(2.199999))), s"$got")
  }

  test("mantelHaenszel: no discordant cells anywhere yields null") {
    val df = Seq(("s1", true, true), ("s1", false, false))
      .toDF("h", "t", "y")
    val got = Analytics.mantelHaenszel(df, "h", "t", "y")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(got._4.isEmpty && got._2 == 500000L, s"$got")
  }

  test("runsTest: alternation and clumping score opposite signs") {
    // a: TFTFTF → 6 runs, z = +1.825742 (over-alternating)
    // c: TTFF → 2 runs, z = −1.224745 (clumped)
    // b: one-sided → null
    val rows = Seq(("a", true), ("a", false), ("a", true), ("a", false),
      ("a", true), ("a", false), ("b", true), ("b", true),
      ("c", true), ("c", true), ("c", false), ("c", false))
      .zipWithIndex.map { case ((k, x), i) => (k, i.toLong, i.toLong, x) }
    val got = Analytics.runsTest(rows.toDF("k", "o", "tie", "x"),
        "k", "o", "tie", "x")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 6L, 3L, 3L, 6L, Some(1.825742))),
      s"${got("a")}")
    assert(got("c") == (("c", 4L, 2L, 2L, 2L, Some(-1.224745))),
      s"${got("c")}")
    assert(got("b") == (("b", 2L, 2L, 0L, 1L, None)), s"${got("b")}")
  }

  test("theilsU: asymmetric direction reads determination") {
    // (a,1)x2 (b,1) (b,2): A→B partially determined, B→A more
    val df = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 2L))
      .toDF("s", "l")
    val got = Analytics.theilsU(df, "s", "l")
      .as[(String, String, Long, Long, Double, Option[Double],
        Option[Double])].head()
    assert(got == (("s", "l", 4L, 3L, 0.215762, Some(0.311278),
      Some(0.383689))), s"$got")
  }

  test("theilsU: constant column nulls its own direction") {
    val df = Seq(("a", 1L), ("b", 1L)).toDF("s", "l")
    val got = Analytics.theilsU(df, "s", "l")
      .as[(String, String, Long, Long, Double, Option[Double],
        Option[Double])].head()
    // H(l) = 0 → U(l|s) null; MI = 0 → U(s|l) = 0
    assert(got._5 == 0.0 && got._6 == Some(0.0) && got._7.isEmpty,
      s"$got")
  }

  test("funnelLatency: exact type-1 percentiles over converted sessions") {
    // four users convert in 10/20/30/40 min → p50 ceil(2)=2nd value,
    // p90/p99 ceil(3.6)/ceil(3.96) = 4th value
    val rows = (1 to 4).flatMap { u =>
      Seq(ev(u * 10L, u.toLong, "view", 0),
        ev(u * 10L + 1, u.toLong, "click", u * 5),
        ev(u * 10L + 2, u.toLong, "purchase", u * 10))
    }
    val got = Analytics.funnelLatency(
        rows.toDF("event_id", "user_id", "event_type", "ts"),
        Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(50L) == ((50L, 4L, 1200000L)), s"${got(50L)}")
    assert(got(90L) == ((90L, 4L, 2400000L)), s"${got(90L)}")
    assert(got(99L) == ((99L, 4L, 2400000L)), s"${got(99L)}")
  }

  test("theilIndex: non-positive values are excluded by contract") {
    val df = Seq(("a", 1L), ("a", 0L), ("a", -3L)).toDF("g", "v")
    val got = Analytics.theilIndex(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect()
    assert(got.toSeq == Seq(("a", 1L, 1L, 1000000L, 0L, Some(0.0))),
      got.mkString(","))
  }

  test("ipfRaking: one hand-traced round of alternating integer scales") {
    // cells (r1,c1)=1, (r1,c2)=3, (r2,c1)=1; all targets 2.
    // row: r1 sc=2e12/4e6=5e5 → 5e5/1.5e6; r2 sc=2e6 → 2e6.
    // col: c1 sc=2e12/2.5e6=8e5 → 4e5/1.6e6;
    //      c2 sc=2e12/1.5e6=1333333 → 1.5e6·1333333 div 1e6 = 1999999.
    val df = (Seq(("r1", "c1")) ++ Seq.fill(3)(("r1", "c2")) ++
      Seq(("r2", "c1"))).toDF("r", "c")
    val got = Analytics.ipfRaking(df, "r", "c",
        Seq("r1" -> 2L, "r2" -> 2L), Seq("c1" -> 2L, "c2" -> 2L),
        iters = 1)
      .as[(String, String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(got(("r1", "c1")) == (("r1", "c1", 1L, 400000L)))
    assert(got(("r1", "c2")) == (("r1", "c2", 3L, 1999999L)))
    assert(got(("r2", "c1")) == (("r2", "c1", 1L, 1600000L)))
  }

  test("ipfRaking: converges onto both marginals; off-target rows drop") {
    // skewed 2×2 plus a category absent from the targets (dropped)
    val df = (Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(1)(("b", "x")) ++ Seq.fill(9)(("b", "y")) ++
      Seq.fill(5)(("zz", "x"))).toDF("r", "c")
    val got = Analytics.ipfRaking(df, "r", "c",
        Seq("a" -> 10L, "b" -> 10L), Seq("x" -> 10L, "y" -> 10L),
        iters = 8)
      .as[(String, String, Long, Long)].collect()
    assert(!got.exists(_._1 == "zz")) // targets define the frame
    val rowSum = got.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    val colSum = got.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    // IPF converges geometrically (only the LAST-scaled axis is exact
    // per round): after 8 rounds both marginals sit within 1% of the
    // 10·10⁶-micro targets on this deliberately skewed table
    for (m <- rowSum.values ++ colSum.values)
      assert(math.abs(m - 10000000L) < 100000L,
        s"${rowSum.toMap} ${colSum.toMap}")
  }

  test("ipfRaking: corpus-scale targets survive the ·10¹² scale step") {
    // target 10¹⁰ (token-budget scale): the micro ratio 10¹⁰·10¹²
    // overflows a plain-Long multiply (wraps at ~9.2e6 targets in
    // non-ANSI mode — the round-14 advice fix widens to decimal(38)).
    // Hand trace on one cell (n=2): w0 = 2e6; row sc = 1e22 div 2e6 =
    // 5e15 → w = 1e16; col sc = 1e22 div 1e16 = 1e6 → w unchanged.
    val df = Seq(("r1", "c1"), ("r1", "c1")).toDF("r", "c")
    val got = Analytics.ipfRaking(df, "r", "c",
        Seq("r1" -> 10000000000L), Seq("c1" -> 10000000000L), iters = 1)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("r1", "c1", 2L, 10000000000000000L)))
  }
}
