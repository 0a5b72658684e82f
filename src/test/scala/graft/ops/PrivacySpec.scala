package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, nation, segment, payload): nation/segment are the QI
  private val df = Seq(
    (1L, "US", "AUTO", 1.0), (2L, "US", "AUTO", 2.0), (3L, "US", "AUTO", 3.0),
    (4L, "FR", "BIKE", 4.0), (5L, "FR", "BIKE", 5.0),
    (6L, "DE", "SHIP", 6.0)).toDF("id", "nat", "seg", "v")

  test("groups below k are suppressed, at-or-above k survive") {
    val got = Privacy.kAnonymize(df, Seq("nat", "seg"), k = 2)
      .select("id", "nat", "seg", "group_size", "suppressed")
      .as[(Long, Option[String], Option[String], Long, Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, Some("US"), Some("AUTO"), 3L, false),
      (2L, Some("US"), Some("AUTO"), 3L, false),
      (3L, Some("US"), Some("AUTO"), 3L, false),
      (4L, Some("FR"), Some("BIKE"), 2L, false),
      (5L, Some("FR"), Some("BIKE"), 2L, false),
      (6L, None, None, 1L, true)))
  }

  test("non-QI columns pass through untouched; no rows dropped") {
    val out = Privacy.kAnonymize(df, Seq("nat", "seg"), k = 5)
    assert(out.count() == 6)
    assert(out.select(sum("v")).as[Double].head() == 21.0)
  }

  test("null QI values group together, as PARTITION BY defines") {
    val withNulls = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "X")).toDF("id", "nat")
    val got = Privacy.kAnonymize(withNulls, Seq("nat"), k = 2)
      .select("id", "group_size", "suppressed")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 2L, false), (2L, 2L, false), (3L, 1L, true)))
  }

  test("dpNoisyCounts: seeded noise is replayable, seed-sensitive, Laplace") {
    import spark.implicits._
    val df = (Seq.fill(40)("a") ++ Seq.fill(10)("b")).toDF("g")
    def run(seed: Long) = Privacy.dpNoisyCounts(df, "g", epsilon = 0.5, seed)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val r1 = run(1L)
    assert(r1("a")._1 == 40L && r1("b")._1 == 10L)
    // replayable: same seed, same noise
    assert(run(1L) == r1)
    // seed rotation re-draws
    assert(run(2L) != r1)
    // hand-recompute the inverse-CDF draw for one group
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("dp|1|a".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(2, 60)
    val want = BigDecimal(40.0 - 2.0 * math.signum(u - 0.5) *
      math.log(1.0 - 2.0 * math.abs(u - 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1("a")._2 == want)
  }

  test("dpNoisyCounts rejects non-positive epsilon") {
    import spark.implicits._
    val df = Seq("a").toDF("g")
    intercept[IllegalArgumentException] {
      Privacy.dpNoisyCounts(df, "g", epsilon = 0.0)
    }
  }

  test("lDiversity: homogeneous group flagged, diverse group passes") {
    import spark.implicits._
    // QI group A: 4 rows, ONE sensitive value (k-safe, l-broken);
    // QI group B: 3 rows, 3 distinct values (l=3 diverse)
    val rows = Seq(
      ("A", "s1"), ("A", "s1"), ("A", "s1"), ("A", "s1"),
      ("B", "s1"), ("B", "s2"), ("B", "s3")).toDF("qi", "sv")
    val got = Privacy.lDiversity(rows, Seq("qi"), "sv", l = 3)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("A") == ((4L, 1L, 1000000L, false)))
    assert(got("B") == ((3L, 3L, 333333L, true))) // floor(1e6/3)
  }

  test("tCloseness: hand TV distance, absent values count, flag at t") {
    import spark.implicits._
    // global: x ×4, y ×4 (50/50). class A: 4 rows all x → TV = ½(|½|+|−½|)
    // = ½ → 500000 ppm. class B: 2x + 2y → TV = 0.
    val rows = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "x"), ("B", "y"), ("B", "y"),
      ("C", "y"), ("C", "y")).toDF("qi", "sv")
    // recompute globals with C included: x ×6, y ×4 over n=10
    // A: p=(1,0) vs (0.6,0.4) → TV = ½(0.4+0.4) = 0.4 → 400000
    // B: p=(0.5,0.5) vs (0.6,0.4) → TV = ½(0.1+0.1) = 0.1 → 100000
    // C: p=(0,1) vs (0.6,0.4) → TV = 0.6 → 600000
    val got = Privacy.tCloseness(rows, Seq("qi"), "sv", tPpm = 400000)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") == ((4L, 400000L, true)))
    assert(got("B") == ((4L, 100000L, true)))
    assert(got("C") == ((2L, 600000L, false)))
  }

  test("tCloseness: a null-QI class matches its own cells (null-safe join)") {
    import spark.implicits._
    // class NULL: 2x + 2y — identical to the global mix once D is added
    // so TV must be computed from ITS cells, not coalesce to ~500000.
    // globals: x ×4, y ×4 over n=8 → p_g = (0.5, 0.5)
    // NULL: (0.5, 0.5) → TV = 0. D: (0.5, 0.5) → TV = 0.
    val rows = Seq((Option.empty[String], "x"), (Option.empty[String], "x"),
      (Option.empty[String], "y"), (Option.empty[String], "y"),
      (Option("D"), "x"), (Option("D"), "x"),
      (Option("D"), "y"), (Option("D"), "y")).toDF("qi", "sv")
    val got = Privacy.tCloseness(rows, Seq("qi"), "sv", tPpm = 100000)
      .as[(Option[String], Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(None) == ((4L, 0L, true)))
    assert(got(Some("D")) == ((4L, 0L, true)))
  }

  test("lDiversity rejects empty QI and l < 1") {
    import spark.implicits._
    val df = Seq(("a", "s")).toDF("qi", "sv")
    intercept[IllegalArgumentException] {
      Privacy.lDiversity(df, Seq.empty, "sv", l = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversity(df, Seq("qi"), "sv", l = 0)
    }
  }

  test("generalizationLadder: minimum meeting level chosen, whole ladder visible") {
    import spark.implicits._
    // u in 0..7, one row each: level 0 singletons, level 1 pairs,
    // level 2 quads, level 3 one class of 8
    val df = (0L until 8L).map(Tuple1(_)).toDF("u")
    def ladder(maxL: Int) = (0 to maxL).map { l =>
      l -> Seq(expr(s"u div ${1L << l}L"))
    }
    val got = Privacy.generalizationLadder(df, ladder(3), k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(got(0L) == ((8L, 1L, false, false)))
    assert(got(1L) == ((4L, 2L, false, false)))
    assert(got(2L) == ((2L, 4L, true, true)), "minimum meeting level wins")
    assert(got(3L) == ((1L, 8L, true, false)), "coarser levels meet but lose")
    // no level meets k: nothing chosen, never a silent coarsest pick
    val none = Privacy.generalizationLadder(df, ladder(1), k = 4)
      .collect().map(_.getBoolean(5))
    assert(none.forall(_ == false))
  }

  private def dpb(rows: Seq[(String, Long, Long)], cap: Int,
      eps: Double = 0.5, seed: Long = 1L) = {
    import spark.implicits._
    Privacy.dpBoundedCounts(rows.toDF("g", "u", "id"), "g", "u", "id",
      cap, eps, seed)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
  }

  test("dpBoundedCounts: per-user cap binds, under-cap users keep all") {
    // user 1 has 5 rows in group a (cap 2 → keeps 2); user 2 has 1 row
    val rows = (1L to 5L).map(i => ("a", 1L, i)) :+ (("a", 2L, 9L))
    val got = dpb(rows, cap = 2)
    assert(got("a")._2 == 6L && got("a")._3 == 3L)
  }

  test("dpBoundedCounts: a fully-capped-away group still releases noisy 0") {
    // user 1's rows span groups a, a, b with cap 1: exactly one row
    // survives, so one group drops to 0 — but BOTH groups are released
    val got = dpb(Seq(("a", 1L, 1L), ("a", 1L, 2L), ("b", 1L, 3L)), cap = 1)
    assert(got.keySet == Set("a", "b"), "no group silently dropped")
    assert(got.values.map(_._3).sum == 1L, "cap 1 keeps exactly one row")
    assert(got("a")._2 == 2L && got("b")._2 == 1L)
  }

  test("dpBoundedCounts: noise is replayable by seed and scales with cap") {
    val rows = (1L to 4L).map(i => ("a", i, i))
    val a = dpb(rows, cap = 1)("a")
    val b = dpb(rows, cap = 1)("a")
    assert(a == b, "same seed must release identical noise")
    val other = dpb(rows, cap = 1, seed = 2L)("a")
    assert(other._4 != a._4, "a new seed re-draws")
    // Laplace scale is cap/eps: doubling cap doubles the noise term
    val d1 = a._4 - a._3
    val d2raw = dpb(rows, cap = 2)("a")
    val d2 = d2raw._4 - d2raw._3
    assert(math.abs(d2 - 2 * d1) < 1e-5, s"noise must scale: $d1 vs $d2")
  }

  test("forgetAudit: residuals counted per table, clean table passes") {
    import spark.implicits._
    val victims = Seq(7L, 9L).toDF("uid")
    val dirty = Seq((1L, 7L), (2L, 7L), (3L, 9L), (4L, 5L)).toDF("id", "uid")
    val clean = Seq((1L, 1L), (2L, 2L)).toDF("id", "uid")
    val got = Privacy.forgetAudit(victims, "uid", Seq(
      ("dirty", dirty, "uid"), ("clean", clean, "uid")))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("dirty") == (("dirty", 2L, 3L, 2L, false)), s"$got")
    assert(got("clean") == (("clean", 2L, 0L, 0L, true)), s"$got")
  }

  test("forgetAudit: duplicate victims dedup before counting") {
    import spark.implicits._
    val victims = Seq(7L, 7L, 7L).toDF("uid")
    val t = Seq((1L, 7L)).toDF("id", "uid")
    val got = Privacy.forgetAudit(victims, "uid", Seq(("t", t, "uid")))
      .as[(String, Long, Long, Long, Boolean)].collect().head
    assert(got == (("t", 1L, 1L, 1L, false)), s"$got")
  }
}
