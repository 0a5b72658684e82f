package graft.ops

import graft.SparkSpec

class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  private def agg(rows: (Long, String, String)*) =
    Annotation.aggregateLabels(rows.toDF("item", "ann", "label"),
      "item", "ann", "label")
      .as[(Long, String, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("hand case: ppm weights, weighted winner, confidence") {
    // item 1: a1→A, a2→A, a3→B (maj A); item 2: a1→X, a3→X (maj X)
    // accuracies: a1 2/2 → 1e6, a2 1/1 → 1e6, a3 1/2 → 5e5
    val got = agg(
      (1L, "a1", "A"), (1L, "a2", "A"), (1L, "a3", "B"),
      (2L, "a1", "X"), (2L, "a3", "X"))
    assert(got(1L) == ((1L, "A", "A", 3L, 2000000L, 0.8)))
    assert(got(2L) == ((2L, "X", "X", 2L, 1500000L, 1.0)))
  }

  test("spammers are discounted: weighted vote overturns the raw majority") {
    // good1/good2 agree on items 10-12; spam1/spam2 always deviate there.
    // On item 13 the spammers outnumber good1 2:1 — raw majority A — but
    // their ppm weight (1/4 agreement) loses to good1's 3/4.
    val base = (10L to 12L).flatMap(i => Seq(
      (i, "good1", "G"), (i, "good2", "G"), (i, "spam1", "S"), (i, "spam2", "T")))
    val got = agg(base ++ Seq(
      (13L, "good1", "B"), (13L, "spam1", "A"), (13L, "spam2", "A")): _*)
    assert(got(13L) == ((13L, "A", "B", 3L, 750000L, 0.6)))
  }

  test("count ties break toward the lexicographically smaller label") {
    val got = agg((1L, "a1", "Z"), (1L, "a2", "A"))
    assert(got(1L)._2 == "A")
  }

  test("cohensKappa: hand κ — perfect 1, chance-level 0, constant pair null") {
    import spark.implicits._
    // A vs B: 4 shared items, agree on 2, both marginals 2x/2y →
    // pe_num = 8, κ = (4·2 − 8)/(16 − 8) = 0 (agreement exactly at chance).
    // A vs C: identical labels → κ = 1. B vs C: same as A vs B by
    // construction? no — C copies A, so B-C mirrors A-B → κ = 0 too.
    val votes = Seq(
      (1L, "A", "x"), (2L, "A", "x"), (3L, "A", "y"), (4L, "A", "y"),
      (1L, "B", "x"), (2L, "B", "y"), (3L, "B", "y"), (4L, "B", "x"),
      (1L, "C", "x"), (2L, "C", "x"), (3L, "C", "y"), (4L, "C", "y"))
      .toDF("item", "ann", "label")
    val got = graft.ops.Annotation.cohensKappa(votes, "item", "ann", "label")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), Option(r.get(5))))).toMap
    assert(got(("A", "B")) == (4L, 2L, 8L, Some(0.0)))
    assert(got(("A", "C")) == (4L, 4L, 8L, Some(1.0)))
    assert(got(("B", "C")) == (4L, 2L, 8L, Some(0.0)))
    // a pair that only ever emits one identical label: κ undefined → null
    val const = Seq((1L, "P", "x"), (2L, "P", "x"),
      (1L, "Q", "x"), (2L, "Q", "x")).toDF("item", "ann", "label")
    val k = graft.ops.Annotation.cohensKappa(const, "item", "ann", "label")
      .collect().head
    assert(k.isNullAt(5) && k.getLong(4) == 4L)
  }

  private def bt(duels: (Long, Long)*) =
    Annotation.bradleyTerry(duels.toDF("winner", "loser"), "winner", "loser")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("bradleyTerry: hand MM — 3:1 record fixes the 3:1 strength ratio") {
    // A beats B 3×, B beats A 1×. Round 1: term = 4·10¹² div 2·10⁶ =
    // 2·10⁶ per side → s_A = 3·10¹² div 2·10⁶ = 1.5·10⁶, s_B = 0.5·10⁶;
    // s_A+s_B stays 2·10⁶ so rounds 2-3 are fixed points.
    val got = bt((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L))
    assert(got(1L) == ((1L, 3L, 4L, 1500000L, 750000L)))
    assert(got(2L) == ((2L, 1L, 4L, 500000L, 250000L)))
  }

  test("bradleyTerry: zero-win item pins to exactly 0, winner takes all") {
    val got = bt((1L, 2L), (1L, 2L))
    assert(got(2L)._4 == 0L && got(2L)._5 == 0L)
    assert(got(1L)._5 == 1000000L, "sole winner owns the whole share")
  }

  test("bradleyTerry: rock-paper-scissors cycle stays symmetric") {
    val got = bt((1L, 2L), (2L, 3L), (3L, 1L))
    assert(got.values.map(_._4).toSet.size == 1, "equal strengths")
    assert(got(1L)._5 == 333333L)
  }

  test("bradleyTerry: self-duels and null sides are dropped") {
    val duels = Seq((Some(1L), Some(1L)), (Some(1L), None),
      (None, Some(2L)), (Some(1L), Some(2L))).toDF("winner", "loser")
    val got = Annotation.bradleyTerry(duels, "winner", "loser")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L) && got(1L)._3 == 1L)
  }

  test("bordaCount: hand points, incomplete ballots, pinned tie order") {
    import spark.implicits._
    // ann1 ranks a>b>c (points 2,1,0); ann2 ranks b>a (points 1,0 —
    // a 2-item ballot awards at most 1); totals a=2+0=2, b=1+1=2, c=0
    // → tie a/b broken by item asc
    val rows = Seq(("r1", "a", 1L), ("r1", "b", 2L), ("r1", "c", 3L),
      ("r2", "b", 1L), ("r2", "a", 2L))
    val got = Annotation.bordaCount(rows.toDF("ann", "item", "rnk"),
      "ann", "item", "rnk")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 2L, 2L, 1L)), s"$got")
    assert(got("b") == (("b", 2L, 2L, 2L)), s"$got")
    assert(got("c") == (("c", 1L, 0L, 3L)), s"$got")
  }

  private def alpha(rows: (Long, String, String)*) =
    Annotation.krippendorffAlpha(rows.toDF("unit", "rater", "label"),
      "unit", "rater", "label")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head

  test("krippendorffAlpha: hand case, exact ppm") {
    // unit 1: a,a,a (full agreement); unit 2: b,b,a
    // n=6, Do_micro = 2e6, De_num = 4·2 + 2·4 = 16
    // α = 1 − (2e6·5)/16e6... = 1 − 0.625 = 0.375
    val got = alpha(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "a"),
      (2L, "r1", "b"), (2L, "r2", "b"), (2L, "r3", "a"))
    assert(got == ((2L, 6L, 2L, 16L, Some(375000L))), s"$got")
  }

  test("krippendorffAlpha: single-rating units are unpairable and drop") {
    // unit 3 has one rating → excluded from n, categories, everything
    val base = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "a"),
      (2L, "r1", "b"), (2L, "r2", "b"), (2L, "r3", "a"))
    val got = alpha(base :+ ((3L, "r1", "zzz")): _*)
    assert(got == ((2L, 6L, 2L, 16L, Some(375000L))), s"$got")
  }

  test("krippendorffAlpha: perfect agreement scores exactly 1e6") {
    val got = alpha((1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "b"), (2L, "r2", "b"))
    assert(got._5.contains(1000000L), s"$got")
  }

  test("krippendorffAlpha: duplicate (unit, rater, label) votes dedup") {
    val got = alpha((1L, "r1", "a"), (1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "b"), (2L, "r2", "b"))
    assert(got._2 == 4L && got._5.contains(1000000L), s"$got")
  }

  test("krippendorffAlpha: one category everywhere yields null (De = 0)") {
    val got = alpha((1L, "r1", "a"), (1L, "r2", "a"))
    assert(got._5.isEmpty, s"$got")
  }

  test("weightedKappa: quadratic costs, hand marginal cross") {
    // A grades 1,2,3,4; B grades 1,2,4,1 → o = 0+0+1+9 = 10,
    // e_num = Σ ca·cb·(i−j)² = 48 → κ_w = 1 − 4·10/48 = 0.166667
    val votes = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (4L, "A", 4L), (1L, "B", 1L), (2L, "B", 2L), (3L, "B", 4L),
      (4L, "B", 1L)).toDF("item", "ann", "label")
    val got = Annotation.weightedKappa(votes, "item", "ann", "label")
      .as[(String, String, Long, Long, Option[Double])].head()
    assert(got == (("A", "B", 4L, 10L, Some(0.166667))), s"$got")
  }

  test("weightedKappa: perfect agreement 1, constant rater null") {
    val perfect = Seq((1L, "A", 1L), (2L, "A", 3L), (1L, "B", 1L),
      (2L, "B", 3L)).toDF("item", "ann", "label")
    val g1 = Annotation.weightedKappa(perfect, "item", "ann", "label")
      .as[(String, String, Long, Long, Option[Double])].head()
    assert(g1._5 == Some(1.0) && g1._4 == 0L, s"$g1")
    // B constant → every marginal cross term uses lb = 2 only, but A
    // also constant at 2 → e_num = 0 → null
    val const = Seq((1L, "A", 2L), (2L, "A", 2L), (1L, "B", 2L),
      (2L, "B", 2L)).toDF("item", "ann", "label")
    val g2 = Annotation.weightedKappa(const, "item", "ann", "label")
      .as[(String, String, Long, Long, Option[Double])].head()
    assert(g2._5.isEmpty, s"$g2")
  }
}
