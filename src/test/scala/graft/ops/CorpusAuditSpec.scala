package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 operators: Fleiss' kappa, Heaps vocab growth, Good–Turing
  * coverage, k-fold audit, Markov stationary, SPRT, ROC curve,
  * curriculum ordering — each against a hand-computed case.
  */
class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  // ——————————————————————————————————————————— Fleiss' kappa

  private def fleiss(rows: (Long, Long, String)*) =
    Annotation.fleissKappa(rows.toDF("unit", "rater", "label"),
      "unit", "rater", "label")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head

  test("fleissKappa: hand case — kappa 0.55, off-panel unit dropped") {
    // units 1-3 have the modal panel n=3; unit 4 (2 raters) drops.
    // S=23, N=3, n=3, C=(4,5) → knum=44, kden=80 → 550000 ppm.
    val got = fleiss(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "B"),
      (3L, 1L, "B"), (3L, 2L, "B"), (3L, 3L, "B"),
      (4L, 1L, "A"), (4L, 2L, "A"))
    assert(got == ((3L, 3L, 2L, 1L, Some(550000L))))
  }

  test("fleissKappa: perfect agreement scores exactly 1e6") {
    val got = fleiss(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "A"),
      (2L, 1L, "B"), (2L, 2L, "B"), (2L, 3L, "B"))
    assert(got._5 == Some(1000000L))
  }

  test("fleissKappa: one category everywhere is degenerate (null)") {
    val got = fleiss(
      (1L, 1L, "A"), (1L, 2L, "A"),
      (2L, 1L, "A"), (2L, 2L, "A"))
    assert(got._5.isEmpty)
  }

  test("fleissKappa: modal-n tie pins to the SMALLER panel size") {
    // one unit with 2 raters, one with 3 — tie freq 1:1 → n=2 wins
    val got = fleiss(
      (1L, 1L, "A"), (1L, 2L, "A"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "B"))
    assert(got._2 == 2L && got._4 == 1L)
  }

  // ——————————————————————————————————————————— Heaps vocab growth

  test("vocabGrowth: hand curve at checkpoints 1, 2, 3") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "c d a"))
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 4L, 3L, 750000L),
      (3L, 7L, 4L, 571428L)))
  }

  test("vocabGrowth: a re-crawled corpus saturates (vocab flat)") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._3).toSet == Set(2L)) // vocab stuck at 2
    assert(got.last == ((4L, 8L, 2L, 250000L)))
  }

  // ——————————————————————————————————————————— Good–Turing / Chao1

  test("vocabCoverage: hand coverage + chao1, null when N2 = 0") {
    val docs = Seq(("s1", "a a b c"), ("s2", "a b"))
      .toDF("source", "text")
    val got = TextOps.vocabCoverage(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // s1: f = {a:2, b:1, c:1} → V=3 N=4 N1=2 N2=1;
    //     coverage = 1e6 − 2e6 div 4 = 500000; chao1 = 3 + 4 div 2 = 5
    assert(got("s1") == (("s1", 3L, 4L, 2L, 1L, 500000L, Some(5L))))
    // s2: both hapax → N2=0 → chao1 null
    assert(got("s2") == (("s2", 2L, 2L, 2L, 0L, 0L, None)))
  }

  // ——————————————————————————————————————————— k-fold audit

  test("kFoldAudit: folds partition groups, rows conserved, shares sum") {
    val rows = (1L to 200L).flatMap(g =>
      (1L to (g % 5 + 1)).map(i => (g, i))).toDF("g", "i")
    val total = rows.count()
    val audit = Sampling.kFoldAudit(rows, "g", k = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(audit.map(_._1).toSet.subsetOf((0L to 3L).toSet))
    assert(audit.map(_._2).sum == total)
    assert(audit.map(_._3).sum == 200L)
    // truncating shares sum to ≤ 1e6 and within k ppm of it
    val share = audit.map(_._4).sum
    assert(share <= 1000000L && share >= 1000000L - 4)
  }

  test("kFoldAudit: assignment is a pure function of the group key") {
    val a = Sampling.kFoldAudit(
      Seq((7L, 1), (7L, 2), (9L, 1)).toDF("g", "i"), "g", k = 3)
      .select("fold", "n_groups").as[(Long, Long)].collect().toSet
    val b = Sampling.kFoldAudit(
      Seq((9L, 9), (7L, 8), (7L, 9)).toDF("g", "i"), "g", k = 3)
      .select("fold", "n_groups").as[(Long, Long)].collect().toSet
    assert(a == b) // same groups → same folds, row content irrelevant
  }

  // ——————————————————————————————————————————— Markov stationary

  test("markovStationary: alternating two-state chain stays uniform") {
    val ev = Seq((1L, 1L, "A", 1L), (1L, 2L, "B", 2L),
        (1L, 3L, "A", 3L), (1L, 4L, "B", 4L))
      .toDF("u", "ts", "st", "id")
    val got = Analytics.markovStationary(ev, "u", "ts", "st", "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 500000L, "B" -> 500000L))
  }

  test("markovStationary: absorbing state collects all mass") {
    // A→B once; B dangles → self-loop; A never re-entered
    val ev = Seq((1L, 1L, "A", 1L), (1L, 2L, "B", 2L))
      .toDF("u", "ts", "st", "id")
    val got = Analytics.markovStationary(ev, "u", "ts", "st", "id")
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 0L, "B" -> 1000000L))
  }

  // ——————————————————————————————————————————— SPRT

  test("sprtDecision: crossing index, both boundaries, continue") {
    // p0=0.2, p1=0.8 → llr± = ±ln4 = ±1386294µ; A = ln19 = 2944439µ.
    // 3 successes cross A at seq 3; 3 failures cross B at seq 3;
    // alternating never crosses.
    val obs = Seq(
      ("up", 1L, 1L, true), ("up", 2L, 2L, true), ("up", 3L, 3L, true),
      ("dn", 1L, 4L, false), ("dn", 2L, 5L, false), ("dn", 3L, 6L, false),
      ("mx", 1L, 7L, true), ("mx", 2L, 8L, false),
      ("mx", 3L, 9L, true), ("mx", 4L, 10L, false))
      .toDF("e", "ts", "id", "succ")
    val got = Analytics.sprtDecision(obs, "e", "ts", "id", "succ",
        p0 = 0.2, p1 = 0.8)
      .as[(String, Long, Long, String, Option[Long], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("up") == (("up", 3L, 3L, "accept_h1", Some(3L),
      3 * 1386294L)))
    assert(got("dn") == (("dn", 3L, 0L, "accept_h0", Some(3L),
      -3 * 1386294L)))
    assert(got("mx") == (("mx", 4L, 2L, "continue", None, 0L)))
  }

  test("sprtDecision: first crossing wins even if the walk recrosses") {
    // 3 successes (cross A at 3), then 10 failures (would cross B) —
    // the decision is still accept_h1 at 3.
    val obs = ((1 to 3).map(i => ("e", i.toLong, i.toLong, true)) ++
      (4 to 13).map(i => ("e", i.toLong, i.toLong, false)))
      .toDF("e", "ts", "id", "succ")
    val got = Analytics.sprtDecision(obs, "e", "ts", "id", "succ",
        p0 = 0.2, p1 = 0.8)
      .as[(String, Long, Long, String, Option[Long], Long)].collect().head
    assert(got._4 == "accept_h1" && got._5 == Some(3L))
  }

  // ——————————————————————————————————————————— ROC curve

  test("rocCurve: hand sweep — counts and ppm rates per threshold") {
    val df = Seq((9L, 1L), (9L, 0L), (5L, 1L), (1L, 0L))
      .toDF("score", "y")
    val got = Evaluation.rocCurve(df, "score", "y")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(-_._1).toSeq
    assert(got == Seq(
      (9L, 1L, 1L, 1L, 1L, Some(500000L), Some(500000L)),
      (5L, 2L, 1L, 0L, 1L, Some(1000000L), Some(500000L)),
      (1L, 2L, 2L, 0L, 0L, Some(1000000L), Some(1000000L))))
  }

  test("rocCurve: single-class input yields null rate for the absent class") {
    val got = Evaluation.rocCurve(
        Seq((3L, 1L), (2L, 1L)).toDF("score", "y"), "score", "y")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
    assert(got.forall(_._7.isEmpty)) // no negatives → fpr null
    assert(got.forall(_._6.isDefined))
  }

  // ——————————————————————————————————————————— curriculum ordering

  test("curriculumOrder: value-aligned stages, dense pos per bucket") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L))
      .toDF("id", "d")
    val got = Sampling.curriculumOrder(df, "id", "d",
        nStages = 2, nBuckets = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    val stageOf = got.map(r => r._2 -> r._3).toMap
    // cum_start: 10→0, 20→2, 30→3 of 4 → stages 0, 1, 1
    assert(stageOf == Map(10L -> 0L, 20L -> 1L, 30L -> 1L))
    // pos is 1..count within each (stage, bucket)
    got.groupBy(r => (r._3, r._4)).foreach { case (_, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // stage is monotone in difficulty
    val byDiff = got.sortBy(_._2).map(_._3).toSeq
    assert(byDiff == byDiff.sorted)
  }

  test("curriculumOrder: degenerate single-value score lands in stage 0") {
    val df = (1L to 8L).map(i => (i, 5L)).toDF("id", "d")
    val got = Sampling.curriculumOrder(df, "id", "d",
        nStages = 4, nBuckets = 4)
      .select("stage").as[Long].collect()
    assert(got.toSet == Set(0L))
  }
}
