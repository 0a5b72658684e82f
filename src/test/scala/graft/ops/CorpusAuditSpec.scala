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

  // ——————————————————————————————————————————— BH FDR

  test("bhFdr: step-up rescues an interior rank that fails alone") {
    // m=4, q=0.05: rank2 fails its own bar (30000·4 > 50000·2) but
    // rank3 passes (37000·4 ≤ 150000) → cutoff 3 rejects ranks 1-3.
    val t = Seq(("t1", 10000L), ("t2", 30000L), ("t3", 37000L),
      ("t4", 900000L)).toDF("id", "p")
    val got = Analytics.bhFdr(t, "id", "p", qPpm = 50000L)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("t1" -> true, "t2" -> true, "t3" -> true,
      "t4" -> false))
  }

  test("bhFdr: nothing passes → nothing rejected") {
    val t = Seq(("a", 500000L), ("b", 900000L)).toDF("id", "p")
    val got = Analytics.bhFdr(t, "id", "p", qPpm = 50000L)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(!_._4))
  }

  // ——————————————————————————————————————————— null co-occurrence

  test("nullCooccurrence: exact 2x2 counts and association sign") {
    val df = Seq[(Option[Long], Option[String], Option[Long])](
      (None, None, Some(1L)), (None, None, Some(2L)),
      (Some(1L), Some("x"), None), (Some(2L), Some("y"), Some(3L)))
      .toDF("a", "b", "c")
    val got = Analytics.nullCooccurrence(df, Seq("a", "b", "c"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // a,b null together on rows 1-2, never apart → assoc positive
    val ab = got(("a", "b"))
    assert(ab._4 == 2L && ab._5 == 0L && ab._6 == 0L)
    assert(ab._9 == 4L * 2L - 2L * 2L) // n·n11 − na·nb = 4
    // a,c: a null rows 1-2 (c present), c null row 3 (a present):
    // never together → negative association
    val ac = got(("a", "c"))
    assert(ac._4 == 0L && ac._5 == 2L && ac._6 == 1L && ac._9 == -2L)
  }

  // ——————————————————————————————————————————— entropy rate

  test("entropyRate: deterministic chain 0, fair branch ln 2") {
    val det = Seq((1L, 1L, "A", 1L), (1L, 2L, "B", 2L),
        (1L, 3L, "A", 3L), (1L, 4L, "B", 4L))
      .toDF("u", "ts", "st", "id")
    assert(Analytics.entropyRate(det, "u", "ts", "st", "id")
      .as[(Long, Long)].collect().head == ((3L, 0L)))
    val branch = Seq((1L, 1L, "A", 1L), (1L, 2L, "B", 2L),
        (2L, 1L, "A", 3L), (2L, 2L, "C", 4L))
      .toDF("u", "ts", "st", "id")
    assert(Analytics.entropyRate(branch, "u", "ts", "st", "id")
      .as[(Long, Long)].collect().head == ((2L, 693147L)))
  }

  // ——————————————————————————————————————————— Hill tail index

  test("hillTailIndex: hand logs over powers of two") {
    val df = Seq((8.0, 1L), (4.0, 2L), (2.0, 3L), (1.0, 4L))
      .toDF("v", "id")
    val got = Analytics.hillTailIndex(df, "v", "id", k = 3)
      .as[(Long, Long, Long, Option[Long])].collect().head
    // terms ln8, ln4, ln2 → (2079442 + 1386294 + 693147) div 3
    val inv = (2079442L + 1386294L + 693147L) / 3L
    assert(got == ((3L, 1000000L, inv, Some(1000000000000L / inv))))
  }

  // ——————————————————————————————————————————— HHI

  test("hhiConcentration: hand shares, monopoly is exactly 1e6") {
    val df = Seq(("g", 10L), ("g", 10L), ("g", 10L), ("g", 20L),
      ("m", 5L), ("m", 5L)).toDF("seg", "u")
    val got = Analytics.hhiConcentration(df, "seg", "u")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // g: shares 750000/250000 → hhi 625000, eff 1.6 members
    assert(got("g") == (("g", 2L, 625000L, Some(1600L))))
    assert(got("m") == (("m", 1L, 1000000L, Some(1000L))))
  }

  // ——————————————————————————————————————————— SRM

  test("srmCheck: 60/40 on a 50/50 design flags, 55/45 does not") {
    val rows = ((1 to 60).map(i => ("e1", "a", i)) ++
      (1 to 40).map(i => ("e1", "b", i)) ++
      (1 to 55).map(i => ("e2", "a", i)) ++
      (1 to 45).map(i => ("e2", "b", i))).toDF("e", "bucket", "i")
    val got = Analytics.srmCheck(rows, "e", "bucket",
        Seq("a" -> 50, "b" -> 50))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("e1") == (("e1", 100L, 2L, 4000L, true)))
    assert(got("e2") == (("e2", 100L, 2L, 1000L, false)))
  }

  // ——————————————————————————————————————————— Mann–Whitney U

  test("mannWhitneyU: separated groups give U1 = 0, tie adds a half") {
    val sep = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "g")
    assert(Analytics.mannWhitneyU(sep, "v", "g")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 0L, 8L, Some(0L))))
    val tied = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "g")
    assert(Analytics.mannWhitneyU(tied, "v", "g")
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 1L, 7L, Some(125000L)))) // one tied pair = ½
  }

  // ——————————————————————————————————————————— JS divergence

  test("jsDivergence: identical 0, half-overlap ½ln2, disjoint ~ln2") {
    val df = Seq(("s1", "a b"), ("s2", "a c"), ("s3", "a b"),
      ("s4", "x y")).toDF("source", "text")
    val got = TextOps.jsDivergence(df, "text", "source")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("s1", "s3"))._4 == 0L)        // identical
    assert(got(("s1", "s2"))._4 == 346572L)   // ½ln2 − truncation
    assert(got(("s1", "s4"))._4 == 693146L)   // ln2 − truncation
    assert(got.size == 6)                      // all pairs released
  }

  // ——————————————————————————————————————————— McNemar

  test("mcnemar: discordant counts drive the statistic; concordant null") {
    val df = Seq((true, true), (true, false), (true, false),
      (false, true), (false, false)).toDF("a_ok", "b_ok")
    assert(Evaluation.mcnemar(df, "a_ok", "b_ok")
      .as[(Long, Long, Long, Option[Long])].collect().head ==
      ((5L, 2L, 1L, Some(333L)))) // (2−1)²·1000 div 3
    val conc = Seq((true, true), (false, false)).toDF("a_ok", "b_ok")
    assert(Evaluation.mcnemar(conc, "a_ok", "b_ok")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  // ——————————————————————————————————————————— Cochran's Q

  test("cochranQ: hand Q = 3, incomplete item dropped, unanimous null") {
    val votes = Seq(
      (1L, "m1", 1L), (1L, "m2", 1L), (1L, "m3", 0L),
      (2L, "m1", 1L), (2L, "m2", 0L), (2L, "m3", 0L),
      (3L, "m1", 1L), (3L, "m2", 1L), (3L, "m3", 1L),
      (4L, "m1", 0L), (4L, "m2", 0L), (4L, "m3", 0L),
      (5L, "m1", 1L), (5L, "m2", 1L)) // item 5 misses m3 → dropped
      .toDF("item", "mdl", "ok")
    val got = Evaluation.cochranQ(votes, "item", "mdl", "ok")
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(got == ((4L, 3L, 1L, Some(3000L))))
    val unan = Seq((1L, "m1", 1L), (1L, "m2", 1L),
      (2L, "m1", 1L), (2L, "m2", 1L)).toDF("item", "mdl", "ok")
    assert(Evaluation.cochranQ(unan, "item", "mdl", "ok")
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  // ——————————————————————————————————————————— rank-biased overlap

  test("rankBiasedOverlap: identical, partial, disjoint lattices") {
    val same = Seq((1L, 30L, 30L), (2L, 20L, 20L), (3L, 10L, 10L))
      .toDF("id", "sa", "sb")
    val expectSame = (1 to 20).map(d => 1000000L / (1L << d)).sum
    assert(Evaluation.rankBiasedOverlap(same, "id", "sa", "sb")
      .as[(Long, Long)].collect().head == ((expectSame, 20L)))
    // a-top2 = [1, 2], b-top2 = [1, 3] at depth 2 → 500000 + 125000
    val part = Seq((1L, 3L, 3L), (2L, 2L, 1L), (3L, 1L, 2L))
      .toDF("id", "sa", "sb")
    assert(Evaluation.rankBiasedOverlap(part, "id", "sa", "sb", depth = 2)
      .as[(Long, Long)].collect().head == ((625000L, 2L)))
    val disj = Seq((1L, 9L, 1L), (2L, 1L, 9L)).toDF("id", "sa", "sb")
    assert(Evaluation.rankBiasedOverlap(disj, "id", "sa", "sb", depth = 1)
      .as[(Long, Long)].collect().head._1 == 0L)
  }

  // ——————————————————————————————————————————— gains / lift

  test("upliftDeciles: incremental conversions, Qini scales control") {
    // scores 1..4, one treated + one control row each; treated convert
    // at score ≥ 3, control never. band 0 = scores {4,3}, band 1 = {2,1}
    val df = (1L to 4L).flatMap(s => Seq(
      (s, true, if (s >= 3) 1L else 0L), (s, false, 0L)))
      .toDF("score", "t", "y")
    val got = Evaluation.upliftDeciles(df, "score", "t", "y", nBands = 2)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 0L, Some(1000000L), Some(2000L)),
      (1L, 2L, 2L, 0L, 0L, Some(0L), Some(2000L))), got.mkString(","))
  }

  test("blockingQuality: counted pairs, never materialized") {
    // truth A={1,2,3} B={4,5}; blocks X={1,2} Y={3,4,5}
    // cand = C(2,2)+C(3,2) = 4 of C(5,2)=10 → RR 600000
    // truth pairs = 3+1 = 4, covered = (A,X) 1 + (B,Y) 1 → PC 500000
    val df = Seq((1L, "X", "A"), (2L, "X", "A"), (3L, "Y", "A"),
      (4L, "Y", "B"), (5L, "Y", "B")).toDF("id", "blk", "truth")
    val got = Dedup.blockingQuality(df, "id", "blk", "truth")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .head()
    assert(got == ((5L, 2L, 4L, 4L, 2L, Some(600000L), Some(500000L))),
      s"$got")
  }

  test("optimalThreshold: asymmetric costs pick the cheap corner") {
    // pos at 3 and 1, neg at 2; FP costs 100, FN costs 10:
    // t=3 → fp 0, fn 1, cost 10 (min); t=2 → 110; t=1 → 100
    val df = Seq((3L, true), (2L, false), (1L, true)).toDF("score", "y")
    val got = Evaluation.optimalThreshold(df, "score", "y", 100L, 10L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 0L, 1L, 3L, 2L, 10L)), s"$got")
  }

  test("optimalThreshold: equal-cost tie pins to the LOWEST threshold") {
    // scores 4:neg 3:pos 2:neg 1:pos, unit costs → cost 2 at t=3 AND
    // t=1; fire-more tie rule picks t=1
    val df = Seq((4L, false), (3L, true), (2L, false), (1L, true))
      .toDF("score", "y")
    val got = Evaluation.optimalThreshold(df, "score", "y", 1L, 1L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((1L, 2L, 0L, 4L, 2L, 2L)), s"$got")
  }

  test("gainsTable: perfect model doubles the top-half lift") {
    val df = (1L to 10L).map(s => (s, if (s >= 8) 1L else 0L))
      .toDF("score", "y")
    val got = Evaluation.gainsTable(df, "score", "y", nBands = 2)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 5L, 3L, 5L, 3L, Some(1000000L), Some(2000000L)),
      (1L, 5L, 0L, 10L, 3L, Some(1000000L), Some(1000000L))))
  }

  // ——————————————————————————————————————————— WoE / IV

  test("woeIv: symmetric bins score ±ln2, one-sided bin null") {
    val rows = Seq.fill(2)(("b1", 1L)) ++ Seq(("b1", 0L)) ++
      Seq(("b2", 1L)) ++ Seq.fill(2)(("b2", 0L)) ++ Seq(("b3", 1L))
    val got = Analytics.woeIv(rows.toDF("bin", "y"), "bin", "y")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("b1") == (("b1", 2L, 1L, Some(693147L), Some(231049L))))
    assert(got("b2") == (("b2", 1L, 2L, Some(-693147L), Some(231049L))))
    assert(got("b3")._4.isEmpty && got("b3")._5.isEmpty)
  }

  // ——————————————————————————————————————————— RFM

  test("rfmSegments: codes from value-aligned quintiles, R inverted") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (2L, "2024-01-03 00:00:00", 2.0), (2L, "2024-01-03 01:00:00", 2.0),
      (3L, "2024-01-05 00:00:00", 3.0), (3L, "2024-01-05 01:00:00", 3.0),
      (3L, "2024-01-05 02:00:00", 3.0))
      .toDF("u", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Analytics.rfmSegments(ev, "u", "ts", "v")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    // r_days 4/2/0 → inverted codes 2/4/5; f 1/2/3 → 1/2/4; m same
    assert(got(1L) == ((1L, 4L, 1L, 1000000L, 2L, 1L, 1L, "211")))
    assert(got(2L) == ((2L, 2L, 2L, 4000000L, 4L, 2L, 2L, "422")))
    assert(got(3L) == ((3L, 0L, 3L, 9000000L, 5L, 4L, 4L, "544")))
  }

  // ——————————————————————————————————————————— dispersion index

  test("dispersionIndex: equal counts 0, skewed counts overdispersed") {
    val df = (Seq(("g", "x"), ("g", "y")) ++ Seq.fill(4)(("g", "z")) ++
      Seq(("p", "x"), ("p", "y"), ("p", "z")).flatMap(t =>
        Seq(t, t))) // p: every member count 2
      .toDF("seg", "u")
    val got = Analytics.dispersionIndex(df, "seg", "u")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // g counts (1,1,4): 1000·(3·18−36) div (2·6) = 1500
    assert(got("g") == (("g", 3L, 6L, Some(1500L))))
    assert(got("p") == (("p", 3L, 6L, Some(0L))))
  }

  // ——————————————————————————————————————————— sorted neighborhood

  test("sortedNeighborhoodPairs: window pairs verify, blocks isolate") {
    val df = Seq((1L, "aaa1"), (2L, "aaa2"), (3L, "aab1"), (4L, "bbb1"))
      .toDF("id", "k")
    val got = Dedup.sortedNeighborhoodPairs(df, "id", "k",
        window = 2, blockChars = 1, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // aab1 is 1 sub from aaa1, 2 subs from aaa2; bbb1 in its own block
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L)))
    val wide = Dedup.sortedNeighborhoodPairs(df, "id", "k",
        window = 2, blockChars = 1, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
    // window = 1 only pairs adjacent records
    val adj = Dedup.sortedNeighborhoodPairs(df, "id", "k",
        window = 1, blockChars = 1, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(adj == Set((1L, 2L, 1L), (2L, 3L, 2L)))
  }

  test("tokenDispersion: even token DP=0, one-part token DP=500000 over 2 parts") {
    import spark.implicits._
    // parts P "x x y y" and Q "x x z z": expected shares 1/2 each;
    // x is spread like the corpus (DP 0), y and z live in one part
    // (DP = (|1e6−5e5| + |0−5e5|)/2 = 500000)
    val docs = Seq(("P", "x x y y"), ("Q", "x x z z"))
      .toDF("source", "text")
    val got = TextOps.tokenDispersion(docs, "text", "source",
        minCount = 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("x") == (("x", 4L, 2L, 0L)))
    assert(got("y") == (("y", 2L, 1L, 500000L)))
    assert(got("z") == (("z", 2L, 1L, 500000L)))
  }
}
