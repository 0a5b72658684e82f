package graft.ops

import graft.SparkSpec

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Int, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "label", "embedding")

  test("silhouette: hand-computed s on two separated clusters") {
    // A = {(0,0), (2,0)} milli, B = {(100,0), (102,0)} milli
    // point 1: a = 2 milli → a_q = 2e9; b = (100+102)/2 → b_q = 101e9
    val got = Evaluation.silhouette(emb(
        (1L, 0, Array(0.000f, 0f)), (2L, 0, Array(0.002f, 0f)),
        (3L, 1, Array(0.100f, 0f)), (4L, 1, Array(0.102f, 0f))))
      .as[(Long, Int, Option[Long], Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0, Some(2000000000L), 101000000000L, 0.980198)))
    // 99/101 = 0.980198…, well-separated clusters score near 1
    assert(got.values.forall(_._5 > 0.9))
  }

  test("silhouette: a mislabeled point scores negative") {
    // (4,0) carries label B but sits next to cluster A
    val got = Evaluation.silhouette(emb(
        (1L, 0, Array(0.000f, 0f)), (2L, 0, Array(0.002f, 0f)),
        (3L, 1, Array(0.100f, 0f)), (4L, 1, Array(0.102f, 0f)),
        (9L, 1, Array(0.004f, 0f))))
      .as[(Long, Int, Option[Long], Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(got(9L) < 0, s"mislabeled point got s=${got(9L)}")
    assert(got(1L) > 0 && got(2L) > 0 && got(3L) > 0 && got(4L) > 0)
  }

  test("silhouette: singleton label has null a and s = 0 by convention") {
    val got = Evaluation.silhouette(emb(
        (1L, 0, Array(0.00f, 0f)), (2L, 0, Array(0.002f, 0f)),
        (7L, 5, Array(0.05f, 0f))))
      .as[(Long, Int, Option[Long], Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(7L)._3.isEmpty && got(7L)._5 == 0.0)
    assert(got(1L)._3.nonEmpty && got(1L)._5 > 0)
  }

  test("recallAtK: hand sets, zero-hit query surfaces as 0") {
    import spark.implicits._
    // exact q1: {1,2,3}; approx q1: {2,3,9} → 2 hits of k=3
    // exact q2: {4,5,6}; approx q2: {7,8,9} → 0 hits, row must survive
    val exact = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 4L), (2L, 5L), (2L, 6L)).toDF("q_id", "vec_id")
    val approx = Seq((1L, 2L), (1L, 3L), (1L, 9L),
      (2L, 7L), (2L, 8L), (2L, 9L)).toDF("q_id", "vec_id")
    val got = Evaluation.recallAtK(exact, approx, k = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 666666L)))
    assert(got(2L) == ((0L, 0L)))
  }

  test("mrrAtK: first hit wins, exact ppm reciprocals, miss emits 0 not absence") {
    val run = Seq((1, 10L, 1L), (1, 20L, 2L), (2, 30L, 1L), (3, 40L, 1L))
      .toDF("query_id", "doc_id", "rk")
    val rels = Seq((1, 20L, 1L), (2, 30L, 2L), (3, 99L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val got = Evaluation.mrrAtK(run, rels, k = 10)
      .as[(Int, Option[Long], Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, Some(2L), 500000L), (2, Some(1L), 1000000L),
      (3, None, 0L)))
  }

  test("conformalIntervals: hand k, boundary coverage, uncoverable group null") {
    // group a: pred = (100+300)//2 = 200; n_cal = 4 → k = ⌈5·0.9⌉ = 5 > 4
    //   → q̂ null, coverage null (too few calibration rows to certify 90%)
    // group b: pred = 200; 10 cal residuals {0,50,100,100,200,300,400,
    //   500,600,900} → k = ⌈11·0.9⌉ = 10 → q̂ = 900 (the 10th smallest);
    //   test residuals {0, 1000, 900} → covered = 2 (900 is ON the
    //   boundary and counts), coverage = 2000000//3 = 666666 ppm
    // group c: negative sum — pred = −300 div 2 = −150 pins the
    //   TRUNCATING division both engines share (floor would give −150
    //   here too only for even sums; −301 div 2 = −150 not −151)
    val tr = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0),
      ("c", -1.0), ("c", -2.01)).toDF("g", "v")
    val cal = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 5.0),
      ("c", -1.0)) ++
      Seq(2.0, 2.5, 3.0, 1.0, 4.0, 5.0, 6.0, 7.0, 8.0, 11.0).map("b" -> _))
      .toDF("g", "v")
    val te = Seq(("a", 2.0), ("b", 2.0), ("b", 12.0), ("b", 11.0),
      ("c", -1.5)).toDF("g", "v")
    val got = Evaluation.conformalIntervals(tr, cal, te, "g", "v")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 2L, 4L, 1L, 200L, None, None),
      ("b", 1L, 10L, 3L, 200L, Some(900L), Some(666666L)),
      ("c", 2L, 1L, 1L, -150L, None, None)))
  }

  test("groupAuc: perfect, inverted, tied, and degenerate groups") {
    import spark.implicits._
    val rows = Seq(
      // g=perf: positives strictly above negatives → AUC 1
      ("perf", 1L, false), ("perf", 2L, false), ("perf", 3L, true),
      ("perf", 4L, true),
      // g=inv: positives strictly below → AUC 0
      ("inv", 1L, true), ("inv", 2L, false),
      // g=tie: one positive and one negative at the SAME score → ½
      ("tie", 5L, true), ("tie", 5L, false),
      // g=onlyp: no negatives → null
      ("onlyp", 1L, true))
      .toDF("g", "s", "y")
    val got = Evaluation.groupAuc(rows, "g", "s", "y")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("perf") == ((2L, 2L, Some(1000000L))))
    assert(got("inv") == ((1L, 1L, Some(0L))))
    assert(got("tie") == ((1L, 1L, Some(500000L))))
    assert(got("onlyp") == ((1L, 0L, None)))
  }

  test("ndcgAtK: perfect ranking is 1, swap discounts exactly, no-rel query omitted") {
    import spark.implicits._
    // q1 retrieves docs (1, 2, 3) at ranks 1..3; rels: 1→3, 2→1, 3 none
    // (rel 0). DCG = 3·w1 + 1·w2 = 3630930; IDCG (ideal = same order) =
    // 3630930 → ndcg 1. q2 retrieves them INVERTED: DCG = 1·w1 + 3·w2 +
    // 0 with rels (1→1... build: rels q2: docA rel 3 ranked at 2, docB
    // rel 1 ranked at 1 → DCG = 1·w1 + 3·w2 = 2892790; same IDCG.
    val run = Seq((1, 10L, 1L), (1, 20L, 2L), (1, 30L, 3L),
      (2, 20L, 1L), (2, 10L, 2L)).toDF("query_id", "doc_id", "rk")
    val rels = Seq((1, 10L, 3L), (1, 20L, 1L),
      (2, 10L, 3L), (2, 20L, 1L),
      (3, 99L, 0L)) // query 3 has no rel > 0 → omitted
      .toDF("query_id", "doc_id", "rel")
    val got = Evaluation.ndcgAtK(run, rels, k = 10)
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1) == ((3630930L, 3630930L, 1.0)))
    assert(got(2) == ((1000000L + 3 * 630930L, 3630930L,
      math.rint(2892790.0 / 3630930.0 * 1e6) / 1e6)))
    assert(!got.contains(3))
  }

  test("truncationRecall: a truncation-flipped ranking scores 0, a stable one 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // x looks mediocre in full space (cos .707 vs q10) but PERFECT after
    // the 2-dim slice (1.0); y is the true full-space winner (.992)
    val corpus = Seq(
      (1L, Array(0.9f, 0.0f, 0.9f, 0.0f)),  // x
      (2L, Array(0.8f, 0.1f, 0.0f, 0.0f)))  // y
      .toDF("vec_id", "embedding")
    val queries = Seq(
      (10L, Seq(1.0, 0.0, 0.0, 0.0)),
      (11L, Seq(0.0, 1.0, 0.0, 0.0)))
      .toDF("q_id", "qvec")
    val got = Evaluation.truncationRecall(corpus, queries, k = 1, dims = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // q10: full top-1 = y, truncated top-1 = x -> zero overlap
    assert(got(10L) == ((1L, 0L, 0L)))
    // q11: y wins both spaces -> full recall
    assert(got(11L) == ((1L, 1L, 1000000L)))
  }

  private def apFrame(rows: (String, Long, Boolean, Long)*) =
    rows.toSeq.toDF("g", "s", "y", "id")

  test("averagePrecisionAtK: hand AP — prec terms at positive ranks only") {
    import spark.implicits._
    // ranks by (s desc, id): [y, n, y] → prec@1 = 1e6, prec@3 = 666666
    // AP = (1000000 + 666666) div 2 = 833333
    val got = Evaluation.averagePrecisionAtK(
        apFrame(("a", 30L, true, 1L), ("a", 20L, false, 2L),
          ("a", 10L, true, 3L)),
        "g", "s", "y", "id", k = 10)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got == (("a", 3L, 2L, 2L, Some(833333L))))
  }

  test("averagePrecisionAtK: perfect ranking scores exactly 1e6") {
    import spark.implicits._
    val got = Evaluation.averagePrecisionAtK(
        apFrame(("a", 3L, true, 1L), ("a", 2L, true, 2L),
          ("a", 1L, false, 3L)),
        "g", "s", "y", "id", k = 10)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got._5.contains(1000000L))
  }

  test("averagePrecisionAtK: zero-positive group emits null, not 0") {
    import spark.implicits._
    val got = Evaluation.averagePrecisionAtK(
        apFrame(("z", 5L, false, 1L), ("z", 4L, false, 2L)),
        "g", "s", "y", "id", k = 10)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got == (("z", 2L, 0L, 0L, None)))
  }

  test("averagePrecisionAtK: k cap excludes late positives; denom = min(R, k)") {
    import spark.implicits._
    // positives at ranks 1 and 3, k = 2: only prec@1 counts,
    // denominator min(npos_total=2, k=2) = 2 → AP = 500000
    val got = Evaluation.averagePrecisionAtK(
        apFrame(("a", 30L, true, 1L), ("a", 20L, false, 2L),
          ("a", 10L, true, 3L)),
        "g", "s", "y", "id", k = 2)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got == (("a", 2L, 1L, 2L, Some(500000L))))
  }

  test("averagePrecisionAtK: score ties broken by id ascending") {
    import spark.implicits._
    // same score; id 1 is negative, id 2 positive → positive lands rank 2
    // AP = prec@2 / 1 = 500000 (tie had gone the other way: 1e6)
    val got = Evaluation.averagePrecisionAtK(
        apFrame(("a", 10L, false, 1L), ("a", 10L, true, 2L)),
        "g", "s", "y", "id", k = 10)
      .as[(String, Long, Long, Long, Option[Long])].head()
    assert(got._5.contains(500000L))
  }

  private def report(rows: (String, String)*) = {
    import spark.implicits._
    Evaluation.classificationReport(rows.toDF("t", "p"), "t", "p")
      .as[(String, Long, Long, Long, Long,
        Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
  }

  test("classificationReport: hand confusion cells, exact ppm, macro") {
    // a: 2 tp, 1 fn (predicted b); b: 1 tp, 1 fp (the stray a)
    val got = report(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
    assert(got("a") == (("a", 2L, 0L, 1L, 3L,
      Some(1000000L), Some(666666L), Some(799999L))), s"${got("a")}")
    assert(got("b") == (("b", 1L, 1L, 0L, 1L,
      Some(500000L), Some(1000000L), Some(666666L))), s"${got("b")}")
    // macro: p (1e6+5e5)/2, r (666666+1e6)/2, f1 (799999+666666)/2
    assert(got("MACRO") == (("MACRO", 3L, 1L, 1L, 4L,
      Some(750000L), Some(833333L), Some(733332L))), s"${got("MACRO")}")
  }

  test("classificationReport: a never-predicted class has null precision") {
    val got = report(("a", "b"))
    assert(got("a")._6.isEmpty && got("a")._7.contains(0L), s"${got("a")}")
    // b was predicted but never true: recall undefined, precision 0
    assert(got("b")._6.contains(0L) && got("b")._7.isEmpty, s"${got("b")}")
  }
}
