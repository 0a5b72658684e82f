package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("groups under k distinct values report exact counts") {
    val df = (0 until 40).map(i => ("small", s"v$i")) ++
      Seq(("dup", "x"), ("dup", "x"), ("dup", "y"))
    val got = Sketches.kmvDistinct(df.toDF("g", "v"), "g", "v", k = 64)
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> (n, e) }.toMap
    assert(got("small") == (40L, 40.0))
    assert(got("dup") == (2L, 2.0)) // rows dedup to distinct values
  }

  test("estimator lands within 25% of a 2000-distinct truth") {
    val df = (0 until 2000).map(i => ("big", s"value_$i")).toDF("g", "v")
    val Seq((n, est)) = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .select("n_kept", "est").as[(Long, Double)].collect().toSeq
    assert(n == 64)
    assert(est > 1500 && est < 2500, s"est=$est")
  }

  test("two-phase salted min-k ≡ single global window") {
    val df = (0 until 5000).map(i => ("hot", s"t$i")).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, "g", "v", k = 32, salts = 8)
      .as[(String, Long, Double)].head()
    val h = conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long")
    val naive = df.select(col("g"), h.as("h")).distinct()
      .withColumn("r", row_number().over(Window.partitionBy("g").orderBy("h")))
      .where(col("r") <= 32).agg(max("h")).as[Long].head()
    assert(got._3 == math.rint(31 * 4294967296.0 / naive * 100) / 100 ||
      (got._3 - 31 * 4294967296.0 / naive).abs < 0.01, s"got $got vs kth=$naive")
  }

  test("kmvSetOps: exact below k — inclusion-exclusion and Jaccard") {
    // A = 1..30, B = 20..50: |A|=30, |B|=31, |A∪B|=50, |A∩B|=11
    val a = (1 to 30).map(i => Tuple1(i.toLong)).toDF("v")
    val b = (20 to 50).map(i => Tuple1(i.toLong)).toDF("v")
    val got = Sketches.kmvSetOps(a, b, "v", k = 64)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(got == ((30.0, 31.0, 50.0, 11.0, math.rint(11.0 / 50 * 1e6) / 1e6)))
  }

  test("kmvSetOps: estimated regime tracks truth within sketch error") {
    // 1500 ∪ 1500 with 500 shared → union 2500, intersection 500
    val a = (0 until 1500).map(i => Tuple1(s"k$i")).toDF("v")
    val b = (1000 until 2500).map(i => Tuple1(s"k$i")).toDF("v")
    val (ea, eb, eu, ei, j) = Sketches.kmvSetOps(a, b, "v", k = 64)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(ea > 1100 && ea < 1900, s"ea=$ea")
    assert(eu > 1900 && eu < 3100, s"eu=$eu")
    // intersection inherits the union's error bars — just sanity-bound it
    assert(ei >= 0 && ei < 1300, s"ei=$ei")
    assert(j >= 0 && j <= 1, s"j=$j")
  }

  test("kmvSetOps: disjoint sides clamp intersection at zero") {
    val a = (0 until 200).map(i => Tuple1(s"a$i")).toDF("v")
    val b = (0 until 200).map(i => Tuple1(s"b$i")).toDF("v")
    val (_, _, _, ei, j) = Sketches.kmvSetOps(a, b, "v", k = 64)
      .as[(Double, Double, Double, Double, Double)].head()
    assert(ei >= 0 && j >= 0) // clamp guarantees non-negative estimates
  }

  private val cmsDocs = Seq((0L, "a b a c"), (1L, "a b x"), (2L, "c c y"))

  test("cmsTokenCounts: wide sketch reports exact counts for min-id doc") {
    // width 65536 over a 5-token vocabulary: no bucket collisions, so
    // the min over 4 rows IS the true count (deterministic md5 buckets —
    // once green, always green)
    val got = Sketches.cmsTokenCounts(cmsDocs.toDF("doc_id", "text"),
        "text", "doc_id", depth = 4, width = 65536)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 3L))
  }

  // ————————————————————————————————————————————— HyperLogLog

  test("hllDistinct: estimate within the sketch's error band on known cardinalities") {
    // m=1024 registers → relative standard error ≈ 1.04/√1024 ≈ 3.25%;
    // assert within 4σ (13%) — deterministic hashes, so once green,
    // always green
    val df = (1 to 5000).map(i => ("g", s"user_$i")).toDF("g", "v")
    val got = Sketches.hllDistinct(df, "g", "v")
      .select("raw_est").as[Double].collect().head
    assert(math.abs(got - 5000) / 5000 < 0.13, s"est $got vs 5000")
  }

  test("hllDistinct: value-driven (row duplication is invisible) and group-isolated") {
    // 3000 ≥ 2.5·m — above the raw estimator's valid floor (below it the
    // documented small-range bias applies and the caller owns the
    // linear-counting swap)
    val df = ((1 to 3000).map(i => ("a", s"v$i")) ++
      (1 to 3000).map(i => ("a", s"v$i")) ++ // exact duplicate rows
      (1 to 7).map(i => ("b", s"w$i"))).toDF("g", "v")
    val got = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val dup = Sketches.hllDistinct(df.union(df), "g", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got == dup, "registers are max-aggregates — duplication is a no-op")
    assert(math.abs(got("a") - 3000) / 3000 < 0.15)
    // tiny group: only assert isolation (7 values touch ≤ 7 registers;
    // raw small-range bias is documented, not corrected)
    assert(got("b") < got("a"))
  }

  test("hllMergeRegisters: merge law is EXACT — merge(regs(A), regs(B)) ≡ regs(A ∪ B)") {
    val a = (1 to 900).map(i => ("g", s"x$i")).toDF("g", "v")
    val b = (500 to 1400).map(i => ("g", s"x$i")).toDF("g", "v") // overlaps A
    val merged = Sketches.hllEstimate(Sketches.hllMergeRegisters(
        Sketches.hllRegisters(a, "g", "v"), Sketches.hllRegisters(b, "g", "v")))
      .as[(String, Long, Long, Double)].collect().toSeq
    val whole = Sketches.hllEstimate(
        Sketches.hllRegisters(a.union(b), "g", "v"))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(merged == whole, "register max-merge must equal the union sketch")
    // idempotent: self-merge is a no-op
    val ra = Sketches.hllRegisters(a, "g", "v")
    assert(Sketches.hllEstimate(Sketches.hllMergeRegisters(ra, ra))
      .as[(String, Long, Long, Double)].collect().toSeq ==
      Sketches.hllEstimate(ra).as[(String, Long, Long, Double)].collect().toSeq)
  }

  test("hllSlidingEstimate: trailing window unions registers, inactive hours omitted") {
    import spark.implicits._
    val ev = ((1 to 300).map(i => ("a", 0L, s"u$i")) ++ // hour 0
      (200 to 500).map(i => ("a", 1L, s"u$i")) ++       // hour 1, overlaps
      (1 to 50).map(i => ("a", 40L, s"w$i")))           // far-away hour
      .toDF("g0", "hr0", "v")
    val regs = Sketches.hllRegisters(
        ev.withColumn("gh", concat(col("g0"), lit("|"), col("hr0"))),
        "gh", "v")
      .select(substring_index(col("g"), "|", 1).as("g"),
        expr("cast(substring_index(g, '|', -1) as long)").as("hr"),
        col("b"), col("m"))
    val got = Sketches.hllSlidingEstimate(regs, windowHours = 24)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    // only the three ACTIVE hours emit rows — hour 40's window does NOT
    // reach back to hour 1 (39 > 23), hours 2..39 emit nothing
    assert(got.keySet == Set(0L, 1L, 40L))
    // hour 1's sliding estimate must EQUAL the direct union of hours 0+1
    val direct01 = Sketches.hllDistinct(
        ev.where(col("hr0") <= 1L).withColumn("g", col("g0")), "g", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(3))).head
    assert(got(1L) == direct01, "sliding union must equal the direct build")
    // hour 40 sees only its own registers
    val direct40 = Sketches.hllDistinct(
        ev.where(col("hr0") === 40L).withColumn("g", col("g0")), "g", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(3))).head
    assert(got(40L) == direct40)
  }

  test("hllDistinct: deterministic under repartitioning; integers hash-stable") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", i.toString)).toDF("g", "v")
    val a = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Sketches.hllDistinct(df.repartition(17), "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b)
  }

  // ———————————————————————————————————— quantile sketch

  /** rows (g, id, v): ids globally unique so the sampling hash is. */
  private def qsDf(rows: Seq[(String, Long, Double)]) =
    rows.toDF("g", "id", "v")

  private def collectSketch(sk: org.apache.spark.sql.DataFrame) =
    sk.as[(String, String, Double, Int, Int, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("quantileSketch: merge law is EXACT — merge(sk(A), sk(B)) ≡ sk(A ∪ B)") {
    // 400 rows/group with k=16 forces a non-trivial threshold (thr ≥ 4);
    // the split is by id parity, so both halves carry every level range
    val all = (0 until 400).map(i => ("g1", i.toLong, (i * 37 % 400).toDouble)) ++
      (0 until 300).map(i => ("g2", 1000L + i, (i * 13 % 300).toDouble))
    val (a, b) = all.partition(_._2 % 2 == 0)
    val whole = Sketches.quantileSketch(qsDf(all), "g", "v", "id", k = 16)
    val merged = Sketches.quantileSketchMerge(
      Sketches.quantileSketch(qsDf(a), "g", "v", "id", k = 16),
      Sketches.quantileSketch(qsDf(b), "g", "v", "id", k = 16), k = 16)
    assert(collectSketch(merged) == collectSketch(whole),
      "threshold level-sampling must be a canonical function of the multiset")
    assert(whole.agg(max("thr")).as[Int].head() >= 1, "threshold engaged")
  }

  test("quantileSketch: merge is commutative and handles one-sided groups") {
    val a = qsDf((0 until 200).map(i => ("x", i.toLong, i.toDouble)) ++
      Seq(("onlyA", 900L, 1.0)))
    val b = qsDf((200 until 350).map(i => ("x", i.toLong, i.toDouble)))
    val sa = Sketches.quantileSketch(a, "g", "v", "id", k = 8)
    val sb = Sketches.quantileSketch(b, "g", "v", "id", k = 8)
    assert(collectSketch(Sketches.quantileSketchMerge(sa, sb, k = 8)) ==
      collectSketch(Sketches.quantileSketchMerge(sb, sa, k = 8)))
    // a group present on one side passes through unchanged
    val m = Sketches.quantileSketchMerge(sa, sb, k = 8)
      .where(col("g") === "onlyA")
    assert(collectSketch(m) == collectSketch(sa.where(col("g") === "onlyA")))
  }

  test("quantileSketch: ≤ k rows degenerate to exact order statistics") {
    val df = qsDf(Seq(10.0, 20.0, 30.0, 40.0, 50.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) })
    val sk = Sketches.quantileSketch(df, "g", "v", "id", k = 256)
    assert(sk.agg(max("thr")).as[Int].head() == 0)
    val got = Sketches.quantileSketchQuery(sk,
        Seq((1, 2), (4, 5), (1, 5)))
      .select("q_num", "q_den", "est").as[(Int, Int, Double)]
      .collect().map { case (n2, d, e) => (n2, d) -> e }.toMap
    // exact: ceil(q·5) -> 3rd, 4th, 1st smallest
    assert(got == Map((1, 2) -> 30.0, (4, 5) -> 40.0, (1, 5) -> 10.0))
  }

  test("quantileSketch: kept ≤ k; estimates track truth on a large group") {
    val n = 20000
    val df = qsDf((0 until n).map(i => ("g", i.toLong, (i * 997 % n).toDouble)))
    val sk = Sketches.quantileSketch(df, "g", "v", "id", k = 256)
    assert(sk.count() <= 256)
    val got = Sketches.quantileSketchQuery(sk, Seq((1, 2), (9, 10)))
      .select("q_num", "est").as[(Int, Double)].collect().toMap
    // values are a permutation of 0..n-1: true p50 = n/2, p90 = 0.9n;
    // sample error at k≈256 is O(n/√k) ≈ 6% — assert 4× that
    assert(math.abs(got(1) - n / 2.0) / n < 0.25, s"p50=${got(1)}")
    assert(math.abs(got(9) - 0.9 * n) / n < 0.25, s"p90=${got(9)}")
  }

  test("quantileSketch: deterministic under repartitioning") {
    val df = qsDf((0 until 3000).map(i => (s"g${i % 2}", i.toLong, (i % 77).toDouble)))
    val a = collectSketch(Sketches.quantileSketch(df, "g", "v", "id", k = 32))
    val b = collectSketch(
      Sketches.quantileSketch(df.repartition(13), "g", "v", "id", k = 32))
    assert(a == b)
  }

  test("cmsTokenCounts: colliding sketch only ever OVER-estimates") {
    // width 2 forces collisions in every row; CMS counters only absorb
    // other tokens' counts, so est >= truth for every probe — the
    // one-sided error guarantee
    val truth = Map("a" -> 3L, "b" -> 2L, "c" -> 3L)
    val got = Sketches.cmsTokenCounts(cmsDocs.toDF("doc_id", "text"),
        "text", "doc_id", depth = 4, width = 2)
      .as[(String, Long)].collect().toMap
    assert(got.keySet == truth.keySet) // probes = min-id doc's tokens
    truth.foreach { case (t, n) => assert(got(t) >= n, s"token $t") }
  }

  test("bitmapSegments + bitmapOverlap equal exact set arithmetic") {
    import spark.implicits._
    // members straddle word boundaries (31|32) and repeat (dedup law)
    val rows = Seq("A" -> 1L, "A" -> 31L, "A" -> 32L, "A" -> 32L,
      "A" -> 100L, "B" -> 31L, "B" -> 32L, "B" -> 99L,
      "C" -> 7L, "C" -> 100L).toDF("seg", "member")
    val bm = Sketches.bitmapSegments(rows, "seg", "member")
    val got = Sketches.bitmapOverlap(bm)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // exact: A={1,31,32,100} B={31,32,99} C={7,100}
    assert(got(("A", "B")) == ((4L, 3L, 2L, 400000L))) // J=2/5
    assert(got(("A", "C")) == ((4L, 2L, 1L, 200000L))) // J=1/5
    // B and C share words only via 99|96-word? 99 div 32 = 3, 7 div 32 = 0,
    // 100 div 32 = 3: B word 3 (99) vs C word 3 (100) -> masks AND to 0
    assert(got(("B", "C"))._3 == 0L && got(("B", "C"))._4 == 0L)
  }

  test("bitmapSegments rejects negative member ids loudly") {
    import spark.implicits._
    val bad = Seq("A" -> -3L).toDF("seg", "member")
    val e = intercept[Exception] {
      Sketches.bitmapSegments(bad, "seg", "member").collect()
    }
    assert(e.getMessage.contains("negative member id"))
  }

  test("cmsJoinSize: exact truth, estimate >= truth, exact when sparse") {
    import spark.implicits._
    // a: keys 1×2, 2×3, 3×1;  b: keys 2×2, 3×4, 9×5 → true = 3·2 + 1·4
    val a = Seq(1L, 1L, 2L, 2L, 2L, 3L).toDF("k")
    val b = (Seq.fill(2)(2L) ++ Seq.fill(4)(3L) ++ Seq.fill(5)(9L)).toDF("k")
    val r = Sketches.cmsJoinSize(a, "k", b, "k", depth = 4, width = 1024)
      .as[(Long, Long)].collect().head
    assert(r._2 == 10L)
    assert(r._1 >= r._2, "CMS inner product only over-estimates")
    // 4 distinct keys in 1024 buckets: collisions are absent, est exact
    assert(r._1 == 10L)
  }

  test("cmsJoinSize: disjoint key sets estimate and join to zero") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(7L, 8L).toDF("k")
    val r = Sketches.cmsJoinSize(a, "k", b, "k", depth = 4, width = 1024)
      .as[(Long, Long)].collect().head
    // 4 keys in 1024 buckets: no collision in any row, so every row's
    // product sum is empty and the min is forced to 0
    assert(r._2 == 0L && r._1 == 0L)
  }

  test("kmvMembershipIntersect: small sets exact, nulls ignored") {
    import spark.implicits._
    // below-k regime: every branch must be EXACT by construction
    val a = (Seq[Option[Long]](None) ++ (1L to 30L).map(Some(_))).toDF("u")
    val b = ((21L to 50L).map(Option(_))).toDF("u")
    val r = Sketches.kmvMembershipIntersect(a, b, "u", k = 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // (est_a, est_b, est_union, est_inter, exact_a..exact_inter)
    assert(r == ((30L, 30L, 50L, 10L, 30L, 30L, 50L, 10L)))
  }

  test("kmvMembershipIntersect: estimation regime brackets the truth") {
    import spark.implicits._
    val a = (1L to 500L).toDF("u")
    val b = (301L to 800L).toDF("u")
    val r = Sketches.kmvMembershipIntersect(a, b, "u", k = 64)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // k=64 bottom-k: relative error ~1/sqrt(k) ≈ 12%; allow 3σ
    def close(est: Long, exact: Long) =
      math.abs(est - exact) <= (exact * 0.4).toLong
    assert(close(r._1, 500L) && close(r._2, 500L) && close(r._3, 800L),
      s"estimates drifted: $r")
    assert(r._4 >= 0 && r._4 <= r._3)
    assert(r._5 == 500L && r._6 == 500L && r._7 == 800L && r._8 == 200L)
  }
}
