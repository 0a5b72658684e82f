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

  test("hllDistinct: deterministic under repartitioning; integers hash-stable") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", i.toString)).toDF("g", "v")
    val a = Sketches.hllDistinct(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = Sketches.hllDistinct(df.repartition(17), "g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
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
}
