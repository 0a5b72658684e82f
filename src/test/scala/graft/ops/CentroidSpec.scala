package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd refinement semantics: planted clusters are recovered from
  * deliberately bad initial centroids, refinement never loses a
  * centroid, and the mean member-to-centroid similarity does not
  * decrease — the properties an IVF index build needs from its
  * centroid step (bit-level output is engine-dependent FP, so no SQL
  * oracle; see refineCentroids scaladoc).
  */
class CentroidSpec extends SparkSpec {

  test("meanPoolEmbeddings: exact micro means, floor division, grouping") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, -2.0f)), (1L, Array(2.0f, 1.0f)),
      (2L, Array(0.5f, 0.0f)), // group 0: means (3.5/3, -1/3)
      (10L, Array(4.0f, 4.0f))) // group 1: itself
      .toDF("vec_id", "embedding")
    val got = Similarity.meanPoolEmbeddings(emb, "vec_id", "embedding",
        org.apache.spark.sql.functions.expr("vec_id div 10"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // micro units: (1e6 + 2e6 + 5e5) div 3 = 1166666;
    // (-2e6 + 1e6 + 0) div 3 = -333333 — BOTH engines truncate integral
    // division toward zero (DuckDB // floors only on floats; probed)
    assert(got == Set(
      (0L, 0L, 1166666L, 3L), (0L, 1L, -333333L, 3L),
      (1L, 0L, 4000000L, 1L), (1L, 1L, 4000000L, 1L)))
  }

  import spark.implicits._

  test("kmeansInteger: planted clusters recovered, exact sizes and distances") {
    // two tight planted clusters; seeds = ids 0 and 1 (one in each)
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(0.001f, 0.0f)), (3L, Array(0.0f, 0.001f)),
      (4L, Array(10.001f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansInteger(emb, "vec_id", "embedding",
        k = 2, iters = 3)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (k, n, d) => k -> ((n, d)) }.toMap
    // cluster 0: ids 0,2,3 — centroid after round 1 = (333, 333) micro
    //   (1000+0+0) div 3; dists: 0:(333²+333²)=221778, 2:(667²+333²),
    //   3 symmetric → mean = (221778+555778+555778) div 3 = 444444
    assert(got(0L) == (3L, Some(444444L)))
    // cluster 1: ids 1,4 — float 10.001f ≈ 10.0010004…, so xm(4) =
    //   round(10001000.4) = 10001000; cm = (1e7+10001000) div 2 =
    //   10000500; dists 500²=250000 each → mean 250000
    assert(got(1L) == (2L, Some(250000L)))
  }

  test("kmeansInteger: an empty cluster keeps its centroid and reports null") {
    // seed 2 duplicates seed 0's vector, so every point ties toward
    // the smaller cid; cluster 0's members are symmetric around it, so
    // its centroid never moves and cluster 2 stays empty through the
    // carry-over update too
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(5.0f)), (2L, Array(0.0f)),
      (3L, Array(-1.0f)), (4L, Array(1.0f)),
      (5L, Array(4.0f)), (6L, Array(6.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansInteger(emb, "vec_id", "embedding",
        k = 3, iters = 2)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (k, n, d) => k -> ((n, d)) }.toMap
    assert(got(2L) == (0L, None))
    // cluster 0 = {0, 2, 3, 4}: dists (0, 0, 1e12, 1e12) → mean 5e11
    assert(got(0L) == (4L, Some(500000000000L)))
    // cluster 1 = {1, 5, 6}: dists (0, 1e12, 1e12) → 2e12 div 3
    assert(got(1L) == (3L, Some(666666666666L)))
  }

  test("diversifiedTopKBatch: a dense region is capped; the next region enters") {
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
      .toDF("cid", "cvec")
    val corpus = Seq(
      (10L, Array(1.00f, 0.00f)), (11L, Array(0.99f, 0.01f)),
      (12L, Array(0.98f, 0.02f)), (20L, Array(0.00f, 1.00f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1.0, 0.0))).toDF("q_id", "qvec")
    // uncapped top-3 for q would be {10, 11, 12} — one near-dup region;
    // perCluster = 2 caps it and admits 20 from the orthogonal region
    val got = Similarity
      .diversifiedTopKBatch(corpus, cents, queries, k = 3, perCluster = 2)
      .select(col("q_id"), col("vec_id"), col("centroid_id"), col("rk"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    assert(got == Seq((0L, 10L, 0L, 1L), (0L, 11L, 0L, 2L),
      (0L, 20L, 1L, 3L)))
  }

  /** 3 planted clusters on near-orthogonal directions + deterministic
    * per-vector jitter.
    */
  private lazy val planted = {
    val dirs = Seq(
      Array(1.0, 0.0, 0.0, 0.2, 0.0, 0.0, 0.1, 0.0),
      Array(0.0, 1.0, 0.0, 0.0, 0.2, 0.0, 0.0, 0.1),
      Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.2, 0.1, 0.0))
    (0 until 120).map { i =>
      val c = i % 3
      val jitter = (d: Int) =>
        ((i * 31 + d * 7) % 11 - 5) / 100.0 // deterministic, small
      (i.toLong, c.toLong, dirs(c).zipWithIndex.map { case (v, d) => v + jitter(d) }.toSeq)
    }.toDF("vec_id", "planted", "embedding")
  }

  private def meanSim(cents: org.apache.spark.sql.DataFrame): Double = {
    val a = Similarity.assignToCentroids(planted, cents)
    a.join(cents, a("centroid_id") === cents("cid"))
      .select(avg(Similarity.cosine(
        Similarity.asDouble(col("embedding")), col("cvec"))))
      .as[Double].head()
  }

  test("refinement recovers planted clusters from bad initial centroids") {
    // initial centroids: three members of cluster 0's neighborhood —
    // maximally unhelpful (all in one planted cluster's direction) plus
    // two slightly rotated copies so assignment can still split
    val init = Seq(
      (0L, Seq(1.0, 0.1, 0.0, 0.2, 0.0, 0.0, 0.1, 0.0)),
      (1L, Seq(0.7, 0.7, 0.0, 0.1, 0.1, 0.0, 0.1, 0.0)),
      (2L, Seq(0.7, 0.0, 0.7, 0.1, 0.0, 0.1, 0.1, 0.0)))
      .toDF("cid", "cvec")
    val before = meanSim(init)
    val refined = Similarity.refineCentroids(planted, init, iters = 8)
    assert(refined.count() == 3, "refinement must never lose a centroid")
    val after = meanSim(refined)
    assert(after >= before - 1e-9,
      s"mean member-centroid similarity decreased: $before -> $after")
    // every planted cluster maps to ONE refined centroid and vice versa
    val purity = Similarity.assignToCentroids(planted, refined)
      .join(planted.select(col("vec_id"), col("planted")), "vec_id")
      .groupBy(col("planted"))
      .agg(countDistinct(col("centroid_id")).as("n_cents"),
        count(lit(1)).as("n"))
      .collect()
    assert(purity.forall(_.getLong(1) == 1L),
      s"each planted cluster should collapse onto one centroid: ${purity.mkString(", ")}")
    assert(after > 0.9, s"refined centroids should sit inside their clusters ($after)")
  }

  test("a centroid with no members keeps its previous position") {
    val far = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      // opposite to everything: cosine < 0 vs all planted vectors
      (1L, Seq(-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("cid", "cvec")
    val refined = Similarity.refineCentroids(planted, far, iters = 2)
    assert(refined.count() == 2)
    val kept = refined.where(col("cid") === 1L)
      .select(col("cvec")).as[Seq[Double]].head()
    assert(kept == Seq(-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      "the empty centroid must survive unchanged")
  }

  test("randomProjection: hand-derived signs, exact micro sums, determinism") {
    import spark.implicits._
    // micro-exact inputs: 0.5 -> 500000, -0.25 -> -250000
    val emb = Seq((7L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(emb, "vec_id", "embedding",
        outDims = 4, seed = "jl")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // the spec re-derives the seeded sign lattice independently
    def sgn(o: Int, d: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp|jl|$o|$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) <= '7') 1L else -1L
    }
    (0 until 4).foreach { o =>
      assert(got(o.toLong) == sgn(o, 0) * 500000L + sgn(o, 1) * -250000L,
        s"out dim $o")
    }
    // deterministic: a rerun with the same seed is bit-identical
    val again = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDims = 4, seed = "jl").collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
    // a different seed flips at least one sign over 4x2 draws
    val other = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDims = 4, seed = "jl2").collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(other != got)
  }

  test("randomProjection: a null element fails by name, never a silent null") {
    import spark.implicits._
    val emb = Seq((1L, Array(Some(0.5f), None))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(emb, "vec_id", "embedding", 2).collect()
    }
    assert(e.toString.contains("randomProjection") ||
      Option(e.getCause).exists(_.toString.contains("randomProjection")))
  }

  test("mipsTopKBatch: pruned result equals exact brute force across norm bands") {
    import spark.implicits._
    // deterministic corpus with WIDELY varying norms so several nsq
    // bands exist and phase-2 pruning actually has rows to judge
    def v(i: Int): Array[Float] = Array(
      ((i * 7) % 11 - 5) * (if (i % 5 == 0) 2.0f else 0.01f),
      ((i * 3) % 13 - 6) * 0.3f,
      ((i * 5) % 7 - 3) * (if (i % 3 == 0) 1.5f else 0.1f),
      (i % 9 - 4) * 0.05f)
    val corpus = (0 until 60).map(i => (i.toLong, v(i)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 3).map(i => (100L + i, v(i * 17 + 1)
        .map(_.toDouble)))
      .toDF("q_id", "qvec")
    val got = Similarity.mipsTopKBatch(corpus, queries, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // expected: exact integer dot of micro vectors, (dot desc, id) rank
    def micro(a: Array[Float]): Array[Long] =
      a.map(x => math.round(x.toDouble * 1000000))
    val exp = (0 until 3).flatMap { qi =>
      val qm = micro(v(qi * 17 + 1))
      (0 until 60).map { i =>
        val xm = micro(v(i))
        (i.toLong, qm.zip(xm).map { case (a, b) => a * b }.sum)
      }.sortBy { case (id, d) => (-d, id) }.take(7).zipWithIndex
        .map { case ((id, d), r) => (100L + qi, r + 1L) -> ((id, d)) }
    }.toMap
    assert(got == exp, "norm-pruned MIPS must equal brute force exactly")
  }

  test("embeddingDrift: hand cosine + exact L2 shift, zero-norm null") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), // snap 0: (0.5, 0.5)
      (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)), // snap 1: (1.0, 0.0)
      (4L, Array(0.0f, 0.0f)), (5L, Array(0.0f, 0.0f))) // snap 2: zero norm
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDrift(emb, "vec_id", "embedding",
        expr("vec_id div 2"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          r.getLong(3)))).toMap
    // snap1 vs snap0: dot = 5e11, |a|^2 = 1e12, |b|^2 = 5e11
    // cos = 5e11 / sqrt(5e23) = 0.7071067... -> 0.707107 at 6 d.p.
    val (n1, cos1, l21) = got(1L)
    assert(n1 == 2 && cos1.contains(0.707107))
    assert(l21 == 500000L * 500000L + 500000L * 500000L)
    // snap2 has zero norm: cosine null, L2 shift still exact
    val (_, cos2, l22) = got(2L)
    assert(cos2.isEmpty)
    assert(l22 == 1000000L * 1000000L)
    // snap 0 has no predecessor: absent, not a null row
    assert(!got.contains(0L))
  }

  test("embeddingOutliers: the planted far vector is the only outlier") {
    import spark.implicits._
    // label 0: nine identical vectors at (1, 0) plus one at (100, 0) —
    // zero in-cluster spread makes the far point the sole deviation;
    // label 1 is tight
    val rows =
      (1L to 9L).map(i => (i, Array(1.0f, 0.0f), 0)) ++
        Seq((10L, Array(100.0f, 0.0f), 0)) ++
        (11L to 14L).map(i => (i, Array(0.0f, 2.0f), 1))
    val got = Similarity.embeddingOutliers(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 3)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0)._2 == 10L && got(0)._5 == 1L, s"${got(0)}")
    assert(got(1)._2 == 4L && got(1)._5 == 0L, s"${got(1)}")
  }

  test("embeddingOutliers: zero MAD degrades to any-deviation flags") {
    import spark.implicits._
    // three identical vectors + one different: MAD = 0, so the
    // different one (deviation > 0 = 3·0) must flag
    val rows = Seq((1L, Array(1.0f), 0), (2L, Array(1.0f), 0),
      (3L, Array(1.0f), 0), (4L, Array(2.0f), 0))
    val got = Similarity.embeddingOutliers(
      rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", k = 3)
      .as[(Int, Long, Long, Long, Long)].collect().head
    assert(got._5 == 1L, s"$got")
  }

  test("kmeansSilhouette: hand-computed milli scores incl. the boundary tie") {
    import spark.implicits._
    // 1-D whole-unit layout (exact micro ints); k=2 seeds = ids 0,1 at
    // 0 and 8; iters=1 so silhouette runs against the seed centroids:
    //   id2 at 1 → a=1e12, b=49e12 → s = 48000 div 49 = 979
    //   id3 at 9 → a=1e12, b=81e12 → s = 80000 div 81 = 987
    //   id4 at 4 → equidistant (16e12 both) → assigned cid0, s = 0
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(8.0f)), (2L, Array(1.0f)),
      (3L, Array(9.0f)), (4L, Array(4.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansSilhouette(emb, "vec_id", "embedding",
        k = 2, iters = 1)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // cid0 {0,2,4}: mean = (1000+979+0) div 3 = 659
    assert(got(0L) == ((0L, 3L, 3L, Some(659L), Some(0L), Some(1000L))))
    // cid1 {1,3}: mean = (1000+987) div 2 = 993
    assert(got(1L) == ((1L, 2L, 2L, Some(993L), Some(987L), Some(1000L))))
  }

  test("kmeansSilhouette: coincident centroids emit null, empty cluster ledger row") {
    import spark.implicits._
    // both seeds are the SAME point: every member has a = b = 0 →
    // max(a,b) = 0 → null s (not a fabricated 0); all points tie to
    // cid0, so cid1 ends empty and must still appear in the ledger
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(0.0f)), (2L, Array(0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansSilhouette(emb, "vec_id", "embedding",
        k = 2, iters = 1)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 3L, 0L, None, None, None)))
    assert(got(1L) == ((1L, 0L, 0L, None, None, None)))
  }

  test("kmeansSilhouette: single live centroid keeps members (null b/s)") {
    import spark.implicits._
    // one distinct id → one seed → no "other" centroid exists: the
    // member must survive the b-join with null scores, not vanish from
    // n_members (round-14 advice fix: own ⟕ other, was inner)
    val emb = Seq((7L, Array(3.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kmeansSilhouette(emb, "vec_id", "embedding",
        k = 2, iters = 1)
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(0L))
    assert(got(0L) == ((0L, 1L, 0L, None, None, None)))
  }
}
