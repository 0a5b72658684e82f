package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The LSH band self-joins (minhash banding, sign-random-projection
  * buckets) must stay bounded under a duplicate-heavy corpus: 10⁵
  * byte-identical documents land in ONE bucket per band — the last
  * all-pairs-in-disguise at 100 TB. `maxBucket` caps every bucket's
  * document frequency before the join; identical docs are collapsed by
  * exact-dedup-first in production, so losing them here is the documented
  * backstop semantics, while small buckets (real near-dup pairs) survive.
  */
class LshBucketCapSpec extends SparkSpec {

  import spark.implicits._

  /** 60 byte-identical documents + one isolated near-dup pair. */
  private lazy val dupHeavy = {
    val clones = (0 until 60).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val pair = Seq(
      (100L, "completely different tail content marker alpha beta gamma delta"),
      (101L, "completely different tail content marker alpha beta gamma delta"))
    (clones ++ pair).toDF("doc_id", "text")
  }

  test("minhash band buckets are bounded at the cap") {
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.shingleRows(dupHeavy, "text", "doc_id"), 12),
      numHashes = 12, rowsPerBand = 3)
    val maxBefore = bands.groupBy("band", "band_sig").count()
      .agg(max("count")).as[Long].head()
    assert(maxBefore == 60, "the clone bucket should span all 60 duplicates")
    val pruned = Dedup.pruneHotKeys(bands, Seq("band", "band_sig"), 10)
    val maxAfter = pruned.groupBy("band", "band_sig").count()
      .agg(max("count")).as[Long].head()
    assert(maxAfter <= 10, s"a band bucket survived above the cap: $maxAfter")
  }

  test("capped minhash candidates: quadratic clone bucket gone, small pair kept") {
    val unpruned = Dedup.minhashCandidatePairs(dupHeavy, "text", "doc_id")
    assert(unpruned.count() == 60L * 59 / 2 + 1,
      "without a cap the clones form an all-pairs candidate set")
    val capped = Dedup.minhashCandidatePairs(dupHeavy, "text", "doc_id",
      maxBucket = 10)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)),
      s"expected only the small-bucket pair to survive, got $pairs")
  }

  test("a cap above every bucket is identical to the uncapped operator") {
    val d = Tables.documents(spark, sf()).filter(col("doc_id") < 300)
    val base = Dedup.minhashCandidatePairs(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val highCap = Dedup.minhashCandidatePairs(d, "text", "doc_id",
      maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty && base == highCap)
  }

  /** 60 identical embeddings + one identical pair pointing elsewhere. */
  private lazy val dupVectors = {
    val a = Seq(1.0, 0.0, 0.0, 0.5, 0.0, 0.25, 0.0, 0.125)
    val b = Seq(0.0, 1.0, 0.0, 0.0, 0.5, 0.0, 0.25, 0.0)
    ((0 until 60).map(i => (i.toLong, a)) ++ Seq((100L, b), (101L, b)))
      .toDF("vec_id", "embedding")
  }

  test("sign-LSH bucket cap bounds the clone bucket and keeps the small pair") {
    val unpruned = Similarity.lshNearDupPairs(dupVectors, threshold = 0.9,
      numBits = 16, bitsPerBand = 4, dims = 8)
    assert(unpruned.count() == 60L * 59 / 2 + 1,
      "without a cap the clone vectors form an all-pairs candidate set")
    val capped = Similarity.lshNearDupPairs(dupVectors, threshold = 0.9,
      numBits = 16, bitsPerBand = 4, dims = 8, maxBucket = 10)
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L)),
      s"expected only the small-bucket pair to survive, got $pairs")
  }

  test("sign-LSH high cap is identical to the uncapped operator") {
    val v = Tables.embeddings(spark, sf()).filter(col("vec_id") < 300)
    val base = Similarity.lshNearDupPairs(v, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val highCap = Similarity.lshNearDupPairs(v, threshold = 0.4,
      maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty && base == highCap)
  }

  test("lshParameterSweep: exact dups found at every r; both curves monotone in r") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .filter(col("doc_id") < 300)
      // plant one exact duplicate so n_relevant ≥ 1 at every threshold
      .unionByName(Tables.documents(spark, sf("sf0.01"))
        .filter(col("doc_id") === 0).select(lit(9999L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars")))
    val got = Dedup.lshParameterSweep(docs, "text", "doc_id",
        rOptions = Seq(1, 3, 12))
      .orderBy("r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 12L))
    assert(got.forall { case (r, nb, _, _, _) => nb == 12 / r })
    // an exact duplicate has identical signatures, hence shares every
    // band at every r — TP ≥ 1 everywhere
    assert(got.forall(_._5 >= 1),
      s"exact dup missed: ${got.mkString(", ")}")
    // more rows per band can only shrink the candidate set
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse,
      s"candidates must be non-increasing in r: ${got.mkString(", ")}")
    // n_relevant is r-independent (ground truth, not banding)
    assert(got.map(_._4).distinct.length == 1)
  }
}
