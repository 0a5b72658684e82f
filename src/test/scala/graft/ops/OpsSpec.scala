package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf()).cache()
  lazy val emb = Tables.embeddings(spark, sf()).cache()

  test("exact dedup keeps one representative per fingerprint group") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").cache()
    val kept = Dedup.deduped(docs, "text", "doc_id")
    assert(kept.count() == groups.count())
    // keepers are minimal ids of their group
    assert(groups.filter(col("keeper") < 0).count() == 0)
  }

  test("minhash-LSH candidates have full recall over true jaccard pairs") {
    val d = docs.filter(col("doc_id") < 300)
    val truePairs = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.minhashCandidatePairs(d, "text", "doc_id", 3, 12, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "fixture should contain planted near-dups")
    // LSH with b=4,r=3 has >99.9% recall at j>=0.8; planted dups are ~0.95+
    assert(truePairs.subsetOf(candidates),
      s"missed: ${truePairs.diff(candidates)}")
  }

  test("simhash: near-identical docs get near-identical digests") {
    import spark.implicits._
    val pair = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst execution engines")
    ).toDF("doc_id", "text")
    val hs = pair.select(col("doc_id"), Dedup.simhash16(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) < hamming(hs(1L), hs(3L)))
  }

  test("simhash banded Hamming search equals brute-force pairs (full recall)") {
    val d = docs.filter(col("doc_id") < 200)
    val dig = d.select(col("doc_id").as("id"), Dedup.simhash16(col("text")).as("h"))
    val brute = dig.as("x").join(dig.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.h").bitwiseXOR(col("y.h"))).as("hd"))
      .where(col("hd") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashNearDupPairs(d, "text", "doc_id",
      maxDist = 2, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain near-identical digests")
    // pigeonhole recall is exact and the verify filter is exact → equality
    assert(brute == banded)
  }

  test("simhash64 banded Hamming search equals brute-force pairs (full recall)") {
    val d = docs.filter(col("doc_id") < 200)
    val dig = d.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("h"))
    val brute = dig.as("x").join(dig.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        bit_count(col("x.h").bitwiseXOR(col("y.h"))).as("hd"))
      .where(col("hd") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashNearDupPairs64(d, "text", "doc_id",
      maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain near-identical digests")
    assert(brute == banded)
  }

  test("native minhash band sigs equal the relational reference chain") {
    import org.apache.spark.sql.functions.posexplode
    val d = docs.filter(col("doc_id") < 300)
    val relational = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.shingleRows(d, "text", "doc_id"), 12),
      numHashes = 12, rowsPerBand = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val native = d.select(col("doc_id").as("id"),
        posexplode(graft.functions.MinhashExpressions.bandSigs(
          TextOps.shingles(col("text")), 12, 3)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(relational.nonEmpty && relational == native)
  }

  test("native simhash expression is bit-identical to the HOF reference fold") {
    // the HOF fold IS the documented definition (and what the SQL oracle
    // mirrors); the native kernel must never drift from it at any width
    for (bits <- Seq(16, 64)) {
      val native = if (bits == 16) Dedup.simhash16(col("text"))
        else Dedup.simhash64(col("text"))
      val mismatch = docs.filter(col("doc_id") < 200)
        .select(native.as("n"), Dedup.simhashBitsHof(col("text"), bits).as("h"))
        .where(col("n") =!= col("h")).count()
      assert(mismatch == 0, s"native simhash$bits diverged from the HOF fold")
    }
  }

  test("simhash64 low 16 bits of digest agree with a widened simhash16 law") {
    // the two widths share the per-token bit derivation: bit b of both
    // reads md5 hex char b/4, bit 3-b%4 — so digests of EQUAL texts are
    // deterministic and the 16-bit digest equals the TOP 16 bits of the
    // 64-bit one (same counters for b < 16, same sign rule)
    val d = docs.filter(col("doc_id") < 50)
      .select(col("doc_id"), Dedup.simhash16(col("text")).as("h16"),
        Dedup.simhash64(col("text")).as("h64"))
    val mismatch = d.where(
      expr("shiftrightunsigned(h64, 48)") =!= col("h16")).count()
    assert(mismatch == 0, "simhash16 must equal the top 16 bits of simhash64")
  }

  test("hash split: stable assignment, sane proportions, sample ≡ first bucket") {
    val split = Sampling.hashSplit(docs.select(col("doc_id")), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10)).cache()
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    // md5 buckets are uniform; allow wide slack at this corpus size
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.keySet == Set("train", "val", "test"))
    // re-running yields the identical assignment (stability is the point)
    val again = Sampling.hashSplit(docs.select(col("doc_id")), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.except(again).count() == 0)
    // hashSample(pct=80) selects exactly the train bucket
    val sampled = Sampling.hashSample(docs.select(col("doc_id")), "doc_id", 80)
    assert(sampled.count() == counts("train"))
  }

  test("connected components collapse transitive duplicate chains") {
    import spark.implicits._
    // chain 1-2-3 (A≈B≈C without A≈C edge), pair 10-11, crossing pair 3-20
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 20L))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 20L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("dedupedByClusters keeps cluster minima and all singletons") {
    import spark.implicits._
    val universe = (0L to 25L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 20L)).toDF("a", "b")
    val kept = Dedup.dedupedByClusters(universe, "doc_id", pairs)
      .as[Long].collect().toSet
    // dropped: 2,3,20 (cluster 1) and 11 (cluster 10); everything else kept
    assert(kept == (0L to 25L).toSet -- Set(2L, 3L, 20L, 11L))
  }

  test("sourceOverlap: hand intersection, directed containments, disjoint pair absent") {
    import spark.implicits._
    // A: shingles {"a b c","b c d"}; B: {"a b c","b c x"} → inter 1,
    // jaccard 1/3, containment 1/2 each; Z shares nothing → no row
    val docs = Seq((1L, "a b c d", "A"), (2L, "a b c x", "B"),
      (3L, "p q r s", "Z")).toDF("doc_id", "text", "source")
    val got = graft.ops.TextOps.sourceOverlap(docs, "text", "source", 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("A", "B", 2L, 2L, 1L, 333333L, 500000L, 500000L)))
  }

  test("robustScaleEmbeddings: hand median/IQR; whale moves mean-z but not robust-z; zero IQR nulls") {
    import spark.implicits._
    // dim 0 values (milli): 1000, 2000, 3000, 4000, 1000000 (whale).
    // 4×: 4000..16000, 4e6 → m4 = 12000, p25_4 = 8000, p75_4 = 16000,
    // iqr4 = 8000. r_ppm(v=1000) = 1e6·(4000−12000) div 8000 = −1e6;
    // r_ppm(whale) = 1e6·(4e6−12000) div 8000 = 498500000 — bounded by
    // the IQR, not dragged by its own magnitude the way a σ fence is.
    // dim 1 constant → iqr 0 → null.
    val emb = Seq(
      (1L, Seq(1.0f, 7.0f)), (2L, Seq(2.0f, 7.0f)), (3L, Seq(3.0f, 7.0f)),
      (4L, Seq(4.0f, 7.0f)), (5L, Seq(1000.0f, 7.0f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.robustScaleEmbeddings(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), Option(r.get(5)))).toMap
    assert(got((1L, 0L)) == (12000L, 8000L, Some(-1000000L)))
    assert(got((5L, 0L)) == (12000L, 8000L, Some(498500000L)))
    assert(got((3L, 1L))._3.isEmpty && got((3L, 1L))._2 == 0L)
  }

  test("fisherDims: separated classes score high; zero within-class variance nulls") {
    import spark.implicits._
    // dim 0: classes {0,0} vs {1.000,1.002} → between 1002001, within 2,
    // F = 1002001·(4−2)/(2·(2−1)) = 1002001. A second dim with identical
    // class members (within = 0) must null, not divide.
    val emb = Seq(
      (1L, Seq(0.0f, 5.0f), 0), (2L, Seq(0.0f, 5.0f), 0),
      (3L, Seq(1.0f, 7.0f), 1), (4L, Seq(1.002f, 7.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity.fisherDims(emb)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), Option(r.get(5)))).toMap
    assert(got(0L) == (1002001L, 2L, Some(1002001.0)))
    assert(got(1L)._2 == 0L && got(1L)._3.isEmpty)
  }

  test("editRatioNearDupPairs: identical text passes at ratio 0; unrelated candidates verify away") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, base), (2L, base), // exact copy → dist 0
      (3L, base + " x"), // one char edit → tiny ratio
      (4L, "completely different content with no shared phrasing at all here"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.editRatioNearDupPairs(docs, "text", "doc_id",
        maxRatioPpm = 100000L)
      .as[(Long, Long, Long, Long)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(got.contains((1L, 2L, 0L)))
    assert(got.contains((1L, 3L, 2L)) && got.contains((2L, 3L, 2L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exactSubstringPairs: embedded copy found exactly; threshold and cap hold") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alphax $common"),
      (2L, s"deltay $common"),
      (3L, "completely different content with no shared phrasing at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.exactSubstringPairs(docs, "text", "doc_id", minLen = 20)
      .as[(Long, Long, Long, String)].collect().toSeq
    // the embedded copy is preceded by a space in both docs and runs to
    // the end of both
    assert(got == Seq((1L, 2L, common.length + 1L, s" $common")))
    // threshold: raising minLen past the copy's length drops the pair
    assert(Dedup.exactSubstringPairs(docs, "text", "doc_id",
      minLen = common.length + 3).count() == 0)
    // saturation: a cap below the copy's length reports exactly the cap
    val capped = Dedup.exactSubstringPairs(docs, "text", "doc_id",
        minLen = 10, maxReport = 20)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(capped.map(t => (t._1, t._2, t._3)) == Seq((1L, 2L, 20L)))
    assert(capped.head._4.length == 20)
  }

  test("softDedupWeights: inverse-cluster-size ppm; singletons keep the full million") {
    import spark.implicits._
    val universe = (0L to 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val got = Dedup.softDedupWeights(universe, "doc_id", pairs)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 0L, 1L, 1000000L), // singleton: own cluster, full weight
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L), (3L, 1L, 3L, 333333L),
      (4L, 4L, 2L, 500000L), (5L, 4L, 2L, 500000L)))
    // cluster mass ≈ one doc each (truncation loses ≤ n−1 ppm)
    assert(got.groupBy(_._2).values.forall(c => c.map(_._4).sum <= 1000000L))
  }

  test("connected components: long chains converge, and an unconverged run throws") {
    import spark.implicits._
    // a 30-hop path needs 30 propagation rounds — above the old silent
    // default; must converge under the current one and label everything 0
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 31 && cc.values.forall(_ == 0L))
    // with maxIter below the diameter the result would be WRONG — it
    // must fail loudly, never return plausible labels
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 5).collect()
    }
  }

  test("quantized ANN: bounded reconstruction error, high recall vs exact") {
    val corpus = emb.filter(col("vec_id") > 0)
    val params = Similarity.quantizationParams(corpus).orderBy("pos").collect()
    val mins = params.map(_.getDouble(1)).toSeq
    val maxs = params.map(_.getDouble(2)).toSeq
    // per-dim reconstruction error is at most half a quantization step
    val maxErr = corpus.select(
        aggregate(
          zip_with(Similarity.asDouble(col("embedding")),
            Similarity.dequantizedCol(col("embedding"), mins, maxs),
            (v, d) => abs(v - d)),
          lit(0.0), (a, x) => greatest(a, x)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    val maxStep = mins.zip(maxs).map { case (mn, mx) => (mx - mn) / 255 / 2 }.max
    assert(maxErr <= maxStep + 1e-12,
      s"reconstruction error $maxErr above half-step bound $maxStep")
    // recall@10 against the exact search
    val queryDf = emb.filter(col("vec_id") === 0)
      .select(Similarity.asDouble(col("embedding")).as("qvec"))
    val exact = Similarity.bruteForceTopK(corpus, queryDf, k = 10)
      .collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(corpus, queryDf, k = 10, rerankFactor = 3)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(quant).size >= 8,
      s"quantized recall@10 too low: ${exact.intersect(quant).size}/10")
  }

  test("brute-force ANN: top-1 of a vector against itself is itself") {
    val queryDf = emb.filter(col("vec_id") === 42)
      .select(Similarity.asDouble(col("embedding")).as("qvec"))
    val top = Similarity.bruteForceTopK(emb, queryDf, 1).collect().head
    assert(top.getLong(0) == 42L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-9)
  }

  test("IVF probes restrict candidates but keep bucket-local exactness") {
    val centroids = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), Similarity.asDouble(col("embedding")).as("cvec"))
    val queryDf = emb.filter(col("vec_id") === 0)
      .select(Similarity.asDouble(col("embedding")).as("qvec"))
    val ivf = Similarity.ivfTopK(emb.filter(col("vec_id") >= 16), centroids,
      queryDf, 10, 2).collect()
    assert(ivf.length == 10)
    // with 16 probes (= all centroids) IVF equals brute force
    val ivfAll = Similarity.ivfTopK(emb.filter(col("vec_id") >= 16), centroids,
      queryDf, 10, 16).collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") >= 16),
      queryDf, 10).collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute)
  }

  test("LSH near-dup candidates are a subset of exact pairs at the same threshold") {
    val vecs = emb.filter(col("vec_id") < 500)
    val exact = Similarity.nearDupPairs(vecs, 0.4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, 0.4, numBits = 16, bitsPerBand = 4)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must never invent pairs (exact verify runs on candidates)")
    assert(lsh.nonEmpty, "bucketing should recover some true pairs at this threshold")
    // this data's max cosine is ~0.51 — partial recall is expected and
    // honest at 16 bits / 4-bit bands (sign-LSH targets higher similarity)
  }

  test("winnowing fingerprints are robust to local edits") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm windowsill in the late afternoon sun"
    val edited = base.replace("lazy", "sleepy") // one-word local edit
    val docs2 = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val fps = TextOps.winnowingFingerprintRows(docs2, "text", "doc_id")
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val shared = fps(1L).intersect(fps(2L)).size
    val total = math.max(fps(1L).size, fps(2L).size)
    // a local edit perturbs only fingerprints overlapping the edit site
    assert(shared.toDouble / total > 0.5,
      s"local edit should preserve most fingerprints ($shared/$total shared)")
    // while an unrelated doc shares ~none
    val other = Seq((3L, "completely different content about spark catalyst " +
      "query planning and distributed shuffle execution strategies")).toDF("doc_id", "text")
    val fps3 = TextOps.winnowingFingerprintRows(other, "text", "doc_id")
      .collect().map(_.getLong(1)).toSet
    assert(fps(1L).intersect(fps3).isEmpty)
  }

  test("native winnowing fingerprints equal the relational reference chain") {
    val d = docs.filter(col("doc_id") < 300)
    val relational = TextOps.winnowingFingerprintRowsRelational(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = TextOps.winnowingFingerprintRows(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(relational.nonEmpty && relational == native)
  }

  test("quality filter keeps a nonempty strict subset, every rule binding") {
    val kept = TextOps.qualityFilter(docs, "text",
      minWords = 30, maxWords = 120, minStopwordRatio = 0.08,
      minAlphaRatio = 0.5, lang = Some("en"))
    val n = docs.count()
    val k = kept.count()
    assert(k > 0 && k < n, s"filter should bind on this corpus: kept $k of $n")
    // loosening only the stopword floor must re-admit documents —
    // proving that rule (not just the word band) is doing work
    val loose = TextOps.qualityFilter(docs, "text",
      minWords = 30, maxWords = 120, minStopwordRatio = 0.0,
      minAlphaRatio = 0.5, lang = Some("en")).count()
    assert(loose > k)
  }

  test("vocabulary: contiguous ids in (count desc, token) order, floor applied") {
    val v = TextOps.vocabulary(docs, "text", minCount = 5, topK = 100)
      .orderBy("token_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.nonEmpty && v.map(_._3).toSeq == v.indices.map(_.toLong))
    assert(v.forall(_._2 >= 5))
    // ranked: counts non-increasing, token ascending within equal counts
    v.sliding(2).foreach { case Array((t1, n1, _), (t2, n2, _)) =>
      assert(n1 > n2 || (n1 == n2 && t1 < t2))
    case _ => }
  }

  test("tfidf: a corpus-wide token scores below a doc-specific one") {
    import spark.implicits._
    val d = Seq(
      (1L, "common common rare"),
      (2L, "common common other"),
      (3L, "common filler words")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(d, "text", "doc_id", topK = 3)
      .where(col("id") === 1).orderBy(col("rk"))
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    // 'common' appears in every doc → idf ln(1) = 0 despite tf=2;
    // 'rare' appears only here → positive score, ranks first
    assert(top.head._1 == "rare" && top.head._2 > 0)
    assert(top.find(_._1 == "common").exists(_._2 == 0.0))
  }

  test("stratified sample: per-stratum rates bind, default applies, stable") {
    import spark.implicits._
    val d = docs.select(col("doc_id"),
      (col("doc_id") % 2 === 0).cast("string").as("stratum"))
    val kept = Sampling.stratifiedSample(d, "doc_id", "stratum",
      Seq("true" -> 100, "false" -> 0)).cache()
    // rate 100 keeps the whole stratum, rate 0 drops the other entirely
    assert(kept.where(col("stratum") === "false").count() == 0)
    assert(kept.where(col("stratum") === "true").count() ==
      d.where(col("stratum") === "true").count())
    // a mid rate keeps a strict, deterministic subset
    val p40a = Sampling.stratifiedSample(d, "doc_id", "stratum",
      Seq("true" -> 40), defaultPct = 40).select("doc_id").as[Long].collect().toSet
    val p40b = Sampling.stratifiedSample(d, "doc_id", "stratum",
      Seq("true" -> 40), defaultPct = 40).select("doc_id").as[Long].collect().toSet
    assert(p40a == p40b && p40a.nonEmpty && p40a.size < d.count())
  }

  test("sequence packing: stream-chunk windows per shard, deterministic") {
    import spark.implicits._
    val withTok = docs.select(col("doc_id"),
      TextOps.wsTokenCount(col("text")).as("n_tok"))
    val packed = Sampling.packSequences(withTok, "doc_id", "n_tok",
      budget = 500, numShards = 4)
      .join(withTok.withColumnRenamed("doc_id", "id"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.nonEmpty && packed.map(_._2).distinct.length == 4)
    // re-derive per shard: prefix sums in id order; a doc's bin is the
    // budget window of its first token
    packed.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, bin, tok) =>
        assert(bin == cum / 500, s"bin $bin != window of offset $cum")
        cum += tok
      }
    }
    // multiple bins actually form (the window is doing work)
    assert(packed.map(r => (r._2, r._3)).distinct.length > 4)
  }

  test("tokenizeToIds: order preserved, OOV is -1, ids from the vocabulary") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta alpha zzzunknown beta")).toDF("doc_id", "text")
    val vocab = Seq(("alpha", 0L), ("beta", 1L)).toDF("token", "token_id")
    val out = TextOps.tokenizeToIds(d, "text", "doc_id", vocab)
      .select(col("token_ids")).as[Seq[Long]].head()
    assert(out == Seq(0L, 1L, 0L, -1L, 1L))
  }

  test("contamination flags exactly the eval docs sharing a long n-gram with train") {
    import spark.implicits._
    val run = "one two three four five six seven eight nine ten eleven twelve thirteen"
    val d = Seq(
      (1L, "train", s"prefix words $run suffix words here"),
      (2L, "train", "completely unrelated training content with no shared runs at all today"),
      (10L, "test", s"different framing but $run appears verbatim"),
      (11L, "test", "clean test document sharing nothing with the training half whatsoever"))
      .toDF("doc_id", "split", "text")
    val hits = Dedup.contamination(d, "text", "doc_id", "split",
      "train", "test", n = 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.keySet == Set(10L), s"expected only doc 10 flagged, got $hits")
    assert(hits(10L) >= 1)
  }

  test("contaminationSpans: run length, coverage sweep, hand-computed") {
    import spark.implicits._
    // 20 shared words: runs of 8 consecutive shared 13-gram positions
    val shared = (1 to 20).map(k => s"w$k").mkString(" ")
    val d = Seq(
      (1L, "train", s"$shared trailing filler tail"),
      // eval doc A: the 20-word block verbatim at the start — positions
      // 0..7 shared (8-run) -> max_shared_len = 8 + 12 = 20; coverage =
      // union of [0..12]..[7..19] = 20 words of 24 -> 20/24
      (10L, "test", s"$shared alpha beta gamma delta"),
      // eval doc B: TWO disjoint copies separated by >13 unshared words
      // -> two 8-runs, coverage 40 of 60 words
      (11L, "test", s"$shared ${(1 to 20).map(k => s"z$k").mkString(" ")} $shared"),
      (12L, "test", "no overlap at all in this clean document of plain words"))
      .toDF("doc_id", "split", "text")
    val out = Dedup.contaminationSpans(d, "text", "doc_id", "split",
      "train", "test", n = 13)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(10L, 11L))
    assert(out(10L) == ((8L, 20L, 20.0 / 24)))
    assert(out(11L) == ((16L, 20L, 40.0 / 60)))
  }

  test("langId picks the profile language on real sentences") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the cat sat on the mat and looked to the window in the morning"),
      (2L, "el perro corre en la calle y los gatos miran el sol que brilla"),
      (3L, "der hund läuft und die katze ist nicht da das ist ein test"),
      (4L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val preds = samples.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "es")
    assert(preds(3L) == "de")
    assert(preds(4L) == "und")
  }

  test("multimodal decode: real codecs read real bytes (see MultimodalSpec)") {
    import spark.implicits._
    val media = Seq(
      Multimodal.Fixtures.mediaFor(0L), // image
      Multimodal.Fixtures.mediaFor(1L), // audio
      Multimodal.Fixtures.mediaFor(2L)  // video
    ).toDS().toDF()
    val decoded = Multimodal.decodeBatched(spark, media).collect()
      .map(d => d.media_id -> d).toMap
    assert(decoded(0L).width == 1 && decoded(0L).height == 1 && decoded(0L).ok)
    assert(decoded(1L).sample_rate == 8000 && decoded(1L).n_frames == 101)
    assert(decoded(2L).n_frames == 3 && decoded(2L).width == 3)
  }

  test("packWindows concatenates doc streams in id order within a window") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L)), (3L, Seq(6L))
    ).toDF("id", "token_ids")
    // one shard, budget large enough for one window
    val out = Sampling.packWindows(d, "id", "token_ids",
      budget = 100, numShards = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 3L && r.getAs[Long]("n_tokens") == 6L)
    assert(r.getSeq[Long](r.fieldIndex("window_ids")) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // stable under repartitioning
    val again = Sampling.packWindows(d.repartition(5), "id", "token_ids",
      budget = 100, numShards = 1).collect().head
    assert(again.getSeq[Long](again.fieldIndex("window_ids")) ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("unigram logprob matches hand computation and ranks fluency") {
    import spark.implicits._
    // corpus of 8 tokens: "the"x4, "cat"x2, "sat"x1, "zzz"x1
    val d = Seq(
      (1L, "the cat sat"),      // mean ln of 4/8, 2/8, 1/8
      (2L, "the the the"),      // all head tokens — highest score
      (3L, "zzz cat")           // tail-heavy — lowest
    ).toDF("doc_id", "text")
    val out = TextOps.unigramLogProb(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def m(xs: Double*) = xs.map(x => math.log(x / 8.0)).sum / xs.size
    assert(math.abs(out(1L)._1 - m(4, 2, 1)) < 1e-6)
    assert(math.abs(out(2L)._1 - m(4, 4, 4)) < 1e-6)
    assert(out(1L)._2 == 3L && out(3L)._2 == 2L)
    assert(out(2L)._1 > out(1L)._1 && out(1L)._1 > out(3L)._1)
  }

  test("bigram logprob: hand computation, interpolation, single-token drop") {
    import spark.implicits._
    // corpus tokens incl. the single-token doc: a=4, b=2, x=1, N=7
    // bigrams: (a,b)x2 (b,a)x1 (a,a)x1
    val d = Seq((1L, "a b a b"), (2L, "a a"), (3L, "x")).toDF("doc_id", "text")
    val out = TextOps.bigramLogProb(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    def p(c2: Double, c1: Double, cu: Double) =
      0.75 * c2 / c1 + 0.25 * cu / 7.0
    val doc1 = (math.log(p(2, 4, 2)) + math.log(p(1, 2, 4)) +
      math.log(p(2, 4, 2))) / 3
    val doc2 = math.log(p(1, 4, 4))
    assert(math.abs(out(1L)._1 - doc1) < 1e-6)
    assert(math.abs(out(2L)._1 - doc2) < 1e-6)
    assert(out(1L)._2 == 3L && out(2L)._2 == 1L)
    assert(!out.contains(3L)) // single-token doc has no bigrams
  }

  test("chunkDocuments: stride starts, overlap, short tail, full coverage") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "solo")).toDF("doc_id", "text")
    val out = Sampling.chunkDocuments(df, "text", "doc_id", chunk = 4, stride = 3)
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val c1 = out(1L)
    // starts 0,3,6,9 -> chunk_ids 0..3; last chunk is the 1-token tail
    assert(c1.map(_._3).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(c1.map(_._4).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(c1.map(_._5).toSeq == Seq(4L, 4L, 4L, 1L))
    // every token index is covered by at least one chunk
    val covered = c1.flatMap(c => c._3 until (c._3 + c._5)).toSet
    assert(covered == (0L until 10L).toSet)
    // a doc shorter than one chunk yields exactly its own single chunk
    assert(out(2L).toSeq == Seq((2L, 0L, 0L, "solo", 1L)))
  }

  test("linearQualityModel: hand-computed score, decision, prose > junk") {
    import spark.implicits._
    val prose = "the cat and the dog of the house is that one in a tree"
    val junk = "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    val df = Seq((1L, prose), (2L, junk)).toDF("doc_id", "text")
    val out = TextOps.linearQualityModel(df, "text", "doc_id")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // hand-compute doc 1 with the same closed forms
    def bucket(tok: String): Int = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.substring(0, 4), 16) % 64).toInt
    }
    val w = prose.split(" ")
    val tok = w.map(t => TextOps.defaultTokenWeights(bucket(t))).foldLeft(0.0)(_ + _) / w.length
    val t = prose.toLowerCase
    val alpha = t.count(c => c >= 'a' && c <= 'z').toDouble / t.length
    val punct = t.count(c => !(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9') && c != ' ').toDouble / t.length
    val stops = Set("the", "and", "of", "to", "a", "in", "is", "that")
    val stop = w.count(stops).toDouble / w.length
    val z = tok + (-1.0 + 2.0 * alpha + 3.0 * stop + -4.0 * punct + 0.5 * (w.length / 100.0))
    val want = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L)._1 - want) < 1e-9 && out(1L)._2 == (z > 0))
    // stopword-rich prose clears the bar; pure punctuation does not
    assert(out(1L)._2 && !out(2L)._2 && out(1L)._1 > out(2L)._1)
  }

  test("temperatureSample flattens: rare group kept whole, hot group thinned") {
    import spark.implicits._
    // 900 docs in "hot", 16 in "rare": sqrt weights 30 vs 4
    val df = ((0 until 900).map(i => (i.toLong, "hot")) ++
      (1000 until 1016).map(i => (i.toLong, "rare"))).toDF("doc_id", "src")
    val out = Sampling.temperatureSample(df, "doc_id", "src", targetTotal = 200)
      .as[(Long, String, Double)].collect()
    val byG = out.groupBy(_._2)
    // rare rate = min(1, 200*4/34/16) = min(1, 1.47) -> clamps: all 16 kept
    assert(byG("rare").length == 16 && byG("rare").head._3 == 1.0)
    // hot rate = 200*30/34/900 ≈ 0.196 — thinned hard, NOT proportional
    // (proportional would keep ~196 of hot's 900 and ~3.5 of rare)
    val hotRate = 200.0 * math.sqrt(900.0) / (math.sqrt(900.0) + math.sqrt(16.0)) / 900.0
    assert(math.abs(byG("hot").head._3 -
      BigDecimal(hotRate).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val kept = byG("hot").length
    assert(kept > 120 && kept < 240) // md5-lattice keep near rate*900 ≈ 176
    // deterministic under repartition
    val out2 = Sampling.temperatureSample(df.repartition(7), "doc_id", "src", 200)
      .as[(Long, String, Double)].collect()
    assert(out2.map(r => (r._1, r._2)).toSet == out.map(r => (r._1, r._2)).toSet)
  }

  test("corpusReport: hand-computed dup/keep/token counts per group") {
    import spark.implicits._
    val prose = "the cat and the dog of the house is that one in a tree"
    val df = Seq(
      (1L, "a", prose),
      (2L, "a", prose),            // exact dup of 1 (keeper=1)
      (3L, "a", "@@@ ### !!!"),    // junk: keep=false
      (4L, "b", prose + " extra")).toDF("doc_id", "src", "text")
    val out = Reporting.corpusReport(df, "text", "doc_id", "src")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val a = out("a")
    assert(a._2 == 3 && a._3 == 14 + 14 + 3 && a._4 == 1) // one non-keeper dup
    assert(a._5 == 2) // the two prose docs pass, junk fails
    assert(out("b")._2 == 1 && out("b")._4 == 0 && out("b")._5 == 1)
  }

  test("decontaminateText removes exactly the covered windows") {
    import spark.implicits._
    val leak = (1 to 13).map(i => s"k$i").mkString(" ") // the shared 13-gram
    val df = Seq(
      (1L, "train", s"training prose around $leak and more words"),
      (2L, "test", s"a b c $leak x y z"),     // hit at pos 3 (0-based)
      (3L, "test", "totally clean eval doc"), // short + clean: untouched
      (4L, "test", (1 to 20).map(i => s"u$i").mkString(" ")) // long + clean
    ).toDF("doc_id", "split", "text")
    val out = Dedup.decontaminateText(df, "text", "doc_id", "split",
        "train", "test", n = 13)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    // doc 2: tokens 3..15 excised, the 3-word prefix and 3-word suffix stay
    assert(out(2L)._2 == "a b c x y z" && out(2L)._3 == 13)
    assert(out(3L)._2 == "totally clean eval doc" && out(3L)._3 == 0)
    assert(out(4L)._3 == 0 && out.size == 3) // train docs not emitted
  }

  test("heavyHitters: exact counts in the tracked regime, tie-broken rank") {
    import spark.implicits._
    // z appears 5x, y 3x, x 3x (tie with y), w 1x — across partitions
    val docs = Seq("z z y x", "z y x w", "z z y x").toDF("text").repartition(3)
    val out = TextOps.heavyHitters(docs, "text", topK = 3)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(("z", 5L, 1), ("x", 3L, 2), ("y", 3L, 3)))
  }

  test("pmiPairs: hand-computed scores, window bounds the pair distance") {
    import spark.implicits._
    // "x y x": window 2 → events (x,y)@1-2, (y,x)@2-3, (x,x)@1-3.
    // N = 3 (x:2, y:1), P = 3.
    // pmi(x,y) c=2: ln(2·9 / (3·2·1)) = ln 3; pmi(x,x) c=1: ln(9/12)
    val df = Seq((1L, "x y x")).toDF("doc_id", "text")
    val got = TextOps.pmiPairs(df, "text", "doc_id", window = 2, minPairCount = 1)
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(
      ("x", "y", 2L, math.rint(math.log(3.0) * 1e6) / 1e6),
      ("x", "x", 1L, math.rint(math.log(0.75) * 1e6) / 1e6)))
    // window 1 drops the distance-2 (x,x) event entirely
    val w1 = TextOps.pmiPairs(df, "text", "doc_id", window = 1, minPairCount = 1)
      .as[(String, String, Long, Double)].collect().toSet
    assert(w1.map(r => (r._1, r._2, r._3)) == Set(("x", "y", 2L)))
  }

  test("pmiPairs: minPairCount floors the collocation table") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextOps.pmiPairs(df, "text", "doc_id", window = 1, minPairCount = 2)
    assert(got.select("a", "b").as[(String, String)].collect().toSeq ==
      Seq(("a", "b")))
  }

  test("blockedEditDistancePairs: candidates only within blocks, exact dist") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "abc"))
      .toDF("id", "name")
    val got = Dedup.blockedEditDistancePairs(df, "id", "name",
        substring(col("name"), 1, 2), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // (1,3) is dist 3 but also cross-block — absent twice over
    assert(got == Set((1L, 2L, 1L), (1L, 4L, 0L), (2L, 4L, 1L)))
  }

  test("embeddingDimStats: exact integer stats on a hand case") {
    import spark.implicits._
    // dim 0: millis {1, 3} → mean 2, num = 2·10 − 16 = 4, std = 2/2 = 1
    // dim 1: millis {3, 3} → mean 3, std 0
    val df = Seq(Tuple1(Array(0.001f, 0.003f)), Tuple1(Array(0.003f, 0.003f)))
      .toDF("embedding")
    val got = Similarity.embeddingDimStats(df)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, 4L, 2.0, 1.0), (1L, 2L, 6L, 3.0, 0.0)))
  }

  test("whitenEmbeddings: hand z-scores; zero-variance dim scores null") {
    import spark.implicits._
    // dim 0 millis {1000, 3000}: z = ∓1; dim 1 constant: null z
    val df = Seq((1L, Array(1.0f, 5.0f)), (2L, Array(3.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.whitenEmbeddings(df)
      .as[(Long, Long, Long, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, 0L, 1000L, Some(-1.0)), (2L, 0L, 3000L, Some(1.0)),
      (1L, 1L, 5000L, None), (2L, 1L, 5000L, None)))
  }

  test("hardNegatives: same-label and self rows never surface; rank by cosine") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f), 1),   // same label as anchor — excluded
      (11L, Array(0.9f, 0.1f), 2),   // sim ≈ 0.9939
      (12L, Array(0.0f, 1.0f), 2),   // sim 0
      (13L, Array(1.0f, 0.01f), 3))  // sim ≈ 0.99995
      .toDF("vec_id", "embedding", "label")
    val anchors = Seq((0L, 1, Array(1.0, 0.0)))
      .toDF("a_id", "a_label", "qvec")
    val got = Similarity.hardNegatives(corpus, anchors, k = 2)
      .select("a_id", "vec_id", "rk").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 13L, 1L), (0L, 11L, 2L)))
  }

  test("embeddingCovariance: exact population covariance on a hand case") {
    import spark.implicits._
    // millis: rows (1000, 2000) and (3000, 6000) → population covs:
    // var(d0)=1e6, cov(d0,d1)=2e6, var(d1)=4e6; upper triangle only
    val df = Seq(Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 6.0f)))
      .toDF("embedding")
    val got = Similarity.embeddingCovariance(df)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)))
    assert(got((0L, 0L)) == ((0L, 0L, 2L, 10000000L, 1000000.0)))
    assert(got((0L, 1L)) == ((0L, 1L, 2L, 20000000L, 2000000.0)))
    assert(got((1L, 1L)) == ((1L, 1L, 2L, 40000000L, 4000000.0)))
  }

  test("embeddingCovariance diagonal matches embeddingDimStats variance") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.1f, 0.4f)), Tuple1(Array(0.3f, 0.4f)),
      Tuple1(Array(0.5f, 0.4f))).toDF("embedding")
    val diag = Similarity.embeddingCovariance(df)
      .where(col("i") === col("j"))
      .select("i", "cov_mc").as[(Long, Double)].collect().toMap
    val stats = Similarity.embeddingDimStats(df)
      .select("dim", "std_mv").as[(Long, Double)].collect().toMap
    stats.foreach { case (d, std) =>
      // std_mv is itself 6-d.p. rounded, so squaring amplifies its
      // rounding error — compare relatively, not at the cov's own 1e-6
      assert(math.abs(diag(d) - std * std) <= 1e-3 * (1 + math.abs(diag(d))),
        s"dim $d: cov ${diag(d)} vs std² ${std * std}") }
  }

  test("tableProfile: per-column counts, nulls, distincts, string extrema") {
    import spark.implicits._
    val df = Seq((1L, Some("b"), Some(2.5)), (2L, None, Some(1.5)),
      (3L, Some("a"), Some(2.5))).toDF("id", "s", "v")
    val got = Reporting.tableProfile(df)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 3L, 3L, 3L, Some("1"), Some("3"))))
    assert(got("s") == (("s", 3L, 2L, 2L, Some("a"), Some("b"))))
    assert(got("v") == (("v", 3L, 3L, 2L, Some("1.5"), Some("2.5"))))
  }

  test("blockedEditDistancePairs: maxBlock prunes degenerate blocks whole") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "abc"))
      .toDF("id", "name")
    val got = Dedup.blockedEditDistancePairs(df, "id", "name",
      substring(col("name"), 1, 2), maxDist = 1, maxBlock = 2)
    assert(got.count() == 0) // the 3-row "ab" block is dropped entirely
  }

  test("topPrincipalComponent: recovers a planted rank-1 direction exactly") {
    import spark.implicits._
    // all vectors lie on the (3, 4) axis with zero mean, so the
    // covariance is rank 1 and the iterate must land on (0.75, 1.0) in
    // L∞ scale — and every arithmetic step is integer, so EXACTLY
    val df = Seq(0.5, 0.25, -0.25, -0.5)
      .map(a => Tuple1(Array((0.6 * a).toFloat, (0.8 * a).toFloat)))
      .toDF("embedding")
    val got = Similarity.topPrincipalComponent(df, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 750000L, 1L -> 1000000L))
  }

  test("topPrincipalComponent: single vector has zero covariance → zero") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.3f, 0.7f))).toDF("embedding")
    val got = Similarity.topPrincipalComponent(df, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L))
  }

  test("stupidBackoffScore: every backoff level resolves hand-computably") {
    import spark.implicits._
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text") // N = 6
    // scored trigrams: (a,b,c) seen in train -> tri c3/c2(a,b) = 1/2;
    // (b,c,b): unseen, backoff bigram (c,b)? unseen; unigram b: c=2 ->
    //   uni 0.4*0.4*2/6; (c,b,x): x OOV -> 0.4^3/6;
    // (b,x,d) -> bigram (x,d)? unseen, unigram d: 1 -> uni; (x,d,a):
    //   trigram unseen, bigram (d,a)? train has "...b d" end, (d,a) no ->
    //   unigram a: 2 -> uni
    val scored = Seq((1L, "a b c b x d a")).toDF("doc_id", "text")
    val out = TextOps.stupidBackoffScore(train, scored, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    val uni = (c: Double) => 0.4 * 0.4 * c / 6.0
    val want = (math.log(1.0 / 2) + math.log(uni(2)) +
      math.log(0.4 * 0.4 * 0.4 / 6.0) + math.log(uni(1)) +
      math.log(uni(2))) / 5
    assert(out._1 == 1L)
    assert(math.abs(out._2 - want) < 1e-6, s"got ${out._2} want $want")
    assert((out._3, out._4, out._5, out._6) == ((1L, 0L, 3L, 1L)),
      "level counts: 1 tri, 0 bi, 3 uni, 1 oov")
  }

  test("bpeMerges: frequency argmax, greedy runs, early vocabulary exhaustion") {
    import spark.implicits._
    val df = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(df, "text", rounds = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    // round 1: (a,a) seen twice beats (a,b) once; round 2 merges the
    // rest; rounds 3-4 find no pairs and emit nothing (not null rows)
    assert(got == Seq((1L, "a", "a", 2L), (2L, "a", "b", 1L)))
  }

  test("bpeMerges: run of equal chars merges left-greedily across rounds") {
    import spark.implicits._
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(df, "text", rounds = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // ' a a a ' counts (a,a)=2 but merges to [aa, a] (greedy skip),
    // so round 2 sees exactly one (aa,a) pair
    assert(got == Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
  }

  test("bpeMerges: count ties break to the lexicographically smallest pair") {
    import spark.implicits._
    val df = Seq((1L, "cd ab")).toDF("doc_id", "text")
    val got = TextOps.bpeMerges(df, "text", rounds = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "b", 1L)))
  }

  test("bpeEncode: hand tokens, model-artifact ids, merge-order greed") {
    import spark.implicits._
    val train = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(train, "text", rounds = 4)
    // merges: r1 (a,a)→"aa" id 26, r2 (a,b)→"ab" id 27
    val got = TextOps.bpeEncode(Seq((9L, "aa ab ba")).toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(got == Set(
      (9L, 1L, 1L, "aa", 26L),
      (9L, 2L, 1L, "ab", 27L),
      // "ba" has no learned merge: stays chars b(1), a(0)
      (9L, 3L, 1L, "b", 1L), (9L, 3L, 2L, "a", 0L)))
  }

  test("bpeEncode round-trip law: tokens concatenate back to every word") {
    import spark.implicits._
    val df = Seq((1L, "banana bandana and an anna"),
      (2L, "a banana and an ananas")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(df, "text", rounds = 4)
    val enc = TextOps.bpeEncode(df, "text", "doc_id", merges)
    val decoded = enc
      .groupBy("doc_id", "wpos")
      // sort inside the agg — collect_list order is not shuffle-stable
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("tpos"), col("token")))),
        x => x("token"))).as("w"))
      .as[(Long, Long, String)].collect()
      .map { case (d, wp, w) => (d, wp) -> w }.toMap
    val expected = Seq((1L, "banana bandana and an anna"),
      (2L, "a banana and an ananas"))
      .flatMap { case (d, t) => t.split(" ").zipWithIndex
        .map { case (w, i) => (d, i + 1L) -> w } }.toMap
    assert(decoded == expected)
  }

  test("stupidBackoffScore: bigram backoff level fires when (w2,w3) seen") {
    import spark.implicits._
    val train = Seq((0L, "x a b")).toDF("doc_id", "text") // bigram (a,b)
    val scored = Seq((1L, "b a b")).toDF("doc_id", "text") // tri (b,a,b) unseen
    val r = TextOps.stupidBackoffScore(train, scored, "text", "doc_id")
      .collect().head
    // backoff: 0.4 * c2(a,b)/c1(a) = 0.4 * 1/1
    assert(r.getLong(3) == 1L && r.getLong(2) == 0L)
    assert(math.abs(r.getDouble(1) - math.log(0.4)) < 1e-6)
  }

  test("contextLengthReport: exact truncation accounting and packing bound") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = TextOps.contextLengthReport(docs, "text", "doc_id",
        lengths = Seq(4))
      .as[(Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().head
    // n_kept = 3 + min(5,4) = 7; one doc truncates; ⌈7/4⌉ = 2 seqs
    assert(got == ((4L, 2L, 8L, 7L, 1L, Some(875000L), 2L)), s"$got")
  }

  test("dedupThresholdSweep: exact dup pair counted at every tau, loser removed") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "x y z w v")).toDF("doc_id", "text")
    val got = Dedup.dedupThresholdSweep(docs, "text", "doc_id",
        thresholds = Seq(50, 100))
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // the identical pair (1,2) has Jaccard 1.0: qualifies at both taus;
    // keep-smallest removes doc 2 (5 of 15 corpus tokens → 333333 ppm)
    assert(got(50L) == ((50L, 1L, 1L, 5L, 3L, 15L, Some(333333L))))
    assert(got(100L) == ((100L, 1L, 1L, 5L, 3L, 15L, Some(333333L))))
  }

  test("blocklistFilter: token-exact hits, case-folded, hit-free docs kept") {
    import spark.implicits._
    val docs = Seq((1L, "a SLOW b slow"), (2L, "slowly but clean"),
      (3L, "x noise")).toDF("doc_id", "text")
    val got = TextOps.blocklistFilter(docs, "text", "doc_id",
        Seq("slow", "noise"))
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, false)))
    // "slowly" must NOT match — token equality, not substring
    assert(got(2L) == ((2L, 0L, 0L, true)))
    assert(got(3L) == ((3L, 1L, 1L, false)))
  }

  test("perplexityBuckets: per-language terciles, fluency-ordered, exact counts") {
    import spark.implicits._
    // reference LM learns "a b c" trigrams; scored docs range from
    // pure in-model text to pure OOV — six docs in lang en (terciles
    // 2/2/2), three in lang fr (1/1/1)
    val train = Seq((0L, "a b c a b c a b c", "en")).toDF("doc_id", "text", "lang")
    val scored = Seq(
      (1L, "a b c a b c", "en"), (3L, "a b c x y z", "en"),
      (5L, "x y z q r s", "en"), (7L, "a b c a b c", "en"),
      (9L, "u v w x y z", "en"), (11L, "a b c u v w", "en"),
      (13L, "a b c a b c", "fr"), (15L, "a b c x y z", "fr"),
      (17L, "x y z u v w", "fr")).toDF("doc_id", "text", "lang")
    val got = TextOps.perplexityBuckets(train, scored, "text", "doc_id", "lang")
      .as[(String, String, Long, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("en", "head"))._1 == 2L)
    assert(got(("en", "middle"))._1 == 2L)
    assert(got(("en", "tail"))._1 == 2L)
    assert(got(("fr", "head"))._1 == 1L)
    assert(got(("fr", "middle"))._1 == 1L)
    assert(got(("fr", "tail"))._1 == 1L)
    // fluency ordering: every head score ≥ every tail score, per lang
    assert(got(("en", "head"))._2 >= got(("en", "tail"))._3)
    assert(got(("fr", "head"))._2 >= got(("fr", "tail"))._3)
    // the two pure in-model en docs (1, 7) must be the en head bucket
    assert(got(("en", "head"))._2 == got(("en", "head"))._3,
      "head holds the two identical max-fluency docs")
  }

  test("textRank: hub of a star outranks leaves; leaves tie; mass sums to 1") {
    import spark.implicits._
    // one doc "a hub b hub c hub" → star: hub—a, hub—b, hub—c
    val docs = Seq((0L, "a hub b hub c hub")).toDF("doc_id", "text")
    val got = TextOps.textRank(docs, "text", "doc_id")
      .as[(String, Double)].collect().toMap
    assert(got.keySet == Set("hub", "a", "b", "c"))
    assert(got("hub") > got("a"))
    assert(got("a") == got("b") && got("b") == got("c"))
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // stochastic: mass conserved
  }

  test("textRank: repeated-token runs and empty tokens contribute no edges") {
    import spark.implicits._
    val docs = Seq((0L, "x  x x"), (1L, "p q")).toDF("doc_id", "text")
    val got = TextOps.textRank(docs, "text", "doc_id")
      .as[(String, Double)].collect().toMap
    // doc 0 is all self-adjacency (x-x) → no edges; only p—q ranks
    assert(got.keySet == Set("p", "q"))
    assert(got("p") == got("q"))
  }

  test("fellegiSunterScore: weight algebra, null field contributes 0") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L, Some(true), Some(true)),   // +10 + 5 = 15 → match
      (3L, 4L, Some(false), Some(true)),  // -20 + 5 = -15 → no
      (5L, 6L, Option.empty[Boolean], Some(true))) // 0 + 5 = 5 → match
      .toDF("a", "b", "f1", "f2")
    val got = Dedup.fellegiSunterScore(pairs,
      Seq(("f1", 10L, -20L), ("f2", 5L, -7L)))
      .select("a", "score_micro", "is_match")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((15L, true)))
    assert(got(3L) == ((-15L, false)))
    assert(got(5L) == ((5L, true)))
  }

  test("fellegiSunterEm: symmetric data is an exact fixed point") {
    import spark.implicits._
    // 2 all-agree + 2 all-disagree pairs, λ=½: hand E-step gives
    // w = 800000/200000, and the M-step reproduces (λ, m, u) exactly
    val pairs = Seq((true, true), (true, true), (false, false),
      (false, false)).map { case (x, _) => Tuple1(x) }.toDF("f")
    val got = Dedup.fellegiSunterEm(pairs, Seq("f"),
        lambda0Ppm = 500000L, m0Ppm = 800000L, u0Ppm = 200000L,
        iterations = 3)
      .as[(String, Long, Long, Long, Double, Double)].collect().head
    assert(got._2 == 500000L && got._3 == 800000L && got._4 == 200000L)
    // ln(800000/200000) = ln 4; ln(200000/800000) = −ln 4
    assert(got._5 == 1.386294 && got._6 == -1.386294)
  }

  test("fellegiSunterEm: agree-heavy data pulls λ and m up — hand EM") {
    import spark.implicits._
    // 3 agree + 1 disagree, one round: sw = 3·8e5+2e5 = 26e5,
    // λ₁ = 650000, m₁ = 24e11 div 26e5 = 923076,
    // u₁ = (3e6−24e5)·1e6 div (4e6−26e5) = 428571
    val pairs = Seq(true, true, true, false).map(Tuple1(_)).toDF("f")
    val got = Dedup.fellegiSunterEm(pairs, Seq("f"),
        lambda0Ppm = 500000L, m0Ppm = 800000L, u0Ppm = 200000L,
        iterations = 1)
      .as[(String, Long, Long, Long, Double, Double)].collect().head
    assert(got._2 == 650000L && got._3 == 923076L && got._4 == 428571L)
  }

  test("fellegiSunterEm: all-agree degenerates to the clamp, never 10⁶") {
    import spark.implicits._
    val pairs = Seq(true, true, true).map(Tuple1(_)).toDF("f")
    val got = Dedup.fellegiSunterEm(pairs, Seq("f"), iterations = 2)
      .as[(String, Long, Long, Long, Double, Double)].collect().head
    assert(got._3 == 999999L && got._4 == 999999L,
      "absorbing state must clamp to 999999")
    assert(got._5 == 0.0, "clamped m = u ⇒ zero agree weight")
  }

  test("zipfProfile: hand ranks, freq-x-rank diagnostic, ppm shares") {
    import spark.implicits._
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextOps.zipfProfile(docs, "text", topN = 2)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a", 3L, 3L, 500000L),
      (2L, "b", 2L, 4L, 333333L)))
  }

  test("featureHash: deterministic buckets, signed counts, zeros dropped") {
    import spark.implicits._
    val docs = Seq((0L, "w w w"), (1L, "w")).toDF("doc_id", "text")
    val got = TextOps.featureHash(docs, "text", "doc_id", dims = 8)
      .as[(Long, Long, Long)].collect()
    // same token always lands in the same bucket with the same sign:
    // doc0 weight must be exactly 3× doc1's weight, same bucket
    val d0 = got.filter(_._1 == 0L)
    val d1 = got.filter(_._1 == 1L)
    assert(d0.length == 1 && d1.length == 1)
    assert(d0.head._2 == d1.head._2)
    assert(d0.head._3 == 3 * d1.head._3)
    assert(math.abs(d1.head._3) == 1)
    assert(d0.head._2 >= 0 && d0.head._2 < 8)
    // exact sign cancellation drops the cell: find two tokens in the
    // same bucket with opposite signs is fixture-fragile — instead
    // verify the HAVING guard structurally with an empty-sum case:
    // a doc whose tokens all hash identically can never cancel, so
    // assert instead that no zero weight survives in a wider corpus
    val wide = Seq((2L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val w = TextOps.featureHash(wide, "text", "doc_id", dims = 4)
      .as[(Long, Long, Long)].collect()
    assert(w.forall(_._3 != 0))
  }

  test("ngramNovelty: unique vs shared trigrams, short docs null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),        // trigrams: "a b c", "b c d"
      (2L, "a b c x y"),      // shares "a b c"; owns "b c x", "c x y"
      (3L, "zz"))             // too short: no trigram
      .toDF("doc_id", "text")
    val got = TextOps.ngramNovelty(docs, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, Some(500000L))), s"${got(1L)}")
    assert(got(2L) == ((2L, 3L, 2L, Some(666666L))), s"${got(2L)}")
    assert(got(3L) == ((3L, 0L, 0L, None)), s"${got(3L)}")
  }

  test("ngramNovelty: repeated trigram within ONE doc stays unique to it") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    // distinct trigrams: "a b c","b c a","c a b" — df=1 each → novelty 1
    val got = TextOps.ngramNovelty(docs, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Option[Long])].head()
    assert(got == ((1L, 3L, 3L, Some(1000000L))), s"$got")
  }

  test("greedySourceCover: marginal-gain greedy, pinned ties, early stop") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "a b c"), (2L, "s2", "a b"),
      (3L, "s3", "c d")).toDF("doc_id", "source", "text")
    val got = TextOps.greedySourceCover(docs, "text", "source", rounds = 3)
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // round 1: s1 adds 3; round 2: s3 adds d; round 3: nothing new → stop
    assert(got == Seq((1L, "s1", 3L, 3L, 750000L),
      (2L, "s3", 1L, 4L, 1000000L)), s"$got")
  }
}
