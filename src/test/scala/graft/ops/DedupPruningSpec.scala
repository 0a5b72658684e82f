package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Document-frequency pruning for pair-generating self-joins: a stopword/
  * boilerplate key shared by every document must not create one quadratic
  * join bucket (the 100 TB hot-key scenario), and the default (cap off)
  * must be byte-identical to the unpruned operator.
  */
class DedupPruningSpec extends SparkSpec {

  import spark.implicits._

  /** 60 docs sharing a 9-word boilerplate prefix + a unique 3-word tail —
    * every boilerplate shingle has document frequency 60.
    */
  private lazy val stopwordHeavy = (0 until 60).map { i =>
    (i.toLong, s"the quick brown fox jumps over the lazy dog unique$i token$i end$i")
  }.toDF("doc_id", "text")

  test("df pruning bounds every shingle bucket at the cap") {
    val rows = Dedup.shingleRows(stopwordHeavy, "text", "doc_id")
    val maxDfBefore = rows.groupBy("shingle").count()
      .agg(max("count")).as[Long].head()
    assert(maxDfBefore == 60, "boilerplate shingles should span all docs")
    val pruned = Dedup.pruneHotKeys(rows, "shingle", maxDocFreq = 10)
    val maxDfAfter = pruned.groupBy("shingle").count()
      .agg(max("count")).as[Long].head()
    assert(maxDfAfter <= 10,
      s"a shingle bucket survived above the cap: $maxDfAfter")
  }

  test("boilerplate-only similarity disappears under the cap; unique tails keep no pairs") {
    // cap off: the shared 9-word prefix alone makes every pair similar
    val unpruned = Dedup.ngramJaccardPairs(stopwordHeavy, "text", "doc_id",
      n = 3, threshold = 0.1)
    assert(unpruned.count() == 60L * 59 / 2,
      "without pruning, boilerplate links all pairs")
    // cap: prefix shingles (df=60) pruned; the remaining shingles all
    // contain a unique token, so no pair shares anything
    val pruned = Dedup.ngramJaccardPairs(stopwordHeavy, "text", "doc_id",
      n = 3, threshold = 0.1, maxDocFreq = 10)
    assert(pruned.count() == 0)
  }

  test("a cap above every doc frequency is identical to the unpruned operator") {
    val d = Tables.documents(spark, sf()).filter(col("doc_id") < 300)
    val base = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val highCap = Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.8,
      maxDocFreq = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty && base == highCap)
  }

  test("winnowing pair join prunes boilerplate fingerprints the same way") {
    // identical 60-char boilerplate + unique tails: the boilerplate's
    // winnowing fingerprints appear in all docs
    val docs = (0 until 30).map { i =>
      (i.toLong, ("shared boilerplate header that is long enough to dominate " +
        "the fingerprint set completely ") + s"tail$i")
    }.toDF("doc_id", "text")
    val fps = TextOps.winnowingFingerprintRows(docs, "text", "doc_id", k = 8, w = 4)
    val unpruned = TextOps.winnowingSharedPairs(fps, minShared = 5)
    assert(unpruned.count() == 30L * 29 / 2,
      "shared boilerplate should link every pair without pruning")
    val pruned = TextOps.winnowingSharedPairs(fps, minShared = 5, maxDocFreq = 5)
    assert(pruned.count() == 0)
  }

  test("prefix filtering is exact: equals the brute-force operator on real docs") {
    val d = Tables.documents(spark, sf()).filter(col("doc_id") < 300)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = asSet(Dedup.ngramJaccardPairs(d, "text", "doc_id", 3, 0.5))
    val pf = asSet(Dedup.prefixFilteredJaccardPairs(d, "text", "doc_id", 3, 0.5))
    assert(brute.nonEmpty && pf == brute)
  }

  test("prefix filtering keeps pairs whose shared shingles are the commonest — where the df cap loses them") {
    // 10 docs: 9 shared words + 3 unique words → the 7 shared shingles
    // have df = 10 (ordered LAST by rarity), the 3 unique-touching
    // shingles df = 1 (ordered first). Pairwise Jaccard = 7/13 ≥ 0.5,
    // carried ENTIRELY by the commonest shingles — the adversarial case
    // for rare-key blocking.
    val docs = (0 until 10).map { i =>
      (i.toLong, s"alpha bravo charlie delta echo foxtrot golf hotel india uniq${i}a uniq${i}b uniq${i}c")
    }.toDF("doc_id", "text")
    val pf = Dedup.prefixFilteredJaccardPairs(docs, "text", "doc_id", 3, 0.5)
    assert(pf.count() == 10L * 9 / 2, "prefix bound must find every pair")
    // the df-capped operator drops exactly these pairs (recall trade)
    val capped = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5,
      maxDocFreq = 5)
    assert(capped.count() == 0)
  }

  test("containmentPairs equals the brute containment join on real data") {
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 300)
    val sh = Dedup.shingleRows(docs, "text", "doc_id")
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val brute = sh.select(col("shingle"), col("id").as("a"))
      .join(sh.select(col("shingle"), col("id").as("b")), "shingle")
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("ic"))
      .join(sizes.select(col("id").as("a"), col("n_sh").as("na")), "a")
      .where(col("ic") * 100 >= lit(60L) * col("na"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    val pf = Dedup.containmentPairs(docs, "text", "doc_id", 3, 60)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty && pf == brute,
      "asymmetric prefix filter must lose nothing vs brute")
  }

  test("containment catches a snippet Jaccard misses, and is asymmetric") {
    // doc 1 = 5-word snippet wholly inside doc 0's 40 words: containment
    // (1 ⊂ 0) = 1.0 but Jaccard = 3/38 — invisible to any symmetric
    // threshold. The reverse direction (0 in 1) must NOT fire.
    val long = (0 until 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, long), (1L, "w10 w11 w12 w13 w14"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", 3, 60)
      .select("a", "b", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5)
    assert(jac.count() == 0)
  }

  test("continuationPairs: tail-equals-head stitches found, short docs out") {
    val docs = Seq(
      (0L, "p1 p2 a b c"),       // tail(3) = "a b c"
      (1L, "a b c q1 q2"),       // head(3) = "a b c" → (0,1)
      (2L, "x y z q3 q4"),       // unrelated
      (3L, "b c")).toDF("doc_id", "text") // < k tokens: dropped
    val got = Dedup.continuationPairs(docs, "text", "doc_id", k = 3)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("continuationPairs: a boilerplate opening line dies under the gram cap") {
    // one real stitch + 30 docs sharing the same 3-token head: the
    // hot head gram would pair with any matching tail; the cap kills
    // the hot bucket wholesale and keeps the unique stitch
    val docs = (Seq((0L, "p1 p2 a b c"), (1L, "a b c q1 q2")) ++
      (2L until 32L).map(i => (i, s"hot head line u$i v$i")))
      .toDF("doc_id", "text")
    val capped = Dedup.continuationPairs(docs, "text", "doc_id",
      k = 3, maxDocFreq = 5)
    assert(capped.as[(Long, Long)].collect().toSet == Set((0L, 1L)))
  }

  test("contaminationAttribution: argmax train doc, pinned ties, clean ledger row") {
    val eval = Seq((1L, "a b c d"), (3L, "zz ww"))
      .toDF("doc_id", "text")
    val train = Seq(
      (0L, "a b c x"),       // shares {a b, b c} with eval 1 → 2
      (2L, "c d y a b"))     // shares {c d, a b} with eval 1 → 2 (tie)
      .toDF("doc_id", "text")
    val got = Dedup.contaminationAttribution(eval, train,
        "text", "doc_id", n = 2)
      .as[(Long, Option[Long], Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // tie on n_shared=2 pins to the smaller train id; recall =
    // 2·10⁶ div 3 eval bigrams
    assert(got(1L) == ((1L, Some(0L), 2L, 3L, 666666L)))
    // zero-overlap eval doc stays in the ledger with a null source
    assert(got(3L) == ((3L, None, 0L, 1L, 0L)))
  }

  test("weightedJaccardPairs: template pages die, true near-dups survive") {
    // 10 template docs: a shared 10-word boiler prefix + a unique
    // word. Plain Jaccard(A,B) = 8/10 = 0.8 → 45 template pairs pass
    // τ=0.5. Reciprocal-df weights price the boiler shingles at
    // 10⁶/10 each: W∩ = 8·10⁵ vs union 2.8·10⁶ → 285714 ppm, DEAD at
    // τ=50. The genuine near-dup pair (E,F: one word differs) scores
    // exactly 500000 ppm (all its shared shingles have df=2) and is
    // the ONLY weighted survivor.
    val boiler = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = ((0 until 10).map(i => (i.toLong, s"$boiler u$i")) ++ Seq(
      (10L, "e1 e2 e3 e4 e5 e6 e7"),
      (11L, "e1 e2 e3 e4 e5 e6 f7"))).toDF("doc_id", "text")
    val plain = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5)
    assert(plain.count() == 46L) // 45 template pairs + (E,F)
    val got = Dedup.weightedJaccardPairs(docs, "text", "doc_id",
        n = 3, thresholdPct = 50)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 11L, 2000000L, 4000000L, 500000L)))
  }

  test("contaminationAttribution: maxDocFreq drops boilerplate grams from BOTH sides") {
    val eval = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val train = Seq((0L, "a b c x"), (2L, "c d y a b"))
      .toDF("doc_id", "text")
    val got = Dedup.contaminationAttribution(eval, train,
        "text", "doc_id", n = 2, maxDocFreq = 1)
      .as[(Long, Option[Long], Long, Long, Long)].collect().toSeq
    // "a b" sits in 2 train docs → pruned everywhere: eval keeps
    // {b c, c d} (denominator 2), train 0 shares {b c}, train 2
    // shares {c d} — tie of 1 pins to train 0, recall = 500000
    assert(got == Seq((1L, Some(0L), 1L, 2L, 500000L)))
  }

  test("nearDupSourceMatrix: cross-source cells, lexical triangle, distinct docs") {
    // one cross-source near-dup pair (X, Y) and one within-X pair;
    // cells are (s1 <= s2) triangles with distinct-doc counts
    val docs = Seq(
      (0L, "n1 n2 n3 n4 n5 n6 n7", "srcY"),
      (1L, "n1 n2 n3 n4 n5 n6 z7", "srcX"),
      (2L, "m1 m2 m3 m4 m5 m6 m7", "srcX"),
      (3L, "m1 m2 m3 m4 m5 m6 q7", "srcX"),
      (4L, "u1 u2 u3 u4 u5 u6 u7", "srcZ")).toDF("doc_id", "text", "source")
    val got = Dedup.nearDupSourceMatrix(docs, "text", "doc_id", "source",
        n = 3, threshold = 0.5)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("srcX", "srcY", 1L, 2L), ("srcX", "srcX", 1L, 2L)))
  }

  test("coverageSpectrum: exact per-n coverage, decaying with n") {
    val eval_ = Seq((1L, "a b c")).toDF("doc_id", "text")
    val train = Seq((0L, "a b x")).toDF("doc_id", "text")
    val got = Dedup.coverageSpectrum(eval_, train, "text", "doc_id",
        ns = Seq(1, 2))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // n=1: {a,b,c} vs train {a,b,x} → 2/3; n=2: {a b, b c} vs
    // {a b, b x} → 1/2
    assert(got(1L) == ((1L, 3L, 2L, Some(666666L))))
    assert(got(2L) == ((2L, 2L, 1L, Some(500000L))))
  }
}
