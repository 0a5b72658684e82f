package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "red fox red fox red"), // tf(red)=3 in a 5-token doc
    (1L, "red fox"),
    (2L, "blue whale swims"),
    (3L, "red")).toDF("doc_id", "text")

  test("postings carry tf and dl") {
    val p = Retrieval.postings(docs, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect()
      .map { case (d, t, tf, dl) => (d, t) -> (tf, dl) }.toMap
    assert(p((0L, "red")) == (3L, 5L))
    assert(p((0L, "fox")) == (2L, 5L))
    assert(p((3L, "red")) == (1L, 1L))
  }

  test("bm25 ranks the term-dense short doc over the long repetitive one") {
    val r = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq(1 -> "red"), k = 10)
      .orderBy("rk").as[(Int, Long, Double, Long)].collect()
    // docs 0,1,3 contain "red"; 2 does not appear at all
    assert(r.map(_._2).toSet == Set(0L, 1L, 3L))
    // doc 3 ("red", dl=1) saturates tf normalization hardest — BM25's
    // length normalization must put it above doc 0 (tf=3 but dl=5)
    val rank = r.map(x => x._2 -> x._4).toMap
    assert(rank(3L) < rank(0L), s"got $r")
    // all scores positive, ranks contiguous from 1
    assert(r.forall(_._3 > 0) && r.map(_._4).sorted.sameElements(Seq(1L, 2L, 3L)))
  }

  test("duplicate query terms collapse; unknown terms score nothing") {
    val one = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq(1 -> "blue blue zzz"), k = 10)
      .as[(Int, Long, Double, Long)].collect()
    val single = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq(1 -> "blue"), k = 10)
      .as[(Int, Long, Double, Long)].collect()
    assert(one.toSet == single.toSet) // dup + unmatched terms are no-ops
    assert(one.map(_._2).toSet == Set(2L))
  }

  test("phraseSearch counts exact adjacent occurrences only") {
    val d = Seq(
      (0L, "red fox red fox"), // "red fox" twice
      (1L, "red blue fox"), // terms present but not adjacent
      (2L, "fox red")) // reversed
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(d, "text", "doc_id", Seq(1 -> "red fox"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set((1, 0L, 2L)))
  }

  test("phraseSearch handles repeated terms in the phrase") {
    val d = Seq((0L, "a a a"), (1L, "a b a")).toDF("doc_id", "text")
    // "a a" occurs at starts 0 and 1 in doc 0; never in doc 1
    val got = Retrieval.phraseSearch(d, "text", "doc_id", Seq(1 -> "a a"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set((1, 0L, 2L)))
  }

  test("trigramSearch: verify step kills trigram-coincidence candidates") {
    val d = Seq(
      (0L, "the rolling window agg"),  // contains "g wi"
      (1L, "big wolf with winter"),    // has trigrams of "g wi" ("g w"," wi")
                                       // non-contiguously — candidate, not match
      (2L, "nothing relevant")).toDF("doc_id", "text")
    val got = Retrieval.trigramSearch(d, "text", "doc_id", Seq(1 -> "g wi"))
      .as[(Int, Long)].collect().toSet
    assert(got == Set((1, 0L)))
  }

  test("trigramSearch: multi-pattern, case-insensitive, absent pattern empty") {
    val d = Seq((0L, "Alpha BETA gamma"), (1L, "beta only")).toDF("doc_id", "text")
    val got = Retrieval.trigramSearch(d, "text", "doc_id",
        Seq(1 -> "BETA", 2 -> "alpha b", 3 -> "zzz"))
      .as[(Int, Long)].collect().toSet
    assert(got == Set((1, 0L), (1, 1L), (2, 0L)))
  }

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rk")

  test("hybridRrf: hand-computed fusion, overlap beats either single list") {
    val lex = ranking((1L, 10L, 1L), (1L, 20L, 2L))
    val sem = ranking((1L, 20L, 1L), (1L, 30L, 2L))
    val got = Retrieval.hybridRrf(lex, sem)
      .select("doc_id", "rk_lex", "rk_sem", "rrf", "rrf_rk")
      .as[(Long, Option[Long], Option[Long], Double, Long)]
      .collect().sortBy(_._5).toSeq
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 20 appears in both lists (ranks 2, 1) → 1/62 + 1/61 tops
    // doc 10's single 1/61 and doc 30's single 1/62
    assert(got == Seq(
      (20L, Some(2L), Some(1L), r6(1.0 / 62 + 1.0 / 61), 1L),
      (10L, Some(1L), None, r6(1.0 / 61), 2L),
      (30L, None, Some(2L), r6(1.0 / 62), 3L)))
  }

  test("hybridRrf: queries fuse independently, k bounds each list") {
    val lex = ranking((1L, 10L, 1L), (2L, 10L, 1L), (2L, 30L, 2L))
    val sem = ranking((1L, 10L, 1L), (2L, 40L, 1L))
    val got = Retrieval.hybridRrf(lex, sem, k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    // q1: doc 10 doubly ranked wins; q2: doc 10 (1/61) beats 40 (1/61)
    // on the doc-id tiebreak
    assert(got == Set((1L, 10L), (2L, 10L)))
  }
}
