package graft.ops

import graft.SparkSpec
import graft.queries.Tables

/** Chi-squared distinctive terms: hand-checked 2×2 contingency values,
  * shared terms score zero, the count floor prunes, top-k bounds output.
  */
class Chi2TermsSpec extends SparkSpec {

  import spark.implicits._

  test("hand contingency: category-exclusive term scores N(ad)²/den, shared term 0") {
    // A tokens: x,x,x,y  B tokens: z,z,z,y  (N = 8)
    // (A,x): a=3 b=0 c=1 d=4 → 8·(12−0)²/(3·5·4·4) = 4.8
    // (A,y): a=1 b=1 c=3 d=3 → ad−bc = 0 → chi2 = 0
    val docs = Seq(("A", "x x x y"), ("B", "z z z y")).toDF("cat", "text")
    val got = TextOps.chi2Terms(docs, "text", "cat", minCount = 1, topK = 10)
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("A", "x")) == ((3L, 4.8, 1)))
    assert(got(("B", "z")) == ((3L, 4.8, 1)))
    assert(got(("A", "y")) == ((1L, 0.0, 2)))
    assert(!got.contains(("A", "z")), "unobserved (cat, term) cells are absent")
  }

  test("count floor prunes rare terms; top-k bounds each category") {
    val docs = Tables.documents(spark, sf())
    val res = TextOps.chi2Terms(docs, "text", "lang", minCount = 20, topK = 5)
      .as[(String, String, Long, Double, Int)].collect()
    val perCat = res.groupBy(_._1)
    assert(perCat.nonEmpty)
    perCat.foreach { case (cat, rows) =>
      assert(rows.length <= 5, s"$cat exceeded topK")
      assert(rows.map(_._5).sorted.toSeq == (1 to rows.length).toSeq)
      // ranks follow chi2 descending
      val byRank = rows.sortBy(_._5).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    }
  }
}
