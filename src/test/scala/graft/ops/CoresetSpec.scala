package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Greedy k-center coreset: planted geometry must select the known
  * farthest-point sequence, ties must resolve by id, and the selection
  * must be bit-stable across runs (it feeds split/sample decisions).
  */
class CoresetSpec extends SparkSpec {

  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("planted 1-D geometry: farthest-point-first order, exact milli dist2") {
    // v: 0.0, 0.1, 5.0, 10.0 → seed id0; then id3 (dist² 10000²);
    // then id2 (min(5000², 5000²) = 25·10⁶ beats id1's 100²)
    val e = emb(0L -> Seq(0.0f), 1L -> Seq(0.1f), 2L -> Seq(5.0f),
      3L -> Seq(10.0f))
    val got = Similarity.kCenterCoreset(e, k = 3)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 0L, None), (1, 3L, Some(100000000L)),
      (2, 2L, Some(25000000L))))
  }

  test("all-identical points: zero distances resolve by lowest unchosen id") {
    val e = emb(0L -> Seq(1.0f, 2.0f), 1L -> Seq(1.0f, 2.0f),
      2L -> Seq(1.0f, 2.0f))
    val got = Similarity.kCenterCoreset(e, k = 2)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 0L, None), (1, 1L, Some(0L))))
  }

  test("selection is deterministic on real embeddings and covers k centers") {
    val e = Tables.embeddings(spark, sf()).filter(col("vec_id") < 200)
    val a = Similarity.kCenterCoreset(e, k = 4)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    val b = Similarity.kCenterCoreset(e, k = 4)
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(a == b, "coreset selection must be run-stable")
    assert(a.map(_._2).distinct.size == 4, "k distinct centers")
    // dist2-at-selection is non-increasing: each round's winner is the
    // farthest remaining point, and adding centers only shrinks minima
    val d = a.flatMap(_._3)
    assert(d == d.sorted.reverse, s"selection distances must not increase: $d")
  }
}
