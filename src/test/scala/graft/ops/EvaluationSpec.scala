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
}
