package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Similarity.nnDescent]]: convergence to exact kNN on a hand corpus,
  * monotone improvement across rounds, determinism, and the
  * offset-collision dedup when n ≤ max(initOffset).
  */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  // 12 points on a line at x = id·10 milli: exact 2-NN of i is {i−1, i+1}
  // (ends: the two nearest on the open side)
  private def line(n: Int) =
    (0 until n).map(i => (i.toLong, Array(i * 0.010f, 0f)))
      .toDF("vec_id", "embedding")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).toSet }

  test("converges to the exact kNN graph on a line") {
    val got = asMap(Similarity.nnDescent(line(12), k = 2, rounds = 4,
      initOffsets = Seq(5, 6)))
    // exact 2-NN on the line: interior i → {i−1, i+1}; ends
    assert(got(0L) == Set(1L, 2L))
    assert(got(11L) == Set(10L, 9L))
    (1 to 10).foreach { i =>
      assert(got(i.toLong) == Set(i - 1L, i + 1L),
        s"node $i got ${got(i.toLong)}")
    }
  }

  test("each round only improves: total dsq non-increasing") {
    def total(rounds: Int): Long =
      Similarity.nnDescent(line(12), k = 2, rounds = rounds,
          initOffsets = Seq(5, 6))
        .agg(sum("l2sq_micro2")).as[Long].head()
    val ts = (0 to 3).map(total)
    ts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"round worsened the graph: $ts")
    }
    assert(ts.last < ts.head, "rounds never improved the init graph")
  }

  test("deterministic: two runs agree exactly") {
    val a = Similarity.nnDescent(line(9), k = 2, rounds = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4))
    val b = Similarity.nnDescent(line(9), k = 2, rounds = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._4))
    assert(a.toSeq == b.toSeq)
  }

  test("offset collisions mod small n dedupe; lists stay ≤ k, no self edges") {
    // n = 5 with default offsets {1,7,31,101} ≡ {1,2,1,1} mod 5
    val got = Similarity.nnDescent(line(5), k = 4, rounds = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._1 != r._2), "self edge leaked")
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).distinct.length == rows.length,
        s"duplicate neighbor for $s")
      assert(rows.length <= 4)
    }
  }

  test("exact integer micro² distances: hand-checked value") {
    // points 0 and 1 are 10 milli apart → (10000 micro)² = 1e8
    val d = Similarity.nnDescent(line(3), k = 1, rounds = 0,
        initOffsets = Seq(1))
      .where(col("src") === 0 && col("nbr") === 1)
      .select("l2sq_micro2").as[Long].head()
    assert(d == 100000000L)
  }
}
