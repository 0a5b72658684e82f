package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  // two fat sources (must down-sample) and one thin source (rate 1)
  private lazy val docs = (
    (0L until 200L).map(i => (i, "fat_a", 100L)) ++
    (200L until 400L).map(i => (i, "fat_b", 50L)) ++
    (400L until 410L).map(i => (i, "thin", 10L))
  ).toDF("id", "src", "tokens")

  private def kept(budget: Long) =
    Sampling.tokenBudgetSample(docs, "id", "src", "tokens", budget)
      .select("id").as[Long].collect().toSet

  test("a group under budget is kept whole; fat groups shrink") {
    val k = Sampling.tokenBudgetSample(docs, "id", "src", "tokens", 2000L)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(k("thin") == 10L)             // 100 tokens << 2000 budget
    assert(k("fat_a") < 200L && k("fat_a") > 0L)   // rate 2000/20000 = 0.1
    assert(k("fat_b") < 200L && k("fat_b") > 0L)   // rate 2000/10000 = 0.2
    // md5 buckets are uniform: expect ~20 and ~40, allow wide slack
    assert(k("fat_a") > 5L && k("fat_a") < 60L)
    assert(k("fat_b") > 15L && k("fat_b") < 80L)
  }

  test("budgets nest: growing the budget only adds documents") {
    val small = kept(1000L)
    val big = kept(5000L)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("selection is stable under repartitioning") {
    val a = kept(2000L)
    val b = Sampling.tokenBudgetSample(docs.repartition(7), "id", "src",
      "tokens", 2000L).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  private def toks(n: Int) = Seq.fill(n)("w").mkString(" ")

  test("uniMaxAllocation: funded prefix + waterfilled tail, exact budget") {
    // capacities (maxEpochs=2): A 200, B 400, C 1400; budget 1000 →
    // A funded (200·3 ≤ 1000), B funded at EQUALITY (400·2 ≤ 800),
    // C waterfilled with the residue 400
    val docs = Seq((toks(100), "a"), (toks(200), "b"), (toks(700), "c"))
      .toDF("text", "source")
    val got = Sampling.uniMaxAllocation(docs, "text", "source",
        budget = 1000L, maxEpochs = 2)
      .as[(String, Long, Long, Boolean, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 100L, 200L, true, 200L, 2000000L)))
    assert(got("b") == (("b", 200L, 400L, true, 400L, 2000000L)))
    assert(got("c") == (("c", 700L, 1400L, false, 400L, 571428L)))
    assert(got.values.map(_._5).sum == 1000L) // allocations sum to budget
  }

  test("uniMaxAllocation: remainder pennies go to the first unfunded ranks") {
    // two 10-token sources, budget 7: none funded, 7 div 2 = 3 each,
    // remainder 1 → rank-1 source d gets the extra token
    val docs = Seq((toks(10), "d"), (toks(10), "e"))
      .toDF("text", "source")
    val got = Sampling.uniMaxAllocation(docs, "text", "source",
        budget = 7L, maxEpochs = 1)
      .as[(String, Long, Long, Boolean, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(got == Map("d" -> 4L, "e" -> 3L))
  }

  test("packingCrossDocAudit: exact cross-boundary pair algebra") {
    // one shard, budget 6; token counts 3,2,4,2 in id order → cum
    // 3,5,9,11 → bins 0,0,0,1. bin0 L=9, Σl²=29 → cross (81−29)/2=26,
    // total 36, ppm 1e6·52 div 72 = 722222
    val docs = Seq((0L, toks(3)), (1L, toks(2)), (2L, toks(4)),
      (3L, toks(2))).toDF("doc_id", "text")
    val got = Sampling.packingCrossDocAudit(docs, "text", "doc_id",
        budget = 6L, numShards = 1)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._2 -> r).toMap
    assert(got(0L) == ((0L, 0L, 3L, 9L, 26L, 36L, Some(722222L))))
    assert(got(1L) == ((0L, 1L, 1L, 2L, 0L, 1L, Some(0L))))
  }

  test("packingCrossDocAudit: a single-token window has no pairs — null ppm") {
    val docs = Seq((0L, "hello")).toDF("doc_id", "text")
    val got = Sampling.packingCrossDocAudit(docs, "text", "doc_id",
        budget = 6L, numShards = 1)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(got.toSeq == Seq((0L, 0L, 1L, 1L, 0L, 0L, None)))
  }
}
