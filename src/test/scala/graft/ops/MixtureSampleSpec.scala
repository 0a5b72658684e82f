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
}
