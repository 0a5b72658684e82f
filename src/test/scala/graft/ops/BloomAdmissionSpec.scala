package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 500L).map(i => (i, s"key_${i % 120}"))
    .toDF("id", "k")          // keys key_0 .. key_119 all present
  private lazy val batch = (1000L until 1200L).map(i => (i, s"key_${i % 200}"))
    .toDF("id", "k")          // keys key_0..99 (dups) and key_120..199 (new)

  test("bloomAdmission equals the exact anti-join") {
    val admitted = Dedup.bloomAdmission(batch, corpus, "k", 1000L)
      .select("id").as[Long].collect().toSet
    val exact = batch.join(corpus.select("k").distinct(), Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(admitted == exact)
    assert(admitted.nonEmpty && admitted.size < 200,
      "fixture must exercise both the admit and the reject path")
  }

  test("bloom probe rides a scalar subquery, not a collected literal") {
    val plan = Dedup.bloomAdmission(batch, corpus, "k", 1000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_might_contain") || plan.contains("might_contain"),
      s"expected a bloom probe in the plan:\n$plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"expected the bloom to arrive via scalar subquery:\n$plan")
  }

  test("an empty corpus admits the whole batch") {
    // zero corpus rows aggregate to a NULL bloom; might_contain(null, x)
    // is null, which without a default would drop rows from BOTH the
    // not-maybe and the maybe branch — the regression this pins
    val empty = corpus.where(lit(false))
    val admitted = Dedup.bloomAdmission(batch, empty, "k", 100L)
      .select("id").as[Long].collect().toSet
    assert(admitted == batch.select("id").as[Long].collect().toSet)
  }

  test("a batch already carrying _maybe is rejected at entry") {
    val poisoned = batch.withColumn("_maybe", lit(true))
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomAdmission(poisoned, corpus, "k", 100L)
    }
    assert(e.getMessage.contains("_maybe"))
    intercept[IllegalArgumentException] {
      Dedup.bloomAdmission(batch, corpus, "k`; drop table x", 100L)
    }
  }

  test("an undersized filter still yields exact results") {
    // expectedItems far below the corpus cardinality → fpp degrades,
    // more rows take the verify join — the result must not change
    val tiny = Dedup.bloomAdmission(batch, corpus, "k", 4L, fpp = 0.5)
      .select("id").as[Long].collect().toSet
    val exact = batch.join(corpus.select("k").distinct(), Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(tiny == exact)
  }
}
