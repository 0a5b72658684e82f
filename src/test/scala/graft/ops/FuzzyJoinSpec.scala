package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** FastSS deletion-neighborhood blocking: must equal the brute
  * edit-distance join (the d=1 completeness theorem), cover all four
  * edit kinds, exclude distance 2, and bound hot variant buckets.
  */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  test("all four edit kinds pair; distance 2 does not") {
    val rows = Seq(
      (0L, "spark"), (1L, "spark"),   // equal → dist 0
      (2L, "sparks"),                 // insertion → dist 1 vs 0/1
      (3L, "spar"),                   // deletion → dist 1 vs 0/1
      (4L, "snark"),                  // substitution → dist 1 vs 0/1
      (5L, "snorkel"))                // ≥2 from everything
      .toDF("id", "name")
    val got = TextOps.editDistance1Pairs(rows, "id", "name")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (0L, 1L, 0),
      (0L, 2L, 1), (1L, 2L, 1),
      (0L, 3L, 1), (1L, 3L, 1),
      (0L, 4L, 1), (1L, 4L, 1)))
  }

  test("blocking equals the brute levenshtein join on real customer names") {
    val c = Tables.customer(spark, sf()).filter(col("c_custkey") < 400)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val brute = c.as("x").join(c.as("y"), col("x.id") < col("y.id"))
      .where(levenshtein(col("x.s"), col("y.s")) <= 1)
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .as[(Long, Long)].collect().toSet
    val fast = TextOps.editDistance1Pairs(
        Tables.customer(spark, sf()).filter(col("c_custkey") < 400),
        "c_custkey", "c_name")
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty && fast == brute,
      "deletion-neighborhood blocking must lose nothing at d=1")
  }

  test("maxBucket drops hot variant keys' candidates, never crashes") {
    // 50 single-char strings: every one's deletion set contains "" —
    // one bucket of 50. A bucket cap under 50 removes those candidates.
    val rows = (0 until 50).map(i => (i.toLong, ('a' + i % 26).toChar.toString))
      .toDF("id", "name")
    val capped = TextOps.editDistance1Pairs(rows, "id", "name", maxBucket = 10)
    val full = TextOps.editDistance1Pairs(rows, "id", "name")
    assert(full.count() > capped.count())
  }
}
