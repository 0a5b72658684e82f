package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 50L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (3L, 1L, "other"))
      .toDF("k", "rt", "payload")
    val out = Relational.asOfJoinBackward(left, right, "k", "k", "t", "rt",
        Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("e0").isEmpty)          // before any right row
    assert(out("e1").contains("r@10")) // equality is inclusive
    assert(out("e2").contains("r@15")) // latest at-or-before 20
    assert(out("x").isEmpty)           // key with no right rows
  }
}
