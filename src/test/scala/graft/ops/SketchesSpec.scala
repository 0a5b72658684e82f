package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("groups under k distinct values report exact counts") {
    val df = (0 until 40).map(i => ("small", s"v$i")) ++
      Seq(("dup", "x"), ("dup", "x"), ("dup", "y"))
    val got = Sketches.kmvDistinct(df.toDF("g", "v"), "g", "v", k = 64)
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> (n, e) }.toMap
    assert(got("small") == (40L, 40.0))
    assert(got("dup") == (2L, 2.0)) // rows dedup to distinct values
  }

  test("estimator lands within 25% of a 2000-distinct truth") {
    val df = (0 until 2000).map(i => ("big", s"value_$i")).toDF("g", "v")
    val Seq((n, est)) = Sketches.kmvDistinct(df, "g", "v", k = 64)
      .select("n_kept", "est").as[(Long, Double)].collect().toSeq
    assert(n == 64)
    assert(est > 1500 && est < 2500, s"est=$est")
  }

  test("two-phase salted min-k ≡ single global window") {
    val df = (0 until 5000).map(i => ("hot", s"t$i")).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, "g", "v", k = 32, salts = 8)
      .as[(String, Long, Double)].head()
    val h = conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long")
    val naive = df.select(col("g"), h.as("h")).distinct()
      .withColumn("r", row_number().over(Window.partitionBy("g").orderBy("h")))
      .where(col("r") <= 32).agg(max("h")).as[Long].head()
    assert(got._3 == math.rint(31 * 4294967296.0 / naive * 100) / 100 ||
      (got._3 - 31 * 4294967296.0 / naive).abs < 0.01, s"got $got vs kth=$naive")
  }
}
