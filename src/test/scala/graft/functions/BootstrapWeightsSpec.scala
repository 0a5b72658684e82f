package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Analytics.PoissonCdf32

/** Differential gate for the native bootstrap-weight kernel: the
  * Catalyst expression must reproduce, draw for draw, the documented
  * built-in-function law `#{k : conv(substring(md5("boot|"+r/4+"|"+id),
  * 8*(r%4)+1, 8), 16, 10) ≥ t_k}` that the DuckDB oracle of q163 also
  * implements — so equivalence here is equivalence with the oracle.
  */
class BootstrapWeightsSpec extends SparkSpec {

  private def lawDraw(id: Column, r: Int): Column = {
    val h = conv(substring(md5(concat(lit(s"boot|${r / 4}|"),
      id.cast("string"))), 8 * (r % 4) + 1, 8), 16, 10).cast("long")
    PoissonCdf32.map(t => when(h >= t, 1L).otherwise(0L)).reduce(_ + _)
  }

  test("native weights equal the md5/conv/substring law on 200 ids") {
    val s = spark
    import s.implicits._
    val reps = 12
    val ids = ((0L until 100L) ++ Seq(Long.MaxValue, Long.MinValue, -1L, 7L)
      ++ (1000000L until 1000096L)).toDF("id")
    val rows = ids.select(
      BootstrapExpressions.bootstrapWeights(col("id").cast("string"), reps)
        .as("native"),
      array((0 until reps).map(r => lawDraw(col("id"), r)): _*).as("law"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { row =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    }
  }

  test("weights are Poisson(1)-shaped: mean near 1, capped at 8") {
    val s = spark
    import s.implicits._
    val reps = 64
    val stats = (0L until 2000L).toDF("id")
      .select(explode(BootstrapExpressions
        .bootstrapWeights(col("id").cast("string"), reps)).as("w"))
      .agg(avg("w").as("m"), max("w").as("mx"), min("w").as("mn"))
      .head()
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.02, s"mean ${stats.getDouble(0)}")
    assert(stats.getLong(1) <= 8L && stats.getLong(2) >= 0L)
  }

  test("null id yields null array; reps validated") {
    val s = spark
    import s.implicits._
    val row = Seq(Option.empty[String]).toDF("id")
      .select(BootstrapExpressions.bootstrapWeights(col("id"), 8).as("w"))
      .head()
    assert(row.isNullAt(0))
    intercept[IllegalArgumentException] {
      BootstrapWeights(org.apache.spark.sql.catalyst.expressions.Literal("x"), 6)
    }
  }
}
