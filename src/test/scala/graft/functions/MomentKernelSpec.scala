package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native outer-product-sum aggregate: exact packed layout on a
  * hand matrix, partition-order invariance (the merge law), and the
  * loud ragged-input failure.
  */
class MomentKernelSpec extends SparkSpec {
  import spark.implicits._

  private def packedOf(rows: Seq[Seq[Long]], parts: Int = 1): Seq[Long] = {
    val df = rows.map(Tuple1(_)).toDF("xs").repartition(parts)
    df.select(MomentExpressions.outerProductSum(col("xs")).as("m"))
      .head().getAs[scala.collection.Seq[Long]]("m").toSeq
  }

  test("packed layout: [d, n, row-major products] on a hand matrix") {
    // vectors (1,2) and (3,4): M = [[1+9, 2+12], [2+12, 4+16]]
    val got = packedOf(Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(got == Seq(2L, 2L, 10L, 14L, 14L, 20L))
  }

  test("merge law: partition count cannot change the result") {
    val rows = (1L to 40L).map(i => Seq(i, i * 2, 7L - i))
    assert(packedOf(rows, parts = 1) == packedOf(rows, parts = 8))
  }

  test("null vectors are skipped, not counted") {
    val df = Seq(Some(Seq(1L, 1L)), None, Some(Seq(2L, 0L)))
      .toDF("xs")
    val got = df.select(MomentExpressions.outerProductSum(col("xs")).as("m"))
      .head().getAs[scala.collection.Seq[Long]]("m").toSeq
    assert(got == Seq(2L, 2L, 5L, 1L, 1L, 1L))
  }

  test("ragged vectors fail by name") {
    val e = intercept[Exception] {
      packedOf(Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)))
    }
    assert(e.getMessage.contains("ragged")
      || Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
