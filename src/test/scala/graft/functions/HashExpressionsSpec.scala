package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential gate for the native md5 hex-slice kernel: on every probe
  * row, [[Md5Slice64]] must equal the relational
  * `conv(substring(md5(x), pos, len), 16, 10)::long` chain it replaces —
  * the 52 md5-lattice call sites (rendezvous shards, sampling draws,
  * HLL/KMV/CMS hashes) all rely on this exact equivalence, and every
  * downstream oracle hash does too.
  */
class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val probes = Seq(
    "", "a", "0", "42", "hello world", "ürlaub-ünïcode-日本語",
    "a|0", "a|39", "1234567890|7", "ek|99991",
    "x" * 500, "\t\n quoted \"str\" ")

  test("md5Hex64 equals the conv(substring(md5)) chain on all slices") {
    val df = probes.toDF("s")
    for ((pos, len) <- Seq((1, 4), (1, 8), (1, 15), (5, 4), (9, 8), (18, 15))) {
      val got = df.select(
          HashExpressions.md5Hex64(col("s"), pos, len).as("k"),
          conv(substring(md5(col("s")), pos, len), 16, 10)
            .cast("long").as("r"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"mismatch at pos=$pos len=$len: ${r.getLong(0)} vs ${r.getLong(1)}")
      }
    }
  }

  test("null in, null out — like the conv chain") {
    val df = Seq[Option[String]](Some("a"), None).toDF("s")
    val rows = df.select(HashExpressions.md5Prefix64(col("s"), 8).as("k"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("parameter bounds are enforced") {
    intercept[IllegalArgumentException] {
      Md5Slice64(org.apache.spark.sql.catalyst.expressions.Literal("x"), 1, 16)
    }
    intercept[IllegalArgumentException] {
      Md5Slice64(org.apache.spark.sql.catalyst.expressions.Literal("x"), 19, 15)
    }
  }
}
