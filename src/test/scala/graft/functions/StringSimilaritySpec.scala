package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = {
    val l = org.apache.spark.sql.catalyst.expressions.Literal.create(a)
    JaroWinkler(l, l)
      .compute(UTF8String.fromString(a), UTF8String.fromString(b))
  }

  test("pinned against DuckDB jaro_winkler_similarity probe values") {
    // every expected value below was read off DuckDB 1.0.0 directly
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111, // classic transposition
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("abcdef", "fedcba") -> 0.38888888888888884, // no boost below 0.7
      ("ab", "") -> 0.0,
      ("", "") -> 0.0, // DuckDB: empty-vs-empty is 0, not 1
      ("a", "a") -> 1.0, // window clamps at 0, not -1
      ("ab", "ba") -> 0.0, // window 0: adjacent transposition no match
      ("abcdxx", "abcdyy") -> 0.8666666666666666,
      ("aaaaaaaaaab", "aaaaaaaaaac") -> 0.9636363636363636,
      ("prefixab", "prefixba") -> 0.975, // prefix capped at 4
      ("aaxxxxxx", "aayyyyyy") -> 0.5, // boost NOT applied: jaro <= 0.7
      ("ax", "ay") -> 0.6666666666666666, // boundary: 2/3 <= 0.7, no boost
      ("abx", "aby") -> 0.8222222222222222,
      ("héllo", "hello") -> 0.8400000000000001, // BYTE-level: 6 vs 5 bytes
      ("CRATE", "TRACE") -> 0.7333333333333334,
      // odd out-of-order count (3-cycle '054'/'405'): DuckDB halves the
      // transposition count in INTEGER math — 1, not 1.5
      ("Customer#000000054", "Customer#000000405") -> 0.9888888888888889)
    for (((a, b), want) <- cases)
      assert(jw(a, b) == want, s"jw('$a','$b')")
  }

  test("symmetric, and codegen path agrees with interpreted compute") {
    val df = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"),
        ("héllo", "hello"), ("", "x"))
      .toDF("a", "b")
    val got = df.select(
        StringSimilarityExpressions.jaroWinkler(col("a"), col("b")).as("ab"),
        StringSimilarityExpressions.jaroWinkler(col("b"), col("a")).as("ba"))
      .collect()
    for (r <- got) assert(r.getDouble(0) == r.getDouble(1))
    assert(got.map(_.getDouble(0)).toSeq ==
      Seq(0.9611111111111111, 0.8133333333333332, 0.8400000000000001, 0.0))
  }

  test("null inputs propagate null") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    val r = df.select(StringSimilarityExpressions
      .jaroWinkler(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }
}
