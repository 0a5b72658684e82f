package graft.ops

import graft.SparkSpec

class NetSpec extends SparkSpec {
  import spark.implicits._

  private def ip(a: Long, b: Long, c: Long, d: Long): Long =
    (a << 24) | (b << 16) | (c << 8) | d

  private val rules = Seq(
    (ip(10, 0, 0, 0), 8, "net_10"),
    (ip(10, 1, 0, 0), 16, "net_10_1"),
    (ip(192, 168, 0, 0), 16, "rfc1918_16"))
    .toDF("prefix_int", "prefix_len", "rule")

  test("lpmJoin: longest covering prefix wins; unmatched pass with null") {
    val addrs = Seq(
      (1L, ip(10, 1, 2, 3)),    // covered by /8 AND /16 → /16 wins
      (2L, ip(10, 2, 0, 1)),    // only the /8
      (3L, ip(192, 168, 9, 9)), // the other /16
      (4L, ip(11, 0, 0, 1)))    // no rule — left semantics keep the row
      .toDF("event_id", "ip_int")
    val got = Net.lpmJoin(addrs, rules)
      .select("event_id", "matched_len", "rule")
      .as[(Long, Option[Int], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(16), Some("net_10_1"))))
    assert(got(2L) == ((Some(8), Some("net_10"))))
    assert(got(3L) == ((Some(16), Some("rfc1918_16"))))
    assert(got(4L) == ((None, None)))
  }

  test("lpmJoin: duplicate addresses classify identically, rows preserved") {
    val addrs = Seq((1L, ip(10, 1, 0, 0)), (2L, ip(10, 1, 0, 0)))
      .toDF("event_id", "ip_int")
    val got = Net.lpmJoin(addrs, rules)
      .select("event_id", "rule").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "net_10_1"), (2L, "net_10_1")))
  }
}
