package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Network-shaped relational ops. The reference pipeline enriches log
  * rows by client IP (`advanced_elb_logs_etl.py` geo join); production
  * log analytics also needs the other classic IP join — classify every
  * address against a CIDR rule table under LONGEST-prefix-match
  * semantics (blocklists, internal-range tagging, egress attribution).
  */
object Net {

  /** Longest-prefix-match join of 32-bit addresses against a CIDR rule
    * table `(prefix_int, prefix_len, rule)` — each address matches the
    * rule whose prefix covers it with the GREATEST length; ties cannot
    * exist (two same-length covering prefixes are the same prefix —
    * beyond them the deterministic rule tiebreak never fires).
    * Unmatched addresses pass through with a null rule (left semantics:
    * classification must not drop traffic).
    *
    * The LPM trick that keeps this an equi-join: only the prefix
    * LENGTHS present in the rule table matter, so each address expands
    * to one candidate key per distinct length — `ip >> (32−len)` — and
    * candidates meet the rules on the exact `(len, prefix >> (32−len))`
    * key. No range/theta join, no cross product: candidates per address
    * = |distinct lengths| (≤ 32, typically ≤ 8), the argmax per address
    * is a max_by over those few rows, and the whole thing is one
    * shuffled (or, for a real blocklist, broadcast) equi-join — the
    * plan survives any address volume.
    */
  def lpmJoin(addrs: DataFrame, rules: DataFrame, ipCol: String = "ip_int")
      : DataFrame = {
    val lens = rules.select(col("prefix_len").cast("int").as("plen")).distinct()
    val keyed = rules
      .withColumn("plen", col("prefix_len").cast("int"))
      .select(col("plen"), expr("shiftright(prefix_int, 32 - plen)").as("pkey"),
        col("rule"))
    val cand = addrs
      .join(broadcast(lens), lit(true))
      .withColumn("pkey", expr(s"shiftright(`$ipCol`, 32 - plen)"))
      .join(broadcast(keyed), Seq("plen", "pkey"))
      .groupBy(col(ipCol))
      .agg(max_by(struct(col("plen"), col("rule")), col("plen")).as("m"))
      .select(col(ipCol), col("m.plen").as("matched_len"),
        col("m.rule").as("rule"))
    addrs.join(cand, Seq(ipCol), "left")
  }

  /** Deterministic 32-bit lattice address for an id — the synthetic-IP
    * analogue of [[Spatial.latticeLat]], letting LPM queries run over
    * the driver tables without a real address column.
    */
  def latticeIp(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashExpressions.md5Prefix64(concat(lit("ip|"), id.cast("string")), 8)
}
