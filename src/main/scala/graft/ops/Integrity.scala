package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed dataset digests — the integrity layer a 100 TB
  * corpus needs around every copy, migration, and re-partition: "is the
  * table I produced byte-for-byte the SET of rows I started from?",
  * answered without ever sorting or collecting the data.
  *
  * The digest is Merkle-shaped but order-independent at both levels:
  * each row folds to a 60-bit integer (md5 over a canonical,
  * null-sentineled string serialization of the audited columns), rows
  * land in one of `buckets` deterministic hash buckets, and a bucket
  * folds to `(row count, XOR of row hashes)`. XOR is exactly
  * associative/commutative and cannot overflow, so the bucket digest is
  * computable by a map-side partial aggregate in ANY row order and ANY
  * partitioning — two tables are set-equal iff their digest tables
  * match, and when they differ the mismatching BUCKETS localize the
  * damage to 1/`buckets` of the data (re-run there with more buckets to
  * bisect further — the Merkle drill-down, expressed as re-aggregation
  * instead of a tree walk).
  *
  * Scale shape: one narrow projection + one partial-aggregated groupBy
  * whose post-shuffle cardinality is `buckets` rows, independent of
  * input size. No sort, no window, no driver state. A duplicated row is
  * NOT invisible (XOR alone would cancel a double-XOR; the per-bucket
  * row count catches any multiplicity change, and the 60-bit hash makes
  * a compensating collision within a bucket a 2⁻⁶⁰ event).
  */
object Integrity {

  /** Canonical row hash: md5 over `cols` joined with '|', nulls as a
    * sentinel no audited value contains. Callers pre-cast non-portable
    * types (doubles, timestamps) to integers/strings themselves — the
    * digest is only as cross-engine as the serialization fed to it.
    */
  private def rowCanon(cols: Seq[Column]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"),
      lit("~NULL~"))): _*))

  /** Per-bucket digest table `(bucket, n_rows, digest)` + one grand-total
    * row (`bucket` null, from the rollup) so a single-row compare
    * suffices when nothing drifted. `buckets` fixes the localization
    * granularity, not memory: state is O(buckets) regardless of input.
    */
  def datasetDigest(df: DataFrame, cols: Seq[Column],
      buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val canon = rowCanon(cols)
    df.select(
        conv(substring(canon, 1, 15), 16, 10).cast("long").as("rh"),
        pmod(conv(substring(canon, 16, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
      .rollup("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(rh)").as("digest"))
  }
}
