package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SyntheticTextArchive

/** Text-archive container-source queries (round 14): the
  * [[graft.sources.TextArchiveDataSource]] tar/zip member walk, header
  * parse, payload decode, extension pushdown and size/mtime surfaces
  * all sit under the rows+schema+hash gate. The oracle side reads the
  * SAME logical members from a parquet staging table generated
  * distributed from [[SyntheticTextArchive.member]] — NOT re-read from
  * the containers — so the encode→walk round-trip across BOTH formats
  * (ustar-in-gzip and STORED zip) is exactly what the hash check
  * proves (the WarcQueries discipline).
  */
object TextArchiveQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Same SF→size law as the ELB/WARC corpora. */
  private[graft] def rowsFor(dir: String): Int =
    if (dir.endsWith("sf0.1")) 200000
    else if (dir.endsWith("sf1")) 2000000
    else 20000
  private[graft] val verifyRows = 20000

  private def stagedPath(n: Int): String =
    SyntheticTextArchive.dirFor(n).resolve("_staged")
      .resolve("members.parquet").toString

  private val stagedOnce = scala.collection.concurrent.TrieMap.empty[Int, Boolean]

  private def stage(s: SparkSession, n: Int): Unit =
    stagedOnce.getOrElseUpdate(n, {
      import s.implicits._
      s.range(n).map(i => SyntheticTextArchive.member(i))
        .select(col("path").as("member_path"), col("ext"),
          octet_length(col("text")).cast("long").as("size_bytes"),
          col("mtimeMs").as("mtime_ms"), col("text"))
        .coalesce(4).write.mode("overwrite").parquet(stagedPath(n))
      true
    })

  private def scan(s: SparkSession, dir: String): DataFrame = {
    val n = rowsFor(dir)
    val glob = SyntheticTextArchive.dataset(n)
    stage(s, n)
    s.read.format("textarchive").load(glob)
  }

  // ————————————————————————————— full member scan (q394)
  // (the archive-ingest parity surface: every member of every
  //  container — tar-in-gzip AND stored zip — with path, extension,
  //  byte size, mtime and the full-text fingerprint. Maximal hash
  //  surface over both walks: any header-parse or decode slip anywhere
  //  flips a row.)
  val q394TextArchiveScan: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok"))
      .select(col("member_path"), col("ext"), col("size_bytes"),
        col("mtime_ms"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("fp"))
  private val q394Sql: String = s"""
    SELECT member_path, ext, size_bytes, mtime_ms,
      CAST(length(text) AS BIGINT) AS n_chars,
      md5(text) AS fp
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')"""

  // ————————————————————————————— ext-pushdown token stats (q395)
  // (the conversion-pipeline entry: `ext = 'txt'` pushes to the
  //  reader, so markdown members' payloads are skipped, never
  //  allocated; per-member whitespace and BPE-ish token counts feed
  //  the packing/budget ops downstream.)
  val q395TextArchiveTokens: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok") && col("ext") === "txt")
      .select(col("member_path"),
        graft.ops.TextOps.wsTokenCount(col("text")).as("n_ws_tok"),
        graft.ops.TextOps.bpeishTokenCount(col("text")).as("n_bpe_tok"))
  private val q395Sql: String = s"""
    SELECT member_path,
      CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_ws_tok,
      CAST(len(regexp_extract_all(lower(text),
        '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tok
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    WHERE ext = 'txt'"""

  val all: Map[String, Q] = Map(
    "q394_textarchive_scan" -> q394TextArchiveScan,
    "q395_textarchive_tokens" -> q395TextArchiveTokens)

  val oracles: Map[String, String] = Map(
    "q394_textarchive_scan" -> q394Sql,
    "q395_textarchive_tokens" -> q395Sql)
}
