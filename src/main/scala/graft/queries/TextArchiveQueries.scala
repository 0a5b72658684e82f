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

  /** Same SF→size law as the ELB/WARC corpora, extended one decade
    * further (round 15): the archive family's scaling rows now reach
    * the 20M-member corpus at /tmp/sf10.
    */
  private[graft] def rowsFor(dir: String): Int =
    if (dir.endsWith("sf0.1")) 200000
    else if (dir.endsWith("sf10")) 20000000
    else if (dir.endsWith("sf1")) 2000000
    else 20000
  private[graft] val verifyRows = 20000

  private def stagedPath(n: Int): String =
    SyntheticTextArchive.dirFor(n).resolve("_staged")
      .resolve("members.parquet").toString

  private val stagedOnce = scala.collection.concurrent.TrieMap.empty[Int, Boolean]

  private def stage(s: SparkSession, n: Int): Unit =
    stagedOnce.getOrElseUpdate(n, {
      // cross-JVM memo (round 15): the staging is deterministic in n, so
      // a finished _SUCCESS-marked write is reused instead of re-paying
      // a 20M-row parquet write per probe JVM at the sf10 decade
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(stagedPath(n), "_SUCCESS"))) {
        import s.implicits._
        s.range(n).map(i => SyntheticTextArchive.member(i))
          .select(col("path").as("member_path"), col("ext"),
            octet_length(col("text")).cast("long").as("size_bytes"),
            col("mtimeMs").as("mtime_ms"), col("text"))
          .coalesce(4).write.mode("overwrite").parquet(stagedPath(n))
      }
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

  // ————————————————————————————— archive → corpus E2E build (q396)
  // (the q367 crawl-chain discipline applied to the NON-crawl entry:
  //  member walk → txt-only (pushed to the reader) → quality gate
  //  (char + token floors) → exact dedup keep-first (the synthetic
  //  corpus plants every-9th verbatim repeats) → deterministic md5
  //  train/val split → per-split doc/token accounting, ONE plan.)
  val q396ArchiveCorpusBuild: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok") && col("ext") === "txt")
      .select(col("member_path"), col("text"))
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_tok", size(split(col("text"), " ")))
      .where(col("n_chars") >= 40 && col("n_tok") >= 15)
      .withColumn("fp", md5(col("text")))
      .groupBy("fp") // identical text ⇒ identical n_tok, min is exact
      .agg(min("member_path").as("member_path"), min("n_tok").as("n_tok"))
      .withColumn("split",
        when(graft.functions.HashExpressions.md5Prefix64(concat(lit("split|"), col("member_path")), 8) % 100 < 90, "train").otherwise("val"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
  private val q396Sql: String = s"""
    WITH txt AS (SELECT member_path, text
        FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
        WHERE ext = 'txt'),
    q AS (SELECT member_path, text,
        len(string_split(text, ' ')) AS n_tok
      FROM txt WHERE length(text) >= 40
        AND len(string_split(text, ' ')) >= 15),
    ded AS (SELECT min(member_path) AS member_path, min(n_tok) AS n_tok
      FROM q GROUP BY md5(text)),
    sp AS (SELECT member_path, n_tok,
        CASE WHEN CAST(('0x' || substr(md5('split|' || member_path), 1, 8))
             AS BIGINT) % 100 < 90 THEN 'train' ELSE 'val' END AS split
      FROM ded)
    SELECT split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM sp GROUP BY 1"""

  // ————————————————————————————— streaming archive ingest (q397)
  // (the same source through `readStream.format("textarchive")`:
  //  file-count offsets over the sorted archive listing, drained
  //  AvailableNow into a per-top-dir rollup — the q362 pattern; the
  //  batch oracle equals the drain because the aggregation is
  //  order-free.)
  private val streamCounter = new java.util.concurrent.atomic.AtomicLong()
  val q397ArchiveStream: Q = (s, dir) => {
    val n = rowsFor(dir)
    val glob = SyntheticTextArchive.dataset(n)
    stage(s, n)
    val agg = s.readStream.format("textarchive").load(glob)
      .where(col("ok"))
      .groupBy(regexp_extract(col("member_path"), "^([^/]+)/", 1).as("part"))
      .agg(count(lit(1)).as("n"), sum("size_bytes").as("bytes"),
        sum(length(col("text")).cast("long")).as("n_chars"))
    graft.streaming.StreamingSessions.drainAvailableNow(s, agg,
      s"txtar_stream_${streamCounter.incrementAndGet()}",
      noDataBatch = false) // Complete-mode aggregate: teardown-only batch
  }
  private val q397Sql: String = s"""
    SELECT regexp_extract(member_path, '^([^/]+)/', 1) AS part,
      count(*) AS n, CAST(sum(size_bytes) AS BIGINT) AS bytes,
      CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    GROUP BY 1"""

  // ————————————————————————————— zip central-directory fsck (q398)
  // (the audit that detects the lie the forward walk provably cannot —
  //  a corrupted local-header signature reads as clean EOF, but the
  //  central directory at EOF still names every member. Over the
  //  healthy corpus the law is counts-equal/zero-quarantine per zip;
  //  the oracle RE-DERIVES each zip's expected member count from the
  //  generator's member→file law (file = i div perFile over the
  //  sequence number in the member path), so the central-dir parse,
  //  the walk, and the corpus layout all sit under one hash.)
  val q398ZipFsck: Q = (s, dir) => {
    val n = rowsFor(dir)
    val glob = SyntheticTextArchive.dataset(n)
    stage(s, n)
    graft.sources.ArchiveAudit.zipFsck(s, glob)
      .where(col("ok"))
      .select(
        regexp_extract(col("archive_file"), "([^/]+)$", 1).as("archive"),
        col("central_members"), col("walk_members"),
        col("walk_quarantined"), col("consistent"))
  }
  private val q398Sql: String = s"""
    WITH m AS (SELECT CAST(regexp_extract(member_path, 'doc(\\d+)\\.', 1)
          AS BIGINT) AS i
        FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')),
    per AS (SELECT i // ${verifyRows / 16} AS f,
          CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1)
    SELECT 'archive-' || lpad(CAST(f AS VARCHAR), 3, '0') || '.zip' AS archive,
      n AS central_members, n AS walk_members,
      CAST(0 AS BIGINT) AS walk_quarantined, true AS consistent
    FROM per WHERE f % 2 = 1"""

  // ————————————————————————————— CD-split single-zip scan (q399)
  // (the round-15 splittability upgrade under the hash gate: ONE zip
  //  holding the whole corpus — the multi-GB dump shape that used to be
  //  a one-partition ceiling — planned from its central directory into
  //  member-range partitions (zipsplitbytes forces >1 at every SF; the
  //  query asserts it, the spec proves rows match the forward walk).
  //  Per-extension rollup with a text-fingerprint sum: any slip in the
  //  offset-seek read of any member flips the hash.)
  val q399ZipSplitScan: Q = (s, dir) => {
    val n = rowsFor(dir)
    val zp = SyntheticTextArchive.singleZip(n)
    stage(s, n)
    // scale-aware split target: members are ~200 B, so ~3n bytes / 64
    // ranges keeps the partition count near 64 at EVERY SF (the
    // maxPartitionBytes discipline — a fixed tiny split would plan ~8k
    // micro-tasks at the 20M-member decade and measure scheduler, not
    // scan)
    val splitBytes = math.max(256L * 1024, 3L * n)
    val df = s.read.format("textarchive")
      .option("zipsplitbytes", splitBytes.toString).load(zp)
    // the point of the query: a SINGLE zip must not be a single task
    require(df.rdd.getNumPartitions > 1,
      s"single-zip scan did not split: ${df.rdd.getNumPartitions} partition(s)")
    df.where(col("ok"))
      .groupBy("ext")
      .agg(count(lit(1)).as("n"), sum("size_bytes").as("bytes"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(graft.functions.HashExpressions.md5Prefix64(col("text"), 8))
          .as("fp_sum"))
  }
  private val q399Sql: String = s"""
    SELECT ext, count(*) AS n, CAST(sum(size_bytes) AS BIGINT) AS bytes,
      CAST(sum(length(text)) AS BIGINT) AS n_chars,
      CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
        AS fp_sum
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    GROUP BY 1"""

  val all: Map[String, Q] = Map(
    "q394_textarchive_scan" -> q394TextArchiveScan,
    "q395_textarchive_tokens" -> q395TextArchiveTokens,
    "q396_archive_corpus_build" -> q396ArchiveCorpusBuild,
    "q397_archive_stream" -> q397ArchiveStream,
    "q398_zip_fsck" -> q398ZipFsck,
    "q399_zip_split_scan" -> q399ZipSplitScan)

  val oracles: Map[String, String] = Map(
    "q394_textarchive_scan" -> q394Sql,
    "q395_textarchive_tokens" -> q395Sql,
    "q396_archive_corpus_build" -> q396Sql,
    "q397_archive_stream" -> q397Sql,
    "q398_zip_fsck" -> q398Sql,
    "q399_zip_split_scan" -> q399Sql)
}
