package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Graph, Privacy, TextOps}

/** Round-9 additions: graph-over-text ranking, hierarchy rollups, the
  * privacy-audit pair's missing member, data-quality screens, an ORC
  * staging round-trip, and vocabulary-free featurization — each with a
  * DuckDB oracle replaying the exact arithmetic.
  */
object ExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  // —————————————————————————————— TextRank keywords (q197)
  // (corpus-level keyword ranking: PageRank over the word-adjacency
  //  graph. The oracle rebuilds the graph AND unrolls all 5 damped
  //  iterations — q102's chain applied to a text-derived graph.)
  val q197TextRank: Q = (s, dir) =>
    TextOps.textRank(Tables.documents(s, dir), "text", "doc_id")
  private val q197Sql: String = {
    val iterChain = (0 until 5).map { k =>
      s"""dang$k AS (SELECT coalesce(sum(r), CAST(0 AS DOUBLE)) AS d FROM r$k
                WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = r$k.node)),
    r${k + 1} AS (
      SELECT n.node,
             CAST(0.15 AS DOUBLE) / nn.n + CAST(0.85 AS DOUBLE) *
               (coalesce(s.contrib, 0) + (SELECT d FROM dang$k) / nn.n) AS r
      FROM ids n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.tgt AS node, sum(r.r / deg.outdeg) AS contrib
        FROM edges e JOIN r$k r ON r.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.tgt) s ON s.node = n.node)"""
    }.mkString(",\n    ")
    s"""
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
               FROM documents),
    t AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM d),
    tok AS (SELECT doc_id, i, w[i] AS tk FROM t WHERE len(w[i]) > 0),
    adj AS (SELECT doc_id, tk,
              lead(tk) OVER (PARTITION BY doc_id ORDER BY i) AS nxt
            FROM tok),
    und AS (SELECT DISTINCT least(tk, nxt) AS a, greatest(tk, nxt) AS b
            FROM adj WHERE nxt IS NOT NULL AND nxt <> tk),
    words AS (SELECT a AS word FROM und UNION SELECT b FROM und),
    ids AS (SELECT word,
              CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS node
            FROM words),
    edges AS (
      SELECT CAST(('0x' || substr(md5(a), 1, 15)) AS BIGINT) AS src,
             CAST(('0x' || substr(md5(b), 1, 15)) AS BIGINT) AS tgt FROM und
      UNION ALL
      SELECT CAST(('0x' || substr(md5(b), 1, 15)) AS BIGINT),
             CAST(('0x' || substr(md5(a), 1, 15)) AS BIGINT) FROM und),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ids),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM ids CROSS JOIN nn),
    $iterChain
    SELECT w.word, round(r5.r, 9) AS rank
    FROM r5 JOIN ids w ON w.node = r5.node"""
  }

  // —————————————————————————————— subtree rollup (q198)
  // (forest closure by pointer doubling — O(log depth) self-joins —
  //  then per-ancestor aggregation of every descendant's event mass.
  //  The hierarchy is the binary-heap parent u → u div 2 over the ids
  //  PRESENT in events; chains stop at absent intermediates on both
  //  sides, because the closure is of the given edge set.)
  val q198SubtreeRollup: Q = (s, dir) => {
    val ev = Tables.events(s, dir).where(col("user_id").isNotNull)
    val users = ev.select(col("user_id").cast("long").as("id")).distinct()
    val parents = users.where(col("id") > 0)
      .select(col("id").as("child"), expr("id div 2").as("parent"))
    val facts = ev.groupBy(col("user_id").cast("long").as("id"))
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(round(col("value") * 1000).cast("long"), lit(0L)))
          .as("val_milli"))
    Graph.subtreeRollup(parents, "child", "parent", facts, "id",
      Seq("n_events", "val_milli"))
  }
  private val q198Sql: String = """
    WITH RECURSIVE u AS (SELECT DISTINCT user_id AS id FROM events
                         WHERE user_id IS NOT NULL),
    par AS (SELECT id AS c, id // 2 AS p FROM u WHERE id > 0),
    anc AS (SELECT c AS d, p AS a FROM par
            UNION
            SELECT anc.d, par.p FROM anc JOIN par ON par.c = anc.a),
    allp AS (SELECT d, a FROM anc UNION SELECT id, id FROM u),
    f AS (SELECT user_id AS id, count(*) AS n_events,
            CAST(sum(coalesce(CAST(round(value * 1000) AS BIGINT), 0))
              AS BIGINT) AS val_milli
          FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT allp.a AS node, count(*) AS n_subtree,
      CAST(sum(f.n_events) AS BIGINT) AS sum_n_events,
      CAST(sum(f.val_milli) AS BIGINT) AS sum_val_milli
    FROM allp JOIN f ON f.id = allp.d GROUP BY 1"""

  // —————————————————————————————— l-diversity audit (q199)
  // (the homogeneity-attack gate over QI classes of the customer table:
  //  market segment × coarse balance bracket, sensitive = nation.)
  val q199LDiversity: Q = (s, dir) =>
    Privacy.lDiversity(
      Tables.customer(s, dir)
        .select(col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bracket"),
          col("c_nationkey").cast("long").as("c_nationkey")),
      Seq("c_mktsegment", "bal_bracket"), "c_nationkey", l = 3)
  private val q199Sql: String = """
    WITH vc AS (SELECT c_mktsegment,
            CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bracket,
            CAST(c_nationkey AS BIGINT) AS sv, count(*) AS c
          FROM customer GROUP BY 1, 2, 3)
    SELECT c_mktsegment, bal_bracket, CAST(sum(c) AS BIGINT) AS n,
      count(*) AS n_distinct_sensitive,
      CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS max_share_ppm,
      count(*) >= 3 AS l_diverse
    FROM vc GROUP BY 1, 2"""

  // —————————————————————————————— Benford screen (q200)
  // (first-digit profile of lineitem prices in cents; expected shares
  //  are pinned ppm constants summing to exactly 1e6 on both sides.)
  val q200Benford: Q = (s, dir) =>
    Analytics.benfordProfile(Tables.lineitem(s, dir),
      round(col("l_extendedprice") * 100).cast("long"))
  private val q200Sql: String = """
    WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem),
    c AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
            count(*) AS n
          FROM v WHERE v > 0 GROUP BY 1),
    e AS (SELECT CAST(digit AS BIGINT) AS digit,
            CAST(ppm AS BIGINT) AS expected_ppm
          FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                       (5, 79181), (6, 66947), (7, 57992), (8, 51153),
                       (9, 45757)) AS t(digit, ppm)),
    tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
    SELECT e.digit, coalesce(c.n, 0) AS n, tt.n_total,
      (1000000 * coalesce(c.n, 0)) // tt.n_total AS obs_ppm,
      e.expected_ppm,
      (1000000 * coalesce(c.n, 0)) // tt.n_total - e.expected_ppm AS dev_ppm
    FROM e LEFT JOIN c USING (digit) CROSS JOIN tt"""

  // —————————————————————————————— ORC staging round-trip (q201)
  // (a second columnar format in the source/sink inventory: documents
  //  staged once per corpus as zlib ORC, read back through the ORC
  //  source, aggregated. The oracle computes the same aggregate from
  //  the parquet originals — matching hashes prove the ORC round-trip
  //  byte-lossless for every column the aggregate touches.)
  private val orcStaged = scala.collection.concurrent.TrieMap.empty[String, String]
  val q201OrcRoundtrip: Q = (s, dir) => {
    val staged = orcStaged.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft-orc")
        .resolve("documents.orc").toString
      Tables.documents(s, dir).write.mode("overwrite")
        .option("compression", "zlib").orc(p)
      p
    })
    s.read.orc(staged)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_len"))
  }
  private val q201Sql: String = """
    SELECT source, lang, count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_len
    FROM documents GROUP BY 1, 2"""

  // —————————————————————————————— feature hashing (q202)
  // (vocabulary-free signed bag-of-words projection; sparse output.)
  val q202FeatureHash: Q = (s, dir) =>
    TextOps.featureHash(Tables.documents(s, dir), "text", "doc_id", dims = 64)
  private val q202Sql: String = """
    WITH d AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
               FROM documents),
    t AS (SELECT doc_id, w FROM d WHERE len(w) > 0),
    m AS (SELECT doc_id,
            CAST(('0x' || substr(md5('b|' || w), 1, 15)) AS BIGINT) % 64
              AS bucket,
            CASE WHEN substr(md5('s|' || w), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
                 THEN 1 ELSE -1 END AS sgn
          FROM t)
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
    FROM m GROUP BY 1, 2 HAVING sum(sgn) <> 0"""

  val all: Map[String, Q] = Map(
    "q197_textrank" -> q197TextRank,
    "q198_subtree_rollup" -> q198SubtreeRollup,
    "q199_l_diversity" -> q199LDiversity,
    "q200_benford" -> q200Benford,
    "q201_orc_roundtrip" -> q201OrcRoundtrip,
    "q202_feature_hash" -> q202FeatureHash)

  val oracles: Map[String, String] = Map(
    "q197_textrank" -> q197Sql,
    "q198_subtree_rollup" -> q198Sql,
    "q199_l_diversity" -> q199Sql,
    "q200_benford" -> q200Sql,
    "q201_orc_roundtrip" -> q201Sql,
    "q202_feature_hash" -> q202Sql)
}
