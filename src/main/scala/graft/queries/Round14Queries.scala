package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 additions: clustering and corpus-curation operators that
  * were still missing from the LLM-pipeline family — integer-pinned
  * k-means (the oracle-checkable Lloyd variant) and CCNet-style
  * perplexity bucketing. Each oracle re-derives the full algorithm in
  * DuckDB SQL (k-means unrolls its Lloyd rounds as CTEs, the q186/q197
  * discipline).
  */
object Round14Queries {
  type Q = (SparkSession, String) => DataFrame

  // —————————————————————————————— integer-pinned k-means (q369)
  // (Lloyd over the embeddings table with k = 8 seeds (smallest
  //  vec_ids), 3 assign→update rounds, micro-quantized coordinates,
  //  truncating integer centroid means, exact BIGINT squared-L2 —
  //  every engine replays the identical trajectory, so the cluster
  //  SIZES sit under the hash. The oracle unrolls the three rounds;
  //  empty clusters keep their previous centroid on both sides.)
  val q369Kmeans: Q = (s, dir) =>
    graft.ops.Similarity.kmeansInteger(Tables.embeddings(s, dir),
      "vec_id", "embedding", k = 8, iters = 3)
  private val q369Sql: String = {
    // one Lloyd round: distances vs c{r-1}, argmin assignment, new
    // truncating-mean centroids with empty-cluster carry-over
    def round(r: Int): String = s"""
    d$r AS (SELECT p.id, c.cid, sum((p.xm - c.cm) * (p.xm - c.cm)) AS d
           FROM pts p JOIN c${r - 1} c USING (dim) GROUP BY 1, 2),
    a$r AS MATERIALIZED (SELECT id, cid, d FROM
          (SELECT id, cid, d, row_number() OVER
             (PARTITION BY id ORDER BY d, cid) AS rn FROM d$r)
          WHERE rn = 1),
    m$r AS (SELECT a.cid, p.dim, CAST(sum(p.xm) // count(*) AS BIGINT) AS cm
           FROM a$r a JOIN pts p USING (id) GROUP BY 1, 2),
    c$r AS MATERIALIZED (SELECT c.cid, c.dim, coalesce(m.cm, c.cm) AS cm
          FROM c${r - 1} c LEFT JOIN m$r m
            ON m.cid = c.cid AND m.dim = c.dim)"""
    s"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id AS id, i - 1 AS dim,
        CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) AS xm
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id IS NOT NULL
              AND embedding IS NOT NULL),
        unnest(range(1, len(e) + 1)) u(i)),
    seeds AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS cid
              FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT 8)),
    c0 AS MATERIALIZED (SELECT s.cid, p.dim, p.xm AS cm
          FROM seeds s JOIN pts p USING (id)),${round(1)},${round(2)},
    d3 AS (SELECT p.id, c.cid, sum((p.xm - c.cm) * (p.xm - c.cm)) AS d
           FROM pts p JOIN c2 c USING (dim) GROUP BY 1, 2),
    a3 AS (SELECT id, cid, d FROM
          (SELECT id, cid, d, row_number() OVER
             (PARTITION BY id ORDER BY d, cid) AS rn FROM d3)
          WHERE rn = 1)
    SELECT s.cid, count(a.id) AS n_members,
      CASE WHEN count(a.id) > 0
           THEN CAST(sum(a.d) // count(a.id) AS BIGINT) END AS mean_dist
    FROM seeds s LEFT JOIN a3 a USING (cid) GROUP BY 1"""
  }

  // —————————————————————————————— CCNet perplexity buckets (q371)
  // (the curation step between scoring and mixing: train the backoff
  //  LM on even doc_ids (q187's held-out split), score the odd ones,
  //  tercile each language into head/middle/tail by fluency with
  //  id-pinned ties. Bucket membership is exactly reproducible
  //  because score6 itself is hash-gated by q187; min/max per bucket
  //  are order statistics, no float accumulation.)
  val q371PerplexityBuckets: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.TextOps.perplexityBuckets(
      docs.where(pmod(col("doc_id"), lit(2)) === 0),
      docs.where(pmod(col("doc_id"), lit(2)) === 1),
      "text", "doc_id", "lang")
  }
  private val q371Sql: String = """
    WITH tr AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                FROM documents WHERE doc_id % 2 = 0),
    sc AS (SELECT doc_id, string_split(lower(text), ' ') AS w
           FROM documents WHERE doc_id % 2 = 1),
    tt AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM tr),
    tg AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3,
             i, len(w) AS lw FROM tt),
    c1 AS (SELECT w1 AS w, count(*) AS c1 FROM tg GROUP BY 1),
    c2 AS (SELECT w1, w2, count(*) AS c2 FROM tg
           WHERE i + 1 <= lw GROUP BY 1, 2),
    c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tg
           WHERE i + 2 <= lw GROUP BY 1, 2, 3),
    n AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM c1),
    si AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM sc),
    st AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
           FROM si),
    j AS (SELECT s.doc_id, c3.c3, c2p.c2 AS c2p, c2b.c2 AS c2b,
            u2.c1 AS c1w2, u3.c1 AS c1w3
          FROM st s
          LEFT JOIN c3 ON c3.w1 = s.w1 AND c3.w2 = s.w2 AND c3.w3 = s.w3
          LEFT JOIN c2 c2p ON c2p.w1 = s.w1 AND c2p.w2 = s.w2
          LEFT JOIN c2 c2b ON c2b.w1 = s.w2 AND c2b.w2 = s.w3
          LEFT JOIN c1 u2 ON u2.w = s.w2
          LEFT JOIN c1 u3 ON u3.w = s.w3),
    lv AS (SELECT doc_id,
            CASE WHEN c3 IS NULL AND c2b IS NULL AND c1w3 IS NULL
                 THEN 1 END AS is_oov,
            CASE WHEN c3 IS NOT NULL THEN c3 / c2p
                 WHEN c2b IS NOT NULL THEN
                   CAST(0.4 AS DOUBLE) * c2b / c1w2
                 WHEN c1w3 IS NOT NULL THEN
                   CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE) * c1w3
                     / (SELECT n FROM n)
                 ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                     * CAST(0.4 AS DOUBLE) / (SELECT n FROM n) END AS score
           FROM j),
    ds AS (SELECT doc_id AS id, round(avg(ln(score)), 6) AS score6,
             count(is_oov) AS n_oov
           FROM lv GROUP BY 1),
    bk AS (SELECT d.lang AS grp, ds.score6, ds.n_oov,
             ntile(3) OVER (PARTITION BY d.lang
               ORDER BY ds.score6 DESC, ds.id) AS t
           FROM ds JOIN documents d ON d.doc_id = ds.id)
    SELECT grp,
      CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
        AS bucket,
      count(*) AS n_docs,
      min(score6) AS min_score6, max(score6) AS max_score6,
      CAST(sum(n_oov) AS BIGINT) AS n_oov
    FROM bk GROUP BY 1, 2"""

  // —————————————————————————————— C4 blocklist filter (q372)
  // (the term-list drop as a broadcast TOKEN JOIN, not an alternation
  //  regex — the only shape that survives a 10k-term list at scale.
  //  kept ⟺ zero hits, C4's rule; exact per-doc hit accounting.)
  val q372Blocklist: Q = (s, dir) =>
    graft.ops.TextOps.blocklistFilter(Tables.documents(s, dir),
      "text", "doc_id", Seq("slow", "noise", "vector"))
  private val q372Sql: String = """
    WITH base AS (SELECT doc_id AS id, lower(text) AS t FROM documents
                  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    tok AS (SELECT id, unnest(string_split(t, ' ')) AS w FROM base),
    h AS (SELECT id, count(*) AS n_hits, count(DISTINCT w) AS n_terms
          FROM tok WHERE w IN ('slow', 'noise', 'vector') GROUP BY 1)
    SELECT b.id, coalesce(h.n_hits, 0) AS n_hits,
      coalesce(h.n_terms, 0) AS n_terms,
      h.n_hits IS NULL AS kept
    FROM base b LEFT JOIN h USING (id)"""

  // —————————————————————————————— per-doc char entropy (q373)
  // (the gibberish screen word-level filters can't see: base64 blobs
  //  and key-mashes are ONE word. Exact per-char counts; the single
  //  float combination rounds 6 d.p. over a bounded alphabet.)
  val q373CharEntropy: Q = (s, dir) =>
    graft.ops.Cleaning.charEntropy(Tables.documents(s, dir),
      "text", "doc_id")
  private val q373Sql: String = """
    WITH base AS (SELECT doc_id AS id, text FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL
            AND length(text) > 0),
    ch AS (SELECT id, substr(text, CAST(i AS INT), 1) AS c
           FROM base, unnest(range(1, length(text) + 1)) u(i)),
    k AS (SELECT id, c, count(*) AS k FROM ch GROUP BY 1, 2)
    SELECT id, CAST(sum(k) AS BIGINT) AS n_chars,
      count(*) AS n_distinct,
      round(ln(sum(k)) - sum(k * ln(k)) / sum(k), 6) AS entropy6
    FROM k GROUP BY 1"""

  // —————————————————————————————— domain-level curation (q374)
  // (the RefinedWeb step above per-doc filters: drop WHOLE domains
  //  whose profile says mirror farm (dup_ppm) or boilerplate mill
  //  (mean token floor). Exact integer accounting, truncating ppm.)
  val q374DomainQuality: Q = (s, dir) =>
    graft.ops.Cleaning.domainQuality(Tables.documents(s, dir),
      "text", "doc_id", "source", minMeanTokens = 55,
      maxDupPpm = 300000)
  private val q374Sql: String = """
    WITH base AS (SELECT source AS domain, md5(text) AS fp,
          len(string_split(lower(text), ' ')) AS n_tok FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL
            AND source IS NOT NULL),
    g AS (SELECT domain, count(*) AS n_docs,
            count(DISTINCT fp) AS n_distinct,
            CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM base GROUP BY 1)
    SELECT domain, n_docs, n_distinct, n_tokens,
      CAST((1000000 * (n_docs - n_distinct)) // n_docs AS BIGINT)
        AS dup_ppm,
      CAST(n_tokens // n_docs AS BIGINT) AS mean_tok,
      (n_tokens // n_docs >= 55
        AND (1000000 * (n_docs - n_distinct)) // n_docs <= 300000)
        AS kept
    FROM g"""

  // —————————————————————————————— LSH parameter sweep (q375)
  // (the banding tuner: one shared 12-hash signature table, banded at
  //  every divisor r via the broadcast r-lattice; exact precision /
  //  recall vs the all-pairs Jaccard≥50% truth on the q20-capped
  //  corpus. The classic trade must come out of the data itself:
  //  r=1 → max recall, r=12 → max precision.)
  val q375LshSweep: Q = (s, dir) =>
    graft.ops.Dedup.lshParameterSweep(
      Tables.documents(s, dir).where(col("doc_id") < 1000),
      "text", "doc_id", shingleN = 3, numHashes = 12,
      rOptions = Seq(1, 2, 3, 4, 6, 12), thresholdPct = 50)
  private val q375Sql: String = """
    WITH d AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS w
               FROM documents WHERE doc_id < 1000),
    idx AS (SELECT id, w, unnest(range(1, len(w) - 1)) AS i FROM d),
    sh AS (SELECT DISTINCT id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (SELECT a.id AS a, b.id AS b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2),
    rel AS (SELECT p.a, p.b FROM pairs p
            JOIN sizes sa ON sa.id = p.a JOIN sizes sb ON sb.id = p.b
            WHERE 100 * p.inter >= 50 * (sa.n + sb.n - p.inter)),
    nrel AS (SELECT count(*) AS n_rel FROM rel),
    sig AS (SELECT s.id, t.i,
              min(md5(CAST(t.i AS VARCHAR) || '|' || s.shingle)) AS sig
            FROM sh s, unnest(range(0, 12)) t(i) GROUP BY 1, 2),
    rs AS (SELECT unnest([1, 2, 3, 4, 6, 12]) AS r),
    bands AS (SELECT id, r, i // r AS band,
                md5(string_agg(sig, '' ORDER BY i)) AS band_sig
              FROM sig, rs GROUP BY 1, 2, 3),
    cand AS (SELECT DISTINCT x.r, x.id AS a, y.id AS b
             FROM bands x JOIN bands y ON x.r = y.r AND x.band = y.band
               AND x.band_sig = y.band_sig AND x.id < y.id),
    cc AS (SELECT r, count(*) AS n_candidates FROM cand GROUP BY 1),
    tp AS (SELECT c.r, count(*) AS n_tp FROM cand c
           JOIN rel e ON e.a = c.a AND e.b = c.b GROUP BY 1)
    SELECT CAST(rs.r AS BIGINT) AS r, CAST(12 // rs.r AS BIGINT) AS n_bands,
      coalesce(cc.n_candidates, 0) AS n_candidates,
      (SELECT n_rel FROM nrel) AS n_relevant,
      coalesce(tp.n_tp, 0) AS n_tp,
      CASE WHEN coalesce(cc.n_candidates, 0) > 0 THEN
        CAST((1000000 * coalesce(tp.n_tp, 0)) // cc.n_candidates AS BIGINT)
      END AS precision_ppm,
      CASE WHEN (SELECT n_rel FROM nrel) > 0 THEN
        CAST((1000000 * coalesce(tp.n_tp, 0)) // (SELECT n_rel FROM nrel)
          AS BIGINT)
      END AS recall_ppm
    FROM rs LEFT JOIN cc ON cc.r = rs.r LEFT JOIN tp ON tp.r = rs.r"""

  // —————————————————————————————— Adamic–Adar link pred (q376)
  // (RA's classic sibling on the same pseudo-graph: 1/ln(deg) hub
  //  discount, one micro rounding per wedge-center degree, exact
  //  integer sums, known edges anti-joined, top 50 pinned.)
  val q376AdamicAdar: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.Graph.adamicAdar(
        graft.ops.Graph.pseudoEdges(docs.select(col("doc_id")), "doc_id",
          docs.count()))
      .orderBy(col("aa_micro").desc, col("a"), col("b"))
      .limit(50)
  }
  private val q376Sql: String = """
    WITH nodes AS (SELECT doc_id AS node FROM documents),
    nn AS (SELECT count(*) AS n FROM nodes),
    raw AS (SELECT node AS src,
              CAST(('0x' || substr(md5(CAST(node AS VARCHAR) || '|' ||
                CAST(j AS VARCHAR)), 1, 8)) AS BIGINT)
                % (SELECT n FROM nn) AS tgt
            FROM nodes, unnest(range(0, 3)) t(j)),
    edges AS (SELECT DISTINCT src, tgt FROM raw WHERE tgt <> src),
    und AS (SELECT DISTINCT least(src, tgt) AS a, greatest(src, tgt) AS b
            FROM edges),
    adj AS (SELECT a AS node, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT node AS z, CAST(count(*) AS BIGINT) AS deg
            FROM adj GROUP BY 1),
    wedge AS (SELECT l.node AS x, r.node AS y, l.nbr AS z
              FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.node < r.node),
    scored AS (SELECT w.x, w.y, CAST(count(*) AS BIGINT) AS n_common,
                CAST(sum(CAST(round(1000000 / ln(d.deg)) AS BIGINT))
                  AS BIGINT) AS aa_micro
              FROM wedge w JOIN deg d ON w.z = d.z AND d.deg <= 10000
              GROUP BY 1, 2),
    pred AS (SELECT s.x AS a, s.y AS b, s.n_common, s.aa_micro
             FROM scored s WHERE NOT EXISTS
               (SELECT 1 FROM und u WHERE u.a = s.x AND u.b = s.y))
    SELECT a, b, n_common, aa_micro FROM pred
    ORDER BY aa_micro DESC, a, b LIMIT 50"""

  // —————————————————————————————— context-length report (q377)
  // (the sequence-length decision table: exact truncate-at-L token
  //  accounting for every candidate L — kept fraction, truncated-doc
  //  count, and the perfect-packer sequence lower bound ⌈kept/L⌉.)
  val q377ContextLength: Q = (s, dir) =>
    graft.ops.TextOps.contextLengthReport(Tables.documents(s, dir),
      "text", "doc_id", lengths = Seq(16, 32, 48, 64, 128))
  private val q377Sql: String = """
    WITH base AS (SELECT len(string_split(lower(text), ' ')) AS n_tok
          FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    ls AS (SELECT CAST(unnest([16, 32, 48, 64, 128]) AS BIGINT) AS max_len),
    g AS (SELECT max_len, count(*) AS n_docs,
            CAST(sum(n_tok) AS BIGINT) AS n_tokens,
            CAST(sum(least(n_tok, max_len)) AS BIGINT) AS n_kept,
            count(CASE WHEN n_tok > max_len THEN 1 END) AS n_truncated
          FROM base, ls GROUP BY 1)
    SELECT max_len, n_docs, n_tokens, n_kept, n_truncated,
      CASE WHEN n_tokens > 0 THEN
        CAST((1000000 * n_kept) // n_tokens AS BIGINT) END AS kept_ppm,
      CAST((n_kept + max_len - 1) // max_len AS BIGINT) AS min_seqs
    FROM g"""

  // —————————————————————————————— dedup-threshold sweep (q378)
  // (the dedup-aggressiveness knob: exact qualifying pairs and the
  //  keep-smallest-id removal cost per Jaccard τ — the floor the CC
  //  pass is judged against; all-pairs truth on the capped corpus.)
  val q378DedupSweep: Q = (s, dir) =>
    graft.ops.Dedup.dedupThresholdSweep(
      Tables.documents(s, dir).where(col("doc_id") < 1000),
      "text", "doc_id", shingleN = 3,
      thresholds = Seq(30, 50, 70, 80, 90))
  private val q378Sql: String = """
    WITH d0 AS (SELECT doc_id AS id, text FROM documents
                WHERE doc_id < 1000 AND doc_id IS NOT NULL
                  AND text IS NOT NULL),
    base AS (SELECT id, len(string_split(lower(text), ' ')) AS n_tok
             FROM d0),
    tot AS (SELECT count(*) AS corpus_docs,
              CAST(sum(n_tok) AS BIGINT) AS corpus_tokens FROM base),
    w AS (SELECT id, string_split(lower(text), ' ') AS w FROM d0),
    idx AS (SELECT id, w, unnest(range(1, len(w) - 1)) AS i FROM w),
    sh AS (SELECT DISTINCT id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (SELECT a.id AS a, b.id AS b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2),
    taus AS (SELECT CAST(unnest([30, 50, 70, 80, 90]) AS BIGINT) AS tau),
    qual AS (SELECT t.tau, p.a, p.b FROM pairs p
             JOIN sizes sa ON sa.id = p.a JOIN sizes sb ON sb.id = p.b
             CROSS JOIN taus t
             WHERE 100 * p.inter >= t.tau * (sa.n + sb.n - p.inter)),
    np AS (SELECT tau, count(*) AS n_pairs FROM qual GROUP BY 1),
    rm AS (SELECT q.tau, count(*) AS n_removed_docs,
             CAST(sum(b.n_tok) AS BIGINT) AS removed_tokens
           FROM (SELECT DISTINCT tau, b FROM qual) q
           JOIN base b ON b.id = q.b GROUP BY 1)
    SELECT t.tau, coalesce(np.n_pairs, 0) AS n_pairs,
      coalesce(rm.n_removed_docs, 0) AS n_removed_docs,
      coalesce(rm.removed_tokens, 0) AS removed_tokens,
      (SELECT corpus_docs FROM tot) AS corpus_docs,
      (SELECT corpus_tokens FROM tot) AS corpus_tokens,
      CASE WHEN (SELECT corpus_tokens FROM tot) > 0 THEN
        CAST((1000000 * coalesce(rm.removed_tokens, 0))
          // (SELECT corpus_tokens FROM tot) AS BIGINT) END AS removed_ppm
    FROM taus t LEFT JOIN np ON np.tau = t.tau
      LEFT JOIN rm ON rm.tau = t.tau"""

  // —————————————————————————————— contamination attribution (q379)
  // (q71 says WHETHER an eval doc leaked; this says WHICH train doc
  //  leaked it: per eval doc the argmax train doc by distinct shared-
  //  bigram recall — ROUGE-2 recall against the eval doc's own bigram
  //  set — ties pinned to the smallest train id, zero-overlap eval
  //  docs kept as (null, 0) ledger rows.)
  val q379ContamAttrib: Q = (s, dir) => {
    val docs = Tables.documents(s, dir).where(col("doc_id") < 400)
    graft.ops.Dedup.contaminationAttribution(
      docs.where(pmod(col("doc_id"), lit(2)) === 1),
      docs.where(pmod(col("doc_id"), lit(2)) === 0),
      "text", "doc_id", n = 2)
  }
  private val q379Sql: String = """
    WITH e AS (SELECT doc_id, string_split(lower(text), ' ') AS w
               FROM documents WHERE doc_id < 400 AND doc_id % 2 = 1),
    t AS (SELECT doc_id, string_split(lower(text), ' ') AS w
          FROM documents WHERE doc_id < 400 AND doc_id % 2 = 0),
    eg AS (SELECT DISTINCT doc_id AS eval_id, w[i] || ' ' || w[i+1] AS g
           FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM e)),
    tg AS (SELECT DISTINCT doc_id AS train_id, w[i] || ' ' || w[i+1] AS g
           FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t)),
    sizes AS (SELECT eval_id, count(*) AS n_eval_ngrams FROM eg GROUP BY 1),
    inter AS (SELECT e.eval_id, t.train_id, count(*) AS n_shared
              FROM eg e JOIN tg t ON e.g = t.g GROUP BY 1, 2),
    best AS (SELECT eval_id, train_id, n_shared FROM
          (SELECT eval_id, train_id, n_shared, row_number() OVER
             (PARTITION BY eval_id ORDER BY n_shared DESC, train_id) AS rn
           FROM inter)
          WHERE rn = 1)
    SELECT s.eval_id, b.train_id,
      coalesce(b.n_shared, 0) AS n_shared, s.n_eval_ngrams,
      CAST((1000000 * coalesce(b.n_shared, 0)) // s.n_eval_ngrams
        AS BIGINT) AS recall_ppm
    FROM sizes s LEFT JOIN best b USING (eval_id)"""

  // —————————————————————————————— embedding isotropy (q380)
  // (mean pairwise cosine per label WITHOUT a pair join — the Gram
  //  identity Σ_{i≠j}⟨v_i,v_j⟩ = ‖Σv‖² − Σ‖v‖² turns the O(n²·d)
  //  audit into two grouped aggregates; micro-quantized, decimal-
  //  exact sums, one pinned double chain per released ratio.)
  val q380EmbeddingIsotropy: Q = (s, dir) =>
    graft.ops.Similarity.embeddingIsotropy(Tables.embeddings(s, dir),
      "vec_id", "embedding", "label")
  private val q380Sql: String = """
    WITH d AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE vec_id IS NOT NULL
                 AND embedding IS NOT NULL AND label IS NOT NULL),
    v AS (SELECT label AS grp, vec_id, CAST(i - 1 AS BIGINT) AS dim,
            CAST(round(e[i] * 1000000) AS BIGINT) AS xm
          FROM d, unnest(range(1, len(e) + 1)) u(i)),
    pd AS (SELECT grp, dim, count(*) AS cnt,
             CAST(sum(xm) AS HUGEINT) AS s,
             CAST(sum(xm * xm) AS HUGEINT) AS q
           FROM v GROUP BY 1, 2),
    g AS (SELECT grp, max(cnt) AS n_vecs, count(*) AS n_dims,
            CAST(sum(q) AS HUGEINT) AS qs,
            CAST(sum(s * s) AS HUGEINT) AS ss
          FROM pd GROUP BY 1)
    SELECT grp, n_vecs, n_dims,
      CAST(qs AS BIGINT) AS sum_norm2,
      CAST(ss - qs AS BIGINT) AS pair_dot_sum,
      round(CAST(qs AS DOUBLE) / CAST(n_vecs AS DOUBLE) / 1e12, 6)
        AS mean_norm2_6,
      CASE WHEN n_vecs > 1 THEN
        round(CAST(ss - qs AS DOUBLE)
          / CAST(n_vecs * (n_vecs - 1) AS DOUBLE) / 1e12, 6)
      END AS mean_cos6
    FROM g"""

  // —————————————————————————————— top-component share (q381)
  // (isotropy's spectral sibling: power iteration over the d×d
  //  second-moment matrix — integer-pinned trajectory, truncating
  //  max-normalization each round, Rayleigh share of trace at the
  //  end. The oracle unrolls all four rounds over the same HUGEINT
  //  lattice; the d² matrix is the one bounded driver artifact.)
  val q381TopComponent: Q = (s, dir) =>
    graft.ops.Similarity.topComponentShare(Tables.embeddings(s, dir),
      "vec_id", "embedding", iters = 4)
  private val q381Sql: String = {
    def round(r: Int): String = s"""
    w$r AS MATERIALIZED (SELECT m.d1 AS dim,
             CAST(sum(m.mv * u.u) AS HUGEINT) AS w
           FROM m JOIN u${r - 1} u ON u.dim = m.d2 GROUP BY 1),
    x$r AS (SELECT max(abs(w)) AS mx FROM w$r),
    u$r AS MATERIALIZED (SELECT dim,
            CAST((w * 1000000) // (SELECT mx FROM x$r) AS HUGEINT) AS u
          FROM w$r)"""
    s"""
    WITH d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings WHERE vec_id IS NOT NULL
                 AND embedding IS NOT NULL),
    v AS (SELECT vec_id AS id, CAST(i - 1 AS BIGINT) AS dim,
            CAST(round(e[i] * 1000000) AS BIGINT) AS xm
          FROM d, unnest(range(1, len(e) + 1)) u(i)),
    m AS MATERIALIZED (SELECT x.dim AS d1, y.dim AS d2,
            CAST(sum(CAST(x.xm AS HUGEINT) * y.xm) AS HUGEINT) AS mv
          FROM v x JOIN v y ON x.id = y.id GROUP BY 1, 2),
    nv AS (SELECT count(DISTINCT id) AS n_vecs FROM v),
    u0 AS (SELECT DISTINCT d1 AS dim, CAST(1000000 AS HUGEINT) AS u
           FROM m),${round(1)},${round(2)},${round(3)},${round(4)},
    wf AS (SELECT m.d1 AS dim, CAST(sum(m.mv * u.u) AS HUGEINT) AS w
           FROM m JOIN u4 u ON u.dim = m.d2 GROUP BY 1),
    ray AS (SELECT CAST(sum(u.u * w.w) AS HUGEINT) AS ln_v,
              CAST(sum(u.u * u.u) AS HUGEINT) AS ld_v
            FROM u4 u JOIN wf w USING (dim)),
    tr AS (SELECT CAST(sum(mv) AS HUGEINT) AS trace FROM m
           WHERE d1 = d2),
    td AS (SELECT dim AS top_dim FROM u4 ORDER BY abs(u) DESC, dim
           LIMIT 1)
    SELECT (SELECT n_vecs FROM nv) AS n_vecs,
      (SELECT count(*) FROM u0) AS n_dims,
      CAST((SELECT trace FROM tr) AS BIGINT) AS trace,
      CASE WHEN (SELECT ld_v FROM ray) > 0
             AND (SELECT trace FROM tr) > 0 THEN
        round(CAST((SELECT ln_v FROM ray) AS DOUBLE)
          / CAST((SELECT ld_v FROM ray) AS DOUBLE)
          / CAST((SELECT trace FROM tr) AS DOUBLE), 6)
      END AS top_share6,
      (SELECT top_dim FROM td) AS top_dim"""
  }

  // —————————————————————————————— k-means silhouette (q382)
  // (clustering-quality verdict over q369's OWN final state:
  //  centroid-based simplified silhouette — a = own-centroid squared
  //  distance, b = nearest-other, s = (b−a)/max(a,b) truncating
  //  milli. The oracle replays the identical 3-round Lloyd trajectory
  //  (q369's round builder) and the silhouette algebra on top.)
  val q382KmeansSilhouette: Q = (s, dir) =>
    graft.ops.Similarity.kmeansSilhouette(Tables.embeddings(s, dir),
      "vec_id", "embedding", k = 8, iters = 3)
  private val q382Sql: String = {
    def round(r: Int): String = s"""
    d$r AS (SELECT p.id, c.cid, sum((p.xm - c.cm) * (p.xm - c.cm)) AS d
           FROM pts p JOIN c${r - 1} c USING (dim) GROUP BY 1, 2),
    a$r AS MATERIALIZED (SELECT id, cid, d FROM
          (SELECT id, cid, d, row_number() OVER
             (PARTITION BY id ORDER BY d, cid) AS rn FROM d$r)
          WHERE rn = 1),
    m$r AS (SELECT a.cid, p.dim, CAST(sum(p.xm) // count(*) AS BIGINT) AS cm
           FROM a$r a JOIN pts p USING (id) GROUP BY 1, 2),
    c$r AS MATERIALIZED (SELECT c.cid, c.dim, coalesce(m.cm, c.cm) AS cm
          FROM c${r - 1} c LEFT JOIN m$r m
            ON m.cid = c.cid AND m.dim = c.dim)"""
    s"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id AS id, i - 1 AS dim,
        CAST(round(CAST(e[i] AS DOUBLE) * 1000000) AS BIGINT) AS xm
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id IS NOT NULL
              AND embedding IS NOT NULL),
        unnest(range(1, len(e) + 1)) u(i)),
    seeds AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS cid
              FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT 8)),
    c0 AS MATERIALIZED (SELECT s.cid, p.dim, p.xm AS cm
          FROM seeds s JOIN pts p USING (id)),${round(1)},${round(2)},
    d3 AS MATERIALIZED (SELECT p.id, c.cid,
            CAST(sum((p.xm - c.cm) * (p.xm - c.cm)) AS BIGINT) AS d
           FROM pts p JOIN c2 c USING (dim) GROUP BY 1, 2),
    a3 AS MATERIALIZED (SELECT id, cid, d FROM
          (SELECT id, cid, d, row_number() OVER
             (PARTITION BY id ORDER BY d, cid) AS rn FROM d3)
          WHERE rn = 1),
    oth AS (SELECT d3.id, min(d3.d) AS b FROM d3
            JOIN a3 ON a3.id = d3.id AND d3.cid <> a3.cid GROUP BY 1),
    sil AS (SELECT a3.id, a3.cid, a3.d AS a, o.b,
             CASE WHEN greatest(a3.d, o.b) > 0 THEN
               CAST(((o.b - a3.d) * 1000) // greatest(a3.d, o.b)
                 AS BIGINT) END AS s_milli
           FROM a3 JOIN oth o ON o.id = a3.id),
    st AS (SELECT cid, count(*) AS n_members, count(s_milli) AS n_scored,
             CASE WHEN count(s_milli) > 0 THEN
               CAST(sum(s_milli) // count(s_milli) AS BIGINT)
             END AS mean_s_milli,
             min(s_milli) AS min_s_milli, max(s_milli) AS max_s_milli
           FROM sil GROUP BY 1)
    SELECT se.cid, coalesce(st.n_members, 0) AS n_members,
      coalesce(st.n_scored, 0) AS n_scored,
      st.mean_s_milli, st.min_s_milli, st.max_s_milli
    FROM seeds se LEFT JOIN st USING (cid)"""
  }

  // —————————————————————————————— UniMax allocation (q383)
  // (the epoch-capped fair waterfill over source token counts: funded
  //  prefix by integer cross-multiplication, truncating residue split
  //  with pinned remainder pennies — allocations sum to EXACTLY the
  //  budget. budget 26000 < Σ capacity so the data shows both funded
  //  and waterfilled sources.)
  val q383UniMax: Q = (s, dir) =>
    graft.ops.Sampling.uniMaxAllocation(Tables.documents(s, dir),
      "text", "source", budget = 26000L, maxEpochs = 1)
  private val q383Sql: String = """
    WITH src AS (SELECT source,
            CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT)
              AS n_tokens
          FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
          GROUP BY 1),
    rk AS (SELECT source, n_tokens, n_tokens * 1 AS capacity,
             CAST(row_number() OVER (ORDER BY n_tokens * 1, source)
               AS BIGINT) AS r,
             coalesce(sum(n_tokens * 1) OVER
               (ORDER BY n_tokens * 1, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev,
             count(*) OVER () AS n
           FROM src),
    fd AS (SELECT source, n_tokens, capacity, r, n,
             capacity * (n - r + 1) <= 26000 - cum_prev AS funded
           FROM rk),
    tot AS (SELECT coalesce(sum(CASE WHEN funded THEN capacity END), 0)
              AS f_sum,
            coalesce(sum(CASE WHEN funded THEN 1 END), 0) AS k
            FROM fd),
    al AS (SELECT f.source, f.n_tokens, f.capacity, f.funded,
             CASE WHEN f.funded THEN f.capacity ELSE
               (26000 - t.f_sum) // (f.n - t.k) +
               CASE WHEN f.r - t.k <= (26000 - t.f_sum) % (f.n - t.k)
                 THEN 1 ELSE 0 END
             END AS alloc_tokens
           FROM fd f, tot t)
    SELECT source, n_tokens, capacity, funded,
      CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
      CAST((1000000 * alloc_tokens) // n_tokens AS BIGINT) AS epochs_ppm
    FROM al"""

  // —————————————————————————————— packing cross-doc audit (q384)
  // (the attention-mask decision number: per packed (shard, bin)
  //  window, the exact count of causal token pairs that CROSS a
  //  document boundary — Σ_{i<j} l_i·l_j = (L²−Σl²)/2 — against all
  //  L(L−1)/2 pairs, truncating ppm; q83's shard/bin assignment.)
  val q384PackingAudit: Q = (s, dir) =>
    graft.ops.Sampling.packingCrossDocAudit(Tables.documents(s, dir),
      "text", "doc_id", budget = 120L, numShards = 8)
  private val q384Sql: String = """
    WITH t AS (SELECT doc_id AS id,
            CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tokens,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))
              AS BIGINT) % 8 AS shard
          FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    cum AS (SELECT id, tokens, shard,
              sum(tokens) OVER (PARTITION BY shard ORDER BY id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t),
    g AS (SELECT shard, CAST(floor((cum - tokens) / 120) AS BIGINT) AS bin,
            count(*) AS n_docs,
            CAST(sum(tokens) AS BIGINT) AS window_tokens,
            CAST(sum(tokens * tokens) AS BIGINT) AS sq
          FROM cum GROUP BY 1, 2)
    SELECT shard, bin, n_docs, window_tokens,
      CAST((window_tokens * window_tokens - sq) // 2 AS BIGINT)
        AS cross_pairs,
      CAST((window_tokens * (window_tokens - 1)) // 2 AS BIGINT)
        AS total_pairs,
      CASE WHEN window_tokens > 1 THEN
        CAST((1000000 * (window_tokens * window_tokens - sq))
          // (window_tokens * window_tokens - window_tokens) AS BIGINT)
      END AS cross_ppm
    FROM g"""

  // —————————————————————————————— filter-overlap report (q385)
  // (the cascade-design table: per rule in pinned order — independent
  //  hits, MARGINAL hits (kills no earlier rule made), survivors after
  //  the prefix. One aggregate pass; rule rows explode from it.)
  val q385FilterOverlap: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ops.TextOps.words(col("text")).as("_w"))
    val n = size(col("_w")).cast("long")
    val sw = size(filter(col("_w"),
      x => x.isin("the", "a"))).cast("long")
    val db = size(graft.ops.TextOps.shinglesFromWords(col("_w"), 2))
      .cast("long")
    graft.ops.Cleaning.filterOverlapReport(docs, "doc_id", Seq(
      "too_short" -> (n < 45),
      "dup_bigrams" -> (n >= 2 &&
        lit(100L) * ((n - 1) - db) > lit(2L) * (n - 1)),
      "low_stopword" -> (lit(100L) * sw < lit(3L) * n),
      "too_long" -> (n > 70)))
  }
  private val q385Sql: String = """
    WITH base AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                  FROM documents WHERE doc_id IS NOT NULL),
    bg AS (SELECT doc_id, count(DISTINCT w[i] || ' ' || w[i+1]) AS db
           FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                 FROM base)
           GROUP BY 1),
    f AS (SELECT b.doc_id, len(b.w) AS n,
            len(list_filter(b.w, x -> x IN ('the', 'a'))) AS sw,
            coalesce(bg.db, 0) AS db
          FROM base b LEFT JOIN bg USING (doc_id)),
    h AS (SELECT coalesce(n < 45, false) AS h0,
            coalesce(n >= 2 AND 100 * ((n - 1) - db) > 2 * (n - 1),
              false) AS h1,
            coalesce(100 * sw < 3 * n, false) AS h2,
            coalesce(n > 70, false) AS h3
          FROM f),
    agg AS (SELECT count(*) AS total,
        CAST(sum(CASE WHEN h0 THEN 1 ELSE 0 END) AS BIGINT) AS hits0,
        CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
        CAST(sum(CASE WHEN h2 THEN 1 ELSE 0 END) AS BIGINT) AS hits2,
        CAST(sum(CASE WHEN h3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
        CAST(sum(CASE WHEN h1 AND NOT h0 THEN 1 ELSE 0 END) AS BIGINT)
          AS marg1,
        CAST(sum(CASE WHEN h2 AND NOT (h0 OR h1) THEN 1 ELSE 0 END)
          AS BIGINT) AS marg2,
        CAST(sum(CASE WHEN h3 AND NOT (h0 OR h1 OR h2) THEN 1 ELSE 0 END)
          AS BIGINT) AS marg3,
        CAST(sum(CASE WHEN NOT h0 THEN 1 ELSE 0 END) AS BIGINT) AS kept0,
        CAST(sum(CASE WHEN NOT (h0 OR h1) THEN 1 ELSE 0 END) AS BIGINT)
          AS kept1,
        CAST(sum(CASE WHEN NOT (h0 OR h1 OR h2) THEN 1 ELSE 0 END)
          AS BIGINT) AS kept2,
        CAST(sum(CASE WHEN NOT (h0 OR h1 OR h2 OR h3) THEN 1 ELSE 0 END)
          AS BIGINT) AS kept3
      FROM h),
    rows_ AS (
      SELECT CAST(0 AS BIGINT) AS rule_idx, 'too_short' AS rule,
        hits0 AS n_hits, hits0 AS n_marginal, kept0 AS n_kept_after,
        total FROM agg
      UNION ALL SELECT 1, 'dup_bigrams', hits1, marg1, kept1, total
        FROM agg
      UNION ALL SELECT 2, 'low_stopword', hits2, marg2, kept2, total
        FROM agg
      UNION ALL SELECT 3, 'too_long', hits3, marg3, kept3, total
        FROM agg)
    SELECT rule_idx, rule, n_hits,
      CASE WHEN total > 0 THEN
        CAST((1000000 * n_hits) // total AS BIGINT) END AS hit_ppm,
      n_marginal, n_kept_after,
      CASE WHEN total > 0 THEN
        CAST((1000000 * n_kept_after) // total AS BIGINT) END AS kept_ppm,
      CAST(total AS BIGINT) AS n_docs
    FROM rows_"""

  // —————————————————————————————— IPF raking (q386)
  // (survey-statistics reweighting for corpus mixes: rake the
  //  lang × source contingency onto uniform marginals — 100/lang,
  //  25/source — by 3 alternating integer-pinned scale rounds; the
  //  oracle unrolls every round over the same micro/HUGEINT lattice.)
  val q386IpfRaking: Q = (s, dir) =>
    graft.ops.Analytics.ipfRaking(Tables.documents(s, dir),
      "lang", "source",
      rowTargets = Seq("de", "en", "es", "fr", "zh").map(_ -> 100L),
      colTargets = (0 until 20).map(i => s"src$i" -> 25L),
      iters = 3)
  private val q386Sql: String = {
    def round(r: Int): String = s"""
    rm$r AS (SELECT row_, CASE WHEN sum(w) > 0 THEN
              CAST((CAST(any_value(rtv) AS HUGEINT) * 1000000000000)
                // sum(w) AS BIGINT)
            END AS sc FROM w${r - 1} GROUP BY 1),
    wr$r AS (SELECT c.row_, c.col_, c.n, c.rtv, c.ctv,
              CAST((CAST(c.w AS HUGEINT) * m.sc) // 1000000 AS BIGINT)
                AS w
            FROM w${r - 1} c JOIN rm$r m USING (row_)),
    cm$r AS (SELECT col_, CASE WHEN sum(w) > 0 THEN
              CAST((CAST(any_value(ctv) AS HUGEINT) * 1000000000000)
                // sum(w) AS BIGINT)
            END AS sc FROM wr$r GROUP BY 1),
    w$r AS MATERIALIZED (SELECT c.row_, c.col_, c.n, c.rtv, c.ctv,
              CAST((CAST(c.w AS HUGEINT) * m.sc) // 1000000 AS BIGINT)
                AS w
            FROM wr$r c JOIN cm$r m USING (col_))"""
    s"""
    WITH rt AS (SELECT * FROM (VALUES ('de', 100), ('en', 100),
            ('es', 100), ('fr', 100), ('zh', 100)) t(row_, rtv)),
    ct AS (SELECT 'src' || CAST(i AS VARCHAR) AS col_, 25 AS ctv
           FROM unnest(range(0, 20)) u(i)),
    c0 AS (SELECT lang AS row_, source AS col_, count(*) AS n
           FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY 1, 2),
    w0 AS MATERIALIZED (SELECT c0.row_, c0.col_, c0.n, rt.rtv, ct.ctv,
          CAST(c0.n * 1000000 AS BIGINT) AS w
          FROM c0 JOIN rt USING (row_)
            JOIN ct USING (col_)),${round(1)},${round(2)},${round(3)}
    SELECT row_ AS row, col_ AS col, n, w AS w_micro FROM w3"""
  }

  // —————————————————————————————— weighted Jaccard near-dup (q387)
  // (reciprocal-df shingle weights: boilerplate shingles are worth
  //  ~nothing, rare overlap is worth everything — the template-page
  //  false-positive killer next to plain q20; exact integer weights,
  //  cross-multiplied threshold, all-pairs truth on the capped corpus.)
  val q387WeightedJaccard: Q = (s, dir) =>
    graft.ops.Dedup.weightedJaccardPairs(
      Tables.documents(s, dir).where(col("doc_id") < 1000),
      "text", "doc_id", n = 3, thresholdPct = 40)
  private val q387Sql: String = """
    WITH d AS (SELECT doc_id AS id, string_split(lower(text), ' ') AS w
               FROM documents WHERE doc_id < 1000),
    idx AS (SELECT id, w, unnest(range(1, len(w) - 1)) AS i FROM d),
    sh AS (SELECT DISTINCT id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
    dfq AS (SELECT shingle, count(*) AS dfc FROM sh GROUP BY 1),
    ws AS (SELECT sh.id, sh.shingle, CAST(1000000 // dfc AS BIGINT) AS wv
           FROM sh JOIN dfq USING (shingle)),
    tot AS (SELECT id, CAST(sum(wv) AS BIGINT) AS wt FROM ws GROUP BY 1),
    pr AS (SELECT x.id AS a, y.id AS b, CAST(sum(x.wv) AS BIGINT)
             AS w_inter
           FROM ws x JOIN ws y ON x.shingle = y.shingle AND x.id < y.id
           GROUP BY 1, 2)
    SELECT a, b, w_inter, ta.wt + tb.wt - w_inter AS w_union,
      CAST((1000000 * w_inter) // (ta.wt + tb.wt - w_inter) AS BIGINT)
        AS wj_ppm
    FROM pr JOIN tot ta ON ta.id = pr.a JOIN tot tb ON tb.id = pr.b
    WHERE ta.wt + tb.wt - w_inter > 0
      AND 100 * w_inter >= 40 * (ta.wt + tb.wt - w_inter)"""

  // —————————————————————————————— continuation pairs (q388)
  // (split-document stitch detection: fragments synthesized from the
  //  corpus itself — front = tokens 1-40, back = tokens 31-end, a
  //  10-token planted overlap — and the operator must recover every
  //  (front, back) stitch by exact tail-equals-head equality.)
  val q388Continuation: Q = (s, dir) => {
    val el = Tables.documents(s, dir)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        graft.ops.TextOps.words(col("text")).as("_w"))
      .where(size(col("_w")) >= 50)
    val frags = el.select(col("doc_id").as("id"),
        concat_ws(" ", slice(col("_w"), 1, 40)).as("text"))
      .unionByName(el.select((col("doc_id") + 100000L).as("id"),
        concat_ws(" ", slice(col("_w"), lit(31),
          size(col("_w")) - 30)).as("text")))
    graft.ops.Dedup.continuationPairs(frags, "text", "id", k = 10,
      maxDocFreq = 64)
  }
  private val q388Sql: String = """
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
               FROM documents WHERE doc_id IS NOT NULL
                 AND text IS NOT NULL),
    el AS (SELECT doc_id, w FROM d WHERE len(w) >= 50),
    frag AS (SELECT doc_id AS id, w[1:40] AS w FROM el
             UNION ALL
             SELECT doc_id + 100000, w[31:len(w)] FROM el),
    ok AS (SELECT id, w FROM frag WHERE len(w) >= 10),
    t0 AS (SELECT id AS a,
        array_to_string(w[len(w)-9:len(w)], ' ') AS gram FROM ok),
    h0 AS (SELECT id AS b, array_to_string(w[1:10], ' ') AS gram
           FROM ok),
    tails AS (SELECT a, gram FROM (SELECT a, gram,
          count(*) OVER (PARTITION BY gram) AS df FROM t0) WHERE df <= 64),
    heads AS (SELECT b, gram FROM (SELECT b, gram,
          count(*) OVER (PARTITION BY gram) AS df FROM h0) WHERE df <= 64)
    SELECT a, b FROM tails JOIN heads USING (gram) WHERE a <> b"""

  // —————————————————————————————— dup source matrix (q389)
  // ("who copies whom": exact Jaccard near-dup pairs rolled up to
  //  (source, source) cells — cross-source duplication a per-source
  //  dedup cannot see; pair count + distinct docs per cell.)
  val q389DupSourceMatrix: Q = (s, dir) =>
    graft.ops.Dedup.nearDupSourceMatrix(
      Tables.documents(s, dir).where(col("doc_id") < 1000),
      "text", "doc_id", "source", n = 3, threshold = 0.5)
  private val q389Sql: String = """
    WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS w
               FROM documents WHERE doc_id < 1000),
    idx AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM d),
    sh AS (SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle FROM idx),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
              FROM sh x JOIN sh y ON x.shingle = y.shingle
                AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT a, b FROM (
        SELECT a, b,
          inter / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b)
      WHERE jaccard >= 0.5),
    ps AS (SELECT p.a, p.b,
             least(da.source, db.source) AS s1,
             greatest(da.source, db.source) AS s2
           FROM pairs p
           JOIN documents da ON da.doc_id = p.a
           JOIN documents db ON db.doc_id = p.b
           WHERE da.source IS NOT NULL AND db.source IS NOT NULL),
    dc AS (SELECT s1, s2, count(DISTINCT id) AS n_docs FROM
          (SELECT s1, s2, a AS id FROM ps
           UNION ALL SELECT s1, s2, b FROM ps)
          GROUP BY 1, 2),
    pc AS (SELECT s1, s2, count(*) AS n_pairs FROM ps GROUP BY 1, 2)
    SELECT pc.s1, pc.s2, pc.n_pairs, dc.n_docs
    FROM pc JOIN dc USING (s1, s2)"""

  // —————————————————————————————— length-debiased quality (q390)
  // (LM quality proxies correlate with length; z-score the q82
  //  unigram score WITHIN 10-token length bands so "good for its
  //  length" is the curation signal. Micro-pinned score, exact
  //  decimal band moments, the q141 whiten chain for z.)
  val q390LengthDebiased: Q = (s, dir) =>
    graft.ops.Cleaning.lengthDebiasedScore(Tables.documents(s, dir),
      "text", "doc_id", bandWidth = 10)
  private val q390Sql: String = """
    WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' '))
                 AS word
               FROM documents),
    c AS (SELECT word, count(*) AS c FROM w GROUP BY 1),
    n AS (SELECT sum(c) AS n FROM c),
    sc0 AS (SELECT doc_id AS id,
              round(avg(ln(c / CAST(n AS DOUBLE))), 6) AS logprob,
              count(*) AS n_words
            FROM w JOIN c USING (word), n GROUP BY doc_id),
    sc AS (SELECT id, n_words, n_words // 10 AS band,
             CAST(round(logprob * 1000000) AS BIGINT) AS score_micro
           FROM sc0),
    m AS (SELECT band, CAST(count(*) AS HUGEINT) AS bn,
            CAST(sum(score_micro) AS HUGEINT) AS bs,
            CAST(sum(score_micro * score_micro) AS HUGEINT) AS bss
          FROM sc GROUP BY 1)
    SELECT id, n_words, band, score_micro,
      CASE WHEN bn * bss - bs * bs > 0 THEN
        round(CAST(bn * score_micro - bs AS DOUBLE)
          / sqrt(CAST(bn * bss - bs * bs AS DOUBLE)), 6)
      END AS z6
    FROM sc JOIN m USING (band)"""

  // —————————————————————————————— coverage spectrum (q391)
  // (the corpus-level decontamination dial: fraction of the eval
  //  split's distinct n-grams present anywhere in train, for
  //  n = 1..4 — the DECAY with n separates lexical overlap from
  //  verbatim leakage.)
  val q391CoverageSpectrum: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.Dedup.coverageSpectrum(
      docs.where(pmod(col("doc_id"), lit(2)) === 1),
      docs.where(pmod(col("doc_id"), lit(2)) === 0),
      "text", "doc_id", ns = Seq(1, 2, 3, 4))
  }
  private val q391Sql: String = {
    def one(n: Int): String = {
      val gram = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""
    SELECT CAST($n AS BIGINT) AS n, eg.n_eval_grams, cv.n_covered,
      CASE WHEN eg.n_eval_grams > 0 THEN
        CAST((1000000 * cv.n_covered) // eg.n_eval_grams AS BIGINT)
      END AS coverage_ppm
    FROM
      (SELECT count(*) AS n_eval_grams FROM
        (SELECT DISTINCT substr(md5($gram), 1, 16) AS g
         FROM (SELECT w, unnest(range(1, len(w) + 2 - $n)) AS i
               FROM (SELECT string_split(lower(text), ' ') AS w
                     FROM documents WHERE doc_id % 2 = 1)))) eg,
      (SELECT count(*) AS n_covered FROM
        (SELECT DISTINCT substr(md5($gram), 1, 16) AS g
         FROM (SELECT w, unnest(range(1, len(w) + 2 - $n)) AS i
               FROM (SELECT string_split(lower(text), ' ') AS w
                     FROM documents WHERE doc_id % 2 = 1)))
       WHERE g IN
        (SELECT DISTINCT substr(md5($gram), 1, 16) AS g
         FROM (SELECT w, unnest(range(1, len(w) + 2 - $n)) AS i
               FROM (SELECT string_split(lower(text), ' ') AS w
                     FROM documents WHERE doc_id % 2 = 0)))) cv"""
    }
    Seq(1, 2, 3, 4).map(one).mkString("\n    UNION ALL\n")
  }

  // —————————————————————————————— token dispersion (q392)
  // (Gries' DP per token across sources: Σ|obs − expected|/2 in
  //  truncating ppm over the FULL part lattice — absent cells count
  //  the full expected share; the burstiness view raw frequency
  //  can't see. Top 50 by (DP desc, word).)
  val q392TokenDispersion: Q = (s, dir) =>
    graft.ops.TextOps.tokenDispersion(Tables.documents(s, dir),
        "text", "source", minCount = 50)
      .orderBy(col("dp_ppm").desc, col("word")).limit(50)
  private val q392Sql: String = """
    WITH cells AS (SELECT source AS part,
            unnest(string_split(lower(text), ' ')) AS word
          FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    c AS (SELECT part, word, count(*) AS c FROM cells GROUP BY 1, 2),
    p AS (SELECT part, CAST(sum(c) AS BIGINT) AS s FROM c GROUP BY 1),
    t AS (SELECT CAST(sum(s) AS BIGINT) AS st FROM p),
    e AS (SELECT part, CAST((1000000 * s) // (SELECT st FROM t)
            AS BIGINT) AS e_ppm FROM p),
    v AS (SELECT word, CAST(sum(c) AS BIGINT) AS ct,
            count(*) AS n_parts_present
          FROM c GROUP BY 1 HAVING sum(c) >= 50),
    lat AS (SELECT v.word, v.ct, v.n_parts_present, e.part, e.e_ppm,
              CAST((1000000 * coalesce(c.c, 0)) // v.ct AS BIGINT)
                AS o_ppm
            FROM v CROSS JOIN e
            LEFT JOIN c ON c.word = v.word AND c.part = e.part)
    SELECT word, any_value(ct) AS n_occurrences,
      any_value(n_parts_present) AS n_parts_present,
      CAST(sum(abs(o_ppm - e_ppm)) // 2 AS BIGINT) AS dp_ppm
    FROM lat GROUP BY 1
    ORDER BY dp_ppm DESC, word LIMIT 50"""

  // —————————————————————————————— parked-domain screen (q393)
  // (the RefinedWeb curation gate BESIDE q374: parked/soft-404 pages
  //  are low-dup boilerplate the dup-rate screen never fires on. Pages
  //  synthesize in-plan from the documents table — 40 hosts on the
  //  doc_id lattice, with host 7 a registrar lander (template phrases),
  //  host 11 a soft-404 (HTTP-200 "page not found" body), host 31 a
  //  link farm (anchor-dominated, no template) — and the operator must
  //  flag exactly those three whole hosts. Both engines run the
  //  identical tag-strip regex chain (the q103 mirror).)
  private val q393ContentTail =
    "</p><a href=\"https://next.example/p1\">next page here</a>" +
      "<a href=\"https://next.example/p2\">more content here</a></body></html>"
  private val q393Parked =
    "<html><head><title>Domain For Sale</title></head><body>" +
      "<p>this domain is for sale. buy this domain today.</p>" +
      "<a href=\"https://registrar.example/offer\">make an offer</a>" +
      "</body></html>"
  private val q393Soft404 =
    "<html><head><title>Not Found</title></head><body>" +
      "<p>page not found. the page you requested does not exist.</p>" +
      "<a href=\"https://h11.example.org/\">home</a></body></html>"
  private val q393LinkFarm =
    "<html><head><title>Links</title></head><body>" +
      (1 to 10).map(k =>
        s"""<a href="https://ad$k.example/x">click$k</a>""").mkString +
      "</body></html>"
  val q393ParkedDomains: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
    val hostIdx = col("doc_id") % 40
    val page = d.select(
      concat(lit("h"), hostIdx.cast("string"), lit(".example.org"))
        .as("host"),
      when(hostIdx === 7, lit(q393Parked))
        .when(hostIdx === 11, lit(q393Soft404))
        .when(hostIdx === 31, lit(q393LinkFarm))
        .otherwise(concat(lit("<html><head><title>Doc "),
          col("doc_id").cast("string"), lit("</title></head><body><p>"),
          col("text"), lit(q393ContentTail))).as("html"))
    graft.ops.Cleaning.parkedDomainScreen(page, "host", "html")
  }
  private val q393Sql: String = {
    val phrases = graft.ops.Cleaning.parkedPhrases.mkString("|")
    // the q103 tag-strip mirror: script/style first, tags, entities
    // (&amp; last), whitespace collapse
    def strip(c: String) = s"""
      trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace($c,
        '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        '<[^>]+>', ' ', 'g'),
        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        '\\s+', ' ', 'g'))"""
    s"""
    WITH d AS (SELECT doc_id, text, doc_id % 40 AS hi FROM documents
               WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    pg AS (SELECT 'h' || CAST(hi AS VARCHAR) || '.example.org' AS host,
        CASE WHEN hi = 7 THEN '${q393Parked.replace("'", "''")}'
             WHEN hi = 11 THEN '${q393Soft404.replace("'", "''")}'
             WHEN hi = 31 THEN '${q393LinkFarm.replace("'", "''")}'
             ELSE '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
               || '</title></head><body><p>' || text
               || '${q393ContentTail.replace("'", "''")}'
        END AS html FROM d),
    t AS (SELECT host, html, ${strip("html")} AS body FROM pg),
    s AS (SELECT host,
        regexp_matches(lower(html), '$phrases') AS tpl,
        CAST(len(regexp_extract_all(html, '<a ')) AS BIGINT) AS n_links,
        CAST(len(string_split(lower(body), ' ')) AS BIGINT) AS n_words,
        CAST(len(list_distinct(string_split(lower(body), ' ')))
          AS BIGINT) AS n_distinct
      FROM t),
    f AS (SELECT host, tpl, n_links, n_words, n_distinct,
        (tpl OR n_distinct < 8
             OR 1000000 * n_links >= 400000 * (n_links + n_words))
          AS flagged
      FROM s),
    g AS (SELECT host, count(*) AS n_pages,
        sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS n_flagged,
        sum(CASE WHEN tpl THEN 1 ELSE 0 END) AS n_template,
        CAST(sum(n_links) AS BIGINT) AS n_links,
        CAST(sum(n_words) AS BIGINT) AS n_words,
        CAST(sum(n_distinct) // count(*) AS BIGINT) AS mean_distinct_tok
      FROM f GROUP BY 1)
    SELECT host, n_pages, CAST(n_flagged AS BIGINT) AS n_flagged,
      CAST(n_template AS BIGINT) AS n_template, n_links, n_words,
      mean_distinct_tok,
      CAST((1000000 * n_flagged) // n_pages AS BIGINT) AS flag_ppm,
      (n_pages >= 2 AND 100 * n_flagged >= 60 * n_pages) AS parked
    FROM g"""
  }

  val all: Map[String, Q] = Map(
    "q369_kmeans" -> q369Kmeans,
    "q371_perplexity_buckets" -> q371PerplexityBuckets,
    "q372_blocklist" -> q372Blocklist,
    "q373_char_entropy" -> q373CharEntropy,
    "q374_domain_quality" -> q374DomainQuality,
    "q375_lsh_sweep" -> q375LshSweep,
    "q376_adamic_adar" -> q376AdamicAdar,
    "q377_context_length" -> q377ContextLength,
    "q378_dedup_sweep" -> q378DedupSweep,
    "q379_contam_attrib" -> q379ContamAttrib,
    "q380_embedding_isotropy" -> q380EmbeddingIsotropy,
    "q381_top_component" -> q381TopComponent,
    "q382_kmeans_silhouette" -> q382KmeansSilhouette,
    "q383_unimax" -> q383UniMax,
    "q384_packing_audit" -> q384PackingAudit,
    "q385_filter_overlap" -> q385FilterOverlap,
    "q386_ipf_raking" -> q386IpfRaking,
    "q387_weighted_jaccard" -> q387WeightedJaccard,
    "q388_continuation" -> q388Continuation,
    "q389_dup_source_matrix" -> q389DupSourceMatrix,
    "q390_length_debiased" -> q390LengthDebiased,
    "q391_coverage_spectrum" -> q391CoverageSpectrum,
    "q392_token_dispersion" -> q392TokenDispersion,
    "q393_parked_domains" -> q393ParkedDomains)

  val oracles: Map[String, String] = Map(
    "q369_kmeans" -> q369Sql,
    "q371_perplexity_buckets" -> q371Sql,
    "q372_blocklist" -> q372Sql,
    "q373_char_entropy" -> q373Sql,
    "q374_domain_quality" -> q374Sql,
    "q375_lsh_sweep" -> q375Sql,
    "q376_adamic_adar" -> q376Sql,
    "q377_context_length" -> q377Sql,
    "q378_dedup_sweep" -> q378Sql,
    "q379_contam_attrib" -> q379Sql,
    "q380_embedding_isotropy" -> q380Sql,
    "q381_top_component" -> q381Sql,
    "q382_kmeans_silhouette" -> q382Sql,
    "q383_unimax" -> q383Sql,
    "q384_packing_audit" -> q384Sql,
    "q385_filter_overlap" -> q385Sql,
    "q386_ipf_raking" -> q386Sql,
    "q387_weighted_jaccard" -> q387Sql,
    "q388_continuation" -> q388Sql,
    "q389_dup_source_matrix" -> q389Sql,
    "q390_length_debiased" -> q390Sql,
    "q391_coverage_spectrum" -> q391Sql,
    "q392_token_dispersion" -> q392Sql,
    "q393_parked_domains" -> q393Sql)
}
