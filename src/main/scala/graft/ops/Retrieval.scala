package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranked full-text retrieval: Okapi BM25 over the corpus — the query
  * side of the inverted index a data pipeline builds for curation work
  * (finding near-matches of eval prompts, auditing what the corpus says
  * about a topic, retrieval-augmented labeling).
  *
  * Spark-first shape: the postings build is one shuffle (tf grouped by
  * (doc, term)); document frequencies and the query-term table are small
  * relations the planner broadcasts, so scoring is a scan over the
  * postings of the query terms only — never over the whole corpus — and
  * the per-query top-k is a bounded window. At 100 TB the postings table
  * is the thing you materialize (partitioned by term-hash); the scoring
  * joins and the window are unchanged.
  *
  * Float contract: idf uses `ln`, which has cross-libm freedom, so
  * scores are rounded to 6 d.p. and the rank ORDERS BY the rounded score
  * with the doc id as a total-order tiebreak — rank stability does not
  * depend on sub-rounding float noise (same discipline as q64's tf-idf).
  */
object Retrieval {

  /** Postings list: one row per (doc, term) with term frequency and the
    * document length (in tokens, by the house whitespace tokenizer).
    */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.words(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tf.join(dl, "doc_id")
  }

  /** BM25 top-k per query. `queries` is a small literal set of
    * (query_id, text); duplicate query terms are collapsed (each distinct
    * term scores once). Returns (query_id, doc_id, score, rk), rk ≤ k.
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, String)], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // postings feed three consumers (df counts, avgdl, scoring) — one
    // materialization instead of three tokenize+aggregate passes over
    // the corpus; at scale this is the durable postings table itself
    val post = postings(docs, textCol, idCol).localCheckpoint()
    // bounded scalars: corpus size and total token count are single
    // aggregates (avgdl derived as exact-integer sum / count, so both
    // engines divide the identical numerator)
    val nDocs = docs.count()
    val totTokens = post.agg(sum("tf")).first().getLong(0)
    val avgdl = totTokens.toDouble / nDocs
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val qterms = broadcast(queries.toDF("query_id", "qtext")
      .select(col("query_id"), explode(TextOps.words(col("qtext"))).as("term"))
      .distinct())
    val scored = post
      .join(qterms, "term") // broadcast: postings pruned to query terms
      .join(broadcast(dfreq), "term")
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("w",
        col("tf") * (lit(k1) + 1) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("idf") * col("w")), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Exact phrase search over positional postings: doc d matches phrase
    * t₀ t₁ … tₙ₋₁ at start s iff term tᵢ occurs at position s+i for all
    * i. The classic positional-index evaluation, join-shaped: every
    * token joins the (broadcast) phrase-term table, each hit votes for
    * its implied start `pos − i`, and a start with all `len` distinct
    * offsets present is an occurrence (repeated phrase terms are
    * handled — the vote is per-offset, not per-term). Returns
    * (query_id, doc_id, n_hits), docs with ≥ 1 occurrence only.
    *
    * One shuffle (the vote groupBy); the token stream is pruned to
    * phrase terms at the broadcast join, so cost scales with the
    * postings of the queried terms, not the corpus — the same pruning
    * shape as [[bm25TopK]]. All-integer arithmetic.
    */
  def phraseSearch(docs: DataFrame, textCol: String, idCol: String,
      phrases: Seq[(Int, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = broadcast(phrases.flatMap { case (qid, p) =>
      val ts = p.toLowerCase.split(" ").toSeq
      ts.zipWithIndex.map { case (t, i) => (qid, i.toLong, t, ts.length.toLong) }
    }.toDF("query_id", "i", "term", "len"))
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(TextOps.words(col(textCol))).as(Seq("pos", "term")))
    tok.join(qt, "term")
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("i")).as("start"), col("len"))
      .agg(countDistinct("i").as("n_off"))
      .where(col("n_off") === col("len"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Index-accelerated substring search: a character-trigram posting
    * list pre-filters candidate documents (a doc can contain `pattern`
    * only if it contains EVERY trigram of the pattern), then an exact
    * `contains` verify keeps the result identical to a full LIKE scan —
    * which is precisely what the oracle runs. Returns (query_id,
    * doc_id) for every document containing the pattern; patterns must
    * be ≥ 3 characters (shorter has no trigram to prune with).
    *
    * Scale: the full scan happens ONCE to build the posting table (at
    * 100 TB this is the materialized artifact, term-hash-partitioned
    * like the BM25 postings); each query then touches only the postings
    * of its own trigrams (broadcast join) and verifies only docs whose
    * trigram-match count equals the pattern's trigram count — the
    * candidate set of a selective pattern is tiny while a LIKE scan
    * would read everything, every time.
    */
  def trigramSearch(docs: DataFrame, textCol: String, idCol: String,
      patterns: Seq[(Int, String)]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_._2.length >= 3),
      "patterns must be at least 3 characters")
    val spark = docs.sparkSession
    import spark.implicits._
    // project the lowered text to an attribute first — the lambda body
    // below references it per element, and Catalyst does not CSE inside
    // lambdas (TextOps.shinglesFromWords's lesson)
    val lowered = docs.select(col(idCol).as("doc_id"),
      lower(col(textCol)).as("t"))
    // the query trigram universe is a small LITERAL set — intersect each
    // document's trigram array with it IN-ROW before exploding, so the
    // posting join sees only potentially-matching rows instead of every
    // trigram of every document (round-15: the explode previously emitted
    // the full corpus trigram multiset into the join, ~2000 rows/doc, for
    // a few dozen query trigrams). Candidates are identical: a trigram
    // outside the query set could never join `qt`.
    val allQueryTris = patterns.flatMap { case (_, p) =>
      val lp = p.toLowerCase
      (0 to lp.length - 3).map(i => lp.substring(i, i + 3))
    }.distinct
    val postings = lowered
      .select(col("doc_id"), explode(array_intersect(
        array_distinct(
          when(length(col("t")) >= 3,
            transform(sequence(lit(0), length(col("t")) - 3),
              i => col("t").substr(i + 1, lit(3))))
            .otherwise(array().cast("array<string>"))),
        typedLit(allQueryTris))).as("tri"))
    val qt = broadcast(patterns.flatMap { case (qid, p) =>
      val lp = p.toLowerCase
      val tris = (0 to lp.length - 3).map(i => lp.substring(i, i + 3)).distinct
      tris.map(t => (qid, t, tris.size.toLong))
    }.toDF("query_id", "tri", "n_tri"))
    val candidates = postings.join(qt, "tri")
      .groupBy("query_id", "doc_id", "n_tri")
      .agg(countDistinct("tri").as("n_hit"))
      .where(col("n_hit") === col("n_tri"))
      .select("query_id", "doc_id")
    val pat = broadcast(patterns.toDF("query_id", "p")
      .select(col("query_id"), lower(col("p")).as("p")))
    candidates.join(lowered, "doc_id").join(pat, "query_id")
      .where(col("t").contains(col("p")))
      .select("query_id", "doc_id")
  }

  /** Reciprocal-rank fusion of a lexical and a semantic ranking — the
    * standard hybrid-search combiner (`score = Σ 1/(kRrf + rank)`,
    * kRrf = 60 per the original RRF paper's constant): each input is a
    * per-query ranked list (query_id, doc_id, rk); a document missing
    * from one list simply contributes nothing from it. Returns the
    * fused top-`k` per query with both source ranks preserved
    * (null = unranked there) and `rrf_rk` assigned on the rounded score
    * with doc-id tiebreak.
    *
    * Fusion consumes only RANKS — already deterministic integers in
    * both inputs — so the fused score is a two-term fixed expression,
    * bit-identical on any engine; no float accumulation exists to
    * diverge. One full-outer join on (query, doc) — both sides are
    * top-k-bounded, so this is queries·k-sized regardless of corpus
    * scale — plus one bounded window.
    */
  def hybridRrf(lexical: DataFrame, semantic: DataFrame,
      kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(kRrf >= 1 && k >= 1)
    val l = lexical.select(col("query_id"), col("doc_id"),
      col("rk").as("rk_lex"))
    val s = semantic.select(col("query_id"), col("doc_id"),
      col("rk").as("rk_sem"))
    val fused = l.join(s, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("rk_lex"), col("rk_sem"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rk_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("rk_sem")), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rrf_rk", row_number().over(w).cast("long"))
      .filter(col("rrf_rk") <= k)
  }
}
