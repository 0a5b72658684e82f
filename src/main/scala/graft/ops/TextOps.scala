package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * shingling, language ID, quality scoring, token counting, content
  * fingerprinting. All pure `Column` expressions / narrow projections —
  * no UDFs, no shuffles; they scale linearly with the scan.
  */
object TextOps {

  /** Lowercased single-space word tokens. */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles from an already-materialized words
    * ARRAY column. Callers must pass an attribute (a projected column),
    * not the `words(text)` expression inline: Catalyst does not CSE
    * inside lambda bodies, so an inline split is re-evaluated for every
    * lambda reference — measured 15 s for a 5000-document 13-gram
    * explode, vs sub-second from an attribute. `slice` + `concat_ws`
    * keeps the per-element references to the array at two.
    */
  def shinglesFromWords(w: Column, n: Int): Column =
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + 1, lit(n)))))
        .otherwise(array()))

  /** Distinct word n-gram shingles of `text` as an array column — for
    * one-shot Column use; row producers project `words` first and use
    * [[shinglesFromWords]] (see its CSE note).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromWords(words(text), n)

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un", "en"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ein", "ist", "zu"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est", "que"))

  private def profileRegex(ws: Seq[String]) = "\\b(" + ws.mkString("|") + ")\\b"

  /** Per-language stopword-hit score columns, name → expression. */
  def langScores(text: Column): Seq[(String, Column)] =
    langProfiles.toSeq.sortBy(_._1).map { case (lang, ws) =>
      s"score_$lang" -> regexp_count(lower(text), lit(profileRegex(ws))).cast("long")
    }

  /** Predicted language: argmax score with lexicographic tiebreak; all-zero
    * scores → "und" (undetermined). Deterministic by construction.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    // flat greatest + first-match pick, NOT a pairwise max fold: the fold
    // nests each running best inside the next comparison, so every score's
    // regexp_count reappears O(2^langs) times in the final tree — and a
    // query that then references the lang column in a filter (q67) doubles
    // it again after projection collapse (measured 18 s for 50k docs at
    // sf1; this shape is ~8×). Semantics identical: alphabetical-first
    // tiebreak (the when chain walks the name-sorted scores), all-zero →
    // "und" — exactly what the oracle CASE re-derives.
    val best = greatest(scores.map(_._2): _*)
    val pick = scores.foldLeft(Option.empty[Column]) {
      case (acc, (name, s)) =>
        val lang = name.stripPrefix("score_")
        Some(acc.map(_.when(s === best, lang)).getOrElse(when(s === best, lang)))
    }.get
    when(best > 0, pick).otherwise(lit("und"))
  }

  /** Quality metrics: exact integer counts + single-division ratios, so
    * results are bit-deterministic across engines.
    */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val t = lower(text)
    val nChars = length(t).cast("long")
    val nWords = size(words(text)).cast("long")
    val nAlpha = length(regexp_replace(t, "[^a-z]", "")).cast("long")
    val nPunct = length(regexp_replace(t, "[a-z0-9 ]", "")).cast("long")
    val nStop = regexp_count(t, lit(profileRegex(langProfiles("en")))).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "alpha_ratio" -> nAlpha / nChars.cast("double"),
      "punct_ratio" -> nPunct / nChars.cast("double"),
      "stopword_ratio" -> nStop / nWords.cast("double"),
      "avg_word_len" -> (nChars - (nWords - 1)) / nWords.cast("double"))
  }

  /** C4-style corpus cleaning: keep documents passing the whole rule
    * set — word-count band, stopword floor (prose has stopwords;
    * keyword-stuffed spam does not), alphabetic floor (drops
    * markup/table debris), and optionally a predicted language. A narrow
    * filter over the scan: at corpus scale this is the FIRST stage of a
    * training-data pipeline, upstream of dedup, so nothing here
    * shuffles.
    */
  def qualityFilter(df: DataFrame, textCol: String,
      minWords: Long = 30, maxWords: Long = 120,
      minStopwordRatio: Double = 0.08, minAlphaRatio: Double = 0.5,
      lang: Option[String] = None): DataFrame = {
    val m = qualityMetrics(col(textCol)).toMap
    val base = df.where(
      m("n_words").between(minWords, maxWords) &&
        m("stopword_ratio") >= minStopwordRatio &&
        m("alpha_ratio") >= minAlphaRatio)
    lang.fold(base)(l => base.where(langId(col(textCol)) === l))
  }

  /** Corpus heavy hitters via Spark's native `approx_top_k` sketch
    * (DataSketches frequent-items): the 100 TB-shape answer to "what
    * are the most common tokens" — the sketch merges map-side, so the
    * exchange carries one bounded sketch per partition instead of the
    * token histogram, and NO token-keyed shuffle happens at all.
    * `sketchK`/`maxTracked` are sized ABOVE the tracked-vocabulary
    * bound, where the sketch is exact (the regime the oracle checks);
    * at an unbounded true-scale vocabulary the same plan returns
    * counts within the sketch's documented error — callers pick
    * `maxTracked` for their accuracy budget. The final deterministic
    * (count desc, token) re-rank runs over ≤ `sketchK` rows — a
    * bounded single-partition sort, like the vocabulary ranking.
    */
  def heavyHitters(df: DataFrame, textCol: String, topK: Int,
      sketchK: Int = 64, maxTracked: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(words(col(textCol))).as("token"))
      .agg(expr(s"approx_top_k(token, $sketchK, $maxTracked)").as("_tk"))
      .select(explode(col("_tk")).as("_e"))
      .select(col("_e.item").as("token"), col("_e.count").as("n"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .where(col("rank") <= topK)
  }

  /** Deterministic hashed-token weight table for [[linearQualityModel]]:
    * 64 weights in [-1, 1], a closed-form lattice so engine and oracle
    * share it as literals (a trained model would broadcast its real
    * table; identical plan, different constants).
    */
  val defaultTokenWeights: Seq[Double] =
    (0 until 64).map(i => (((i * 37) % 21) - 10) / 10.0)

  /** Mean hashed-token weight of a words ARRAY attribute (project it
    * first — the no-CSE-inside-lambdas rule): fastText's averaged
    * token-embedding layer with a 1-d embedding. md5-bucket hashing is
    * the same lattice as [[Sampling.hashBucket64k]], so the bucket of a
    * token is partitioning- and engine-independent.
    */
  def hashedTokenScore(w: Column,
      weights: Seq[Double] = defaultTokenWeights): Column = {
    val arr = array(weights.map(lit): _*)
    val n = weights.size
    aggregate(w, lit(0.0), (acc, t) =>
      acc + element_at(arr,
        (graft.functions.HashExpressions.md5Prefix64(t, 4).cast("int") % n) + 1)) / size(w)
  }

  /** fastText-style linear quality classifier, scored in-plan: z =
    * bias + w·(alpha_ratio, stopword_ratio, punct_ratio, n_words/100)
    * + mean hashed-token weight; emits sigmoid(z) rounded to 6 d.p.
    * (cross-engine float hygiene) and the exact decision z > 0. One
    * narrow projection — model scoring at corpus scale is a scan, not
    * a shuffle; the addition ORDER below is the cross-engine contract
    * (IEEE doubles make same-order sums bit-identical).
    */
  def linearQualityModel(df: DataFrame, textCol: String, idCol: String,
      bias: Double = -1.0, wAlpha: Double = 2.0, wStop: Double = 3.0,
      wPunct: Double = -4.0, wLen: Double = 0.5): DataFrame = {
    val m = qualityMetrics(col(textCol)).toMap
    val z = col("_tok") +
      (lit(bias) + lit(wAlpha) * col("_alpha") + lit(wStop) * col("_stop") +
        lit(wPunct) * col("_punct") + lit(wLen) * (col("_nw") / 100.0))
    df.select(col(idCol), words(col(textCol)).as("_w"),
        m("alpha_ratio").as("_alpha"), m("stopword_ratio").as("_stop"),
        m("punct_ratio").as("_punct"), m("n_words").as("_nw"))
      .select(col(idCol), hashedTokenScore(col("_w")).as("_tok"),
        col("_alpha"), col("_stop"), col("_punct"), col("_nw"))
      .select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"),
        (z > 0).as("keep"))
  }

  /** Vocabulary build: tokens with total count ≥ `minCount`, ranked by
    * (count desc, token) into contiguous ids, truncated to `topK`. The
    * global ranking window runs over the AGGREGATED vocabulary (≤
    * distinct-token cardinality, already reduced by the map-side
    * partial count) — never over the corpus, so the single-partition
    * sort it implies is bounded by vocabulary size, not data size.
    */
  def vocabulary(df: DataFrame, textCol: String,
      minCount: Long = 5, topK: Int = 1000): DataFrame =
    df.select(explode(words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .withColumn("token_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))).cast("long") - 1)
      .where(col("token_id") < topK)

  /** Top-`topK` TF-IDF terms per document: tf = in-document count,
    * idf = ln(N / df) over raw document frequency, score rounded to 4
    * d.p. for cross-engine rank stability. Two aggregations (per-doc
    * term counts; per-term document frequency — derived from the first,
    * so the corpus is tokenized once) plus a per-document rank window;
    * the document count joins in as a broadcast scalar, not an action.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
      topK: Int = 5): DataFrame = {
    val tf = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("doc_freq"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq")), 4))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= topK)
      .select(col("id"), col("token"), col("tf"), col("tfidf"), col("rk"))
  }

  /** Encode documents against a [[vocabulary]] table: one row per
    * document with its ordered `token_ids` array, out-of-vocabulary
    * tokens as -1. The join is on the token string and the optimizer
    * broadcasts the vocabulary when it is small (topK-bounded — the
    * usual case); order is restored by position after the join, so the
    * result is independent of partitioning.
    */
  def tokenizeToIds(df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), posexplode(words(col(textCol))))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "token")
      .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .withColumn("tid", coalesce(col("token_id"), lit(-1L)))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("tid")))),
        s => s.getField("tid")).as("token_ids"))

  /** Unigram log-probability scoring — the language-model quality proxy
    * of the CCNet recipe (they use a 5-gram KenLM; the unigram model is
    * the engine-portable member of the family): score every document by
    * the mean log-probability of its tokens under the corpus's own
    * unigram distribution. Gibberish and boilerplate-free word salads
    * sit far from the head of the distribution and score low; fluent
    * text scores high. Returns (id, logprob, n_words), logprob rounded
    * to 6 d.p. — the per-document mean sums doubles in
    * partitioning-dependent order, and 6 d.p. is far above the ~1e-14
    * reassociation noise while far below any meaningful signal.
    *
    * Plan: one explode → vocab-count aggregate (partial, vocab-sized
    * result), one token→count join (vocab ≪ corpus; the optimizer
    * broadcasts when it fits), a broadcast 1-row total, one per-doc
    * aggregate — two data-sized shuffles total, the floor for any
    * corpus-conditioned per-document score.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = df.select(col(idCol).as("id"),
      explode(words(col(textCol))).as("word"))
    val counts = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    w.join(counts, Seq("word"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(round(avg(log(col("c") / col("n"))), 6).as("logprob"),
        count(lit(1)).as("n_words"))
  }

  /** Interpolated bigram log-probability — one rung up the CCNet LM
    * ladder from [[unigramLogProb]]: every adjacent token pair scored by
    * `λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N`, the Jelinek-Mercer interpolation
    * that keeps the model well-defined for bigrams rare in (or, in
    * cross-corpus use, absent from) the training counts. Trained on the
    * scoring corpus itself, as CCNet trains on its reference corpus.
    * Returns (id, logprob2, n_bigrams); single-token documents have no
    * bigrams and are absent by construction.
    *
    * Plan: positional explode + one per-doc `lead` window builds the
    * pair stream (one exchange on the doc id — an in-row `zip_with`
    * pairing would re-evaluate per element interpreted, the q74 HOF
    * lesson); bigram/unigram count tables join back vocab-sized, the
    * token total broadcasts as one row; final per-doc aggregate. Three
    * data-sized shuffles — explode, pair window, doc aggregate.
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(idCol).as("id"),
      posexplode(words(col(textCol))).as(Seq("pos", "w1")))
    val bg = t
      .withColumn("w2",
        lead("w1", 1).over(Window.partitionBy("id").orderBy("pos")))
      .where(col("w2").isNotNull)
    val uc = df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
    val total = uc.agg(sum(col("c")).as("n"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bg.join(bc, Seq("w1", "w2"))
      .join(uc.select(col("word").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uc.select(col("word").as("w2"), col("c").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(round(avg(log(
        lit(lambda) * col("c2") / col("c1") +
          (lit(1.0) - lit(lambda)) * col("cu2") / col("n"))), 6)
        .as("logprob2"),
        count(lit(1)).as("n_bigrams"))
  }

  /** BPE merge learning (Sennrich et al. 2016) — the tokenizer-TRAINING
    * step of an LLM data pipeline, distributed: start from characters,
    * and each round (1) count adjacent token pairs over the
    * frequency-weighted vocabulary, (2) pick the most frequent pair
    * (ties: lexicographically smallest), (3) merge it everywhere.
    * Returns the learned merge table `(round, t1, t2, cnt)` — the model
    * artifact a BPE tokenizer ships.
    *
    * Corpus contract: lowercase alphabetic words ≤ 20 chars (regex
    * metacharacter- and fixpoint-safety); merges apply WITHIN words.
    *
    * Merge application is ITERATED global `regexp_replace` of the
    * space-separated sequence (`" t1 t2 " → " t1t2 "`, 12 passes): one
    * global pass is leftmost-non-overlapping, which misses matches that
    * share a boundary space, and the extra passes catch exactly those —
    * runs resolve in ≤ 2-3 passes, 12 is a proven bound for ≤ 20-char
    * words. The same iterate runs in the SQL oracle, so both engines
    * produce byte-identical sequences between rounds. Everything heavy
    * is VOCABULARY-sized (distinct words × frequency), never
    * corpus-sized; the per-round argmax is a bounded driver scalar —
    * the learned merge is a model parameter, exactly what a production
    * trainer checkpoints.
    */
  def bpeMerges(df: DataFrame, textCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16]")
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df.select(explode(words(col(textCol))).as("w"))
      .where(col("w").rlike("^[a-z]{1,20}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var seqs = vocab.select(col("freq"),
      concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")).as("seq"))
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val toks = seqs.select(col("freq"),
        split(trim(col("seq")), " ").as("ts"))
      val pairs = toks
        .select(col("freq"), posexplode(col("ts")).as(Seq("i", "t1")),
          col("ts"))
        .where(col("i") < size(col("ts")) - 1)
        .select(col("freq"), col("t1"),
          element_at(col("ts"), col("i") + 2).as("t2"))
        .groupBy("t1", "t2").agg(sum("freq").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("t1"), col("t2"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (t1, t2, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r, t1, t2, cnt))
        val merged = (1 to 12).foldLeft(col("seq")) { (c, _) =>
          regexp_replace(c, s" ${java.util.regex.Pattern.quote(t1)}" +
            s" ${java.util.regex.Pattern.quote(t2)} ", s" $t1$t2 ")
        }
        seqs = seqs.select(col("freq"), merged.as("seq"))
          .localCheckpoint(true)
      }
    }
    learned.result()
      .toDF("round", "t1", "t2", "cnt")
      .select(col("round").cast("long"), col("t1"), col("t2"), col("cnt"))
  }

  /** BPE ENCODE — the inference half of [[bpeMerges]], and the half a
    * training pipeline actually runs at corpus scale: apply a learned
    * merge table to tokenize text into ids. Greedy application in MERGE
    * ORDER (the Sennrich convention — each learned merge is replayed
    * everywhere before the next, with the same 12-pass iterated
    * `regexp_replace` the trainer used, so encode states are
    * byte-identical to training states and decode(encode(w)) = w by
    * construction).
    *
    * Token ids are a MODEL artifact, not data: base characters `a..z`
    * own ids 0–25 (the corpus contract is `^[a-z]{1,20}$` words), the
    * round-r merge product owns id 25+r (first round wins if two rounds
    * ever produce the same string). Returns one row per (doc, word
    * position, token position): `(id, wpos, tpos, token, token_id)`.
    *
    * Scale shape: the expensive merge replay runs over DISTINCT words —
    * vocabulary-sized, never corpus-sized — and joins back to word
    * occurrences by word (broadcast: a vocabulary fits by definition of
    * being a vocabulary). The merge table itself is collected driver-side
    * deliberately: ≤ 16 rows of model parameters, the [[bpeMerges]]
    * checkpoint being consumed.
    */
  def bpeEncode(df: DataFrame, textCol: String, idCol: String,
      merges: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = merges.select(col("round").cast("long"), col("t1"), col("t2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    require(m.nonEmpty && m.length <= 16, "merge table must hold 1..16 rounds")
    val toks = df.select(col(idCol).as("id"),
        posexplode(words(col(textCol))).as(Seq("wpos", "w")))
      .where(col("w").rlike("^[a-z]{1,20}$"))
    val wv = toks.select("w").distinct()
    val seq0 = concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
    val seqN = m.foldLeft(seq0) { case (c, (_, t1, t2)) =>
      (1 to 12).foldLeft(c) { (cc, _) =>
        regexp_replace(cc, s" ${java.util.regex.Pattern.quote(t1)}" +
          s" ${java.util.regex.Pattern.quote(t2)} ", s" $t1$t2 ")
      }
    }
    // round-r product → id 25+r; duplicates keep the FIRST round's id
    val prod = m.map { case (r, t1, t2) => (t1 + t2, 25L + r) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).min) }
      .toSeq.toDF("token", "merge_id")
    val encoded = wv
      .select(col("w"), posexplode(split(trim(seqN), " ")).as(Seq("tp", "token")))
      .join(broadcast(prod), Seq("token"), "left")
      .select(col("w"), (col("tp") + 1).cast("long").as("tpos"), col("token"),
        coalesce(col("merge_id"), (ascii(col("token")) - 97).cast("long"))
          .as("token_id"))
    toks.join(broadcast(encoded), "w")
      .select(col("id").as(idCol), (col("wpos") + 1).cast("long").as("wpos"),
        col("tpos"), col("token"), col("token_id"))
  }

  /** Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the score Google built
    * for exactly this corpus-scale setting): score documents against an
    * n-gram model trained on a DIFFERENT partition of the corpus, with
    * the trigram estimate backing off multiplicatively instead of
    * discounting — `S(w₃|w₁w₂) = c₃/c₂` when the trigram was seen, else
    * `0.4·c₂(w₂w₃)/c₁(w₂)`, else `0.4²·c₁(w₃)/N`, else the OOV floor
    * `0.4³/N`. No normalization pass, no smoothing hyper-parameters to
    * fit — which is why it's the standard cheap quality/perplexity
    * proxy for train-data filtering at scale (unlike [[bigramLogProb]]'s
    * Jelinek-Mercer, which scores the corpus against itself and never
    * exercises unseen-n-gram paths).
    *
    * Returns per scored doc: `(id, score6, n_tri, n_bi, n_uni, n_oov)` —
    * mean log-score rounded to 6 d.p. (the mean round absorbs summation
    * order, q113 discipline) plus how many positions resolved at each
    * backoff level. The level counts are exact integers, so a single
    * mis-joined count table breaks the hash even where the float mean
    * would forgive it.
    *
    * Scale shape: token streams explode linearly with the successor
    * grams read straight off the token array (no per-doc sort — the
    * array index IS the order); count tables aggregate map-side; the
    * score join shuffles on n-gram keys — never a cross join; the two
    * scalar totals broadcast. Count tables are train-corpus-sized (the
    * model), exactly what a production backoff LM materializes.
    */
  def stupidBackoffScore(train: DataFrame, scored: DataFrame,
      textCol: String, idCol: String, alpha: Double = 0.4): DataFrame = {
    // Round-16 diet (guide §2.4 — remove shuffles outright): the n-gram
    // successors w2/w3 are ARRAY lookups (`_w[i+1]`, `_w[i+2]`), not
    // `lead` windows — the window form paid a full hash(id) exchange +
    // per-doc sort per plan reference, and the train side was referenced
    // by all three count tables (measured: 3 window passes over train,
    // +1 via `total`, +1 on the scored side — 5 exchanges+sorts for a
    // computation whose order is already given by the array index).
    // `get()` (0-based, null past the end) reproduces lead's null
    // semantics exactly; the struct is built INSIDE the transform so an
    // exploded row carries 3 tokens, never the whole token array.
    // The compact (id, token-array) repartition kept in `grams` does
    // two jobs the old window exchange did by accident: (1) it is the
    // canonical subtree Spark's exchange/stage reuse dedups, so the
    // train regex-tokenize runs ONCE under c1/c2/c3 instead of once per
    // count table (dropping the window naively re-tokenized ×3: sf1
    // 2.0 → 4.3 s), and (2) it SPREADS the explode off the 1-task scan
    // (the q391 narrow-scan disease — the scored side keeps it for
    // exactly that reason despite having a single consumer). Two
    // alternatives measured and REJECTED: a lazy localCheckpoint of the
    // gram stream (persists a DATA-SIZED frame, 4.4 s at sf1), and
    // exchanging the EXPLODED gram rows instead of the arrays (3× the
    // shuffle bytes, 6.1 s at sf1). Net: old topology minus the per-doc
    // SORTS and Window operators — control-adjusted parity at sf0.1,
    // modest win at sf1, and the per-doc sort is gone at any scale.
    def grams(df: DataFrame) =
      df.select(col(idCol).as("id"), words(col(textCol)).as("_w"))
        .repartition(col("id")) // reuse point + spread, see above
        .select(col("id"), explode(transform(col("_w"), (x, i) =>
          struct(x.as("w1"),
            get(col("_w"), i + 1).as("w2"),
            get(col("_w"), i + 2).as("w3")))).as("t"))
        .select(col("id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
          col("t.w3").as("w3"))
    // training model: unigram / bigram / trigram count tables + N
    val t = grams(train)
    val c1 = t.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c1"))
    val c2 = t.where(col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c3 = t.where(col("w3").isNotNull)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val total = c1.agg(sum(col("c1")).as("n"))
    // scored trigram positions, resolved longest-match-first
    val s = grams(scored)
      .where(col("w3").isNotNull)
    val a = lit(alpha)
    s.join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2.select(col("w1"), col("w2"), col("c2").as("c2p")),
        Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("_b1"), col("w2").as("_b2"),
        col("c2").as("c2b")),
        col("w2") === col("_b1") && col("w3") === col("_b2"), "left")
      .join(c1.select(col("w").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .join(c1.select(col("w").as("w3"), col("c1").as("c1w3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(total))
      // a trigram seen in training implies its prefix bigram was too, so
      // level "tri" needs no c2p null-guard beyond the c3 one
      .withColumn("lvl",
        when(col("c3").isNotNull, lit("tri"))
          .when(col("c2b").isNotNull, lit("bi"))
          .when(col("c1w3").isNotNull, lit("uni"))
          .otherwise(lit("oov")))
      .withColumn("score",
        when(col("lvl") === "tri", col("c3") / col("c2p"))
          .when(col("lvl") === "bi", a * col("c2b") / col("c1w2"))
          .when(col("lvl") === "uni", a * a * col("c1w3") / col("n"))
          .otherwise(a * a * a / col("n")))
      .groupBy("id")
      .agg(round(avg(log(col("score"))), 6).as("score6"),
        count(when(col("lvl") === "tri", 1)).as("n_tri"),
        count(when(col("lvl") === "bi", 1)).as("n_bi"),
        count(when(col("lvl") === "uni", 1)).as("n_uni"),
        count(when(col("lvl") === "oov", 1)).as("n_oov"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): score every document against a reference LM trained on a
    * DIFFERENT corpus partition ([[stupidBackoffScore]] — the cheap
    * at-scale perplexity proxy), then split each language into
    * head / middle / tail TERCILES of fluency — the standard knob for
    * "train on head+middle, drop tail" corpus curation. Returns one
    * row per (group, bucket): doc count, the exact min/max of the
    * 6-d.p. scores landing in the bucket (order statistics — no float
    * accumulation), and the exact OOV-position total.
    *
    * Determinism: score6 is identical across engines (q187's gate),
    * and the tercile order pins ties by id — so bucket membership is
    * exactly reproducible. Scale: the ntile needs a per-group sort of
    * the DOC-COUNT-sized score frame (never data-sized — text stays
    * out of it); at 10⁹ docs a range-partitioned sort handles it, or
    * swap the ntile for approx-quantile thresholds when exactness at
    * the boundary stops mattering.
    */
  def perplexityBuckets(train: DataFrame, scored: DataFrame,
      textCol: String, idCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = stupidBackoffScore(train, scored, textCol, idCol)
      .select(col("id"), col("score6"), col("n_oov"))
    val meta = scored.select(col(idCol).as("id"), col(groupCol).as("grp"))
    val byFluency = Window.partitionBy("grp")
      .orderBy(col("score6").desc, col("id"))
    sc.join(meta, "id")
      .withColumn("t", ntile(3).over(byFluency))
      .withColumn("bucket",
        when(col("t") === 1, "head")
          .when(col("t") === 2, "middle").otherwise("tail"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("score6").as("min_score6"),
        max("score6").as("max_score6"),
        sum("n_oov").as("n_oov"))
  }

  /** Context-length tuning report — the "what sequence length do we
    * train at?" decision table: for every candidate `max_len`, exact
    * token accounting under truncate-at-L packing — how many documents
    * truncate, what fraction of corpus tokens survives, and the
    * minimum sequence count `⌈kept/L⌉` a perfect packer needs (the
    * lower bound [[packSequences]]-style greedy packing is judged
    * against). All integers: ppm is truncating, the bound is exact
    * ceiling division.
    *
    * Scale: ONE narrow projection (token count per doc) crossed with
    * the bounded length lattice — docs·|lattice| rows into a map-side
    * combinable aggregate of |lattice| groups. Text never shuffles.
    */
  def contextLengthReport(df: DataFrame, textCol: String, idCol: String,
      lengths: Seq[Int] = Seq(128, 256, 512, 1024, 2048)): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ >= 1))
    val spark = df.sparkSession
    import spark.implicits._
    val ls = lengths.distinct.sorted.map(_.toLong).toDF("max_len")
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(wsTokenCount(col(textCol)).as("n_tok"))
      .crossJoin(broadcast(ls))
      .groupBy("max_len")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum(least(col("n_tok"), col("max_len"))).as("n_kept"),
        count(when(col("n_tok") > col("max_len"), 1)).as("n_truncated"))
      .select(col("max_len"), col("n_docs"), col("n_tokens"),
        col("n_kept"), col("n_truncated"),
        when(col("n_tokens") > 0,
          expr("(1000000 * n_kept) div n_tokens")).as("kept_ppm"),
        expr("(n_kept + max_len - 1) div max_len").as("min_seqs"))
  }

  /** C4-style blocklist filtering ("List of Dirty, Naughty …" in the
    * original; any term list here) as a broadcast TOKEN JOIN — the
    * at-scale shape. A 10k-term list as one alternation regex is a
    * catastrophic scan (the regex NFA walks every term at every
    * position); exploding to words and hash-joining the broadcast
    * list is linear in tokens and indifferent to list size. Returns
    * every document with its exact hit accounting: `(id, n_hits,
    * n_terms, kept)` — kept ⟺ zero hits (C4 drops on ANY hit; callers
    * wanting a threshold filter on n_hits).
    *
    * Scale: one narrow explode, one broadcast join, one doc-keyed
    * map-side-combinable fold; the all-docs left join restores
    * hit-free documents. Nothing list-sized ever shuffles.
    */
  def blocklistFilter(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    val bl = terms.map(_.toLowerCase).distinct.toDF("term")
    val base = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val hits = base
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .join(broadcast(bl), col("w") === col("term"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"), countDistinct("w").as("n_terms"))
    base.select(col(idCol).as("id")).join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        (coalesce(col("n_hits"), lit(0L)) === 0).as("kept"))
  }

  /** Pointwise mutual information over co-occurring word pairs — the
    * collocation detector ("new york", "machine learning") every
    * corpus-analysis pass wants: `pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )`
    * with `p(a,b)` estimated from unordered co-occurrence events within
    * `window` tokens and `p(·)` from the unigram stream. Returns one row
    * per unordered pair seen at least `minPairCount` times:
    * `(a, b, c_pair, pmi)` with `a <= b` and pmi rounded to 6 d.p.
    *
    * Float reproducibility: the score is computed from five exact
    * integers (pair count, two unigram counts, pair total, token total)
    * through one fixed left-associated expression
    * `ln((c_pair·N·N) / (P·c_a·c_b))` — no accumulated float state, so
    * any engine reproduces it bit-for-bit before the cosmetic round.
    *
    * Plan: positional explode + `window` `lead`s sharing ONE per-doc
    * sort builds the pair-event stream (linear in tokens — never the
    * all-pairs token join); pair/unigram count tables are vocab-sized;
    * the two scalar totals broadcast as single rows. The `minPairCount`
    * floor is applied after the pair aggregate (map-side combined), so
    * the surviving join is collocation-table-sized, not stream-sized.
    */
  def pmiPairs(df: DataFrame, textCol: String, idCol: String,
      window: Int = 2, minPairCount: Long = 5): DataFrame = {
    require(window >= 1, "window must be >= 1")
    import org.apache.spark.sql.expressions.{Window => W}
    val byDoc = W.partitionBy("id").orderBy("pos")
    val toks = df.select(col(idCol).as("id"),
      posexplode(words(col(textCol))).as(Seq("pos", "w")))
    val withLeads = toks.select(col("w") +:
      (1 to window).map(k => lead("w", k).over(byDoc).as(s"_l$k")): _*)
    val pairEvents = (1 to window).map { k =>
      withLeads.where(col(s"_l$k").isNotNull)
        .select(least(col("w"), col(s"_l$k")).as("a"),
          greatest(col("w"), col(s"_l$k")).as("b"))
    }.reduce(_ unionAll _)
    // the pair-count table feeds BOTH the scalar pair total and the
    // collocation rows — materialize the (vocab²-bounded, in practice
    // collocation-sized) aggregate once instead of re-running the
    // explode + window subtree per consumer (the q104-postings lesson)
    val pcAll = pairEvents.groupBy("a", "b").agg(count(lit(1)).as("c_pair"))
      .localCheckpoint()
    val pc = pcAll.where(col("c_pair") >= minPairCount)
    val uc = df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .localCheckpoint() // three consumers: the token total + two joins
    val totals = broadcast(
      uc.agg(sum(col("c")).cast("double").as("n"))
        .crossJoin(pcAll.agg(sum(col("c_pair")).cast("double").as("p"))))
    pc
      .join(uc.select(col("word").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uc.select(col("word").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(totals)
      .select(col("a"), col("b"), col("c_pair"),
        round(log(col("c_pair").cast("double") * col("n") * col("n") /
          (col("p") * col("c_a") * col("c_b"))), 6).as("pmi"))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(words(text)).cast("long")

  /** BPE-ish token count: letter runs, single digits, single punctuation. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]")).cast("long")

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text.
    * The grouping key for exact near-layout dedup.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Winnowing fingerprints (the MOSS scheme): hash every character
    * k-gram of the normalized text, slide a window of `w` consecutive
    * hashes, keep each window's minimum — a document is represented by
    * the distinct selected hashes, robust to local edits (partial-overlap
    * detection where whole-document hashing is all-or-nothing).
    *
    * Shape: explode k-gram positions, hash once per position, take the
    * window minimum with a bounded-following frame, distinct. (A pure
    * higher-order-function formulation re-evaluates the shared hash
    * array inside every window lambda — Catalyst does not CSE across
    * lambdas — turning O(len·w) into O(len²·k); the explode+window shape
    * hashes each k-gram exactly once.) Hashes are md5-derived (first 8
    * hex chars → long) so any engine reproduces them.
    *
    * Returns one row per (id, fp). Docs shorter than k+w-1 chars yield
    * no fingerprints (standard winnowing guarantees need ≥ one window).
    */
  def winnowingFingerprintRowsRelational(df: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("i").rowsBetween(0, w - 1)
    df.select(col(idCol).as("id"), norm.as("t"))
      .select(col("id"), col("t"),
        explode(sequence(lit(0), greatest(length(col("t")) - k, lit(-1)))).as("i"))
      .select(col("id"), col("i"),
        (length(col("t")) - (k - 1)).as("n"),
        graft.functions.HashExpressions.md5Prefix64(substring(col("t"), col("i") + 1, lit(k)), 8).as("hv"))
      .withColumn("fp", min(col("hv")).over(win))
      .where(col("i") <= col("n") - w)
      .select(col("id"), col("fp"))
      .distinct()
  }

  /** Native winnowing: the [[graft.functions.WinnowingFingerprints]]
    * expression selects each document's fingerprint set in one pass per
    * row (monotonic-deque sliding minima), so the per-document sort
    * window and the one-row-per-character explode disappear — only the
    * selected fingerprints (a w-fold reduction) become rows. The
    * relational shape above is the checked reference definition (and
    * what the SQL oracle mirrors); OpsSpec pins set-equality.
    */
  def winnowingFingerprintRows(df: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String, k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df.select(col(idCol).as("id"),
      explode(graft.functions.WinnowingExpressions.fingerprints(norm, k, w)).as("fp"))
  }

  /** Near-dup candidate pairs (a < b) sharing at least `minShared` selected
    * winnowing fingerprints. `maxDocFreq` < MaxValue drops boilerplate
    * fingerprints held by more than that many documents before the
    * self-join ([[Dedup.pruneHotKeys]]) — the same hot-bucket bound as
    * df-pruned Jaccard, and the scale-safe configuration.
    */
  def winnowingSharedPairs(fps: DataFrame, minShared: Long,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val pruned = Dedup.pruneHotKeys(fps, "fp", maxDocFreq)
    pruned.as("x").join(pruned.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** EXACT edit-distance-≤1 self-join via FastSS deletion-neighborhood
    * blocking — the entity-resolution standard for typo/variant matching
    * WITHOUT a quadratic cross join. Each string's candidate key set is
    * itself plus its |s| single-character deletions; two strings within
    * edit distance 1 ALWAYS share a key (equal → s itself; one
    * insert/delete → the shorter IS a deletion of the longer; one
    * substitution → deleting the differing position from both yields the
    * same string), so the variant equi-join loses nothing and the final
    * `levenshtein ≤ 1` check only discards false candidates.
    *
    * Scale shape: |s|+1 variant rows per string (bounded by string
    * length), one exchange on the variant key, per-key buckets =
    * strings sharing a deletion — self-limiting for id-like and
    * natural-language strings. `maxBucket` applies the
    * [[Dedup.pruneHotKeys]] discipline for adversarial key pileups
    * (e.g. millions of length-1 strings); the default keeps the join
    * exact. Verification is one codegen'd levenshtein per candidate.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .where(col("s").isNotNull)
    val variants = base.select(col("id"), explode(array_distinct(expr(
        "concat(array(s), transform(sequence(1, length(s)), " +
          "i -> concat(substring(s, 1, i-1), substring(s, i+1, length(s)))))")))
      .as("v"))
    val pruned = Dedup.pruneHotKeys(variants, "v", maxBucket)
    val cand = pruned.select(col("v"), col("id").as("a"))
      .join(pruned.select(col("v"), col("id").as("b")), "v")
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    cand
      .join(base.select(col("id").as("a"), col("s").as("sa")), Seq("a"))
      .join(base.select(col("id").as("b"), col("s").as("sb")), Seq("b"))
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .where(col("dist") <= 1)
      .select(col("a"), col("b"), col("dist"))
  }

  /** Distinctive terms per category by chi-squared association — the
    * corpus-analysis standard for "which words characterize this
    * language / source / domain" (used to audit a training mix for
    * category-specific artifacts). For each (category, term) 2×2
    * contingency: a = occurrences of the term in the category, b =
    * elsewhere, c = other tokens in the category, d = other tokens
    * elsewhere; `chi2 = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`.
    *
    * Determinism: all counts are exact BIGINTs; the formula is
    * evaluated in doubles with a FIXED operation order (each factor
    * cast to double first, numerator then denominator, one division) —
    * the oracle mirrors the identical tree, so both engines round the
    * same way at every step. `minCount` floors the global term count
    * (rare terms have unstable chi2 and bloat output); top-k per
    * category by (chi2 desc, term) on the UNROUNDED value.
    *
    * Scale shape: one token-keyed map-side-combined count per
    * (cat, term); term and category marginals are aggregates of that
    * frame (no second corpus scan) and join back broadcast-sized; the
    * grand total is a 1-row cross join. The only exchange over
    * token-cardinality data is the (cat, term) groupBy. Top-k window
    * partitions by category — bounded by the post-floor term count.
    */
  def chi2Terms(docs: DataFrame, textCol: String, catCol: String,
      minCount: Long = 20, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tc = docs
      .select(col(catCol).as("cat"), explode(words(col(textCol))).as("term"))
      .groupBy("cat", "term").agg(count(lit(1)).as("a"))
    val termTot = tc.groupBy("term").agg(sum("a").as("t_tot"))
      .where(col("t_tot") >= minCount)
    val catTot = tc.groupBy("cat").agg(sum("a").as("c_tot"))
    val grand = catTot.agg(sum("c_tot").as("nn"))
    val joined = tc.join(termTot, "term").join(catTot, "cat")
      .crossJoin(broadcast(grand))
      .withColumn("b", col("t_tot") - col("a"))
      .withColumn("c", col("c_tot") - col("a"))
      .withColumn("d", col("nn") - col("t_tot") - col("c_tot") + col("a"))
    val ad = col("a").cast("double") * col("d").cast("double")
    val bc = col("b").cast("double") * col("c").cast("double")
    val den = (col("a") + col("b")).cast("double") *
      (col("c") + col("d")).cast("double") *
      (col("a") + col("c")).cast("double") *
      (col("b") + col("d")).cast("double")
    val scored = joined
      .withColumn("chi2", when(den > 0,
        col("nn").cast("double") * (ad - bc) * (ad - bc) / den))
      .where(col("chi2").isNotNull)
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("cat").orderBy(col("chi2").desc, col("term"))))
      .where(col("rn") <= topK)
      .select(col("cat"), col("term"), col("a").as("n_in_cat"),
        round(col("chi2"), 4).as("chi2"), col("rn"))
  }

  /** Corpus-overlap report between SOURCES: for every source pair, the
    * distinct-shingle intersection, Jaccard, and BOTH directed
    * containments — "how much of source A's content already exists in
    * B" is the question a corpus-merge decision actually asks
    * (containment, not Jaccard: a small source wholly inside a big one
    * has tiny Jaccard but 100% containment — the q144 asymmetry at
    * corpus granularity).
    *
    * All ratios are floor-ppm (`(1e6·inter) div n` — never a float
    * tie). Plan: one distinct over (source, shingle) — the only
    * data-sized shuffle, keyed on the shingle for the pair join — then
    * a shingle-keyed self-join that only meets rows sharing a shingle,
    * and O(sources²) everything after. Both the distinct and the join
    * key on a 64-bit md5 DIGEST of the shingle, never the raw string
    * (the q391 discipline: an n-gram string is ~25 bytes + row
    * overhead and the raw-string shape measured spill-bound exp 1.31
    * across the sf1→sf10 decade; the output never needs the string,
    * and both engines hash identically so even a collision cannot
    * diverge the compare). Hot shingles (ubiquitous phrases) cost
    * pairs ∝ sources-sharing², bounded by the source count, NOT the
    * corpus — no maxBucket needed at this granularity.
    */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
      shingleN: Int = 3): DataFrame = {
    // `sh` feeds FOUR plan references (both self-join sides + two size
    // lookups); left lazy each one re-runs the scan+shingle+md5+distinct
    // (measured: 4 full document passes in q172's plan). Materialize the
    // distinct digest set once — the [[Dedup.nearDupSourceMatrix]]
    // localCheckpoint discipline; the frame is the distinct (src, 16-byte
    // digest) set the self-join must shuffle anyway (round-15).
    // Round-16 layout pin (the q391 fix applied to its q172 sibling):
    // gated input spread (no-op at scale) so shingle+md5 leaves the
    // 1-task scan stage, and the distinct pinned on hash(shingle) —
    // which satisfies the (src, shingle) clustering AND is exactly the
    // self-join key, so the join below plans with ZERO exchange off the
    // checkpointed layout instead of AQE-coalesced post-distinct tasks.
    val nParts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val sh = Dedup.spreadIfNarrow(
        docs.select(col(srcCol).as("src"), col(textCol).as("_t")), None)
      .select(col("src"),
        explode(shingles(col("_t"), shingleN)).as("_raw"))
      .select(col("src"),
        substring(md5(col("_raw")), 1, 16).as("shingle"))
      .repartition(nParts, col("shingle"))
      .distinct()
      .localCheckpoint(false) // lazy: dedup without an extra barrier job
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("n_sh").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n_sh").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("inter"),
        expr("(1000000 * inter) div (n_a + n_b - inter)").as("jaccard_ppm"),
        expr("(1000000 * inter) div n_a").as("contain_a_ppm"),
        expr("(1000000 * inter) div n_b").as("contain_b_ppm"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004, unweighted
    * variant): rank every corpus word by PageRank over the adjacency
    * graph — two words are linked when they appear next to each other in
    * any document. The graph build is two narrow passes (tokenize+lead,
    * then a distinct over the canonicalized pairs); the ranking itself is
    * [[Graph.pageRank]] on 60-bit md5 word ids, so the iteration cost is
    * O(edges) per round regardless of corpus size — the word graph is
    * vocabulary-sized, orders of magnitude smaller than the corpus that
    * produced it. Nodes are words that co-occur with at least one OTHER
    * word (isolated/self-repeating tokens carry no ranking signal and
    * would only add dangling mass).
    *
    * Returns (word, rank) for every graph word, rank rounded to 9 d.p.
    * (the [[Graph.pageRank]] cross-engine float contract).
    */
  def textRank(docs: DataFrame, textCol: String, idCol: String,
      iters: Int = 5, alpha: Double = 0.85): DataFrame = {
    // Round-16 (the q187 stupidBackoff pattern): the adjacency successor
    // is an ARRAY lookup over the empty-token-filtered word array (the
    // filter runs BEFORE pairing, exactly like the old pre-window WHERE,
    // so `get(_w, i+1)` sees the same neighbor `lead` saw), replacing
    // the per-doc hash(d) exchange + SORT + Window; the compact
    // (d, word-array) repartition kept below is the spread off the
    // 1-task local scan and the canonical reuse point. The distinct
    // pair set is VOCABULARY-bounded (canonical co-occurring word
    // pairs), so the lazy checkpoint is the bounded-frame
    // materialize-once — it feeds FOUR plan references (both edge
    // directions + both node-derivation legs), each of which re-ran
    // tokenize+pairs+distinct before.
    val und = docs
      .select(col(idCol).as("d"),
        filter(words(col(textCol)), x => length(x) > 0).as("_w"))
      .repartition(col("d"))
      .select(explode(transform(col("_w"), (x, i) =>
        struct(x.as("w"), get(col("_w"), i + 1).as("nxt")))).as("p"))
      .where(col("p.nxt").isNotNull && col("p.nxt") =!= col("p.w"))
      .select(least(col("p.w"), col("p.nxt")).as("a"),
        greatest(col("p.w"), col("p.nxt")).as("b"))
      .distinct()
      .localCheckpoint(false)
    def wid(c: Column): Column =
      graft.functions.HashExpressions.md5Prefix64(c, 15)
    val edges = und.select(wid(col("a")).as("src"), wid(col("b")).as("tgt"))
      .unionByName(und.select(wid(col("b")).as("src"), wid(col("a")).as("tgt")))
    val nodes = und.select(col("a").as("word"))
      .unionByName(und.select(col("b").as("word")))
      .distinct()
      .select(col("word"), wid(col("word")).as("node"))
      .localCheckpoint() // reused: rank input + the word join-back
    Graph.pageRank(nodes.select(col("node")), "node", edges, alpha, iters)
      .join(nodes, "node")
      .select(col("word"), col("rank"))
  }

  /** Hashing-trick featurization (Weinberger 2009): each token maps to a
    * bucket in [0, dims) via one md5 and contributes ±1 via a second,
    * independent md5 bit — the signed sum per (doc, bucket) is an
    * unbiased sparse projection of the term-frequency vector with NO
    * vocabulary table (the property that matters at 100 TB: featurizing
    * is a stateless narrow map + one (doc,bucket)-keyed aggregation, no
    * broadcast dictionary to build, ship, or keep consistent across
    * corpus versions). Zero-weight cells (sign cancellation) are dropped
    * — the output is the sparse representation.
    */
  def featureHash(docs: DataFrame, textCol: String, idCol: String,
      dims: Int = 64): DataFrame = {
    require(dims > 0, "dims must be positive")
    val tok = docs
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val bucket = pmod(
      graft.functions.HashExpressions.md5Prefix64(concat(lit("b|"), col("w")), 15), lit(dims.toLong))
    val sign = when(substring(md5(concat(lit("s|"), col("w"))), 1, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(-1L)
    tok.select(col(idCol), bucket.as("bucket"), sign.as("sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sgn")).as("weight"))
      .where(col("weight") =!= 0)
  }

  /** Zipf rank-frequency profile of the corpus vocabulary: the top
    * `topN` words by frequency (freq desc, word asc — a total order)
    * with the Zipf diagnostic freq×rank (constant under an ideal s=1
    * Zipf law; its drift across ranks is the corpus-health signal
    * tokenizer and dedup teams read) and each word's exact floored-ppm
    * share of token mass. All integers — no log-log regression to
    * disagree on. One grouped count + one bounded sort; the count is
    * map-side combinable, the sort touches vocabulary not corpus.
    */
  def zipfProfile(docs: DataFrame, textCol: String, topN: Int = 50): DataFrame = {
    require(topN >= 1)
    val freq = docs.select(explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val total = freq.agg(sum(col("freq")).as("n_total"))
    // orderBy+limit compiles to TakeOrderedAndProject — a distributed
    // per-partition top-N + driver merge, never a single-partition sort
    // of the whole vocabulary; the rank window then runs on ≤ topN rows
    val top = freq.orderBy(col("freq").desc, col("w")).limit(topN)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("w"))
    top.withColumn("rank", row_number().over(wr).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("w").as("word"), col("freq"),
        (col("freq") * col("rank")).as("freq_x_rank"),
        expr("(1000000 * freq) div n_total").as("share_ppm"))
  }

  /** Marginal n-gram novelty per document — "how much content does
    * this document add that the rest of the corpus doesn't already
    * have?" The data-mixing complement to pairwise dedup: a document
    * can be far from every single neighbor yet contribute nothing new
    * in aggregate. Per document: its DISTINCT n-gram count, how many
    * of those n-grams appear in NO other document (corpus df = 1),
    * and the novelty ratio in truncating ppm. Shingle md5s ride the
    * shuffle, never raw text. Documents shorter than `n` words have
    * no n-grams: null novelty, never a fake 0 or 1.
    *
    * Plan shape (round-13 rewrite — was exp 1.07 at sf10): the per-doc
    * distinct-shingle count is NARROW (`size` of the per-row shingle
    * array, no shuffle), and a df=1 gram names its sole document for
    * free as `max(id)` inside the single digest-keyed aggregate — so
    * the one n-gram-sized shuffle is a map-side-combinable groupBy,
    * and the old digest-keyed JOIN of two n-gram-sized frames (plus
    * its downstream doc re-shuffle) is gone. Everything after the
    * gram aggregate is document-sized.
    */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), words(col(textCol)).as("_w"))
    val nn = base.select(col("id"),
      size(shinglesFromWords(col("_w"), n)).cast("long").as("n_ngrams"))
    val grams = base
      .select(col("id"), explode(shinglesFromWords(col("_w"), n)).as("g"))
      .select(col("id"), md5(col("g")).as("h"))
    val uniq = grams.groupBy("h")
      .agg(count(lit(1)).as("dfc"), max(col("id")).as("id"))
      .where(col("dfc") === 1)
      .groupBy("id").agg(count(lit(1)).as("n_unique"))
    nn.join(uniq, Seq("id"), "left")
      .select(col("id"), col("n_ngrams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .select(col("id"), col("n_ngrams"), col("n_unique"),
        when(col("n_ngrams") > 0,
          expr("(1000000 * n_unique) div n_ngrams")).as("novelty_ppm"))
  }

  /** Heaps'-law vocabulary growth curve — the corpus-health audit that
    * answers "is new data still bringing new vocabulary, or are we
    * re-crawling the same text?" (a saturating curve is the signature
    * of an exhausted source; Heaps' law V ≈ K·T^β predicts β ≈ 0.4-0.6
    * for natural text). The curve is sampled at power-of-2 DOCUMENT
    * checkpoints: vocab(c) = distinct tokens whose FIRST occurrence
    * falls in the first c documents of the `orderCol` ordering.
    *
    * The trick that keeps this one pass instead of |checkpoints|
    * prefix scans: a token's first-occurrence rank is just
    * `min(doc_seq)` over its postings, so vocab(c) is a COUNT over the
    * token table with `first_seq ≤ c` — the checkpoint sweep runs on
    * the (vocab-sized) token frame and the (doc-sized) doc frame,
    * never re-reading text. Output is pure integers (counts + one
    * truncating ppm ratio); the Heaps exponent is the caller's
    * regression over the released lattice — no float crosses the
    * engine boundary.
    *
    * Scale note: `doc_seq` is a row_number over the DOC frame ordered
    * by `orderCol` — a doc-count-sized global sort (not data-sized; the
    * text never rides it). At 100 TB the doc frame is ~10⁹ rows, which
    * a range-partitioned sort handles; the alternative (using a dense
    * pre-assigned ingest sequence as `orderCol`) removes even that.
    */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val docs = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"), col(textCol).as("text"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val seq = docs.select(col("id"),
        size(filter(words(col("text")), w => length(w) > 0))
          .cast("long").as("n_tok"))
      .withColumn("doc_seq", row_number().over(wOrd).cast("long"))
    val firstSeen = docs
      .select(col("id"), explode(words(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .join(seq.select(col("id"), col("doc_seq")), "id")
      .groupBy("w").agg(min("doc_seq").as("first_seq"))
    // bounded driver scalar: |docs| (same class as pageRank's |V|)
    val nDocs = seq.agg(max("doc_seq")).first().getLong(0)
    val checkpoints = Iterator.iterate(1L)(_ * 2)
      .takeWhile(_ < nDocs).toSeq :+ nDocs
    val sparkSess = docs.sparkSession
    import sparkSess.implicits._
    val cps = checkpoints.distinct.sorted.toDF("checkpoint_docs")
    val vocabAt = firstSeen.join(broadcast(cps),
        col("first_seq") <= col("checkpoint_docs"))
      .groupBy("checkpoint_docs").agg(count(lit(1)).as("vocab"))
    val tokensAt = seq.join(broadcast(cps),
        col("doc_seq") <= col("checkpoint_docs"))
      .groupBy("checkpoint_docs").agg(sum("n_tok").as("tokens"))
    tokensAt.join(vocabAt, Seq("checkpoint_docs"), "left")
      .select(col("checkpoint_docs"), col("tokens"),
        coalesce(col("vocab"), lit(0L)).as("vocab"))
      .withColumn("vocab_per_mtok",
        when(col("tokens") > 0,
          expr("(1000000 * vocab) div tokens")).cast("long"))
  }

  /** Good–Turing coverage + Chao1 richness — the "how much vocabulary
    * have we NOT seen yet" estimators, per source: the sample-coverage
    * estimate C = 1 − N₁/N (Good 1953; the chance the next token is
    * novel is the hapax fraction) and the Chao1 lower bound on true
    * vocabulary size V̂ = V + N₁²/(2·N₂) (Chao 1984). Both drive the
    * crawl-scheduling decision "this source still yields novelty" with
    * two numbers per source, and both are exact integer arithmetic
    * over the frequency-of-frequencies table (truncating div, the
    * repo-wide ppm discipline; `chao1` is null when N₂ = 0 — the
    * bias-corrected variant would divide by zero and a made-up
    * sentinel would be a lie).
    *
    * Scale: one (source, token) grouped count (map-side combinable),
    * one (source, freq) regroup, one source-sized fold. Nothing after
    * the first aggregate is data-sized.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val tok = df.filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val tf = tok.groupBy("source", "w").agg(count(lit(1)).as("f"))
    tf.groupBy("source").agg(
        count(lit(1)).as("vocab"),
        sum("f").as("tokens"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("f") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("vocab"), col("tokens"),
        col("n1"), col("n2"),
        (lit(1000000L) - expr("(1000000 * n1) div tokens"))
          .as("coverage_ppm"),
        when(col("n2") > 0,
          col("vocab") + expr("(n1 * n1) div (2 * n2)"))
          .cast("long").as("chao1"))
  }

  /** Pairwise Jensen–Shannon divergence between sources' token
    * distributions — the bounded, symmetric corpus-comparison number
    * ("how differently do these two sources speak", 0 = identical,
    * ln 2 ≈ 693147 micro-nats = disjoint vocabularies) that KL cannot
    * give (KL explodes on any token one side lacks; JS's mixture
    * midpoint absorbs it).
    *
    * The float surface is ONE `ln` per (pair, token), of a ratio of
    * exact integer counts — `2·pc·Q / (pc·Q + qc·P)` is the algebraic
    * form of `2p/(p+q)` with the totals cleared, so the argument is
    * engine-exact — rounded to micro-nats before the weighted sum
    * (q113 discipline); the data-sized weighting `Σ pc·t div 2P` is
    * then exact integer. Absent tokens contribute the CLOSED-FORM
    * `ln 2` term, no smoothing fiction.
    *
    * Scale: one (source, token) grouped count, then a token-keyed
    * INNER self-join for the shared vocabulary only — the
    * absent-on-one-side mass needs no join at all, because
    * Σ_{only-in-A} p_w = (P − Σ_shared pc)/P and each such token's
    * term is exactly ln 2; the tail is closed-form from the totals.
    * Work ∝ shared vocabulary per pair; sources² is a design-time
    * handful.
    */
  def jsDivergence(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val LN2 = 693147L // round(1e6 * ln 2) — the absent-token term
    val dec = "decimal(38,0)"
    val tf = df.filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("src"),
        explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("src", "w").agg(count(lit(1)).as("c"))
    val tot = tf.groupBy("src").agg(sum("c").as("t"))
    val a = tf.select(col("src").as("sa"), col("w"), col("c").as("pc"))
    val b = tf.select(col("src").as("sb"), col("w"), col("c").as("qc"))
    val totA = tot.select(col("src").as("sa"), col("t").as("pt"))
    val totB = tot.select(col("src").as("sb"), col("t").as("qt"))
    // exact decimal cross-products cleared of the totals:
    // 2p/(p+q) = 2·pc·Q / (pc·Q + qc·P); the ONE float per (pair,
    // token) is the ln of that decimal→double ratio, rounded to micro
    val terms = a.join(b, Seq("w")).where(col("sa") < col("sb"))
      .join(broadcast(totA), "sa").join(broadcast(totB), "sb")
      .select(col("sa"), col("sb"), col("pc"), col("qc"),
        expr(s"cast(pc as $dec) * qt").as("pq"),
        expr(s"cast(qc as $dec) * pt").as("qp"))
      .select(col("sa"), col("sb"), col("pc"), col("qc"),
        round(lit(1e6) * log(lit(2.0) * col("pq").cast("double") /
          (col("pq") + col("qp")).cast("double"))).cast("long").as("tp"),
        round(lit(1e6) * log(lit(2.0) * col("qp").cast("double") /
          (col("pq") + col("qp")).cast("double"))).cast("long").as("tq"))
      .groupBy("sa", "sb")
      .agg(sum(expr(s"cast(pc as $dec) * tp")).as("sp"),
        sum(expr(s"cast(qc as $dec) * tq")).as("sq"),
        sum("pc").as("shared_p"), sum("qc").as("shared_q"),
        count(lit(1)).as("n_shared_tokens"))
    totA.crossJoin(totB).where(col("sa") < col("sb"))
      .join(terms, Seq("sa", "sb"), "left")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        coalesce(col("n_shared_tokens"), lit(0L)).as("n_shared_tokens"),
        ((coalesce(col("sp"), lit(0).cast(dec)) +
          expr(s"cast((pt - coalesce(shared_p, 0)) as $dec)") * LN2)
          .cast(dec).as("half_a")),
        ((coalesce(col("sq"), lit(0).cast(dec)) +
          expr(s"cast((qt - coalesce(shared_q, 0)) as $dec)") * LN2)
          .cast(dec).as("half_b")),
        col("pt"), col("qt"))
      .select(col("source_a"), col("source_b"), col("n_shared_tokens"),
        // each half is a KL(·‖m) ≥ 0 mathematically; per-term micro
        // rounding can push a near-identical pair a few micro negative,
        // and Spark's div TRUNCATES where DuckDB's // FLOORS on
        // negatives — clamp at 0 so the engines cannot diverge there
        (expr(s"greatest(cast(0 as $dec), half_a) div " +
            s"(2 * cast(pt as $dec))") +
          expr(s"greatest(cast(0 as $dec), half_b) div " +
            s"(2 * cast(qt as $dec))"))
          .cast("long").as("js_micro"))
  }

  /** Greedy set-cover source selection — submodular data curation's
    * workhorse ("which `rounds` sources buy the most vocabulary
    * coverage"): each round picks the source adding the most
    * NOT-YET-COVERED distinct tokens (count-desc, name-asc pinned
    * ties), the greedy rule with the classic (1 − 1/e) guarantee.
    * Emits one row per round with the marginal gain and cumulative
    * coverage ppm of the full token universe.
    *
    * Shape: the (source, token) incidence materializes once
    * (localCheckpoint — every round anti-joins against it); per round
    * one anti-join + grouped count + TakeOrdered(1), and the covered
    * set grows by checkpointed union — linear lineage, the
    * [[Graph.pageRank]] iteration discipline. The driver carries only
    * the picked source names (bounded scalars). Stops early when no
    * remaining source adds a token.
    */
  def greedySourceCover(df: DataFrame, textCol: String, groupCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 16)
    val spark = df.sparkSession
    import spark.implicits._
    val inc = df.where(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("s"),
        explode(words(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .distinct()
      .localCheckpoint()
    val universe = inc.select("w").distinct().count() // bounded scalar
    var covered = inc.select("w").limit(0).localCheckpoint()
    var picked = List.empty[String]
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, Long, Long)]
    var cum = 0L
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val remaining = inc
        .filter(!col("s").isin(picked.map(x => x: Any): _*))
        .join(covered, Seq("w"), "left_anti")
      val top = remaining.groupBy("s").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s").asc).limit(1)
        .as[(String, Long)].collect() // 1 bounded row
      top.headOption match {
        case Some((src, n)) =>
          cum += n
          out += ((round.toLong, src, n, cum))
          picked = src :: picked
          covered = covered
            .unionByName(remaining.where(col("s") === src).select("w"))
            .localCheckpoint()
          round += 1
        case None => done = true
      }
    }
    out.toSeq.toDF("round", "source", "n_new_tokens", "cum_covered")
      .withColumn("coverage_ppm",
        expr(s"(1000000 * cum_covered) div $universe"))
  }

  /** Token dispersion — Gries' DP (deviation of proportions) per
    * token across corpus parts: DP = Σ_p |obs_share − expected_share|
    * / 2, where expected is the part's share of ALL tokens and
    * observed is the token's own distribution. DP ≈ 0 = the token is
    * spread exactly like the corpus (function words); DP → 1 = the
    * token lives in one part (topic/template words — and, in a
    * training mix, the tokens a source-capped sampler will starve).
    * The raw-frequency view cannot see this: two tokens with equal
    * counts can have opposite dispersions.
    *
    * Exactness: shares are truncating ppm (the pinned grain), the
    * final halving truncates — both engines replay the identical
    * integers. ABSENT (token, part) cells count |0 − expected|, so
    * the per-token frame is the full part lattice: `minCount` floors
    * the vocabulary BEFORE the lattice (vocab·parts rows is the
    * bounded frame, parts are caller-bounded by contract).
    *
    * Scale: one (part, token) count (map-side combined), one
    * vocab-sized rollup, one broadcast part-size join; the lattice
    * cross join is (floored vocab) × (bounded parts).
    */
  def tokenDispersion(df: DataFrame, textCol: String, partCol: String,
      minCount: Long = 10): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val cells = df
      .filter(col(textCol).isNotNull && col(partCol).isNotNull)
      .select(col(partCol).as("part"),
        explode(words(col(textCol))).as("word"))
      .groupBy("part", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint() // roles: part sizes + token totals + lattice join
    val parts = cells.groupBy("part").agg(sum("c").as("s"))
    val total = parts.agg(sum("s").as("st"))
    val expected = parts.crossJoin(broadcast(total))
      .select(col("part"), expr("(1000000 * s) div st").as("e_ppm"))
    val vocab = cells.groupBy("word").agg(sum("c").as("ct"),
        count(lit(1)).as("n_parts_present"))
      .where(col("ct") >= minCount)
    vocab.crossJoin(broadcast(expected))
      .join(cells, Seq("word", "part"), "left")
      .select(col("word"), col("ct"), col("n_parts_present"),
        col("e_ppm"),
        expr("(1000000 * coalesce(c, 0)) div ct").as("o_ppm"))
      .groupBy("word")
      .agg(first("ct").as("n_occurrences"),
        first("n_parts_present").as("n_parts_present"),
        expr("sum(abs(o_ppm - e_ppm)) div 2").as("dp_ppm"))
  }
}
