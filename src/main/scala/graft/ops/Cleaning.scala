package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-cleaning operators a training-data pipeline runs before (or
  * instead of) whole-document dedup: sub-document span dedup, intra-doc
  * repetition metrics, and PII redaction. All three are the standard
  * public recipes (C4/CCNet paragraph dedup, the Gopher repetition
  * filters, regex PII scrubbing) re-expressed as Spark plans.
  *
  * Scale shapes: [[spanDedup]] is the only shuffling member (one
  * exchange on a 16-byte span digest — never raw span text — plus the
  * per-doc reassembly aggregation); [[repetitionMetrics]] and
  * [[redactPii]] are pure narrow Column projections that stay inside
  * whole-stage codegen, so at 100 TB they cost one scan and nothing
  * else. No UDFs anywhere — higher-order array functions cover the
  * per-document loops.
  */
object Cleaning {

  // ————————————————————————————————————————————— span-level exact dedup

  /** Fixed-width word spans with position: one row per (id, pos, span).
    * Fixed-width segmentation (rather than sentence splitting) keeps the
    * operator deterministic on any text and engine-portable — the oracle
    * reproduces it with list slicing.
    */
  def spanRows(df: DataFrame, textCol: String, idCol: String,
      spanWords: Int): DataFrame = {
    require(spanWords > 0)
    val w = TextOps.words(col(textCol))
    // n_spans = ceil(len/w); sequence is inclusive so guard empty docs
    val spans = transform(
      sequence(lit(0), greatest(ceil(size(w) / lit(spanWords.toDouble)).cast("int"), lit(1)) - 1),
      i => array_join(slice(w, i * spanWords + 1, lit(spanWords)), " "))
    df.select(col(idCol).as("id"), posexplode(spans).as(Seq("pos", "span")))
  }

  /** Sub-document exact dedup, CCNet/C4-paragraph style with fixed-width
    * spans: every occurrence of a span that already appeared at a
    * "smaller" position — ordering occurrences by (id, pos) — is
    * dropped, and each document is reassembled from its surviving spans
    * in order. Returns one row per input document:
    * (id, clean_text, n_spans, n_dropped); a document whose every span
    * was seen before collapses to an empty clean_text rather than
    * disappearing (the caller decides whether to filter empties —
    * losing the row would silently change corpus row counts).
    *
    * Plan: keep-first-global needs only the (id, pos)-minimum occurrence
    * of each span digest, so the decision is a `min(struct(id, pos,
    * span))` AGGREGATE keyed on the 16-byte digest — partial aggregation
    * collapses a hot digest's occurrences map-side, so a boilerplate
    * span shared by millions of documents (or the empty-span digest
    * every short doc shares) costs each mapper one partial instead of
    * landing every occurrence in one task. (The previous formulation, a
    * row_number window over the digest, had exactly that single-task
    * hot-key skew — a window cannot partially aggregate. No keep-join is
    * needed either: the winners ARE the kept set, because every
    * non-first occurrence is dropped outright.) Reassembly then sorts
    * each doc's kept spans with `sort_array(collect_list(struct))` — one
    * more exchange on the doc id.
    */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
      spanWords: Int = 16): DataFrame = {
    val kept = spanRows(df, textCol, idCol, spanWords)
      .withColumn("fp", md5(col("span")))
      .groupBy(col("fp"))
      .agg(min(struct(col("id"), col("pos"), col("span"))).as("w"))
      .select(col("w.id").as("id"), col("w.pos").as("pos"),
        col("w.span").as("span"))
    val rebuilt = kept.groupBy(col("id"))
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("pos"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol).as("id"), col(textCol),
        size(TextOps.words(col(textCol))).as("_nw"))
      .withColumn("n_spans",
        greatest(ceil(col("_nw") / lit(spanWords.toDouble)).cast("long"), lit(1L)))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_spans"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  // ————————————————————————————————————————— intra-document repetition

  /** Gopher-style repetition signals, computed WITHOUT exploding: the
    * obvious plan (explode words → groupBy doc → agg) buys a full
    * shuffle of every word occurrence; these are higher-order array
    * expressions over the in-row word array instead — narrow, codegen
    * adjacent, zero exchanges. Per document:
    *   - n_words
    *   - top_word_frac: occurrences of the most frequent word / n_words
    *     (max run length over the SORTED word array — an O(n log n)
    *     per-row sort replaces a corpus-wide shuffle)
    *   - dup_bigram_frac: 1 − distinct(bigrams)/count(bigrams), over
    *     RAW bigram occurrences (not [[TextOps.shinglesFromWords]],
    *     which is distinct by contract)
    * Empty docs yield fractions 0.0, not null. `w` must be a projected
    * attribute, not an inline `words(text)` — Catalyst does not CSE
    * inside lambda bodies (see the [[TextOps.shinglesFromWords]] note).
    *
    * This HOF chain is the spec-pinned REFERENCE definition; the
    * production path is [[repetitionMetrics]] over the native
    * [[graft.functions.RepetitionStats]] kernel (one JVM pass per row —
    * measured 5.4 s → sub-second on the 150k-doc bench table; the HOF's
    * interpreted per-element lambdas were the slowest kernel in the
    * suite). CleaningSpec proves native ≡ HOF.
    */
  def repetitionMetricsHof(w: Column): Seq[(String, Column)] = {
    val n = size(w)
    // longest run in the sorted array == count of the most frequent word
    val topCount = aggregate(
      sort_array(w),
      struct(lit(0).as("best"), lit(0).as("cur"), lit(null).cast("string").as("prev")),
      (st, x) => {
        val cur = when(x === st.getField("prev"), st.getField("cur") + 1).otherwise(1)
        struct(greatest(st.getField("best"), cur).as("best"), cur.as("cur"), x.as("prev"))
      },
      st => st.getField("best"))
    val bigrams = when(n >= 2,
      transform(sequence(lit(0), n - 2), i => concat_ws(" ", slice(w, i + 1, lit(2)))))
      .otherwise(array())
    val nBi = size(bigrams)
    Seq(
      "n_words" -> n.cast("long"),
      "top_word_frac" -> when(n > 0, topCount.cast("double") / n).otherwise(lit(0.0)),
      "dup_bigram_frac" -> when(nBi > 0,
          lit(1.0) - size(array_distinct(bigrams)).cast("double") / nBi)
        .otherwise(lit(0.0)))
  }

  /** Production repetition signals from the native
    * [[graft.functions.RepetitionStats]] kernel — identical numbers to
    * [[repetitionMetricsHof]] (CleaningSpec law), one codegen'd JVM pass
    * per row. `stats` must be a projected attribute of the kernel
    * output; `n` the word count.
    */
  def repetitionMetrics(stats: Column, n: Column): Seq[(String, Column)] = Seq(
    "n_words" -> n.cast("long"),
    "top_word_frac" -> when(n > 0,
        stats.getField("top_count").cast("double") / n).otherwise(lit(0.0)),
    "dup_bigram_frac" -> when(stats.getField("bigram_total") > 0,
        lit(1.0) - stats.getField("bigram_distinct").cast("double")
          / stats.getField("bigram_total"))
      .otherwise(lit(0.0)))

  /** Documents whose repetition signals pass the (Gopher-style)
    * thresholds; adds the metric columns for downstream inspection.
    */
  def repetitionFilter(df: DataFrame, textCol: String, idCol: String,
      maxTopWordFrac: Double = 0.2, maxDupBigramFrac: Double = 0.7): DataFrame = {
    graft.functions.RepetitionExpressions.register(df.sparkSession)
    val metrics = repetitionMetrics(col("_st"), size(col("_w")))
    val withM = df
      .select(col(idCol).as("id"), TextOps.words(col(textCol)).as("_w"))
      .select(col("id"), col("_w"),
        graft.functions.RepetitionExpressions.repetitionStats(col("_w")).as("_st"))
      .select(col("id") +: metrics.map { case (n, c) => c.as(n) }: _*)
    withM.where(col("top_word_frac") <= maxTopWordFrac &&
      col("dup_bigram_frac") <= maxDupBigramFrac)
  }

  // ———————————————————————————————————— the cleaning pipeline, composed

  /** The pre-dedup cleaning pass a corpus build runs as ONE plan:
    * C4-style quality filter ([[TextOps.qualityFilter]]) → Gopher
    * repetition filter (inline native-kernel predicate — no join-back,
    * the metrics compute in the same projection) → span-level exact
    * dedup ([[spanDedup]]). Everything before the span stage is a
    * narrow filter over the scan; the span stage contributes the
    * composition's only exchanges. Returns [[spanDedup]]'s
    * (id, clean_text, n_spans, n_dropped) for the surviving documents.
    */
  def cleanCorpus(df: DataFrame, textCol: String, idCol: String,
      minWords: Long = 30, maxWords: Long = 120,
      minStopwordRatio: Double = 0.08, minAlphaRatio: Double = 0.5,
      lang: Option[String] = None,
      maxTopWordFrac: Double = 0.2, maxDupBigramFrac: Double = 0.7,
      spanWords: Int = 8): DataFrame = {
    graft.functions.RepetitionExpressions.register(df.sparkSession)
    val q = TextOps.qualityFilter(df, textCol, minWords, maxWords,
      minStopwordRatio, minAlphaRatio, lang)
    val metrics = repetitionMetrics(col("_st"), size(col("_w"))).toMap
    val r = q
      .withColumn("_w", TextOps.words(col(textCol)))
      .withColumn("_st",
        graft.functions.RepetitionExpressions.repetitionStats(col("_w")))
      .where(metrics("top_word_frac") <= maxTopWordFrac &&
        metrics("dup_bigram_frac") <= maxDupBigramFrac)
      .drop("_w", "_st")
    spanDedup(r, textCol, idCol, spanWords)
  }

  // ———————————————————————————————————————————————————— PII redaction

  /** Conservative character classes shared verbatim by Java regex
    * (Spark) and RE2 (DuckDB oracle) — no lookarounds, no \\d shorthand
    * differences in play.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails, TPC-H-shaped phone numbers, and IPv4 literals to
    * typed placeholders; returns (redacted, n_pii). Order matters:
    * emails first (an email's domain can contain digit runs an IP
    * pattern would nibble), then phones, then IPs. n_pii counts each
    * pattern on the PROGRESSIVELY-redacted text (emails on the raw text,
    * phones after email replacement, IPs after phone replacement), so it
    * equals the number of replacements actually made — a digit run
    * inside an email is redacted as part of the `<EMAIL>` placeholder
    * and is not double-counted as a phone/IP hit. Pure narrow
    * projection — regexp_replace/regexp_count are codegen'd; at 100 TB
    * this is scan-speed.
    */
  def redactPii(text: Column): (Column, Column) = {
    val afterEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phoneRe, "<PHONE>")
    val redacted = regexp_replace(afterPhone, ipv4Re, "<IP>")
    val n = regexp_count(text, lit(emailRe)) +
      regexp_count(afterEmail, lit(phoneRe)) +
      regexp_count(afterPhone, lit(ipv4Re))
    (redacted, n.cast("long"))
  }

  /** T5-style span corruption — the denoising-objective data generator:
    * each token masks independently off the md5 lattice (deterministic
    * in (doc, pos), so any engine regenerates the identical corruption),
    * consecutive masked tokens merge into ONE span, span k of a document
    * is replaced by the sentinel `<extra_id_k>` in the corrupted text,
    * and the training target is the sentinel-prefixed concatenation of
    * the masked spans (the exact T5 encoder/decoder pair shape).
    * Returns (id, corrupted, targets, n_spans); untouched docs keep
    * their text with empty targets.
    *
    * Plan: positional explode → one per-doc window pass computing
    * span-start flags and the running span index (lag + running sum
    * sharing one sort — the q08 sessionization shape applied inside
    * documents) → one ordered-reassembly aggregate. Two exchanges on
    * the doc id; nothing is quadratic and nothing collects.
    */
  def spanMask(df: DataFrame, textCol: String, idCol: String,
      maskPct: Int = 15): DataFrame = {
    require(0 < maskPct && maskPct < 100, "maskPct must be in (0, 100)")
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("id"),
      posexplode(TextOps.words(col(textCol))).as(Seq("pos", "tok")))
    val masked = graft.functions.HashExpressions.md5Prefix64(concat(col("id").cast("string"),
      lit("|"), col("pos").cast("string")), 4) % 100 < maskPct
    val ord = Window.partitionBy("id").orderBy("pos")
    val run = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = tok
      .withColumn("m", masked)
      .withColumn("start",
        col("m") && !coalesce(lag("m", 1).over(ord), lit(false)))
      // span index k (0-based) for masked tokens: running start count − 1
      .withColumn("k", sum(when(col("start"), 1L).otherwise(0L)).over(run) - 1)
    val pieces = flagged.select(col("id"), col("pos"),
      // corrupted stream: sentinel once per span, plain tokens elsewhere,
      // nothing for span continuations
      when(!col("m"), col("tok"))
        .when(col("start"), concat(lit("<extra_id_"), col("k"), lit(">")))
        .as("corr"),
      // target stream: sentinel-prefixed masked tokens only
      when(col("start"),
          concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
        .when(col("m"), col("tok")).as("tgt"),
      col("start"))
    pieces.groupBy("id").agg(
      array_join(filter(transform(array_sort(collect_list(
        struct(col("pos"), col("corr")))), s => s("corr")), x => x.isNotNull),
        " ").as("corrupted"),
      array_join(filter(transform(array_sort(collect_list(
        struct(col("pos"), col("tgt")))), s => s("tgt")), x => x.isNotNull),
        " ").as("targets"),
      sum(when(col("start"), 1L).otherwise(0L)).as("n_spans"))
  }

  /** Frequency-based boilerplate removal — the CCNet verb that span
    * dedup is NOT: [[spanDedup]] keeps a span's first occurrence
    * (exactness), while boilerplate removal drops EVERY occurrence of
    * a line that appears in too many of its source's documents
    * (headers, footers, cookie banners — content that is common is
    * content that is template). A "line" is a fixed `lineWords`-word
    * chunk; a line is boilerplate within its source when it occurs in
    * ≥ 2 documents AND in more than `maxDfPpm` of them (truncating ppm
    * against the source's doc count). Two digest-sized shuffles (line
    * df, then reassembly) — raw text never rides the frequency
    * exchange.
    */
  def boilerplateRemove(df: DataFrame, textCol: String, idCol: String,
      sourceCol: String, lineWords: Int = 6,
      maxDfPpm: Long = 300000L): DataFrame = {
    require(lineWords > 0 && maxDfPpm >= 0 && maxDfPpm <= 1000000L)
    val base = df.select(col(idCol).as("id"), col(sourceCol).as("src"),
      col(textCol).as("text"))
    val lines = spanRows(base, "text", "id", lineWords)
      .join(base.select(col("id"), col("src")), "id")
    val docsPerSrc = base.groupBy("src").agg(countDistinct("id").as("docs"))
    val lineDf = lines.groupBy(col("src"), md5(col("span")).as("h"))
      .agg(countDistinct("id").as("df"))
      .join(docsPerSrc, "src")
      .where(col("df") >= 2 &&
        expr("(1000000 * df) div docs") > maxDfPpm)
      .select(col("src").as("bsrc"), col("h"))
    val kept = lines
      .join(lineDf, col("src") === col("bsrc") &&
        md5(col("span")) === col("h"), "left_anti")
    val reb = kept.groupBy("id")
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("pos"), col("span")))), s => s("span")), " ")
        .as("clean_text"),
        count(lit(1)).as("n_kept"))
    base.select(col("id"), col("src"))
      .join(
        // n_lines from the already-built `lines` frame — re-running
        // spanRows here would double the data-sized chunking work
        lines.groupBy("id").agg(count(lit(1)).as("n_lines")), "id")
      .join(reb, Seq("id"), "left")
      .select(col("id"), col("src"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Per-document encoding-quality audit — the triage gate a crawl
    * corpus passes BEFORE tokenization, because a tokenizer happily
    * learns merges over double-encoded garbage. Three independent
    * exact counters per document (all single-pass `regexp_count`,
    * codegen'd, no UDF): U+FFFD replacement characters (a decoder
    * already gave up), C0 control characters other than tab/newline
    * (binary spill into text), and the classic UTF-8-read-as-Latin-1
    * mojibake markers (`Ã`, `Â`, `â€` — the bytes 0xC3/0xC2/0xE2 0x80
    * decoded as Latin-1). Verdict picks the worst class in a pinned
    * order so both engines agree on every row. Narrow per-row map —
    * embarrassingly parallel at any scale.
    */
  def encodingAudit(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.filter(col(idCol).isNotNull && t.isNotNull)
      .select(col(idCol),
        length(t).cast("long").as("n_cp"),
        regexp_count(t, lit("\\x{FFFD}")).cast("long").as("n_replacement"),
        regexp_count(t, lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"))
          .cast("long").as("n_control"),
        regexp_count(t, lit("Ã|Â|â€")).cast("long").as("n_mojibake"))
      .withColumn("verdict",
        when(col("n_mojibake") > 0, "mojibake")
          .when(col("n_replacement") > 0, "replacement")
          .when(col("n_control") > 0, "control")
          .otherwise("clean"))
  }

  /** Per-document character-level Shannon entropy — the gibberish /
    * machine-noise screen (natural text sits ~2.5–4.5 nats/char-class;
    * base64 blobs, key mashes, and single-char floods land far outside
    * the band and survive every word-level quality filter because they
    * ARE one word). `H = ln(n) − Σ_c k_c·ln(k_c) / n` over exact
    * per-character counts; the one float combination rounds to 6 d.p.
    * (the alphabet is bounded, so the Σ has ≤ a few hundred terms —
    * the q113/avg discipline absorbs summation order). Empty and null
    * texts emit no row — never a fake 0-entropy document.
    *
    * Scale: one per-char explode (linear in bytes), one (id, char)
    * fold that map-side-combines to ≤ docs·|alphabet| rows, one
    * doc-keyed fold. Raw text never shuffles — only (id, char, count).
    */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counts = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).as("id"), explode(split(col(textCol), "")).as("c"))
      .groupBy("id", "c").agg(count(lit(1)).as("k"))
    counts.groupBy("id")
      .agg(sum("k").as("n_chars"),
        count(lit(1)).as("n_distinct"),
        round(log(sum("k")) -
          sum(col("k") * log(col("k"))) / sum("k"), 6).as("entropy6"))
  }

  /** Domain-level corpus curation (the RefinedWeb/CCNet step ABOVE the
    * document filters): roll per-document signals up to the registered
    * domain and flag whole domains whose profile says "mirror farm or
    * boilerplate mill" — a domain whose documents are mostly copies of
    * each other, or whose mean length is below the floor, gets dropped
    * WHOLESALE (cheaper and safer than letting its long tail leak
    * through per-doc filters one document at a time). Per domain:
    * exact doc/dup accounting (dup = exact-text md5 collision inside
    * the domain), truncating ppm dup rate, truncating mean token
    * count, and the keep verdict.
    *
    * Scale: one narrow projection (fingerprint + token count), one
    * domain-keyed aggregate with map-side combine (countDistinct on
    * the md5 rides the same shuffle); output is domain-cardinality-
    * sized. Raw text never shuffles — only its md5.
    */
  def domainQuality(df: DataFrame, textCol: String, idCol: String,
      domainCol: String, minMeanTokens: Long = 20,
      maxDupPpm: Long = 300000): DataFrame =
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        col(domainCol).isNotNull)
      .select(col(domainCol).as("domain"), md5(col(textCol)).as("fp"),
        TextOps.wsTokenCount(col(textCol)).as("n_tok"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("fp").as("n_distinct"),
        sum("n_tok").as("n_tokens"))
      .select(col("domain"), col("n_docs"), col("n_distinct"),
        col("n_tokens"),
        expr("(1000000 * (n_docs - n_distinct)) div n_docs").as("dup_ppm"),
        expr("n_tokens div n_docs").as("mean_tok"))
      .withColumn("kept",
        col("mean_tok") >= minMeanTokens && col("dup_ppm") <= maxDupPpm)

  /** Template phrases that mark a parked domain, a registrar lander, or
    * a soft-404 body (an HTTP-200 page whose content says "not found").
    * Lowercase literals, matched as one alternation against the
    * lowercased raw HTML (title AND body in one pass).
    */
  val parkedPhrases: Seq[String] = Seq(
    "domain is for sale", "buy this domain", "this domain has expired",
    "parked domain", "domain parking", "under construction",
    "coming soon", "page not found", "404 not found",
    "default web page", "temporarily unavailable")

  /** Soft-404 / parked-domain screen — the curation gate BESIDE
    * [[domainQuality]]: a parked domain is low-dup, low-quality
    * boilerplate (registrar landers, "coming soon" shells, soft-404
    * templates served with HTTP 200), so the dup-rate screen never
    * fires on it. Per-page signals, each independently cheap and
    * oracle-expressible: (1) a [[parkedPhrases]] template hit anywhere
    * in the lowercased HTML; (2) link-to-text dominance — anchors ≥
    * `linkRatioPpm` of anchors+words (the q366-style `<a ` count
    * against the extracted-text word count: parked pages are ad-link
    * farms); (3) a tiny distinct-token body (< `minDistinctTokens`
    * after tag-strip — a shell page says almost nothing). A HOST is
    * parked when it has ≥ `minPages` pages and flagged pages reach
    * `flagThresholdPct` — whole-domain drop, the RefinedWeb rule, not
    * per-page.
    *
    * All verdict arithmetic is exact integer cross-multiplication
    * (`100·n_flagged ≥ pct·n_pages`; `1e6·links ≥ ppm·(links+words)`)
    * — no float threshold can tie-flip between engines.
    *
    * Scale: the signals are a narrow per-row regex/HOF map (no UDF, no
    * shuffle of page content); the only exchange is the host-keyed
    * rollup, map-side combined, output host-cardinality-sized. At
    * 100 TB this composes with [[graft.ops.Web.registrableDomain]] to
    * screen at eTLD+1 granularity.
    */
  def parkedDomainScreen(pages: DataFrame, hostCol: String,
      htmlCol: String, minPages: Int = 2, flagThresholdPct: Int = 60,
      minDistinctTokens: Int = 8, linkRatioPpm: Long = 400000): DataFrame = {
    require(minPages >= 1, s"minPages must be >= 1, got $minPages")
    require(flagThresholdPct > 0 && flagThresholdPct <= 100)
    require(linkRatioPpm > 0 && linkRatioPpm <= 1000000)
    val html = col(htmlCol)
    val sig = pages
      .filter(col(hostCol).isNotNull && html.isNotNull)
      .select(col(hostCol).as("host"),
        lower(html).rlike(parkedPhrases.mkString("|")).as("tpl"),
        regexp_count(html, lit("<a ")).cast("long").as("n_links"),
        Web.htmlToText(html).as("_t"))
      .select(col("host"), col("tpl"), col("n_links"),
        TextOps.wsTokenCount(col("_t")).as("n_words"),
        size(array_distinct(TextOps.words(col("_t")))).cast("long")
          .as("n_distinct"))
      .withColumn("flagged",
        col("tpl") ||
          col("n_distinct") < minDistinctTokens ||
          lit(1000000L) * col("n_links") >=
            lit(linkRatioPpm) * (col("n_links") + col("n_words")))
    sig.groupBy("host")
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("tpl"), 1L).otherwise(0L)).as("n_template"),
        sum("n_links").as("n_links"),
        sum("n_words").as("n_words"),
        expr("sum(n_distinct) div count(1)").as("mean_distinct_tok"))
      .select(col("host"), col("n_pages"), col("n_flagged"),
        col("n_template"), col("n_links"), col("n_words"),
        col("mean_distinct_tok"),
        expr("(1000000 * n_flagged) div n_pages").as("flag_ppm"),
        (col("n_pages") >= minPages &&
          lit(100L) * col("n_flagged") >=
            lit(flagThresholdPct.toLong) * col("n_pages")).as("parked"))
  }

  /** Per-document Unicode script profile — the spoofing/spam/encoding
    * screen that catches mixed-script text (a "Latin" document full of
    * Cyrillic homoglyphs, CJK spill into an English shard) before
    * language-ID mislabels it. Exact per-script codepoint counts via
    * script property classes (all BMP-safe: Spark counts UTF-16 units,
    * DuckDB codepoints — identical for every script class used here),
    * dominant script by a PINNED tie order (latin > cyrillic > han >
    * arabic), and a mixed flag when ≥ 2 letter scripts co-occur.
    * Narrow per-row map, no shuffle.
    */
  def scriptMix(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) = regexp_count(t, lit(cls)).cast("long")
    df.filter(col(idCol).isNotNull && t.isNotNull)
      .select(col(idCol),
        cnt("\\p{IsLatin}").as("n_latin"),
        cnt("\\p{IsCyrillic}").as("n_cyrillic"),
        cnt("\\p{IsHan}").as("n_han"),
        cnt("\\p{IsArabic}").as("n_arabic"),
        cnt("[0-9]").as("n_digit"))
      .withColumn("dominant",
        when(col("n_latin") + col("n_cyrillic") + col("n_han") +
          col("n_arabic") === 0, "none")
          .when(col("n_latin") >= col("n_cyrillic") &&
            col("n_latin") >= col("n_han") &&
            col("n_latin") >= col("n_arabic"), "latin")
          .when(col("n_cyrillic") >= col("n_han") &&
            col("n_cyrillic") >= col("n_arabic"), "cyrillic")
          .when(col("n_han") >= col("n_arabic"), "han")
          .otherwise("arabic"))
      .withColumn("mixed",
        (when(col("n_latin") > 0, 1).otherwise(0) +
          when(col("n_cyrillic") > 0, 1).otherwise(0) +
          when(col("n_han") > 0, 1).otherwise(0) +
          when(col("n_arabic") > 0, 1).otherwise(0)) >= 2)
  }

  /** Tokenizer fertility by dominant script — the "how many tokens
    * per character does each script cost" audit that sizes token
    * budgets for multilingual corpora (Latin text tokenizes cheap;
    * CJK and mixed-script text fragments): per [[scriptMix]] dominant
    * class, exact totals and truncating milli ratios of characters
    * per whitespace token and per BPE-ish token (letter runs + single
    * digits + single punctuation — [[TextOps.bpeishTokenCount]]'s
    * regex). Zero-token classes emit null ratios.
    *
    * Scale: ONE narrow per-row projection (script counts, char count,
    * both token counts in the same row — no id re-join), one
    * map-side-combinable grouped aggregate.
    */
  def tokenizerFertility(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) = regexp_count(t, lit(cls)).cast("long")
    // ONE narrow projection computes script counts AND token counts —
    // joining scriptMix's output back to df would shuffle both sides
    // on id for columns that live in the same row
    val perDoc = df.filter(col(idCol).isNotNull && t.isNotNull)
      .select(cnt("\\p{IsLatin}").as("n_latin"),
        cnt("\\p{IsCyrillic}").as("n_cyrillic"),
        cnt("\\p{IsHan}").as("n_han"),
        cnt("\\p{IsArabic}").as("n_arabic"),
        length(t).cast("long").as("n_chars"),
        TextOps.wsTokenCount(t).as("n_ws"),
        TextOps.bpeishTokenCount(t).as("n_bpe"))
      .withColumn("dominant",
        when(col("n_latin") + col("n_cyrillic") + col("n_han") +
          col("n_arabic") === 0, "none")
          .when(col("n_latin") >= col("n_cyrillic") &&
            col("n_latin") >= col("n_han") &&
            col("n_latin") >= col("n_arabic"), "latin")
          .when(col("n_cyrillic") >= col("n_han") &&
            col("n_cyrillic") >= col("n_arabic"), "cyrillic")
          .when(col("n_han") >= col("n_arabic"), "han")
          .otherwise("arabic"))
    perDoc.groupBy("dominant")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
        sum("n_ws").as("ws_tokens"), sum("n_bpe").as("bpe_tokens"))
      .select(col("dominant"), col("n_docs"), col("chars"),
        col("ws_tokens"), col("bpe_tokens"),
        when(col("ws_tokens") > 0,
          expr("(1000 * chars) div ws_tokens")).as("chars_per_ws_milli"),
        when(col("bpe_tokens") > 0,
          expr("(1000 * chars) div bpe_tokens")).as("chars_per_bpe_milli"))
  }

  /** Readability profile — the Flesch-style complexity signal next to
    * the C4/Gopher filters (length and repetition say "is it text";
    * readability says "what register": legalese and OCR soup score
    * very low, children's prose very high — a real curriculum/mixing
    * axis). Counts are regex-exact and integer end to end:
    * sentences = `[.!?]+` runs (floored at 1 for non-empty text),
    * words = `[^ \t\n\r]+` runs (explicit class — Java's `\s` and
    * RE2's differ on vertical tab), syllable PROXY = `[aeiouy]+` runs
    * on the lowercased text (the standard estimator; all-consonant
    * tokens contribute 0 — documented). Flesch reading ease in milli:
    * `206835 − 1015·wps_milli div 1000 − 84600·spw_milli div 1000`
    * with `wps_milli = 1000·words div sentences` and
    * `spw_milli = 1000·syllables div words`, every division
    * truncating on non-negative operands in pinned order. Zero-word
    * docs emit null ratios. Narrow per-row map, no shuffle.
    */
  def readabilityMetrics(df: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val t = col(textCol)
    df.filter(col(idCol).isNotNull && t.isNotNull)
      .select(col(idCol),
        greatest(lit(1L), regexp_count(t, lit("[.!?]+")).cast("long"))
          .as("n_sentences"),
        regexp_count(t, lit("[^ \\t\\n\\r]+")).cast("long").as("n_words"),
        regexp_count(lower(t), lit("[aeiouy]+")).cast("long")
          .as("n_syllables"))
      .withColumn("wps_milli",
        when(col("n_words") > 0,
          expr("(1000 * n_words) div n_sentences")))
      .withColumn("spw_milli",
        when(col("n_words") > 0,
          expr("(1000 * n_syllables) div n_words")))
      .withColumn("flesch_milli",
        when(col("n_words") > 0,
          lit(206835L) - expr("(1015 * wps_milli) div 1000") -
            expr("(84600 * spw_milli) div 1000")))
  }

  /** Length-debiased quality score — LM quality proxies correlate
    * with document LENGTH (short docs get extreme per-token means),
    * so thresholding the raw score silently biases curation toward a
    * length profile. Here each document's [[graft.ops.TextOps
    * .unigramLogProb]] score is z-scored WITHIN its token-count band
    * (`bandWidth` tokens per band), so "good for its length" is the
    * ranking signal. The score is pinned to micro once (`round(·1e6)`
    * on the 6-d.p. score both engines already hash-agree on); band
    * moments are exact integers; z is the q141 whiten formula — ONE
    * pinned double chain `(n·x − S)/√(n·Σx² − S²)`, zero-variance
    * bands null.
    *
    * Scale: the LM scoring is unigramLogProb's own plan; on top, one
    * band-keyed moment aggregate (band cardinality ≈ maxlen/band) and
    * a broadcast join back. Nothing data-sized beyond the scoring.
    */
  def lengthDebiasedScore(df: DataFrame, textCol: String, idCol: String,
      bandWidth: Int = 10): DataFrame = {
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    val scored = TextOps.unigramLogProb(df, textCol, idCol)
      .select(col("id"), col("n_words"),
        expr(s"n_words div $bandWidth").as("band"),
        round(col("logprob") * 1000000).cast("long").as("score_micro"))
    // moment products ride decimal(38): bn·Σx² at micro scale passes
    // the long range around ~5k docs per band
    val moments = scored.groupBy("band")
      .agg(count(lit(1)).cast("decimal(38,0)").as("bn"),
        sum(col("score_micro").cast("decimal(38,0)")).as("bs"),
        sum((col("score_micro") * col("score_micro"))
          .cast("decimal(38,0)")).as("bss"))
    scored.join(broadcast(moments), Seq("band"))
      .select(col("id"), col("n_words"), col("band"), col("score_micro"),
        when(col("bn") * col("bss") - col("bs") * col("bs") > 0,
          round((col("bn") * col("score_micro") - col("bs")).cast("double")
            / sqrt((col("bn") * col("bss") - col("bs") * col("bs"))
              .cast("double")), 6)).as("z6"))
  }

  /** Filter-cascade overlap report — the design tool for ordering a
    * quality-filter stack: per rule (in the caller's pinned order),
    * its INDEPENDENT hit count, its MARGINAL hits (documents no
    * earlier rule already killed — a rule whose marginal is ~0 is
    * redundant where it sits), and the survivor count after the
    * prefix ending at it. Rules arrive as named boolean "violation"
    * Columns, so any predicate the engine can express can sit in the
    * cascade; nulls count as not-hit (a rule that cannot evaluate must
    * not kill).
    *
    * Scale: ONE pass — every rule and every prefix combination is a
    * conditional-sum column of the SAME aggregate (map-side
    * combinable), then the rule rows explode from the 1-row result
    * (the columnProfile shape). Work is rows × rules, shuffle is one
    * row.
    */
  def filterOverlapReport(df: DataFrame, idCol: String,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty && rules.size <= 64,
      s"rules out of range: ${rules.size}")
    val flagged = df.filter(col(idCol).isNotNull)
      .select(rules.zipWithIndex.map { case ((_, c), i) =>
        coalesce(c.cast("boolean"), lit(false)).as(s"_h$i")
      }: _*)
    val aggs = Seq(count(lit(1)).as("_total")) ++
      rules.indices.flatMap { i =>
        val anyPrev = (0 until i).map(j => col(s"_h$j"))
          .reduceOption(_ || _).getOrElse(lit(false))
        val anyUpto = (0 to i).map(j => col(s"_h$j")).reduce(_ || _)
        Seq(
          sum(when(col(s"_h$i"), 1L).otherwise(0L)).as(s"_hits$i"),
          sum(when(col(s"_h$i") && !anyPrev, 1L).otherwise(0L))
            .as(s"_marg$i"),
          sum(when(!anyUpto, 1L).otherwise(0L)).as(s"_kept$i"))
      }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val rows = array(rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i.toLong).as("rule_idx"), lit(name).as("rule"),
        col(s"_hits$i").as("n_hits"), col(s"_marg$i").as("n_marginal"),
        col(s"_kept$i").as("n_kept_after"))
    }: _*)
    one.select(col("_total"), explode(rows).as("r"))
      .select(col("r.rule_idx").as("rule_idx"), col("r.rule").as("rule"),
        col("r.n_hits").as("n_hits"),
        expr("case when _total > 0 then" +
          " (1000000 * r.n_hits) div _total end").as("hit_ppm"),
        col("r.n_marginal").as("n_marginal"),
        col("r.n_kept_after").as("n_kept_after"),
        expr("case when _total > 0 then" +
          " (1000000 * r.n_kept_after) div _total end").as("kept_ppm"),
        col("_total").as("n_docs"))
  }
}
