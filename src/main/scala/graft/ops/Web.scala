package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL / domain operators for web-scale corpus curation: host + URL
  * decomposition, registrable-domain extraction, domain blocklisting,
  * and per-domain document caps — the provenance-side controls every
  * crawl-derived training corpus applies before text-level cleaning.
  *
  * Scale shape: decomposition and registrable-domain are narrow (pure
  * `Column` expressions over the scan — `parse_url` is codegen'd);
  * the blocklist is a broadcast anti-join (the blocklist is always
  * tiny relative to the corpus); the per-domain cap is the one
  * genuinely shuffling step and uses a two-phase salted window so a
  * mega-domain (a crawl is routinely 10%+ one domain) never lands in
  * a single window task — phase 1 ranks within (domain, salt) and
  * keeps ≤ cap rows per salt, phase 2 ranks the ≤ salts·cap
  * survivors per domain exactly. Any row in the true global top-cap
  * of its domain is necessarily in the top-cap of its salt bucket, so
  * the two-phase result is EXACTLY the single-window result while the
  * per-task partition height drops from |domain| to |domain|/salts.
  */
object Web {

  /** Multi-part public suffixes the registrable-domain heuristic
    * recognizes (embedded subset; a production deployment broadcasts
    * the full public-suffix list as a table and joins on the longest
    * matching suffix — same plan shape, bigger dictionary).
    */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "co.in", "com.br", "com.cn")

  /** Host of a URL (no port), null for unparsable input. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** URL decomposition columns, name → expression: protocol, host,
    * explicit port (null when absent), path, query (null when absent).
    * All codegen'd built-ins; the port rides a regex over the
    * authority because `parse_url` has no PORT key.
    */
  def urlParts(url: Column): Seq[(String, Column)] = Seq(
    "proto" -> parse_url(url, lit("PROTOCOL")),
    "host" -> host(url),
    "port" -> nullif(regexp_extract(url, "^[a-z]+://[^/:?#]*:([0-9]+)", 1), lit(""))
      .cast("int"),
    "path" -> parse_url(url, lit("PATH")),
    "query" -> parse_url(url, lit("QUERY")))

  /** Registrable domain (eTLD+1) of a host: the last two labels, or
    * the last three when the last two are a recognized multi-part
    * public suffix (`a.b.src.co.uk` → `src.co.uk`, `www.src.com` →
    * `src.com`). Hosts with fewer labels than needed pass through
    * unchanged. Narrow; the `when` guards keep negative `element_at`
    * indices in-bounds under ANSI.
    */
  def registrableDomain(hostCol: Column): Column = {
    val l = split(hostCol, "\\.")
    val n = size(l)
    def tail(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(l, -i)): _*)
    when(n >= 3 && tail(2).isin(multiPartSuffixes: _*), tail(3))
      .when(n >= 2, tail(2))
      .otherwise(hostCol)
  }

  /** Drop rows whose registrable domain is on the blocklist. The
    * blocklist becomes a broadcast build side of an anti-join —
    * never a shuffle of the corpus (for a handful of entries an
    * `isin` literal filter would also do, but the join form scales
    * to real blocklists of 10⁵⁺ domains without a plan change).
    */
  def blocklistFilter(df: DataFrame, domainCol: String,
      blocked: Seq[String]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val b = broadcast(blocked.toDF("_blocked_domain"))
    df.join(b, df(domainCol) === b("_blocked_domain"), "left_anti")
  }

  /** Keep at most `cap` rows per domain, best-first by `order`
    * (ties must be broken to a total order by the caller — e.g.
    * `Seq(col("score").desc, col("id"))`), emitting the exact global
    * per-domain rank as `rankCol`. Two-phase salted window (see
    * object doc): identical output to one global window, bounded
    * per-task height.
    */
  def domainDocCap(df: DataFrame, domainCol: String, order: Seq[Column],
      cap: Int, rankCol: String = "dom_rank", salts: Int = 16,
      saltKey: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val salt = pmod(hash(saltKey.getOrElse(monotonically_increasing_id())),
      lit(salts))
    val pre = Window.partitionBy(col(domainCol), col("_salt"))
      .orderBy(order: _*)
    val fin = Window.partitionBy(col(domainCol)).orderBy(order: _*)
    df.withColumn("_salt", salt)
      .withColumn("_pre_rank", row_number().over(pre))
      .where(col("_pre_rank") <= cap)
      .withColumn(rankCol, row_number().over(fin))
      .where(col(rankCol) <= cap)
      .drop("_salt", "_pre_rank")
  }

  /** HTML → text extraction (the first text-level step of a crawl
    * pipeline, before any quality/dedup op sees the document):
    * script/style subtrees removed FIRST (their character data is not
    * content, and an embedded `<` inside code would otherwise derange
    * the tag stripper), then tags → whitespace, the five ubiquitous
    * character entities decoded (`&amp;` last, so `&amp;lt;` correctly
    * yields the literal `&lt;`), and whitespace collapsed.
    *
    * Narrow, codegen'd `regexp_replace` chain over the scan — zero
    * shuffle, the same per-row cost model as the ELB parse projection.
    * A production extractor adds boilerplate heuristics (link-density,
    * block scoring) on top of this skeleton; those are per-row too.
    */
  /** URL canonicalization — the normalization pass before URL-keyed
    * dedup, so `HTTPS://Site.COM:443/a/?b=2&utm_source=x&a=1#f` and
    * `https://site.com/a?a=1&b=2` collapse. Rules, in order: fragment
    * dropped; scheme + authority lowercased; default port stripped
    * (`:80` http, `:443` https); non-root trailing slash dropped;
    * tracking params (`utm_*`, `gclid`, `fbclid`) removed; remaining
    * params sorted. Pure narrow expression chain — no shuffle, no UDF;
    * the param sort is a bounded in-row `array_sort`.
    *
    * Path case and param VALUES are preserved (they are semantic);
    * anchored RE2-compatible regexes only, so the same patterns run on
    * any engine.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val rest = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]*(.*)$", 1)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/"))
      .when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_join(array_sort(filter(split(query, "&"),
      p => !p.rlike("^(utm_[^=]*|gclid|fbclid)(=.*)?$") && p =!= lit(""))), "&")
    concat(scheme, lit("://"), auth, path,
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?s)<title>(.*?)</title>", 1)

  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
