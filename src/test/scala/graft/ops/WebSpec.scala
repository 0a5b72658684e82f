package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL/domain curation operators ([[Web]]): registrable-domain edge
  * cases, blocklist semantics, and the law the two-phase salted
  * per-domain cap must satisfy — exact equality with the single global
  * window it replaces, on a corpus with one mega-hot domain.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  test("registrableDomain: plain, subdomain, multi-part suffix, short hosts") {
    val cases = Seq(
      "example.com" -> "example.com",
      "www.example.com" -> "example.com",
      "a.b.example.com" -> "example.com",
      "example.co.uk" -> "example.co.uk",
      "www.example.co.uk" -> "example.co.uk",
      "deep.sub.example.com.au" -> "example.com.au",
      // 2-label host whose WHOLE name is a multi-part suffix: too short
      // for eTLD+1, passes through as the last two labels
      "co.uk" -> "co.uk",
      "localhost" -> "localhost")
    val out = cases.map(_._1).toDF("host")
      .select(col("host"), Web.registrableDomain(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(out(h) == want, s"host=$h") }
  }

  test("urlParts: host excludes port; absent port/query are null") {
    val row = Seq("https://www.ex.co.uk:8443/a/b?x=1", "http://ex.com/p")
      .toDF("url")
      .select(col("url") +: Web.urlParts(col("url")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("url").collect()
    val full = row.find(_.getString(0).contains("8443")).get
    assert(full.getString(1) == "https" && full.getString(2) == "www.ex.co.uk")
    assert(full.getInt(3) == 8443 && full.getString(4) == "/a/b")
    assert(full.getString(5) == "x=1")
    val bare = row.find(!_.getString(0).contains("8443")).get
    assert(bare.isNullAt(3) && bare.getString(4) == "/p" && bare.isNullAt(5))
  }

  test("blocklistFilter drops exactly the blocked domains, broadcast side") {
    val df = Seq(("a.com", 1L), ("b.com", 2L), ("a.com", 3L)).toDF("domain", "id")
    val kept = Web.blocklistFilter(df, "domain", Seq("a.com", "zz.org"))
    assert(kept.select("id").as[Long].collect().toSet == Set(2L))
  }

  test("two-phase salted cap ≡ single global window, incl. a mega-hot domain") {
    import org.apache.spark.sql.expressions.Window
    // one domain with 5000 rows (the skew case the salting exists for),
    // a handful of small domains, score ties to exercise the tiebreak
    val rows = (0 until 5000).map(i => ("hot.com", i.toLong, (i % 7).toLong)) ++
      (0 until 9).map(i => (s"d$i.org", (10000 + i).toLong, 3L))
    val df = rows.toDF("domain", "id", "score")
    val order = Seq(col("score").desc, col("id").asc)
    val got = Web.domainDocCap(df, "domain", order, cap = 4,
        saltKey = Some(col("id")), salts = 8)
      .select("domain", "id", "dom_rank")
      .as[(String, Long, Int)].collect().toSet
    val want = df.withColumn("dom_rank",
        row_number().over(Window.partitionBy("domain").orderBy(order: _*)))
      .where(col("dom_rank") <= 4)
      .select("domain", "id", "dom_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(got == want && want.count(_._1 == "hot.com") == 4)
  }

  test("htmlToText: script first, entity order, whitespace collapse") {
    val html = """<html><head><title>T &amp; U</title><style>p {a:1}</style>
      |</head><body><p>x &lt;tag&gt; &amp;lt; y</p>
      |<script>if (1 < 2) { alert("z"); }</script>  <b>bold</b></body></html>"""
      .stripMargin
    val got = Seq(html).toDF("h")
      .select(Web.htmlTitle(col("h")).as("t"), Web.htmlToText(col("h")).as("b"))
      .as[(String, String)].head()
    assert(got._1 == "T &amp; U") // title extracted RAW, pre-decode
    // script removed before tag-strip (its inner `<` never derails the
    // stripper); &amp;lt; decodes to the literal "&lt;" because &amp; is
    // decoded last; style content gone; whitespace collapsed
    assert(got._2 == "T & U x <tag> &lt; y bold", s"got '${got._2}'")
  }

  test("canonicalizeUrl: case, port, slash, tracking params, sort, fragment") {
    val cases = Seq(
      "HTTPS://Site.COM:443/A/?b=2&utm_source=x&a=1#f" ->
        "https://site.com/A?a=1&b=2",
      "http://ex.org:80/" -> "http://ex.org/",
      "http://ex.org:8080/p" -> "http://ex.org:8080/p", // non-default kept
      "https://ex.org" -> "https://ex.org/", // empty path → root
      "https://ex.org/p?gclid=g&fbclid=f&utm_medium=m" -> "https://ex.org/p",
      "ftp://Ex.org:443/f" -> "ftp://ex.org:443/f") // 443 only default for https
    val got = cases.map(_._1).toDF("u")
      .select(Web.canonicalizeUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("htmlToText leaves plain text unchanged modulo whitespace") {
    val got = Seq("no   markup\nhere").toDF("h")
      .select(Web.htmlToText(col("h"))).as[String].head()
    assert(got == "no markup here")
  }
}
