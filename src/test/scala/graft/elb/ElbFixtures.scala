package graft.elb

import java.io.{BufferedWriter, OutputStreamWriter, FileOutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

/** Deterministic `.gz` ELB access-log fixtures, generated at test time.
  * Line inventory follows FIXTURES.md §A: the reference's golden line
  * (reference: tests/test_advanced_elb_logs_etl.py:35-43) verbatim, plus
  * sentinel / second-format / rejection / bot / session-traffic variants.
  */
object ElbFixtures {

  /** The reference's golden ALB log line. */
  val golden: String =
    "h2 2025-05-26T23:55:02.179979Z app/erank-app/88dfa9dc536560af 3.135.238.214:60827 " +
    "172.31.37.43:80 0.001 0.303 0.000 200 200 74 1013 " +
    "\"POST https://beta.erank.com:443/api/browser-ext-user HTTP/2.0\" " +
    "\"Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) " +
    "Chrome/137.0.0.0 Safari/537.36\" TLS_AES_128_GCM_SHA256 TLSv1.3 " +
    "arn:aws:elasticloadbalancing:us-west-2:848357551741:targetgroup/erank-app-v3-production/902b52047b6f4e28 " +
    "\"Root=1-6834ff55-4f9107ec4dcec228218b6176\" \"beta.erank.com\" \"session-reused\" 1 " +
    "2025-05-26T23:55:01.875000Z \"waf,forward\" \"-\" \"-\" \"172.31.37.43:80\" \"200\" \"-\" \"-\""

  private def variant(ts: String, ip: String, times: (String, String, String),
      status: String, request: String, ua: String): String =
    s"h2 $ts app/test/1 $ip:5000 172.31.0.1:80 ${times._1} ${times._2} ${times._3} " +
    s"$status $status 100 200 \"$request\" \"$ua\" TLS_AES_128_GCM_SHA256 TLSv1.3 " +
    "arn:aws:elb:us-west-2:1:tg/t/1 \"Root=1-0-0\" \"example.com\" \"-\" 1 " +
    s"$ts \"forward\" \"-\" \"-\" \"172.31.0.1:80\" \"$status\" \"-\" \"-\""

  val chromeUa = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/137.0.0.0 Safari/537.36"

  /** Sentinel '-' numerics (ELB emits '-' on e.g. connection errors). */
  val sentinelLine: String = variant("2025-05-26T10:00:00.000000Z", "10.0.0.1",
    ("-", "-", "-"), "-", "GET https://example.com:443/x HTTP/1.1", chromeUa)

  /** Second accepted timestamp layout: no fractional seconds. */
  val secondFormatLine: String = variant("2025-05-26T10:00:07Z", "10.0.0.2",
    ("0.1", "0.2", "0.3"), "404", "GET https://example.com:443/a/b/c?q=1 HTTP/1.1", chromeUa)

  /** < 29 tokens — must be rejected (F1). */
  val shortLine: String = "h2 2025-05-26T10:00:00.000000Z app/test/1 10.0.0.3:1"

  /** Unparseable timestamp — must be rejected (F2). */
  val badTsLine: String = variant("not-a-timestamp", "10.0.0.4",
    ("0.1", "0.1", "0.1"), "200", "GET https://example.com:443/ HTTP/1.1", chromeUa)

  /** Malformed request field (< 3 tokens) → Unknown method, null URL parts. */
  val badRequestLine: String = variant("2025-05-26T10:00:01.000000Z", "10.0.0.5",
    ("0.1", "0.1", "0.1"), "503", "weird", chromeUa)

  /** Bot UA. */
  val botLine: String = variant("2025-05-26T10:00:02.000000Z", "10.0.0.6",
    ("0.0", "0.0", "0.0"), "200", "GET https://example.com:443/robots.txt HTTP/1.1",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")

  /** '-' UA → Unknown families, not a bot. */
  val dashUaLine: String = variant("2025-05-26T10:00:03.000000Z", "10.0.0.7",
    ("0.0", "0.0", "0.0"), "301", "GET http://example.com:80/ HTTP/1.1", "-")

  /** Session traffic for one IP: a burst (1-minute spacing) then a > 30 min
    * gap then a second burst — exercises W1-W4 + sessionization.
    */
  def sessionLines(ip: String): Seq[String] = {
    val burst1 = (0 to 3).map(i => f"2025-05-26T12:0$i%d:00.000000Z")
    val burst2 = (0 to 2).map(i => f"2025-05-26T12:4$i%d:00.000000Z")
    (burst1 ++ burst2).map(ts => variant(ts, ip, ("0.01", "0.02", "0.03"), "200",
      "GET https://example.com:443/s HTTP/1.1", chromeUa))
  }

  val allLines: Seq[String] =
    Seq(golden, sentinelLine, secondFormatLine, shortLine, badTsLine,
      badRequestLine, botLine, dashUaLine) ++ sessionLines("10.1.1.1")

  /** Write lines as a gzip file; returns the file path. */
  def writeGz(dir: Path, name: String, lines: Seq[String]): String = {
    Files.createDirectories(dir)
    val f = dir.resolve(name).toFile
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(f)), "UTF-8"))
    try lines.foreach { l => w.write(l); w.write("\n") } finally w.close()
    f.getAbsolutePath
  }

  /** One canonical fixture file in a fresh temp dir. */
  def standardFixture(): String = {
    val dir = Files.createTempDirectory("elb-fixture")
    writeGz(dir, "fixture.log.gz", allLines)
  }
}
