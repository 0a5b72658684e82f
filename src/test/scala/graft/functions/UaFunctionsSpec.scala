package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-world UA corpus through the family expressions — detection-order
  * cases (Edge/Opera/Samsung UAs contain "Chrome"; Chrome UAs contain
  * "Safari") and the bot token list.
  */
class UaFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(String, String, String, Boolean)] = Seq(
    // (ua, browser family, os family, is_bot)
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Edge", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0",
      "Opera", "Windows", false),
    ("Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
      "Samsung Internet", "Android", false),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
      "Safari", "Mac OS X", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1",
      "Mobile Safari", "iOS", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
      "Chrome Mobile iOS", "iOS", false),
    ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Ubuntu", false),
    ("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36",
      "Chrome Mobile", "Android", false),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
      "IE", "Windows", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) EdgiOS/120.2210.86 Mobile/15E148 Safari/605.1.15",
      "Edge Mobile", "iOS", false),
    ("Mozilla/5.0 (Linux; Android 14) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36 EdgA/120.0.2210.89",
      "Edge Mobile", "Android", false),
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "Googlebot", "Other", true),
    ("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
      "bingbot", "Other", true),
    ("curl/8.4.0", "curl", "Other", false),
    ("python-requests/2.31.0", "Python Requests", "Other", false),
    ("python-urllib/3.11", "Python-urllib", "Other", true),
    ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Chrome OS", false),
    ("-", "Unknown", "Unknown", false))

  test("UA corpus: browser family, OS family, bot flag") {
    val got = corpus.map(_._1).toDF("ua")
      .select(col("ua"),
        UaFunctions.uaBrowserFamily(col("ua")).as("b"),
        UaFunctions.uaOsFamily(col("ua")).as("o"),
        UaFunctions.isBot(col("ua")).as("bot"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    corpus.foreach { case (ua, b, o, bot) =>
      assert(got(ua) == ((b, o, bot)), s"UA: $ua")
    }
  }
}
