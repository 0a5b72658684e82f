package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential UA corpus: 60+ real-world User-Agent strings with the
  * family the public uap-core ruleset reports, spanning desktop/mobile
  * browsers, in-app WebViews, smart TVs, feature phones, mail clients,
  * HTTP tools, and the crawler long tail. Detection-order cases are the
  * point: Edge/Opera/Samsung UAs contain "Chrome"; Chrome UAs contain
  * "Safari"; KaiOS contains the substring "iOS"; Outlook UAs contain
  * "MSIE"/"Trident". The bot flag follows the reference's token list
  * (bot|spider|crawler|python-urllib), so e.g. Yahoo! Slurp is NOT
  * flagged — reference parity, not an oversight.
  */
class UaFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[(String, String, String, Boolean)] = Seq(
    // (ua, browser family, os family, is_bot)
    // ——— desktop browsers
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Edge", "Windows", false),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Edge", "Mac OS X", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/64.0.3282.140 Safari/537.36 Edge/18.17763",
      "Edge", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 OPR/106.0.0.0",
      "Opera", "Windows", false),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
      "Safari", "Mac OS X", false),
    ("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Ubuntu", false),
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chromium/119.0.0.0 Chrome/119.0.0.0 Safari/537.36",
      "Chromium", "Linux", false),
    ("Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0) like Gecko",
      "IE", "Windows", false),
    ("Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.1)",
      "IE", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 YaBrowser/23.11.0.0 Safari/537.36",
      "Yandex Browser", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5",
      "Vivaldi", "Windows", false),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Brave/120",
      "Brave", "Windows", false),
    ("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Chrome OS", false),
    // ——— mobile browsers
    ("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36",
      "Chrome Mobile", "Android", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1",
      "Mobile Safari", "iOS", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
      "Chrome Mobile iOS", "iOS", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15",
      "Firefox iOS", "iOS", false),
    ("Mozilla/5.0 (Android 14; Mobile; rv:121.0) Gecko/121.0 Firefox/121.0",
      "Firefox Mobile", "Android", false),
    ("Mozilla/5.0 (Linux; Android 14; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
      "Samsung Internet", "Android", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) EdgiOS/120.2210.86 Mobile/15E148 Safari/605.1.15",
      "Edge Mobile", "iOS", false),
    ("Mozilla/5.0 (Linux; Android 14) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36 EdgA/120.0.2210.89",
      "Edge Mobile", "Android", false),
    ("Opera/9.80 (Android; Opera Mini/7.5.54678/28.2555; U; ru) Presto/2.10.289 Version/12.02",
      "Opera Mini", "Android", false),
    ("Mozilla/5.0 (Linux; Android 14) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36 OPR/79.3.4195",
      "Opera Mobile", "Android", false),
    ("Mozilla/5.0 (Linux; U; Android 12; en-US; RMX3085 Build/SP1A.210812.016) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.4.0.1306 Mobile Safari/537.36",
      "UC Browser", "Android", false),
    ("Mozilla/5.0 (Linux; U; Android 13; en-us; 22101316G Build/TP1A.220624.014) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/112.0.5615.136 Mobile Safari/537.36 XiaoMi/MiuiBrowser/14.20.0-gn",
      "MiuiBrowser", "Android", false),
    // device model ends in "bot" — must NOT hijack the browser family
    // (the reference's token heuristic still flags it a bot: known FP)
    ("Mozilla/5.0 (Linux; Android 11; Cubot Note 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/98.0.4758.101 Mobile Safari/537.36",
      "Chrome Mobile", "Android", true),
    // ——— WebViews, in-app browsers, devices
    ("Mozilla/5.0 (Linux; Android 10; K; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/120.0.6099.210 Mobile Safari/537.36",
      "Chrome Mobile WebView", "Android", false),
    ("Mozilla/5.0 (Linux; Android 9; KFMAWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/94.2.1 like Chrome/94.0.4606.71 Safari/537.36",
      "Amazon Silk", "Android", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/21B91 [FBAN/FBIOS;FBAV/443.0.0.25.106]",
      "Facebook", "iOS", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/20G81 Instagram 302.1.0.34.111",
      "Instagram", "iOS", false),
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) GSA/294.0.577695730 Mobile/15E148 Safari/604.1",
      "Google", "iOS", false),
    ("Mozilla/5.0 (SMART-TV; Linux; Tizen 5.5) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/3.0 TV Safari/537.36",
      "Samsung Internet", "Tizen", false),
    ("Mozilla/5.0 (Mobile; Nokia_8110_4G; rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5",
      "Firefox Mobile", "KaiOS", false),
    ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/119.0.6045.105 Safari/537.36",
      "HeadlessChrome", "Linux", false),
    // ——— mail clients
    ("Mozilla/5.0 (X11; Linux x86_64; rv:102.0) Gecko/20100101 Thunderbird/102.11.0",
      "Thunderbird", "Linux", false),
    ("Mozilla/4.0 (compatible; MSIE 7.0; Windows NT 10.0; WOW64; Trident/7.0; Microsoft Outlook 16.0.16827)",
      "Outlook", "Windows", false),
    // ——— named search-engine crawlers
    ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "Googlebot", "Other", true),
    ("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
      "bingbot", "Other", true),
    ("DuckDuckBot/1.0; (+http://duckduckgo.com/duckduckbot.html)",
      "DuckDuckBot", "Other", true),
    ("Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
      "YandexBot", "Other", true),
    ("Mozilla/5.0 (compatible; Baiduspider/2.0; +http://www.baidu.com/search/spider.html)",
      "Baiduspider", "Other", true),
    ("Mozilla/5.0 (compatible; Yahoo! Slurp; http://help.yahoo.com/help/us/ysearch/slurp)",
      "Yahoo! Slurp", "Other", false), // no bot/spider/crawler token — reference parity
    ("facebookexternalhit/1.1 (+http://www.facebook.com/externalhit_uatext.php)",
      "FacebookBot", "Other", false), // ditto: token list misses it
    // ——— crawler long tail (generic bot/spider token capture)
    ("Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
      "AhrefsBot", "Other", true),
    ("Mozilla/5.0 (compatible; SemrushBot/7~bl; +http://www.semrush.com/bot.html)",
      "SemrushBot", "Other", true),
    ("Mozilla/5.0 (compatible; PetalBot;+https://webmaster.petalsearch.com/site/petalbot)",
      "PetalBot", "Other", true),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_5) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.1.1 Safari/605.1.15 (Applebot/0.1; +http://www.apple.com/go/applebot)",
      "Applebot", "Mac OS X", true),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_1) AppleWebKit/600.2.5 (KHTML, like Gecko) Version/8.0.2 Safari/600.2.5 (Amazonbot/0.1; +https://developer.amazon.com/support/amazonbot)",
      "Amazonbot", "Mac OS X", true),
    ("Twitterbot/1.0", "Twitterbot", "Other", true),
    ("Slackbot-LinkExpanding 1.0 (+https://api.slack.com/robots)",
      "Slackbot", "Other", true),
    ("Mozilla/5.0 (compatible; Discordbot/2.0; +https://discordapp.com)",
      "Discordbot", "Other", true),
    ("TelegramBot (like TwitterBot)", "TelegramBot", "Other", true),
    ("Mozilla/5.0 (compatible; MJ12bot/v1.4.8; http://mj12bot.com/)",
      "MJ12bot", "Other", true),
    ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko); compatible; GPTBot/1.0; +https://openai.com/gptbot",
      "GPTBot", "Other", true),
    ("Mozilla/5.0 (compatible; DotBot/1.2; +https://opensiteexplorer.org/dotbot; help@moz.com)",
      "DotBot", "Other", true),
    ("Mozilla/5.0 (Linux; Android 5.0) AppleWebKit/537.36 (KHTML, like Gecko) Mobile Safari/537.36 (compatible; Bytespider; spider-feedback@bytedance.com)",
      "Bytespider", "Android", true),
    // ——— HTTP tools and SDKs
    ("curl/8.4.0", "curl", "Other", false),
    ("Wget/1.21.4", "Wget", "Other", false),
    ("python-requests/2.31.0", "Python Requests", "Other", false),
    ("python-urllib/3.11", "Python-urllib", "Other", true),
    ("Apache-HttpClient/4.5.13 (Java/11.0.19)", "Apache-HttpClient", "Other", false),
    ("okhttp/4.12.0", "okhttp", "Other", false),
    ("Java/17.0.8", "Java", "Other", false),
    ("Go-http-client/2.0", "Go-http-client", "Other", false),
    ("WhatsApp/2.23.20.0", "WhatsApp", "Other", false),
    ("PostmanRuntime/7.36.0", "Other", "Other", false), // honest fallback
    // ——— degenerate inputs
    ("-", "Unknown", "Unknown", false),
    ("", "Unknown", "Unknown", false))

  test("UA corpus: browser family, OS family, bot flag") {
    assert(corpus.size >= 60)
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
