package graft.geo

import java.sql.Timestamp

/** One geolocation record — the 12-column cache row layout
  * (reference schema: advanced_elb_logs_etl.py:203-206; field list matches
  * the ip-api.com `fields=` selection at advanced_elb_logs_etl.py:176).
  */
case class GeoRecord(
    status: String,
    message: Option[String],
    country: Option[String],
    countryCode: Option[String],
    region: Option[String],
    regionName: Option[String],
    city: Option[String],
    lat: Option[Double],
    lon: Option[Double],
    isp: Option[String],
    query: String,
    api_fetch_timestamp: Timestamp)

/** Effectful per-IP enrichment service, isolated from the dataflow so the
  * engine can swap a deterministic offline implementation in tests/bench.
  *
  * This is deliberately NOT a UDF/expression: the reference's HTTP lookup is
  * serial and rate-limited (0.7 s sleep per miss, retry on 429 —
  * advanced_elb_logs_etl.py:174-199, 239-242). A parallel executor-side UDF
  * would violate the rate limit and duplicate calls on task retry. The
  * resolver therefore runs once, driver-side, over the *distinct cache-miss
  * set only* — which is small relative to log volume (memoized across runs).
  * At 100 TB the miss set is still bounded by distinct-new-IP cardinality,
  * not data size; if it ever outgrew the driver, the same trait could be run
  * in a single-partition `mapPartitions` stage without changing callers.
  */
trait GeoResolver {
  def resolve(ips: Seq[String]): Seq[GeoRecord]
}

/** Deterministic offline resolver for tests and benchmarks: derives stable
  * pseudo-geo attributes from a hash of the IP. Mirrors the failure shape of
  * the HTTP API (some IPs yield status='fail' with null attributes).
  */
class OfflineGeoResolver(fetchTime: Timestamp = Timestamp.valueOf("2025-01-01 00:00:00"))
    extends GeoResolver {

  private val countries = Vector(
    ("United States", "US", "California", "Los Angeles", "AT&T"),
    ("Germany", "DE", "Bavaria", "Munich", "Deutsche Telekom"),
    ("Japan", "JP", "Tokyo", "Tokyo", "NTT"),
    ("Brazil", "BR", "Sao Paulo", "Sao Paulo", "Vivo"),
    ("India", "IN", "Maharashtra", "Mumbai", "Jio"),
    ("France", "FR", "Ile-de-France", "Paris", "Orange"))

  override def resolve(ips: Seq[String]): Seq[GeoRecord] = ips.map { ip =>
    val h = scala.util.hashing.MurmurHash3.stringHash(ip)
    // floorMod, not math.abs(h) % n: abs(Int.MinValue) is still negative,
    // which would make the index lookup throw on 1-in-2^32 IPs
    def idx(n: Int): Int = Math.floorMod(h, n)
    if (idx(17) == 0) {
      GeoRecord("fail", Some("private range"), None, None, None, None, None,
        None, None, None, ip, fetchTime)
    } else {
      val (country, cc, regionName, city, isp) = countries(idx(countries.size))
      GeoRecord("success", None, Some(country), Some(cc), Some(cc + "-R"),
        Some(regionName), Some(city), Some(idx(180) - 90 + 0.5),
        Some(idx(360) - 180 + 0.5), Some(isp), ip, fetchTime)
    }
  }
}

/** Production-shaped HTTP resolver against the public ip-api.com JSON API —
  * serial, rate-limited, bounded retries on HTTP 429. Not exercised in this
  * zero-egress environment (tests/bench use [[OfflineGeoResolver]]).
  */
class HttpGeoResolver(
    endpoint: String = "http://ip-api.com/json",
    sleepMs: Long = 700,
    timeoutMs: Long = 5000,
    maxRetries: Int = 5) extends GeoResolver {

  private val fields = "status,message,country,countryCode,region,regionName,city,lat,lon,isp,query"

  override def resolve(ips: Seq[String]): Seq[GeoRecord] = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    ips.map { ip =>
      val rec = fetchOne(client, ip, maxRetries)
      Thread.sleep(sleepMs)
      rec
    }
  }

  private def fetchOne(client: java.net.http.HttpClient, ip: String, retries: Int): GeoRecord = {
    val now = new Timestamp(System.currentTimeMillis())
    try {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"$endpoint/$ip?fields=$fields"))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 429 && retries > 0) {
        Thread.sleep(1000)
        fetchOne(client, ip, retries - 1)
      } else parseJson(resp.body(), ip, now)
    } catch {
      case e: Exception =>
        GeoRecord("fail", Some(e.getMessage), None, None, None, None, None,
          None, None, None, ip, now)
    }
  }

  /** Minimal flat-JSON field extraction (the API returns a flat object).
    * Package-visible for tests (the HTTP path itself needs egress).
    */
  private[geo] def parseJson(body: String, ip: String, now: Timestamp): GeoRecord = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(body).map(_.group(1))
    def num(k: String): Option[Double] =
      ("\"" + k + "\"\\s*:\\s*(-?[0-9.]+)").r
        .findFirstMatchIn(body).flatMap(m => m.group(1).toDoubleOption)
    val status = str("status").getOrElse("fail")
    if (status == "success")
      GeoRecord(status, None, str("country"), str("countryCode"), str("region"),
        str("regionName"), str("city"), num("lat"), num("lon"), str("isp"),
        str("query").getOrElse(ip), now)
    else
      GeoRecord("fail", str("message").orElse(Some("API Error")), None, None,
        None, None, None, None, None, None, ip, now)
  }
}
