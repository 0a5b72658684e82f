package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The HTTP path needs egress; what *is* testable offline is the response
  * parsing contract against captured ip-api.com response shapes (field
  * selection per reference advanced_elb_logs_etl.py:176).
  */
class HttpGeoResolverSpec extends AnyFunSuite {
  private val r = new HttpGeoResolver()
  private val t = Timestamp.valueOf("2025-01-01 00:00:00")

  test("success payload maps all 12 fields") {
    val body = """{"status":"success","country":"United States","countryCode":"US",
      "region":"CA","regionName":"California","city":"Mountain View",
      "lat":37.4056,"lon":-122.0775,"isp":"Google LLC","query":"8.8.8.8"}"""
    val g = r.parseJson(body, "8.8.8.8", t)
    assert(g.status == "success")
    assert(g.country.contains("United States"))
    assert(g.countryCode.contains("US"))
    assert(g.city.contains("Mountain View"))
    assert(g.lat.contains(37.4056))
    assert(g.lon.contains(-122.0775))
    assert(g.isp.contains("Google LLC"))
    assert(g.query == "8.8.8.8")
  }

  test("failure payload keeps message and nulls attributes") {
    val body = """{"status":"fail","message":"private range","query":"10.0.0.1"}"""
    val g = r.parseJson(body, "10.0.0.1", t)
    assert(g.status == "fail")
    assert(g.message.contains("private range"))
    assert(g.country.isEmpty && g.lat.isEmpty)
    assert(g.query == "10.0.0.1")
  }

  test("garbage body degrades to fail with default message") {
    val g = r.parseJson("<html>502</html>", "1.2.3.4", t)
    assert(g.status == "fail")
    assert(g.query == "1.2.3.4")
  }

  test("escaped quotes in values are handled") {
    val body = """{"status":"success","isp":"Foo \"Bar\" ISP","query":"1.1.1.1"}"""
    val g = r.parseJson(body, "1.1.1.1", t)
    assert(g.isp.contains("Foo \\\"Bar\\\" ISP") || g.isp.exists(_.contains("Bar")))
  }
}
