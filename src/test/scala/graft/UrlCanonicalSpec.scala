package graft

import org.apache.spark.sql.functions._
import graft.ops.UrlCanonical.canonicalizeUrl

/** Edge semantics of the URL canonical key — cases the oracle query's
  * deterministic synthesis doesn't reach. */
class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("variants of the same page collapse; distinct pages stay distinct") {
    val Seq(a, b, c, d, e) = canon(
      "https://Example.com/a/b",
      "HTTP://WWW.EXAMPLE.COM:80/a/b",
      "https://example.com/a/b/#section-2",
      "https://example.com/a/b?utm_source=x&utm_medium=y&utm_campaign=z",
      "https://example.com/a/c")
    assert(a == "example.com/a/b")
    assert(b == a && c == a && d == a)
    assert(e == "example.com/a/c" && e != a)
  }

  test("real query params survive the tracking strip in any position") {
    val Seq(lead, mid, tail, only) = canon(
      "https://example.com/s?utm_source=f&q=1&page=2",
      "https://example.com/s?q=1&utm_source=f&page=2",
      "https://example.com/s?q=1&page=2&utm_source=f",
      "https://example.com/s?q=1&page=2")
    assert(Set(lead, mid, tail, only) == Set("example.com/s?q=1&page=2"),
      s"got $lead / $mid / $tail / $only")
    assert(canon("https://example.com/s?fbclid=abc123").head == "example.com/s")
  }

  test("canonicalization is idempotent") {
    val raw = Seq(
      "https://WWW.Example.com:443/a/?utm_source=x#f",
      "http://example.com/",
      "example.com/plain",
      "https://example.com/a?q=1&utm_campaign=c&r=2")
    val once = canon(raw: _*)
    val twice = canon(once: _*)
    assert(once == twice, s"not a fixed point: $once vs $twice")
  }

  test("non-default ports and look-alike params are preserved") {
    // :8080 is a real distinction; 'autumn_sale=1' must not match utm_*;
    // a path segment containing 'utm_x=' is not a query param but IS
    // stripped only when it parses as one — the guard is the [?&]/& form
    val Seq(port, look) = canon(
      "https://example.com:8080/a",
      "https://example.com/a?autumn_sale=1")
    assert(port == "example.com:8080/a")
    assert(look == "example.com/a?autumn_sale=1")
  }
}
