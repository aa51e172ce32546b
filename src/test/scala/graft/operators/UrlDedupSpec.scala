package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions.col

class UrlDedupSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(TextFunctions.canonicalUrl(col("u")))
      .collect()(0).getString(0)

  test("canonicalUrl collapses the five variant classes") {
    val expected = "https://example.com/a"
    assert(canon("https://example.com/a#section") === expected)       // fragment
    assert(canon("https://example.com/a?utm_source=x") === expected)  // tracking
    assert(canon("HTTPS://WWW.EXAMPLE.COM/a") === expected)           // case + www
    assert(canon("https://example.com:443/a") === expected)           // default port
    assert(canon("https://example.com/a/") === expected)              // trailing slash
  }

  test("canonicalUrl keeps meaningful query params and path case") {
    assert(canon("https://example.com/A?id=3&utm_medium=m") ===
      "https://example.com/A?id=3")
    assert(canon("https://example.com/a?utm_a=1&id=2&utm_b=3") ===
      "https://example.com/a?id=2")
    assert(canon("http://host.com:8080/x") === "http://host.com:8080/x") // non-default port
  }

  test("tracking removal is anchored: containing-names and path segments untouched") {
    // a param whose NAME merely contains "utm_" is not a tracking param
    assert(canon("https://a.com/p?page_utm_x=1&id=2") ===
      "https://a.com/p?page_utm_x=1&id=2")
    // a path segment containing "gclid=" is not a query param
    assert(canon("https://a.com/gclid=5/article") === "https://a.com/gclid=5/article")
    // interior tracking param leaves exactly one separator behind
    assert(canon("https://a.com/p?a=1&utm_x=2&b=3") === "https://a.com/p?a=1&b=3")
    assert(canon("https://a.com/p?utm_a=1&utm_b=2&id=3") === "https://a.com/p?id=3")
  }

  test("malformed URLs pass through cleaned, not erroring") {
    assert(canon("not a url#frag") === "not a url")
  }

  test("min-id survivor per canonical key; uniques kept") {
    val docs = Seq(
      (5L, "https://a.com/p?utm_source=x"),
      (2L, "HTTPS://WWW.A.COM/p"),
      (9L, "https://a.com/p/"),
      (7L, "https://b.com/q")
    ).toDF("doc_id", "url")
    val out = UrlDedup.dedupByCanonicalUrl(docs, "doc_id", "url")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      (2L, "https://a.com/p", true),
      (5L, "https://a.com/p", false),
      (7L, "https://b.com/q", true),
      (9L, "https://a.com/p", false)))
  }

  test("plan has exactly one shuffle (the canonical-key window)") {
    val docs = Seq((1L, "https://a.com/p")).toDF("doc_id", "url")
    val plan = UrlDedup.dedupByCanonicalUrl(docs, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, s"plan:\n$plan")
  }
}
