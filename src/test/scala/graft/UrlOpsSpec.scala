package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(urls: (Long, String)*) =
    UrlOps.urlParse(urls.toDF("doc_id", "url"), col("url"))
      .as[(Long, String, String, String, Option[Long], String, String,
        String, String)]
      .collect().map(r => r._1 -> r).toMap

  test("full decomposition: scheme, host, port, path, query, fragment") {
    val p = parse(
      (1L, "https://www.news.example.com:8080/a/b?q=x&y=2#frag"),
      (2L, "http://example.org/plain"),
      (3L, "https://example.net"))
    assert(p(1L) == ((1L, "https://www.news.example.com:8080/a/b?q=x&y=2#frag",
      "https", "www.news.example.com", Some(8080L), "/a/b", "q=x&y=2",
      "frag", "example.com")))
    assert(p(2L) == ((2L, "http://example.org/plain", "http",
      "example.org", None, "/plain", "", "", "example.org")))
    // no path at all -> empty path, host still parses
    assert(p(3L)._4 == "example.net" && p(3L)._6 == "")
  }

  test("public-suffix exceptions: co.uk keeps three labels") {
    val p = parse(
      (1L, "https://shop.brand.co.uk/x"),
      (2L, "https://deep.sub.brand.com.au/y"),
      (3L, "https://plain.co.uk/z"))   // the suffix site itself
    assert(p(1L)._9 == "brand.co.uk")
    assert(p(2L)._9 == "brand.com.au")
    assert(p(3L)._9 == "plain.co.uk")
  }

  test("withInjectedUrls: doc 0 exercises every branch at once") {
    val d = Seq((0L, "t", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
    val url = UrlOps.withInjectedUrls(d).select("url").as[String].head()
    assert(url == "http://www.src0.example.com:8080/p/0?q=en#s1")
    val parsed = parse((0L, url))(0L)
    assert(parsed._3 == "http" && parsed._5 == Some(8080L) &&
      parsed._9 == "example.com" && parsed._8 == "s1")
  }
}
