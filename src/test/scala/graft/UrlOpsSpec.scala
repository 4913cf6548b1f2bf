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

  test("canonicalUrl: strips noise, keeps signal, sorts params") {
    def canon(u: String): String =
      Seq((1L, u)).toDF("doc_id", "url")
        .select(UrlOps.canonicalUrl(col("url"))).as[String].head()
    // www + default port + tracking + fragment all vanish; params sort
    assert(canon("https://www.Site.example:443/p/1?utm_source=a&q=en#f")
      == "https://site.example/p/1?q=en")
    assert(canon("https://site.example/p/1?b=2&a=1")
      == "https://site.example/p/1?a=1&b=2")
    // non-default port and non-tracking params survive
    assert(canon("http://site.example:8080/x?ref=spam&keep=1")
      == "http://site.example:8080/x?keep=1")
    // http default port 80 drops; all-tracking query drops the '?'
    assert(canon("http://site.example:80/x?utm_campaign=z&fbclid=abc")
      == "http://site.example/x")
  }

  test("urlDedup: cosmetic variants of one page collapse to one key") {
    // docs 2 and 3 share page p/1 (same source+lang): raw URLs differ
    // in www/tracking-position, canonical forms collide -> n_docs 2,
    // keeper 2. Docs 0/1 share p/0 but differ in lang -> q param
    // differs, two singleton groups.
    val d = Seq(
      (0L, "t", "en", "s0"), (1L, "t", "fr", "s0"),
      (2L, "t", "en", "s0"), (3L, "t", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = UrlOps.urlDedup(d)
      .as[(String, Long, Long)].collect().toSeq
    assert(r.map(x => (x._2, x._3)).sortBy(_._2) ==
      Seq((1L, 0L), (1L, 1L), (2L, 2L)),
      s"expected two singletons and one pair, got $r")
    assert(r.find(_._2 == 2L).get._1 ==
      "https://s0.example.org/p/1?q=en")
  }
}
