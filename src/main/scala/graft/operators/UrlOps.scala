package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing for web-crawl curation — the field extraction every
  * domain-level policy (mixture weights, domain caps, blocklists)
  * runs first. Pure RE2-portable regex column math (no lookarounds, no
  * backreferences) so the DuckDB twin is the same pattern text;
  * Spark's `parse_url` builtin is deliberately NOT used — its
  * java.net semantics have no DuckDB counterpart, and a cross-engine
  * oracle beats a builtin here.
  *
  * `reg_domain` is the registrable domain under a PUBLIC-SUFFIX
  * exception list: last two labels normally, last three when the
  * 2-label tail is itself a public suffix (co.uk, com.au, co.jp, …) —
  * the naive last-2 rule silently merges every .co.uk site into
  * "co.uk". The list here is the embedded short head of the published
  * suffix list; production swaps in the full one, same expression
  * shape. Map-only projection — no shuffle at any scale. */
object UrlOps {

  /** 2-label public suffixes that push reg_domain to 3 labels. */
  val publicSuffixes2 = Seq("co.uk", "com.au", "co.jp", "com.br")

  private val schemeRe = "^([a-z][a-z0-9+.-]*)://"
  private val hostportRe = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
  private val pathRe = "://[^/?#]+([^?#]*)"
  private val queryRe = "\\?([^#]*)"
  private val fragmentRe = "#(.*)$"
  private val regDomainRe =
    "([^.]+\\.(?:" + publicSuffixes2.map(_.replace(".", "\\."))
      .mkString("|") + ")|[^.]+\\.[^.]+)$"

  /** Deterministically attach a synthetic URL to every doc (scheme,
    * www, tld, port, query, fragment all vary by doc_id residues; the
    * %4==3 residue exercises the co.uk public-suffix branch) — the
    * documents fixture carries no URLs, so the parse path needs
    * planted inputs (the withInjectedPii pattern). */
  def withInjectedUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(
      when(col("doc_id") % 3 === 0, "http").otherwise("https"),
      lit("://"),
      when(col("doc_id") % 5 === 0, "www.").otherwise(""),
      col("source"), lit(".example"),
      when(col("doc_id") % 4 === 0, ".com")
        .when(col("doc_id") % 4 === 1, ".org")
        .when(col("doc_id") % 4 === 2, ".net")
        .otherwise(".co.uk"),
      when(col("doc_id") % 11 === 0, ":8080").otherwise(""),
      lit("/p/"), col("doc_id").cast("string"),
      when(col("doc_id") % 2 === 0,
        concat(lit("?q="), col("lang"))).otherwise(""),
      when(col("doc_id") % 9 === 0, "#s1").otherwise("")))

  def urlParse(docs: DataFrame, url: Column): DataFrame = {
    val hostport = regexp_extract(url, hostportRe, 1)
    val portStr = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    docs.select(col("doc_id"), url.as("url"),
      regexp_extract(url, schemeRe, 1).as("scheme"),
      host.as("host"),
      when(portStr === "", lit(null).cast("long"))
        .otherwise(portStr.cast("long")).as("port"),
      regexp_extract(url, pathRe, 1).as("path"),
      regexp_extract(url, queryRe, 1).as("query"),
      regexp_extract(url, fragmentRe, 1).as("fragment"),
      regexp_extract(host, regDomainRe, 1).as("reg_domain"))
  }

  /** The SQL fragments the DuckDB twin interpolates — single source of
    * truth for the pattern text (a drifted copy would be a silent
    * cross-engine bug). */
  def sqlPatterns: Map[String, String] = Map(
    "scheme" -> schemeRe, "hostport" -> hostportRe, "path" -> pathRe,
    "query" -> queryRe, "fragment" -> fragmentRe,
    "regdomain" -> regDomainRe)
}
