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

  /** Dirty-URL injector for the canonicalization gate: doc PAIRS
    * (doc_id div 2) point at the same page, each with independent
    * cosmetic noise — www prefix, explicit default :443 port,
    * utm_* tracking params in shuffled positions, fragments — so the
    * raw URLs differ while the canonical forms collide exactly when
    * the page and surviving params agree. */
  def withInjectedDirtyUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url", concat(
      lit("https://"),
      when(col("doc_id") % 5 === 0, "www.").otherwise(""),
      col("source"), lit(".example"),
      when(expr("(doc_id div 2) % 2") === 0, ".com").otherwise(".org"),
      when(col("doc_id") % 11 === 0, ":443").otherwise(""),
      lit("/p/"), expr("CAST(doc_id div 2 AS STRING)"),
      when(col("doc_id") % 2 === 0,
        concat(lit("?utm_source=feed&q="), col("lang")))
        .otherwise(concat(lit("?q="), col("lang"),
          lit("&utm_campaign=x"))),
      when(col("doc_id") % 9 === 0, "#s1").otherwise("")))

  /** Canonical URL — the normalization pass a crawl dedup runs before
    * any content hash (the "same page, different URL string" class
    * that URL-keyed dedup misses entirely): lowercase scheme+host,
    * strip a leading www., drop the scheme's default port (:443 on
    * https, :80 on http), drop the fragment, drop tracking params
    * (utm_*, fbclid, gclid, ref), and SORT the surviving params so
    * param order stops mattering. All RE2-portable regex + array
    * column math (split → filter → array_sort → array_join — DuckDB:
    * string_split → list_filter → list_sort → array_to_string), so
    * the twin is the same expression text. Map-only at any scale. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    val hostport = lower(regexp_extract(url, hostportRe, 1))
    val portStr = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(
      regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    val port = when(portStr === "", lit(""))
      .when(scheme === "https" && portStr === "443", lit(""))
      .when(scheme === "http" && portStr === "80", lit(""))
      .otherwise(concat(lit(":"), portStr))
    val kept = array_join(array_sort(filter(
      split(regexp_extract(url, queryRe, 1), "&"),
      p => !(p.rlike("^utm_") || p.rlike("^(fbclid|gclid|ref)=") ||
        p === lit("")))), "&")
    concat(scheme, lit("://"), host, port,
      regexp_extract(url, pathRe, 1),
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Canonical-URL dedup keeplist: group the injected dirty URLs by
    * canonical form — n_docs per canonical page and the lowest doc_id
    * as keeper (the cluster_keeplist policy). One map-only
    * canonicalization + one canonical-key aggregate. */
  def urlDedup(docs: DataFrame): DataFrame =
    withInjectedDirtyUrls(docs)
      .select(col("doc_id"), canonicalUrl(col("url")).as("canon_url"))
      .groupBy("canon_url").agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("keep_doc"))
      .orderBy("canon_url")
}
