package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse's URL function family (domain / protocol / path /
  * queryString / fragment / cut* / extractURLParameter) plus URL
  * CANONICALIZATION — the key that makes crawl dedup work: the same page
  * arrives as `HTTP://Site.com:80/a/?utm_source=x&b=1#top` and
  * `http://site.com/a?b=1`, and joining on the raw string misses it.
  *
  * Everything is composed from codegen'd regexp/array expressions with
  * RE2-PORTABLE patterns (no lookaround, no backreferences), so the
  * DuckDB oracle reproduces every extraction byte-for-byte.
  */
object UrlFunctions {

  private val SchemePat = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val AuthorityPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val PathPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  /** protocol('HTTPS://x/p') = 'https'. */
  def protocol(c: Column): Column = lower(regexp_extract(c, SchemePat, 1))

  /** domain: lowercased host, userinfo and port stripped (CH strips any
    * explicit port too).
    */
  def domain(c: Column): Column =
    lower(regexp_replace(
      regexp_replace(regexp_extract(c, AuthorityPat, 1), "^[^@]*@", ""),
      ":[0-9]+$", ""))

  /** path: the part between authority and query/fragment, leading '/'
    * kept (CH path() semantics).
    */
  def path(c: Column): Column = regexp_extract(c, PathPat, 1)

  /** queryString: between '?' and '#', without the '?'. */
  def queryString(c: Column): Column = regexp_extract(c, "\\?([^#]*)", 1)

  /** fragment: after '#', without the '#'. */
  def fragment(c: Column): Column = regexp_extract(c, "#(.*)$", 1)

  def cutQueryString(c: Column): Column = regexp_replace(c, "\\?[^#]*", "")

  def cutFragment(c: Column): Column = regexp_replace(c, "#.*$", "")

  /** extractURLParameter(url, 'name') — the raw value of the first
    * `name=` query parameter ('' if absent).
    */
  def extractURLParameter(c: Column, name: String): Column =
    regexp_extract(c, "[?&]" + java.util.regex.Pattern.quote(name) + "=([^&#]*)", 1)

  /** Tracking parameters dropped by default canonicalization — the usual
    * crawl-dedup suspects.
    */
  val DefaultDropPrefixes: Seq[String] =
    Seq("utm_", "fbclid", "gclid", "msclkid", "ref_", "mc_cid", "mc_eid")

  /** Canonical form for URL-level dedup:
    *  - scheme and host lowercased, userinfo/port dropped;
    *  - trailing slashes trimmed from the path (`/a/` == `/a`, root == '');
    *  - query parameters whose NAME starts with a drop prefix removed,
    *    survivors sorted (param order never distinguishes pages);
    *  - fragment dropped (never sent to the server).
    * Inputs without a scheme pass through trimmed — better opaque than
    * wrongly merged. Pure map-side expressions; deterministic across
    * engines.
    */
  def canonicalizeUrl(c: Column,
                      dropPrefixes: Seq[String] = DefaultDropPrefixes): Column = {
    val host = domain(c)
    val cleanPath = regexp_replace(path(c), "/+$", "")
    val params = filter(
      split(queryString(c), "&"),
      p => p =!= "" && !dropPrefixes
        .map(pre => p.startsWith(lit(pre))).reduce(_ || _))
    val sorted = array_sort(params)
    val q = when(size(sorted) > 0, concat(lit("?"), array_join(sorted, "&")))
      .otherwise(lit(""))
    when(host === "", trim(c))
      .otherwise(concat(protocol(c), lit("://"), host, cleanPath, q))
  }
}
