package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization as a pure Column expression (reference F8:
  * dockerapp/app/main.py:100-104,252-256,362-366 — ensure scheme, drop
  * query/fragment, strip trailing slash). Composed from codegen'd
  * built-ins — no UDF, so it stays inside whole-stage codegen and
  * pushes down like any other expression.
  */
object UrlFunctions {

  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Prepend https:// when no scheme is present
    * (reference main.py:100-101 prepends http:// — we follow the
    * notebook's https default). */
  def ensureScheme(url: Column): Column =
    when(url.rlike(SchemeRe), url).otherwise(concat(lit("https://"), url))

  /** Drop query string and fragment (reference main.py:103
    * `urlunparse((scheme, netloc, path, '', '', ''))`). */
  def stripQueryFragment(url: Column): Column =
    regexp_replace(url, "[?#].*$", "")

  /** Lowercase scheme+authority, keep path case (hosts are
    * case-insensitive per RFC 3986; paths are not). */
  def canonicalHost(url: Column): Column = concat(
    lower(regexp_extract(url, "^([^:]*://[^/]*)", 1)),
    regexp_replace(url, "^[^:]*://[^/]*", ""))

  /** Strip trailing slashes (reference main.py:104 `rstrip('/')`). */
  def stripTrailingSlash(url: Column): Column =
    regexp_replace(url, "/+$", "")

  /** Full normalization pipeline. Idempotent:
    * normalizeUrl(normalizeUrl(u)) == normalizeUrl(u). */
  def normalizeUrl(url: Column): Column =
    stripTrailingSlash(canonicalHost(stripQueryFragment(ensureScheme(trim(url)))))

  /** Hostname of a URL: authority minus userinfo and port,
    * lowercased (RFC 3986 §3.2.2 — hosts compare case-insensitively). */
  def host(url: Column): Column =
    lower(regexp_extract(ensureScheme(trim(url)),
      "://(?:[^/@]*@)?([^/:?#]*)", 1))

  /** Registrable domain (eTLD+1) by the standard offline heuristic:
    * last two labels, or last three when the TLD is a two-letter
    * country code and the second-level label is a common public
    * second-level suffix (co/com/net/org/gov/ac/edu — the `co.uk`
    * family). The full Public Suffix List is a network-updated
    * artifact; this heuristic is the accepted no-egress approximation
    * and covers the overwhelming mass of real corpora. Pure Column —
    * codegen'd, no UDF. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    val publicSld = (length(tld) === 2) &&
      sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(n <= 2, hostCol)
      .when(publicSld, array_join(slice(labels, n - 2, lit(3)), "."))
      .otherwise(array_join(slice(labels, n - 1, lit(2)), "."))
  }

  /** Domain-blocklist membership with SUFFIX semantics — the C4/
    * RefinedWeb URL-filter convention where blocking `bad.com` also
    * blocks `cdn.bad.com`: true iff any dot-suffix of the URL's host
    * with ≥ 2 labels (including the full host) is in the list. The
    * list is a compile-time literal array (blocklists are small
    * curated artifacts; a corpus-sized list would join instead), so
    * the whole predicate is one codegen'd Column — map-side,
    * pushdown-eligible, no UDF, no shuffle. */
  def blockedByDomainList(url: Column, blocklist: Seq[String]): Column = {
    val labels = split(host(url), "\\.")
    val n = size(labels)
    val bl = typedLit(blocklist.map(_.toLowerCase))
    // n < 2 guard: Spark's sequence(1, 0) DESCENDS instead of
    // returning empty, which would feed slice() an illegal 0 start
    when(n >= 2, exists(
      transform(sequence(lit(1), n - 1),
        i => array_join(slice(labels, i, n - i + 1), ".")),
      sfx => array_contains(bl, sfx))).otherwise(lit(false))
  }
}
