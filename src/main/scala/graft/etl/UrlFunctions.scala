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
}
