package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl-front-door text operators: HTML → visible text, boilerplate
  * signals, and URL canonicalization — the steps every operator
  * downstream of a web crawl assumes already happened (the reference's
  * corpus arrives pre-cleaned; a real 100 TB training-data pipeline
  * has to do this itself, before language ID / quality scoring /
  * dedup can mean anything).
  *
  * All pure column expressions over Spark's codegen'd regexp/string/
  * array kernels — zero shuffles, zero UDFs; a cleaning pass over
  * 100 TB is exactly one map-only scan.
  *
  * The HTML subset is the regex-reachable one (like every production
  * boilerplate pass that doesn't ship a browser): tag soup with
  * `<script>`/`<style>` containers, comments, and the core character
  * entities. CDATA and conditional comments are out of scope; a `<`
  * inside a quoted attribute value ends that tag early (documented in
  * WebSpec). That trade is standard — CCNet/C4 strip with regexes and
  * accept the same corner losses.
  */
object Web {

  /** Visible text of an HTML payload: `<script>`/`<style>` containers
    * (including contents), comments, and all tags removed; the core
    * character entities decoded (`&lt; &gt; &quot; &#39; &apos;
    * &nbsp; &amp;` — `&amp;` LAST, so `&amp;lt;` decodes to the
    * literal `&lt;` and never double-decodes); whitespace collapsed to
    * single spaces and trimmed. Null in → null out.
    */
  def htmlText(html: Column): Column = {
    val noContainers = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComments = regexp_replace(noContainers, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(ent),
          java.util.regex.Matcher.quoteReplacement(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Number of anchor (`<a …>…</a>`) elements. */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"),
      lit(1))).cast("long")

  /** Total visible-text characters inside anchor elements — the
    * numerator of link density. Each anchor's inner HTML is stripped
    * and collapsed exactly like [[htmlText]], then lengths are summed
    * (an array fold, still zero-shuffle).
    */
  def linkTextChars(html: Column): Column = {
    val anchors = regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1))
    coalesce(aggregate(anchors, lit(0L),
      (acc, a) => acc + length(htmlText(a)).cast("long")), lit(0L))
  }

  /** Link density: visible anchor chars / total visible chars (0 for
    * empty text) — the classic boilerplate signal (nav bars, footers,
    * link farms are anchor-dominated; body prose is not).
    */
  def linkDensity(html: Column): Column = {
    val total = length(htmlText(html)).cast("double")
    when(total > 0.0, linkTextChars(html).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Tracking query parameters dropped by [[canonicalizeUrl]]. */
  private val TrackingParams = "utm_[^=]*|fbclid|gclid|msclkid|ref"

  /** The URL's lowercased host (port stripped), null for malformed
    * input — the leakage-safe GROUP key for train/test splitting: all
    * documents of one site land on the same side of the split (see
    * `CorpusPipeline.datasetSplit` keyed on this), so near-duplicate
    * pages from one host can never straddle train and eval. Map-only,
    * `try_parse_url`-based like [[canonicalizeUrl]].
    */
  def urlHost(url: Column): Column = {
    val authority = call_function("try_parse_url", url, lit("AUTHORITY"))
    val host = lower(regexp_replace(authority, ":\\d*$", ""))
    when(host =!= "", host)
  }

  /** Canonical form of a URL, for exact URL dedup across a crawl:
    * scheme and host lowercased, default ports dropped (http:80 /
    * https:443), trailing path slashes stripped (path case preserved —
    * paths are case-sensitive per RFC 3986), tracking parameters
    * removed (`utm_*`, `fbclid`, `gclid`, `msclkid`, `ref`), surviving
    * query parameters sorted bytewise, fragment dropped. Malformed
    * URLs (no scheme/authority) canonicalize to null — the caller's
    * quarantine signal, never a silent pass-through.
    *
    * Built on `parse_url` + array kernels; order-insensitive parameter
    * dedup is the point: `/p?b=2&a=1` and `/p/?a=1&b=2&utm_source=x#f`
    * meet at the same canonical key.
    */
  def canonicalizeUrl(url: Column): Column = {
    // try_parse_url, not parse_url: under ANSI mode the plain form
    // THROWS on malformed input — a single bad crawl URL must
    // quarantine to null, never fail a 100 TB cleaning pass
    def pu(part: String): Column =
      call_function("try_parse_url", url, lit(part))
    val proto = lower(pu("PROTOCOL"))
    val authority = pu("AUTHORITY")
    val host = lower(regexp_replace(authority, ":\\d*$", ""))
    val port = regexp_extract(authority, ":(\\d+)$", 1)
    val portPart = when(port === "" ||
        (proto === "http" && port === "80") ||
        (proto === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(coalesce(pu("PATH"), lit("")), "/+$", "")
    val params = filter(split(coalesce(pu("QUERY"), lit("")), "&"),
      p => p =!= "" && !lower(p).rlike(s"^($TrackingParams)="))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(sort_array(params), "&")))
      .otherwise(lit(""))
    when(proto.isNotNull && host.isNotNull && host =!= "",
      concat(proto, lit("://"), host, portPart, path, query))
  }
}
