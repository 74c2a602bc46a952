package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Web

/** Contract spec for the crawl front door: HTML → visible text,
  * link/boilerplate signals, URL canonicalization. Handcrafted messy
  * fixtures here; the oracle gate (q95/q96) proves the planted-corpus
  * arithmetic end to end.
  */
class WebSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def text1(html: String): String =
    Seq(html).toDF("h").select(Web.htmlText(col("h"))).as[String].collect().head

  test("htmlText strips containers, comments, tags; decodes entities; collapses space") {
    assert(text1("<p>Hello <b>world</b></p>") === "Hello world")
    assert(text1("<SCRIPT>var a = '<div>not text</div>';</SCRIPT>ok") === "ok",
      "script contents (even containing tags) are invisible")
    assert(text1("<style media=\"all\">p>a{x:1}</style>body") === "body")
    assert(text1("a<!-- <b>gone</b> -->b") === "a b")
    assert(text1("x &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;&nbsp;end")
      === "x <tag> & \"q\" 's' end")
    assert(text1("&amp;lt;") === "&lt;",
      "&amp; decodes LAST: no double-decode")
    assert(text1("  a \n\t b  ") === "a b")
    assert(text1("<div\nclass='x'>multi\nline</div>") === "multi line")
  }

  test("link signals: count, visible anchor chars, density") {
    val df = Seq(
      ("<a href='/x'>Home</a> body words here <A HREF='/y'><b>About</b></A>", 1L),
      ("no links at all", 2L),
      ("<nav><a>a</a><a>bb</a><a>ccc</a></nav>", 3L))
      .toDF("h", "id")
    val got = df.select(col("id"), Web.linkCount(col("h")).as("n"),
        Web.linkTextChars(col("h")).as("c"), Web.linkDensity(col("h")).as("d"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._1 === 2L)
    assert(got(1L)._2 === 9L, "anchor INNER tags strip before counting")
    assert(got(2L) === ((0L, 0L, 0.0)))
    // all-link nav: anchor chars 1+2+3 = 6; the visible text is
    // "a bb ccc" (tag gaps collapse to single spaces) = 8 chars
    assert(got(3L) === ((3L, 6L, 0.75)))
  }

  test("canonicalizeUrl: case, ports, slashes, tracking params, sort, fragment") {
    val cases = Seq(
      "HTTP://Example.COM:80/Path/?b=2&a=1#frag" ->
        "http://example.com/Path?a=1&b=2",
      "https://Example.com:443/x" -> "https://example.com/x",
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      "http://example.com/p?utm_source=x&utm_medium=y&fbclid=1&gclid=2&ref=z" ->
        "http://example.com/p",
      "http://example.com/" -> "http://example.com",
      "http://example.com" -> "http://example.com",
      "http://example.com/a//" -> "http://example.com/a",
      "http://example.com/p?id=2&id=1" -> "http://example.com/p?id=1&id=2")
    val df = cases.map(_._1).toDF("u")
      .select(col("u"), Web.canonicalizeUrl(col("u")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) =>
      assert(df(in) === want, s"canonical of $in")
    }
    // malformed / scheme-less input quarantines to null, never passes through
    val bad = Seq("not a url", "/relative/only").toDF("u")
      .select(Web.canonicalizeUrl(col("u"))).collect()
    assert(bad.forall(_.isNullAt(0)), "malformed URLs must canonicalize to null")
  }

  test("canonicalization is order- and noise-insensitive: the dedup key meets") {
    val df = Seq(
      "HTTP://A.com/p?b=2&a=1",
      "http://a.COM:80/p/?a=1&utm_campaign=x&b=2#top")
      .toDF("u").select(Web.canonicalizeUrl(col("u")).as("c"))
    assert(df.distinct().count() === 1L)
  }

  test("urlHost: lowercased, port-stripped, null on malformed — the split group key") {
    val got = Seq(
      "HTTP://WWW.Example.COM:8080/p?x=1",
      "https://sub.Site.org/deep/path",
      "http://plain.net",
      "not a url")
      .toDF("u").select(Web.urlHost(col("u"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(got === Array("www.example.com", "sub.site.org", "plain.net", null))
  }
}
