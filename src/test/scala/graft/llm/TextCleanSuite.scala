package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand cases for the crawl-extraction pair (llm_html_strip /
  * llm_url_dedup carry the cross-engine oracles; this pins the
  * SEMANTICS on constructed inputs the fixture can't isolate). */
class TextCleanSuite extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.stripHtml(col("t")))
      .head().getString(0)

  private def norm(s: String): String =
    Seq(s).toDF("u").select(TextAnalysis.normalizeUrl(col("u")))
      .head().getString(0)

  test("stripHtml: blocks wholesale, tags to word boundaries, " +
      "entities decoded AFTER stripping") {
    // script body with a bare < and && goes wholesale
    assert(strip("a<script>if (1 < 2 && x) { y(); }</script>b") == "a b")
    assert(strip("a<style>p > em {color: red}</style>b") == "a b")
    assert(strip("a<!-- <p>commented out</p> -->b") == "a b")
    // tag replaced by a space: word boundary survives
    assert(strip("<p>a</p><p>b</p>") == "a b")
    // bare < in prose survives (tags must start with a letter)
    assert(strip("1 < 2 and x <= y") == "1 < 2 and x <= y")
    // entities decode AFTER tag stripping — literal <b> surfaces
    assert(strip("x &lt;b&gt;bold&lt;/b&gt; y") == "x <b>bold</b> y")
    // &amp; decodes LAST: &amp;lt; is the literal text "&lt;"
    assert(strip("&amp;lt; &amp; &quot;q&quot; &#39;a&#39;&nbsp;z") ==
      "&lt; & \"q\" 'a' z")
    // multi-line block + attribute noise
    assert(strip("<div class=\"x\" data-y='1'>\n  a\n\n  b\n</div>") ==
      "a b")
  }

  test("normalizeUrl: case, www, default port, tracking, fragment, " +
      "trailing slash; non-URLs pass through") {
    val canon = "https://site.com/page"
    assert(norm("https://site.com/page") == canon)
    assert(norm("HTTPS://WWW.Site.COM:443/page/") == canon)
    assert(norm("https://site.com/page?utm_source=x") == canon)
    assert(norm("https://www.site.com/page#frag") == canon)
    // ? re-anchors when the FIRST param is tracking
    assert(norm("https://site.com/page?utm_source=x&id=7") ==
      s"$canon?id=7")
    // mid-list tracking param drops cleanly
    assert(norm("https://site.com/page?id=7&fbclid=abc") ==
      s"$canon?id=7")
    // non-default port survives; http default port stripped
    assert(norm("http://site.com:8080/a") == "http://site.com:8080/a")
    assert(norm("http://site.com:80/a") == "http://site.com/a")
    // :443 is only default for https
    assert(norm("http://site.com:443/a") == "http://site.com:443/a")
    // root path: trailing slash strips to the bare host
    assert(norm("https://site.com/") == "https://site.com")
    // no scheme: unchanged, never a mangled collision key
    assert(norm("not a url") == "not a url")
    assert(norm("") == "")
    // ADVICE r14 fix: a literal '&' in a QUERY-LESS path (RFC 3986
    // path sub-delim) must survive — the old unconditional re-anchor
    // turned /a&b into /a?b, colliding distinct URLs
    assert(norm("https://x.com/a&b") == "https://x.com/a&b")
    // consecutive leading tracking params all strip, '?' re-anchors
    assert(norm("https://site.com/page?utm_a=1&utm_b=2&id=7") ==
      s"$canon?id=7")
    // leading tracking + trailing tracking around a real param
    assert(norm("https://site.com/page?utm_a=1&id=7&gclid=g") ==
      s"$canon?id=7")
    // only tracking params: query vanishes entirely
    assert(norm("https://site.com/page?utm_a=1&fbclid=f") == canon)
    // path '&' plus a stripped tracking query: path stays intact
    assert(norm("https://x.com/a&b?utm_a=1") == "https://x.com/a&b")
  }
}
