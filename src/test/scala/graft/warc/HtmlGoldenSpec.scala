package graft.warc

import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end parse test over a rich fixture page, mirroring the
  * reference's snapshot test shape (`tests/lib-tests.rs:8-22` feeds a
  * captured gov.au page through the cascade and asserts the whole
  * HTMLResult; map assertions are made over SORTED entries exactly as
  * the reference does for HashMap nondeterminism). The fixture is our
  * own construction — SURVEY §7 known-hard item 1 says to pin behavior
  * with our own golden files, not the reference's.
  */
class HtmlGoldenSpec extends AnyFunSuite {

  private val page =
    """<!DOCTYPE html>
      |<html lang="en">
      |<head>
      |  <meta charset="utf-8">
      |  <meta name="description" content="Money matters &amp; services">
      |  <meta http-equiv="X-UA-Compatible" content="IE=edge">
      |  <meta property="og:type" content="website">
      |  <meta itemprop="audience" content="citizens">
      |  <title>Budgeting &amp; saving | example.gov.au</title>
      |  <link rel="stylesheet" href="/assets/site.css">
      |  <script src="/assets/app.js"></script>
      |  <style>.hero { color: #123; }</style>
      |</head>
      |<body class="layout">
      |  <!-- nav section -->
      |  <h1>Budgeting <em>and</em> saving</h1>
      |  <p>Plan your spending to stay on top of bills &amp; debt.</p>
      |  <h2>Where to start</h2>
      |  <ul>
      |    <li><a href="/budgeting/first-steps">First steps</a></li>
      |    <li><a href="#section-2">Jump (skipped)</a></li>
      |    <li><a href="_template_link">Template (skipped)</a></li>
      |    <li><a href="https://other.gov.au/calculator">Calculator</a></li>
      |  </ul>
      |  <noscript>Enable JS for the calculator.</noscript>
      |  <script>var inlineHidden = "UA-99999-9 should still GA-scan from raw";</script>
      |  <img src="/img/hero.png" alt="hero">
      |  <div>5 &lt; 6 but 7 &gt; 2</div>
      |</body>
      |</html>""".stripMargin

  test("golden: full HtmlResult for the fixture page") {
    val r = HtmlParse.parse(page)
    assert(r.ok)
    assert(r.title == "Budgeting & saving | example.gov.au")
    assert(r.headings_text == Seq("Budgeting and saving", "Where to start"))
    assert(r.links == Seq("/budgeting/first-steps", "https://other.gov.au/calculator"))
    assert(r.resource_urls ==
      Seq("/assets/site.css", "/assets/app.js", "/img/hero.png"))
    // sorted-entry assertion for map nondeterminism, as the reference does
    assert(r.meta_tags.toSeq.sortBy(_._1) == Seq(
      "X-UA-Compatible" -> "IE=edge",
      "audience" -> "citizens",
      "description" -> "Money matters & services",
      "og:type" -> "website"))
    val text = r.text.mkString(" ")
    assert(text.contains("Plan your spending"))
    assert(text.contains("bills & debt"))
    assert(text.contains("5 < 6 but 7 > 2"))
    assert(!text.contains("inlineHidden"))    // script text suppressed
    assert(!text.contains("Enable JS"))       // noscript suppressed
    assert(!text.contains("color"))           // style suppressed
    assert(!text.contains("nav section"))     // comment skipped
  }

  test("golden: downstream projections match the pipeline formulas") {
    val r = HtmlParse.parse(page)
    val joined = r.text.mkString(" ")
    val collapsed = HtmlParse.collapseWhitespaceParser(joined)
    val wordCount = collapsed.trim.split("\\s+").length
    assert(wordCount > 20)
    val links = UrlTools.absolutize("https://example.gov.au/money/page", r.links)
    assert(links == Seq("https://example.gov.au/budgeting/first-steps",
      "https://other.gov.au/calculator"))
    // GA scan runs over RAW html (script content included)
    val m = java.util.regex.Pattern.compile(Pipeline.GaPattern).matcher(page)
    assert(m.find() && m.group() == "UA-99999-9")
  }
}
