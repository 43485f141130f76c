package graft.warc

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial golden parse over a large tag-soup fixture
  * (`src/test/resources/adversarial.html`, ~1.7k lines / ~100 KB),
  * playing the role of the reference's 2,873-line `tests/moneysmart.htm`
  * snapshot (`tests/lib-tests.rs:8-22`) for the hand-rolled tokenizer's
  * edge cases: a page with NO `</head>`/`<body>` (implicit head close),
  * misnested inline tags, bogus-comment CDATA, broken entities, RCDATA
  * titles, a 1,200-line inline script closed by `</SCRIPT  >`, duplicate
  * attributes, unquoted values, and an unterminated trailing comment. */
class HtmlAdversarialSpec extends AnyFunSuite {

  private lazy val page: String = {
    val in = getClass.getResourceAsStream("/adversarial.html")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private lazy val r = HtmlParse.parse(page)

  test("adversarial: title is RCDATA, first title wins, entities decoded") {
    assert(r.ok)
    // inner tags are literal text inside <title>; &amp; decodes
    assert(r.title == "First & <b>Best</b> Title")
  }

  test("adversarial: meta precedence, duplicate-name last-write, charset skipped") {
    assert(r.meta_tags.toSeq.sortBy(_._1) == Seq(
      "description" -> "duplicate-name overwrites?",
      "pname" -> "precedence", // name beats property on the same tag
      "refresh" -> "30"))
  }

  test("adversarial: implicit head close — body text survives without </head> or <body>") {
    val joined = r.text.mkString(" ")
    assert(joined.contains("Main Heading Here".replace(" ", " ")))
    assert(joined.contains("after big script"))
    assert(joined.contains("Filler paragraph 499"))
  }

  test("adversarial: headings incl. trailing unterminated one") {
    assert(r.headings_text == Seq(
      "Main Heading Here",
      "Sub kept link",
      "Trailing heading at EOF with no close"))
  }

  test("adversarial: links skip #/_ prefixes, accept unquoted attrs") {
    assert(r.links == Seq("/kept", "unquoted-target"))
    assert(r.resource_urls == Seq("/js/a.js", "/img/x.png", "/img/ns.png"))
  }

  test("adversarial: suppression — script/style/noscript text and comments never leak") {
    val joined = r.text.mkString(" ")
    assert(!joined.contains("var line"))     // 1200-line script suppressed
    assert(!joined.contains("padding"))
    assert(!joined.contains("fake"))
    assert(!joined.contains("content:"))     // style (incl. embedded "</style fake")
    assert(!joined.contains("noscript text"))
    assert(!joined.contains("ghost paragraph")) // after unterminated comment
    assert(!joined.contains("var x"))        // head script body
  }

  test("adversarial: broken entities pass through literally; bogus CDATA is html5-ish") {
    assert(r.text.contains("AT&T and &unknown; entities &#xZZ; stay literal"))
    // <![CDATA[x > y]]> is a bogus comment to the first '>' — remainder is text
    assert(r.text.contains("y]]>"))
    assert(r.text.contains("misnested"))
    assert(r.text.contains("<")) // stray lone angle bracket becomes text
    assert(r.text.contains("stray lone angle"))
    assert(r.text.contains("cell one") && r.text.contains("cell two"))
  }

  test("adversarial: exact text piece count (any tokenizer change must re-justify)") {
    assert(r.text.length == 517, s"got ${r.text.length}")
  }

  test("adversarial: html_errors reports every tag-soup repair, in order") {
    // NB: the implicit head-close is NOT reported — </head> is an
    // omittable end tag per HTML5, so closing it before body content is
    // spec-sanctioned, not a repair
    assert(r.html_errors == Seq(
      "misnested </b> implicitly closed <i>",
      "discarded unmatched </i>",
      "unterminated comment at EOF",
      "unclosed <div> at EOF",
      "unclosed <h3> at EOF").mkString("; "), s"got: ${r.html_errors}")
  }

  test("adversarial: well-formed pages still report no errors") {
    val clean = HtmlParse.parse(
      "<html><head><title>t</title></head><body><p>x</p></body></html>")
    assert(clean.html_errors == "")
    // omitting </head> (and <body>) is conforming HTML5 — still no errors
    val omitted = HtmlParse.parse(
      "<html><head><title>t</title><div>body text</div></html>")
    assert(omitted.html_errors == "", s"got: ${omitted.html_errors}")
    assert(omitted.text.contains("body text"))
  }

  test("adversarial: GA scan over RAW html still sees ids inside scripts") {
    val m = java.util.regex.Pattern.compile(Pipeline.GaPattern).matcher(page)
    assert(m.find() && m.group() == "UA-1234-5")
  }
}
