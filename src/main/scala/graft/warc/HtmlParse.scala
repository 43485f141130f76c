package graft.warc

import scala.collection.mutable

/** HTML extraction (SURVEY.md §2.4).
  *
  * The reference runs a 4-tier cascade (ammonia sanitize → quick-xml
  * strict parse → tidy repair → soup DOM) purely because its strict
  * parser fails on real-world HTML (`src/lib.rs:184-242`). Here one
  * lenient hand-rolled streaming tokenizer subsumes the cascade: it never
  * fails, handles unclosed/misnested tags, raw-text elements, comments
  * and entities, and applies the reference's tier-2 extraction rules
  * (`src/lib.rs:244-383`):
  *
  *  - `<meta>`: key precedence name → http-equiv → itemprop → property,
  *    value from `content` (`src/lib.rs:268-289`, `src/lib.rs:510-553`)
  *  - `<a href>`: collected unless href starts with `_` or `#`
  *    (`src/lib.rs:290-301`)
  *  - `<script src>`, `<link href>`, `<img src>`: resource_urls
  *    (`src/lib.rs:303-314`, `src/lib.rs:489-508`)
  *  - text suppressed inside head/script/style/noscript
  *    (`src/lib.rs:302-315`)
  *  - h1–h6 text → headings (`src/lib.rs:317-336`); `<title>` → title
  *
  * Implemented as plain Scala invoked from a deterministic UDF, so it
  * runs record-parallel inside codegen'd stages with no external process
  * (the reference forks `tidy` per failed record — SURVEY §2.4).
  */
object HtmlParse {

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(ent.substring(2), 16).toChar)
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try String.valueOf(Integer.parseInt(ent.substring(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse one tag's attributes starting at `pos` (after the tag name);
    * returns (attrs, indexAfterClosingGt, selfClosing). Lenient: unquoted
    * values, missing values, stray characters all accepted. */
  private def parseAttrs(s: String, pos0: Int): (Map[String, String], Int, Boolean) = {
    var pos = pos0
    val n = s.length
    val attrs = mutable.Map[String, String]()
    var selfClosing = false
    while (pos < n && s.charAt(pos) != '>') {
      while (pos < n && (s.charAt(pos).isWhitespace)) pos += 1
      if (pos < n && s.charAt(pos) == '/') { selfClosing = true; pos += 1 }
      else if (pos < n && s.charAt(pos) != '>') {
        val nameStart = pos
        while (pos < n && !s.charAt(pos).isWhitespace &&
          s.charAt(pos) != '=' && s.charAt(pos) != '>' && s.charAt(pos) != '/') pos += 1
        val name = s.substring(nameStart, pos).toLowerCase
        while (pos < n && s.charAt(pos).isWhitespace) pos += 1
        var value = ""
        if (pos < n && s.charAt(pos) == '=') {
          pos += 1
          while (pos < n && s.charAt(pos).isWhitespace) pos += 1
          if (pos < n && (s.charAt(pos) == '"' || s.charAt(pos) == '\'')) {
            val q = s.charAt(pos)
            val end = s.indexOf(q, pos + 1)
            if (end < 0) { value = s.substring(pos + 1); pos = n }
            else { value = s.substring(pos + 1, end); pos = end + 1 }
          } else {
            val vStart = pos
            while (pos < n && !s.charAt(pos).isWhitespace && s.charAt(pos) != '>') pos += 1
            value = s.substring(vStart, pos)
          }
        }
        // HTML5: a repeated attribute is ignored — the FIRST wins
        if (name.nonEmpty && !attrs.contains(name)) attrs(name) = decodeEntities(value)
      }
    }
    (attrs.toMap, if (pos < n) pos + 1 else n, selfClosing)
  }

  /** Start tags allowed inside <head>; any OTHER start tag implicitly
    * closes the head (the HTML5 "in head → anything else" tree-
    * construction rule) — tag-soup pages with no </head> or <body> must
    * not have their whole body text suppressed as head content. */
  private val HeadTags = Set("head", "html", "title", "meta", "link", "base",
    "basefont", "bgsound", "style", "script", "noscript", "template")

  /** Case-insensitive indexOf without copying the haystack (a
    * `toLowerCase` per raw-text element would be O(n²) on script-heavy
    * pages). */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }

  /** HTML5 raw-text/RCDATA end-tag search: `</tag` only terminates the
    * element when followed by `>`, `/`, whitespace, or EOF — so
    * `</titlebar>` does not end `<title>`, nor `</scripty` a script. */
  private def findEndTag(s: String, tag: String, from: Int): Int = {
    val needle = "</" + tag
    var i = indexOfIgnoreCase(s, needle, from)
    while (i >= 0 && i + needle.length < s.length && {
      val c = s.charAt(i + needle.length)
      c != '>' && c != '/' && !c.isWhitespace
    }) i = indexOfIgnoreCase(s, needle, i + 1)
    i
  }

  /** Void elements never pushed on the diagnostics stack. */
  private val VoidTags = Set("area", "base", "basefont", "bgsound", "br",
    "col", "embed", "hr", "img", "input", "link", "meta", "param", "source",
    "track", "wbr")

  /** Elements whose end tag HTML5 allows omitting — implicit closes and
    * EOF residue of these are normal, not diagnostics. */
  private val OmittableEnd = Set("html", "head", "body", "p", "li", "dd",
    "dt", "td", "th", "tr", "tbody", "thead", "tfoot", "option", "optgroup",
    "colgroup", "caption", "rt", "rp")

  /** Lenient streaming parse applying the reference's extraction rules.
    *
    * `html_errors` reports the tag-soup repairs the tokenizer performed
    * (misnested/unmatched end tags, implicit head close, unterminated
    * comment, unclosed elements at EOF) in this engine's own format —
    * the reference captures HTML Tidy's stderr here
    * (`src/lib.rs:197-206,240`); same column role, different producer,
    * documented divergence. Well-formed pages yield `""`. */
  def parse(html: String): HtmlResult = {
    if (html == null || html.isEmpty) return HtmlResult.empty
    val n = html.length
    var pos = 0
    var title = ""
    var inHead = false
    var headingDepth = 0
    var suppressDepth = 0
    val text = mutable.ArrayBuffer[String]()
    val headings = mutable.ArrayBuffer[String]()
    val headingBuf = new java.lang.StringBuilder
    val links = mutable.ArrayBuffer[String]()
    val resources = mutable.ArrayBuffer[String]()
    val metaTags = mutable.LinkedHashMap[String, String]()

    // diagnostics: a purely observational open-tag stack (capped), never
    // feeding back into extraction state
    val openStack = mutable.ArrayBuffer[String]()
    val diags = mutable.ArrayBuffer[String]()
    val MaxDiags = 10
    def diag(msg: String): Unit =
      if (diags.length < MaxDiags) diags += msg

    def emitText(raw: String): Unit = {
      if (suppressDepth > 0 || inHead) return
      val t = decodeEntities(raw).trim
      if (t.nonEmpty) {
        text += t
        if (headingDepth > 0) {
          if (headingBuf.length() > 0) headingBuf.append(' ')
          headingBuf.append(t)
        }
      }
    }

    while (pos < n) {
      val lt = html.indexOf('<', pos)
      if (lt < 0) { emitText(html.substring(pos)); pos = n }
      else {
        if (lt > pos) emitText(html.substring(pos, lt))
        if (lt + 1 >= n) { pos = n }
        else html.charAt(lt + 1) match {
          case '!' =>
            if (html.startsWith("<!--", lt)) {
              val end = html.indexOf("-->", lt + 4)
              if (end < 0) diag("unterminated comment at EOF")
              pos = if (end < 0) n else end + 3
            } else {
              val end = html.indexOf('>', lt)  // DOCTYPE / CDATA-ish
              pos = if (end < 0) n else end + 1
            }
          case '?' =>
            val end = html.indexOf('>', lt)
            pos = if (end < 0) n else end + 1
          case '/' =>
            var p = lt + 2
            val nameStart = p
            while (p < n && html.charAt(p).isLetterOrDigit) p += 1
            val tag = html.substring(nameStart, p).toLowerCase
            val end = html.indexOf('>', p)
            pos = if (end < 0) n else end + 1
            // diagnostics-only nesting bookkeeping
            if (tag.nonEmpty && !VoidTags.contains(tag)) {
              val at = openStack.lastIndexOf(tag)
              if (at < 0) diag(s"discarded unmatched </$tag>")
              else {
                if (at != openStack.length - 1) {
                  // html5-omittable end tags close implicitly by design;
                  // only report when a real element got cut short
                  val cut = openStack.view.slice(at + 1, openStack.length)
                    .filterNot(OmittableEnd.contains)
                  if (cut.nonEmpty)
                    diag(s"misnested </$tag> implicitly closed <${cut.last}>")
                }
                openStack.remove(at, openStack.length - at)
              }
            }
            tag match {
              case "head" => inHead = false
              case "noscript" => if (suppressDepth > 0) suppressDepth -= 1
              case t if t.length == 2 && t.charAt(0) == 'h' &&
                  t.charAt(1) >= '1' && t.charAt(1) <= '6' =>
                if (headingDepth > 0) {
                  headingDepth -= 1
                  if (headingDepth == 0 && headingBuf.length() > 0) {
                    headings += headingBuf.toString
                    headingBuf.setLength(0)
                  }
                }
              case _ =>
            }
          case c if c.isLetter =>
            var p = lt + 1
            val nameStart = p
            while (p < n && (html.charAt(p).isLetterOrDigit || html.charAt(p) == '-')) p += 1
            val tag = html.substring(nameStart, p).toLowerCase
            val (attrs, after, selfClosing) = parseAttrs(html, p)
            pos = after
            // </head> is an omittable end tag (OmittableEnd) — closing it
            // implicitly before body content is spec-sanctioned, so it's a
            // state fix, NOT a diagnostic: conforming pages that skip
            // </head> must still yield html_errors == ""
            if (inHead && !HeadTags.contains(tag)) inHead = false
            // diagnostics-only stack push (raw-text elements consume their
            // own close below; title is RCDATA-consumed; keep them off)
            if (!selfClosing && !VoidTags.contains(tag) && tag != "script" &&
                tag != "style" && tag != "title" && openStack.length < 512)
              openStack += tag
            tag match {
              case "head" => inHead = true
              case "body" => inHead = false
              case "title" =>
                // RCDATA: everything to </title> is text (tags inert);
                // first non-empty title wins
                val close = findEndTag(html, "title", pos)
                val end = if (close < 0) n else close
                if (title.isEmpty)
                  title = decodeEntities(html.substring(pos, end)).trim
                pos = if (close < 0) n
                  else { val e = html.indexOf('>', close); if (e < 0) n else e + 1 }
              case "meta" =>
                // precedence: name → http-equiv → itemprop → property
                val key = attrs.get("name").orElse(attrs.get("http-equiv"))
                  .orElse(attrs.get("itemprop")).orElse(attrs.get("property"))
                (key, attrs.get("content")) match {
                  case (Some(k), Some(v)) if k.nonEmpty => metaTags(k) = v
                  case _ =>
                }
              case "a" =>
                attrs.get("href").foreach { h =>
                  if (h.nonEmpty && !h.startsWith("_") && !h.startsWith("#")) links += h
                }
              case "link" =>
                attrs.get("href").foreach(h => if (h.nonEmpty) resources += h)
              case "img" =>
                attrs.get("src").foreach(srcv => if (srcv.nonEmpty) resources += srcv)
              case "script" =>
                attrs.get("src").foreach(srcv => if (srcv.nonEmpty) resources += srcv)
                val close = findEndTag(html, "script", pos)
                pos = if (close < 0) n else { val e = html.indexOf('>', close); if (e < 0) n else e + 1 }
              case "style" =>
                val close = findEndTag(html, "style", pos)
                pos = if (close < 0) n else { val e = html.indexOf('>', close); if (e < 0) n else e + 1 }
              case "noscript" => suppressDepth += 1
              case t if t.length == 2 && t.charAt(0) == 'h' &&
                  t.charAt(1) >= '1' && t.charAt(1) <= '6' =>
                headingDepth += 1
              case _ =>
            }
          case _ =>
            emitText("<")
            pos = lt + 1
        }
      }
    }
    if (headingBuf.length() > 0) headings += headingBuf.toString
    openStack.filterNot(OmittableEnd.contains)
      .foreach(t => diag(s"unclosed <$t> at EOF"))
    HtmlResult(ok = true, html_errors = diags.mkString("; "), title = title,
      text = text.toSeq,
      headings_text = headings.toSeq, links = links.toSeq,
      resource_urls = resources.toSeq, meta_tags = metaTags.toMap)
  }

  // ---- P12 regex fallback path (reference `src/main.rs:417-466`) ----
  // Kept as a faithful alternative extraction for pathological inputs and
  // as the oracle for the fallback semantics; patterns from
  // `src/main.rs:54-68` re-expressed in Java regex (Rust's (?U) ungreedy
  // flag becomes lazy quantifiers).
  private val BodyRe = "(?s)<(?:body|BODY).*>(.*)".r
  private val TitleRe = java.util.regex.Pattern.compile("(?s)<(?:title|TITLE).*?>(.*?)<")
  private val ScriptStyleRe = java.util.regex.Pattern.compile(
    "(?s)(<(?:script|SCRIPT|style|STYLE).*?>.*?</(?:script|SCRIPT|style|STYLE).*?>)")
  private val TagRe = java.util.regex.Pattern.compile("(?s)</*.*?>")
  private val LinkRe = java.util.regex.Pattern.compile(
    "(?s)\\s+(?:[^>]*?\\s+)?href=[\"'](.*?)[\"']")
  private val ResourceRe = java.util.regex.Pattern.compile(
    "(?s)\\s+(?:[^>]*?\\s+)?src=[\"'](.*?)[\"']")
  private val WsRe = java.util.regex.Pattern.compile("(\\s|\\\\n){2,}")

  def parseFallback(html: String): HtmlResult = {
    if (html == null || html.isEmpty) return HtmlResult.empty
    val body = BodyRe.findFirstMatchIn(html).map(_.group(1)).getOrElse("")
    val noScript = ScriptStyleRe.matcher(body).replaceAll(" ")
    val noTags = TagRe.matcher(noScript).replaceAll(" ")
    val textStr = WsRe.matcher(noTags).replaceAll(" ").trim
    val tm = TitleRe.matcher(html)
    val title = if (tm.find()) tm.group(1).trim else ""
    def all(p: java.util.regex.Pattern, s: String): Seq[String] = {
      val m = p.matcher(s); val out = mutable.ArrayBuffer[String]()
      while (m.find()) out += m.group(1)
      out.toSeq
    }
    HtmlResult(ok = true, html_errors = "", title = title,
      text = if (textStr.isEmpty) Nil else Seq(textStr),
      headings_text = Nil, links = all(LinkRe, html).filterNot(h =>
        h.isEmpty || h.startsWith("_") || h.startsWith("#")),
      resource_urls = all(ResourceRe, html), meta_tags = Map.empty)
  }

  /** P10 whitespace collapse, parser path: runs removed entirely
    * (reference `src/main.rs:54,384-386` replaces with empty string). */
  def collapseWhitespaceParser(s: String): String =
    WsRe.matcher(s).replaceAll("")

  /** P10 whitespace collapse, fallback/soup path: runs → single space. */
  def collapseWhitespaceSoup(s: String): String =
    WsRe.matcher(s).replaceAll(" ")
}
