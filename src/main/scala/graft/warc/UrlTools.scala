package graft.warc

import java.net.URI

/** URL canonicalization + public-suffix domain root (SURVEY.md §2.3
  * P2/P9; reference `src/lib.rs:400-417`, `src/main.rs:333-339`).
  */
object UrlTools {

  private val StripRe = java.util.regex.Pattern.compile("'|“|\"|&quot;|%\\d\\d$")

  /** Resolve one link against the page URL; unresolvable links are kept
    * as-is (reference behavior). Normalizes bare-authority URLs to end
    * with "/" (rust-url does; java.net.URI does not —
    * `tests/lib-tests.rs:34-37` depends on it). */
  def resolveOne(pageUrl: String, link: String): String = {
    val cleaned = StripRe.matcher(link.trim).replaceAll("")
    val resolved =
      try {
        val base = new URI(pageUrl)
        val r = base.resolve(cleaned).toString
        r
      } catch { case _: Exception => cleaned }
    // bare authority (scheme://host[:port] with no path) gets a trailing /
    val schemeEnd = resolved.indexOf("://")
    if (schemeEnd > 0 && resolved.indexOf('/', schemeEnd + 3) < 0 &&
        resolved.indexOf('?', schemeEnd + 3) < 0 && resolved.indexOf('#', schemeEnd + 3) < 0)
      resolved + "/"
    else resolved
  }

  /** P9: sort+dedup, resolve each against the page URL, sort+dedup again
    * (reference `src/lib.rs:400-417` — dedup on both sides of the resolve
    * because cleaning can collapse distinct raw hrefs). */
  def absolutize(pageUrl: String, links: Seq[String]): Seq[String] =
    if (links == null) Nil
    else links.distinct.sorted.map(resolveOne(pageUrl, _)).distinct.sorted

  /** Multi-label public suffixes this engine knows (the reference links a
    * full public-suffix-list crate; the corpus is .gov.au-centric so the
    * ccTLD families that actually occur are enumerated, with sane generic
    * behavior otherwise). */
  private val twoLevelSuffixes: Set[String] = Set(
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au", "wa.au",
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
    "co.nz", "org.nz", "govt.nz", "net.nz", "ac.nz",
    "com.sg", "gov.sg", "edu.sg",
    "co.jp", "or.jp", "go.jp", "ne.jp", "ac.jp",
    "com.cn", "gov.cn", "org.cn", "edu.cn", "net.cn")

  /** P2: registrable-domain root of a hostname. The reference `unwrap`s
    * and panics on non-domains (`src/main.rs:336`); we return the input
    * hostname unchanged instead (documented divergence, SURVEY §7 item 3).
    */
  def domainRoot(hostname: String): String = {
    if (hostname == null || hostname.isEmpty) return ""
    val h = hostname.toLowerCase.stripSuffix(".")
    val labels = h.split('.')
    if (labels.length <= 1) return h
    if (labels.forall(l => l.nonEmpty && l.forall(c => c.isDigit))) return h // IPv4
    val lastTwo = labels.takeRight(2).mkString(".")
    if (twoLevelSuffixes.contains(lastTwo)) {
      if (labels.length >= 3) labels.takeRight(3).mkString(".") else h
    } else lastTwo
  }
}
