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

  /** Curated subset of the Public Suffix List (publicsuffix.org — public-
    * domain data; the reference links a full PSL crate via
    * `addr::DomainName::root`, `src/main.rs:333-339`). Multi-label rules
    * only — single-label TLDs fall out of the default "*" rule. Covers
    * the ccTLD second-level registries of the major registries plus the
    * common private-registry suffixes (github.io-class). Matching
    * implements the real PSL algorithm (longest match, `*.` wildcard
    * rules, `!` exceptions), so widening coverage is a data edit. */
  private val suffixRules: Set[String] = Set(
    // au (+ state suffixes)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au", "wa.au",
    // uk
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "ac.uk",
    "gov.uk", "nhs.uk", "police.uk",
    // nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "health.nz", "mil.nz",
    // jp
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    // cn / tw / hk
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "adv.br",
    "ind.br", "inf.br", "jus.br", "leg.br", "mil.br", "nom.br", "rec.br", "tv.br",
    // za
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "mil.za", "nom.za", "school.za",
    // in
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "nic.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    // kr / sg / my / ph / th / vn / id
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "mi.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.id", "net.id", "or.id", "ac.id", "sch.id", "go.id", "mil.id", "web.id",
    "my.id", "biz.id",
    // mx / ar / tr / il / ua / pl / ru
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "av.tr", "dr.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "idf.il", "k12.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    // fr / it / es / pt / gr / ro
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "tm.fr",
    "gov.it", "edu.it",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro",
    // africa / middle-east
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke", "info.ke",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng", "sch.ng", "mil.ng",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
    "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    // ca provinces + federal
    "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    // us states (each state code is a public suffix per the PSL)
    "al.us", "ak.us", "az.us", "ar.us", "ca.us", "co.us", "ct.us", "de.us",
    "fl.us", "ga.us", "hi.us", "ia.us", "id.us", "il.us", "in.us", "ks.us",
    "ky.us", "la.us", "ma.us", "md.us", "me.us", "mi.us", "mn.us", "mo.us",
    "ms.us", "mt.us", "nc.us", "nd.us", "ne.us", "nh.us", "nj.us", "nm.us",
    "nv.us", "ny.us", "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us",
    "sd.us", "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us", "dc.us",
    // common private-registry suffixes
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "azurewebsites.net", "cloudapp.net",
    "cloudfront.net", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev", "s3.amazonaws.com")

  /** PSL wildcard rules (`*.ck` ⇒ every third-level under ck is a
    * suffix) and their exceptions (`!www.ck`). */
  private val wildcardRules: Set[String] = Set("ck")
  private val exceptionRules: Set[String] = Set("www.ck")

  /** P2: registrable-domain root of a hostname, by the PSL algorithm:
    * the public suffix is the LONGEST matching rule (exception rules
    * beat wildcards; unknown TLDs get the default single-label rule),
    * and the root is the suffix plus one more label. A hostname that IS
    * a public suffix, an IPv4 literal, or a single label is returned
    * unchanged (the reference `unwrap`s and panics on non-domains,
    * `src/main.rs:336`; returning the input is our documented
    * divergence, SURVEY §7 item 3). */
  def domainRoot(hostname: String): String = {
    if (hostname == null || hostname.isEmpty) return ""
    val h = hostname.toLowerCase.stripSuffix(".")
    val labels = h.split('.')
    if (labels.length <= 1) return h
    if (labels.forall(l => l.nonEmpty && l.forall(c => c.isDigit))) return h // IPv4
    // longest matching suffix: walk candidate suffixes from longest down
    var suffixLen = 1 // default rule "*": the TLD itself
    var i = 0
    var found = false
    while (i < labels.length && !found) {
      val candidate = labels.drop(i).mkString(".")
      val n = labels.length - i
      if (exceptionRules.contains(candidate)) {
        suffixLen = n - 1; found = true // exception: suffix is rule minus first label
      } else if (suffixRules.contains(candidate)) {
        suffixLen = n; found = true
      } else if (n >= 2 && wildcardRules.contains(labels.drop(i + 1).mkString("."))) {
        suffixLen = n; found = true
      } else i += 1
    }
    if (labels.length <= suffixLen) h // the hostname IS a public suffix
    else labels.takeRight(suffixLen + 1).mkString(".")
  }
}
