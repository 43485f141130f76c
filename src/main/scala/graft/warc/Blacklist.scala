package graft.warc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F2 blacklist filter (SURVEY.md §2.2; reference `src/blacklist.rs:1-58`,
  * applied at `src/main.rs:249-255`).
  *
  * The deny-lists are configuration data reproduced from the reference for
  * semantic parity. Expressed as literal Catalyst predicates (`isin` /
  * `contains`) rather than a UDF so constant folding and pushdown apply —
  * at scale the whole filter runs inside the scan's generated code.
  */
object Blacklist {

  val hostnames: Seq[String] = Seq(
    "insolvencynotices.asic.gov.au", "data.gov.au", "trove.nla.gov.au",
    "data.aad.gov.au", "www.trove.nla.gov.au", "epubs.aims.gov.au",
    "services.aad.gov.au", "results.aec.gov.au",
    "periodicdisclosures.aec.gov.au", "transcribe.naa.gov.au",
    "bookshop.nla.gov.au", "recordsearch.naa.gov.au", "library.nma.gov.au",
    "abr.business.gov.au", "collections.anmm.gov.au",
    "elibrary.gbrmpa.gov.au", "channelfinder.acma.gov.au",
    "vrroom.naa.gov.au", "www.tenders.gov.au",
    "dmzapp17p.ris.environment.gov.au", "discoveringanzacs.naa.gov.au",
    "neats.nopta.gov.au", "soda.naa.gov.au", "stat.data.abs.gov.au",
    "store.anmm.gov.au", "toiletmap.gov.au", "training.gov.au",
    "wels.agriculture.gov.au", "www.padil.gov.au",
    "www.screenaustralia.gov.au", "edit.acnc.gov.au", "ifp.mychild.gov.au",
    "printsandprintmaking.gov.au", "link.aiatsis.gov.au")

  val urls: Seq[String] = Seq(
    "http://www.nepc.gov.au/system/files/resources/45fee0f3-1266-a944-91d7-3b98439de8f8/files/dve-prepwk-project2-1-diesel-complex-cuedc.xls",
    "https://www.ncver.edu.au/__data/assets/word_doc/0013/3046/2221s.doc",
    "https://www.acma.gov.au/-/media/Broadcast-Carriage-Policy/Information/Word-document/reg_qld-planning_data-docx.docx?la=en",
    "https://www.acma.gov.au/-/media/Broadcasting-Spectrum-Planning/Information/Word-Document-Digital-TV/Planning-data-Regional-Queensland-TV1.docx?la=en",
    "https://beta.dva.gov.au/sites/default/files/files/providers/vendor/medvendor1sept2015.xls",
    "https://www.ppsr.gov.au/sites/g/files/net3626/f/B2G%20Interface%20Specification%20R4.doc",
    "http://guides.dss.gov.au/sites/default/files/2003_ABSTUDY_Policy_Manual.docx",
    "http://www.nepc.gov.au/system/files/resources/45fee0f3-1266-a944-91d7-3b98439de8f8/files/dve-prepwk-project2-1-diesel-complex-simp-cuedc.xls")

  val urlSubstrings: Seq[String] =
    Seq("ca91-4-xd", "sbs.com.au/ondemand", "sbs.com.au/news", "abc.net.au/news")

  /** True iff the record should be KEPT (not blacklisted). */
  def keep(hostname: Column, url: Column): Column = {
    val denied = hostname.isin(hostnames: _*) || url.isin(urls: _*) ||
      urlSubstrings.map(s => url.contains(s)).reduce(_ || _)
    !denied
  }

  /** Driver-side twin for tests / non-DataFrame callers. */
  def onBlacklist(hostname: String, url: String): Boolean =
    hostnames.contains(hostname) || urls.contains(url) ||
      urlSubstrings.exists(url.contains)
}
