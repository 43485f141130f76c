package graft.warc

/** Core record shapes of the WARC→url_resource pipeline.
  *
  * Mirrors the reference data model (SURVEY.md §1.1):
  *  - `WarcRecord`: reference `src/main.rs:5-8` — WARC version, a
  *    case-insensitive header map (normalized to lowercase keys at parse
  *    time), raw body bytes; plus the source file name carried along.
  *  - `HtmlResult`: reference `src/lib.rs:32-56` — parse output with
  *    sentinel (non-null) defaults.
  *  - `UrlResource`: reference Avro schema `src/main.rs:69-99` — the
  *    18-field output contract. All fields non-null; absent values use
  *    the reference's sentinels ("", 0, 0.0f, empty array/map).
  */
final case class WarcRecord(
    version: String,
    header: Map[String, String],
    content: Array[Byte],
    source: String)

final case class HtmlResult(
    ok: Boolean,
    html_errors: String,
    title: String,
    text: Seq[String],
    headings_text: Seq[String],
    links: Seq[String],
    resource_urls: Seq[String],
    meta_tags: Map[String, String])

object HtmlResult {
  /** All-default result — reference `src/lib.rs:43-56`. */
  val empty: HtmlResult =
    HtmlResult(ok = false, html_errors = " ", title = " ", text = Nil,
      headings_text = Nil, links = Nil, resource_urls = Nil,
      meta_tags = Map.empty)
}

/** The queryable output table — reference Avro schema `src/main.rs:69-99`.
  * Field order and names match the reference contract exactly; Avro
  * `float` stays 32-bit (`Float`) for byte-compat.
  */
final case class UrlResource(
    url: String,
    hostname: String,
    domain_name: String,
    size_bytes: Int,
    load_time: Float,
    title: String,
    text_content: String,
    headings_text: String,
    word_count: Int,
    links: Seq[String],
    resource_urls: Seq[String],
    keywords: Map[String, Float],
    meta_tags: Map[String, String],
    headers: Map[String, String],
    google_analytics: Seq[String],
    google_analytics_config: Seq[String],
    html_errors: String,
    source: String)
