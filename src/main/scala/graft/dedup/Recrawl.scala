package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** URL-LEVEL LATEST-WINS dedup (d17) — the recrawl stage the content
  * dedup family (d01–d16) deliberately does not cover: a crawl that
  * revisits a URL yields several SNAPSHOTS of the same page, and the
  * pipeline must keep exactly the newest one BEFORE any content-level
  * dedup runs (CC-News / CDX-style `latest capture per URL` semantics —
  * content hashing cannot do this, because every snapshot's text
  * differs and none is a near-dup of the other at typical thresholds).
  *
  * Snapshots are synthesized deterministically from the documents table
  * (the d03/d09 planted-union device): every 5th URL gets a second
  * fetch with drifted text, every 15th a third — so both the
  * single-fetch fast path and 2- and 3-deep histories are exercised.
  *
  * Scale shape: latest-wins is ONE aggregation on url_id using
  * `max_by` — max and max_by both carry map-side partials, so the
  * shuffle moves one (seq, text) pair per URL per map task, never the
  * full fetch history. No window, no sort, no join: at 100 TB of crawl
  * with billions of URLs this is the minimal possible movement (compare
  * the row_number() formulation, which shuffles EVERY snapshot to its
  * URL's partition and sorts there). Keys are URLs — effectively
  * unique, no skew.
  */
object Recrawl {

  def d17_recrawl_latest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    val v1 = docs.select($"doc_id".as("url_id"), lit(1L).as("fetch_seq"), $"text")
    val v2 = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id".as("url_id"), lit(2L).as("fetch_seq"),
        concat($"text", lit(" [recrawl v2]")).as("text"))
    val v3 = docs.filter($"doc_id" % 15 === 0)
      .select($"doc_id".as("url_id"), lit(3L).as("fetch_seq"),
        concat($"text", lit(" [recrawl v3]")).as("text"))
    v1.unionByName(v2).unionByName(v3)
      .groupBy($"url_id")
      .agg(count(lit(1)).as("n_fetches"),
        max($"fetch_seq").as("kept_seq"),
        md5(max_by($"text", $"fetch_seq")).as("kept_md5"))
      .orderBy($"url_id")
  }

  /** Same synthesized history, latest-wins via arg-max in SQL. */
  val d17Oracle: String =
    """WITH snaps AS (
      |  SELECT doc_id AS url_id, CAST(1 AS BIGINT) AS fetch_seq, text
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 2, text || ' [recrawl v2]' FROM documents
      |  WHERE doc_id % 5 = 0
      |  UNION ALL
      |  SELECT doc_id, 3, text || ' [recrawl v3]' FROM documents
      |  WHERE doc_id % 15 = 0)
      |SELECT url_id, COUNT(*) AS n_fetches,
      |  CAST(MAX(fetch_seq) AS BIGINT) AS kept_seq,
      |  md5(max_by(text, fetch_seq)) AS kept_md5
      |FROM snaps GROUP BY 1 ORDER BY 1""".stripMargin

  /** d18: CRAWL-SNAPSHOT DIFF — the day-over-day question the
    * reference's warehouse exists to answer (its BigQuery table is
    * day-partitioned precisely so consecutive crawls can be compared):
    * per domain, how many URLs appeared, disappeared, changed content,
    * or stayed identical between snapshot A and snapshot B.
    *
    * Snapshots are synthesized deterministically from the documents
    * table (the d17 device): A drops every doc_id ≡ 3 (mod 7) ("new
    * today"), B drops every doc_id ≡ 5 (mod 11) ("gone today"), and B
    * drifts the text of every doc_id ≡ 0 (mod 5) ("edited today") — so
    * all four diff classes are populated at every SF.
    *
    * Scale shape: content digests are computed MAP-SIDE and the text
    * column is projected away BEFORE the join, so the one wide stage —
    * a full-outer equi-join on url_id — moves 32-char digests, never
    * page bytes; URLs are effectively unique so the key cannot skew;
    * the per-domain rollup is an ordinary partial-aggregated groupBy.
    * At 100 TB this is the minimal diff: corpus bytes are read once,
    * shuffled never. */
  def d18_crawl_diff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"source", $"text")
    val a = docs.filter($"doc_id" % 7 =!= 3)
      .select($"doc_id".as("url_id"), $"source".as("source_a"),
        md5($"text").as("digest_a"))
    val b = docs.filter($"doc_id" % 11 =!= 5)
      .select($"doc_id".as("url_id"), $"source".as("source_b"),
        md5(when($"doc_id" % 5 === 0, concat($"text", lit(" [edited]")))
          .otherwise($"text")).as("digest_b"))
    a.join(b, Seq("url_id"), "full_outer")
      .select(coalesce($"source_a", $"source_b").as("source"),
        $"digest_a", $"digest_b")
      .groupBy($"source")
      .agg(
        sum(when($"digest_a".isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when($"digest_b".isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when($"digest_a".isNotNull && $"digest_b".isNotNull &&
          $"digest_a" =!= $"digest_b", 1L).otherwise(0L)).as("n_changed"),
        sum(when($"digest_a" === $"digest_b", 1L).otherwise(0L))
          .as("n_unchanged"))
      .orderBy($"source")
  }

  val d18Oracle: String =
    """WITH a AS (
      |  SELECT doc_id AS url_id, source AS source_a, md5(text) AS digest_a
      |  FROM documents WHERE doc_id % 7 <> 3),
      |b AS (
      |  SELECT doc_id AS url_id, source AS source_b,
      |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]'
      |             ELSE text END) AS digest_b
      |  FROM documents WHERE doc_id % 11 <> 5),
      |j AS (
      |  SELECT COALESCE(source_a, source_b) AS source, digest_a, digest_b
      |  FROM a FULL OUTER JOIN b USING (url_id))
      |SELECT source,
      |  CAST(SUM(CASE WHEN digest_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(SUM(CASE WHEN digest_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(SUM(CASE WHEN digest_a IS NOT NULL AND digest_b IS NOT NULL
      |    AND digest_a <> digest_b THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(SUM(CASE WHEN digest_a = digest_b THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unchanged
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** d19: URL-CANONICALIZATION DEDUP — the crawl-frontier normalization
    * every URL-keyed pipeline runs before content dedup: the same page
    * reached as `HTTPS://HOST/x`, `…/x/`, `…/x#frag`, `…/x?utm_…`, or
    * `host:443/x` must collapse to ONE canonical row (min-id keeper,
    * d01's rule) while genuinely different resources (`…/x?page=2`)
    * must NOT. The normalizer is a fixed chain of built-in string/regex
    * expressions — fragment strip, utm_* tracking-param removal anchored
    * to the query portion (split at the first `?`, clean, conditionally
    * recombine — path segments are never touched and a dangling `?`
    * cannot survive), scheme+host lowercasing (path case preserved),
    * default-port removal (http:80 / https:443), trailing-slash strip —
    * chosen to evaluate identically under Java regex (engine) and RE2
    * (oracle): no lookarounds, no backreferences in patterns, only in
    * replacements.
    *
    * Fixture: per-doc base URLs plus one merging variant per doc
    * (rotating by doc_id % 4 over upper-case / utm / slash / fragment)
    * plus a port variant and a NON-merging `?page=2` variant — every
    * rule and the must-not-collapse case are exercised at every SF.
    *
    * Scale shape: canonicalization is pure map-side codegen'd string
    * work; the dedup is one hash aggregation on the canonical key
    * (near-unique — d01's shuffle shape); audit is 1 row. */
  /** The d19 normalizer chain as a reusable column expression (pure
    * map-side codegen'd string work). utm stripping is anchored to the
    * QUERY portion (r14 ADVICE): split at the first '?', normalize only
    * the query, conditionally recombine — a literal 'utm_x=y&' inside a
    * path segment is never touched, and a dangling '?' cannot survive.
    * A leading run of utm params (incl. the whole query) goes in one
    * ^-anchored pass; interior/trailing ones each carry their '&'. */
  def canonicalizeUrl(url: Column): Column = {
    val schemeHost = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val noFrag = regexp_replace(url, "#.*", "")
    val qPos = instr(noFrag, "?")
    val prePart = when(qPos === 0, noFrag)
      .otherwise(noFrag.substr(lit(1), qPos - 1))
    val qryPart = when(qPos === 0, lit(""))
      .otherwise(noFrag.substr(qPos + 1, length(noFrag)))
    val qLead = regexp_replace(qryPart,
      "^(?:utm_[A-Za-z]+=[^&]*(?:&|$))+", "")
    val qRest = regexp_replace(qLead, "&utm_[A-Za-z]+=[^&]*", "")
    val utmClean = when(qRest === "", prePart)
      .otherwise(concat(prePart, lit("?"), qRest))
    val lowered = concat(lower(regexp_extract(utmClean, schemeHost, 0)),
      regexp_replace(utmClean, schemeHost, ""))
    val p80 = regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    val p443 = regexp_replace(p80, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    regexp_replace(p443, "/$", "")
  }

  def d19_url_canonical_dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, d).select($"doc_id")
    def host = concat(lit("docs"), ($"doc_id" % 50).cast("string"),
      lit(".example.gov.au"))
    def base = concat(lit("https://"), host, lit("/page/"), $"doc_id".cast("string"))
    val hostU = concat(lit("DOCS"), ($"doc_id" % 50).cast("string"),
      lit(".EXAMPLE.GOV.AU"))
    val rows = ids.select($"doc_id", base.as("url"))
      .unionByName(ids.filter($"doc_id" % 4 === 0)
        .select(($"doc_id" + 200000L).as("doc_id"),
          concat(lit("HTTPS://"), hostU, lit("/page/"),
            $"doc_id".cast("string")).as("url")))
      .unionByName(ids.filter($"doc_id" % 4 === 1)
        .select(($"doc_id" + 300000L).as("doc_id"),
          concat(base, lit("?utm_source=feed&utm_campaign=x")).as("url")))
      .unionByName(ids.filter($"doc_id" % 4 === 2)
        .select(($"doc_id" + 400000L).as("doc_id"),
          concat(base, lit("/")).as("url")))
      .unionByName(ids.filter($"doc_id" % 4 === 3)
        .select(($"doc_id" + 500000L).as("doc_id"),
          concat(base, lit("#section2")).as("url")))
      .unionByName(ids.filter($"doc_id" % 8 === 0)
        .select(($"doc_id" + 600000L).as("doc_id"),
          concat(base, lit("?page=2")).as("url")))
      .unionByName(ids.filter($"doc_id" % 8 === 1)
        .select(($"doc_id" + 700000L).as("doc_id"),
          concat(lit("https://"), host, lit(":443/page/"),
            $"doc_id".cast("string")).as("url")))
    rows.withColumn("canon", canonicalizeUrl($"url"))
      .groupBy($"canon")
      .agg(count(lit(1)).as("n_in_group"), min($"doc_id").as("keeper_id"))
      .agg(count(lit(1)).as("n_canonical"),
        sum($"n_in_group").as("n_urls"),
        sum(when($"n_in_group" > 1, $"n_in_group" - 1).otherwise(0L))
          .as("n_redundant"),
        sum(when($"n_in_group" > 1, 1L).otherwise(0L)).as("n_groups_multi"),
        sum($"keeper_id").as("keeper_id_sum"))
  }

  /** Same synthesis + the same normalizer chain in RE2 ('g' flag — Spark
    * regexp_replace is always-global, DuckDB defaults to first-match;
    * replacement backrefs are `\1` here vs Spark's `$1`). */
  val d19Oracle: String =
    raw"""WITH ids AS (SELECT doc_id FROM documents),
      |u AS (
      |  SELECT doc_id,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au/page/' || doc_id AS url
      |  FROM ids
      |  UNION ALL
      |  SELECT doc_id + 200000,
      |    'HTTPS://DOCS' || (doc_id % 50) || '.EXAMPLE.GOV.AU/page/' || doc_id
      |  FROM ids WHERE doc_id % 4 = 0
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au/page/' || doc_id
      |      || '?utm_source=feed&utm_campaign=x'
      |  FROM ids WHERE doc_id % 4 = 1
      |  UNION ALL
      |  SELECT doc_id + 400000,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au/page/' || doc_id || '/'
      |  FROM ids WHERE doc_id % 4 = 2
      |  UNION ALL
      |  SELECT doc_id + 500000,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au/page/' || doc_id || '#section2'
      |  FROM ids WHERE doc_id % 4 = 3
      |  UNION ALL
      |  SELECT doc_id + 600000,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au/page/' || doc_id || '?page=2'
      |  FROM ids WHERE doc_id % 8 = 0
      |  UNION ALL
      |  SELECT doc_id + 700000,
      |    'https://docs' || (doc_id % 50) || '.example.gov.au:443/page/' || doc_id
      |  FROM ids WHERE doc_id % 8 = 1),
      |c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u FROM u),
      |cs AS (SELECT doc_id,
      |  CASE WHEN strpos(u, '?') = 0 THEN u
      |       ELSE substr(u, 1, strpos(u, '?') - 1) END AS pre,
      |  CASE WHEN strpos(u, '?') = 0 THEN ''
      |       ELSE substr(u, strpos(u, '?') + 1) END AS qry
      |  FROM c1),
      |cq AS (SELECT doc_id, pre,
      |  regexp_replace(
      |    regexp_replace(qry, '^(?:utm_[A-Za-z]+=[^&]*(?:&|$$))+', '', 'g'),
      |    '&utm_[A-Za-z]+=[^&]*', '', 'g') AS q
      |  FROM cs),
      |c5 AS (SELECT doc_id,
      |  CASE WHEN q = '' THEN pre ELSE pre || '?' || q END AS u FROM cq),
      |c6 AS (SELECT doc_id,
      |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'))
      |    || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g') AS u
      |  FROM c5),
      |c7 AS (SELECT doc_id,
      |  regexp_replace(u, '^(http://[^/:?#]+):80([/?#]|$$)', '\1\2', 'g') AS u FROM c6),
      |c8 AS (SELECT doc_id,
      |  regexp_replace(u, '^(https://[^/:?#]+):443([/?#]|$$)', '\1\2', 'g') AS u FROM c7),
      |cn AS (SELECT doc_id, regexp_replace(u, '/$$', '', 'g') AS canon FROM c8),
      |g AS (SELECT canon, COUNT(*) AS n_in_group, MIN(doc_id) AS keeper_id
      |      FROM cn GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_canonical,
      |  CAST(SUM(n_in_group) AS BIGINT) AS n_urls,
      |  CAST(SUM(CASE WHEN n_in_group > 1 THEN n_in_group - 1 ELSE 0 END) AS BIGINT)
      |    AS n_redundant,
      |  CAST(SUM(CASE WHEN n_in_group > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_multi,
      |  CAST(SUM(keeper_id) AS BIGINT) AS keeper_id_sum
      |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d17_recrawl_latest" -> (d17_recrawl_latest _),
    "d18_crawl_diff" -> (d18_crawl_diff _),
    "d19_url_canonical_dedup" -> (d19_url_canonical_dedup _))

  val oracle: Map[String, String] = Map(
    "d17_recrawl_latest" -> d17Oracle,
    "d18_crawl_diff" -> d18Oracle,
    "d19_url_canonical_dedup" -> d19Oracle)
}
