package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d17_recrawl_latest" -> (d17_recrawl_latest _),
    "d18_crawl_diff" -> (d18_crawl_diff _))

  val oracle: Map[String, String] = Map(
    "d17_recrawl_latest" -> d17Oracle,
    "d18_crawl_diff" -> d18Oracle)
}
