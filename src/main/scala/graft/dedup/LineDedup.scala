package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import DedupOps._

/** Cross-document LINE-level boilerplate dedup (d11), split out of
  * DedupOps (r9 verdict item 4). */
object LineDedup {

  /** d11: cross-document LINE-level boilerplate detection — the
    * RefinedWeb/CCNet curation stage that document-level dedup
    * (d01–d04) cannot express: headers, footers, and navigation chrome
    * repeat ACROSS documents that are otherwise distinct, so the unit of
    * comparison drops to the line. The synthetic corpus has no newlines;
    * "line" = each run of 10 tokens (the last one shorter), which gives
    * the same sharing structure real line-splitting would. A line is
    * boilerplate when its md5 digest appears in ≥ 2 distinct documents
    * (the planted near-dup copies guarantee a known repeated-line set).
    *
    * Scale shape: explode lines (map-side), ONE shuffle on the line
    * digest for the document-frequency aggregate, one digest join back,
    * one final rollup — all linear in corpus size, no pairwise anything
    * (the digest IS the equivalence class, the d01 device applied at
    * line granularity). Fully SQL-expressible → oracle-checked. */
  def d11_line_dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = withNearDups(s, d)
    // empty-text guard: a 1-token doc's planted copy has text "" and an
    // unguarded split would yield [""] ⇒ one phantom empty line, where
    // the oracle's list_slice path yields a zero-element list ⇒ none
    // (code-review finding; no gate corpus has 1-token docs, but the
    // divergence would bite at the first sf that does)
    val linesFromToks = docs
      .withColumn("toks", when(length(trim($"text")) === 0,
          array().cast("array<string>"))
        .otherwise(split(trim($"text"), "\\s+")))
      .select($"doc_id", explode(when(size($"toks") === 0,
          array().cast("array<string>"))
        .otherwise(expr(
          "transform(sequence(0, (size(toks) + 9) div 10 - 1), " +
            "i -> array_join(slice(toks, i * 10 + 1, 10), ' '))"))).as("line"))
    withCache(linesFromToks.select($"doc_id", md5($"line").as("h"),
        size(split($"line", " ")).cast("long").as("ltok"))) { l =>
      val freq = l.groupBy($"h").agg(countDistinct($"doc_id").as("ddf"))
      l.join(freq, "h")
        .agg(count(lit(1)).as("n_lines"),
          countDistinct($"h").as("n_distinct_lines"),
          countDistinct(when($"ddf" >= 2, $"h")).as("n_boilerplate_lines"),
          countDistinct(when($"ddf" >= 2, $"doc_id")).as("n_affected_docs"),
          sum(when($"ddf" < 2, $"ltok").otherwise(0L)).as("kept_tokens"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        .select($"n_docs", $"n_lines", $"n_distinct_lines",
          $"n_boilerplate_lines", $"n_affected_docs", $"kept_tokens")
    }
  }

  val d11Oracle: String =
    // base-side toks are empty-token-filtered so an empty-text doc
    // yields [] (0 lines) like the Spark guard; the planted slice can
    // never contain '' (slicing non-empty tokens)
    """WITH all_docs AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1)
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, array_to_string(toks[i*10+1 : i*10+10], ' ') AS line
      |  FROM all_docs,
      |    UNNEST(range(0, (len(toks) + 9) // 10)) AS u(i)),
      |l AS (SELECT doc_id, md5(line) AS h,
      |        len(string_split(line, ' ')) AS ltok FROM lines),
      |f AS (SELECT h, COUNT(DISTINCT doc_id) AS ddf FROM l GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM all_docs) AS n_docs,
      |  COUNT(*) AS n_lines,
      |  COUNT(DISTINCT l.h) AS n_distinct_lines,
      |  COUNT(DISTINCT CASE WHEN ddf >= 2 THEN l.h END) AS n_boilerplate_lines,
      |  COUNT(DISTINCT CASE WHEN ddf >= 2 THEN doc_id END) AS n_affected_docs,
      |  CAST(SUM(CASE WHEN ddf < 2 THEN ltok ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM l JOIN f USING (h)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d11_line_dedup" -> (d11_line_dedup _))

  val oracle: Map[String, String] = Map(
    "d11_line_dedup" -> d11Oracle)
}
