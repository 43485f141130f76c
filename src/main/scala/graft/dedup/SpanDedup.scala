package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import DedupOps.{withCache, withNearDups}

/** Exact-substring span REMOVAL — the second half of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better"): d12
  * detects duplicated spans; d13 emits the CLEANED corpus, keeping the
  * first occurrence of every duplicated span and deleting the tokens of
  * every later aligned occurrence.
  *
  * Semantics (token granularity, window W = 20, stride 1 — d12's
  * geometry): a window digest with ≥ 2 instances anywhere in the corpus
  * (cross- OR within-document, the paper's "appears more than once")
  * is a duplicated span. Its KEEPER is the lexicographically smallest
  * (doc_id, pos) instance; every other instance marks its W token
  * positions for removal. A document's cleaned text is its surviving
  * tokens joined by single spaces (token granularity normalizes
  * whitespace — same contract as the tokenized windows themselves).
  * Planted near-dup copies (`DedupOps.withNearDups`) therefore redact
  * to empty — every window they contain also exists in the base doc at
  * the same position, and the base doc (smaller doc_id) is the keeper —
  * while base documents survive untouched except where they share
  * ≥ 20-token runs with other base docs.
  *
  * Scale shape (100 TB posture): the reference implementation builds a
  * corpus-wide suffix array; the distributed shape needs none of it —
  * every stage is linear in corpus tokens with bounded fan-out:
  * map-side window digests (the d12 explode), ONE digest shuffle for
  * (count, keeper) per digest, a 1:1 join back, a W-bounded index
  * explode (≤ W rows per duplicate instance, deduplicated to ≤ one row
  * per covered token), one (doc_id, idx) anti-join, and a per-document
  * rebuild — partitioned by doc_id, never a global sort, never a
  * pairwise product (the digest IS the equivalence class, so removal
  * cost scales with duplicate MASS, not duplicate pairs²).
  * Fully SQL-expressible → oracle-checked (per-doc md5 of the cleaned
  * text + removal counts, the t06 pattern). */
object SpanDedup {

  /** d13: cleaned corpus after exact-substring span removal. One row per
    * document: original token count, removed token count, md5 of the
    * cleaned text. */
  def d13_span_removal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = 20
    val docs = DedupOps.withNearDups(s, d)
    val toks = docs
      .withColumn("toks", when(length(trim($"text")) === 0,
          array().cast("array<string>"))
        .otherwise(split(trim($"text"), "\\s+")))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("n_tokens"))
    DedupOps.withCache(toks) { tk =>
      // sliding-window digests, 1-based positions (the d12 window set,
      // with the position kept so instances are addressable)
      val wins = tk.filter(size($"toks") >= W)
        .select($"doc_id", posexplode(expr(
          s"transform(sequence(1, size(toks) - ${W - 1}), " +
            s"i -> md5(array_join(slice(toks, i, $W), ' ')))"))
          .as(Seq("p0", "h")))
        .select($"doc_id", ($"p0" + 1).cast("long").as("pos"), $"h")
      // one digest shuffle: instance count + keeper (min (doc_id, pos) —
      // struct min is lexicographic) per span digest
      val freq = wins.groupBy($"h").agg(count(lit(1)).as("cnt"),
        min(struct($"doc_id", $"pos")).as("keeper"))
      // every non-keeper instance of a duplicated span covers W token
      // positions; distinct bounds the marked set by the doc's length
      val removed = wins.join(freq, "h")
        .filter($"cnt" >= 2 &&
          !($"doc_id" === $"keeper.doc_id" && $"pos" === $"keeper.pos"))
        .select($"doc_id", explode(sequence($"pos", $"pos" + (W - 1))).as("idx"))
        .distinct()
      val tokens = tk.select($"doc_id", posexplode($"toks").as(Seq("p0", "tok")))
        .select($"doc_id", ($"p0" + 1).cast("long").as("idx"), $"tok")
      val kept = tokens.join(removed, Seq("doc_id", "idx"), "left_anti")
      // rebuild per document: collect_list order is nondeterministic, the
      // (unique-idx) struct sort makes the joined text a pure function of
      // the data
      val clean = kept.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct($"idx", $"tok"))),
            x => x("tok")), " ").as("clean_text"))
      tk.select($"doc_id", $"n_tokens")
        .join(clean, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          ($"n_tokens" - coalesce($"n_kept", lit(0L))).as("n_removed"),
          md5(coalesce($"clean_text", lit(""))).as("clean_md5"))
        .orderBy($"doc_id")
    }
  }

  val d13Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1)
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+19], ' ')) AS h
      |  FROM all_docs, UNNEST(range(1, len(toks) - 18)) AS u(i)
      |  WHERE len(toks) >= 20),
      |marked AS (
      |  SELECT doc_id, pos,
      |    COUNT(*) OVER (PARTITION BY h) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
      |  FROM wins),
      |removed_idx AS (
      |  SELECT DISTINCT doc_id, pos + j AS idx
      |  FROM marked, UNNEST(range(0, 20)) AS r(j)
      |  WHERE cnt >= 2 AND rk > 1),
      |tokens AS (
      |  SELECT doc_id, i AS idx, toks[i] AS tok
      |  FROM all_docs, UNNEST(range(1, len(toks) + 1)) AS t(i)),
      |kept AS (
      |  SELECT t.doc_id, t.idx, t.tok
      |  FROM tokens t ANTI JOIN removed_idx r USING (doc_id, idx)),
      |clean AS (
      |  SELECT doc_id, array_to_string(list(tok ORDER BY idx), ' ') AS clean_text,
      |    COUNT(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT a.doc_id,
      |  CAST(len(a.toks) AS BIGINT) AS n_tokens,
      |  CAST(len(a.toks) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed,
      |  md5(COALESCE(c.clean_text, '')) AS clean_md5
      |FROM all_docs a LEFT JOIN clean c USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** d12: duplicated-SPAN detection — the exact-substring dedup stage of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), at token granularity: every SLIDING 20-token window of
    * every document is digested, and a window whose digest occurs in ≥ 2
    * distinct documents marks a duplicated span. Sliding windows (stride
    * 1) catch repeats at ANY alignment — the case d11's fixed blocks
    * miss — at the cost of ~n_tok windows per doc, still linear in
    * corpus tokens. The reference implementation uses a suffix array;
    * the distributed shape is this digest-shuffle (explode map-side, ONE
    * shuffle on the window digest, digest join back), which needs no
    * global sorted structure and parallelizes by partition. Reported
    * per corpus: window counts, duplicated-window mass, and how many
    * documents contain at least one duplicated span (the planted
    * near-dup copies guarantee a known large duplicated-span set).
    * Fully SQL-expressible → oracle-checked. */
  def d12_span_dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val W = 20
    val docs = withNearDups(s, d)
    val wins = docs
      .withColumn("toks", when(length(trim($"text")) === 0,
          array().cast("array<string>"))
        .otherwise(split(trim($"text"), "\\s+")))
      .filter(size($"toks") >= W)
      .select($"doc_id", explode(expr(
        s"transform(sequence(1, size(toks) - ${W - 1}), " +
          s"i -> array_join(slice(toks, i, $W), ' '))")).as("win"))
    withCache(wins.select($"doc_id", md5($"win").as("h"))) { l =>
      val freq = l.groupBy($"h").agg(countDistinct($"doc_id").as("ddf"))
      l.join(freq, "h")
        .agg(count(lit(1)).as("n_windows"),
          countDistinct($"h").as("n_distinct_windows"),
          countDistinct(when($"ddf" >= 2, $"h")).as("n_dup_windows"),
          sum(when($"ddf" >= 2, 1L).otherwise(0L)).as("n_dup_instances"),
          countDistinct(when($"ddf" >= 2, $"doc_id")).as("n_docs_with_dup_span"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
        .select($"n_docs", $"n_windows", $"n_distinct_windows",
          $"n_dup_windows", $"n_dup_instances", $"n_docs_with_dup_span")
    }
  }

  val d12Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1)
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id, array_to_string(toks[i:i+19], ' ') AS win
      |  FROM all_docs, UNNEST(range(1, len(toks) - 18)) AS u(i)
      |  WHERE len(toks) >= 20),
      |l AS (SELECT doc_id, md5(win) AS h FROM wins),
      |f AS (SELECT h, COUNT(DISTINCT doc_id) AS ddf FROM l GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM all_docs) AS n_docs,
      |  COUNT(*) AS n_windows,
      |  COUNT(DISTINCT l.h) AS n_distinct_windows,
      |  COUNT(DISTINCT CASE WHEN ddf >= 2 THEN l.h END) AS n_dup_windows,
      |  CAST(SUM(CASE WHEN ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_instances,
      |  COUNT(DISTINCT CASE WHEN ddf >= 2 THEN doc_id END)
      |    AS n_docs_with_dup_span
      |FROM l JOIN f USING (h)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d12_span_dedup" -> (d12_span_dedup _),
    "d13_span_removal" -> (d13_span_removal _))

  val oracle: Map[String, String] = Map(
    "d12_span_dedup" -> d12Oracle,
    "d13_span_removal" -> d13Oracle)
}
