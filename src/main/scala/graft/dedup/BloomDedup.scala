package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Bloom-filter MEMBERSHIP pre-filter for dedup — the memory-bounded
  * probabilistic structure every at-scale ingest runs BEFORE exact
  * dedup: a new batch probes a compact bit-set summary of the corpus
  * digests and only claimed-duplicate docs proceed to the exact
  * verify, so the common case (novel doc) never touches the corpus.
  * Bloom semantics: no false negatives ever (an exact copy is always
  * claimed — asserted in spec), false positives at a rate set by the
  * bits/element budget.
  *
  * Determinism/oracle: the k = 4 hash positions are md5-hex substrings
  * parsed as unsigned 32-bit integers mod m (the repo's established
  * engine-identical hash device — Spark `conv(hex, 16, 10)` ==
  * DuckDB `CAST(concat('0x', hex) AS UBIGINT)`), and m is
  * corpus-scaled: 8·nextPow2(N) bits ≈ 8 bits/element ⇒ theoretical
  * FP ≈ (1 − e^(−k·N/m))^k ≈ 2% at half fill. Fully SQL-expressible →
  * oracle-checked (the set of DISTINCT set-bit positions stands in for
  * the bitset: a doc is claimed iff ALL its distinct positions are
  * set — identical semantics, exact in SQL).
  *
  * Scale shape (100 TB posture): the filter IS the distinct-position
  * table — ≤ min(k·N, m) rows from ONE corpus shuffle (built once per
  * corpus like d08's signature store; at 8 bits/element it is ~1/1000
  * the corpus text bytes). The probe is a position equi-join
  * (batch×k rows against the filter) plus a per-doc rollup — linear,
  * no pairwise products, no corpus text touched by the probe at all;
  * the exact-verify join that would follow (d07's digest layer) runs
  * only on the claimed subset. */
object BloomDedup {

  private val K = 4

  /** Corpus-scaled filter size: 8·nextPow2(n) bits (≈ 8–16 bits per
    * element depending on where n falls) — FP stays ~1–2% at any
    * corpus size; power-of-two so the oracle's float CEIL(LOG2(n))
    * computes the identical m. */
  private[dedup] def bloomBits(n: Long): Long = {
    require(n > 0, "empty corpus")
    8L * java.lang.Long.highestOneBit(math.max(1L, 2 * n - 1))
  }

  /** The k md5-derived positions of a text column, as an array. */
  private def positions(textCol: Column, m: Long): Column = {
    val hex = md5(textCol)
    array((0 until K).map(j =>
      (conv(substring(hex, 1 + 8 * j, 8), 16, 10).cast("long") % m)): _*)
  }

  /** d14: Bloom membership probe of a planted batch (exact copies of
    * every 3rd corpus doc ∪ novel variants of every 5th) against the
    * corpus filter. One row: corpus/batch/filter sizes, claimed vs
    * exact-true duplicates, false positives (claimed − true; claimed ⊇
    * true because Bloom has no false negatives). */
  def d14_bloom_dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the corpus is read by the filter build, the true-dup digest side,
    // the batch synthesis, and two counts — cache it (and the filter
    // position table, consumed by both the probe join and the set-bit
    // count) so the probe reads parquet once, not ~5 times
    DedupOps.withCache(Tables.documents(s, d).select($"doc_id", $"text")) { docs =>
      val m = bloomBits(docs.count())
      // the planted-batch id offset is CORPUS-SCALED: with fixed
      // +200000/+300000 offsets, two corpus ids exactly 100000 apart
      // (one %3, one %5) would collide onto one batch doc_id and mix
      // their positions in the per-doc rollup. off > max(doc_id) makes
      // the two offset spaces provably disjoint for any id layout.
      val off = docs.agg(max($"doc_id")).collect()(0).getLong(0) + 1L
      DedupOps.withCache(
          docs.select(explode(positions($"text", m)).as("pos")).distinct()) { filterPos =>
        val batch = docs.filter($"doc_id" % 3 === 0)
          .select(($"doc_id" + off).as("doc_id"), $"text")
          .unionByName(docs.filter($"doc_id" % 5 === 0)
            .select(($"doc_id" + 2L * off).as("doc_id"),
              concat($"text", lit(" xnovelq")).as("text")))
        DedupOps.withCache(batch) { b =>
          val batchPos = b.select($"doc_id", explode(positions($"text", m)).as("pos"))
            .distinct()
          val claimed = batchPos
            .join(filterPos.withColumn("hit", lit(1)), Seq("pos"), "left")
            .groupBy($"doc_id")
            .agg(count(lit(1)).as("n_pos"), count($"hit").as("n_hit"))
            .filter($"n_pos" === $"n_hit")
            .select($"doc_id")
          val trueDups = b.join(docs.select(md5($"text").as("dg")).distinct(),
            md5(b("text")) === $"dg", "left_semi").select($"doc_id")
          claimed.agg(count(lit(1)).as("n_claimed"))
            .crossJoin(trueDups.agg(count(lit(1)).as("n_true_dups")))
            .crossJoin(b.agg(count(lit(1)).as("n_batch")))
            .crossJoin(docs.agg(count(lit(1)).as("n_corpus")))
            .crossJoin(filterPos.agg(count(lit(1)).as("n_set_bits")))
            .select($"n_corpus", $"n_batch", lit(m).as("m_bits"), $"n_set_bits",
              $"n_claimed", $"n_true_dups",
              ($"n_claimed" - $"n_true_dups").as("n_false_positives"))
        }
      }
    }
  }

  val d14Oracle: String =
    """WITH params AS (
      |  SELECT CAST(8 * POWER(2, CEIL(LOG2(COUNT(*)))) AS BIGINT) AS m
      |  FROM documents),
      |corpus_pos AS (
      |  SELECT DISTINCT (CAST(concat('0x', substr(md5(text), 1 + 8*j, 8)) AS UBIGINT)
      |    % (SELECT m FROM params)) AS pos
      |  FROM documents, UNNEST(range(0, 4)) AS u(j)),
      |off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
      |batch AS (
      |  SELECT doc_id + (SELECT o FROM off) AS doc_id, text
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2 * (SELECT o FROM off), text || ' xnovelq'
      |  FROM documents WHERE doc_id % 5 = 0),
      |batch_pos AS (
      |  SELECT DISTINCT doc_id,
      |    (CAST(concat('0x', substr(md5(text), 1 + 8*j, 8)) AS UBIGINT)
      |      % (SELECT m FROM params)) AS pos
      |  FROM batch, UNNEST(range(0, 4)) AS u(j)),
      |claimed AS (
      |  SELECT bp.doc_id
      |  FROM batch_pos bp LEFT JOIN corpus_pos cp USING (pos)
      |  GROUP BY bp.doc_id
      |  HAVING COUNT(*) = COUNT(cp.pos)),
      |true_dup AS (
      |  SELECT DISTINCT b.doc_id FROM batch b
      |  JOIN (SELECT DISTINCT md5(text) AS dg FROM documents) c
      |    ON md5(b.text) = c.dg)
      |SELECT (SELECT COUNT(*) FROM documents) AS n_corpus,
      |  (SELECT COUNT(*) FROM batch) AS n_batch,
      |  (SELECT m FROM params) AS m_bits,
      |  (SELECT COUNT(*) FROM corpus_pos) AS n_set_bits,
      |  (SELECT COUNT(*) FROM claimed) AS n_claimed,
      |  (SELECT COUNT(*) FROM true_dup) AS n_true_dups,
      |  (SELECT COUNT(*) FROM claimed) - (SELECT COUNT(*) FROM true_dup)
      |    AS n_false_positives""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d14_bloom_dedup" -> (d14_bloom_dedup _))

  val oracle: Map[String, String] = Map(
    "d14_bloom_dedup" -> d14Oracle)
}
