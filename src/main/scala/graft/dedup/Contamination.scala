package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import graft.text.TextOps

/** N-GRAM OVERLAP decontamination scoring — the GPT-3-appendix /
  * PaLM-style stage d05's digest pass can't cover: d05 catches whole-
  * document copies of a benchmark; real leakage is PARTIAL (a benchmark
  * question pasted inside a long page), visible only at n-gram
  * granularity. The standard device is 13-gram overlap: score each
  * corpus doc by the fraction of its distinct word 13-grams that appear
  * anywhere in the benchmark set, flag docs over a threshold.
  *
  * Benchmark here is planted from the corpus itself (the d05/d07
  * pattern, deterministic and oracle-replayable): every 97th doc
  * contributes its middle token slice (first/last 5 tokens dropped), so
  * planted "leaks" are EXCERPTS, not copies — exactly the case digest
  * matching misses and gram overlap catches (d05 on the same slice
  * would find zero exact hits).
  *
  * Scale shape (100 TB posture): grams travel as md5 DIGESTS, never
  * text — one explode + distinct per side, then a single digest
  * equi-join (benchmark side is corpus-derived, so it is NOT broadcast;
  * the join shuffles ≤ distinct-gram rows per side, the d12 linear
  * contract). Per-doc rollup reuses the join's partitioning; fractions
  * are ratios of the two per-doc integers, computed identically in both
  * engines (one IEEE division each) so the 0.5 flag threshold cannot
  * drift. No pairwise doc×doc product anywhere: cost is linear in
  * corpus grams + benchmark grams. */
object Contamination {

  private val N = 13 // gram width, the GPT-3 decontamination constant

  /** d15: corpus-vs-benchmark 13-gram overlap. One row: benchmark
    * sizes, scored-doc counts, docs with any hit, docs ≥ 50% overlap
    * (flagged), and total hit grams. */
  def d15_ngram_overlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // all distinct 13-gram digests of the token column `tk` (d12's
    // sliding-window device at W = 13)
    val grams = expr(s"transform(sequence(1, size(tk) - ${N - 1}), " +
      s"i -> md5(array_join(slice(tk, i, $N), ' ')))")
    DedupOps.withCache(Tables.documents(s, d)
        .select($"doc_id", TextOps.whitespaceTokens($"text").as("tk"))) { toks =>
      val benchDocs = toks
        .filter($"doc_id" % 97 === 0 && size($"tk") >= N + 10)
        .select($"doc_id", expr(s"slice(tk, 6, size(tk) - 10)").as("tk"))
      val benchGrams = benchDocs.select(explode(grams).as("g")).distinct()
      val docGrams = toks.filter(size($"tk") >= N)
        .select($"doc_id", explode(grams).as("g")).distinct()
      val perDoc = docGrams
        .join(benchGrams.withColumn("hit", lit(1)), Seq("g"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n13"), count($"hit").as("hits"))
      perDoc
        .agg(count(lit(1)).as("n_docs_scored"),
          sum(when($"hits" > 0, 1L).otherwise(0L)).as("n_docs_hit"),
          sum(when($"hits".cast("double") / $"n13" >= 0.5, 1L).otherwise(0L))
            .as("n_flagged"),
          sum($"hits").as("total_hits"))
        .crossJoin(benchDocs.agg(count(lit(1)).as("n_bench_docs")))
        .crossJoin(benchGrams.agg(count(lit(1)).as("n_bench_grams")))
        .select($"n_bench_docs", $"n_bench_grams", $"n_docs_scored",
          $"n_docs_hit", $"n_flagged", $"total_hits")
    }
  }

  val d15Oracle: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    ${TextOps.oracleToks("text")} AS tk
      |  FROM documents),
      |bench AS (
      |  SELECT doc_id AS bench_id, tk[6:len(tk)-5] AS tk
      |  FROM toks WHERE doc_id % 97 = 0 AND len(tk) >= ${N + 10}),
      |bench_grams AS (
      |  SELECT DISTINCT md5(array_to_string(tk[i:i+${N - 1}], ' ')) AS g
      |  FROM bench, UNNEST(range(1, len(tk) - ${N - 2})) AS u(i)),
      |doc_grams AS (
      |  SELECT DISTINCT doc_id, md5(array_to_string(tk[i:i+${N - 1}], ' ')) AS g
      |  FROM toks, UNNEST(range(1, len(tk) - ${N - 2})) AS u(i)
      |  WHERE len(tk) >= $N),
      |per_doc AS (
      |  SELECT dg.doc_id, COUNT(*) AS n13,
      |    COUNT(bg.g) AS hits
      |  FROM doc_grams dg LEFT JOIN bench_grams bg ON dg.g = bg.g
      |  GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM bench) AS n_bench_docs,
      |  (SELECT COUNT(*) FROM bench_grams) AS n_bench_grams,
      |  COUNT(*) AS n_docs_scored,
      |  COUNT(CASE WHEN hits > 0 THEN 1 END) AS n_docs_hit,
      |  COUNT(CASE WHEN CAST(hits AS DOUBLE) / n13 >= 0.5 THEN 1 END)
      |    AS n_flagged,
      |  CAST(SUM(hits) AS BIGINT) AS total_hits
      |FROM per_doc""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d15_ngram_overlap" -> (d15_ngram_overlap _))

  val oracle: Map[String, String] = Map(
    "d15_ngram_overlap" -> d15Oracle)
}
