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

  /** d21: EMBEDDING-SPACE benchmark contamination — the third tier of
    * the decontamination stack: d05 catches verbatim copies (digest),
    * d15 catches pasted excerpts (13-gram overlap), and this catches
    * PARAPHRASE leakage — a benchmark item rewritten enough that no
    * 13-gram survives but the embedding still sits at cosine ≈ 1
    * (the modern-eval decontamination gap both GPT-3 and FineWeb-style
    * digest/gram passes are blind to).
    *
    * Fixture (the s02 plant device on a benchmark split): vectors with
    * `vec_id <` [[BenchN]] are the benchmark; the corpus is everything
    * else PLUS a perturbed copy of each benchmark vector at
    * `vec_id + 100000` (first component +0.05f ⇒ cosine ≈ 0.999 against
    * its source — a stand-in paraphrase; natural pairwise cosines in
    * this corpus stay ≲ 0.6, so the 0.9 threshold discriminates).
    *
    * Scale shape (100 TB posture): band signatures are computed
    * MAP-SIDE (md5-Rademacher ±1 planes, fixed-point integer dot
    * products — s03's fully SQL-replayable device, 8 bands × 8 bits =
    * s02's collision dial: a cosine-0.999 pair misses all 8 bands with
    * p ≈ 2e-8, a random pair collides anywhere with p ≈ 3%); the
    * benchmark's banded signature table is BROADCAST (benchmark ≪
    * corpus — the d15 assumption made explicit), so candidate
    * generation and the exact-cosine verify are both map-side over the
    * corpus scan, and the ONLY shuffle in the plan is the final
    * distinct over (corpus_id, bench_id, qcos) long triples. No
    * corpus×benchmark product, no corpus-side self-join: cost is linear
    * in corpus size with a broadcast-bounded constant.
    *
    * Oracle: the ENTIRE path replayed in SQL — the float perturbation
    * (exact: a float+float sum fits in a double, so DuckDB's
    * double-add-then-round-to-float equals Scala's single-rounded
    * float add), the 2^-24 fixed-point sign bits, the banded bucket
    * join, and the exact-cosine verify as [[SimilarityOps.cosFoldSql]]
    * with the 2^32-quantized score projected out. */
  private val BenchN = 32L
  private val D21Bands = 8
  private val D21Bits = 8

  private def d21Planes =
    graft.sim.SimilarityOps.md5Planes(D21Bands * D21Bits, 64)

  /** Corpus and benchmark frames with their band buckets exploded —
    * shared by the operator and the candidate-liveness spec. Returns
    * (corpusBuckets(corpus_id, c_emb, bucket), benchBuckets(bench_id,
    * b_emb, bucket)). */
  private[graft] def d21Sides(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val planes = d21Planes
    val nBands = D21Bands; val bits = D21Bits
    val bandsU = udf { v: Seq[Float] =>
      val sig = graft.sim.SimilarityOps.md5SignBits(v, planes)
      (0 until nBands).map(b =>
        (b.toLong << 32) | ((sig >>> (b * bits)) & ((1L << bits) - 1)))
    }
    val perturb = udf { v: Seq[Float] =>
      if (v.isEmpty) v else (v.head + 0.05f) +: v.tail
    }
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val bench = emb.filter($"vec_id" < BenchN)
    val corpus = emb.filter($"vec_id" >= BenchN).unionByName(
      bench.select(($"vec_id" + graft.sim.SimilarityOps.Shift).as("vec_id"),
        perturb($"embedding").as("embedding")))
    (corpus.select($"vec_id".as("corpus_id"), $"embedding".as("c_emb"),
        explode(bandsU($"embedding")).as("bucket")),
      bench.select($"vec_id".as("bench_id"), $"embedding".as("b_emb"),
        explode(bandsU($"embedding")).as("bucket")))
  }

  /** Bucket-collision candidate pairs BEFORE the exact verify — the
    * spec asserts these strictly exceed the flagged set, so the 0.9
    * threshold is live (rejecting random collisions), not vacuous. */
  private[graft] def d21Candidates(s: SparkSession, d: String): DataFrame = {
    val (corpusB, benchB) = d21Sides(s, d)
    corpusB.join(broadcast(benchB), "bucket")
      .select(col("corpus_id"), col("bench_id")).distinct()
  }

  def d21_semantic_contamination(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (corpusB, benchB) = d21Sides(s, d)
    corpusB.join(broadcast(benchB), "bucket")
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine_sim($"c_emb", $"b_emb"))
      .filter($"cos" >= 0.9)
      .select($"corpus_id", $"bench_id",
        ($"cos" * lit(graft.sim.SimilarityOps.CosKeyScale)).cast("long")
          .as("qcos"))
      .distinct()
      .orderBy($"corpus_id", $"bench_id")
  }

  val d21Oracle: String = {
    import graft.sim.SimilarityOps.cosFoldSql
    s"""WITH bench AS (
      |  SELECT vec_id AS bench_id, embedding
      |  FROM embeddings WHERE vec_id < $BenchN),
      |corpus AS (
      |  SELECT vec_id AS corpus_id, embedding
      |  FROM embeddings WHERE vec_id >= $BenchN
      |  UNION ALL
      |  SELECT bench_id + 100000 AS corpus_id,
      |    list_prepend(CAST(CAST(embedding[1] AS DOUBLE)
      |        + CAST(CAST(0.05 AS FLOAT) AS DOUBLE) AS FLOAT),
      |      embedding[2:]) AS embedding
      |  FROM bench),
      |sgn AS (
      |  SELECT b,
      |    list_transform(range(0, 64), i -> CASE WHEN
      |        strpos('02468ace', substr(md5('lsh:' || b || ':' || i), 1, 1)) > 0
      |      THEN 1 ELSE -1 END) AS srow
      |  FROM (SELECT unnest(range(0, ${D21Bands * D21Bits})) AS b)),
      |cq AS (
      |  SELECT corpus_id, embedding,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 16777216) AS BIGINT)) AS qv
      |  FROM corpus),
      |bq AS (
      |  SELECT bench_id, embedding,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 16777216) AS BIGINT)) AS qv
      |  FROM bench),
      |cbits AS (
      |  SELECT corpus_id, b // $D21Bits AS band,
      |    CAST(SUM(CASE WHEN list_sum(
      |        list_transform(range(0, 64), i -> sgn.srow[i + 1] * qv[i + 1])
      |      ) > 0 THEN (1 << (b % $D21Bits)) ELSE 0 END) AS BIGINT) AS byte
      |  FROM cq CROSS JOIN sgn GROUP BY corpus_id, b // $D21Bits),
      |bbits AS (
      |  SELECT bench_id, b // $D21Bits AS band,
      |    CAST(SUM(CASE WHEN list_sum(
      |        list_transform(range(0, 64), i -> sgn.srow[i + 1] * qv[i + 1])
      |      ) > 0 THEN (1 << (b % $D21Bits)) ELSE 0 END) AS BIGINT) AS byte
      |  FROM bq CROSS JOIN sgn GROUP BY bench_id, b // $D21Bits),
      |cand AS (
      |  SELECT DISTINCT cb.corpus_id, bb.bench_id
      |  FROM cbits cb JOIN bbits bb
      |    ON cb.band = bb.band AND cb.byte = bb.byte),
      |scored AS (
      |  SELECT c.corpus_id, c.bench_id,
      |    ${cosFoldSql("ce.embedding", "be.embedding")} AS cos
      |  FROM cand c
      |  JOIN corpus ce ON ce.corpus_id = c.corpus_id
      |  JOIN bench be ON be.bench_id = c.bench_id)
      |SELECT corpus_id, bench_id,
      |  CAST(trunc(cos * 4294967296) AS BIGINT) AS qcos
      |FROM scored WHERE cos >= 0.9
      |ORDER BY corpus_id, bench_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d15_ngram_overlap" -> (d15_ngram_overlap _),
    "d21_semantic_contamination" -> (d21_semantic_contamination _))

  val oracle: Map[String, String] = Map(
    "d15_ngram_overlap" -> d15Oracle,
    "d21_semantic_contamination" -> d21Oracle)
}
