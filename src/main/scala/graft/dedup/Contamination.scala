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

  private[graft] val N = 13 // gram width, the GPT-3 decontamination constant

  /** Broadcast-shape bound for the decontamination stack's benchmark
    * side (r17 verdict item 4): d21/st10/st11 carry the benchmark to
    * every task (a broadcast join or the UDF closure), so a
    * corpus-sized benchmark must fail LOUDLY at this bound — never OOM
    * the driver or silently serialize gigabytes per task. The batch
    * digest-join shape ([[d15Against]]) owns that regime. */
  private[graft] def benchMaxRows(s: SparkSession): Int =
    s.conf.get("spark.graft.decontam.benchMaxRows", "250000").toInt

  /** Driver-side benchmark collect with the [[benchMaxRows]] cap made
    * LOUD: `limit(cap + 1)` bounds the fetched rows (the over-bound
    * case moves cap+1 rows, not the whole frame), and the error names
    * the conf and the in-contract alternative. */
  private[graft] def cappedCollect(df: DataFrame,
      what: String): Array[org.apache.spark.sql.Row] = {
    val cap = benchMaxRows(df.sparkSession)
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what exceeds spark.graft.decontam.benchMaxRows=$cap rows — not " +
        "broadcast-shaped; run the batch digest-join operator " +
        "(Contamination.d15Against) instead, or raise the bound explicitly")
    rows
  }

  // all distinct 13-gram digests of the token column `tk` (d12's
  // sliding-window device at W = 13)
  private def gramsExpr = expr(
    s"transform(sequence(1, size(tk) - ${N - 1}), " +
      s"i -> md5(array_join(slice(tk, i, $N), ' ')))")

  /** The corpus-derived fixture benchmark (see object doc): every 97th
    * doc's middle token slice — EXCERPTS, not copies. Takes the cached
    * corpus token frame so fixture bench and corpus share one scan. */
  private[graft] def d15FixtureBench(toks: DataFrame): DataFrame =
    toks.filter(col("doc_id") % 97 === 0 && size(col("tk")) >= N + 10)
      .select(expr(s"slice(tk, 6, size(tk) - 10)").as("tk"))

  /** Per-doc 13-gram overlap frame `(doc_id, n13, hits)` over
    * pre-tokenized corpus/bench frames — the shared core of [[d15Core]]'s
    * audit rollup and [[d15FlaggedIds]]'s drop decision. Docs under
    * $N tokens contribute no grams and are absent (never flagged). */
  private def d15PerDoc(corpusToks: DataFrame, benchToks: DataFrame): DataFrame = {
    val benchGrams = benchToks.select(explode(gramsExpr).as("g")).distinct()
    val docGrams = corpusToks.filter(size(col("tk")) >= N)
      .select(col("doc_id"), explode(gramsExpr).as("g")).distinct()
    docGrams
      .join(benchGrams.withColumn("hit", lit(1)), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n13"), count(col("hit")).as("hits"))
  }

  /** The decontamination DROP DECISION as a frame: ids of corpus docs
    * whose distinct 13-grams overlap the benchmark's at ≥ 50% (the d15
    * flag rule in integer form, `2·hits ≥ n13` — no float decides a
    * row). This is the d15 tier consumed as a PRE-FILTER — see
    * [[graft.pipeline.TrainingPipeline.p09Against]], which anti-joins
    * the training corpus against it before the composed pipeline runs.
    * Same linear shape as [[d15Against]]: gram digests through one
    * equi-join, no broadcast, no driver collect — a corpus-sized
    * benchmark is in contract. */
  private[graft] def d15FlaggedIds(corpusDocs: DataFrame,
      benchDocs: DataFrame): DataFrame =
    d15PerDoc(
      corpusDocs.select(col("doc_id"),
        TextOps.whitespaceTokens(col("text")).as("tk")),
      benchDocs.select(TextOps.whitespaceTokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= N))
      .filter(col("hits") * 2 >= col("n13"))
      .select(col("doc_id"))

  /** d15 core over pre-tokenized frames — corpus `(doc_id, tk)`,
    * benchmark `(tk)`; bench items under $N tokens contribute no grams
    * and are excluded from `n_bench_docs` (on the fixture the filter is
    * a no-op: sliced docs keep ≥ $N tokens by the N+10 floor). */
  private def d15Core(corpusToks: DataFrame, benchToks0: DataFrame): DataFrame = {
    val benchToks = benchToks0.filter(size(col("tk")) >= N)
    val perDoc = d15PerDoc(corpusToks, benchToks)
    val benchGrams = benchToks.select(explode(gramsExpr).as("g")).distinct()
    perDoc
      .agg(count(lit(1)).as("n_docs_scored"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(when(col("hits").cast("double") / col("n13") >= 0.5, 1L)
          .otherwise(0L)).as("n_flagged"),
        sum(col("hits")).as("total_hits"))
      .crossJoin(benchToks.agg(count(lit(1)).as("n_bench_docs")))
      .crossJoin(benchGrams.agg(count(lit(1)).as("n_bench_grams")))
      .select(col("n_bench_docs"), col("n_bench_grams"), col("n_docs_scored"),
        col("n_docs_hit"), col("n_flagged"), col("total_hits"))
  }

  /** d15: corpus-vs-benchmark 13-gram overlap. One row: benchmark
    * sizes, scored-doc counts, docs with any hit, docs ≥ 50% overlap
    * (flagged), and total hit grams. The registered query instantiates
    * [[d15Core]] with the corpus-derived fixture benchmark; the
    * external-benchmark contract is [[d15Against]]. */
  def d15_ngram_overlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    DedupOps.withCache(Tables.documents(s, d)
        .select($"doc_id", TextOps.whitespaceTokens($"text").as("tk"))) { toks =>
      d15Core(toks, d15FixtureBench(toks))
    }
  }

  /** d15 against a CALLER-SUPPLIED benchmark — the operator contract
    * the fixture query instantiates (r17 verdict item 4). `corpusDocs`
    * needs `(doc_id, text)`; `benchDocs` needs `(text)` — one row per
    * benchmark item, e.g. `spark.read.parquet(benchPath)`. NO size cap
    * here by design: the benchmark travels as gram DIGESTS through a
    * linear equi-join (never broadcast or collected), so a corpus-sized
    * benchmark is in contract — this is the batch shape the streaming
    * gate (st11) and the broadcast tier (d21) defer to when their
    * [[benchMaxRows]] bound trips. */
  def d15Against(s: SparkSession, corpusDocs: DataFrame,
      benchDocs: DataFrame): DataFrame =
    DedupOps.withCache(corpusDocs.select(col("doc_id"),
        TextOps.whitespaceTokens(col("text")).as("tk"))) { toks =>
      d15Core(toks,
        benchDocs.select(TextOps.whitespaceTokens(col("text")).as("tk")))
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
  private[graft] val BenchN = 32L
  private[graft] val D21Bands = 8
  private[graft] val D21Bits = 8

  private def d21Planes =
    graft.sim.SimilarityOps.md5Planes(D21Bands * D21Bits, 64)

  /** Band-bucket explosions of caller frames, both `(vec_id,
    * embedding)`, with the [[benchMaxRows]] broadcast-shape guard
    * attached LAZILY to the benchmark side: a 1-row aggregate
    * cross-joined in (the audit-shape precedent) whose `raise_error`
    * fires inside the plan when the benchmark outgrows the bound — no
    * eager driver job at construction, no silent multi-GB broadcast. */
  private def d21SidesOf(corpus: DataFrame, bench: DataFrame,
      guardBench: Boolean = true): (DataFrame, DataFrame) = {
    val planes = d21Planes
    val nBands = D21Bands; val bits = D21Bits
    val bandsU = udf { v: Seq[Float] =>
      val sig = graft.sim.SimilarityOps.md5SignBits(v, planes)
      (0 until nBands).map(b =>
        (b.toLong << 32) | ((sig >>> (b * bits)) & ((1L << bits) - 1)))
    }
    // the guard belongs to the EXTERNAL entry point (d21Against): the
    // registered fixture's benchmark is 32 rows by construction, and
    // attaching the 1-row count aggregate there re-scanned the bench
    // subtree on every action purely to compare 32 against the cap
    // (r18 review)
    val cap = benchMaxRows(bench.sparkSession)
    val benchGuarded = if (!guardBench) bench else {
      val benchGuard = bench.agg(count(lit(1)).as("nb"))
        .select(when(col("nb") > cap,
            raise_error(concat(
              lit(s"d21 benchmark exceeds spark.graft.decontam.benchMaxRows=$cap rows ("),
              col("nb").cast("string"),
              lit(") — not broadcast-shaped; use Contamination.d15Against " +
                "(linear digest join) or raise the bound explicitly"))))
          .otherwise(lit(1)).as("bench_cap_ok"))
      bench.crossJoin(benchGuard)
        .filter(col("bench_cap_ok") === 1).drop("bench_cap_ok")
    }
    (corpus.select(col("vec_id").as("corpus_id"), col("embedding").as("c_emb"),
        explode(bandsU(col("embedding"))).as("bucket")),
      benchGuarded.select(col("vec_id").as("bench_id"),
        col("embedding").as("b_emb"),
        explode(bandsU(col("embedding"))).as("bucket")))
  }

  /** Corpus and benchmark FIXTURE frames with their band buckets
    * exploded — shared by the operator and the candidate-liveness spec.
    * Returns (corpusBuckets(corpus_id, c_emb, bucket),
    * benchBuckets(bench_id, b_emb, bucket)). */
  private[graft] def d21Sides(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val (corpus, bench) = d21FixtureFrames(s, d)
    d21SidesOf(corpus, bench, guardBench = false)
  }

  /** The UNEXPLODED fixture frames `(corpus(vec_id, embedding),
    * bench(vec_id, embedding))` — also fed through [[d21Against]] by
    * the API-parity spec, so the fixture query and the external
    * contract provably compute the same thing. */
  private[graft] def d21FixtureFrames(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val perturb = udf { v: Seq[Float] =>
      if (v.isEmpty) v else (v.head + 0.05f) +: v.tail
    }
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val bench = emb.filter($"vec_id" < BenchN)
    val corpus = emb.filter($"vec_id" >= BenchN).unionByName(
      bench.select(($"vec_id" + graft.sim.SimilarityOps.Shift).as("vec_id"),
        perturb($"embedding").as("embedding")))
    (corpus, bench)
  }

  /** Bucket-collision candidate pairs BEFORE the exact verify — the
    * spec asserts these strictly exceed the flagged set, so the 0.9
    * threshold is live (rejecting random collisions), not vacuous. */
  private[graft] def d21Candidates(s: SparkSession, d: String): DataFrame = {
    val (corpusB, benchB) = d21Sides(s, d)
    corpusB.join(broadcast(benchB), "bucket")
      .select(col("corpus_id"), col("bench_id")).distinct()
  }

  private def d21Verify(corpusB: DataFrame, benchB: DataFrame): DataFrame =
    corpusB.join(broadcast(benchB), "bucket")
      .withColumn("cos",
        graft.functions.GraftFunctions.cosine_sim(col("c_emb"), col("b_emb")))
      .filter(col("cos") >= 0.9)
      .select(col("corpus_id"), col("bench_id"),
        (col("cos") * lit(graft.sim.SimilarityOps.CosKeyScale)).cast("long")
          .as("qcos"))
      .distinct()
      .orderBy(col("corpus_id"), col("bench_id"))

  def d21_semantic_contamination(s: SparkSession, d: String): DataFrame = {
    val (corpusB, benchB) = d21Sides(s, d)
    d21Verify(corpusB, benchB)
  }

  /** d21 against a CALLER-SUPPLIED benchmark — the operator contract
    * the fixture query instantiates (r17 verdict item 4). Both frames
    * need `(vec_id, embedding)`; pass e.g.
    * `spark.read.parquet(benchPath)` as the benchmark. The benchmark
    * side is BROADCAST (that is what makes the whole path map-side),
    * so it carries the lazy [[benchMaxRows]] guard from
    * [[d21SidesOf]] — an over-bound benchmark raises in-plan with the
    * conf named instead of shipping a multi-GB table to every task. */
  def d21Against(s: SparkSession, corpusVecs: DataFrame,
      benchVecs: DataFrame): DataFrame = {
    val (corpusB, benchB) = d21SidesOf(
      corpusVecs.select(col("vec_id"), col("embedding")),
      benchVecs.select(col("vec_id"), col("embedding")))
    d21Verify(corpusB, benchB)
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
