package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** N-GRAM LANGUAGE-MODEL perplexity scoring — the CCNet quality stage
  * (Wenzek et al. 2020) t16's tiering presumes: score each document by
  * how surprising its token stream is to a language model trained on
  * the corpus itself; low-perplexity ≈ fluent prose, high-perplexity ≈
  * boilerplate/gibberish. CCNet uses KenLM 5-grams; the engine-native
  * formulation is a word-BIGRAM model with Stupid Backoff (Brants et
  * al. 2007 — the count-ratio scheme built FOR map-reduce-scale
  * corpora: no discounting pass, every score a ratio of counts):
  * S(w|prev) = c(prev,w)/c(prev) when the bigram was seen, else
  * 0.4·c(w)/N, with an add-one floor for OOV words.
  *
  * Train/eval hygiene follows t13: the model trains ONLY on q30's
  * content-hash buckets < 8 and scores ONLY the held-out buckets ≥ 8 —
  * scoring the training split would reward memorization.
  *
  * Determinism/oracle: per-transition scores are quantized to
  * qlp = floor(4096·ln S) BEFORE any aggregation, so every downstream
  * number is integer arithmetic (sums) or a single IEEE division on
  * identical operands — merge/shuffle order cannot move a result.
  * S itself is a ratio of counts computed by the same double ops in
  * both engines; ln is the one libm call, and a JVM-vs-DuckDB ulp
  * disagreement only matters if 4096·ln S sits within ~1e-12 of an
  * integer (probability ~1e-7 across all distinct bigrams at gate
  * scale — the hash compare would catch the day it happens).
  *
  * Scale shape (100 TB posture): unigram/bigram count tables are
  * VOCABULARY-sized and travel through shuffle joins, never broadcast
  * (the t08 TF-IDF discipline); the corpus appears only in linear
  * explodes (one row per token / transition). The only broadcast is the
  * 1-row total-token aggregate (the q33 aggregate-sized rule). Cost:
  * two count shuffles (uni, bi) + three key joins on the eval
  * transitions + one per-doc rollup — all linear in tokens. */
object LangModel {

  private val Q = 4096.0   // fixed-point log scale (2^12)
  private val Alpha = 0.4  // Stupid Backoff discount (Brants et al.)

  /** t17: Stupid-Backoff bigram perplexity over the held-out split.
    * One row: split sizes, transition count, total quantized NLL,
    * backoff/OOV transition counts, and docs over 6 nats/transition
    * (the "gibberish" band). */
  def t17_lm_perplexity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = (conv(substring(md5($"text"), 1, 4), 16, 10).cast("long") % 10)
    // 1-based transitions (prev = tk[i], w = tk[i+1]); docs need >= 2 tokens
    val pairs = expr("transform(sequence(1, size(tk) - 1), " +
      "i -> struct(element_at(tk, i) as prev, element_at(tk, i + 1) as w))")
    graft.dedup.DedupOps.withCache(Tables.documents(s, d)
        .select($"doc_id", bucket.as("bucket"),
          TextOps.whitespaceTokens($"text").as("tk"))) { toks =>
      val train = toks.filter($"bucket" < 8)
      val uni = train.select(explode($"tk").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("cw"))
      val nTot = train.select(explode($"tk").as("w"))
        .agg(count(lit(1)).as("n"))
      val bi = train.filter(size($"tk") >= 2)
        .select(explode(pairs).as("p"))
        .groupBy($"p.prev".as("prev"), $"p.w".as("w"))
        .agg(count(lit(1)).as("cpw"))
      val evalTr = toks.filter($"bucket" >= 8 && size($"tk") >= 2)
        .select($"doc_id", explode(pairs).as("p"))
        .select($"doc_id", $"p.prev".as("prev"), $"p.w".as("w"))
      val scored = evalTr
        .join(bi, Seq("prev", "w"), "left")
        .join(uni.select($"w".as("prev"), $"cw".as("cprev")), Seq("prev"), "left")
        .join(uni, Seq("w"), "left")
        .crossJoin(broadcast(nTot))
        .select($"doc_id",
          when($"cpw".isNotNull,
            floor(lit(Q) * log($"cpw".cast("double") / $"cprev")))
            .otherwise(
              floor(lit(Q) * log(lit(Alpha) * coalesce($"cw", lit(1L))
                .cast("double") / $"n")))
            .as("qlp"),
          when($"cpw".isNull, 1L).otherwise(0L).as("backoff"),
          when($"cw".isNull, 1L).otherwise(0L).as("oov"))
      val perDoc = scored.groupBy($"doc_id")
        .agg((-sum($"qlp")).as("qnll"), count(lit(1)).as("n_tr"),
          sum($"backoff").as("n_backoff"), sum($"oov").as("n_oov"))
      perDoc
        .agg(count(lit(1)).as("n_eval_docs"),
          sum($"n_tr").as("n_transitions"),
          sum($"qnll").as("total_qnll"),
          sum($"n_backoff").as("n_backoff"),
          sum($"n_oov").as("n_oov"),
          sum(when($"qnll".cast("double") / ($"n_tr" * lit(Q)) >= 6.0, 1L)
            .otherwise(0L)).as("n_high_ppl_docs"))
        .crossJoin(train.agg(count(lit(1)).as("n_train_docs")))
        .select($"n_train_docs", $"n_eval_docs", $"n_transitions",
          $"total_qnll", $"n_backoff", $"n_oov", $"n_high_ppl_docs")
    }
  }

  val t17Oracle: String =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 10 AS bucket,
      |    ${TextOps.oracleToks("text")} AS tk
      |  FROM documents),
      |train_w AS (
      |  SELECT w FROM toks, UNNEST(tk) AS t(w) WHERE bucket < 8),
      |uni AS (SELECT w, COUNT(*) AS cw FROM train_w GROUP BY 1),
      |n_tot AS (SELECT COUNT(*) AS n FROM train_w),
      |bi AS (
      |  SELECT tk[i] AS prev, tk[i+1] AS w, COUNT(*) AS cpw
      |  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
      |  WHERE bucket < 8 AND len(tk) >= 2 GROUP BY 1, 2),
      |eval_tr AS (
      |  SELECT doc_id, tk[i] AS prev, tk[i+1] AS w
      |  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
      |  WHERE bucket >= 8 AND len(tk) >= 2),
      |scored AS (
      |  SELECT e.doc_id,
      |    CASE WHEN bi.cpw IS NOT NULL THEN
      |      CAST(floor(4096.0 * ln(CAST(bi.cpw AS DOUBLE) / up.cw)) AS BIGINT)
      |    ELSE
      |      CAST(floor(4096.0 * ln(0.4 * CAST(COALESCE(uw.cw, 1) AS DOUBLE)
      |                             / (SELECT n FROM n_tot))) AS BIGINT)
      |    END AS qlp,
      |    CASE WHEN bi.cpw IS NULL THEN 1 ELSE 0 END AS backoff,
      |    CASE WHEN uw.cw IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM eval_tr e
      |  LEFT JOIN bi ON e.prev = bi.prev AND e.w = bi.w
      |  LEFT JOIN uni up ON e.prev = up.w
      |  LEFT JOIN uni uw ON e.w = uw.w),
      |per_doc AS (
      |  SELECT doc_id, -SUM(qlp) AS qnll, COUNT(*) AS n_tr,
      |    SUM(backoff) AS n_backoff, SUM(oov) AS n_oov
      |  FROM scored GROUP BY 1)
      |SELECT (SELECT COUNT(*) FROM toks WHERE bucket < 8) AS n_train_docs,
      |  COUNT(*) AS n_eval_docs,
      |  CAST(SUM(n_tr) AS BIGINT) AS n_transitions,
      |  CAST(SUM(qnll) AS BIGINT) AS total_qnll,
      |  CAST(SUM(n_backoff) AS BIGINT) AS n_backoff,
      |  CAST(SUM(n_oov) AS BIGINT) AS n_oov,
      |  COUNT(CASE WHEN CAST(qnll AS DOUBLE) / (n_tr * 4096.0) >= 6.0
      |        THEN 1 END) AS n_high_ppl_docs
      |FROM per_doc""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t17_lm_perplexity" -> (t17_lm_perplexity _))

  val oracle: Map[String, String] = Map(
    "t17_lm_perplexity" -> t17Oracle)
}
