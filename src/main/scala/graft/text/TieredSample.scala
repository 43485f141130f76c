package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** CCNet-style TIERED QUALITY SAMPLING — the soft-retention stage
  * between hard gating (t07 drops) and uniform sampling (q31): docs are
  * bucketed into quality tiers and each tier is retained at its own
  * rate, so low-quality text is thinned rather than erased (CCNet's
  * head/middle/tail device, there by LM perplexity tercile, here by the
  * gate's integer signals — length and stopword ratio, one doubling of
  * the keep rate per satisfied signal: p = 1/4, 1/2, 1).
  *
  * The sampling decision is a DETERMINISTIC hash threshold (t15's
  * salted-md5 device): keep iff the doc's salted 32-bit hash fraction
  * falls under the tier rate — exact integer comparison
  * (h32 < p·2^30·4), reproducible across runs/engines, and stable
  * under corpus re-partitioning because it keys on doc_id, not
  * position. Fully SQL-expressible → oracle-checked (per-tier counts +
  * kept-id sum certify the exact membership).
  *
  * Scale shape: entirely map-side per doc (tokenize, two integer
  * signals, one md5) + ONE tier rollup shuffle of 3 groups — nothing
  * corpus-sized moves. */
object TieredSample {

  def t16_tiered_sample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = TextOps.whitespaceTokens($"text")
    val nTok = size(toks).cast("long")
    val nStop = TextOps.stopCount(toks).cast("long")
    val tier = (when(nTok >= 30, 1L).otherwise(0L) +
      when(nStop * 1000 >= nTok * 15, 1L).otherwise(0L)).as("tier")
    val h32 = conv(substring(md5(concat(lit("t16:"), $"doc_id".cast("string"))),
      1, 8), 16, 10).cast("long")
    Tables.documents(s, d)
      .select($"doc_id", tier, h32.as("h32"))
      .withColumn("p_x4",
        when($"tier" === 0, 1L).when($"tier" === 1, 2L).otherwise(4L))
      .withColumn("keep", $"h32" < $"p_x4" * 1073741824L)
      .groupBy($"tier", $"p_x4")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_kept"),
        sum(when($"keep", $"doc_id").otherwise(0L)).as("kept_id_sum"))
      .orderBy($"tier")
  }

  val t16Oracle: String = {
    val toks = TextOps.oracleToks("text")
    raw"""WITH base AS (
      |  SELECT doc_id,
      |    len($toks) AS n_tok,
      |    len(list_filter($toks,
      |      x -> x IN ('the','a','of','to','in','and','is','on','for','with'))) AS n_stop
      |  FROM documents),
      |tiered AS (
      |  SELECT doc_id,
      |    CAST((CASE WHEN n_tok >= 30 THEN 1 ELSE 0 END)
      |      + (CASE WHEN n_stop * 1000 >= n_tok * 15 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS tier,
      |    CAST(concat('0x', substr(md5(concat('t16:', CAST(doc_id AS VARCHAR))), 1, 8))
      |      AS UBIGINT) AS h32
      |  FROM base),
      |dec AS (
      |  SELECT doc_id, tier,
      |    CAST(CASE tier WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS BIGINT) AS p_x4,
      |    h32 FROM tiered)
      |SELECT tier, p_x4, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN h32 < p_x4 * 1073741824 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN h32 < p_x4 * 1073741824 THEN doc_id ELSE 0 END) AS BIGINT)
      |    AS kept_id_sum
      |FROM dec GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** t18: BUDGET-CONSTRAINED QUALITY SELECTION — the "best data under a
    * token budget" stage (quality-filtering literature's selection dual
    * of p05's rate-based mixture): admit documents in quality order
    * (integer stop-density score, DESC; doc_id tiebreak) until the
    * cumulative token mass reaches the budget (half the corpus tokens
    * here; a parameter in production). A doc is admitted iff the mass
    * of everything ordered before it is still under the budget, so the
    * last admitted doc may straddle the line — the greedy-fill contract,
    * exactly what the oracle's window replays.
    *
    * Scale shape (100 TB posture) — the whole point of the op: the
    * naive formulation is a GLOBAL sort + running sum over the corpus
    * (a total order at 100 TB — the one thing to never do). This runs
    * the classic two-phase threshold refinement instead:
    *  1. one map-side-combined aggregation of token mass per score
    *     bucket (≤1001 rows to the driver — the score's integer
    *     RESOLUTION caps this),
    *  2. the driver walks the ≤1001 buckets: buckets wholly under the
    *     budget admit ENTIRELY with a map-side `isin` filter (no order
    *     needed — membership is order-free for full buckets), buckets
    *     past it admit nothing,
    *  3. only the single BOUNDARY bucket — expected corpus/resolution
    *     ≈ 0.1% of rows at resolution 1000 — pays a running-sum window,
    *     and the resolution knob shrinks that share as the corpus
    *     grows (the production dial: resolution ∝ corpus size keeps
    *     the boundary bounded).
    * Decisions are integer-exact (score = (n_stop·1000) div n_tok,
    * long masses), so the oracle replays the admission bit-for-bit. */
  def t18_budget_select(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = TextOps.whitespaceTokens($"text")
    val nTok = size(toks).cast("long")
    val nStop = TextOps.stopCount(toks).cast("long")
    val sig0 = Tables.documents(s, d)
      .select($"doc_id", nTok.as("n_tok"), nStop.as("n_stop"))
      .withColumn("score", when($"n_tok" === 0L, 0L)
        .otherwise(least(lit(1000L), expr("(n_stop * 1000) div n_tok"))))
      .select($"doc_id", $"n_tok", $"score")
    graft.dedup.DedupOps.withCache(sig0) { sig =>
      val buckets = sig.groupBy($"score").agg(sum($"n_tok").as("mass"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
      val budget = buckets.map(_._2).sum / 2
      // descending walk: cum is the mass of strictly-higher buckets
      var cum = 0L
      var boundary = -1L
      var massAbove = 0L
      val full = scala.collection.mutable.ArrayBuffer[Long]()
      buckets.foreach { case (sc, m) =>
        if (cum + m < budget) { full += sc }
        else if (cum < budget && boundary < 0) { boundary = sc; massAbove = cum }
        cum += m
      }
      val fullDocs =
        if (full.isEmpty) sig.limit(0) else sig.filter($"score".isin(full.toSeq: _*))
      val bDocs = if (boundary < 0) sig.limit(0) else {
        // running sum over the boundary bucket ONLY (see the scale note)
        val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        sig.filter($"score" === boundary)
          .withColumn("prior", coalesce(sum($"n_tok").over(w), lit(0L)))
          .filter(lit(massAbove) + $"prior" < budget)
          .select($"doc_id", $"n_tok", $"score")
      }
      val admitted = fullDocs.unionByName(bDocs)
      sig.agg(count(lit(1)).as("n_docs"))
        .crossJoin(admitted.agg(
          count(lit(1)).as("n_admitted"),
          coalesce(sum($"n_tok"), lit(0L)).as("admitted_tokens"),
          coalesce(min($"score"), lit(-1L)).as("threshold_score"),
          coalesce(sum($"doc_id"), lit(0L)).as("admitted_id_sum")))
        .select($"n_docs", lit(budget).as("budget"), $"n_admitted",
          $"admitted_tokens", $"threshold_score", $"admitted_id_sum")
    }
  }

  /** The admission replayed the naive way — the window the engine
    * avoids: rank everything (score DESC, doc_id), admit while the
    * PRIOR mass is under the budget. Equal output proves the two-phase
    * refinement is the same decision function. */
  val t18Oracle: String = {
    val toks = TextOps.oracleToks("text")
    raw"""WITH base AS (
      |  SELECT doc_id,
      |    CAST(len($toks) AS BIGINT) AS n_tok,
      |    CAST(len(list_filter($toks,
      |      x -> x IN ('the','a','of','to','in','and','is','on','for','with'))) AS BIGINT) AS n_stop
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, n_tok,
      |    CASE WHEN n_tok = 0 THEN 0
      |         ELSE LEAST(1000, (n_stop * 1000) // n_tok) END AS score
      |  FROM base),
      |g AS (SELECT CAST(SUM(n_tok) AS BIGINT) // 2 AS budget FROM sc),
      |r AS (
      |  SELECT *, CAST(COALESCE(SUM(n_tok) OVER (ORDER BY score DESC, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prior
      |  FROM sc),
      |adm AS (SELECT * FROM r WHERE prior < (SELECT budget FROM g))
      |SELECT
      |  (SELECT COUNT(*) FROM sc) AS n_docs,
      |  (SELECT CAST(budget AS BIGINT) FROM g) AS budget,
      |  CAST(COUNT(*) AS BIGINT) AS n_admitted,
      |  CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS admitted_tokens,
      |  CAST(COALESCE(MIN(score), -1) AS BIGINT) AS threshold_score,
      |  CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS admitted_id_sum
      |FROM adm""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t16_tiered_sample" -> (t16_tiered_sample _),
    "t18_budget_select" -> (t18_budget_select _))

  val oracle: Map[String, String] = Map(
    "t16_tiered_sample" -> t16Oracle,
    "t18_budget_select" -> t18Oracle)
}
