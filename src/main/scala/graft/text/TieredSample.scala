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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t16_tiered_sample" -> (t16_tiered_sample _))

  val oracle: Map[String, String] = Map(
    "t16_tiered_sample" -> t16Oracle)
}
