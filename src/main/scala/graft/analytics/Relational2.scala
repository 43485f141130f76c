package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of the relational surface: grouping sets/cube, pivot,
  * full-outer/cross joins, subqueries, lateral explode, JSON extraction,
  * exact-arithmetic statistics, discrete percentiles.
  *
  * Float determinism: multi-pass statistics (corr/stddev) are computed
  * from DECIMAL-exact component sums and combined with an identical
  * double formula on both engines (IEEE ops + correctly-rounded sqrt ⇒
  * bit-equal results), never from the engines' own one-pass aggregates.
  */
object Relational2 {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def asDbl(c: Column): Column = c.cast("double")

  // q17: JSON extraction from the events props column.
  def q17_json_extract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .repartition(s.sparkContext.defaultParallelism) // per-row JSON parse dominates; spread it
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q17Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // q18: cube (all grouping-set combinations).
  def q18_cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        asDbl(sum(dec($"o_totalprice"))).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  val q18Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // q19: pivot event types into columns per user-id bucket.
  def q19_pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .withColumn("user_bucket", $"user_id" % 10)
      .groupBy($"user_bucket")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"user_bucket")
  }

  val q19Oracle: String =
    """SELECT user_id % 10 AS user_bucket,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // q20: full outer join — per-nation customer vs supplier presence.
  def q20_full_outer(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, d).groupBy($"c_nationkey".as("nk"))
      .agg(count(lit(1)).as("n_cust"))
      .filter($"nk" % 3 =!= 0) // make each side partially missing
    val supp = Tables.supplier(s, d).groupBy($"s_nationkey".as("nk"))
      .agg(count(lit(1)).as("n_supp"))
      .filter($"nk" % 4 =!= 0)
    cust.join(supp, Seq("nk"), "full_outer")
      .select($"nk", coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nk")
  }

  val q20Oracle: String =
    """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
      |           GROUP BY 1 HAVING (c_nationkey % 3) <> 0),
      |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
      |      GROUP BY 1 HAVING (s_nationkey % 4) <> 0)
      |SELECT COALESCE(c.nk, s.nk) AS nk, COALESCE(n_cust, 0) AS n_cust,
      |  COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nk""".stripMargin

  // q21: cross join (small × small).
  def q21_cross_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val statuses = Tables.orders(s, d).select($"o_orderstatus").distinct()
    Tables.region(s, d).select($"r_name").crossJoin(statuses)
      .orderBy($"r_name", $"o_orderstatus")
  }

  val q21Oracle: String =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
      |ORDER BY r_name, o_orderstatus""".stripMargin

  // q22: scalar subquery + IN subquery.
  def q22_subqueries(s: SparkSession, d: String): DataFrame = {
    val spark = s
    Tables.orders(s, d).createOrReplaceTempView("g_orders")
    Tables.customer(s, d).createOrReplaceTempView("g_customer")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM g_orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
        |  (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM g_orders)
        | AND o_custkey IN (SELECT c_custkey FROM g_customer
        |                   WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q22Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
      |  (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      | AND o_custkey IN (SELECT c_custkey FROM customer
      |                   WHERE c_mktsegment = 'BUILDING')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // q23: lateral explode — corpus-wide token frequencies, top 20.
  def q23_explode_tokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // explode fan-out off a single-row-group scan
      .select(explode(split(trim($"text"), "\\s+")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  val q23Oracle: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS token
      |      FROM documents)
      |GROUP BY 1 ORDER BY n DESC, token LIMIT 20""".stripMargin

  // q24: correlation/stddev from decimal-exact component sums. The
  // component sums exceed 2^53 in raw decimal scale (sum of price² at
  // scale 10⁴), where the decimal→double CONVERSION itself rounds —
  // and DuckDB's conversion (scaled-integer→double then descale) can
  // land one ulp away from Spark's (one correctly-rounded BigDecimal
  // conversion). Observed at sf0.001: corr differed in the final 2
  // bits. The final statistics are therefore rounded to 12 decimals on
  // BOTH engines — far above the ulp noise, far below any statistical
  // meaning — keeping the compare exact-by-construction at every sf.
  def q24_exact_stats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val x = dec($"l_quantity")
    val y = dec($"l_extendedprice")
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        asDbl(sum(x)).as("sx"), asDbl(sum(y)).as("sy"),
        asDbl(sum(x * y)).as("sxy"),
        asDbl(sum(x * x)).as("sxx"), asDbl(sum(y * y)).as("syy"))
      .select($"l_returnflag",
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy")), 12).as("corr_qty_price"),
        round(sqrt(($"n" * $"sxx" - $"sx" * $"sx")) / $"n", 12)
          .as("stddev_pop_scaled"))
      .orderBy($"l_returnflag")
  }

  val q24Oracle: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr_qty_price,
      |  ROUND(sqrt(n * sxx - sx * sx) / n, 12) AS stddev_pop_scaled
      |FROM a ORDER BY 1""".stripMargin

  // q25: discrete percentiles (actual data values — no interpolation).
  def q25_percentile_disc(s: SparkSession, d: String): DataFrame = {
    val spark = s
    Tables.orders(s, d).createOrReplaceTempView("g_orders_p")
    spark.sql(
      """SELECT o_orderstatus,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90
        |FROM g_orders_p GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val q25Oracle: String =
    """SELECT o_orderstatus,
      |  quantile_disc(o_totalprice, 0.5) AS p50,
      |  quantile_disc(o_totalprice, 0.9) AS p90
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // q26: skew-safe two-phase (salted) aggregation — phase 1 aggregates
  // (key, salt) spreading any hot key over N reducers, phase 2 merges the
  // partials. Result provably equals the plain group-by (the oracle).
  def q26_salted_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nSalts = 8
    Tables.events(s, d)
      .withColumn("key", $"user_id" % 100)
      .withColumn("salt", pmod($"event_id", lit(nSalts)))
      .groupBy($"key", $"salt")
      .agg(count(lit(1)).as("pn"), sum(dec($"value")).as("pv"))
      .groupBy($"key")
      .agg(sum($"pn").as("n_events"), asDbl(sum($"pv")).as("total_value"))
      .orderBy($"key")
  }

  val q26Oracle: String =
    """SELECT user_id % 100 AS key, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // q28: as-of join — each purchase matched to the user's latest
  // click at-or-before it. Spark has no ASOF operator; composed as a
  // union + running `last(ignoreNulls)` window (one shuffle on user_id,
  // no range-explosion). DuckDB verifies with its native ASOF JOIN.
  // Comparison on raw nanos (no truncation ties on either side).
  def q28_asof_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts_nanos", $"event_id", $"event_type",
        when($"event_type" === "click", $"event_id").as("click_id"),
        // clicks sort before purchases at equal ts (ASOF's >= semantics)
        when($"event_type" === "click", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_nanos", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click", last($"click_id", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        coalesce($"last_click", lit(-1L)).as("click_id"))
      .orderBy($"event_id")
  }

  val q28Oracle: String =
    """WITH c AS (SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tsn,
      |             event_id AS click_id
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS tsn, event_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, COALESCE(c.click_id, -1) AS click_id
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.tsn >= c.tsn
      |ORDER BY p.event_id""".stripMargin

  // q27 raw estimates: approximate distinct (HLL++) next to the exact
  // count with the observed relative error. The estimate VALUES are
  // engine-specific by design (DuckDB cannot rebuild Spark's HLL++
  // sketch), so this frame never crosses the oracle channel — the
  // golden spec pins the exact estimates at sf0.001 so sketch-parameter
  // or implementation drift shows up in the suite.
  def q27_raw_estimates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .withColumn("rel_err",
        abs($"approx_orders" - $"exact_orders").cast("double") /
          $"exact_orders".cast("double"))
      .orderBy($"l_returnflag")
  }

  // q27 (driver-checked since r15 — the registry's last no_oracle row,
  // retired per the r14 verdict): the HLL++ estimate is audited against
  // the exact distinct count through SQL-replayable arithmetic only.
  // The output carries the exact count, the absolute error ceiling the
  // engine promises (floor(exact * 0.06) — 3× the 2% target standard
  // error, so ~3σ of HLL++'s ~normal error; integer-exact on both
  // engines because COUNT(DISTINCT) is a small long and 0.06 is the
  // same IEEE double literal in Spark and DuckDB), and whether the
  // estimate landed inside that integer ceiling. The raw estimate never
  // crosses the channel: the oracle recomputes exact + bound and
  // asserts within_bound literally — a degraded sketch hash-fails at
  // the gate, while the estimate values stay pinned by the golden spec
  // over q27_raw_estimates.
  def q27_approx_distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .select($"l_returnflag", $"exact_orders",
        floor($"exact_orders".cast("double") * lit(0.06)).cast("long")
          .as("abs_bound"),
        (abs($"approx_orders" - $"exact_orders") <=
          floor($"exact_orders".cast("double") * lit(0.06)).cast("long"))
          .cast("long").as("within_bound"))
      .orderBy($"l_returnflag")
  }

  // q27b: the DRIVER-CHECKED audit of the sketch (r10 verdict item 5 —
  // q27 was the last fully pinned query): same frame, same HLL++
  // aggregation, but the output carries only what a second engine can
  // verify — the exact distinct count and whether the estimate landed
  // inside the 6% band (3× the requested 2% standard error; HLL++'s
  // error is ~normal, so 3σ holds with probability ~0.997 and a
  // deterministic sketch makes the observed outcome stable). The oracle
  // asserts the band literally (within_bound = 1): if the sketch ever
  // degrades past it, the row hash breaks at the gate. Only the raw
  // estimate value itself remains engine-private, pinned by the q27
  // golden spec.
  def q27b_distinct_audit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        countDistinct($"l_orderkey").as("exact_orders"))
      .select($"l_returnflag", $"exact_orders",
        (abs($"approx_orders" - $"exact_orders").cast("double") <=
          $"exact_orders".cast("double") * 0.06).cast("long").as("within_bound"))
      .orderBy($"l_returnflag")
  }

  // q36: approx-QUANTILE audit — q27's sketch-bound device applied to
  // percentile_approx (Greenwald–Khanna at accuracy 100, ε = 1/100):
  // per language, the engine computes the approximate median of
  // n_chars, counts rows strictly below and at-or-below the estimate
  // (the estimate's rank RANGE — GK returns an actual dataset element,
  // and with integer ties the honest contract is that the range
  // intersects the bound), and emits only SQL-replayable columns: the
  // group size, the integer rank window [max(1, floor(0.49·n)),
  // min(n, ceil(0.51·n))], and the intersection verdict. The estimate
  // never crosses the channel, so GK's merge-order nondeterminism
  // cannot leak into the output — any valid summary satisfies the
  // bound, which is exactly the claim being certified. The oracle
  // recomputes n + the same window arithmetic (double products of the
  // same literals — IEEE-identical) and asserts the verdict literally.
  def q36_approx_quantile_audit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"lang", $"n_chars")
    val apx = docs.groupBy($"lang")
      .agg(percentile_approx($"n_chars", lit(0.5), lit(100)).as("apx"),
        count(lit(1)).as("n_docs"))
    val nD = $"n_docs".cast("double")
    val rankLo = greatest(lit(1L), floor(nD * lit(0.49)).cast("long"))
    val rankHi = least($"n_docs", ceil(nD * lit(0.51)).cast("long"))
    docs.join(apx, "lang")
      .groupBy($"lang")
      .agg(first($"n_docs").as("n_docs"),
        sum(when($"n_chars" < $"apx", 1L).otherwise(0L)).as("cnt_lt"),
        sum(when($"n_chars" <= $"apx", 1L).otherwise(0L)).as("cnt_le"))
      .select($"lang", $"n_docs", rankLo.as("rank_lo"), rankHi.as("rank_hi"),
        ($"cnt_lt" + 1L <= rankHi && $"cnt_le" >= rankLo)
          .cast("long").as("within_bound"))
      .orderBy($"lang")
  }

  val q36Oracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  GREATEST(1, CAST(FLOOR(CAST(COUNT(*) AS DOUBLE) * 0.49) AS BIGINT))
      |    AS rank_lo,
      |  LEAST(COUNT(*), CAST(CEIL(CAST(COUNT(*) AS DOUBLE) * 0.51) AS BIGINT))
      |    AS rank_hi,
      |  CAST(1 AS BIGINT) AS within_bound
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // q29: explicit GROUPING SETS with grouping() markers.
  def q29_grouping_sets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("g_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus) AS g_status,
        |  grouping(o_orderpriority) AS g_prio,
        |  COUNT(*) AS n
        |FROM g_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin)
  }

  val q29Oracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  /** q30: deterministic content-hash train/valid/test split — the
    * reproducible-assignment primitive of every pretraining pipeline
    * (same doc always lands in the same split, no RNG, no state). The
    * bucket is the first 16 bits of md5(text) mod 10: 8 train / 1 valid
    * / 1 test. Pure map-side assignment; one aggregation shuffle. */
  def q30_deterministic_split(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = (conv(substring(md5($"text"), 1, 4), 16, 10).cast("long") % 10)
    Tables.documents(s, d)
      .select($"doc_id", $"n_chars", bucket.as("bucket"))
      .withColumn("split",
        when($"bucket" < 8, "train")
          .when($"bucket" === 8, "valid").otherwise("test"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"split")
  }

  val q30Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars,
      |    CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 10 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 8 THEN 'train'
      |            WHEN bucket = 8 THEN 'valid' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** q31: stratified sampling — per-language target rates applied with a
    * content-hash threshold, the standard "rebalance the language mix"
    * curation step. Deterministic (same doc always kept or dropped, like
    * q30's split), map-side assignment, one aggregation exchange. Rates:
    * en is downsampled to 40%, the rest kept whole — the usual
    * head-language rebalancing shape. */
  def q31_stratified_sample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = (conv(substring(md5($"text"), 1, 8), 16, 10).cast("long") % 100)
    val rate = when($"lang" === "en", 40).otherwise(100)
    Tables.documents(s, d)
      .select($"doc_id", $"lang", $"n_chars", bucket.as("bucket"), rate.as("rate"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_total"),
        sum(when($"bucket" < $"rate", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"bucket" < $"rate", $"n_chars").otherwise(0L))
          .as("sampled_chars"))
      .orderBy($"lang")
  }

  val q31Oracle: String =
    """WITH b AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket,
      |    CASE WHEN lang = 'en' THEN 40 ELSE 100 END AS rate
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sampled,
      |  CAST(SUM(CASE WHEN bucket < rate THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sampled_chars
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** q32: range join — same-user event pairs within a 10-minute window.
    * Spark executes a raw inequality join as a broadcast-nested-loop
    * (O(n·m) and a broadcast of a whole side — both fatal at 100 TB), so
    * the range predicate is re-expressed as an equi-join: every event
    * gets its W-sized time bucket (`us div W`, exact integer division);
    * a pair with 0 < gap ≤ W always lands in the same or adjacent
    * bucket, so the left side probes (bucket, bucket+1) and the join key
    * is (user_id, probe_bucket) — a plain shuffle equi-join, 2× the left
    * side, partitionable at any scale. Each qualifying pair matches
    * exactly one probe value (the right event's bucket is a single
    * value), so no post-join dedup is needed. Gaps are exact
    * microsecond integers on both engines (unix_micros / epoch_us). */
  /** Bucketed-range-join core: ordered same-key pairs with
    * 0 < us_b − us_a ≤ wMicros, from `(user_id, event_type, us)` rows.
    * Exposed for the boundary spec (gap = 0 / W / W+1, bucket-crossing
    * pairs). */
  private[graft] def rangePairs(ev: DataFrame, wMicros: Long): DataFrame = {
    import ev.sparkSession.implicits._
    val bucket = expr(s"us div $wMicros")
    val left = ev.withColumn("probe", explode(array(bucket, bucket + 1L)))
    val right = ev.select($"user_id", $"event_type".as("type_b"),
      $"us".as("us_b"), bucket.as("bkt"))
    left.join(right,
        left("user_id") === right("user_id") && $"probe" === $"bkt")
      .filter($"us_b" > $"us" && $"us_b" <= $"us" + wMicros)
      .select($"event_type".as("type_a"), $"type_b", ($"us_b" - $"us").as("gap"))
  }

  def q32_range_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = 600L * 1000000L // 10 minutes in microseconds
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    rangePairs(ev, w)
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_pairs"), sum($"gap").as("sum_gap_us"),
        min($"gap").as("min_gap_us"), max($"gap").as("max_gap_us"))
      .orderBy($"type_a", $"type_b")
  }

  val q32Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    b.us - a.us AS gap
      |  FROM e a JOIN e b ON a.user_id = b.user_id
      |    AND b.us > a.us AND b.us <= a.us + 600000000)
      |SELECT type_a, type_b, COUNT(*) AS n_pairs,
      |  CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
      |  CAST(MIN(gap) AS BIGINT) AS min_gap_us,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap_us
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q34: exact per-stratum length QUANTILES — the corpus-profiling
    * query every curation run starts with (length p50/p90/p99 per
    * language drives truncation and packing choices). Spark's exact
    * `percentile` and DuckDB's `quantile_cont` implement the same
    * linear-interpolation definition (rank h = (n−1)·p, value =
    * v⌊h⌋ + (h−⌊h⌋)·(v⌈h⌉−v⌊h⌋)), so the doubles agree bit-for-bit on
    * integer inputs — asserted by the oracle compare, not assumed. Exact
    * percentile sorts per group; at 100 TB swap in `percentile_approx`
    * (t-digest, mergeable map-side sketch) when the ±ε of the sketch is
    * acceptable — kept exact here because the oracle gate compares
    * values exactly. */
  def q34_length_quantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("p50"),
        expr("percentile(n_chars, 0.9)").as("p90"),
        expr("percentile(n_chars, 0.99)").as("p99"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .orderBy($"lang")
  }

  val q34Oracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  quantile_cont(n_chars, 0.5) AS p50,
      |  quantile_cont(n_chars, 0.9) AS p90,
      |  quantile_cont(n_chars, 0.99) AS p99,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** q33: temperature-weighted source mixing — the data-mix step of a
    * multi-source pretraining corpus: target proportions ∝ N_s^τ (τ =
    * 0.5) flatten the source distribution, achieved by downsampling
    * source s at rate 100·√(N_min/N_s) percent (the smallest source
    * keeps everything — with a fixed corpus one can only downsample).
    * The testdata's `source` column is uniform, so a SKEWED source group
    * is first derived from doc_id (50/30/10/10% — the planting trick the
    * dedup family uses), keeping the whole query a pure function of the
    * base table. Selection reuses the q30/q31 md5-bucket device, and the
    * rate math stays bit-exact cross-engine: one correctly-rounded IEEE
    * division, one correctly-rounded sqrt, scale by 100, floor — no
    * accumulation of doubles anywhere.
    *
    * Scale shape: the rates table is aggregate-output-sized (one row per
    * source) — broadcasting IT is legal and desirable (unlike corpus
    * data); everything else is two keyed aggregations. */
  def q33_temperature_mix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grp = concat(lit("g"),
      when($"doc_id" % 10 < 5, 0).when($"doc_id" % 10 < 8, 1)
        .when($"doc_id" % 10 < 9, 2).otherwise(3))
    val docs = Tables.documents(s, d)
      .select($"doc_id", $"n_chars", $"text", grp.as("src_grp"))
    val counts = docs.groupBy($"src_grp").agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(counts.agg(min($"n_total").as("n_min")))
      .select($"src_grp", $"n_total",
        floor(lit(100.0) * sqrt($"n_min".cast("double") /
          $"n_total".cast("double"))).as("rate_pct"))
    val bucket = (conv(substring(md5($"text"), 1, 8), 16, 10).cast("long") % 100)
    docs.select($"doc_id", $"n_chars", $"src_grp", bucket.as("bucket"))
      .join(broadcast(rates), "src_grp")
      .groupBy($"src_grp")
      .agg(first($"n_total").as("n_total"),
        first($"rate_pct").as("rate_pct"),
        sum(when($"bucket" < $"rate_pct", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"bucket" < $"rate_pct", $"n_chars").otherwise(0L))
          .as("sampled_chars"))
      .orderBy($"src_grp")
  }

  val q33Oracle: String =
    """WITH g AS (
      |  SELECT doc_id, n_chars, text,
      |    'g' || (CASE WHEN doc_id % 10 < 5 THEN 0
      |                 WHEN doc_id % 10 < 8 THEN 1
      |                 WHEN doc_id % 10 < 9 THEN 2 ELSE 3 END) AS src_grp
      |  FROM documents),
      |counts AS (SELECT src_grp, COUNT(*) AS n_total FROM g GROUP BY 1),
      |rates AS (
      |  SELECT src_grp, n_total,
      |    FLOOR(100.0 * sqrt(CAST((SELECT MIN(n_total) FROM counts) AS DOUBLE)
      |      / CAST(n_total AS DOUBLE))) AS rate_pct
      |  FROM counts),
      |b AS (
      |  SELECT g.doc_id, g.n_chars, g.src_grp, r.n_total, r.rate_pct,
      |    CAST(concat('0x', substr(md5(g.text), 1, 8)) AS BIGINT) % 100 AS bucket
      |  FROM g JOIN rates r USING (src_grp))
      |SELECT src_grp, CAST(MIN(n_total) AS BIGINT) AS n_total,
      |  CAST(MIN(rate_pct) AS BIGINT) AS rate_pct,
      |  CAST(SUM(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sampled,
      |  CAST(SUM(CASE WHEN bucket < rate_pct THEN n_chars ELSE 0 END) AS BIGINT)
      |    AS sampled_chars
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_temperature_mix" -> (q33_temperature_mix _),
    "q34_length_quantiles" -> (q34_length_quantiles _),
    "q32_range_join" -> (q32_range_join _),
    "q30_deterministic_split" -> (q30_deterministic_split _),
    "q31_stratified_sample" -> (q31_stratified_sample _),
    "q26_salted_agg" -> (q26_salted_agg _),
    "q27_approx_distinct" -> (q27_approx_distinct _),
    "q27b_distinct_audit" -> (q27b_distinct_audit _),
    "q36_approx_quantile_audit" -> (q36_approx_quantile_audit _),
    "q28_asof_join" -> (q28_asof_join _),
    "q29_grouping_sets" -> (q29_grouping_sets _),
    "q17_json_extract" -> (q17_json_extract _),
    "q18_cube" -> (q18_cube _),
    "q19_pivot" -> (q19_pivot _),
    "q20_full_outer" -> (q20_full_outer _),
    "q21_cross_join" -> (q21_cross_join _),
    "q22_subqueries" -> (q22_subqueries _),
    "q23_explode_tokens" -> (q23_explode_tokens _),
    "q24_exact_stats" -> (q24_exact_stats _),
    "q25_percentile_disc" -> (q25_percentile_disc _),
  )

  // the audit's oracle asserts the error band LITERALLY: DuckDB cannot
  // rebuild Spark's HLL++ sketch, but it can demand the exact counts
  // match and the bound column read 1 — a degraded sketch hash-fails
  val q27bOracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  CAST(1 AS BIGINT) AS within_bound
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // q27's oracle replays the bound arithmetic exactly (FLOOR of a
  // double product of a small long and the same literal — IEEE-identical
  // across engines) and asserts the verdict literally; the sketch value
  // itself never crosses the channel.
  val q27Oracle: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
      |  CAST(FLOOR(CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) * 0.06)
      |    AS BIGINT) AS abs_bound,
      |  CAST(1 AS BIGINT) AS within_bound
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "q27_approx_distinct" -> q27Oracle,
    "q27b_distinct_audit" -> q27bOracle,
    "q36_approx_quantile_audit" -> q36Oracle,
    "q33_temperature_mix" -> q33Oracle,
    "q34_length_quantiles" -> q34Oracle,
    "q32_range_join" -> q32Oracle,
    "q30_deterministic_split" -> q30Oracle,
    "q31_stratified_sample" -> q31Oracle,
    "q26_salted_agg" -> q26Oracle,
    "q28_asof_join" -> q28Oracle,
    "q29_grouping_sets" -> q29Oracle,
    "q17_json_extract" -> q17Oracle,
    "q18_cube" -> q18Oracle,
    "q19_pivot" -> q19Oracle,
    "q20_full_outer" -> q20Oracle,
    "q21_cross_join" -> q21Oracle,
    "q22_subqueries" -> q22Oracle,
    "q23_explode_tokens" -> q23Oracle,
    "q24_exact_stats" -> q24Oracle,
    "q25_percentile_disc" -> q25Oracle,
  )
}
