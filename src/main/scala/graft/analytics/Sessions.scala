package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch SESSIONIZATION — the gaps-and-islands assignment that turns a
  * raw event log into session-grained rows (funnels, attribution,
  * engagement metrics all start here). The streaming twin is st02's
  * `session_window`; this operator emits the session ROWS (start/end/
  * size/value rollup per session), where st02 reports only a per-user
  * summary — at 100 TB the session table is the thing you persist and
  * every downstream analysis re-reads.
  *
  * Semantics match st02: a session breaks when the gap from the
  * previous event is ≥ 30 minutes. Gap arithmetic is integer
  * microseconds (`unix_micros` / DuckDB `epoch_us` — the q32 device),
  * and the within-user order is (ts, event_id) — total and
  * deterministic, so the assignment is reproducible and
  * oracle-checkable to the hash.
  *
  * Scale shape (100 TB posture): ONE hash shuffle on user_id; the lag
  * window, the running-sum session numbering, and the per-session
  * aggregation all run inside that partitioning (HashPartitioning on
  * user_id satisfies the (user_id, session_id) clustered distribution,
  * so Catalyst inserts no second Exchange — pinned in PlanSpec). No
  * global sort anywhere: per-user ordering sorts within partitions.
  * Skew: a hot user's history lands in one task — bounded by per-user
  * event cardinality, the same contract as st02's keyed state; a user
  * hot enough to break a task gets salted session-id PREFIXES (split
  * the user's timeline at day boundaries) upstream. */
object Sessions {

  private val GapUs = 1800000000L // 30 minutes

  /** q35: per-session rows — user, 1-based session ordinal, start/end
    * (epoch micros), event count, distinct event types, value sum
    * (decimal-aggregated then cast back: the `Relational.dec` float
    * device, so the shuffle-order-free sum matches the oracle
    * bit-for-bit). */
  def q35_sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Order by `us` (a monotone function of `ts`) so the window survives
    // the projection below that drops the raw timestamp column.
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("new_session",
        when(lag($"us", 1).over(byUser).isNull ||
          $"us" - lag($"us", 1).over(byUser) >= GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(min($"us").as("session_start_us"), max($"us").as("session_end_us"),
        count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        sum($"value".cast("decimal(25,6)")).cast("double").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  val q35Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, event_type, value, us,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  MIN(us) AS session_start_us, MAX(us) AS session_end_us,
      |  COUNT(*) AS n_events, COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q37: ORDERED CONVERSION FUNNEL — the product-analytics primitive
    * q35's sessionizer feeds: how many users complete view → click →
    * purchase IN ORDER, each stage strictly after the previous stage's
    * FIRST occurrence AND within a 24-hour conversion window of it (the
    * classic first-touch attribution funnel; without the window this
    * corpus converts 150/150/150 and the operator discriminates
    * nothing — with it: 150 → 60 → 25 at sf0.01). All arithmetic is
    * integer nanoseconds, tie timestamps never advance the funnel, on
    * either engine. Three stage frames, each one filter + a per-user
    * min aggregate gated on the previous stage's watermark, each
    * strictly smaller than the last (that shrinkage IS the funnel),
    * joined on user_id — co-partitioned after the first shuffle, AQE
    * sizes the rest; no windows, no per-user event collection, so a
    * user with millions of events costs one min per stage. Output is
    * one audit row of stage counts. */
  def q37_funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val windowNs = 24L * 3600L * 1000000000L
    val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts_nanos")
    val viewed = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_nanos").as("t_view"))
    val clicked = ev.filter($"event_type" === "click").join(viewed, "user_id")
      .filter($"ts_nanos" > $"t_view" && $"ts_nanos" <= $"t_view" + windowNs)
      .groupBy($"user_id").agg(min($"ts_nanos").as("t_click"))
    val purchased = ev.filter($"event_type" === "purchase").join(clicked, "user_id")
      .filter($"ts_nanos" > $"t_click" && $"ts_nanos" <= $"t_click" + windowNs)
      .groupBy($"user_id").agg(min($"ts_nanos").as("t_purchase"))
    ev.agg(countDistinct($"user_id").as("n_users"))
      .crossJoin(viewed.agg(count(lit(1)).as("n_viewed")))
      .crossJoin(clicked.agg(count(lit(1)).as("n_clicked_after_view")))
      .crossJoin(purchased.agg(count(lit(1)).as("n_purchased_after_click")))
  }

  val q37Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, CAST(epoch_ns(ts) AS BIGINT) AS tsn
      |  FROM events),
      |v AS (SELECT user_id, MIN(tsn) AS t_view FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(tsn) AS t_click FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND tsn > t_view
      |        AND tsn <= t_view + 86400000000000 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(tsn) AS t_purchase FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND tsn > t_click
      |        AND tsn <= t_click + 86400000000000 GROUP BY 1)
      |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users,
      |  (SELECT COUNT(*) FROM v) AS n_viewed,
      |  (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
      |  (SELECT COUNT(*) FROM p) AS n_purchased_after_click""".stripMargin

  /** q38: COHORT RETENTION MATRIX — the other product-analytics
    * primitive next to q35's sessions and q37's funnel: group users by
    * their first-activity day (the cohort), then for each day offset
    * 0..7 count how many of that cohort were active again (the classic
    * day-N retention table every growth dashboard plots). The 7-day cap
    * BINDS on this corpus (16 capped cells vs 59 uncapped — measured in
    * DuckDB before wiring, per SURVEY §5's fixture-discrimination
    * rule). Day arithmetic is integer micros `div` 86400000000 —
    * truncating division on positive epochs, identical to DuckDB `//`.
    *
    * Scale shape (100 TB posture): ONE hash shuffle of events on
    * user_id feeds both the per-user min (cohort assignment) and the
    * rejoin; per-user offset sets come from a `collect_set` bounded by
    * the 8-offset cap (never raw events — a mega-user contributes ≤8
    * elements), and the final rollup shuffles ≤ users×8 exploded rows
    * with map-side partial counts. Cohort sizes (offset 0) are a
    * cohort-day-sized frame — broadcast back onto the matrix. No
    * windows, no distinct over raw events, no global sort except the
    * presentation orderBy. */
  def q38_retention_cohorts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
    val cohorts = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val offsets = ev.join(cohorts, "user_id")
      .select($"user_id", $"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
      .filter($"day_offset" <= 7)
      .groupBy($"user_id", $"cohort_day")
      .agg(collect_set($"day_offset").as("offs"))
      .select($"cohort_day", explode($"offs").as("day_offset"))
    val counts = offsets.groupBy($"cohort_day", $"day_offset")
      .agg(count(lit(1)).as("n_active"))
    // offset 0 is every cohort member's first day, so its count IS the
    // cohort size. Derived as a WINDOW over the (days×8)-row counts
    // frame, NOT a self-join: a second reference to `counts` re-executes
    // the whole corpus pipeline (Catalyst copies referenced subplans —
    // the first shape ran the events chain TWICE, seen in its plan), so
    // the cohort-size column must come from the single materialized
    // pass. The window's partition is cohort_day on an aggregate-sized
    // frame — one tiny exchange instead of a duplicated corpus scan.
    val byCohort = Window.partitionBy($"cohort_day")
    counts
      .withColumn("n_cohort",
        max(when($"day_offset" === 0, $"n_active")).over(byCohort))
      .select($"cohort_day", $"day_offset", $"n_active", $"n_cohort",
        ($"n_active".cast("double") / $"n_cohort".cast("double"))
          .as("retention"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val q38Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1),
      |offs AS (
      |  SELECT DISTINCT e.user_id, c.cohort_day,
      |    e.day - c.cohort_day AS day_offset
      |  FROM ev e JOIN cohort c USING (user_id)
      |  WHERE e.day - c.cohort_day <= 7),
      |counts AS (
      |  SELECT cohort_day, day_offset, COUNT(*) AS n_active
      |  FROM offs GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_day, n_active AS n_cohort FROM counts
      |  WHERE day_offset = 0)
      |SELECT c.cohort_day, c.day_offset, c.n_active, s.n_cohort,
      |  CAST(c.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE) AS retention
      |FROM counts c JOIN sizes s USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sessionize" -> (q35_sessionize _),
    "q37_funnel" -> (q37_funnel _),
    "q38_retention_cohorts" -> (q38_retention_cohorts _))

  val oracle: Map[String, String] = Map(
    "q35_sessionize" -> q35Oracle,
    "q37_funnel" -> q37Oracle,
    "q38_retention_cohorts" -> q38Oracle)
}
