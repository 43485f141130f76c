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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_sessionize" -> (q35_sessionize _))

  val oracle: Map[String, String] = Map(
    "q35_sessionize" -> q35Oracle)
}
