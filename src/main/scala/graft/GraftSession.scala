package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory with the engine's scale posture baked in.
  *
  * Settings rationale (100 TB posture, tested at local[32]):
  *  - AQE on: runtime coalescing of small shuffles + skew-join splitting,
  *    so `shuffle.partitions` can be sized for the big case without
  *    penalizing small stages.
  *  - autoBroadcastJoinThreshold lowered to 1 MiB: dimension tables are
  *    broadcast EXPLICITLY via `broadcast()` hints in every query; the
  *    size-estimate heuristic must never pick a column-pruned *fact*
  *    table as the build side (observed at sf0.1: Spark broadcast the
  *    600k-row lineitem scan and serialized the whole plan through one
  *    task — 3× slower than shuffling it).
  *  - shuffle.partitions = cores in local mode (driver contract says 32);
  *    a cluster deployment would size this to 2-3× total cores.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (1 << 20).toString)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def get(appName: String): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
