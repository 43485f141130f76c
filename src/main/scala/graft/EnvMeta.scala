package graft

import org.apache.spark.sql.SparkSession

/** Environment forensics for the cert artifacts (r13 verdict item 9):
  * when a local-vs-driver result split appears (r10–r13's s06 saga was
  * chased as arithmetic for three rounds before typing evidence landed),
  * the FIRST question is "same Spark? same JVM? how many cores?" —
  * answered by a machine-readable stamp shipped with every Verify dump
  * (`<outDir>/meta.json`) and embedded in BENCH_DETAIL.json. The
  * DuckDB side lives with the checker (tools/check.py prints its
  * version; the driver's build is its own). */
object EnvMeta {
  def json(spark: SparkSession): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"spark":${q(spark.version)},""" +
      s""""scala":${q(scala.util.Properties.versionNumberString)},""" +
      s""""jvm":${q(System.getProperty("java.version"))},""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""os":${q(System.getProperty("os.name") + " " +
        System.getProperty("os.version"))},""" +
      s""""master":${q(spark.sparkContext.master)}}"""
  }
}
