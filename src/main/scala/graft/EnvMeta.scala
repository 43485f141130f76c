package graft

import org.apache.spark.sql.SparkSession

/** Environment forensics for the cert artifacts (r13 verdict item 9):
  * when a local-vs-driver result split appears (r10–r13's s06 saga was
  * chased as arithmetic for three rounds before typing evidence landed),
  * the FIRST question is "same Spark? same JVM? how many cores?" —
  * answered by a machine-readable stamp shipped with every Verify dump
  * (`<outDir>/meta.json`) and embedded in BENCH_DETAIL.json. The
  * DuckDB side lives with the checker (tools/check.py prints its
  * version; the driver's build is its own).
  *
  * Since r15 the stamp also carries the MEASUREMENT-TIME load (r14
  * verdict item 5: the +8.5% shared-set drift that round was "almost
  * certainly load", but nothing recorded it): the 1/5/15-min load
  * averages straight from /proc/loadavg, and the cgroup CPU quota in
  * effective cores (v2 cpu.max or v1 cfs_quota/cfs_period; -1 = no
  * quota) — so "32 CPUs" can be cross-checked against what the
  * container may actually schedule. The stamp is evaluated at json()
  * call time; Bench stamps one at start and one at end of the run so
  * drift across the ~2-minute suite is visible, alongside the per-run
  * load samples it already records. */
object EnvMeta {
  /** (load1, load5, load15) from /proc/loadavg; MXBean 1-min fallback
    * (with -1 for the unavailable horizons) off Linux or on read error. */
  def loadAvg3: (Double, Double, Double) =
    try {
      val parts = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).trim
        .split("\\s+")
      (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
    } catch {
      case _: Exception =>
        (java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .getSystemLoadAverage, -1.0, -1.0)
    }

  /** cgroup CPU quota as effective cores; -1.0 when unbounded/unknown.
    * v2: /sys/fs/cgroup/cpu.max = "<quota|max> <period>";
    * v1: cpu.cfs_quota_us / cpu.cfs_period_us (quota -1 = unbounded). */
  def cgroupCpuQuota: Double = {
    def readTrim(p: String): Option[String] =
      try Some(java.nio.file.Files.readString(
        java.nio.file.Paths.get(p)).trim)
      catch { case _: Exception => None }
    val v2 = readTrim("/sys/fs/cgroup/cpu.max").flatMap { s =>
      s.split("\\s+") match {
        case Array("max", _)   => Some(-1.0)
        case Array(q, p)       =>
          try Some(q.toDouble / p.toDouble) catch { case _: Exception => None }
        case _                 => None
      }
    }
    v2.orElse {
      for {
        q <- readTrim("/sys/fs/cgroup/cpu/cpu.cfs_quota_us")
        p <- readTrim("/sys/fs/cgroup/cpu/cpu.cfs_period_us")
        qd <- q.toDoubleOption
        pd <- p.toDoubleOption
      } yield if (qd < 0) -1.0 else qd / pd
    }.getOrElse(-1.0)
  }

  def json(spark: SparkSession): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def r2(d: Double) =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val (l1, l5, l15) = loadAvg3
    s"""{"spark":${q(spark.version)},""" +
      s""""scala":${q(scala.util.Properties.versionNumberString)},""" +
      s""""jvm":${q(System.getProperty("java.version"))},""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""cgroup_cpu_quota":${r2(cgroupCpuQuota)},""" +
      s""""loadavg_1m":${r2(l1)},"loadavg_5m":${r2(l5)},""" +
      s""""loadavg_15m":${r2(l15)},""" +
      s""""os":${q(System.getProperty("os.name") + " " +
        System.getProperty("os.version"))},""" +
      s""""master":${q(spark.sparkContext.master)}}"""
  }
}
