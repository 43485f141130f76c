package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `sfDir`. Reads are plain `spark.read.parquet` so Catalyst gets
  * column pruning + predicate pushdown into the scan for free.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and surface both the
    * raw nanos (`ts_nanos`, exact) and a micro-truncated TimestampType
    * `ts` for date arithmetic. Nano→micro truncation matches DuckDB's
    * CAST(ts_ns AS TIMESTAMP) semantics (truncation toward zero; the
    * testdata has no pre-1970 timestamps).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumnRenamed("ts", "ts_nanos")
      // integer division — double division would lose precision at 1e18 nanos
      .withColumn("ts", timestamp_micros(expr("ts_nanos div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    apply(s, d, "embeddings")
}
