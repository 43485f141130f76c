package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // untimed warmup: JIT + codegen + shuffle machinery, so the first
    // timed query isn't charged for session bring-up
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").count().count()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // name-sorted: Map iteration order would shuffle which queries land
    // on load spikes each round, adding cross-round position noise
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // each query family pays its own JIT/codegen bring-up on the first
      // run, and this box takes external load spikes that can inflate any
      // single run several-fold — report min(cold, warm): the least-
      // interference estimate, so round-over-round deltas track plan
      // changes rather than compiler or machine noise
      var ok = true
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => ok = false }
        spark.catalog.clearCache() // release per-query persists
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val best = if (ok) math.min(cold, once()) else cold
      if (!ok) failed += name
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
