package graft
import org.apache.spark.sql.SparkSession

/** Scratch main for plan inspection during development (not driver-facing). */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-dev")
    if (args.headOption.contains("warc-e2e")) { warcE2e(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("sql")) {
      spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("embeddings")
      spark.sql(args(1)).show(10, false)
      spark.stop(); return
    }
    val names = if (args.isEmpty) Seq("q05_multi_join") else args.toSeq
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[dev] $n rows=$c time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      val t1 = System.nanoTime()
      val c2 = df.count()
      println(f"[dev] $n (2nd) rows=$c2 time=${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }

  /** Drive the real job surface: documents → .warc files on disk →
    * Pipeline.run (binaryFile scan → enrich → Avro sink) → read the Avro
    * containers back with the plain Avro reader (cross-impl check à la
    * reference test.py). */
  def warcE2e(spark: SparkSession, sfDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val warcDir = Files.createTempDirectory("graft-warc")
    graft.warc.WarcQueries.warcFiles(spark, sfDir).collect()
      .zipWithIndex.foreach { case ((_, bytes), i) =>
        Files.write(warcDir.resolve(f"dta-report00-$i%02d.warc"), bytes)
      }
    println(s"[dev] wrote warcs to $warcDir")
    val outDir = warcDir.resolve("out").toString
    val qDir = warcDir.resolve("quarantine").toString
    graft.warc.Pipeline.run(spark, s"$warcDir/*.warc", outDir, "avro", Some(qDir))
    println(s"[dev] quarantined=${spark.read.parquet(qDir).count()} (corrupt gzip records)")
    val t0 = System.nanoTime()
    graft.warc.Pipeline.run(spark, s"$warcDir/*.warc", outDir, "avro")
    println(f"[dev] idempotent re-run took ${(System.nanoTime() - t0) / 1e9}%.3fs (should skip)")
    // literal wildcard path through the V2 source (glob expansion branch)
    val globCount = spark.read.format("warc").load(s"$warcDir/*.warc").count()
    println(s"[dev] literal-glob load records=$globCount")
    // failed-attempt restart: partial dir without _SUCCESS must be rebuilt
    Files.delete(java.nio.file.Paths.get(outDir, "_SUCCESS"))
    graft.warc.Pipeline.run(spark, s"$warcDir/*.warc", outDir, "avro")
    println(s"[dev] restart-after-partial ok=" +
      Files.exists(java.nio.file.Paths.get(outDir, "_SUCCESS")))
    // type checking of the native expressions
    try {
      spark.sql("SELECT cosine_sim(1.0, 2.0)").collect()
      println("[dev] type-check FAILED TO REJECT")
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        println(s"[dev] type-check rejected scalar args: ${e.getMessage.take(80)}")
    }
    val files = new java.io.File(outDir).listFiles().filter(_.getName.endsWith(".avro"))
    var n = 0L
    var fields = -1
    files.foreach { f =>
      val r = new org.apache.avro.file.DataFileReader(f,
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      fields = r.getSchema.getFields.size
      var sample: org.apache.avro.generic.GenericRecord = null
      while (r.hasNext) { sample = r.next(); n += 1 }
      if (sample != null && n <= 1000)
        println(s"[dev] sample url=${sample.get("url")} wc=${sample.get("word_count")} kw=${sample.get("keywords").asInstanceOf[java.util.Map[_, _]].size()}")
      r.close()
    }
    println(s"[dev] avro files=${files.length} records=$n schemaFields=$fields")
  }
}
