package graft
import org.apache.spark.sql.SparkSession

/** Scratch main for plan inspection during development (not driver-facing). */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-dev")
    if (args.headOption.contains("warc-e2e")) { warcE2e(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("d04probe")) { d04probe(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("d02probe")) { d02probe(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("inventory")) {
      println(s"[dev] queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
      println("[dev] no-oracle=" +
        (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted.mkString(","))
      println("[dev] orphan-oracles=" +
        (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted.mkString(","))
      spark.stop(); return
    }
    if (args.headOption.contains("d03probe")) { d03probe(spark, sfDir); spark.stop(); return }
    if (args.headOption.contains("show")) {
      SparkEntry.queries(args(1))(spark, sfDir).show(50, false)
      spark.stop(); return
    }
    if (args.headOption.contains("sql")) {
      spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("embeddings")
      spark.sql(args(1)).show(10, false)
      spark.stop(); return
    }
    val names = if (args.isEmpty) Seq("q05_multi_join") else args.toSeq
    for (n <- names) {
      // time CONSTRUCTION + action: eager operators (withCache ones) do
      // their work inside the queries(n) call itself
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
      val c = df.count()
      println(f"[dev] $n rows=$c time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val c2 = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[dev] $n (2nd) rows=$c2 time=${(System.nanoTime() - t1) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Stage-by-stage timing of the d02 minhash pipeline. */
  def d02probe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.dedup.DedupOps
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = DedupOps.withNearDups(spark, sfDir)
      .withColumn("bands", DedupOps.minhashBandsU($"text")).persist()
    t("materialize sigs")(println("  rows=" + docs.count()))
    val buckets = docs.select($"doc_id",
      posexplode($"bands").as(Seq("band", "bucket"))).persist()
    t("buckets")(println("  rows=" + buckets.count()))
    val hist = buckets.groupBy($"band", $"bucket").agg(count(lit(1)).as("n"))
      .groupBy(ceil(log2($"n")).as("log2n")).agg(count(lit(1)).as("buckets"),
        sum($"n" * $"n").as("sum_n2"))
      .orderBy($"log2n")
    t("bucket histogram")(hist.collect().foreach(r =>
      println(s"  2^${r.get(0)}: buckets=${r.get(1)} sum_n2=${r.get(2)}")))
    val cand = DedupOps.guardedBucketPairs(buckets, Seq("band", "bucket")).persist()
    t("cand")(println("  pairs=" + cand.count()))
    val texts = docs.select($"doc_id", $"text")
    val jacU = udf { (ta: String, tb: String) =>
      DedupOps.jaccard(DedupOps.shingles(ta), DedupOps.shingles(tb)) }
    val verified = cand
      .join(texts.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("text", "text_a"), "id_a")
      .join(texts.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("text", "text_b"), "id_b")
      .withColumn("j", jacU($"text_a", $"text_b"))
      .filter($"j" >= 0.8)
    t("verify")(println("  confirmed=" + verified.count()))
    spark.catalog.clearCache()
  }

  /** Stage-by-stage timing of the d03 simhash pipeline. */
  def d03probe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.dedup.DedupOps
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val simU = udf { text: String => DedupOps.simhash(DedupOps.shingles(text)) }
    val docs = DedupOps.withNearDups(spark, sfDir).withColumn("sig", simU($"text")).persist()
    t("materialize sigs")(println("  rows=" + docs.count()))
    val banded = docs.select($"doc_id",
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          ($"sig".bitwiseAND(lit(0xffffL << (b * 16)))).as("bits"))): _*))
        .as("bb"))
      .select($"doc_id", $"bb.band", $"bb.bits")
    val sizes = banded.groupBy($"band", $"bits")
      .agg(count(lit(1)).as("n"))
    t("bucket sizes")(banded.persist().count())
    println("  top buckets:")
    sizes.orderBy($"n".desc).limit(5).collect()
      .foreach(r => println(s"    band=${r.get(0)} n=${r.get(2)}"))
    val cand = t("guardedBucketPairs")(
      DedupOps.guardedBucketPairs(banded, Seq("band", "bits")))
    t("cand count")(println("  pairs=" + cand.count()))
    val sigs = docs.select($"doc_id", $"sig")
    val hamU = udf { (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b) }
    val out = cand
      .join(sigs.select($"doc_id".as("id_a"), $"sig".as("sig_a")), "id_a")
      .join(sigs.select($"doc_id".as("id_b"), $"sig".as("sig_b")), "id_b")
      .withColumn("hamming", hamU($"sig_a", $"sig_b"))
      .filter($"hamming" <= 6)
    println(out.queryExecution.executedPlan.toString.take(6000))
    t("verify-nopersist")(println("  confirmed=" + out.count()))
    spark.catalog.clearCache()
  }

  /** Stage-by-stage timing of the d04 candidate pipeline. */
  def d04probe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.dedup.DedupOps
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // mirrors the CURRENT d04 shape (slack 11/20 prefix, length+position
    // filters, candidates straight to the string verify)
    val hashShinglesU = udf { text: String =>
      DedupOps.shingles(text).iterator.map(DedupOps.hash64).toSeq.distinct
    }
    val index = DedupOps.withNearDups(spark, sfDir)
      .select($"doc_id", hashShinglesU($"text").as("hs"))
      .select($"doc_id", size($"hs").cast("long").as("n_sh"),
        explode($"hs").as("h"))
    val idx = index.persist()
    t("materialize index")(println("  rows=" + idx.count()))
    val df = idx.groupBy($"h").agg(count(lit(1)).as("df"))
    t("df agg")(println("  distinct=" + df.count()))
    val byRarity = Window.partitionBy($"doc_id").orderBy($"df", $"h")
    val prefix = idx.join(df, "h")
      .withColumn("rk", row_number().over(byRarity))
      .filter($"rk" <= $"n_sh" - (($"n_sh" * 11 + 19) / 20).cast("long") + 1)
      .select($"doc_id", $"h", $"rk", $"n_sh").persist()
    t("rank+prefix")(println("  rows=" + prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
          greatest($"a.n_sh", $"b.n_sh") * 11 <= least($"a.n_sh", $"b.n_sh") * 20 &&
          (least($"a.n_sh" - $"a.rk", $"b.n_sh" - $"b.rk") + 1) * 31 >=
            ($"a.n_sh" + $"b.n_sh") * 11)
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        $"a.rk".as("rka"), $"b.rk".as("rkb"),
        $"a.n_sh".as("na"), $"b.n_sh".as("nb"))
      .groupBy($"id_a", $"id_b")
      .agg(count(lit(1)).as("pm"),
        max($"rka").as("mra"), max($"rkb").as("mrb"),
        first($"na").as("na"), first($"nb").as("nb"))
    val candAll = cand.persist()
    t("cand join (pre-filter)")(println("  pairs=" + candAll.count()))
    val candP = candAll
      .filter(($"pm" + least($"na" - $"mra", $"nb" - $"mrb")) * 31 >=
        ($"na" + $"nb") * 11)
      .select($"id_a", $"id_b").persist()
    t("cand accumulated-position filter")(println("  pairs=" + candP.count()))
    val texts = DedupOps.withNearDups(spark, sfDir)
    val jacU = udf { (ta: String, tb: String) =>
      DedupOps.jaccard(DedupOps.shingles(ta), DedupOps.shingles(tb)) }
    val out = candP
      .join(texts.select($"doc_id".as("id_a"), $"text".as("text_a")), "id_a")
      .join(texts.select($"doc_id".as("id_b"), $"text".as("text_b")), "id_b")
      .withColumn("jaccard", jacU($"text_a", $"text_b"))
      .filter($"jaccard" >= 0.6)
    t("verify")(println("  confirmed=" + out.count()))
    spark.catalog.clearCache()
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
