package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the composed training pipeline (p01), the jsonl round-trip
  * (io01), and recrawl latest-wins (d17) — the round-10 additions. The
  * value-exact story is the DuckDB oracle at the gate; these specs pin
  * the INTERNAL invariants the oracle can't see (stage-by-stage
  * accounting, serialization fidelity vs the in-memory truth,
  * determinism across runs). */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("pipeline-ops-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("p01: stage accounting — gate, dedup, cap, and shards all bind coherently") {
    val sp = spark
    import sp.implicits._
    val out = graft.pipeline.TrainingPipeline.p01_training_pipeline(spark, sf)
      .collect()
    // every shard occupied, audit fields sane
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("shard")).toSeq == (0L until 8L))
    assert(out.forall(_.getAs[Long]("n_docs") > 0))
    assert(out.forall(_.getAs[String]("corpus_md5").length == 32))
    val total = out.map(_.getAs[Long]("n_docs")).sum
    // upper bound: the domain cap is a hard ceiling per source
    val nSources = graft.analytics.Tables.documents(spark, sf)
      .select($"source").distinct().count()
    assert(total <= nSources * 15,
      s"cap violated: $total survivors from $nSources sources")
    // the cap stage must actually BITE on this corpus (a pass-through
    // stage proves nothing): gate survivors exceed the final count
    val gateKept = graft.text.TextOps.t07_quality_gate(spark, sf)
      .filter($"keep").count()
    assert(gateKept > total,
      s"domain cap never bound: gate kept $gateKept, pipeline kept $total")
  }

  test("p01: deterministic across runs") {
    val a = graft.pipeline.TrainingPipeline.p01_training_pipeline(spark, sf)
      .collect().map(_.toString).toSeq
    val b = graft.pipeline.TrainingPipeline.p01_training_pipeline(spark, sf)
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("io01: jsonl round-trip audit equals the audit of the in-memory truth") {
    val sp = spark
    import sp.implicits._
    val viaJson = graft.pipeline.TrainingPipeline.io01_jsonl_roundtrip(spark, sf)
      .collect().map(_.toString).toSeq
    val direct = graft.analytics.Tables.documents(spark, sf)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum(length($"text")).cast("long").as("sum_text_len"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"doc_id", md5($"text").as("m")))),
          x => x.getField("m")), ",")).as("corpus_md5"))
      .orderBy($"lang")
      .collect().map(_.toString).toSeq
    assert(viaJson == direct)
  }

  test("d17: latest-wins keeps exactly the newest snapshot per URL") {
    val sp = spark
    import sp.implicits._
    val out = graft.dedup.Recrawl.d17_recrawl_latest(spark, sf)
    val docs = graft.analytics.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = out.select($"url_id", $"n_fetches", $"kept_seq", $"kept_md5")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.length == docs.size) // one row per URL, none dropped
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (url, nf, seq, m) =>
      val (expN, expSeq, expText) =
        if (url % 15 == 0) (3L, 3L, docs(url) + " [recrawl v3]")
        else if (url % 5 == 0) (2L, 2L, docs(url) + " [recrawl v2]")
        else (1L, 1L, docs(url))
      assert(nf == expN && seq == expSeq, s"url $url: n=$nf seq=$seq")
      assert(m == md5hex(expText), s"url $url kept wrong snapshot")
    }
  }
}
