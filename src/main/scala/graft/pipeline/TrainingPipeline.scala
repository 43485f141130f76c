package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** END-TO-END TRAINING-DATA PIPELINE composition (p01) and the JSONL
  * interchange round-trip (io01) — the two ways a user actually SHIPS
  * this library rather than running one operator at a time.
  *
  * p01 chains the canonical pre-training stages in one declarative DAG —
  * quality gate (t07's exact rule) → exact dedup (d01's keeper rule) →
  * per-domain cap (the Gopher/FineWeb anti-domination stage) → the
  * reproducible shard layout (t15's device) — and emits a per-shard
  * audit row whose `corpus_md5` fingerprints the exact BYTES that
  * survived, in the exact order a trainer would read them. Every stage
  * is SQL-expressible, so the whole composition is oracle-checked
  * end-to-end: this is the strongest single correctness statement in the
  * suite (any wrong decision at any stage moves a checksum).
  *
  * Catalyst sees ONE logical plan for the whole pipeline, so filters
  * prune before the gram shuffle, the projection is minimal per stage,
  * and AQE sizes each of the four exchanges independently — composition
  * costs no materialization boundaries, unlike a stage-per-job shell
  * pipeline around the reference binary.
  */
object TrainingPipeline {

  /** Docs any single domain may contribute after gating+dedup. 15 bites
    * on this corpus (sources carry ~14–23 post-dedup survivors, most
    * above 15 at every SF) so the stage is genuinely exercised — and the
    * spec asserts the exact stage identity Σ min(survivors, cap). */
  private[graft] val DomainCap = 15L

  /** The per-document survivor frame all p01 surfaces share: gate →
    * dedup → cap → shard+rank, one row per surviving doc with its text
    * carried through (the audit drops it; the shard WRITER ships it). */
  private def shardedSurvivors(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    shardedSurvivorsOf(Tables.documents(s, d)
      .select($"doc_id", $"text", $"source"))
  }

  /** Gate → dedup → cap → shard → audit over a caller-supplied
    * `(doc_id, text, source)` corpus — the full pipeline tail
    * p01/p02 share, exposed for p03's streaming composition (the
    * stream ADMITS rows, then this tail runs batch-side on the
    * accumulated corpus — one implementation, no drift). */
  private[graft] def shardedAuditOf(docs: DataFrame): DataFrame =
    auditRollup(shardedSurvivorsOf(docs))

  /** The pipeline stages over a caller-supplied `(doc_id, text, source)`
    * frame — ONE definition of gate → dedup → cap → shard, shared by
    * p01 (the `documents` table) and p02 (the WARC-extracted corpus). */
  private def shardedSurvivorsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // Stage 1 — t07's gate, bit-for-bit (same signal frame the gate and
    // the t13 classifier train on).
    val tooShort = $"n_tok" < 30
    val lowStop = $"n_stop" * 1000 < $"n_tok" * 15
    val highPunct = $"n_punct" * 10 > $"n_chars_m"
    val repetitive = ($"n_grams" - $"n_distinct") * 10 > $"n_grams"
    val kept = graft.text.TextOps.gateSignalsOf(docs.select($"doc_id", $"text"))
      .filter(!tooShort && !lowStop && !highPunct && !repetitive)
      .select($"doc_id", $"n_tok")
    // text/source rejoin on doc_id (the gate's gram aggregation cannot
    // carry the text through); co-partitioned equi-join, no skew
    val gated = kept.join(docs, "doc_id")
      .withColumn("doc_md5", md5($"text"))
    // Stage 2 — exact dedup, d01's keeper rule: min doc_id per digest
    val byDigest = Window.partitionBy($"doc_md5").orderBy($"doc_id")
    val deduped = gated
      .withColumn("rn", row_number().over(byDigest))
      .filter($"rn" === 1).drop("rn")
    // Stage 3 — per-domain cap: a deterministic salted order (t15's
    // md5 device) so the ≤15 survivors per source are a reproducible
    // uniform choice, not an input-order artifact
    val capKey = md5(concat(lit("p01cap:"), $"doc_id".cast("string")))
    val bySource = Window.partitionBy($"source").orderBy($"cap_key", $"doc_id")
    val capped = deduped.withColumn("cap_key", capKey)
      .withColumn("crn", row_number().over(bySource))
      .filter($"crn" <= DomainCap)
    // Stage 4 — t15's reproducible shard layout over the survivors
    val orderKey = md5(concat(lit("p01shuf:"), $"doc_id".cast("string")))
    capped.withColumn("order_key", orderKey)
      .withColumn("shard",
        conv(substring($"order_key", 1, 4), 16, 10).cast("long") % 8)
      .withColumn("rank", row_number()
        .over(Window.partitionBy($"shard").orderBy($"order_key", $"doc_id"))
        .cast("long"))
  }

  /** The per-shard audit rollup BOTH p01 surfaces must share — the
    * written-files audit is only evidence because it is the SAME
    * aggregation as the logical pipeline's (spec compares them for
    * equality; a formula that drifted in one copy would misread as a
    * serialization bug). corpus_md5 hashes the kept docs' md5s in READ
    * ORDER — the bytes a trainer consumes, position-sensitive. */
  private def auditRollup(survivors: DataFrame): DataFrame = {
    import survivors.sparkSession.implicits._
    survivors.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum($"doc_id" * $"rank").as("order_checksum"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"order_key", $"doc_id", $"doc_md5"))),
          x => x.getField("doc_md5")), ",")).as("corpus_md5"))
      .orderBy($"shard")
  }

  /** p01: the composed pipeline. Output: one audit row per shard —
    * (shard, n_docs, n_tokens, order_checksum, corpus_md5).
    *
    * Scale shape (100 TB posture): four shuffles, each on a key chosen
    * to stay cool — the gate's per-doc 3-gram count (keys = doc ids,
    * uniform), the dedup window on `doc_md5` (near-unique by
    * construction), the cap window on `source`, and the shard rollup
    * (8 groups after an order-key ranking window on `shard`). The one
    * key that CAN run hot at crawl scale is `source` (a mega-domain
    * holds billions of docs); the exact-rank window here is the
    * correctness-first choice, and the documented escape hatch for
    * skewed domains is t16's salted-hash THRESHOLD device — a map-side
    * keep decision at the price of an approximate (± hash variance)
    * rather than exact cap. Nothing driver-side anywhere: the audit is
    * 8 rows. */
  def p01_training_pipeline(s: SparkSession, d: String): DataFrame =
    auditRollup(shardedSurvivors(s, d))

  /** Materialize the pipeline's survivors as TRAINING SHARDS — the
    * artifact a trainer actually mounts, not just the audit rows. One
    * `shard=N/` directory per shard (Hive layout, so a reader can
    * partition-prune to any shard subset), rows sorted by
    * (order_key, doc_id) WITHIN each shard's files so a file-order read
    * replays the exact sequence `p01_training_pipeline`'s `corpus_md5`
    * fingerprints, and `maxRecordsPerFile` bounds file size the same
    * way the warehouse sink does (Pipeline K3 discipline).
    *
    * Scale shape: one repartition on `shard` (8-way here; at crawl
    * scale pick shards ≈ cluster write parallelism), a per-partition
    * sort (no global sort — `sortWithinPartitions`, not `orderBy`), and
    * a streaming write. The returned frame is the p01 audit computed
    * FROM THE WRITTEN FILES, so callers get the write verified against
    * nothing-up-my-sleeve bytes: recompute `p01_training_pipeline` and
    * compare. */
  def materializeShards(s: SparkSession, d: String, outDir: String,
      maxRecordsPerFile: Long = 50000L): DataFrame = {
    import s.implicits._
    shardedSurvivors(s, d)
      .select($"shard", $"order_key", $"doc_id", $"n_tok", $"doc_md5", $"text")
      .repartition($"shard")
      .sortWithinPartitions($"shard", $"order_key", $"doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
    // audit of what LANDED: same rollup as p01, re-ranked from the
    // written bytes (rank recomputed — the write dropped it by design:
    // it is derivable, and persisting it would freeze a value the
    // audit is supposed to re-derive)
    val back = s.read.parquet(outDir)
      // Hive partition-dir values type-infer to INT; restore the
      // pipeline's LONG so this audit is schema-identical to p01's
      .withColumn("shard", $"shard".cast("long"))
    auditRollup(back.withColumn("rank", row_number()
      .over(Window.partitionBy($"shard").orderBy($"order_key", $"doc_id"))
      .cast("long")))
  }

  /** The whole pipeline replayed in SQL: t07's gate CTEs — spliced from
    * [[graft.text.TextOps.gateSignalsSqlCtes]], the ONE SQL definition
    * of the gate signals (r10 review: this oracle used to hand-copy the
    * base/tk/g/c/rep chain, and a drift between the copies would
    * surface only as an opaque corpus_md5 mismatch) — then three window
    * stages, then the per-shard rollup with an ordered string_agg for
    * the corpus fingerprint. */
  /** The post-gate pipeline stages in SQL (dedup → cap → shard →
    * rollup), parameterized by the `(doc_id, text, source)` source the
    * `gated` join reads — one definition shared by the p01 and p02
    * oracles, like [[shardedSurvivorsOf]] on the engine side. */
  private[graft] def pipelineTailSql(src: String): String =
    s"""kept AS (
      |  SELECT b.doc_id, b.n_tok FROM base b JOIN rep r USING (doc_id)
      |  WHERE NOT (b.n_tok < 30 OR b.n_stop * 1000 < b.n_tok * 15
      |    OR b.n_punct * 10 > b.n_chars_m
      |    OR (r.n_grams - r.n_distinct) * 10 > r.n_grams)),
      |gated AS (
      |  SELECT k.doc_id, k.n_tok, d.source, md5(d.text) AS doc_md5
      |  FROM kept k JOIN $src d USING (doc_id)),
      |dd AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_md5 ORDER BY doc_id) AS rn
      |  FROM gated),
      |deduped AS (SELECT doc_id, n_tok, source, doc_md5 FROM dd WHERE rn = 1),
      |cap AS (
      |  SELECT *, md5('p01cap:' || CAST(doc_id AS VARCHAR)) AS cap_key
      |  FROM deduped),
      |cr AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY cap_key, doc_id) AS crn FROM cap),
      |capped AS (SELECT doc_id, n_tok, doc_md5 FROM cr WHERE crn <= 15),
      |sh AS (
      |  SELECT *, md5('p01shuf:' || CAST(doc_id AS VARCHAR)) AS order_key
      |  FROM capped),
      |sd AS (
      |  SELECT *, CAST(concat('0x', substr(order_key, 1, 4)) AS BIGINT) % 8
      |    AS shard FROM sh),
      |rk AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY shard
      |    ORDER BY order_key, doc_id) AS BIGINT) AS rank FROM sd)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM(doc_id * rank) AS BIGINT) AS order_checksum,
      |  md5(string_agg(doc_md5, ',' ORDER BY order_key, doc_id)) AS corpus_md5
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin

  val p01Oracle: String =
    s"""WITH ${graft.text.TextOps.gateSignalsSqlCtes},
      |${pipelineTailSql("documents")}""".stripMargin

  /** p02: the composed pipeline run on the WARC SURFACE — the
    * reference's actual data path feeding the training-data stages
    * (r10 verdict item 8): the staged fixture WARC containers go
    * through the full parse/enrichment chain
    * ([[graft.warc.Pipeline.urlResources]] — record filter, gunzip,
    * HTML extraction), and the per-page results become the pipeline's
    * corpus — doc id recovered from the page URL, text = the extracted
    * `text_content`, anti-domination key = `hostname` (the fixture
    * crawl spans one registrable domain, so `domain_name` would cap
    * the whole corpus as a single "source"; per-host is the
    * same-granularity choice a crawl curation actually makes). Gate →
    * dedup → cap → shard then run IDENTICALLY to p01 (shared
    * [[shardedSurvivorsOf]]), and the oracle replays end-to-end: the
    * WARC extraction is recomputed from `documents` exactly as the w01
    * oracle proves it must come out. */
  def p02_warc_training_pipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val res = graft.warc.Pipeline.urlResources(
      graft.warc.WarcSource.fromBytes(graft.warc.WarcQueries.warcFiles(s, d)))
    auditRollup(shardedSurvivorsOf(res.select(
      regexp_extract($"url", "/page/(\\d+)$", 1).cast("long").as("doc_id"),
      $"text_content".as("text"),
      $"hostname".as("source"))))
  }

  val p02Oracle: String =
    s"""WITH wdocs AS (
      |  SELECT doc_id,
      |    'Heading ' || doc_id || ' ' || text || ' link out quad skip' AS text,
      |    CASE WHEN doc_id % 7 = 0 THEN 'aa' ELSE '' END ||
      |      'docs' || (doc_id % 50) || '.example.gov.au' AS source
      |  FROM documents),
      |${graft.text.TextOps.gateSignalsSqlCtesFrom("wdocs")},
      |${pipelineTailSql("wdocs")}""".stripMargin

  /** io01: JSONL INTERCHANGE ROUND-TRIP — jsonl(.gz) is the lingua
    * franca of LLM corpus exchange (every public corpus release ships
    * it), so the engine must both EMIT and INGEST it without value
    * drift. The query writes the documents table as gzipped JSON Lines,
    * reads it back with an EXPLICIT schema, and rolls the re-read rows
    * into a per-language audit (count, char mass, ordered corpus md5).
    * The oracle computes the same audit from the PARQUET truth — any
    * serialization loss anywhere (quoting, unicode escapes, newline
    * handling, numeric formatting, gzip framing) moves the checksum.
    *
    * Scale notes: the explicit read schema means NO inference pre-scan
    * of the corpus (a silent full extra pass at 100 TB, and the
    * documented failure mode of schema drift between shards); gzip
    * members make each written file one atomic unit (jsonl.gz is not
    * splittable — the write keeps the input partitioning so file count
    * = write parallelism, and a production re-read parallelizes across
    * FILES, which is why corpus releases ship thousands of shards). */
  def io01_jsonl_roundtrip(s: SparkSession, d: String): DataFrame =
    // staging on the SESSION'S filesystem (not a driver-local java.nio
    // dir — r10 review; see StagingDir for the cluster failure modes)
    graft.analytics.StagingDir.withStagingDir(s, "graft-io01") { dir =>
      import s.implicits._
      val out = new org.apache.hadoop.fs.Path(dir, "docs-jsonl").toString
      Tables.documents(s, d)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        .write.mode("overwrite").option("compression", "gzip").json(out)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      s.read.schema(schema).json(out)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          sum(length($"text")).cast("long").as("sum_text_len"),
          md5(array_join(transform(
            array_sort(collect_list(struct($"doc_id", md5($"text").as("m")))),
            x => x.getField("m")), ",")).as("corpus_md5"))
        .orderBy($"lang")
        // the audit is 5 rows; materialize BEFORE the temp dir vanishes
        .localCheckpoint(true)
    }

  /** The audit computed from the parquet truth — equality proves the
    * jsonl write→read cycle preserved every value byte-for-byte. */
  val io01Oracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
      |  md5(string_agg(md5(text), ',' ORDER BY doc_id)) AS corpus_md5
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_training_pipeline" -> (p01_training_pipeline _),
    "p02_warc_training_pipeline" -> (p02_warc_training_pipeline _),
    "io01_jsonl_roundtrip" -> (io01_jsonl_roundtrip _))

  val oracle: Map[String, String] = Map(
    "p01_training_pipeline" -> p01Oracle,
    "p02_warc_training_pipeline" -> p02Oracle,
    "io01_jsonl_roundtrip" -> io01Oracle)
}
