package graft.sim

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the approximate scale path, and embedding-cosine
  * near-duplicate detection.
  *
  * Scale shapes (100 TB posture):
  *  - brute force broadcasts the (small) query set and computes
  *    per-partition local top-k, merging globally — one tiny shuffle of
  *    k×|queries| rows, never an all-pairs materialization.
  *  - LSH assigns each vector to signature buckets map-side; probing
  *    shuffles only bucket-matched candidates.
  *  - near-dup planting mirrors `graft.dedup`: perturbed copies
  *    (vec_id + 100000) give a ground-truth pair set, so the oracle is
  *    exact and LSH recall is measurable.
  */
object SimilarityOps {

  val Shift = 100000L

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.sim")

  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** [[cosine]] over primitive arrays — identical arithmetic (same loop,
    * same double accumulation), no per-element boxing. `Seq[Float]`
    * access goes through the generic `apply` and boxes every element;
    * the s06 cluster compare runs millions of 64-d cosines per task, so
    * hot paths convert each vector to `Array[Float]` ONCE (an unboxed
    * arraycopy) and compare primitively. */
  def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** One deterministic Lloyd update shared by s04/s06: map-side argmin
    * assignment over the broadcast codebook, then per-cluster
    * fixed-point mean via the [[CentroidSum]] typed Aggregator —
    * ObjectHashAggregate partials ship one (64 longs, count) buffer per
    * cluster per map partition, where the r4 formulation posexploded the
    * corpus and shuffled corpus×64 (cid, pos, x) rows per iteration.
    * Numerics are IDENTICAL (same 2^-32 quantization, long sums, same
    * double→float rounding), so the s04/s06 determinism pins hold
    * unchanged. Only k centroid rows reach the driver. */
  /** THE coarse-assignment UDF: nearest centroid by cosine, min-cid
    * tie-break. One definition shared by Lloyd training, every store
    * build/ingest, and the IVF list builders — the tie-break is part of
    * the store contract (a streamed append assigned differently from
    * the stored corpus would land in the wrong bucket and vanish from
    * pruned probes), so it must be impossible for copies to drift. */
  private[sim] def coarseAssignU(cb: Array[(Int, Seq[Float])])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cbArr = cb.map { case (cid, c) => (cid, c.toArray) }
    udf { v: Seq[Float] =>
      val va = v.toArray
      cbArr.minBy { case (cid, c) => (-cosineArr(va, c), cid) }._1
    }
  }

  private[sim] def lloydStep(emb: DataFrame,
      cb: Array[(Int, Seq[Float])]): Array[(Int, Seq[Float])] = {
    val assignU = coarseAssignU(cb)
    val cAgg = udaf(new CentroidSum(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    emb.withColumn("cid", assignU(col("embedding")))
      .groupBy(col("cid")).agg(cAgg(col("embedding")).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1)
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def signBits(v: Seq[Float], planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      var dot = 0.0
      val p = planes(b)
      var i = 0
      while (i < p.length && i < v.length) { dot += p(i) * v(i); i += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** s01: exact top-5 cosine neighbors for the first 10 vectors.
    * Emits ids and ranks only (scores are engine-precision-dependent).
    * Top-k is a bounded typed Aggregator (see [[TopKCosine]]): each map
    * partition reduces to k candidates per query before the shuffle, so
    * only |queries|·k rows per partition cross the wire — never the full
    * corpus×queries scored set. */
  def s01_ann_bruteforce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 10)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("embedding", "q_emb")
    val topk = udaf(new TopKCosine(5))
    emb.crossJoin(broadcast(queries))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"q_emb", $"embedding"))
      .groupBy($"query_id")
      .agg(topk($"cos", $"vec_id").as("nbrs"))
      .select($"query_id", posexplode($"nbrs").as(Seq("pos", "neighbor_id")))
      .select($"query_id", ($"pos" + 1).as("rank"), $"neighbor_id")
      .orderBy($"query_id", $"rank")
  }

  val s01Oracle: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
      |           FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(q.q_emb, e.embedding) AS cos
      |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** embeddings ∪ perturbed near-identical copies (first component
    * shifted by +0.05 ⇒ cosine ≈ 0.999 against the original; natural
    * max pairwise cosine in this corpus ≈ 0.5). */
  def withNearDups(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    val perturb = udf { v: Seq[Float] =>
      if (v.isEmpty) v else (v.head + 0.05f) +: v.tail
    }
    emb.unionByName(emb.select(($"vec_id" + Shift).as("vec_id"),
      perturb($"embedding").as("embedding")))
  }

  /** s02: embedding-cosine near-dup via sign-LSH bucket join (8 bands ×
    * 8 bits; a cosine-0.999 pair misses all 8 bands with p ≈ 1e-7) with
    * exact cosine verification at 0.9. */
  def s02_embedding_neardup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nBands = 8
    val bitsPerBand = 8
    val planes = hyperplanes(nBands * bitsPerBand, 64)
    val bandsU = udf { v: Seq[Float] =>
      val sig = signBits(v, planes)
      (0 until nBands).map(b =>
        (b.toLong << 32) | ((sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1)))
    }
    graft.dedup.DedupOps.withCache(
        withNearDups(s, d).withColumn("bands", bandsU($"embedding"))) { docs =>
      val buckets = docs.select($"vec_id".as("doc_id"),
        explode($"bands").as("bucket"))
      val cand = graft.dedup.DedupOps.guardedBucketPairs(buckets, Seq("bucket"))
      val vecs = docs.select($"vec_id", $"embedding")
      cand
        .join(vecs.withColumnRenamed("vec_id", "id_a")
          .withColumnRenamed("embedding", "emb_a"), "id_a")
        .join(vecs.withColumnRenamed("vec_id", "id_b")
          .withColumnRenamed("embedding", "emb_b"), "id_b")
        .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"emb_a", $"emb_b"))
        .filter($"cos" >= 0.9)
        .select($"id_a", $"id_b")
        .orderBy($"id_a", $"id_b")
    }
  }

  val s02Oracle: String =
    // Exactly the planted pairs: perturbed copies sit at cosine ≈ 0.999,
    // every natural pair is below 0.6 — nothing else can cross 0.9.
    """SELECT vec_id AS id_a, vec_id + 100000 AS id_b
      |FROM embeddings ORDER BY id_a, id_b""".stripMargin

  /** s03: approximate top-k through LSH bucket probing, reported as
    * recall@5 against the exact baseline — the quality/​cost dial of the
    * approximate path made observable. */
  def s03_ann_lsh_recall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    val nBands = 16
    val bitsPerBand = 4
    val planes = hyperplanes(nBands * bitsPerBand, 64)
    val bandsU = udf { v: Seq[Float] =>
      val sig = signBits(v, planes)
      (0 until nBands).map(b =>
        (b.toLong << 32) | ((sig >>> (b * bitsPerBand)) & ((1L << bitsPerBand) - 1)))
    }
    val banded = emb.withColumn("bands", bandsU($"embedding"))
    graft.dedup.DedupOps.withCache(banded.select($"vec_id", $"embedding",
        explode($"bands").as("bucket"))) { buckets =>
      val queries = buckets.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"), $"bucket")
      val topk = udaf(new TopKCosine(5))
      val approx = buckets.join(queries,
          Seq("bucket")).filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id", $"q_emb", $"embedding").distinct()
        .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"q_emb", $"embedding"))
        .groupBy($"query_id")
        .agg(topk($"cos", $"vec_id").as("nbrs"))
        .select($"query_id", explode($"nbrs").as("vec_id"))
      // exact baseline feeds two consumers — cache so the s01 cross-join
      // runs once
      graft.dedup.DedupOps.withCache(s01_ann_bruteforce(s, d)
          .select($"query_id", $"neighbor_id".as("vec_id"))) { exact =>
        val hits = approx.join(exact, Seq("query_id", "vec_id"), "inner")
          .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
        exact.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
          .join(hits, Seq("query_id"), "left")
          .agg((sum(coalesce($"n_hit", lit(0L))).cast("double") /
            sum($"n_true").cast("double")).as("recall_at_5"),
            count(lit(1)).as("n_queries"))
      }
    }
  }

  /** s04: IVF (inverted-file) ANN — the coarse-quantizer scale path that
    * complements sign-LSH (s03). A k-centroid codebook is trained with
    * two Lloyd iterations (assignment map-side over broadcast centroids;
    * centroid update one shuffle per iteration), every vector is
    * assigned to its nearest centroid (the "inverted list"), and queries
    * probe only their `nprobe` closest lists — so a query scans
    * ~nprobe/k of the corpus instead of all of it. At 100 TB the lists
    * are the partitioning key (cluster-pruned scans); here the plan
    * shape is the same with a shuffle join on the list id. Reported as
    * recall@5 against the exact s01 baseline plus the scanned fraction —
    * the quality/cost dial made observable. (This synthetic corpus is
    * near-uniform, the hardest case for IVF; real embedding corpora
    * cluster, which is what makes nprobe/k ≪ 1 usable.) */
  def s04_ann_ivf(s: SparkSession, d: String): DataFrame =
    s04_ann_ivf(s, d, k = 16, nprobe = 6)

  /** `k`/`nprobe` are the IVF quality/cost dial. The defaults suit the
    * testdata; at real scale pick k ≈ √N (so lists stay ~√N long) and
    * train the codebook on a driver-side SAMPLE (`emb.sample(...)` of
    * ~256·k vectors — codebook quality needs a sample, not the corpus),
    * keeping the per-iteration collect at k rows exactly as here. The
    * full-corpus passes (assignment, list build, probe join) are already
    * distributed and size-invariant in shape. */
  def s04_ann_ivf(s: SparkSession, d: String, k: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    // deterministic init: the k lowest-id vectors are the seed codebook
    var centroids: Array[(Int, Seq[Float])] = emb.filter($"vec_id" < k)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1)))
    // two Lloyd iterations via the shared fixed-point step (see
    // [[lloydStep]]/[[CentroidSum]] for why a plain avg() would break
    // the deterministic recall pin and why the aggregator replaces the
    // r4 posexplode shuffle)
    (1 to 2).foreach { _ => centroids = lloydStep(emb, centroids) }
    val cb = centroids
    val assignU = coarseAssignU(cb)
    val probeU = udf { v: Seq[Float] =>
      cb.map { case (cid, c) => (cid, cosine(v, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    }
    val listed = emb.withColumn("cid", assignU($"embedding"))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(probeU($"embedding")).as("cid"))
    val total = emb.count()
    // the IVF join: each query meets only its nprobe inverted lists
    annRecall(s, d, listed.join(queries, Seq("cid")), total)
  }

  /** Recall@5 + scan-fraction rollup shared by s04/s07 over the IVF
    * candidate rows `(query_id, q_emb, vec_id, embedding)`. Both the
    * approx result and the exact s01 baseline feed two consumers —
    * cached so each computes once. */
  private def annRecall(s: SparkSession, d: String, joined: DataFrame,
      total: Long): DataFrame = {
    import s.implicits._
    val topk = udaf(new TopKCosine(5))
    annRecallRollup(s, d, joined
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"q_emb", $"embedding"))
      .groupBy($"query_id")
      .agg(topk($"cos", $"vec_id").as("nbrs"), count(lit(1)).as("n_scanned")),
      total)
  }

  /** Tail of the recall measurement, shared with the ADC-scored s08
    * probe: joins an `(query_id, nbrs, n_scanned)` approx result against
    * the exact s01 baseline. */
  private def annRecallRollup(s: SparkSession, d: String, approxDf: DataFrame,
      total: Long): DataFrame = {
    import s.implicits._
    graft.dedup.DedupOps.withCache(approxDf) { approx =>
      graft.dedup.DedupOps.withCache(s01_ann_bruteforce(s, d)
          .select($"query_id", $"neighbor_id".as("vec_id"))) { exact =>
        val hits = approx.select($"query_id", explode($"nbrs").as("vec_id"))
          .join(exact, Seq("query_id", "vec_id"), "inner")
          .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
        // left joins: a query whose probed lists held no candidates still
        // counts in the denominator (recall must not silently inflate)
        exact.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
          .join(hits, Seq("query_id"), "left")
          .join(approx.select($"query_id", $"n_scanned"), Seq("query_id"), "left")
          .agg((sum(coalesce($"n_hit", lit(0L))).cast("double") /
            sum($"n_true").cast("double")).as("recall_at_5"),
            (sum(coalesce($"n_scanned", lit(0L))).cast("double") /
              (count(lit(1)) * total).cast("double")).as("scan_fraction"),
            count(lit(1)).as("n_queries"))
      }
    }
  }

  /** s07/s08 ANN index-store registry: one (inverted-list table, coarse
    * codebook, PQ codebooks) per (application, corpus dir) — the
    * similarity twin of d10's signature store. Built once per session;
    * every query run probes the PERSISTED index. */
  private val annStoreRegistry = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Array[(Int, Seq[Float])], Array[Array[Array[Double]]])]()

  /** Corpus-scaled IVF geometry for the persisted store (r6 verdict
    * item 1): k ≈ √N inverted lists keep each list ~√N long — the
    * classical IVF sizing — so with [[ivfNprobe]] ≈ √k probed lists the
    * scan fraction is ~nprobe/k ≈ N^(-1/4): it SHRINKS as the corpus
    * grows, which is the reason IVF exists (a fixed k=16 pinned the
    * fraction at ~37% forever). The 16-list floor keeps tiny corpora
    * away from degenerate 1-member lists. */
  private[graft] def ivfK(n: Long): Int =
    math.max(16L, math.round(math.sqrt(n.toDouble))).min(1 << 20).toInt

  /** nprobe for a k-list store: ≈ √k, floored at the historical 6 so
    * the floor-regime (k=16) probe matches the s04 teaching defaults.
    * Grows N^(1/4) — slower than k — so recall stays useful while the
    * scanned fraction still drops with corpus size. */
  private[graft] def ivfNprobe(k: Int): Int =
    math.max(6, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** Build-once accessor: trains the CORPUS-SCALED coarse codebook
    * (k = [[ivfK]](N), same deterministic Lloyd as s04) AND the s05 PQ
    * codebooks (256-vector sample), then writes the assigned corpus as
    * an inverted-list table BUCKETED BY cid carrying
    * `(vec_id, embedding, cid, code)` — one bucket per cluster, so a
    * probe that names its clusters reads ONLY those buckets (bucket
    * pruning: `SelectedBucketsCount` < total, PlanSpec-pinned). Raw
    * vectors and 16-byte PQ codes live side by side: the s07 probe
    * column-prunes to the raw vectors, the s08 probe to the codes (its
    * scan never reads `embedding` — PlanSpec-pinned), and the s09
    * re-ranker reads both (codes for the scan, raw vectors for the
    * bounded finalist fetch). */
  private[graft] def ensureAnnStore(s: SparkSession, d: String)
      : (String, Array[(Int, Seq[Float])], Array[Array[Array[Double]]]) = {
    val key = s.sparkContext.applicationId + ":" + d
    annStoreRegistry.computeIfAbsent(key, _ => {
      import s.implicits._
      val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        .repartition(s.sparkContext.defaultParallelism)
      // metadata-cheap count (parquet row-group stats) sizes the codebook
      val k = ivfK(Tables.embeddings(s, d).count())
      var centroids: Array[(Int, Seq[Float])] = emb.filter($"vec_id" < k)
        .orderBy($"vec_id").collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Float](1)))
      (1 to 2).foreach { _ => centroids = lloydStep(emb, centroids) }
      val assignU = coarseAssignU(centroids)
      // PQ training identical to s05: the 256 lowest-id NORMALIZED
      // vectors (sample-sized driver collect), 5 local Lloyd iterations
      val sample: Array[Seq[Float]] = emb.filter($"vec_id" < 256)
        .orderBy($"vec_id").collect()
        .map(r => l2normalize(r.getSeq[Float](1)))
      val pqCb = trainPqCodebooks(sample)
      val encodeU = udf { v: Seq[Float] => pqEncode(pqCb, l2normalize(v)) }
      val tbl = "graft_s07_lists_" +
        (scala.util.hashing.MurmurHash3.stringHash(key).toLong & 0xffffffffL)
      emb.withColumn("cid", assignU($"embedding"))
        .withColumn("code", encodeU($"embedding"))
        .write.bucketBy(k, "cid").sortBy("cid")
        .mode("overwrite").saveAsTable(tbl)
      (tbl, centroids, pqCb)
    })
  }

  /** Assign + PQ-encode a batch of NEW vectors against an existing
    * codebook pair — the streaming-ingest half of the s07 store. Purely
    * map-side (both codebooks ride the closure as broadcast-sized
    * arrays), producing rows in the store's exact column layout
    * (vec_id, embedding, cid, code) so an append lands co-located in
    * the bucketed table with zero shuffle of the existing corpus. */
  private[graft] def encodeForStore(batch: DataFrame,
      cb: Array[(Int, Seq[Float])],
      pqCb: Array[Array[Array[Double]]]): DataFrame = {
    val assignU = coarseAssignU(cb)
    val encodeU = udf { v: Seq[Float] => pqEncode(pqCb, l2normalize(v)) }
    batch.withColumn("cid", assignU(col("embedding")))
      .withColumn("code", encodeU(col("embedding")))
      .select(col("vec_id"), col("embedding"), col("cid"), col("code"))
  }

  /** Run `body` with auto-bucketed-scan OFF (save/restore): the planner's
    * heuristic drops bucketed reading when no join exploits the
    * clustering — which also drops BUCKET PRUNING, the thing the s07
    * probe is built on (a broadcast probe join never "exploits"
    * partitioning, so the heuristic would re-read all k buckets). */
  private[graft] def withBucketedScan[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prior)
  }

  /** The probe plan PlanSpec pins: inverted lists filtered to the named
    * clusters (bucket-pruned scan — only nprobe of k buckets are READ;
    * plan under [[withBucketedScan]]) joined to the broadcast query
    * set. No Exchange anywhere: the store side is a pruned co-located
    * scan, the query side is broadcast-sized by construction. */
  private[graft] def storeProbe(s: SparkSession, tbl: String,
      queries: DataFrame, probedCids: Seq[Int]): DataFrame =
    s.table(tbl).filter(col("cid").isin(probedCids: _*))
      .join(broadcast(queries), Seq("cid"))

  /** s07: STORE-BACKED IVF ANN — s04's semantics composed with a
    * persisted index, the d10 pattern applied to similarity search (the
    * production ANN shape: index built offline, queries probe online).
    * The codebook is trained and the corpus assigned ONCE
    * ([[ensureAnnStore]], corpus-scaled k = [[ivfK]](N)); each query run
    * computes its nprobe = [[ivfNprobe]](k) clusters against the k-row
    * codebook, collects the probed cluster ids (a ≤ nprobe·|queries|
    * driver list — iteration-control-sized, not data), and scans ONLY
    * those buckets of the store. Identical probe math to s04 at the same
    * (k, nprobe) ⇒ identical recall/scan-fraction output — the store is
    * layout, not semantics (spec asserts s07 == s04(ivfK, ivfNprobe)
    * row-for-row); steady-state cost drops the per-run training
    * entirely. No SQL oracle (ANN), so rows-only at the gate plus the
    * equality pin. */
  def s07_ann_store(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (tbl, cb, _) = ensureAnnStore(s, d)
    val nprobe = ivfNprobe(cb.length)
    val probeU = udf { v: Seq[Float] =>
      cb.map { case (cid, c) => (cid, cosine(v, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    }
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(probeU($"embedding")).as("cid"))
      .localCheckpoint(true) // tiny (queries×nprobe); probed twice below
    val probedCids = queries.select($"cid").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val total = emb.count()
    // annRecall is eager (withCache checkpoints), so the bucketed-scan
    // override covers the probe's actual execution
    withBucketedScan(s) {
      annRecall(s, d, storeProbe(s, tbl, queries, probedCids), total)
    }
  }

  /** s08: IVF-PQ — the s07 inverted-list store probed over its PQ CODES
    * (the composition s05's scaladoc prescribes; r5 verdict item 2).
    * This is the actual 100 TB ANN memory story: bucket pruning cuts the
    * SCAN to nprobe/k of the corpus (s07's half) and asymmetric-distance
    * scoring over 16-byte codes cuts the BYTES TOUCHED per scanned row
    * 16× (s05's half) — the probe never reads the raw embedding column
    * at all (column pruning on the store scan, PlanSpec-pinned alongside
    * `SelectedBucketsCount` < total). Queries stay full-precision
    * (normalized, so ADC inner product approximates cosine); candidates
    * are scored from codes only and the top-k is reported as recall@5
    * against the exact s01 baseline plus the scanned fraction and
    * compression ratio. No re-rank pass: the reported recall is the
    * honest codes-only quality (a consumer wanting re-ranking reads the
    * store's co-resident raw vectors for the k finalists). Deterministic
    * end-to-end (same coarse Lloyd as s04/s07, same sample-trained PQ as
    * s05) → golden pin; not SQL-expressible → rows-only at the gate. */
  def s08_ann_ivfpq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (tbl, cb, pqCb) = ensureAnnStore(s, d)
    val nprobe = ivfNprobe(cb.length)
    val probeU = udf { v: Seq[Float] =>
      cb.map { case (cid, c) => (cid, cosine(v, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    }
    val normU = udf { v: Seq[Float] => l2normalize(v) }
    val adcU = udf { (q: Seq[Float], code: Array[Byte]) => pqAdc(pqCb, q, code) }
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), normU($"embedding").as("q_v"),
        explode(probeU($"embedding")).as("cid"))
      .localCheckpoint(true) // tiny (queries×nprobe); probed twice below
    val probedCids = queries.select($"cid").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val total = emb.count()
    val topk = udaf(new TopKCosine(5))
    withBucketedScan(s) {
      val approx = s08ProbePlan(s, Seq(tbl), queries, probedCids)
        .filter($"vec_id" =!= $"query_id")
        .withColumn("score", adcU($"q_v", $"code"))
        .groupBy($"query_id")
        .agg(topk($"score", $"vec_id").as("nbrs"), count(lit(1)).as("n_scanned"))
      annRecallRollup(s, d, approx, total)
        .select($"recall_at_5", $"scan_fraction", $"n_queries",
          lit(PqM.toLong).as("code_bytes_per_vector"),
          lit(256L).as("raw_bytes_per_vector"))
    }
  }

  /** s09: IVF-PQ with EXACT RE-RANK — the full production ANN read path:
    * the s08 codes-only ADC scan nominates `rerank` = 50 finalists per
    * query (bucket-pruned, 16 bytes per scanned row), and ONLY those
    * finalists' raw vectors are fetched back from the store for an exact
    * cosine top-5. The raw 256-byte embedding column is read under a
    * pushed `vec_id IN (finalists)` point-lookup — ≤ rerank×|queries|
    * rows (500 here), never the probed buckets' full vector payload —
    * so the bytes story at 100 TB is: codes for the bulk scan, raw
    * vectors only for a bounded finalist set. Recall returns to the
    * exact-over-candidates level (the ADC approximation only has to put
    * a true neighbor anywhere in the top-50, not the top-5); the scan
    * fraction is unchanged from s08 (same inverted lists). The finalist
    * id list is a bounded driver collect (rerank×|queries|,
    * iteration-control-sized — the same discipline as s07's probed-cid
    * list). Deterministic end-to-end → golden pin; not SQL-expressible →
    * rows-only at the gate. */
  def s09_ann_ivfpq_rerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rerank = 50
    val (tbl, cb, pqCb) = ensureAnnStore(s, d)
    val nprobe = ivfNprobe(cb.length)
    val probeU = udf { v: Seq[Float] =>
      cb.map { case (cid, c) => (cid, cosine(v, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    }
    val normU = udf { v: Seq[Float] => l2normalize(v) }
    val adcU = udf { (q: Seq[Float], code: Array[Byte]) => pqAdc(pqCb, q, code) }
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), normU($"embedding").as("q_v"),
        explode(probeU($"embedding")).as("cid"))
      .localCheckpoint(true)
    val probedCids = queries.select($"cid").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val total = emb.count()
    val topkR = udaf(new TopKCosine(rerank))
    val topk5 = udaf(new TopKCosine(5))
    withBucketedScan(s) {
      // stage 1 — codes-only nomination (the exact s08 probe plan)
      val adcTop = s08ProbePlan(s, Seq(tbl), queries, probedCids)
        .filter($"vec_id" =!= $"query_id")
        .withColumn("score", adcU($"q_v", $"code"))
        .groupBy($"query_id")
        .agg(topkR($"score", $"vec_id").as("cands"), count(lit(1)).as("n_scanned"))
        .localCheckpoint(true) // finalist-sized; feeds id-collect + re-rank
      val finalistIds = adcTop.select(explode($"cands").as("vec_id"))
        .distinct().collect().map(_.getLong(0)) // bounded: ≤ rerank×|queries|
      // stage 2 — exact re-rank over the finalists' raw vectors only
      val raw = s.table(tbl).select($"vec_id", $"embedding")
        .filter($"vec_id".isin(finalistIds.toIndexedSeq.map(Long.box): _*))
      val qv = queries.select($"query_id", $"q_v").distinct()
      val exactTop = adcTop.select($"query_id", explode($"cands").as("vec_id"))
        .join(raw, "vec_id")
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"q_v", $"embedding"))
        .groupBy($"query_id").agg(topk5($"cos", $"vec_id").as("nbrs"))
      annRecallRollup(s, d,
        exactTop.join(adcTop.select($"query_id", $"n_scanned"), Seq("query_id")),
        total)
        .select($"recall_at_5", $"scan_fraction", $"n_queries",
          lit(rerank.toLong).as("rerank_depth"),
          lit(PqM.toLong).as("code_bytes_per_vector"))
    }
  }

  /** SERVICE-PRIMITIVE ANN search (r6 stretch): the s07/s08/s09 gate
    * queries draw their query set from the corpus (`vec_id < 10`) so the
    * recall oracle is self-contained; a real consumer brings its OWN
    * vectors. This overload runs the full production read path — coarse
    * probe of nprobe = [[ivfNprobe]](k) lists against the persisted
    * corpus-scaled store, ADC scoring over the 16-byte codes
    * (raw embedding column untouched in the scan), exact re-rank of
    * `rerank` finalists fetched under a pushed `vec_id IN` point-lookup
    * — for a caller-supplied `(query_id: Long,
    * embedding: Array[Float])` DataFrame, returning `(query_id, rank,
    * neighbor_id, cos)` top-`topK` rows per query. Unlike the gate
    * queries there is no self-exclusion: a query identical to a stored
    * vector returns that vector at rank 1 (spec-pinned). The query set
    * is broadcast-sized by contract (it is the SMALL side of a
    * store-probe join — the corpus side stays bucket-pruned and
    * code-projected exactly as in s08/s09). */
  def annSearch(s: SparkSession, d: String, queryVecs: DataFrame,
      topK: Int = 5, rerank: Int = 50): DataFrame = {
    val (tbl, cb, pqCb) = ensureAnnStore(s, d)
    annSearchOn(s, Seq(tbl), cb, pqCb, queryVecs, topK, rerank)
  }

  /** [[annSearch]] against CALLER-NAMED store tables (each in
    * [[ensureAnnStore]]'s layout), read as their UNION — the LSM read
    * shape: a big immutable BASE plus an O(ingested) DELTA of streamed
    * appends (st09). The cid filter pushes through the union into every
    * child scan, so the base keeps its bucket pruning and the delta adds
    * only batch-sized work; the base files are never rewritten. */
  private[graft] def annSearchOn(s: SparkSession, tbls: Seq[String],
      cb: Array[(Int, Seq[Float])], pqCb: Array[Array[Array[Double]]],
      queryVecs: DataFrame, topK: Int = 5, rerank: Int = 50): DataFrame = {
    import s.implicits._
    val nprobe = ivfNprobe(cb.length)
    val probeU = udf { v: Seq[Float] =>
      cb.map { case (cid, c) => (cid, cosine(v, c)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    }
    val normU = udf { v: Seq[Float] => l2normalize(v) }
    val adcU = udf { (q: Seq[Float], code: Array[Byte]) => pqAdc(pqCb, q, code) }
    val queries = queryVecs
      .select($"query_id", normU($"embedding").as("q_v"),
        $"embedding".as("q_emb"), explode(probeU($"embedding")).as("cid"))
      .localCheckpoint(true) // caller query set: broadcast-sized, probed twice
    val probedCids = queries.select($"cid").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val topkR = udaf(new TopKCosine(rerank))
    val topkOut = udaf(new TopKCosineScored(topK))
    withBucketedScan(s) {
      val adcTop = s08ProbePlan(s, tbls,
          queries.select($"query_id", $"q_v", $"cid"), probedCids)
        .withColumn("score", adcU($"q_v", $"code"))
        .groupBy($"query_id")
        .agg(topkR($"score", $"vec_id").as("cands"))
        .localCheckpoint(true) // finalist-sized; feeds id-collect + re-rank
      val finalistIds = adcTop.select(explode($"cands").as("vec_id"))
        .distinct().collect().map(_.getLong(0)) // bounded: ≤ rerank×|queries|
      val raw = tbls.map(t => s.table(t).select($"vec_id", $"embedding"))
        .reduce(_.unionByName(_))
        .filter($"vec_id".isin(finalistIds.toIndexedSeq.map(Long.box): _*))
      val qv = queries.select($"query_id", $"q_emb").distinct()
      adcTop.select($"query_id", explode($"cands").as("vec_id"))
        .join(raw, "vec_id")
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", graft.functions.GraftFunctions.cosine_sim($"q_emb", $"embedding"))
        .groupBy($"query_id").agg(topkOut($"cos", $"vec_id").as("nbrs"))
        .select($"query_id", posexplode($"nbrs").as(Seq("pos", "nbr")))
        .select($"query_id", ($"pos" + 1).as("rank"),
          $"nbr._2".as("neighbor_id"), $"nbr._1".as("cos"))
        .orderBy($"query_id", $"rank")
    }
  }

  /** The s08/s09 candidate probe: codes selected BEFORE the join so the
    * store scan's ReadSchema carries (vec_id, cid, code) and never the
    * raw embedding column. This is the SAME construction the operators
    * execute AND the one PlanSpec pins — one definition, so a plan
    * regression cannot hide behind a drifted copy. */
  private[graft] def s08ProbePlan(s: SparkSession, tbls: Seq[String],
      queries: DataFrame, probedCids: Seq[Int]): DataFrame = {
    import s.implicits._
    // multiple tables = base ∪ delta (st09); the cid predicate pushes
    // through the union so each child scan stays bucket-pruned
    tbls.map(t => s.table(t).select($"vec_id", $"cid", $"code"))
      .reduce(_.unionByName(_))
      .filter($"cid".isin(probedCids: _*))
      .join(broadcast(queries), Seq("cid"))
  }

  /** s05: product-quantization ANN (the PQ half of IVF-PQ) — the MEMORY
    * scale path: each 64-dim f32 vector (256 bytes) is compressed to
    * m = 16 one-byte codes (16×), and queries scan the CODES with
    * asymmetric distance computation — per (query, subspace) the dot
    * products against the 16 subspace centroids replace any touch of the
    * raw vectors. At 100 TB this is what lets the candidate scan live in
    * memory; compose with s04's inverted lists for IVF-PQ proper.
    *
    * Codebooks are trained on a deterministic SAMPLE (the 256 lowest-id
    * normalized vectors) with five local Lloyd iterations per subspace —
    * the sample-based training the s04 note prescribes at scale; only
    * the sample ever reaches the driver. Vectors are L2-normalized first
    * so inner product equals cosine and the recall is measured against
    * the exact s01 baseline. Deterministic end-to-end (seedless: sample +
    * fixed iterations + lowest-index argmin ties) → spec-pinned.
    * (This corpus is near-uniform — PQ's hardest case, same caveat as
    * s04; real embedding corpora cluster and quantize far better.) */
  // PQ geometry shared by s05 (standalone PQ) and s08 (IVF-PQ): 16
  // subspaces × 4 dims, 16 centroids per subspace ⇒ 16 code bytes per
  // 256-byte vector (16× compression)
  private[graft] val PqM = 16
  private[graft] val PqSub = 4
  private[graft] val PqKs = 16

  private[graft] def l2normalize(v: Seq[Float]): Seq[Float] = {
    val n = math.sqrt(v.iterator.map(x => x.toDouble * x).sum)
    if (n == 0) v else v.map(x => (x / n).toFloat)
  }

  /** Per-subspace PQ codebooks from a (driver-side, sample-sized) set of
    * normalized vectors: 5 local Lloyd iterations, lowest-index argmin
    * ties — deterministic, seedless (extracted verbatim from s05 so the
    * s05 pin is untouched). */
  private[graft] def trainPqCodebooks(
      sample: Array[Seq[Float]]): Array[Array[Array[Double]]] = {
    val m = PqM; val sub = PqSub; val ks = PqKs
    Array.tabulate(m) { mi =>
      var cents = Array.tabulate(ks)(c =>
        sample(c).slice(mi * sub, mi * sub + sub).map(_.toDouble).toArray)
      for (_ <- 1 to 5) {
        val sums = Array.fill(ks, sub)(0.0)
        val counts = Array.fill(ks)(0)
        sample.foreach { v =>
          val x = v.slice(mi * sub, mi * sub + sub).map(_.toDouble).toArray
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            var dd = 0.0
            var i = 0
            while (i < sub) { val df = x(i) - cents(c)(i); dd += df * df; i += 1 }
            if (dd < bestD) { bestD = dd; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += x(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  /** Nearest-centroid code per subspace for a NORMALIZED vector. */
  private[graft] def pqEncode(cb: Array[Array[Array[Double]]],
      v: Seq[Float]): Array[Byte] = {
    val m = PqM; val sub = PqSub; val ks = PqKs
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var dd = 0.0
        var i = 0
        while (i < sub) {
          val df = v(mi * sub + i).toDouble - cb(mi)(c)(i)
          dd += df * df
          i += 1
        }
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Asymmetric distance: full-precision query dotted against the code's
    * reconstruction — per row only m centroid lookups, never the raw
    * corpus vector. */
  private[graft] def pqAdc(cb: Array[Array[Array[Double]]],
      q: Seq[Float], code: Array[Byte]): Double = {
    val m = PqM; val sub = PqSub
    var sc = 0.0
    var mi = 0
    while (mi < m) {
      val cent = cb(mi)(code(mi) & 0xff)
      var i = 0
      while (i < sub) { sc += q(mi * sub + i).toDouble * cent(i); i += 1 }
      mi += 1
    }
    sc
  }

  def s05_ann_pq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = PqM
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    val normU = udf { v: Seq[Float] => l2normalize(v) }
    val nv = emb.select($"vec_id", normU($"embedding").as("v"))
    val sample: Array[Seq[Float]] = nv.filter($"vec_id" < 256).orderBy($"vec_id")
      .collect().map(_.getSeq[Float](1))
    val cb = trainPqCodebooks(sample)
    val encodeU = udf { v: Seq[Float] => pqEncode(cb, v) }
    // asymmetric distance: the query side stays full-precision, the
    // corpus side is 8 code bytes — the only per-row work is m table rows
    val adcU = udf { (q: Seq[Float], code: Array[Byte]) => pqAdc(cb, q, code) }
    val topk = udaf(new TopKCosine(5))
    graft.dedup.DedupOps.withCache(nv) { nvc =>
      val codes = nvc.select($"vec_id", encodeU($"v").as("code"))
      val queries = nvc.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("q_v"))
      val approx = codes.crossJoin(broadcast(queries))
        .filter($"vec_id" =!= $"query_id")
        .withColumn("score", adcU($"q_v", $"code"))
        .groupBy($"query_id").agg(topk($"score", $"vec_id").as("nbrs"))
      graft.dedup.DedupOps.withCache(s01_ann_bruteforce(s, d)
          .select($"query_id", $"neighbor_id".as("vec_id"))) { exact =>
        val hits = approx.select($"query_id", explode($"nbrs").as("vec_id"))
          .join(exact, Seq("query_id", "vec_id"), "inner")
          .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
        exact.groupBy($"query_id").agg(count(lit(1)).as("n_true"))
          .join(hits, Seq("query_id"), "left")
          .agg((sum(coalesce($"n_hit", lit(0L))).cast("double") /
            sum($"n_true").cast("double")).as("recall_at_5"),
            count(lit(1)).as("n_queries"))
          .select($"recall_at_5", $"n_queries",
            lit(m.toLong).as("code_bytes_per_vector"),
            lit(256L).as("raw_bytes_per_vector"))
      }
    }
  }

  /** s06: SEMANTIC dedup (the SemDeDup shape, Abbas et al. 2023): rather
    * than pairing documents by surface text (d02/d04) or by LSH buckets
    * (s02), cluster the embedding space with k-means and compare pairs
    * ONLY within a cluster — the clusters bound the quadratic exactly
    * where near-duplicates concentrate. Any vector with a ≥0.9-cosine
    * neighbor of smaller id in its cluster is dropped (min-id keeper,
    * the same greedy the dedup family uses). Planted near-identical
    * copies (`withNearDups`, cosine ≈ 0.999) give ground truth:
    * a planted pair is only FOUND if both halves land in the same
    * cluster, so `n_planted_split` — planted pairs not found — is
    * reported instead of silently missed. Its causes are the quantizer
    * separating the pair AND, for clusters over the cap, the star
    * fallback suppressing non-representative pairs (at the sf gates
    * every cluster is far under the cap, so the pin's 6 splits are
    * purely quantizer).
    *
    * Training mirrors s04's deterministic fixed-point Lloyd (k seed
    * vectors by lowest id, 2 iterations, 2^-32-quantized component sums
    * so shuffle merge order can't flip an argmin): only k centroid rows
    * ever reach the driver; assignment is map-side over the broadcast
    * codebook; the within-cluster compare is CLUSTER-LOCAL (see the
    * inline note) with the same cap contract as `guardedBucketPairs`
    * — over the cap a cluster degrades to star-shaped rep comparison,
    * O(N), never quadratic. Cluster population is ~N/k, so at
    * production scale k must grow with the corpus (k ≈ N/⟨target
    * cluster size⟩ — it is a parameter for exactly that reason;
    * SemDeDup itself prescribes corpus-scaled k) to keep clusters
    * under the cap and the pairing exact.
    * No SQL oracle (k-means is not SQL-expressible) — deterministic
    * end-to-end, pinned in DedupGuardSpec like s04/s05. */
  def s06_semantic_dedup(s: SparkSession, d: String): DataFrame = {
    // corpus-scaled k (SemDeDup's own prescription; r5 verdict): clusters
    // average n/k members, so a FIXED k at 100× corpus puts every cluster
    // over the 1000-member cap and the whole compare degrades to star
    // pairs. One metadata-cheap count (parquet row-group stats) sizes k;
    // ×2 accounts for the planted-copy union. At the test SFs (≤4000
    // union vectors) this resolves to the historical k=16, so the
    // deterministic pins are untouched; at sf1+ it grows.
    val n = 2L * Tables.embeddings(s, d).count()
    s06_semantic_dedup(s, d, adaptiveK(n))
  }

  /** k for [[s06_semantic_dedup]]: target ~500-member clusters (half the
    * 1000-member compare cap, headroom for skew above the mean). */
  private[graft] def adaptiveK(n: Long): Int =
    math.max(16L, n / 500L).min(Int.MaxValue).toInt

  def s06_semantic_dedup(s: SparkSession, d: String, k: Int): DataFrame =
    s06Impl(s, d, k,
      s.sparkContext.longAccumulator("graft_s06_star_overflow"))

  /** Train the deterministic k-centroid codebook on a (persisted)
    * corpus frame (seed = the k lowest-id BASE vectors, 2 fixed-point
    * Lloyd iterations) and return the frame with the map-side `cid`
    * assignment column — the shared front half of s06 and s10. */
  private[sim] def trainAndAssign(s: SparkSession, d: String, k: Int,
      emb: DataFrame): DataFrame = {
    import s.implicits._
    var centroids: Array[(Int, Seq[Float])] = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding").filter($"vec_id" < k)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1)))
    (1 to 2).foreach { _ => centroids = lloydStep(emb, centroids) }
    emb.withColumn("cid", coarseAssignU(centroids)($"embedding"))
  }

  /** [[s06_semantic_dedup]] with a caller-supplied overflow accumulator —
    * lets the flooded-corpus spec OBSERVE star-fallback degradation (the
    * thing [[adaptiveK]] exists to prevent) instead of grepping logs. */
  private[graft] def s06Impl(s: SparkSession, d: String, k: Int,
      overflow: org.apache.spark.util.LongAccumulator): DataFrame = {
    import s.implicits._
    // the union subtree (read + perturb UDF) feeds two Lloyd passes, the
    // final assignment, and the compare — persist it for the duration
    val emb = withNearDups(s, d).persist()
    val out = graft.dedup.DedupOps.withCache(
        trainAndAssign(s, d, k, emb)) { assigned =>
      val pairs = clusterLocalPairs(assigned, cap = 1000, minCos = 0.9, overflow)
      // id_a < id_b everywhere ⇒ every id_b has a smaller-id near-dup
      val dropped = pairs.select($"id_b".as("vec_id")).distinct()
      val sameCluster = pairs
        .filter($"id_b" === $"id_a" + Shift)
        .agg(count(lit(1)).as("n_planted_found"))
      assigned.agg(count(lit(1)).as("n_vectors"),
          countDistinct($"cid").as("n_clusters_used"))
        .crossJoin(dropped.agg(count(lit(1)).as("n_dropped"),
          coalesce(sum($"vec_id"), lit(0L)).as("dropped_id_sum")))
        .crossJoin(sameCluster)
        .select($"n_vectors", $"n_clusters_used", $"n_dropped",
          ($"n_vectors" - $"n_dropped").as("n_kept"),
          $"n_planted_found",
          // planted total = half the union (one copy per base vector)
          (expr("n_vectors div 2") - $"n_planted_found").as("n_planted_split"),
          $"dropped_id_sum")
    }
    emb.unpersist(false) // withCache materialized out; drop the union cache
    // withCache materialized the result above, so the accumulator is
    // final — surface star-linked degradation instead of silently
    // narrowing pair coverage (the repo's no-silent-truncation rule;
    // same contract as the LSH bucket-guard listener)
    if (overflow.value > 0)
      log.warn(s"s06 semantic dedup: ${overflow.value} member(s) of over-cap " +
        "cluster(s) star-linked to their min-id representative instead of " +
        "all-pairs comparison (cluster connectivity preserved; raise k to " +
        "keep clusters under the cap)")
    out
  }

  /** Cluster-local near-dup pairs: each cluster's members are compared
    * WITHIN their shuffle partition — the corpus embeddings move exactly
    * once (one hash repartition on cid ≈ corpus bytes), never a pair-list
    * joined back to the vector table, which would shuffle an embedding
    * payload per PAIR (≈ cap×corpus bytes worst-case; measured 1.6 GB at
    * sf0.1 for 2.5 MB of vectors, r3).
    *
    * Task MEMORY is O(cap), not O(largest cluster): rows arrive sorted by
    * (cid, vec_id) — `sortWithinPartitions`, same shuffle the grouping
    * needs anyway — and each cluster run is STREAMED: members buffer only
    * until the cap is crossed, at which point the run degrades to the
    * star fallback — every member pairs with the cluster's min-id
    * representative (the run's FIRST row, thanks to the sort), O(N)
    * compute and O(cap) memory, which still connects the whole near-dup
    * cluster through the representative. (The r4 shape materialized and
    * sorted the entire cluster before the cap check, so a degenerate
    * all-identical corpus — the exact flood case the cap exists for —
    * risked executor OOM with only compute star-bounded.) Star-linked
    * members are counted into `overflow` in-flight; the caller logs
    * after its action. Emitted pairs are (smaller, larger) id. */
  private[graft] def clusterLocalPairs(assigned: DataFrame, cap: Int,
      minCos: Double, overflow: org.apache.spark.util.LongAccumulator): DataFrame = {
    val sp = assigned.sparkSession
    import sp.implicits._
    assigned.select($"cid", $"vec_id", $"embedding")
      .as[(Int, Long, Seq[Float])]
      .repartition($"cid")
      .sortWithinPartitions($"cid", $"vec_id")
      .mapPartitions { rows =>
        val b = rows.buffered
        def processRun(run: Iterator[(Long, Array[Float])]): Iterator[(Long, Long)] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
          while (run.hasNext && buf.length <= cap) buf += run.next()
          if (buf.length <= cap)
            // whole cluster fits: exact all-pairs (ids ascending ⇒ ordered)
            for {
              i <- buf.indices.iterator
              j <- (i + 1) until buf.length
              if cosineArr(buf(i)._2, buf(j)._2) >= minCos
            } yield (buf(i)._1, buf(j)._1)
          else {
            val rep = buf.head
            overflow.add(buf.length - 1)
            (buf.iterator.drop(1) ++ run.map { e => overflow.add(1); e })
              .filter(m => cosineArr(rep._2, m._2) >= minCos)
              .map(m => (rep._1, m._1))
          }
        }
        // one sub-iterator per consecutive (cid) run; flatten fully
        // consumes each run before the next begins, so the shared
        // buffered cursor advances correctly
        new Iterator[Iterator[(Long, Long)]] {
          def hasNext: Boolean = b.hasNext
          def next(): Iterator[(Long, Long)] = {
            val cid = b.head._1
            processRun(new Iterator[(Long, Array[Float])] {
              def hasNext: Boolean = b.hasNext && b.head._1 == cid
              def next(): (Long, Array[Float]) = { val e = b.next(); (e._2, e._3.toArray) }
            })
          }
        }.flatten
      }
      .toDF("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s06_semantic_dedup" -> ((s: SparkSession, d: String) => s06_semantic_dedup(s, d)),
    "s01_ann_bruteforce" -> (s01_ann_bruteforce _),
    "s02_embedding_neardup" -> (s02_embedding_neardup _),
    "s03_ann_lsh_recall" -> (s03_ann_lsh_recall _),
    "s04_ann_ivf" -> ((s: SparkSession, d: String) => s04_ann_ivf(s, d)),
    "s05_ann_pq" -> (s05_ann_pq _),
    "s07_ann_store" -> (s07_ann_store _),
    "s08_ann_ivfpq" -> (s08_ann_ivfpq _),
    "s09_ann_ivfpq_rerank" -> (s09_ann_ivfpq_rerank _),
  )

  val oracle: Map[String, String] = Map(
    "s01_ann_bruteforce" -> s01Oracle,
    "s02_embedding_neardup" -> s02Oracle,
  )
}
