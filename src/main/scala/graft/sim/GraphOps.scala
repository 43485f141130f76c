package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Embedding-graph operators: the k-NN graph over the corpus — the
  * substrate for graph-based near-dup clustering, diversity sampling,
  * and connectivity analysis of an embedding space (the structure
  * SemDeDup-style pipelines consume after clustering).
  */
object GraphOps {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.sim")

  /** s10: cluster-local k-NN GRAPH — every vector's top-`knn` cosine
    * neighbors WITHIN its k-means cluster (the s06 quantizer reused as
    * the candidate bound: at 100 TB an exact all-pairs k-NN graph is
    * O(N²); restricting edges to the cluster makes the cost
    * Σ|cluster|², which [[SemanticDedup.adaptiveK]] keeps ≈ N×⟨cluster⟩
    * — linear at fixed target cluster size, the same contract s06
    * certifies). The corpus moves ONCE (one hash repartition on cid);
    * task memory is O(cap) via the same streamed-run device as s06's
    * compare: members past the 1000-member cap get their neighbors from
    * the first-cap members only (degraded coverage, counted into the
    * overflow accumulator and logged — never silent).
    *
    * Output: graph-level stats — nodes, edges (out-degree ≤ knn; less
    * in clusters smaller than knn+1), mutual edges (both directions
    * present — the symmetrized graph real consumers use), and how many
    * PLANTED near-identical pairs ([[SimilarityOps.withNearDups]],
    * cosine ≈ 0.999) appear as mutual top-1 edges — ground truth that
    * the graph puts strongest-similarity mass where it belongs.
    * Deterministic (fixed-point Lloyd + id-ascending tie-break) →
    * golden pin, and oracle-checked since r10 ([[s10Oracle]] unrolls
    * the fixed Lloyd rounds in SQL). */
  def s10_knn_graph(s: SparkSession, d: String): DataFrame = {
    val n = 2L * Tables.embeddings(s, d).count()
    s10Impl(s, d, SemanticDedup.adaptiveK(n),
      s.sparkContext.longAccumulator("graft_s10_overflow"))
  }

  private[graft] def s10Impl(s: SparkSession, d: String, k: Int,
      overflow: org.apache.spark.util.LongAccumulator): DataFrame = {
    import s.implicits._
    val knn = 5
    val emb = SimilarityOps.withNearDups(s, d).persist()
    val out = graft.dedup.DedupOps.withCache(
        SemanticDedup.trainAndAssign(s, d, k, emb)) { assigned =>
      val edges = clusterKnnEdges(assigned, knn, cap = 1000, overflow)
      graft.dedup.DedupOps.withCache(edges) { e =>
        // mutual edges: (src,dst) whose reverse also exists — one
        // self-join on the (already small) edge list
        val mutual = e.as("a").join(e.as("b"),
            $"a.src" === $"b.dst" && $"a.dst" === $"b.src")
          .filter($"a.src" < $"a.dst")
          .select($"a.src", $"a.dst", $"a.rank".as("rank_fwd"),
            $"b.rank".as("rank_rev"))
        val planted = mutual
          .filter($"dst" === $"src" + SimilarityOps.Shift &&
            $"rank_fwd" === 1 && $"rank_rev" === 1)
          .agg(count(lit(1)).as("n_planted_mutual_top1"))
        assigned.agg(count(lit(1)).as("n_nodes"),
            countDistinct($"cid").as("n_clusters"))
          .crossJoin(e.agg(count(lit(1)).as("n_edges")))
          .crossJoin(mutual.agg(count(lit(1)).as("n_mutual_pairs")))
          .crossJoin(planted)
          .select($"n_nodes", $"n_clusters", $"n_edges", $"n_mutual_pairs",
            $"n_planted_mutual_top1",
            (expr("n_nodes div 2") - $"n_planted_mutual_top1")
              .as("n_planted_not_top1"))
      }
    }
    emb.unpersist(false)
    if (overflow.value > 0)
      log.warn(s"s10 knn graph: ${overflow.value} member(s) of over-cap " +
        "cluster(s) drew neighbors from the cluster's buffered cap+1 " +
        "prefix only (coverage degraded, not silent; raise k)")
    out
  }

  /** Directed k-NN edges `(src, dst, rank)` per cluster, rank 1 =
    * nearest. Same streamed-run shape as s06's compare: rows arrive
    * sorted by (cid, vec_id); a run buffers at most `cap` + 1 members
    * (the +1th is what detects the overflow, matching
    * `clusterLocalPairs`). Each buffered member scores against all
    * buffered members (ids ascending, ties to the smaller id); members
    * past the buffer score against the buffered prefix only and are
    * counted into `overflow`. */
  private[graft] def clusterKnnEdges(assigned: DataFrame, knn: Int, cap: Int,
      overflow: org.apache.spark.util.LongAccumulator): DataFrame = {
    val sp = assigned.sparkSession
    import sp.implicits._
    assigned.select($"cid", $"vec_id", $"embedding")
      .as[(Int, Long, Seq[Float])]
      .repartition($"cid")
      .sortWithinPartitions($"cid", $"vec_id")
      .mapPartitions { rows =>
        val b = rows.buffered
        def topkOf(id: Long, v: Array[Float],
            others: scala.collection.IndexedSeq[(Long, Array[Float])])
            : Iterator[(Long, Long, Int)] = {
          // bounded selection: same (score desc, id asc) rule as
          // TopKCosine, on the same qCosKey-quantized compare key (so
          // the SQL replay's quantized rank can't diverge by an ulp)
          var best = List.empty[(Long, Long)] // ascending-worst-first kept sorted
          others.foreach { case (oid, ov) =>
            if (oid != id) {
              val c = SimilarityOps.qCosKey(SimilarityOps.cosineArr(v, ov))
              val cand = (c, oid)
              def better(a: (Long, Long), x: (Long, Long)) =
                a._1 > x._1 || (a._1 == x._1 && a._2 < x._2)
              if (best.length < knn) best = (cand :: best).sortWith(better)
              else if (better(cand, best.last)) best = (cand :: best.init).sortWith(better)
            }
          }
          best.iterator.zipWithIndex.map { case ((_, oid), i) => (id, oid, i + 1) }
        }
        def processRun(run: Iterator[(Long, Array[Float])]): Iterator[(Long, Long, Int)] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
          while (run.hasNext && buf.length <= cap) buf += run.next()
          val inCap = buf.iterator.flatMap { case (id, v) => topkOf(id, v, buf) }
          val past = run.flatMap { case (id, v) =>
            overflow.add(1); topkOf(id, v, buf)
          }
          inCap ++ past
        }
        new Iterator[Iterator[(Long, Long, Int)]] {
          def hasNext: Boolean = b.hasNext
          def next(): Iterator[(Long, Long, Int)] = {
            val cid = b.head._1
            processRun(new Iterator[(Long, Array[Float])] {
              def hasNext: Boolean = b.hasNext && b.head._1 == cid
              def next(): (Long, Array[Float]) = { val e = b.next(); (e._2, e._3.toArray) }
            })
          }
        }.flatten
      }
      .toDF("src", "dst", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_knn_graph" -> (s10_knn_graph _),
  )

  /** The k-NN graph replayed in SQL (oracle-checked since r10): planted
    * union + deterministic Lloyd (shared CTes), per-node top-5 within
    * the cluster ranked exactly like the streamed selection ((cos DESC,
    * id ASC) — [[clusterKnnEdges]]' `better`), mutual-edge self-join,
    * planted-top-1 rollup. Replays the under-cap semantics (see
    * [[SemanticDedup.s06Oracle]]'s note — identical cap story). */
  val s10Oracle: String =
    s"""WITH ${SimilarityOps.nearDupsSqlCtes},
       |${SimilarityOps.lloydSqlChain(SimilarityOps.adaptiveKSql, "base")},
       |edges AS (
       |  SELECT src, dst, rank FROM (
       |    SELECT a.vec_id AS src, b.vec_id AS dst,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
       |        ${SimilarityOps.qCosFoldSql("ea.embedding", "eb.embedding")} DESC,
       |        b.vec_id) AS rank
       |    FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id <> b.vec_id
       |    JOIN emb ea ON ea.vec_id = a.vec_id
       |    JOIN emb eb ON eb.vec_id = b.vec_id)
       |  WHERE rank <= 5),
       |mutual AS (
       |  SELECT a.src, a.dst, a.rank AS rank_fwd, b.rank AS rank_rev
       |  FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src
       |  WHERE a.src < a.dst)
       |SELECT
       |  (SELECT COUNT(*) FROM emb) AS n_nodes,
       |  (SELECT COUNT(DISTINCT cid) FROM a3) AS n_clusters,
       |  (SELECT COUNT(*) FROM edges) AS n_edges,
       |  (SELECT COUNT(*) FROM mutual) AS n_mutual_pairs,
       |  (SELECT COUNT(*) FROM mutual
       |     WHERE dst = src + 100000 AND rank_fwd = 1 AND rank_rev = 1)
       |    AS n_planted_mutual_top1,
       |  (SELECT COUNT(*) FROM emb) // 2 -
       |    (SELECT COUNT(*) FROM mutual
       |     WHERE dst = src + 100000 AND rank_fwd = 1 AND rank_rev = 1)
       |    AS n_planted_not_top1""".stripMargin

  val oracle: Map[String, String] = Map(
    "s10_knn_graph" -> s10Oracle,
  )
}
