package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables

/** Embedding-space DATA SELECTION — the curation stage after dedup and
  * quality gating: pick a small, maximally-diverse subset of the corpus
  * (coreset) for annotation budgets, eval-set seeding, or
  * diversity-balanced training mixes.
  *
  * s11 implements k-center greedy (farthest-point traversal), the
  * classical 2-approximation to the k-center objective and the standard
  * coreset baseline in active-learning/data-selection literature: seed
  * with the lowest-id vector, then repeatedly add the point FARTHEST
  * (max-min cosine distance) from the selected set.
  *
  * Scale shape (100 TB posture): each of the T−1 picks is one map-side
  * pass (min-distance against the ≤ T-entry broadcast center list,
  * quantized to 2^-32 fixed point BEFORE the argmax so the total order
  * (dist desc, vec_id) is exact) ending in a 1-row argmax collect — the
  * d06/w08/t11 iteration-control discipline: driver data is bounded by
  * the selection budget T, never the corpus. Cost is O(T · corpus)
  * distance evaluations, the known lower bound for exact greedy; for
  * budgets where T passes are too many, the production variant runs
  * cluster-local greedy inside the s06 k-means partitions (same device
  * as s10) and merges per-cluster picks — the exact global greedy here
  * is the auditable reference. Not SQL-expressible (T-deep sequential
  * argmax recurrence) → rows-only at the gate + deterministic pins
  * (seedless: lowest-id seed, quantized dists, id tie-break). */
object SelectOps {

  /** s11: k-center greedy coreset of T = 32 vectors. One row per pick:
    * rank, vec_id, and the (2^-32-quantized) min distance to the
    * previously selected set at pick time — the pick sequence's
    * distances are non-increasing (adding centers only shrinks
    * min-distances), which the spec asserts. The seed row carries the
    * sentinel -1 (no prior set). */
  def s11_coreset_select(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val T = 32
    val emb = Tables.embeddings(s, d).select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    graft.dedup.DedupOps.withCache(emb) { e =>
      val seed = e.orderBy($"vec_id").limit(1).collect()(0)
      var centers = Vector[(Long, Array[Float], Long)](
        (seed.getLong(0), seed.getSeq[Float](1).toArray, -1L))
      for (_ <- 2 to T) {
        val cArr = centers.map(_._2)
        val mindU = udf { v: Seq[Float] =>
          val va = v.toArray
          var m = Double.MaxValue
          cArr.foreach { c =>
            val dd = 1.0 - SimilarityOps.cosineArr(va, c)
            if (dd < m) m = dd
          }
          // quantize BEFORE the argmax: the comparison key is an exact
          // long, so shuffle/merge order cannot flip a near-tie
          math.floor(m * 4294967296.0).toLong
        }
        val pick = e.select($"vec_id", $"embedding", mindU($"embedding").as("mind"))
          .orderBy($"mind".desc, $"vec_id").limit(1).collect()(0)
        centers :+= ((pick.getLong(0), pick.getSeq[Float](1).toArray,
          pick.getLong(2)))
      }
      s.createDataFrame(centers.zipWithIndex.map { case ((id, _, fp), i) =>
        (i + 1, id, fp)
      }).toDF("rank", "vec_id", "min_dist_fp")
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s11_coreset_select" -> (s11_coreset_select _))

  val oracle: Map[String, String] = Map.empty
}
