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
  * Scale shape (100 TB posture): the working frame carries a RUNNING
  * min-distance column (quantized to 2^-32 fixed point, so the argmax
  * order (dist desc, vec_id) compares exact longs), updated each round
  * against only the single newest center and eagerly re-materialized
  * (plan-truncating localCheckpoint — the d06/w08 lineage rule for
  * iterative updates), followed by a 1-row argmax collect — the
  * iteration-control discipline: driver data is bounded by the
  * selection budget T, never the corpus. Each picked row leaves the
  * working frame, so a vector can never be selected twice even when
  * every remaining min-distance quantizes to 0 (duplicate-saturated
  * corpora). Cost is O(T · corpus) distance evaluations — one per
  * vector per round, the known lower bound for exact greedy; for
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

    // distance to ONE center, quantized: floor(K·x) is monotone, so the
    // running min over per-center quantized distances equals quantizing
    // the exact min — the comparison key stays an exact long and
    // shuffle/merge order cannot flip a near-tie
    def distQ(c: Array[Float]) = udf { v: Seq[Float] =>
      math.floor((1.0 - SimilarityOps.cosineArr(v.toArray, c)) *
        4294967296.0).toLong
    }

    val seedRow = emb.orderBy($"vec_id").limit(1).collect()(0)
    val seedId = seedRow.getLong(0)
    val seedVec = seedRow.getSeq[Float](1).toArray
    var picks = Vector[(Long, Long)]((seedId, -1L))

    // working frame: survivors only, with the running min-distance to
    // the selected set. Each round's update is materialized with an
    // EAGER localCheckpoint, which truncates the logical plan to the
    // checkpointed RDD — without it the lineage nests one
    // Filter+Project layer per round and Catalyst's constraint
    // propagation over the ~T-deep alias chain goes combinatorial
    // (observed: the driver pinned in analysis for minutes at T = 32
    // on 500 rows). Checkpointed blocks are reference-tracked and
    // reclaimed when the previous round's frame drops out of scope;
    // the materializing pass is also the round's one corpus scan and
    // one distance evaluation per vector.
    var work = emb.filter($"vec_id" =!= seedId)
      .select($"vec_id", $"embedding", distQ(seedVec)($"embedding").as("mind"))
      .localCheckpoint(true)
    var done = false
    for (_ <- 2 to T if !done) {
      val top = work.orderBy($"mind".desc, $"vec_id").limit(1).collect()
      if (top.isEmpty) done = true // corpus smaller than the budget
      else {
        val pick = top(0)
        picks :+= ((pick.getLong(0), pick.getLong(2)))
        val newest = pick.getSeq[Float](1).toArray
        work = work.filter($"vec_id" =!= pick.getLong(0))
          .select($"vec_id", $"embedding",
            least($"mind", distQ(newest)($"embedding")).as("mind"))
          .localCheckpoint(true)
      }
    }
    s.createDataFrame(picks.zipWithIndex.map { case ((id, fp), i) =>
      (i + 1, id, fp)
    }).toDF("rank", "vec_id", "min_dist_fp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s11_coreset_select" -> (s11_coreset_select _))

  val oracle: Map[String, String] = Map.empty
}
