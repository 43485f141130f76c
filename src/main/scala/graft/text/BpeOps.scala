package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Tables
import TextOps._

/** BPE vocabulary learning / encoding and sequence packing
  * (t11/t14/t12), split out of TextOps (r9 verdict item 4: per-family
  * files, unchanged names and semantics). t12 packs the token counts
  * t14's encoder produces, so the three share this file. */
object BpeOps {

  /** Apply a learned merge list to a word — standard greedy BPE apply:
    * symbols start as single characters (no end-of-word marker — kept
    * simple and documented), each merge rewrites left-to-right. */
  def bpeSymbols(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          buf += (l + r); i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.result()
    }
    syms
  }

  /** t11: corpus BPE VOCABULARY INDUCTION — the byte-pair-merge loop
    * every tokenizer build runs, expressed map-reduce style: the corpus
    * collapses ONCE to a (word, freq) vocabulary table (one shuffle —
    * after this no iteration ever touches corpus-sized data), then each
    * merge round re-symbolizes the vocabulary under the merges learned
    * so far (map-side UDF over the tiny driver-held merge list),
    * explodes adjacent symbol pairs weighted by word frequency, and
    * accepts a BATCH of top count pairs (ties broken lexicographically,
    * symbol-disjoint within the round — see [[learnBpeMerges]] — so the
    * learned vocabulary is deterministic and round-trips scale as
    * target/batch, not target). 128 merges are learned (or fewer if the
    * corpus exhausts first — every word fused to one symbol). The
    * driver loop is iteration control exactly like d06/w08 — one keyed
    * aggregation per round, one bounded candidate collect per round.
    * Oracle-checked since r10 (see [[t11Oracle]]: wrapped-symbol
    * strings + list_reduce merge folds + unrolled rounds with tiny
    * per-round greedy recursions); the DedupGuardSpec golden pin
    * stays. */
  /** The corpus (word, freq) vocabulary table t11/t14 iterate over. */
  private def bpeVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(whitespaceTokens(lower($"text"))).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("freq"))
  }

  /** The t11 merge-learning loop over a CACHED vocabulary frame, BATCHED
    * (r6 verdict item 5): classic sequential BPE needs one driver
    * round-trip per merge — ~32k Spark jobs at a realistic vocab size.
    * Each round here computes pair counts ONCE and greedily accepts up
    * to `batchM` pairs in (count desc, l, r) order whose symbol sets are
    * pairwise DISJOINT within the round (neither side nor the merged
    * string of an accepted pair may appear in a later acceptance).
    * Disjoint merges commute and cannot create or destroy each other's
    * adjacencies — fusing (c,d) leaves one symbol between any a,b pair,
    * so their counts stay exact under any application order — making
    * each round's picks identical to running those merges sequentially;
    * a pair sharing a symbol is deferred to the next round, where its
    * count is recomputed post-merge. This is the standard batching of
    * scalable BPE trainers: same determinism (total order on
    * (cnt, l, r)), driver round-trips drop from `target` to
    * `target/batch` (~8 per round at character level, more as the
    * symbol alphabet grows). The candidate pool per round is a bounded
    * `4 × batchM`-row collect — iteration control, not data. Returns
    * the picked rows (rank, l, r, merged, count); the merge list is
    * `_2`/`_3`. */
  private def learnBpeMerges(w: DataFrame, target: Int, batchM: Int = 32)
      : Vector[(Int, String, String, String, Long)] = {
    val sp = w.sparkSession
    import sp.implicits._
    var merges = Vector.empty[(String, String)]
    val picked = Vector.newBuilder[(Int, String, String, String, Long)]
    var k = 1
    var exhausted = false
    while (k <= target && !exhausted) {
      val m = merges
      val symU = udf { word: String => bpeSymbols(word, m) }
      val top = w.select($"freq", symU($"word").as("syms"))
        .select($"freq", explode(when(size($"syms") >= 2,
          expr("transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i-1] AS l, syms[i] AS r))"))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(4 * batchM).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        var taken = 0
        val it = top.iterator
        while (it.hasNext && taken < batchM && k <= target) {
          val row = it.next()
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          // the merged string is reserved too: a later pair whose side
          // string-equals l+r would also match the instances this merge
          // CREATES, invalidating its pre-batch count
          if (!used(l) && !used(r) && !used(l + r)) {
            used += l; used += r; used += (l + r)
            merges :+= ((l, r))
            picked += ((k, l, r, l + r, c))
            k += 1
            taken += 1
          }
        }
      }
    }
    picked.result()
  }

  def t11_bpe_vocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = graft.dedup.DedupOps.withCache(bpeVocab(s, d)) { w =>
      learnBpeMerges(w, 128).toDF("rank", "left", "right", "merged", "pair_count")
    }
    rows.orderBy($"rank")
  }

  /** t14: BPE ENCODING under the learned merges — the tokenizer
    * APPLICATION stage that follows t11's vocabulary induction (token
    * counting under the actual subword tokenizer is what sizes training
    * runs, not whitespace counts). The merges are learned exactly as in
    * t11 (same deterministic loop), then the corpus token count is
    * computed WITHOUT re-encoding per instance: each DISTINCT word is
    * symbolized once, map-side over the vocabulary table, and instance
    * totals are frequency-weighted sums — corpus-sized data is touched
    * only by the initial vocab shuffle, the same one-collapse shape as
    * t11. Deterministic (merge list + encoder are pure functions) →
    * golden pin, and oracle-checked since r10 ([[t14Oracle]] re-derives
    * the merges through the same unrolled chain and encodes each
    * distinct word with one list_reduce fold). */
  def t14_bpe_encode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.dedup.DedupOps.withCache(bpeVocab(s, d)) { w =>
      val merges = learnBpeMerges(w, 128).map(p => (p._2, p._3))
      val symU = udf { word: String => bpeSymbols(word, merges).length }
      w.select($"word", $"freq", symU($"word").as("n_syms"),
          length($"word").cast("long").as("n_chars"))
        .agg(count(lit(1)).as("n_words_distinct"),
          sum($"freq").as("n_word_instances"),
          sum($"freq" * $"n_chars").as("n_chars_total"),
          sum($"freq" * $"n_syms").as("n_bpe_tokens"),
          max($"n_syms").as("max_word_tokens"))
        .select($"n_words_distinct", $"n_word_instances", $"n_chars_total",
          $"n_bpe_tokens", $"max_word_tokens",
          // integer ratio ×1000: chars per BPE token, drift-proof
          expr("(n_chars_total * 1000) div n_bpe_tokens")
            .as("chars_per_token_x1000"))
    }
  }

  // ---- t12 sequence packing ----

  /** t12: SEQUENCE PACKING — the last pipeline stage before training
    * batches: pack quality-gated documents (≥ 30 ws tokens, the t07
    * too_short rule) into fixed-length training sequences (L = 512
    * tokens) by greedy first-fit in deterministic doc_id order,
    * reporting per-group packing efficiency and boundary waste.
    *
    * Greedy packing is inherently sequential (each bin boundary depends
    * on every prior document), so a single global greedy pass cannot
    * be expressed as a window function NOR distributed without a
    * serial scan. The scalable shape: packing restarts at fixed
    * GROUP boundaries (`grp = doc_id div 64`) — groups are packed
    * greedily and independently, one shuffle on grp, each task holding
    * ≤ 64 (doc_id, count) pairs. The group size is the
    * locality/parallelism dial: larger groups amortize boundary waste,
    * smaller groups parallelize more; waste is REPORTED per group
    * precisely so that trade is measurable. Deterministic by
    * construction (fixed boundaries + in-group sort), so the outcome is
    * a pure function of the corpus — unlike a partition-local greedy
    * whose bins would depend on Spark's physical partitioning.
    * A document longer than L gets a bin of its own (counted in
    * `n_oversize`; a real tokenizer-aware pipeline would split it).
    * All emitted columns are integers — no float thresholds to drift
    * cross-engine. Oracle: the same greedy recurrence as a DuckDB
    * recursive CTE (one row per group per step, all groups advance in
    * parallel). */
  /** Greedy first-fit packing of an IN-ORDER token-count sequence into
    * bins of capacity `L`: returns (n_seqs, waste, n_oversize, total).
    * Waste is Σ max(0, L − bin total) over all bins (an over-L
    * single-doc bin wastes nothing — it overflows instead, counted in
    * n_oversize). */
  private[graft] def greedyPack(toks: Seq[Long], L: Long): (Long, Long, Long, Long) = {
    var nSeqs = 0L; var binSum = 0L; var waste = 0L
    var total = 0L; var oversize = 0L
    toks.foreach { t =>
      total += t
      if (t > L) oversize += 1
      if (nSeqs == 0L || binSum + t > L) {
        if (nSeqs > 0L) waste += math.max(0L, L - binSum)
        nSeqs += 1; binSum = t
      } else binSum += t
    }
    if (nSeqs > 0L) waste += math.max(0L, L - binSum)
    (nSeqs, waste, oversize, total)
  }

  def t12_sequence_pack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val L = 512L
    Tables.documents(s, d)
      .select(expr("doc_id div 64").as("grp"), $"doc_id",
        size(whitespaceTokens($"text")).cast("long").as("tok"))
      .filter($"tok" >= 30)
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (grp, it) =>
        val ds = it.map { case (_, id, t) => (id, t) }.toArray.sortBy(_._1)
        val (nSeqs, waste, oversize, total) =
          greedyPack(ds.map(_._2).toSeq, L)
        (grp, ds.length.toLong, total, nSeqs, nSeqs * L, waste, oversize)
      }
      .toDF("grp", "n_docs", "total_tokens", "n_seqs", "capacity",
        "waste_tokens", "n_oversize")
      .orderBy($"grp")
  }

  val t12Oracle: String =
    raw"""WITH RECURSIVE d AS (
      |  SELECT doc_id // 64 AS grp, doc_id,
      |    CAST(len(${oracleToks("text")}) AS BIGINT) AS tok,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS rn
      |  FROM documents
      |  WHERE len(${oracleToks("text")}) >= 30),
      |step(grp, rn, bin_sum, n_seqs, waste) AS (
      |  SELECT grp, rn, tok, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.grp, d.rn,
      |    CASE WHEN s.bin_sum + d.tok > 512 THEN d.tok
      |         ELSE s.bin_sum + d.tok END,
      |    CASE WHEN s.bin_sum + d.tok > 512 THEN s.n_seqs + 1
      |         ELSE s.n_seqs END,
      |    CASE WHEN s.bin_sum + d.tok > 512
      |         THEN s.waste + GREATEST(0, 512 - s.bin_sum)
      |         ELSE s.waste END
      |  FROM step s JOIN d ON d.grp = s.grp AND d.rn = s.rn + 1),
      |fin AS (
      |  SELECT grp, bin_sum, n_seqs, waste,
      |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY rn DESC) AS rk
      |  FROM step),
      |agg AS (
      |  SELECT grp, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |    CAST(SUM(CASE WHEN tok > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize
      |  FROM d GROUP BY 1)
      |SELECT a.grp, a.n_docs, a.total_tokens, f.n_seqs,
      |  f.n_seqs * 512 AS capacity,
      |  f.waste + GREATEST(0, 512 - f.bin_sum) AS waste_tokens,
      |  a.n_oversize
      |FROM agg a JOIN fin f ON f.grp = a.grp AND f.rk = 1
      |ORDER BY a.grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_bpe_vocab" -> (t11_bpe_vocab _),
    "t12_sequence_pack" -> (t12_sequence_pack _),
    "t14_bpe_encode" -> (t14_bpe_encode _),
  )

  // ---- t11/t14 SQL oracles (oracle-checked since r10) ----
  //
  // The batched merge loop IS SQL-expressible after all. Three devices:
  //
  //  1. WRAPPED-SYMBOL STRINGS: a segmentation [a, bc, d] is encoded
  //     ␁a␁␁bc␁␁d␁ (every symbol individually delimited), so applying
  //     ONE merge (l, r) is a plain `replace(w, ␁l␁␁r␁, ␁lr␁)` — SQL
  //     replace is left-to-right non-overlapping, exactly
  //     [[bpeSymbols]]' scan (consuming a pair cannot eat the next
  //     pair's delimiters, so [a,a,a,a] → [aa,aa] and [a,a,a] → [aa,a]
  //     on both engines).
  //  2. list_reduce FOLDS THE MERGE LIST: the segmentation under k
  //     merges is a left fold of device 1 over the accepted-order merge
  //     list, with the char-wrapped word (one regexp_replace) as the
  //     initial accumulator — no recursion needed for merge APPLY.
  //  3. UNROLLED ROUNDS + tiny per-round greedy recursions: rounds
  //     become 16 repeated CTE blocks (the Lloyd-unroll device; k
  //     reaches its fixed point by round 12 at the gate corpora and
  //     later blocks no-op — a corpus needing more rounds would
  //     hash-MISMATCH loudly, never silently truncate). Within a
  //     round, the symbol-disjoint greedy over the ≤128 ordered
  //     candidates is a single-chain recursive CTE whose state carries
  //     (pos, k, taken, used-symbols, accepted) — the used set probes
  //     by delimited substring, replicating the Scala used-set exactly,
  //     including the merged-string reservation and the
  //     taken<32 / k≤128 stop conditions.
  //
  // Every compared quantity is integer (counts, ranks) or string — no
  // float anywhere — so the replay is exact by construction. CTEs are
  // MATERIALIZED: without it the per-round scalar subqueries re-expand
  // the whole upstream chain per reference (measured: >300 s → 1.6 s).
  /** Unroll depth. Every non-exhausted round accepts ≥ 1 merge (the
    * used-set is empty at round start, so the top candidate always
    * lands), so 32 rounds certainly suffice whenever per-round
    * acceptance averages ≥ 4 — the gate corpora reach their fixed point
    * by round 12-13, and a 400-random-word stress corpus needs 17 (r10
    * review). A corpus needing more rounds fails LOUDLY as a gate hash
    * mismatch (fewer oracle merges than the engine's), never silently;
    * raise this constant if that ever fires. 128 would be a guarantee
    * for any corpus, but measures 65 s per oracle run vs 1.8 s at 32 —
    * not worth it for a fixed-corpus gate. */
  private val Rounds = 32
  private val W = "chr(1)" // symbol-wrap delimiter (never in corpus text)
  private val U = "chr(2)" // field separator inside encoded entries

  private def segSql(mergesSrc: String): String =
    s"""list_reduce(
       |      list_prepend(regexp_replace(word, '(.)', $W || '\\1' || $W, 'g'),
       |                   (SELECT merges FROM $mergesSrc)),
       |      (acc, m) -> replace(acc,
       |        $W || split_part(m, $U, 1) || $W || $W || split_part(m, $U, 2) || $W,
       |        $W || split_part(m, $U, 1) || split_part(m, $U, 2) || $W))""".stripMargin

  private def roundBlockSql(r: Int): String = {
    val prev = s"mrg_${r - 1}"
    val ok =
      s"""strpos(g.used, $W || c.l || $W) = 0
         |          AND strpos(g.used, $W || c.r || $W) = 0
         |          AND strpos(g.used, $W || c.l || c.r || $W) = 0""".stripMargin
    s"""seg_$r AS MATERIALIZED (
       |  SELECT word, freq, ${segSql(prev)} AS w FROM vocab),
       |sym_$r AS MATERIALIZED (
       |  SELECT word, freq, str_split(w[2:len(w) - 1], $W || $W) AS syms
       |  FROM seg_$r),
       |pr_$r AS MATERIALIZED (
       |  SELECT t.p[1] AS l, t.p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
       |  FROM sym_$r, UNNEST(list_zip(syms[1:len(syms) - 1], syms[2:len(syms)])) AS t(p)
       |  WHERE len(syms) >= 2
       |  GROUP BY 1, 2),
       |cd_$r AS MATERIALIZED (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS pos
       |  FROM pr_$r QUALIFY pos <= 128),
       |g_$r(pos, k, taken, used, acc) AS (
       |  SELECT CAST(0 AS BIGINT), (SELECT k FROM $prev), 0, $W,
       |    CAST([] AS VARCHAR[])
       |  UNION ALL
       |  SELECT c.pos,
       |    CASE WHEN $ok THEN g.k + 1 ELSE g.k END,
       |    CASE WHEN $ok THEN g.taken + 1 ELSE g.taken END,
       |    CASE WHEN $ok
       |      THEN g.used || $W || c.l || $W || $W || c.r || $W || $W || c.l || c.r || $W
       |      ELSE g.used END,
       |    CASE WHEN $ok
       |      THEN list_append(g.acc, c.l || $U || c.r || $U || CAST(c.cnt AS VARCHAR))
       |      ELSE g.acc END
       |  FROM g_$r g JOIN cd_$r c ON c.pos = g.pos + 1
       |  WHERE g.taken < 32 AND g.k <= 128),
       |gf_$r AS MATERIALIZED (SELECT k, acc FROM g_$r ORDER BY pos DESC LIMIT 1),
       |mrg_$r AS MATERIALIZED (
       |  SELECT m.merges || list_transform(f.acc,
       |      s -> split_part(s, $U, 1) || $U || split_part(s, $U, 2)) AS merges,
       |    f.k AS k,
       |    m.picked || list_transform(f.acc,
       |      (s, i) -> CAST(m.k + i - 1 AS VARCHAR) || $U || s) AS picked
       |  FROM $prev m, gf_$r f)""".stripMargin
  }

  /** The shared WITH-chain: lowercased whitespace vocabulary (the one
    * [[TextOps.oracleToks]] tokenization — r10 review: keep one copy of
    * the empty-string-subtle split expression) + the unrolled merge
    * rounds. */
  private def bpeChainSql: String =
    s"""WITH RECURSIVE vocab AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(${oracleToks("lower(text)")}) AS word
       |    FROM documents)
       |  GROUP BY 1),
       |mrg_0 AS (
       |  SELECT CAST([] AS VARCHAR[]) AS merges, 1 AS k,
       |    CAST([] AS VARCHAR[]) AS picked),
       |${(1 to Rounds).map(roundBlockSql).mkString(",\n")}""".stripMargin

  val t11Oracle: String =
    s"""$bpeChainSql
       |SELECT CAST(split_part(p, $U, 1) AS INTEGER) AS rank,
       |  split_part(p, $U, 2) AS "left",
       |  split_part(p, $U, 3) AS "right",
       |  split_part(p, $U, 2) || split_part(p, $U, 3) AS merged,
       |  CAST(split_part(p, $U, 4) AS BIGINT) AS pair_count
       |FROM (SELECT unnest(picked) AS p FROM mrg_$Rounds)
       |ORDER BY rank""".stripMargin

  val t14Oracle: String =
    s"""$bpeChainSql,
       |enc AS MATERIALIZED (
       |  SELECT freq,
       |    CAST(len(str_split(w[2:len(w) - 1], $W || $W)) AS BIGINT) AS n_syms,
       |    CAST(length(word) AS BIGINT) AS n_chars
       |  FROM (SELECT word, freq, ${segSql(s"mrg_$Rounds")} AS w FROM vocab))
       |SELECT COUNT(*) AS n_words_distinct,
       |  CAST(SUM(freq) AS BIGINT) AS n_word_instances,
       |  CAST(SUM(freq * n_chars) AS BIGINT) AS n_chars_total,
       |  CAST(SUM(freq * n_syms) AS BIGINT) AS n_bpe_tokens,
       |  CAST(MAX(n_syms) AS BIGINT) AS max_word_tokens,
       |  CAST((SUM(freq * n_chars) * 1000) // SUM(freq * n_syms) AS BIGINT)
       |    AS chars_per_token_x1000
       |FROM enc""".stripMargin

  val oracle: Map[String, String] = Map(
    "t11_bpe_vocab" -> t11Oracle,
    "t12_sequence_pack" -> t12Oracle,
    "t14_bpe_encode" -> t14Oracle)
}
