package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cleaned-corpus MATERIALIZATION at document granularity — the step a
  * training-data pipeline actually ships: d04 emits verified near-dup
  * pairs, d06 turns them into cluster labels, d16 emits the surviving
  * corpus (keep-one-per-cluster, the canonical min-id keeper) as
  * auditable per-document rows. This is the d13 device (per-doc md5 of
  * the materialized output, SQL-oracle-checked end to end) one level up:
  * doc granularity instead of span granularity.
  *
  * Scale shape (100 TB posture): the label frame holds only CLUSTERED
  * docs (near-dup mass, typically a few % of a crawl), so the keep/drop
  * decision is one key join of the corpus against a much smaller frame —
  * shuffle on doc_id, no pairwise anything, and the cluster-size
  * annotation is an aggregate of the (small) label frame joined back on
  * the keeper id. Nothing in the plan scales with pairs², only with
  * corpus rows + duplicate mass — the same discipline as d13.
  */
object Materialize {

  /** d16: the kept corpus after near-dup clustering. One row per
    * SURVIVING document: doc_id, n_merged (cluster size folded into this
    * keeper; 1 for docs untouched by dedup), md5 of the surviving text.
    * Dropped docs appear only via their keeper's n_merged. */
  def d16_dedup_materialize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = DedupOps.withNearDups(s, d) // doc_id, text
    val pairs = DedupOps.ensureVerifiedPairs(s, d).select($"id_a", $"id_b")
    // labels: (id, label) for clustered docs only; label = component min id
    val labels = DedupOps.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val sizes = labels.groupBy($"label".as("doc_id"))
      .agg(count(lit(1)).as("sz"))
    docs.join(labels, Seq("doc_id"), "left")
      .filter($"label".isNull || $"label" === $"doc_id") // keeper or untouched
      .join(sizes, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"sz", lit(1L)).as("n_merged"),
        md5($"text").as("doc_md5"))
      .orderBy($"doc_id")
  }

  /** Same component computation as d06's oracle (recursive CTE over the
    * verified-pair edges), then keep-one-per-cluster with the corpus
    * TEXT carried through so the md5 audits the actual materialized
    * bytes, not just membership. */
  val d16Oracle: String =
    """WITH RECURSIVE all_docs AS (
      |  SELECT doc_id, text,
      |    string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1), ' '),
      |    list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1)
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
      |  FROM all_docs,
      |    UNNEST(range(1, GREATEST(len(toks) - 1, 2))) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |conf AS (
      |  SELECT id_a, id_b FROM pairs
      |    JOIN sizes sa ON sa.doc_id = id_a
      |    JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.6),
      |edges AS (SELECT id_a AS a, id_b AS b FROM conf
      |          UNION ALL SELECT id_b, id_a FROM conf),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |comp AS (SELECT id, MIN(r) AS root FROM reach GROUP BY 1),
      |cl AS (SELECT root, COUNT(*) AS sz FROM comp GROUP BY 1)
      |SELECT a.doc_id, COALESCE(cl.sz, 1) AS n_merged, md5(a.text) AS doc_md5
      |FROM all_docs a
      |  LEFT JOIN comp ON comp.id = a.doc_id
      |  LEFT JOIN cl ON cl.root = a.doc_id
      |WHERE comp.id IS NULL OR comp.root = a.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** d20: QUALITY-KEEPER selection — the FineWeb-style refinement of
    * d16's min-id rule: within each near-dup cluster keep the HIGHEST-
    * QUALITY member (here: most tokens — "longest wins", the standard
    * crawl heuristic for near-dup groups where one capture is truncated),
    * tiebreak min doc_id. min-id is an arbitrary-but-stable choice;
    * production pipelines keep the best capture, and the two rules
    * genuinely diverge — the fixture plants BOTH directions so the rule
    * is exercised, not vacuous: even doc_ids get an EXTENDED variant
    * (first 3 tokens appended — longer, so keeper = the variant, NOT the
    * min id) and odd doc_ids the dropped-last-token variant (shorter, so
    * keeper = the original = min id). `n_keeper_not_min` in the audit
    * counts the clusters where the quality rule overrode min-id — zero
    * would mean the operator degenerated into d16.
    *
    * Machinery: d02's certified near-dup chain on the fixture corpus
    * ([[DedupOps.scoredOf]] banded candidates + exact-margin verify at
    * 0.8, the same scoredOf/confirmedPairsOf reuse p06 rides), then the
    * distributed min-label [[DedupOps.connectedComponents]], then ONE
    * aggregate per cluster — keeper = max(struct(n_tok, −doc_id)), a
    * map-side-combinable struct max, no window. Scale shape: banded
    * join + CC over confirmed-pair mass + two key joins; nothing
    * pairwise beyond the guarded candidate stage. */
  /** The d20 fixture corpus: originals ∪ one variant per doc — even ids
    * extended (first 3 tokens appended, LONGER), odd ids dropped-last-
    * token (SHORTER). */
  private def d20Corpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = DedupOps.spread(
      graft.analytics.Tables.documents(s, d).select($"doc_id", $"text"))
    val toks = split(trim($"text"), "\\s+")
    val extended = array_join(concat(toks, slice(toks, 1, 3)), " ")
    val dropped = array_join(slice(toks, lit(1), size(toks) - 1), " ")
    docs.unionByName(docs.select(
      ($"doc_id" + DedupOps.Shift).as("doc_id"),
      when($"doc_id" % 2 === 0, extended).otherwise(dropped).as("text")))
  }

  /** d20's confirmed-pair artifact, built ONCE per (session, corpus) and
    * reused — the [[DedupOps.ensureVerifiedPairs]] "signed once"
    * precedent (d06 5.5 s → 0.75 s by the same device): the banded
    * candidate pass + exact verify is the dominant d20 cost and its
    * input is a pure function of the corpus, so repeated runs (bench
    * cold/warm, scalebench's 5 runs) pay it once. localCheckpoint
    * materializes the bounded pair set (≈ one pair per doc) so the
    * upstream caches release. */
  private val d20PairsRegistry = new PairCache()
  private def ensureD20Pairs(s: SparkSession, d: String): DataFrame =
    d20PairsRegistry.getOrBuild(
      s.sparkContext.applicationId + ":" + d) {
        import s.implicits._
        val corpus = d20Corpus(s, d)
        DedupOps.withCache(
            corpus.withColumn("sig", DedupOps.sigWithHashesU($"text"))) { sigd =>
          DedupOps.withCache(DedupOps.scoredOf(sigd)) { scored =>
            DedupOps.confirmedPairsOf(sigd, scored).localCheckpoint(true)
          }
        }
      }

  def d20_quality_keeper(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = d20Corpus(s, d)
    val labels = DedupOps.connectedComponents(ensureD20Pairs(s, d))
      .withColumnRenamed("id", "doc_id")
    // whitespaceTokens-style empty handling: split('') is [''] (size 1)
    // but an emptied variant (single-token odd doc, dropped-last) must
    // count 0 tokens like the oracle's actual variant list (r15 ADVICE)
    val ntok = corpus.select($"doc_id",
      size(graft.text.TextOps.whitespaceTokens($"text"))
        .cast("long").as("n_tok"))
    val members = labels.join(ntok, "doc_id")
    // keeper per cluster: lexicographic struct max = most tokens,
    // then smallest id — a plain aggregate with partials, no window
    val keepers = members.groupBy($"label")
      .agg(count(lit(1)).as("sz"), min($"doc_id").as("min_id"),
        max(struct($"n_tok", (-$"doc_id").as("neg_id"))).as("best"))
      .select($"sz", $"min_id",
        (-$"best.neg_id").as("keeper_id"), $"best.n_tok".as("keeper_tok"))
    keepers.agg(
      count(lit(1)).as("n_clusters"),
      sum($"sz").as("n_docs_clustered"),
      sum($"keeper_id").as("keeper_id_sum"),
      sum(when($"keeper_id" =!= $"min_id", 1L).otherwise(0L))
        .as("n_keeper_not_min"),
      sum($"keeper_tok").as("kept_tok_mass"))
  }

  /** d06's recursive-CTE component chain on the mixed extended/dropped
    * fixture at the 0.8 confirm threshold (d02's rule — what
    * confirmedPairsOf implements), then the keeper window per root. */
  val d20Oracle: String =
    """WITH RECURSIVE base AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN []
      |         ELSE string_split_regex(trim(text), '\s+') END AS toks
      |  FROM documents),
      |all_docs AS (
      |  SELECT doc_id, toks FROM base
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    CASE WHEN doc_id % 2 = 0 THEN list_concat(toks, toks[1:3])
      |         ELSE list_slice(toks, 1, len(toks) - 1) END
      |  FROM base),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
      |  FROM all_docs,
      |    UNNEST(range(1, GREATEST(len(toks) - 1, 2))) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |conf AS (
      |  SELECT id_a, id_b FROM pairs
      |    JOIN sizes sa ON sa.doc_id = id_a
      |    JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.8),
      |edges AS (SELECT id_a AS a, id_b AS b FROM conf
      |          UNION ALL SELECT id_b, id_a FROM conf),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |comp AS (SELECT id, MIN(r) AS root FROM reach GROUP BY 1),
      |mem AS (
      |  SELECT comp.root, comp.id, CAST(len(d.toks) AS BIGINT) AS n_tok
      |  FROM comp JOIN all_docs d ON d.doc_id = comp.id),
      |k AS (
      |  SELECT root, id AS keeper_id, n_tok AS keeper_tok,
      |    ROW_NUMBER() OVER (PARTITION BY root ORDER BY n_tok DESC, id) AS rn
      |  FROM mem),
      |cl AS (SELECT root, COUNT(*) AS sz, MIN(id) AS min_id FROM mem GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(cl.sz) AS BIGINT) AS n_docs_clustered,
      |  CAST(SUM(k.keeper_id) AS BIGINT) AS keeper_id_sum,
      |  CAST(SUM(CASE WHEN k.keeper_id <> cl.min_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_keeper_not_min,
      |  CAST(SUM(k.keeper_tok) AS BIGINT) AS kept_tok_mass
      |FROM cl JOIN k ON k.root = cl.root AND k.rn = 1""".stripMargin

  /** d23's confirmed containment-pair artifact, built ONCE per
    * (session, corpus) and reused — the [[ensureD20Pairs]] device: the
    * guarded candidate pass + two-phase verify dominates d23's cost and
    * is a pure function of the corpus, so bench cold/warm runs pay it
    * once. The pair set is output-bounded (127 rows at sf0.01), so the
    * localCheckpoint is tiny and the upstream caches release.
    * CONSTRAINT (shared with [[ensureD20Pairs]] and
    * [[DedupOps.ensureVerifiedPairs]], r18 ADVICE): the cache key is
    * (applicationId, dir) with no content fingerprint — regenerating
    * the corpus UNDER a dir within one session (Dev gen-sf into a dir
    * the same session already queried) would serve stale pairs against
    * fresh corpus-side joins. Regeneration requires a fresh session;
    * every Dev/bench/cert path already works that way (gen-sf is its
    * own JVM run). Since r20 every registry is a bounded [[PairCache]]
    * (LRU of 2 corpora, evicted checkpoints released eagerly — the r19
    * unbounded-accumulation nit). */
  private val d23PairsRegistry = new PairCache()
  private def ensureD23Pairs(s: SparkSession, d: String): DataFrame =
    d23PairsRegistry.getOrBuild(
      s.sparkContext.applicationId + ":" + d)(
        DedupOps.containmentPairsOf(DedupOps.withContainmentChain(s, d))
          .localCheckpoint(true))

  /** d23: containment KEEPER selection — the decision tail that turns
    * d22's asymmetric pair emission into keep/drop, the [[d20_quality_keeper]]
    * idiom applied to DIRECTED pairs. Direction is intrinsic, not a
    * quality heuristic: in a confirmed containment pair the side with
    * fewer distinct shingles IS the contained one (ties are impossible
    * under d22's thresholds — see [[DedupOps.containmentPairsOf]]), and
    * the production rule drops every doc contained in SOMETHING (its
    * content survives inside its host). Greedy superset-keeping handles
    * chains correctly: on the fixture's orig ⊂ big ⊂ mega tiers both
    * orig AND big drop (big is contained in mega even though it is
    * itself a container), mega alone survives — `n_chain_docs` counts
    * exactly those both-sides docs so the chain case is pinned
    * non-vacuous.
    *
    * Scale shape (100 TB posture): the pair engine is d22's (guarded
    * prefix × index candidates, longs-only shuffles, output-sized
    * verify); everything after it is aggregates OF the pair frame
    * (near-dup mass, a few % of a crawl) plus ONE anti-join of the
    * corpus against the distinct contained ids — shuffle on doc_id,
    * nothing pairwise. The final row is 1-row aggregate cross-joins
    * (the audit shape). */
  def d23_containment_keeper(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = DedupOps.withContainmentChain(s, d)
    val pairs = ensureD23Pairs(s, d)
    val dir = pairs.select(
      when($"n_a" < $"n_b", $"id_a").otherwise($"id_b").as("contained_id"),
      when($"n_a" < $"n_b", $"id_b").otherwise($"id_a").as("container_id"))
    val dropped = dir.select($"contained_id".as("doc_id")).distinct()
    val containers = dir.select($"container_id".as("doc_id")).distinct()
    val ntok = corpus.select($"doc_id",
      size(graft.text.TextOps.whitespaceTokens($"text")).cast("long").as("n_tok"))
    val kept = ntok.join(dropped, Seq("doc_id"), "left_anti")
    pairs.agg(count(lit(1)).as("n_pairs"))
      .crossJoin(dropped.agg(count(lit(1)).as("n_dropped"),
        coalesce(sum($"doc_id"), lit(0L)).as("dropped_id_sum")))
      .crossJoin(containers.join(dropped, "doc_id")
        .agg(count(lit(1)).as("n_chain_docs")))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept"),
        coalesce(sum($"n_tok"), lit(0L)).as("kept_tok_mass")))
  }

  /** d22's exact all-pairs oracle extended with the mega tier, then the
    * directed drop rollup — the keeper decision replayed in SQL. */
  val d23Oracle: String =
    raw"""WITH base AS (SELECT doc_id, text FROM documents),
      |big AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n0,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, 2 * len(string_split_regex(trim(text), '\s+')) + 1),
      |      j -> 'c' || doc_id || 'x' || j), ' ') AS btext
      |  FROM base WHERE doc_id % 13 = 0),
      |all_docs AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 200000, btext FROM big
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, len(string_split_regex(trim(text), '\s+')) // 5 + 1),
      |      j -> 'n' || doc_id || 'x' || j), ' ')
      |  FROM base WHERE doc_id % 29 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000,
      |    btext || ' ' || array_to_string(list_transform(
      |      range(1, 3 * n0 + 1),
      |      j -> 'm' || doc_id || 'x' || j), ' ')
      |  FROM big),
      |toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM all_docs),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
      |  FROM toks, UNNEST(range(1, GREATEST(len(toks) - 1, 2))) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |cp AS (
      |  SELECT id_a, id_b, sa.n_sh AS na, sb.n_sh AS nb
      |  FROM pairs
      |    JOIN sizes sa ON sa.doc_id = id_a
      |    JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE)
      |      >= 0.8
      |    AND CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE)
      |      < 0.6),
      |dir AS (
      |  SELECT CASE WHEN na < nb THEN id_a ELSE id_b END AS contained_id,
      |         CASE WHEN na < nb THEN id_b ELSE id_a END AS container_id
      |  FROM cp),
      |dropped AS (SELECT DISTINCT contained_id AS doc_id FROM dir),
      |containers AS (SELECT DISTINCT container_id AS doc_id FROM dir),
      |ntok AS (
      |  SELECT doc_id,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
      |  FROM all_docs),
      |kept AS (
      |  SELECT n.doc_id, n.n_tok FROM ntok n
      |  LEFT JOIN dropped dr ON dr.doc_id = n.doc_id
      |  WHERE dr.doc_id IS NULL)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cp) AS n_pairs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM dropped) AS n_dropped,
      |  (SELECT CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM dropped)
      |    AS dropped_id_sum,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM containers c
      |     JOIN dropped dr ON dr.doc_id = c.doc_id) AS n_chain_docs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_kept,
      |  (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM kept)
      |    AS kept_tok_mass""".stripMargin

  /** d24's confirmed NEAR-DUP pair artifact on the chain corpus (d02's
    * certified banded chain run over [[DedupOps.withContainmentChain]]),
    * built once per (session, corpus) — the [[ensureD23Pairs]] device
    * and its regenerate-requires-restart constraint. */
  private val d24NdPairsRegistry = new PairCache()
  private def ensureD24NdPairs(s: SparkSession, d: String): DataFrame =
    d24NdPairsRegistry.getOrBuild(
      s.sparkContext.applicationId + ":" + d) {
        import s.implicits._
        val corpus = DedupOps.withContainmentChain(s, d)
        DedupOps.withCache(
            corpus.withColumn("sig", DedupOps.sigWithHashesU($"text"))) { sigd =>
          DedupOps.withCache(DedupOps.scoredOf(sigd)) { scored =>
            DedupOps.confirmedPairsOf(sigd, scored).localCheckpoint(true)
          }
        }
      }

  /** d24: UNIFIED duplicate-graph materialization — the r18 verdict's
    * "cluster-aware containment" candidate: a real curation pass ships
    * ONE keep/drop decision, but near-dup emission (d02: J ≥ 0.8) and
    * containment emission (d22: C ≥ 0.8 ∧ J < 0.6) each see only their
    * own pair kind — a doc can be a near-dup of one neighbor and
    * contained in another (the fixture's `% 13 ∧ % 29` docs), and two
    * pair-local keeper rules would double-drop or double-keep it. The
    * operator takes the UNION of both confirmed edge sets (disjoint BY
    * RULE: nd requires J ≥ 0.8, ct requires J < 0.6), runs the
    * distributed min-label [[DedupOps.connectedComponents]] over the
    * union graph, and keeps ONE member per component by d20's quality
    * rule (most tokens, tiebreak min id) — containers naturally win
    * their chains (the mega host out-tokens big and orig), and near-dup
    * clusters keep their longest capture. The audit row pins every
    * tier live: `n_nd_edges`/`n_ct_edges` (both rules fired),
    * `n_mixed_components` (≥1 component carries BOTH edge kinds — the
    * case pair-local rules get wrong; 4 at sf0.001, 3 at sf0.01,
    * measured in DuckDB before wiring), `n_keeper_not_min` (the
    * quality rule overrode min-id — 62/60), and a kept-corpus
    * fingerprint proving the MATERIALIZED bytes, not just counts.
    *
    * Scale shape (100 TB posture): both pair engines are the certified
    * guarded candidate chains (banded LSH + d22's df-capped prefix ×
    * index, longs-only shuffles); CC runs over confirmed-pair mass
    * (near-dup + containment mass, a few % of a crawl) in O(log
    * diameter) rounds; the keeper pass is ONE map-side-combinable
    * struct-max aggregate per component plus one doc_id anti-join of
    * the corpus; the fingerprint is the shared
    * [[graft.functions.Fingerprint]] XOR fold — a declarative aggregate
    * with partials, so no task ever holds more than one long of
    * fingerprint state (the r19 8-bucket collect_list shape held O(N/8)
    * md5 structs per reducer) — the audit tail is aggregates and 1-row
    * cross-joins. */
  def d24_unified_dedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = DedupOps.withContainmentChain(s, d)
    val nd = ensureD24NdPairs(s, d).select($"id_a", $"id_b")
    val ct = ensureD23Pairs(s, d).select($"id_a", $"id_b")
    val edges = nd.withColumn("kind", lit("nd"))
      .unionByName(ct.withColumn("kind", lit("ct")))
    val labels = DedupOps.connectedComponents(
        edges.select($"id_a", $"id_b"))
      .withColumnRenamed("id", "doc_id")
    // ONE corpus pass: the chain corpus (documents ∪ HOF-built plant
    // tiers) feeds three subtrees of the final plan (members, kept
    // aggregate, bucketed fingerprint) — cache the tokenize+md5
    // projection like d16/d20 do, instead of re-scanning per consumer
    // (r19 review)
    DedupOps.withCache(corpus.select($"doc_id",
      size(graft.text.TextOps.whitespaceTokens($"text")).cast("long").as("n_tok"),
      md5($"text").as("doc_md5"))) { ntok =>
    val members = labels.join(ntok, "doc_id")
    val keepers = members.groupBy($"label")
      .agg(count(lit(1)).as("sz"), min($"doc_id").as("min_id"),
        max(struct($"n_tok", (-$"doc_id").as("neg_id"))).as("best"))
      .select($"label", $"sz", $"min_id", (-$"best.neg_id").as("keeper_id"))
    val dropped = members.join(
        keepers.select($"label", $"keeper_id"), "label")
      .filter($"doc_id" =!= $"keeper_id").select($"doc_id")
    val kept = ntok.join(dropped, Seq("doc_id"), "left_anti")
    // per-component edge-kind mix: assign each edge to its component
    // via id_a's label (id_b's is the same label by construction)
    val mixed = edges
      .join(labels.select($"doc_id".as("id_a"), $"label"), "id_a")
      .groupBy($"label").agg(countDistinct($"kind").as("kinds"))
      .filter($"kinds" === 2)
    // kept-corpus fingerprint via the shared XOR fold (position keyed
    // by doc_id): a single map-side-combinable aggregate — the r19
    // 8-bucket collect_list shape held O(N/8) md5 structs per reducer,
    // the asymptotic class the docstring claimed to avoid
    val fp = kept.agg(graft.functions.Fingerprint.xorFp(
      concat($"doc_id".cast("string"), lit(":"), $"doc_md5"))
      .as("kept_corpus_fp"))
    keepers.agg(count(lit(1)).as("n_components"),
        coalesce(sum($"sz"), lit(0L)).as("n_docs_clustered"),
        // coalesce like the siblings: SUM over zero keeper rows is NULL
        // while the oracle's COUNT(*) is 0 (r19 review)
        coalesce(sum(when($"keeper_id" =!= $"min_id", 1L).otherwise(0L)),
          lit(0L)).as("n_keeper_not_min"))
      .crossJoin(nd.agg(count(lit(1)).as("n_nd_edges")))
      .crossJoin(ct.agg(count(lit(1)).as("n_ct_edges")))
      .crossJoin(mixed.agg(count(lit(1)).as("n_mixed_components")))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept"),
        coalesce(sum($"n_tok"), lit(0L)).as("kept_tok_mass")))
      .crossJoin(fp)
    }
  }

  /** The chain-corpus all-pairs recomputation with BOTH emit rules, the
    * recursive-CTE components over the union edge set, then the d20
    * keeper window and the shared XOR fingerprint — every tier of
    * [[d24_unified_dedup]] replayed in SQL. */
  val d24Oracle: String =
    raw"""WITH RECURSIVE base AS (SELECT doc_id, text FROM documents),
      |big AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n0,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, 2 * len(string_split_regex(trim(text), '\s+')) + 1),
      |      j -> 'c' || doc_id || 'x' || j), ' ') AS btext
      |  FROM base WHERE doc_id % 13 = 0),
      |all_docs AS (
      |  SELECT doc_id, text FROM base
      |  UNION ALL
      |  SELECT doc_id + 200000, btext FROM big
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, len(string_split_regex(trim(text), '\s+')) // 5 + 1),
      |      j -> 'n' || doc_id || 'x' || j), ' ')
      |  FROM base WHERE doc_id % 29 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000,
      |    btext || ' ' || array_to_string(list_transform(
      |      range(1, 3 * n0 + 1),
      |      j -> 'm' || doc_id || 'x' || j), ' ')
      |  FROM big),
      |toks AS (
      |  SELECT doc_id, text,
      |    CASE WHEN trim(text) = '' THEN []
      |         ELSE string_split_regex(trim(text), '\s+') END AS tk
      |  FROM all_docs),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(tk) < 3 THEN array_to_string(tk, ' ')
      |         ELSE array_to_string(tk[i:i+2], ' ') END AS shingle
      |  FROM toks, UNNEST(range(1, GREATEST(len(tk) - 1, 2))) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT id_a, id_b,
      |    CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS j,
      |    CAST(common AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) AS c
      |  FROM pairs
      |    JOIN sizes sa ON sa.doc_id = id_a
      |    JOIN sizes sb ON sb.doc_id = id_b),
      |nd AS (SELECT id_a, id_b FROM scored WHERE j >= 0.8),
      |ct AS (SELECT id_a, id_b FROM scored WHERE c >= 0.8 AND j < 0.6),
      |alledges AS (
      |  SELECT id_a, id_b, 'nd' AS kind FROM nd
      |  UNION ALL SELECT id_a, id_b, 'ct' FROM ct),
      |edges AS (SELECT id_a AS a, id_b AS b FROM alledges
      |          UNION ALL SELECT id_b, id_a FROM alledges),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.id),
      |comp AS (SELECT id, MIN(r) AS root FROM reach GROUP BY 1),
      |mixed AS (
      |  SELECT root FROM alledges JOIN comp ON comp.id = alledges.id_a
      |  GROUP BY 1 HAVING COUNT(DISTINCT kind) = 2),
      |mem AS (
      |  SELECT comp.root, comp.id, CAST(len(t.tk) AS BIGINT) AS n_tok
      |  FROM comp JOIN toks t ON t.doc_id = comp.id),
      |k AS (
      |  SELECT root, id AS keeper_id,
      |    ROW_NUMBER() OVER (PARTITION BY root ORDER BY n_tok DESC, id) AS rn
      |  FROM mem),
      |cl AS (SELECT root, COUNT(*) AS sz, MIN(id) AS min_id FROM mem GROUP BY 1),
      |dropped AS (
      |  SELECT mem.id FROM mem JOIN k ON k.root = mem.root AND k.rn = 1
      |  WHERE mem.id <> k.keeper_id),
      |kept AS (
      |  SELECT t.doc_id, t.text, CAST(len(t.tk) AS BIGINT) AS n_tok
      |  FROM toks t LEFT JOIN dropped dr ON dr.id = t.doc_id
      |  WHERE dr.id IS NULL)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cl) AS n_components,
      |  (SELECT CAST(COALESCE(SUM(sz), 0) AS BIGINT) FROM cl)
      |    AS n_docs_clustered,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cl JOIN k
      |     ON k.root = cl.root AND k.rn = 1
      |   WHERE k.keeper_id <> cl.min_id) AS n_keeper_not_min,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nd) AS n_nd_edges,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_ct_edges,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM mixed) AS n_mixed_components,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_kept,
      |  (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM kept)
      |    AS kept_tok_mass,
      |  (SELECT ${graft.functions.Fingerprint.xorFpSql(
             "CAST(doc_id AS VARCHAR) || ':' || md5(text)")} FROM kept)
      |    AS kept_corpus_fp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d16_dedup_materialize" -> (d16_dedup_materialize _),
    "d20_quality_keeper" -> (d20_quality_keeper _),
    "d23_containment_keeper" -> (d23_containment_keeper _),
    "d24_unified_dedup" -> (d24_unified_dedup _))

  val oracle: Map[String, String] = Map(
    "d16_dedup_materialize" -> d16Oracle,
    "d20_quality_keeper" -> d20Oracle,
    "d23_containment_keeper" -> d23Oracle,
    "d24_unified_dedup" -> d24Oracle)
}
