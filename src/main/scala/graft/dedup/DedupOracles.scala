package graft.dedup

/** The DuckDB oracle SQL for the DedupOps core operators (d01–d06, d09)
  * — split out of DedupOps (r9 verdict item 4) so the operator file
  * stays reviewable; each string is the same contract as before, keyed
  * from `DedupOps.oracle`. */
object DedupOracles {

  val d01Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents),
      |g AS (SELECT md5(text) AS digest, COUNT(*) AS n_copies,
      |        MIN(doc_id) AS keeper_id
      |      FROM all_docs GROUP BY 1)
      |SELECT COUNT(*) AS n_groups, CAST(SUM(n_copies) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_redundant,
      |  CAST(SUM(keeper_id) AS BIGINT) AS keeper_id_sum
      |FROM g""".stripMargin

  val d02Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
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
      |confirmed AS (
      |  SELECT id_a, id_b FROM pairs
      |    JOIN sizes sa ON sa.doc_id = id_a
      |    JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.8)
      |SELECT COUNT(*) AS n_confirmed,
      |  CAST(SUM(CASE WHEN id_b = id_a + 100000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_planted_found
      |FROM confirmed""".stripMargin

  /** The d03 pipeline in SQL: same planted union and shingle CTEs as
    * [[d02Oracle]], then per-shingle md5 hashes ([[md5Hash64]]'s rule),
    * the ±1 bit-majority accumulation per bit position, 4×16-bit band
    * bucketing, and the hamming-≤6 verify — signatures live in UBIGINT
    * (same bits as Spark's signed long; only equality and xor touch
    * them). */
  val d03Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    list_slice(string_split_regex(trim(text), '\s+'), 1,
      |      len(string_split_regex(trim(text), '\s+')) - 1)
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
      |  FROM all_docs,
      |    UNNEST(range(1, GREATEST(len(toks) - 1, 2))) AS u(i)),
      |h AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(shingle), 1, 16)) AS UBIGINT) AS hv
      |  FROM sh),
      |acc AS (
      |  SELECT doc_id, i,
      |    SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS a
      |  FROM h, UNNEST(range(0, 64)) AS r(i) GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN a > 0 THEN CAST(1 AS HUGEINT) << i
      |             ELSE CAST(0 AS HUGEINT) END) AS UBIGINT) AS sig
      |  FROM acc GROUP BY 1),
      |banded AS (
      |  SELECT doc_id, b, sig & (CAST(65535 AS UBIGINT) << (b * 16)) AS bits
      |  FROM sig, UNNEST(range(0, 4)) AS rb(b)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.bits = b.bits AND a.doc_id < b.doc_id),
      |confirmed AS (
      |  SELECT id_a, id_b FROM pairs
      |    JOIN sig sa ON sa.doc_id = id_a
      |    JOIN sig sb ON sb.doc_id = id_b
      |  WHERE bit_count(xor(sa.sig, sb.sig)) <= 6)
      |SELECT COUNT(*) AS n_confirmed,
      |  CAST(SUM(CASE WHEN id_b = id_a + 100000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_planted_found
      |FROM confirmed""".stripMargin

  /** d22: the containment semantics computed directly from the shingle
    * sets (the d04Oracle idiom — the oracle replays the SEMANTICS; the
    * engine's prefix-probe candidate phase has a pigeonhole recall
    * guarantee, so the two must emit the same set). */
  val d22Oracle: String =
    raw"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, 2 * len(string_split_regex(trim(text), '\s+')) + 1),
      |      j -> 'c' || doc_id || 'x' || j), ' ')
      |  FROM documents WHERE doc_id % 13 = 0
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |    text || ' ' || array_to_string(list_transform(
      |      range(1, len(string_split_regex(trim(text), '\s+')) // 5 + 1),
      |      j -> 'n' || doc_id || 'x' || j), ' ')
      |  FROM documents WHERE doc_id % 29 = 0),
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
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(common AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE)
      |    AS containment,
      |  CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE)
      |    AS jaccard
      |FROM pairs
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE)
      |    >= 0.8
      |  AND CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE)
      |    < 0.6
      |ORDER BY id_a, id_b""".stripMargin

  val d04Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
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
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
      |FROM pairs
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin

  val d05Oracle: String =
    """WITH bench AS (
      |  SELECT doc_id + 100000 AS bench_id,
      |    CASE WHEN doc_id % 2 = 0 THEN text ELSE upper(text) END AS text
      |  FROM documents WHERE doc_id % 97 = 0),
      |b AS (SELECT bench_id, md5(text) AS digest,
      |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_digest
      |      FROM bench),
      |t AS (SELECT md5(text) AS digest,
      |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS norm_digest
      |      FROM documents),
      |e AS (SELECT DISTINCT bench_id FROM b JOIN t USING (digest)),
      |nrm AS (SELECT DISTINCT bench_id FROM b JOIN t USING (norm_digest))
      |SELECT (SELECT COUNT(*) FROM b) AS n_bench,
      |  (SELECT COUNT(*) FROM e) AS n_exact_contaminated,
      |  (SELECT COUNT(*) FROM nrm) AS n_norm_contaminated""".stripMargin

  val d06Oracle: String =
    """WITH RECURSIVE all_docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
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
      |SELECT COUNT(*) AS n_clusters,
      |  CAST(SUM(sz) AS BIGINT) AS n_docs_clustered,
      |  CAST(MAX(sz) AS BIGINT) AS max_cluster_size,
      |  CAST(SUM(root) AS BIGINT) AS keeper_id_sum
      |FROM cl""".stripMargin

  /** The d09 audit replayed end-to-end in SQL: d03's planted-union and
    * shingle CTEs, md5-based 64-bit shingle hashes, then the
    * multiply-shift MinHash itself — `(a_i · h) >>> 33` per permutation,
    * with the seeded odd multipliers embedded as (lo, hi) 32-bit limbs
    * so the mod-2^64 product stays inside HUGEINT:
    * a·h ≡ lo·h + ((hi·h mod 2^32) << 32)  (mod 2^64). */
  val d09Oracle: String = {
    val perms = DedupOps.PermA.zipWithIndex.map { case (a, i) =>
      val lo = java.lang.Long.toUnsignedString(a & 0xffffffffL)
      val hi = java.lang.Long.toUnsignedString(a >>> 32)
      s"($i, CAST($lo AS HUGEINT), CAST($hi AS HUGEINT))"
    }.mkString(",\n      |    ")
    s"""WITH perms(i, a_lo, a_hi) AS (VALUES
      |    $perms),
      |all_docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    list_slice(string_split_regex(trim(text), '\\s+'), 1,
      |      len(string_split_regex(trim(text), '\\s+')) - 1)
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    CASE WHEN len(toks) < 3 THEN array_to_string(toks, ' ')
      |         ELSE array_to_string(toks[i:i+2], ' ') END AS shingle
      |  FROM all_docs,
      |    UNNEST(range(1, GREATEST(len(toks) - 1, 2))) AS u(i)),
      |h AS (
      |  SELECT doc_id,
      |    CAST(CAST(concat('0x', substr(md5(shingle), 1, 16)) AS UBIGINT)
      |      AS HUGEINT) AS hv
      |  FROM sh),
      |mins AS (
      |  SELECT doc_id, p.i,
      |    MIN(CAST((p.a_lo * hv + (p.a_hi * hv % 4294967296) * 4294967296)
      |          % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)
      |        >> 33) AS mh
      |  FROM h CROSS JOIN perms p GROUP BY 1, 2),
      |m AS (
      |  SELECT a.doc_id,
      |    SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS n_match
      |  FROM mins a JOIN mins b
      |    ON b.doc_id = a.doc_id + 100000 AND b.i = a.i
      |  WHERE a.doc_id < 100000 GROUP BY 1),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id, COUNT(*) AS c
      |  FROM sh a JOIN sh b
      |    ON b.doc_id = a.doc_id + 100000 AND b.shingle = a.shingle
      |  WHERE a.doc_id < 100000 GROUP BY 1),
      |jac AS (
      |  SELECT ca.doc_id,
      |    CASE WHEN ca.n + cb.n = 0 THEN 1.0
      |         ELSE CAST(COALESCE(it.c, 0) AS DOUBLE)
      |              / (ca.n + cb.n - COALESCE(it.c, 0)) END AS exact_j
      |  FROM cnt ca
      |  JOIN cnt cb ON cb.doc_id = ca.doc_id + 100000
      |  LEFT JOIN inter it ON it.doc_id = ca.doc_id
      |  WHERE ca.doc_id < 100000)
      |SELECT m.doc_id, m.n_match / 64.0 AS est_j, jac.exact_j,
      |  ABS(m.n_match / 64.0 - jac.exact_j) AS abs_err
      |FROM m JOIN jac ON jac.doc_id = m.doc_id
      |ORDER BY m.doc_id""".stripMargin
  }

}
