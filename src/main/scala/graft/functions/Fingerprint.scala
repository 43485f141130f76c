package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The corpus-fingerprint device shared by every audit that must prove
  * "these exact rows, in this exact order, survived" (p01's per-shard
  * audit, io01's round-trip audit, d24's kept-corpus pin): a COMMUTATIVE
  * XOR fold of a 62-bit per-row hash whose key embeds the row's position
  * (rank / doc_id), so the fold is order-SENSITIVE through the key while
  * the aggregation itself is map-side combinable.
  *
  * Why not the previous `md5(array_join(array_sort(collect_list(...))))`
  * shape: collect_list concentrates every row of a group on ONE reducer —
  * with a constant group fan (8 shards / 8 buckets / |langs|) each task
  * holds O(N/8) structs, the same asymptotic class as a single reducer
  * (r19 verdict item 3: the docstring's "no corpus-sized reducer" claim
  * was false as written). `bit_xor` is a declarative aggregate with
  * partials: every map task folds its own rows, the shuffle moves ONE
  * long per group per task, and no task's memory grows with the corpus.
  *
  * Numeric contract: the hash is 62-bit ON PURPOSE — hi 30 bits
  * (md5 hex chars 1-8 mod 2^30) × 2^32 + lo 32 bits (chars 9-16) stays
  * strictly below 2^62 at every intermediate step, so the arithmetic is
  * exact in a SIGNED long on the Spark side (no overflow even under
  * ANSI) and in DuckDB's checked UBIGINT→BIGINT cast on the oracle side.
  * Probability a corruption keeps one group's XOR fixed ≈ 2^-62.
  */
object Fingerprint {

  /** 62-bit positive hash of a key string column (builtins only — md5,
    * conv, cast, % — so it stays inside whole-stage codegen). */
  def fp62(k: Column): Column = {
    val hi = conv(substring(md5(k), 1, 8), 16, 10).cast("long") % 1073741824L
    val lo = conv(substring(md5(k), 9, 8), 16, 10).cast("long")
    hi * 4294967296L + lo
  }

  /** The aggregate: XOR of [[fp62]] over the group's rows. Embed the
    * row's position in `k` (e.g. `concat(rank, ':', doc_md5)`) to make
    * the commutative fold order-sensitive. */
  def xorFp(k: Column): Column = bit_xor(fp62(k))

  /** [[fp62]]'s DuckDB twin over a SQL key expression — verified
    * bit-identical to the Spark side (same md5 hex, same 30/32-bit
    * split, same UBIGINT-safe arithmetic). */
  def fp62Sql(k: String): String =
    s"CAST(CAST(concat('0x', substr(md5($k), 1, 8)) AS UBIGINT) % 1073741824" +
      s" * 4294967296 + CAST(concat('0x', substr(md5($k), 9, 8)) AS UBIGINT)" +
      s" AS BIGINT)"

  /** [[xorFp]]'s DuckDB twin. */
  def xorFpSql(k: String): String = s"bit_xor(${fp62Sql(k)})"
}
