package graft.analytics

import org.apache.spark.sql.SparkSession

/** Metastore-level table-generation swap shared by the persisted-store
  * compactions (ANN inverted lists, dedup signature bands). */
object TableSwap {

  /** Swap a freshly-written generation in for `target` by RENAME-ASIDE:
    * the old generation's data is never deleted until the new one holds
    * the name (a drop-then-rename would delete the managed table's files
    * first and strand the store if the rename failed). Each metastore
    * rename is atomic; the one exposed window — target renamed aside,
    * gen not yet renamed in — leaves BOTH generations intact on disk, so
    * recovery is a loud manual rename, never data loss. */
  private[graft] def swapIn(s: SparkSession, target: String, gen: String): Unit = {
    val aside = target + "_pre_swap"
    s.sql(s"DROP TABLE IF EXISTS $aside")
    s.sql(s"ALTER TABLE $target RENAME TO $aside")
    s.sql(s"ALTER TABLE $gen RENAME TO $target")
    s.sql(s"DROP TABLE $aside")
  }
}
