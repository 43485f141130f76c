package graft.analytics

import scala.util.hashing.MurmurHash3

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cross-session lifecycle for the PERSISTED stores (the d10 signature
  * tables, the s07 ANN inverted lists + codebooks).
  *
  * Why this exists (r10 verdict item 2): the store registries used to
  * key their tables on `applicationId`, so every new session rebuilt
  * the store under a fresh name and ABANDONED the previous one — 141
  * corpus-scale table directories piled up in the warehouse. At 100 TB
  * each abandoned generation is a full corpus copy; the naming scheme,
  * not any query plan, was the scale-killer. A "persisted store" must
  * mean: a later session REUSES the generation a previous session
  * built, and superseded generations get reclaimed.
  *
  * Mechanics: tables are named by CONTENT, not by session —
  * `<kind>_f<fam>_<fp>` where `fam` hashes the corpus directory
  * (identity: which corpus) and `fp` hashes the corpus files'
  * (name, length, mtime) statuses (version: which snapshot of it). The
  * same corpus in the same place always maps to the same table names,
  * in every session. Because this harness runs Spark's in-memory
  * catalog (no Hive metastore), table METADATA dies with the session
  * even though the data files survive in the warehouse — so stores are
  * written as EXTERNAL tables at deterministic warehouse paths, and a
  * later session RE-REGISTERS the same files under the same name
  * (schema read back from the parquet footers, bucket spec re-declared
  * — the bucketed writer's file naming carries the bucket ids, so a
  * re-registered table keeps bucket pruning and co-located joins). A
  * `_graft_corpus` marker (ignored by scans: underscore prefix) is
  * written into each table directory only after EVERY component of the
  * store family is complete — it is both the completeness gate for
  * reuse and the back-pointer sweeps use to reclaim stores whose
  * corpus no longer exists.
  *
  * Reclamation ([[sweep]]), run after each successful build:
  *  - same family, different fingerprint → the corpus was REPLACED
  *    (new snapshot); the old generation is superseded — delete.
  *  - legacy session-keyed names (`<kind>_<digits>`) → unreachable by
  *    construction (applicationIds never recur) — delete.
  *  - other families whose marker points at a corpus directory that no
  *    longer exists (spec temp dirs, removed datasets) — delete.
  * On a real deployment this lifecycle maps 1:1 onto a shared
  * metastore + object store; the content-addressed naming is what
  * makes concurrent sessions converge on one generation instead of
  * racing to build private ones. */
object StoreLifecycle {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.analytics")

  private[graft] val Marker = "_graft_corpus"

  private def hash32(x: String): String =
    (MurmurHash3.stringHash(x).toLong & 0xffffffffL).toString

  /** (family, fingerprint) tags for the corpus behind `dir`: family
    * identifies the corpus location, fingerprint its current file
    * statuses (name, length, mtime per data file — a rewritten corpus
    * changes the fingerprint and thus the store generation). */
  private[graft] def corpusTags(s: SparkSession, dir: String,
      tables: Seq[String]): (String, String) = {
    val conf = s.sparkContext.hadoopConfiguration
    val parts = tables.sorted.flatMap { t =>
      val p = new Path(dir, t + ".parquet")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq(s"$t:absent")
      else {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).filterNot(x => x.getPath.getName.startsWith("_")
              || x.getPath.getName.startsWith("."))
            .sortBy(_.getPath.getName)
            .map(x => s"$t/${x.getPath.getName}:${x.getLen}:${x.getModificationTime}")
            .toSeq
        else Seq(s"$t:${st.getLen}:${st.getModificationTime}")
      }
    }
    (hash32("fam:" + new Path(dir).toString),
      hash32(parts.mkString("|")))
  }

  private[graft] def storeName(kind: String, fam: String, fp: String): String =
    s"${kind}_f${fam}_$fp"

  /** The deterministic data path for a store table — inside the
    * session warehouse like a managed table, but declared EXTERNAL so
    * the catalog entry and the data have independent lifetimes (the
    * in-memory catalog forgets at session end; files must not die, and
    * a later DROP of a re-registered entry must not delete them). */
  private[graft] def tablePath(s: SparkSession, tbl: String): Path =
    new Path(new Path(s.conf.get("spark.sql.warehouse.dir")), tbl)

  /** Save `df` as this store family's `tbl`: external parquet at the
    * deterministic path, optionally bucketed. */
  private[graft] def saveStoreTable(df: org.apache.spark.sql.DataFrame,
      tbl: String, nBuckets: Int = 0, bucketCols: Seq[String] = Nil,
      sortCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    // a stale catalog entry (e.g. a superseded generation re-registered
    // earlier in this session) would make saveAsTable reuse ITS path
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val w0 = df.write.mode("overwrite")
      .option("path", tablePath(s, tbl).toString)
    val w = if (nBuckets > 0)
      w0.bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(sortCols.head, sortCols.tail: _*)
    else w0
    w.saveAsTable(tbl)
  }

  /** True iff the store directory for `tbl` carries the completeness
    * marker — i.e. a previous session finished building the WHOLE
    * family this table belongs to. */
  private[graft] def isComplete(s: SparkSession, tbl: String): Boolean = {
    val p = new Path(tablePath(s, tbl), Marker)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Stamp every table of a completed family with the corpus
    * back-pointer marker. Call ONLY after all component writes
    * finished — marker presence is the reuse gate. */
  private[graft] def markComplete(s: SparkSession, tbls: Seq[String],
      corpusDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    tbls.foreach { t =>
      val p = new Path(tablePath(s, t), Marker)
      val out = p.getFileSystem(conf).create(p, true)
      try out.write(new Path(corpusDir).toString.getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Re-register a persisted store table from a previous session in
    * this session's catalog (schema from the parquet footers, bucket
    * spec re-declared). Returns false if the data is absent or the
    * family is incomplete (no marker). Idempotent: an already-registered
    * name returns true immediately. */
  private[graft] def reRegister(s: SparkSession, tbl: String,
      nBuckets: Int = 0, bucketCols: Seq[String] = Nil,
      sortCols: Seq[String] = Nil): Boolean = {
    if (s.catalog.tableExists(tbl)) return true
    if (!isComplete(s, tbl)) return false
    val path = tablePath(s, tbl)
    val ddl = s.read.parquet(path.toString).schema.toDDL
    val bucketSql =
      if (nBuckets > 0)
        s"CLUSTERED BY (${bucketCols.mkString(", ")}) " +
          (if (sortCols.nonEmpty) s"SORTED BY (${sortCols.mkString(", ")}) "
           else "") + s"INTO $nBuckets BUCKETS "
      else ""
    s.sql(s"CREATE TABLE $tbl ($ddl) USING PARQUET $bucketSql" +
      s"LOCATION '${path.toString}'")
    log.info(s"store lifecycle: re-registered persisted table $tbl " +
      s"from ${path}")
    true
  }

  /** Reclaim superseded and orphaned store generations of the given
    * `kinds` (table-name prefixes, e.g. `graft_s07_lists`). Keeps the
    * current generation (`fam`, `fp`); deletes
    *  - same-family directories at any OTHER fingerprint (superseded
    *    by the generation just built),
    *  - legacy session-keyed names (`<kind>_<digits>` — the pre-r11
    *    applicationId scheme, unreachable by construction),
    *  - other families whose marker's corpus directory no longer
    *    exists (temp-dir corpora from old test runs).
    * Directories of other LIVE families (marker corpus still present)
    * are left alone — several corpora legitimately share a warehouse.
    * Catalog entries for deleted directories are dropped too. */
  private[graft] def sweep(s: SparkSession, kinds: Seq[String],
      fam: String, fp: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val wh = new Path(s.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(conf)
    if (!fs.exists(wh)) return
    fs.listStatus(wh).filter(_.isDirectory).foreach { st =>
      val name = st.getPath.getName
      kinds.find(k => name.startsWith(k + "_")).foreach { kind =>
        val rest = name.drop(kind.length + 1)
        val doomed =
          if (rest.startsWith(s"f${fam}_")) {
            // same family: superseded iff a different fingerprint
            // (suffix match keeps companions like `<tbl>_st09_delta`
            // of the live generation alive)
            !rest.drop(fam.length + 2).takeWhile(_ != '_').equals(fp) &&
              !rest.drop(fam.length + 2).startsWith(fp + "_")
          } else if (rest.startsWith("f")) {
            // other family: orphaned iff its corpus is gone
            val m = new Path(st.getPath, Marker)
            fs.exists(m) && {
              val in = fs.open(m)
              val dir = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
              !new Path(dir).getFileSystem(conf).exists(new Path(dir))
            }
          } else rest.nonEmpty && rest.forall(_.isDigit)
        if (doomed) {
          log.info(s"store lifecycle: reclaiming superseded store dir $name")
          fs.delete(st.getPath, true)
          try s.sql(s"DROP TABLE IF EXISTS $name")
          catch { case _: Throwable => () }
        }
      }
    }
  }
}
