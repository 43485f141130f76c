package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.analytics._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05_multi_join(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Sessions.queries ++
      graft.warc.WarcQueries.queries ++
      graft.text.TextOps.queries ++ graft.text.BpeOps.queries ++
      graft.text.QualityModel.queries ++ graft.text.LangId.queries ++
      graft.text.TieredSample.queries ++
      graft.text.LangModel.queries ++ graft.text.UnigramLm.queries ++
      graft.dedup.DedupOps.queries ++ graft.dedup.IncrementalDedup.queries ++
      graft.dedup.LineDedup.queries ++ graft.dedup.Contamination.queries ++
      graft.dedup.SpanDedup.queries ++ graft.dedup.BloomDedup.queries ++
      graft.dedup.Materialize.queries ++ graft.dedup.Recrawl.queries ++
      graft.pipeline.TrainingPipeline.queries ++
      graft.sim.SimilarityOps.queries ++ graft.sim.AnnStore.queries ++
      graft.sim.SemanticDedup.queries ++ graft.sim.S06Diag.queries ++
      graft.sim.GraphOps.queries ++
      graft.sim.SelectOps.queries ++
      graft.multimodal.MultimodalOps.queries ++
      graft.streaming.StreamingOps.queries ++
      graft.streaming.StreamStoreIngest.queries
  /** Cert-channel DIAGNOSTIC rows (oracle-checked like any query, but
    * not operators): excluded from the Bench headline so the
    * round-over-round total keeps comparing the same operator work.
    * Currently the s06 driver-bisection family (r13 verdict item 1). */
  val diagnosticQueries: Set[String] =
    Set("s06x_fold_canary", "s06a_assign_checksums", "s06b_pair_audit")
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Sessions.oracle ++
      graft.warc.WarcQueries.oracle ++
      graft.text.TextOps.oracle ++ graft.text.BpeOps.oracle ++
      graft.text.QualityModel.oracle ++ graft.text.LangId.oracle ++
      graft.text.TieredSample.oracle ++
      graft.text.LangModel.oracle ++ graft.text.UnigramLm.oracle ++
      graft.dedup.DedupOps.oracle ++ graft.dedup.IncrementalDedup.oracle ++
      graft.dedup.LineDedup.oracle ++ graft.dedup.Contamination.oracle ++
      graft.dedup.SpanDedup.oracle ++ graft.dedup.BloomDedup.oracle ++
      graft.dedup.Materialize.oracle ++ graft.dedup.Recrawl.oracle ++
      graft.pipeline.TrainingPipeline.oracle ++
      graft.sim.SimilarityOps.oracle ++ graft.sim.AnnStore.oracle ++
      graft.sim.SemanticDedup.oracle ++ graft.sim.S06Diag.oracle ++
      graft.sim.GraphOps.oracle ++
      graft.sim.SelectOps.oracle ++
      graft.multimodal.MultimodalOps.oracle ++
      graft.streaming.StreamingOps.oracle ++
      graft.streaming.StreamStoreIngest.oracle
}
