package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every implemented operator/query (SURVEY §2.B). Order is the
    * SURVEY order; names are stable driver-facing identifiers. */
  val all: Seq[GraftQuery] = Seq(
    InvertedIndex, InvertedIndexUdaf, InvertedIndexNative
  ) ++ Relational.all ++ Analytics.all ++ NorthStar.all ++
    Curation.all ++ Html.all ++ Scoring.all ++ Graph.all ++ Bpe.all ++
    Seq(Q65IncrementalStats, Q70SemanticDedup, Q70bSemanticDedupStore,
      Q70cSemanticDedupTrained, Q71MultimodalCuration) ++
    Seq(graft.multimodal.Q25MultimodalFeatures,
      graft.multimodal.Q25bAudioFeatures,
      graft.multimodal.Q25cImageFeatures,
      graft.multimodal.Q25dImageNearDup,
      graft.multimodal.Q25eVideoScenes,
      graft.multimodal.Q25fImageDedupStore,
      graft.multimodal.Q25gAudioNearDup,
      graft.multimodal.Q25hAudioDedupStore,
      graft.multimodal.Q25iVideoNearDup,
      graft.multimodal.Q25jVideoDedupStore,
      graft.multimodal.Q25kJpegLossy) ++
    graft.streaming.StreamQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    InvertedIndex.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> ((s: SparkSession, d: String) => q.run(s, d))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
