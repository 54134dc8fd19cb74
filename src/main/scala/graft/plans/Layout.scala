package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions.col

/** Range-clustered parquet layout — the scan-cost lever that remains
  * AFTER partition pruning (SURVEY §4.2 / "push down and prune").
  *
  * Partitioning prunes directories; bucketing co-locates join keys
  * (`Bucketing`); what neither does is make a RANGE predicate cheap on
  * a high-cardinality column (event time, doc length, price): a
  * directory per day explodes the file count at 100 TB, and hash
  * buckets scatter adjacent values across every file. The remaining
  * tool is LAYOUT: cluster rows by the predicate column at write time
  * (`repartitionByRange` + `sortWithinPartitions`), so each parquet
  * file — and each row group and page inside it — covers a narrow,
  * disjoint value range. Parquet stores min/max statistics per row
  * group (and per page via the column index); Spark pushes range
  * predicates into the reader (`PushedFilters` in the scan node), and
  * the reader then skips every row group whose range cannot match —
  * the same rows, written clustered instead of arrival-ordered, turn
  * a full-corpus decode into a touched-files-only decode. At 100 TB
  * this is the difference between "a week-long time slice reads the
  * week" and "a week-long time slice reads the decade".
  *
  * The write costs one range shuffle — paid ONCE, amortized over every
  * range query after, exactly like `Bucketing.writeBucketed`'s
  * write-time shuffle (the q57b "pay it once" store rule applied to
  * scan I/O instead of join exchange).
  *
  * `LayoutSpec` measures the claim rather than trusting it: the same
  * rows written range-clustered vs arrival-ordered, same range query,
  * equal results — and the scan's `numOutputRows` metric (rows the
  * parquet reader actually decoded) collapses only under the
  * clustered layout.
  *
  * Two measured type gotchas (LayoutSpec pins both): (1) INT96 —
  * Spark's legacy-interop parquet encoding for TimestampType — has no
  * usable min/max statistics; write `TIMESTAMP_MICROS`. (2) In this
  * Spark version, TIMESTAMP_NTZ predicates are never translated into
  * parquet filter predicates at all (the `PushedFilters` metadata
  * lists the Spark-side filter, but the reader receives nothing), so
  * an NTZ-clustered layout decodes the full corpus regardless of
  * stats; cluster on an LTZ timestamp or integer epoch column.
  */
object Layout {

  /** Write `df` range-clustered by `cols` into `files` parquet files:
    * ranges are disjoint across files (repartitionByRange) and sorted
    * inside each file, so row-group/page min-max intervals are narrow
    * and non-overlapping — the layout min/max skipping needs. */
  def writeRangeClustered(df: DataFrame, path: String, files: Int,
                          cols: String*): Unit =
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Execute `df` and return the rows its file scans actually DECODED
    * (sum of every `FileSourceScanExec`'s `numOutputRows`). With
    * record-level parquet filtering off (Spark's default), a scan
    * outputs every row of every row group that SURVIVED min/max
    * skipping — so this metric is precisely "how much data the layout
    * made the reader touch", independent of the query's own result
    * size. */
  def decodedRows(df: DataFrame): Long = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }
      .sum
  }
}
