package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

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

  /** Z-ORDER (multi-column) clustering: linear range clustering makes
    * ONE column's predicates cheap and leaves every other column's
    * min/max spanning the full domain (a layout clustered by x skips
    * nothing for a y-only predicate — LayoutSpec measures exactly
    * that). Interleaving the bit representations of ALL clustering
    * columns into one sort key (Morton order) trades a little
    * skipping on the leading column for real skipping on EVERY
    * column: each file covers a small hyper-rectangle of the value
    * space, so each column's per-file min/max interval is ~domain ×
    * (files)^(-1/D) instead of the full domain.
    *
    * Column values are first mapped to `2^bits` QUANTILE buckets
    * (equal-population, so skewed distributions still spread over the
    * full bucket range — plain equal-width interleaving degenerates
    * on skew), then the bucket indices are bit-interleaved. The
    * quantile boundaries come from one `approxQuantile` pass per
    * column at WRITE time — O(2^bits) driver scalars (q62's
    * driver-traffic rule), amortized over every query after, the same
    * pay-once economics as the range shuffle itself.
    *
    * The skipping mechanism is unchanged from linear clustering —
    * parquet row-group min/max on the REAL columns; the z-value
    * itself is dropped before the write. Nulls map to bucket 0 and
    * cluster together at the low end. */
  def writeZOrdered(df: DataFrame, path: String, files: Int,
                    cols: Seq[String], bits: Int = 8): Unit = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62, s"bits=$bits out of range")
    val nb = (1 << bits) - 1 // boundary count per column
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    // ONE boundary pass for all columns (the multi-column
    // approxQuantile overload) — D sequential scans would pay D−1
    // redundant corpus reads at the scale this layout targets.
    val bnds = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, 0.25 / (nb + 1))
    val zv = zOrderValue(bits, cols.zip(bnds).map {
      case (c, b) => quantileBucket(col(c), b)
    })
    df.withColumn("__graft_z", zv)
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Bucket index of `c` against sorted boundaries: the number of
    * boundaries ≤ value — a codegen'd array fold, no UDF. NULL → 0. */
  private[graft] def quantileBucket(c: Column, bnds: Array[Double]): Column =
    coalesce(
      size(filter(lit(bnds.distinct.sorted),
        b => c.cast("double") >= b)).cast("long"),
      lit(0L))

  /** Morton interleave: bit i of bucket j lands at position
    * `i * D + j`. Buckets must fit in `bits` bits. */
  private[graft] def zOrderValue(bits: Int, buckets: Seq[Column]): Column = {
    val d = buckets.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (bk, j) =>
        shiftleft(shiftright(bk, i).bitwiseAND(lit(1L)), i * d + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Deterministic md5 sample nibble of an id column (0..15) — the
    * q40 split discipline (never `rand()`): both engines and every
    * run replay the exact same 1/16 sample. Shared by the sampled
    * drift gate's filter and the sample-nibbled layout writer, so
    * the partition column and the semantic sample cannot fork. */
  def sampleNibble(idCol: String): Column =
    expr(s"locate(substring(md5(cast($idCol as string)), 32, 1), " +
      "'0123456789abcdef') - 1")

  /** SAMPLE-NIBBLED layout (VERDICT r17 next #4): write `df`
    * hive-partitioned by [[sampleNibble]] of `idCol` (`_nib` = 0..15).
    * The sampled drift gate's production decide filters one nibble;
    * from the standard layout that filter runs AFTER the scan decodes
    * the text bytes — the corpus scan is the floor, measured ~3–5×
    * under the full decide instead of 16×. From this layout the
    * nibble is a PARTITION filter: the scan prunes 15/16 of the
    * directories and reads ~1/16 of the bytes (Round18Spec asserts
    * the executed plan's partitionFilters and the filesSize ratio).
    * Sixteen fixed partitions add no small-file hazard at any scale,
    * and every non-sampled query reads the same rows unchanged. The
    * write costs one pass — the same pay-once economics as
    * [[writeRangeClustered]]. */
  def writeSampleNibbled(df: DataFrame, path: String,
                         idCol: String = "doc_id"): Unit =
    df.withColumn("_nib", sampleNibble(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("_nib").parquet(path)

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
