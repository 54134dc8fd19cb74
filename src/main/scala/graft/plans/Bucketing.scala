package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The two 100 TB shuffle-elimination techniques the query pack relies
  * on conceptually, made concrete and plan-testable (SURVEY §4.2 /
  * "minimize shuffles"):
  *
  * 1. BUCKETED CO-LOCATED JOIN — write both join sides bucketed by the
  *    join key into the session catalog; the subsequent join reads
  *    pre-partitioned data and plans a SortMergeJoin with NO Exchange
  *    on either side. At 100 TB this converts every recurring
  *    fact-to-fact join on the same key from a full-data shuffle into
  *    a local merge (pay the shuffle once at write time, reuse it in
  *    every query).
  *
  * 2. SALTED TWO-PHASE AGGREGATION — for aggregations whose group key
  *    is pathologically skewed, spread each hot key over `salts`
  *    sub-keys, partially aggregate, then combine. Results are exactly
  *    the aggregate of the unsalted plan for any associative+
  *    commutative aggregate; BucketingSpec asserts equality.
  *    (Joins with skew are handled by AQE skew-join; this is the
  *    groupBy-side counterpart for when map-side partial aggregation
  *    alone cannot absorb a hot key's reduce-side volume.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (idempotent —
    * drops any previous incarnation so a stale managed location from
    * an interrupted run cannot block the create). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // The default in-memory catalog forgets tables across JVMs but the
    // warehouse directory persists; clear a stale managed location or
    // the create fails with LOCATION_ALREADY_EXISTS.
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both sides
    * were written with the same bucket count on the join key, the
    * physical plan contains no Exchange. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** groupBy(key).sum(valueCol) via salted two-phase aggregation. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
}
