package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture loaders (FIXTURES.md). One accessor per table so every query
  * reads through the same canonicalization — in particular the
  * nanosecond→microsecond truncation on `events.ts`, which must agree
  * exactly with the DuckDB oracle's ns→µs truncation.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with `ts` normalized to TimestampType (µs, UTC).
    *
    * The fixture stores TIMESTAMP(NANOS) which Spark 4.x cannot read
    * natively; `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it
    * as a Long of epoch-nanos. `ts div 1000` is exact integer division
    * (a double-rounded path would lose precision above 2^53 ns) and
    * truncates toward zero exactly like DuckDB's ns→µs read path.
    * Conf is (re)set here so the loader works on any session, including
    * a driver-owned one that didn't go through Engine.configure.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set(Engine.NanosAsLong, "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
