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
  /** All fixture reads force `inferTimestampNTZ=false` (see Engine):
    * the fixture's INT64 micros timestamps are epoch-µs UTC and must
    * surface as TIMESTAMP (LTZ), not TIMESTAMP_NTZ — set here as well
    * as in Engine.configure so the loaders work on any session,
    * including a driver-owned one. The conf is SCOPED to the read
    * (parquet schema inference is eager at `spark.read.parquet`), so
    * a caller reading genuinely-NTZ parquet after a fixture load
    * keeps its own inference setting. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    withConf(spark, Engine.InferNTZ, "false") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Set a conf for the duration of `body`, restoring (or unsetting)
    * after. Fixture loads are session-sequential, so the save/restore
    * is not racing concurrent conf writers. */
  private def withConf[A](spark: SparkSession, key: String, value: String)
                         (body: => A): A = {
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` with `ts` normalized to TimestampType (µs, UTC),
    * whichever way the fixture generation encoded it:
    *
    * - TIMESTAMP(MICROS, isAdjustedToUTC=false) (current generation):
    *   read as TIMESTAMP (LTZ) via `inferTimestampNTZ=false` in
    *   [[load]] — the stored micros ARE the epoch micros.
    * - TIMESTAMP(NANOS) (older generations): Spark 4.x cannot read it
    *   natively; `spark.sql.legacy.parquet.nanosAsLong=true` surfaces
    *   it as a Long of epoch-nanos. `ts div 1000` is exact integer
    *   division (a double-rounded path would lose precision above
    *   2^53 ns) and truncates toward zero exactly like DuckDB's
    *   ns→µs read path.
    *
    * Confs are (re)set here so the loader works on any session,
    * including a driver-owned one that didn't go through
    * Engine.configure. `nanosAsLong` stays session-persistent (NOT
    * scoped like [[load]]'s NTZ pin): the legacy nanos read path
    * cannot be validated against the current micros fixture, and the
    * conf's only effect is surfacing otherwise-UNREADABLE NANOS
    * columns as Long — a benign global footprint.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set(Engine.NanosAsLong, "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
