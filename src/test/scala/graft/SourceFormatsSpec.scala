package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth (SURVEY §1.1): the engine's tables are
  * format-agnostic DataFrames — the same queries run whether a table
  * arrives as parquet (fixtures), CSV, or JSON lines, provided the
  * source is read with an explicit schema (schema inference is a
  * scale anti-pattern: it reads the data twice and can silently
  * change types between runs). Also pins the partitioned-write
  * contract the letter sink and q19b rely on: partition values become
  * directories, and a partition filter prunes the scan. */
class SourceFormatsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars"))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("CSV roundtrip with explicit schema == parquet source") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    // quote/escape defaults handle embedded commas; header off — the
    // explicit schema, not a header line, names the columns
    docs.write.option("quote", "\"").option("escape", "\"").csv(s"$dir/data")
    val back = spark.read.schema(docSchema)
      .option("quote", "\"").option("escape", "\"").csv(s"$dir/data")
    assert(back.schema === docSchema)
    val a = docs.orderBy(col("doc_id")).collect().map(_.toSeq)
    val b = back.orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("JSON-lines roundtrip with explicit schema == parquet source") {
    val dir = Files.createTempDirectory("fmt_json").toString
    docs.write.json(s"$dir/data")
    val back = spark.read.schema(docSchema).json(s"$dir/data")
    assert(back.schema === docSchema)
    val a = docs.orderBy(col("doc_id")).collect().map(_.toSeq)
    val b = back.orderBy(col("doc_id")).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("queries are source-agnostic: Q1 over a CSV-backed documents table") {
    val dir = Files.createTempDirectory("fmt_q1").toString
    Tables.documents(spark, sf)
      .write.option("quote", "\"").option("escape", "\"")
      .csv(s"$dir/documents.csv")
    val csvDocs = spark.read
      .schema(spark.read.parquet(s"$sf/documents.parquet").schema)
      .option("quote", "\"").option("escape", "\"")
      .csv(s"$dir/documents.csv")
    val fromCsv = queries.InvertedIndex
      .index(csvDocs.select(col("doc_id"), col("text")))
      .orderBy(col("df").desc, col("word").asc).collect().map(_.toSeq)
    val fromParquet = queries.InvertedIndex
      .index(docs.select(col("doc_id"), col("text")))
      .orderBy(col("df").desc, col("word").asc).collect().map(_.toSeq)
    assert(fromCsv.sameElements(fromParquet) && fromCsv.nonEmpty)
  }

  test("partitioned parquet write prunes: only the filtered lang is scanned") {
    val dir = Files.createTempDirectory("fmt_part").toString
    docs.write.partitionBy("lang").parquet(s"$dir/data")
    // one directory per lang on disk
    val langDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.length === 5 && langDirs.head === "lang=de")
    val q = spark.read.parquet(s"$dir/data").filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in:\n$scan")
    assert(q.count() === docs.filter(col("lang") === "en").count())
  }
}
