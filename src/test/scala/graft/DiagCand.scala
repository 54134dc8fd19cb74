package graft.queries

import graft.Engine
import org.apache.spark.sql.functions._

/** One-off: candidate-pair and candidate-doc counts of the n-gram
  * prefix self-join per decade — sizes the verify semi-filter's
  * broadcast (round 14). Not a test. */
object DiagCand {
  def main(args: Array[String]): Unit = {
    val parts = if (args.length > 1) args(1) else "32"
    val threads = if (args.length > 2) args(2) else "32"
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sh = NorthStar.shingleSets(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val ex = sh.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
      .select(col("doc_id"), col("n"), xxhash64(col("g")).as("gh"))
    val gdf = ex.groupBy(col("gh")).agg(count(lit(1)).as("gdf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("gdf"), col("gh"))
    val prefix = ex.join(gdf, "gh")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("n") - expr("(4*n + 4) div 5") + 1)
      .select(col("doc_id"), col("gh"))
      .localCheckpoint(true)
    System.gc()
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    val nc = cand.count()
    val docsA = cand.select(col("doc_a")).distinct().count()
    val docsB = cand.select(col("doc_b")).distinct().count()
    // How many candidates survive the PPJoin length filter when it is
    // applied on NARROW size columns BEFORE any array attach — sizes
    // the verify stage's wide intermediate.
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      .localCheckpoint(true)
    val kept = cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
      .count()
    println(f"DIAGCAND dir=$dir prefixRows=${prefix.count()} cand=$nc " +
      f"docsA=$docsA docsB=$docsB lengthKept=$kept")
    spark.stop()
  }
}
