package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.Layout

/** Range-clustered layout: same rows, same query, measured row-group
  * min/max skipping (see `plans/Layout.scala` for the 100 TB claim). */
class LayoutSpec extends SparkSpec {

  test("range-clustered write makes the scan decode only the matching value range") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    // INT96 (Spark's default parquet timestamp encoding, kept for
    // legacy interop) carries NO min/max statistics and cannot be
    // translated to a parquet filter predicate — it silently disables
    // everything this layout exists for. Write modern TIMESTAMP_MICROS;
    // at 100 TB this one conf is the difference between skipping and
    // decoding the corpus (first measured here: the INT96 run decoded
    // all 15000 rows under BOTH layouts).
    try withConfs(
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") {
      // Tables.load reads orderdate as LTZ (inferTimestampNTZ=false);
      // the cast is a no-op belt-and-braces — an NTZ column here would
      // silently void the test, because NTZ predicates never reach the
      // parquet reader in this Spark version (pinned below).
      val orders = Tables.orders(spark, sf01)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      val total = orders.count()

      // Same rows twice: clustered by the predicate column vs an
      // arrival-ordered stand-in (hash-shuffled by an unrelated key —
      // every file ends up covering the full date range, the shape a
      // raw ingest produces).
      Layout.writeRangeClustered(orders, s"$dir/clustered", 16, "o_orderdate")
      orders.repartition(16, col("o_custkey"))
        .write.mode("overwrite").parquet(s"$dir/arrival")

      // ~3 months of the fixture's 1995–2001 span (~3-4% of rows).
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1996-03-31").cast("timestamp")
      def slice(path: String) = spark.read.parquet(path)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)

      // The predicate must reach the parquet reader on BOTH layouts —
      // the difference below is then attributable to layout alone.
      Seq(s"$dir/clustered", s"$dir/arrival").foreach { p =>
        val scan = slice(p).queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        assert(scan.nonEmpty && scan.head.metadata("PushedFilters")
            .contains("GreaterThanOrEqual(o_orderdate"),
          s"range predicate not pushed for $p: ${scan.headOption.map(_.metadata)}")
      }

      // Identical results on both layouts (decimal sum: a double SUM
      // is reduce-order-dependent, and the two layouts reduce in
      // different orders by construction).
      def key(path: String) = slice(path)
        .agg(count(lit(1)),
          sum(col("o_totalprice").cast("decimal(18,2)")),
          min("o_orderkey"), max("o_orderkey")).collect().head.toSeq
      assert(key(s"$dir/clustered") === key(s"$dir/arrival"))

      val matching = slice(s"$dir/arrival").count()
      assert(matching > 0 && matching < total / 10,
        s"fixture slice not selective enough ($matching of $total) — test vacuous")

      // The measurement: arrival order decodes everything (every row
      // group's [min,max] spans the whole corpus timeline, so min/max
      // stats skip nothing); the clustered layout decodes only the row
      // groups whose range intersects the slice.
      val decodedArrival = Layout.decodedRows(slice(s"$dir/arrival"))
      val decodedClustered = Layout.decodedRows(slice(s"$dir/clustered"))
      assert(decodedArrival === total,
        s"expected the arrival layout to decode all $total rows, got $decodedArrival")
      assert(decodedClustered >= matching,
        s"decoded $decodedClustered < $matching matching rows — metric broken")
      assert(decodedClustered * 4 <= decodedArrival,
        s"clustered layout decoded $decodedClustered of $decodedArrival — no skipping")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("z-order: a non-leading-column predicate skips under Morton layout, not under linear") {
    val dir = java.nio.file.Files.createTempDirectory("layout_z").toString
    try {
      // 500×500 grid: x and y independent uniform — the adversarial
      // case for linear clustering (y carries no information about x).
      val grid = spark.range(250000).select(
        (col("id") % 500).as("x"),
        (col("id") / 500).cast("long").as("y"),
        col("id").as("payload"))

      // 64 z files: file boundaries come from SAMPLED range
      // partitioning of the z value, so a file can straddle a Morton
      // cell; finer files keep the straddle slack small relative to
      // the per-column band width (measured: 16 files put the
      // leading-column decode at ~52%, 64 at ~30%).
      Layout.writeRangeClustered(grid, s"$dir/linear_x", 16, "x")
      Layout.writeZOrdered(grid, s"$dir/zorder", 64, Seq("x", "y"))
      grid.repartition(16, col("payload"))
        .write.mode("overwrite").parquet(s"$dir/arrival")

      // y-only slice (10% of rows): linear-by-x knows nothing about y
      // — every file's y min/max spans the full domain — while each
      // z-ordered file covers a narrow y band.
      def slice(path: String) = spark.read.parquet(path)
        .filter(col("y") >= 300 && col("y") < 350)
      def key(path: String) = slice(path)
        .agg(count(lit(1)), sum(col("payload")), min(col("x")), max(col("x")))
        .collect().head.toSeq
      assert(key(s"$dir/zorder") === key(s"$dir/arrival"))
      assert(key(s"$dir/linear_x") === key(s"$dir/arrival"))

      val total = grid.count()
      val decodedArrival = Layout.decodedRows(slice(s"$dir/arrival"))
      val decodedLinear  = Layout.decodedRows(slice(s"$dir/linear_x"))
      val decodedZ       = Layout.decodedRows(slice(s"$dir/zorder"))
      assert(decodedArrival === total)
      assert(decodedLinear === total,
        s"linear-by-x unexpectedly skipped for a y predicate ($decodedLinear of $total)")
      assert(decodedZ * 2 <= total,
        s"z-order decoded $decodedZ of $total — no multi-column skipping")

      // The leading column keeps (coarser) skipping too: an x slice
      // still collapses under z-order, just less tightly than under
      // its dedicated linear layout.
      def xslice(path: String) = spark.read.parquet(path)
        .filter(col("x") >= 300 && col("x") < 350)
      val zx = Layout.decodedRows(xslice(s"$dir/zorder"))
      assert(zx * 2 <= total,
        s"z-order decoded $zx of $total for the leading column — lost x skipping")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }

  test("pinned: TIMESTAMP_NTZ range predicates do not reach the parquet reader") {
    // Empirical pin of the Spark 4.1.2 gap Layout's Scaladoc documents:
    // the identical clustered layout skips nothing when the clustering
    // column is NTZ, because the predicate is never translated into a
    // parquet FilterPredicate (stats are present — measured — and the
    // Spark-side PushedFilters metadata still lists the filter). If a
    // Spark upgrade makes this fail, the Layout Scaladoc note and the
    // LTZ cast in the test above can both be dropped.
    val dir = java.nio.file.Files.createTempDirectory("layout_ntz").toString
    // The engine reads all fixture timestamps as LTZ (inferTimestampNTZ
    // =false, Engine/Tables); this pin needs a genuinely NTZ column, so
    // re-enable inference locally and rebuild an NTZ frame by cast.
    try withConfs(
      "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
      Engine.InferNTZ -> "true") {
      val orders = Tables.orders(spark, sf01)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))
      // Tables.load scopes its inference-off pin to the fixture read
      // (round 11), so the withConfs override above still governs the
      // NTZ read-back below.
      val total = orders.count()
      Layout.writeRangeClustered(orders, s"$dir/ntz", 16, "o_orderdate")
      val slice = spark.read.parquet(s"$dir/ntz")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-03-31").cast("timestamp_ntz"))
      assert(Layout.decodedRows(slice) === total,
        "NTZ pushdown now works — drop this pin and Layout's NTZ caveat")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}
