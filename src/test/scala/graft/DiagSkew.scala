package graft

import org.apache.spark.sql.functions._

/** AQE-vs-manual-salt probe for the q34 dispatch question (VERDICT
  * r11 item 9): on the same crafted single-hot-key skew, time
  *   (a) plain shuffle join with AQE skew-join ON (the session
  *       default — Engine.configure),
  *   (b) plain shuffle join with AQE skew splitting OFF (the
  *       unmitigated baseline),
  *   (c) the q34 manual salt (probe-side uniform salt from a
  *       non-skewed per-row key, build side replicated ×16),
  * each over a join whose aggregate keys the DIM attribute (AQE's
  * sweet spot — the split only has to preserve join semantics), and
  * then the DECLINE case: the same join grouped by the JOIN KEY
  * itself, where splitting a partition would break the downstream
  * hash-distribution requirement. Broadcast is disabled throughout —
  * skew mitigation only matters for big-big shuffle joins (a
  * broadcastable dim solves skew by never shuffling the fact).
  * Numbers print as they land; the summary feeds BASELINE.md. Not a
  * test; run via `Test/runMain graft.DiagSkew [hotRows]`. */
object DiagSkew {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hot = if (args.nonEmpty) args(0).toInt else 4000000
    val uniform = hot / 2
    val dir = java.nio.file.Files.createTempDirectory("diagskew").toString
    // one hot key (k=1) + 200 uniform keys; a payload column keeps
    // shuffle bytes realistic (key-only shuffles under-state skew)
    spark.range(hot).select(lit(1L).as("k"), col("id").as("v"),
        concat(lit("pay"), col("id") % 1000).as("pay"))
      .union(spark.range(uniform).select((col("id") % 200 + 2).as("k"),
        col("id").as("v"), concat(lit("pay"), col("id") % 1000).as("pay")))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(202).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")

    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9
    }
    def withConfs[A](confs: (String, String)*)(body: => A): A = {
      val old = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
      try { confs.foreach { case (c, x) => spark.conf.set(c, x) }; body }
      finally old.foreach {
        case (c, Some(x)) => spark.conf.set(c, x)
        case (c, None)    => spark.conf.unset(c)
      }
    }
    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // fixture-scale partitions are small; scale the skew thresholds
      // the way the 128 MB defaults relate to production partitions
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

    def aggByDim() = fact.join(dim, "k")
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def aggByJoinKey() = fact.join(dim, "k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    def salted() = {
      val s = 16
      val f = fact.withColumn("salt", pmod(hash(col("v")), lit(s)))
      val d = dim.select(col("k"), col("name"),
        explode(sequence(lit(0), lit(s - 1))).as("salt"))
      f.join(d, Seq("k", "salt"))
        .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    }
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }

    // warmup
    withConfs(noBroadcast: _*) { aggByDim().collect() }

    withConfs(noBroadcast: _*) {
      val p = new java.util.concurrent.atomic.AtomicReference[String]
      val ta = t { p.set(planOf(aggByDim())) }
      println(f"[diagskew] (a) AQE-on plain join:   $ta%6.2f s  skewSplit=${p.get.contains("skew=true")}")
    }
    withConfs(noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      val tb = t { aggByDim().collect() }
      println(f"[diagskew] (b) skew-split OFF:      $tb%6.2f s")
    }
    withConfs(noBroadcast: _*) {
      val tc = t { salted().collect() }
      println(f"[diagskew] (c) manual salt (q34):   $tc%6.2f s")
    }
    withConfs(noBroadcast: _*) {
      val p = new java.util.concurrent.atomic.AtomicReference[String]
      val td = t { p.set(planOf(aggByJoinKey())) }
      println(f"[diagskew] (d) group by JOIN KEY, AQE-on: $td%6.2f s  skewSplit=${p.get.contains("skew=true")}")
    }
    withConfs(noBroadcast: _*) {
      // the manual fallback for (d): salt rides through BOTH the join
      // and a two-level aggregation (partial per (k, salt), then final
      // per k), so no single task owns the hot key anywhere
      val s = 16
      val f = fact.withColumn("salt", pmod(hash(col("v")), lit(s)))
      val d = dim.select(col("k"), explode(sequence(lit(0), lit(s - 1))).as("salt"))
      val te = t {
        f.join(d, Seq("k", "salt"))
          .groupBy(col("k"), col("salt"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .groupBy(col("k"))
          .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
          .collect()
      }
      println(f"[diagskew] (e) salt join+2-level agg:     $te%6.2f s")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
