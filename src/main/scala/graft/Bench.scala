package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * The action is a noop-format write — unlike `count()`, it executes
  * the complete physical plan (projections, sorts, formatting) without
  * collecting to the driver, so timings reflect real work. Failures are
  * recorded as -1 and reported on stderr, never as fast successes.
  * The JSON line is printed after `spark.stop()` so no executor log
  * noise can interleave with it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed warmup: JIT + codegen + parquet-footer caches otherwise
    // land entirely on whichever query happens to run first.
    try {
      val q1 = SparkEntry.all.head
      q1.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      val sec =
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            -1.0
        }
      q.name -> sec
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
