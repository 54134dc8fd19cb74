package graft

import org.apache.spark.sql.SparkSession

import graft.sources.TextCorpus

/** The reference's CLI contract (/root/reference/README.md:16,
  * src/main.cpp:276-282): `tema1 <noOfMapThreads> <noOfReduceThreads>
  * <inputFile>`, writing `a.txt`…`z.txt` to the current directory.
  *
  * Thread counts map onto Spark's resources instead of pthread pools:
  * M+R bounds local parallelism (the reference runs M+R concurrent
  * threads total) and R becomes the shuffle-partition hint — the
  * reference's reduce-side parallelism (main.cpp:357-387). On a real
  * cluster both are submit-time settings; the args are honored here so
  * the CLI is a drop-in for the reference invocation. An optional 4th
  * arg overrides the output directory (the reference always writes to
  * the CWD, main.cpp:161) so callers need not pollute it.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: <noOfMapThreads> <noOfReduceThreads> <inputFile> [outDir]")
      sys.exit(1)
    }
    val m = args(0).toInt
    val r = args(1).toInt
    require(m >= 1 && r >= 1, "thread counts must be >= 1")
    val manifest = args(2)
    val outDir = if (args.length > 3) args(3) else "."
    // In a JVM that already holds a session (tests), getOrCreate
    // reuses it — then master/partition settings stay as-is and the
    // session is left running for its owner.
    val owned = SparkSession.getDefaultSession.isEmpty
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[${m + r}]")
      .appName("graft-tema1")
      .config("spark.sql.shuffle.partitions", r.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try TextCorpus.buildIndex(spark, manifest, outDir)
    finally if (owned) spark.stop()
  }
}
