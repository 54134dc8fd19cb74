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
  private val Usage =
    "usage: <noOfMapThreads> <noOfReduceThreads> <inputFile> [outDir]"

  def main(args: Array[String]): Unit = {
    val parsed = if (args.length < 3) None else
      (args(0).toIntOption, args(1).toIntOption) match {
        case (Some(m), Some(r)) if m >= 1 && r >= 1 => Some((m, r))
        case _ => None
      }
    if (parsed.isEmpty) {
      // Same failure shape as the reference (usage line + nonzero
      // exit, main.cpp:277-282) for any malformed invocation.
      System.err.println(Usage)
      sys.exit(1)
    }
    val (m, r) = parsed.get
    val manifest = args(2)
    val outDir = if (args.length > 3) args(3) else "."
    // A JVM that already holds a session (tests, embedding apps) keeps
    // it UNTOUCHED — going through the builder would apply modifiable
    // configs (shuffle.partitions) to the existing session. Only a
    // fresh standalone run builds (and owns, and stops) a session
    // sized by the reference's thread arguments.
    SparkSession.getDefaultSession match {
      case Some(existing) =>
        TextCorpus.buildIndex(existing, manifest, outDir)
      case None =>
        val spark = Engine.configure(SparkSession.builder()
          .master(s"local[${m + r}]")
          .appName("graft-tema1")
          .config("spark.sql.shuffle.partitions", r.toString))
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try TextCorpus.buildIndex(spark, manifest, outDir)
        finally spark.stop()
    }
  }
}
