package graft.queries

import graft.Engine

import org.apache.spark.sql.functions._

/** q18f decomposition probe (round 13): times the shingle frame, each
  * pair pipeline, and the label loop (iteration count + per-iteration
  * cost) separately. Not a test; `Test/runMain graft.queries.DiagClosure
  * [dir] [shufflePartitions] [threads]`.
  *
  * LOCAL-DISK posture (the 1000× point): on a cluster, aggregate
  * shuffle disk scales with executors; one machine's does not. The
  * probe therefore truncates lineage after each SEQUENTIAL phase
  * (localCheckpoint + System.gc, plus the mid-phase prefix
  * checkpoint in the n-gram pipeline) so a phase's shuffle files are
  * reclaimed before the next peaks — per-hop timings are unaffected;
  * only the cross-phase disk overlap is removed. Production q18f
  * keeps both pipelines in one job: the overlap buys parallelism a
  * cluster has the disk to hold. (zstd shuffle compression was
  * evaluated for this probe and REJECTED: at the JDK-default 2
  * GCLocker retries its longer JNI critical sections starved G1
  * faster and harder than lz4 under 16 concurrent codec tasks —
  * and on hash-dominated shuffle data its ratio advantage was not
  * observed to matter.) */
object DiagClosure {
  def main(args: Array[String]): Unit = {
    val parts = if (args.length > 1) args(1) else "32"
    // args(2) = local thread count: the decade points model a cluster
    // that GROWS with the data — per-task memory slice is the posture
    // under audit, so at the biggest decade we hold the slice constant
    // (heap / threads) instead of letting 32 threads shrink it 1000×
    // below any real executor's.
    val threads = if (args.length > 2) args(2) else "32"
    // Partition count is an ARG, not an env var: `sbt -client` forks
    // the runMain JVM from the long-lived sbt SERVER, whose
    // environment was captured at server start — a client-side env
    // assignment silently never arrives. Program args do.
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    // warmup
    Q18DedupExact.run(spark, dir)
      .write.format("noop").mode("overwrite").save()
    var sh: org.apache.spark.sql.DataFrame = null
    val tSh = t { sh = NorthStar.shingleSets(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      sh.count() }
    var mh: org.apache.spark.sql.DataFrame = null
    val tMh = t { mh = Q18bDedupMinHash.pairsFrom(sh)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true) }
    System.gc() // release the MinHash pipeline's shuffle files
    // args(3) = prefix sweeps: >1 stages the n-gram prefix by doc_id
    // residue so the rarity join/window's shuffle+sort peak divides
    // by S — the single-box lever for the 1000× point (the cluster
    // posture keeps 1: aggregate disk holds the one-job overlap).
    // "auto" sizes S from the corpus and the local spindle's free
    // space: the round-14 1000× run (5M docs = 1.2 GB documents
    // parquet, sweeps 4/4) peaked ~23 GB transient, implying an
    // unswept n-gram-phase transient of ~70 GB per 1.2 GB of corpus
    // with the hashed verify + narrow pre-filter in; a sweep divides
    // the dominant parts ~linearly. Keep half the free space as
    // headroom — a heuristic with a printed trace, not a guarantee.
    val sweeps =
      if (args.length > 3 && args(3) != "auto") args(3).toInt
      else if (args.length > 3) {
        val doc = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
        val fs = doc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val corpusGb = fs.getContentSummary(doc).getLength / 1e9
        val freeGb = java.nio.file.Files.getFileStore(
          java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp")))
          .getUsableSpace / 1e9
        val transientGb = 70.0 * (corpusGb / 1.2)
        val s = math.max(1, math.ceil(transientGb / (freeGb * 0.5)).toInt)
        val clamped = math.min(16, s)
        println(f"DIAG auto-sweeps: corpus=$corpusGb%.2f GB free=$freeGb%.1f GB " +
          f"est-transient=$transientGb%.1f GB -> sweeps=$clamped")
        clamped
      } else 1
    // args(4) = verify sweeps (same lever for the verify's wide
    // candidate intermediate; defaults to the prefix sweep count).
    val vSweeps = if (args.length > 4) args(4).toInt else sweeps
    var ng: org.apache.spark.sql.DataFrame = null
    val tNg = t { ng = Q18dDedupNgram.pairsFrom(sh,
        materializePrefix = true, prefixSweeps = sweeps,
        verifySweeps = vSweeps)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(true) }
    sh.unpersist()
    System.gc() // release the n-gram pipeline's shuffle files
    println(f"DIAG shingles=$tSh%.2f minhashPairs=$tMh%.2f (${mh.count()}) " +
      f"ngramPairs=$tNg%.2f (${ng.count()})")
    val pairs = mh.union(ng).localCheckpoint(true)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl"))
      .persist()
    println(f"DIAG nodes=${labels.count()} pairs=${pairs.count()}")
    def lblSum(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.agg(sum(col("lbl"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = -1L
    var curSum = lblSum(labels)
    var iters = 0
    val tLoop = t {
      while (curSum != prevSum) {
        iters += 1
        val it = t {
          val nbrMin = edges.join(labels, edges("dst") === labels("id"))
            .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
          val next = labels.as("o")
            .join(nbrMin, col("o.id") === nbrMin("src"), "left")
            .select(col("o.id").as("id"),
              least(col("o.lbl"), coalesce(col("nlbl"), col("o.lbl"))).as("lbl"))
            .persist()
          prevSum = curSum
          curSum = lblSum(next)
          labels.unpersist()
          labels = next
        }
        println(f"DIAG iter=$iters sec=$it%.2f sum=$curSum")
      }
    }
    println(f"DIAG loop=$tLoop%.2f iters=$iters")
    spark.stop()
  }
}
