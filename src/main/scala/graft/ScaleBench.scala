package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Scaling-curve harness for the dedup family (the 100 TB workhorse):
  * times q18/q18b/c/d/e/f at sf0.1 and at a synthesized 10× corpus,
  * printing one JSON line per scale plus the 10×/1× ratio per query.
  *
  * The 10× corpus (written once to /tmp/graft_scale10) must scale the
  * WORKLOAD honestly, not just the row count:
  *  - documents: ten copies with every token given a copy-specific
  *    suffix — a bijective shingle transform, so each copy reproduces
  *    the original near-dup pair structure exactly while sharing ZERO
  *    shingles (and so zero band/prefix/chunk collisions) across
  *    copies. Naive duplication instead makes every doc a near-dup of
  *    its 9 clones — pair count ×100, a different workload, not a
  *    scale-up of this one.
  *  - embeddings: ten copies, each rotated by its copy index — an
  *    orthogonal transform, so within-copy cosines (and the near-dup
  *    pairs q18e reports) are preserved exactly while cross-copy
  *    directions decorrelate.
  * doc/vec ids offset by copy·10⁷ to stay disjoint.
  *
  * Run in a QUIET window (no concurrent sbt test / bench): one untimed
  * warmup absorbs JIT+codegen, each query then gets min-of-2 samples.
  */
object ScaleBench {
  private val Scale10Dir = "/tmp/graft_scale10"
  private val Scale100Dir = "/tmp/graft_scale100"
  private val Scale1000Dir = "/tmp/graft_scale1000"
  private val Copies = 10
  private val IdOffset = 10000000L

  /** PAGE-CACHE PROTOCOL for the deep decades (VERDICT r18 #4): the
    * gates' full decides moved 2× between rounds 17 and 18 at 1000×
    * purely on OS page-cache temperature, which made decade tables
    * unfalsifiable round-over-round. Every deep-decade (100×/1000×)
    * section now re-reads the decade corpus's raw parquet bytes ONCE
    * before its first timed point, so every emitted row is measured
    * page-cache HOT — the state a long-running production job's
    * working set sits in — and the JSON decade rows carry an explicit
    * `"cache":"hot"` label (BASELINE records the protocol; a future
    * cold-state study would drop the pre-read and relabel). The
    * pre-read is a driver-side sequential pass (~1 GB at 1000×,
    * seconds), never timed. No-op outside the deep-decade dirs —
    * 1×/10× rows keep their historical mixed-state floors. */
  private def warmPageCache(dir: String): Unit =
    if (dir == Scale100Dir || dir == Scale1000Dir ||
        dir.startsWith("/tmp/graft_openvocab")) {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.isDirectory(root)) {
        import scala.jdk.CollectionConverters._
        val buf = new Array[Byte](1 << 20)
        val files = {
          val s = java.nio.file.Files.walk(root)
          try s.iterator().asScala.filter(p =>
            java.nio.file.Files.isRegularFile(p)).toVector
          finally s.close()
        }
        files.foreach { p =>
          val in = java.nio.file.Files.newInputStream(p)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      }
    }

  /** Third decade (100×), documents only: the queries whose 10× ratio
    * sits ≥2.2 are all text-side (q18d/q18f/q26/q58/q60), and a
    * second hop is what separates structure (ratio grows again —
    * superlinear term) from slack (ratio flattens toward ~10 — the
    * fixed costs are amortized and the blocked joins are linear).
    * Same bijective '#k' suffix transform as the 10× corpus, built in
    * ONE pass via explode(sequence) rather than a 100-branch union.
    * Disable with SPARK_GRAFT_SCALE100=0. */
  private def synthesize100(spark: SparkSession, sfDir: String): Unit =
    synthesizeNx(spark, sfDir, Scale100Dir, 100)

  /** Fourth decade (1000×): the same bijective recipes, one more hop
    * — the occupancy²/Σg² fixes were tuned ON the third decade, so
    * this is the decade that confirms them PAST their tuning point.
    * ~1.3 GB on disk; opt-in via SPARK_GRAFT_SCALE1000=1. */
  private def synthesize1000(spark: SparkSession, sfDir: String): Unit =
    synthesizeNx(spark, sfDir, Scale1000Dir, 1000)

  private def synthesizeNx(spark: SparkSession, sfDir: String,
      scaleDir: String, copies: Int): Unit = {
    // Reuse keyed on a SOURCE fingerprint, not bare existence (the
    // q57b ensureStore rule): a 100x corpus synthesized from an older
    // or different fixture would silently corrupt the hop-2 ratios.
    val fpFile = java.nio.file.Paths.get(s"$scaleDir/_source_fingerprint")
    val srcFp = {
      val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      sfDir + "|" + fs.listStatus(p).filter(_.isFile)
        .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
        .sorted.mkString("|")
    }
    // N× embeddings (deep-decade points for the ANN store): N
    // bijective norm-preserving copies — rotate by k mod dim, negate
    // the second half — so distance structure scales honestly, like
    // the 10× recipe. Written by its own guard so a scale dir
    // synthesized before this table existed gains it without a doc
    // rewrite.
    def writeEmbsN(): Unit = {
      val embs = Tables.embeddings(spark, sfDir)
      (0 until copies).map { k =>
        val r = k % 64
        val rotSql =
          if (r == 0) "embedding"
          else s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
            s"slice(embedding, 1, $r))"
        embs.select(
          (col("vec_id") + lit(k.toLong * IdOffset)).as("vec_id"),
          expr(if (k < copies / 2) rotSql else s"transform($rotSql, x -> -x)")
            .as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
        .repartition(if (copies >= 1000) 64 else 16)
        .write.mode("overwrite").parquet(s"$scaleDir/embeddings.parquet")
    }
    if (java.nio.file.Files.exists(fpFile) &&
        new String(java.nio.file.Files.readAllBytes(fpFile), "UTF-8") == srcFp) {
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$scaleDir/embeddings.parquet")))
        writeEmbsN()
      System.err.println(s"[scalebench] reusing $scaleDir (fingerprint match)")
      return
    }
    Tables.documents(spark, sfDir)
      .select(explode(expr(s"sequence(0, ${copies - 1})")).as("k"),
        col("doc_id"), col("text"), col("lang"), col("source"))
      .select(
        (col("doc_id") + col("k") * lit(IdOffset)).as("doc_id"),
        expr("array_join(transform(filter(split(text, '\\\\s+'), " +
          "t -> t != ''), x -> concat(x, '#', k)), ' ')").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(if (copies >= 1000) 256 else 64)
      .write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")
    writeEmbsN()
    java.nio.file.Files.write(fpFile, srcFp.getBytes("UTF-8"))
  }

  private def synthesize(spark: SparkSession, sfDir: String): Unit = {
    if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$Scale10Dir/embeddings.parquet"))) {
      // Reuse is keyed on existence only — if the source fixture
      // changed (or SPARK_GRAFT_SF_DIR points elsewhere), the ratios
      // would silently compare unrelated corpora. Say so loudly.
      System.err.println(
        s"[scalebench] REUSING existing $Scale10Dir — delete it to " +
          s"regenerate from $sfDir")
      return
    }
    val docs = Tables.documents(spark, sfDir)
    val embs = Tables.embeddings(spark, sfDir)
    val docCopies = (0 until Copies).map { k =>
      docs.select(
        (col("doc_id") + lit(k * IdOffset)).as("doc_id"),
        expr(s"array_join(transform(filter(split(text, '\\\\s+'), t -> t != ''), " +
          s"x -> concat(x, '#$k')), ' ')").as("text"),
        col("lang"), col("source"))
        // n_chars recomputed from the rewritten text — copying the
        // original's count would leave the synthesized corpus
        // internally inconsistent for any n_chars-consuming query
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    docCopies.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$Scale10Dir/documents.parquet")
    val embCopies = (0 until Copies).map { k =>
      embs.select(
        (col("vec_id") + lit(k * IdOffset)).as("vec_id"),
        // width from the data, not a hardcoded 64: a changed fixture
        // dimension must rotate, never silently truncate, the vectors
        (if (k == 0) col("embedding")
         else expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k), " +
           s"slice(embedding, 1, $k))")).as("embedding"),
        col("label"))
    }
    embCopies.reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$Scale10Dir/embeddings.parquet")
  }

  private val family: Seq[GraftQuery] = Seq(
    Q18DedupExact, Q18bDedupMinHash, Q18cDedupSimHash,
    Q18dDedupNgram, Q18eDedupEmbedding, Q18fDedupClusters,
    // the round-8 training-data assembly ops ride the same corpus:
    // q46's gram-hash join is the other blocked-join workhorse, q47
    // is the per-row ceiling, q48 the windowed-fill shape
    Q46Decontaminate, Q47Repetition, Q48MixSample,
    // the inverted-index/TF-IDF family — the reference's own workload.
    // On the 10x corpus the '#k' token suffixes are letters-stripped by
    // the normalizer, so all ten copies share ONE vocabulary: 10x docs,
    // same distinct words, 10x-longer posting lists. That is the honest
    // scale-up for THIS family (real corpora grow tokens much faster
    // than vocabulary) — the word-keyed shuffle carries 10x rows into
    // the same number of groups, exactly the skew profile a 100 TB
    // corpus presents. (The dedup family above reads the suffixes
    // pre-normalization, where they keep cross-copy shingles disjoint.)
    InvertedIndex, Q20TopTermsPerLang, Q26TfIdf,
    // similarity search over the rotated 10x embeddings: exact top-k
    // is the linear-scan baseline (must grow ~linearly once slack is
    // gone), IVF is the scale path (probes a fixed fraction of
    // inverted lists — its ratio should sit well under exact's)
    Q19SimilarityTopK, Q19dAnnIvf,
    // the round-9 scoring ops: q54's LM rides the shared-vocabulary
    // property like the index family (10x docs, same bigram keys,
    // 10x-hotter counts — the Zipf join profile); q55 is the pure
    // map-over-every-byte floor, which must scale ~linearly
    Q54LmPerplexity, Q55ClassifierScore,
    // q56 is per-row explode (must stay ~linear-in-slack); q57's band
    // join crosses the split boundary, so its candidate growth tracks
    // the dedup family's blocked-join profile
    Q56ChunkWindows, Q57DeltaDedup,
    // q60's 8-token windows inherit the dedup family's suffix
    // disjointness (spans are pre-normalization token sequences, so
    // copies share zero span hashes): 10x spans into 10x distinct
    // keys — the uniform-key shuffle that must scale ~linearly
    Q60RepeatedSpans,
    // q64 rides the shared-vocabulary property the hardest: the 10x
    // corpus has 10x tokens but the SAME word set (suffixes are
    // letter-stripped by the normalizer), so the learned trajectory is
    // identical (counts x10, same argmax order) and every iteration
    // touches the same vocab-sized frame — only the initial corpus
    // scan grows, so the ratio must sit FAR below 10. q64b adds the
    // corpus-sized encode join, so its ratio prices scan+join growth
    // against the fixed learning loop
    Q64BpeMerges, Q64bBpeEncode,
    // q68 is the sketch-bounded counterpoint to q26's full-vocab
    // shuffle: 10x tokens, same 31-word vocabulary, and the verify
    // shuffle stays <= k*P+1 rows regardless of corpus size — both
    // passes are map-heavy scans, so the ratio must track the scan
    // (linear-in-slack), never the vocabulary
    Q68HeavyHitters,
    // q64c prices the driver-local learning tier against q64's
    // job-per-merge loop on the same corpus: the corpus scan grows
    // 10x but the collected vocab (shared-vocabulary property) and
    // the in-memory trajectory are IDENTICAL, so its ratio must track
    // the scan alone — and its absolute floor shows the per-merge
    // cost collapsing vs q64 (no per-iteration Spark jobs at all)
    Q64cBpeMergesLocal,
    // q69's two-pass exact rank: both passes are corpus scans with
    // O(P)-scalar driver traffic, so the ratio must track the scan
    Q69ScoreDeciles,
    // the image tier: q25c is the map-only batched codec pass (PNG
    // encode+decode per image — per-row CPU, must scale ~linearly in
    // images once slack is gone); q25d adds the banded self-join on
    // 16-hex hashes — candidate growth is the thing to watch: 10x
    // images into 8 one-byte bands means denser buckets, so its
    // ratio prices the LSH bucket-collision profile at scale
    graft.multimodal.Q25cImageFeatures, graft.multimodal.Q25dImageNearDup,
    // the composed end-to-end pipeline: its ratio prices the SUM of
    // the chain's scale behaviors (dominated by the q18f closure)
    Q58TrainingShards)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark, sfDir)
    // Failure-contained like Bench.time: one OOM in a 100x-corpus run
    // must cost that data point, not the whole multi-hop measurement
    // (results only print at the end).
    def time1(q: GraftQuery, dir: String): Double =
      try {
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[scalebench] ${q.name} @ $dir FAILED: ${e.getMessage}")
          -1.0
      }
    // min-of-2 that doesn't let a -1 failure masquerade as the floor
    def best2(q: GraftQuery, dir: String): Double = {
      val (a, b) = (time1(q, dir), time1(q, dir))
      val ok = Seq(a, b).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    // SPILL-AWARE shuffle sizing for the deep decades (SURVEY §4.2
    // "size shuffle partitions so partitions fit in executor memory
    // at the target SF" — the cluster-conf knob, applied per decade
    // the way a production job sizes it per input): 32 partitions
    // carrying a 1000× corpus's exploded span/band rows sort-spill
    // every exchange and the decade hop goes superlinear (measured:
    // q60c 100×→1000× hop 35× at 32 partitions). AQE coalesces small
    // partitions, so a larger base number costs the small decades
    // nothing; it only caps per-partition sort/agg state at depth.
    def partitionsFor(dir: String): Int = dir match {
      case Scale1000Dir => 8 * cpus.toInt
      case Scale100Dir  => 2 * cpus.toInt
      case _            => cpus.toInt
    }
    def withDecadeShuffle[A](dir: String)(body: => A): A = {
      val key = "spark.sql.shuffle.partitions"
      val before = spark.conf.get(key)
      spark.conf.set(key, partitionsFor(dir).toString)
      try body finally spark.conf.set(key, before)
    }
    // Optional name filter (Bench's SPARK_GRAFT_BENCH_ONLY convention):
    // curve a newly added query without re-measuring the family.
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only.fold(family)(names => family.filter(q => names(q.name)))
    def timedPicked(dir: String): Map[String, Double] = {
      warmPageCache(dir)
      val _ = time1(Q18DedupExact, dir) // warmup
      picked.map(q => q.name -> best2(q, dir)).toMap
    }
    val at1 = timedPicked(sfDir)
    val at10 = timedPicked(Scale10Dir)
    // Persisted-store lifecycle split (q57b + q65): the pay-once BUILD
    // is O(corpus) by design and must scale with the data; the SERVE
    // and REFRESH steps are delta-sized and their ratios must sit far
    // below build's. Stores.evict forces the cold start; the serve
    // point then reuses the store the build point left behind (the
    // production read path). s13's streaming refresh calls the SAME
    // partials/refresh functions as q65, so the refresh point prices
    // both. Skipped when SPARK_GRAFT_SCALE_ONLY filters it out.
    def storePoints(dir: String): Map[String, Double] = {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] store point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      graft.plans.Stores.evict(spark, "graft_sigstore")
      val build = t1(Q57bDeltaDedupStore.ensureStore(spark, dir))
      def serveOnce() = t1(Q57bDeltaDedupStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val serve = math.min(serveOnce(), serveOnce())
      graft.plans.Stores.evict(spark, "graft_aggstore")
      val statsBuild = t1(Q65IncrementalStats.ensureStore(spark, dir))
      val statsT = Q65IncrementalStats.ensureStore(spark, dir)
      val delta = Tables.documents(spark, dir)
        .filter(Q40TrainTestSplit.splitCol === "test")
      val refresh = t1(Q65IncrementalStats.refresh(spark, statsT, delta))
      graft.plans.Stores.evict(spark, "graft_sigstore")
      graft.plans.Stores.evict(spark, "graft_aggstore")
      // (Image/audio rows moved to the FOCUSED media section — VERDICT
      // r17 #3: their codec transients were the bulk of the full
      // sweep's 1000× OOM footprint.)
      // ANN-index lifecycle (q19e): build pays the one KMeans fit +
      // partitioned write; serve prices a probe against the bound
      // index (pruned scan + exact cosine). The synthesized 100×
      // corpus carries no embeddings table — those points report -1
      // there rather than faking a ratio.
      val (annBuild, annServe) =
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$dir/embeddings.parquet"))) (-1.0, -1.0)
        else {
          graft.plans.Stores.evict(spark, "graft_annstore")
          val b = t1(Q19eAnnIvfStore.ensureStore(spark, dir))
          def s1() = t1(Q19eAnnIvfStore.run(spark, dir)
            .write.format("noop").mode("overwrite").save())
          val s = math.min(s1(), s1())
          graft.plans.Stores.evict(spark, "graft_annstore")
          (b, s)
        }
      // (Excise rows moved to the FOCUSED excise section — VERDICT
      // r17 #3.)
      Map("q57b_store_build" -> build, "q57b_store_serve" -> serve,
        "q65_store_build" -> statsBuild, "q65_refresh" -> refresh,
        "q19e_store_build" -> annBuild, "q19e_store_serve" -> annServe)
    }
    val storeNames = Seq("q57b_store_build", "q57b_store_serve",
      "q65_store_build", "q65_refresh",
      "q19e_store_build", "q19e_store_serve")
    val wantStores = only.forall(names => storeNames.exists(names))
    val (st1, st10) =
      if (wantStores) (storePoints(sfDir), storePoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    // Semantic-dedup K knob (q70): within-cluster pairs are ~n²/K, so
    // a FIXED K turns 10× data into 100× pair work — K must scale
    // with the corpus to bound cluster size (the documented operating
    // rule, measured here the way bandBits' table measures the image
    // knob). k_fixed keeps K=8 at both scales (the superlinear
    // posture); k_scaled grows K with the data (bounded clusters ⇒
    // pair growth ~linear). Same verdicts are NOT expected across K —
    // the knob trades candidate recall for cost, like nProbe/bandBits.
    val semNames = Seq("q70_k_fixed", "q70_k_scaled")
    val wantSem = only.forall(names => semNames.exists(names))
    def semPoint(dir: String, k: Int): Double = {
      def once(): Double =
        try {
          val t0 = System.nanoTime()
          Q70SemanticDedup.semanticDedup(Tables.embeddings(spark, dir), k)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[scalebench] q70 k=$k @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      val ok = Seq(once(), once()).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val sem: Map[String, (Double, Double)] =
      if (!wantSem) Map.empty
      else Map(
        "q70_k_fixed" -> ((semPoint(sfDir, 8), semPoint(Scale10Dir, 8))),
        "q70_k_scaled" -> ((semPoint(sfDir, 8), semPoint(Scale10Dir, 80))))
    // Third decade: only the ≥2.2-ratio text-side queries, min-of-2.
    val deep: Seq[GraftQuery] = Seq(Q18dDedupNgram, Q18fDedupClusters,
      Q26TfIdf, Q58TrainingShards, Q60RepeatedSpans)
      .filter(q => only.forall(_(q.name)))
    val scale100Enabled = sys.env.getOrElse("SPARK_GRAFT_SCALE100", "1") != "0"
    val at100: Map[String, Double] =
      if (deep.isEmpty || !scale100Enabled) Map.empty
      else {
        synthesize100(spark, sfDir)
        val _ = time1(Q18DedupExact, Scale100Dir) // warmup on the big corpus
        deep.map(q => q.name -> best2(q, Scale100Dir)).toMap
      }
    // Store lifecycle's third decade: the build is the ONE point
    // designed to scale with the corpus — at 1×/10× it is still
    // fixed-cost-dominated, so the 100× hop is where "pay-once
    // O(corpus) build vs flat O(delta) serve/refresh" becomes a
    // measured contrast rather than a design claim.
    val st100: Map[String, Double] =
      if (!wantStores || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); storePoints(Scale100Dir) }
    // Fourth decade (opt-in: a full store-family pass at 1000×
    // costs tens of minutes, dominated by the image/audio codec
    // terms): the hop that confirms the occupancy²/Σg² fixes PAST
    // the decade they were tuned on.
    val st1000: Map[String, Double] =
      if (!wantStores ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); storePoints(Scale1000Dir) }
    // FOCUSED per-family sections (VERDICT r17 #3): the excise and
    // media families, split out of the full store sweep. One JVM
    // carrying every family's transients at once OOMed at the 1000×
    // decade (reproduced twice, HISTORY round-18 residuals); split
    // into the focused shape that already carries the ANN/DSIR/gate
    // decades, each family's fourth decade completes on this box.
    val exciseNames = Seq("q60c_full_excise", "q60c_write_excise",
      "q60d_store_build", "q60d_store_serve",
      "q60d_serve_fragmented", "q60d_serve_compacted")
    val wantExcise = only.forall(names => exciseNames.exists(names))
    def excisePoints(dir: String): Map[String, Double] = try withDecadeShuffle(dir) {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] excise point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      // Excision lifecycle (q60c/q60d, round 12): the full-corpus
      // rewrite prices the window explode + global hash agg + mask
      // reassembly; the store split prices build (train-split distinct
      // hashes, bucketed once) vs serve (delta-only hash + zero-
      // exchange store join + intra-delta window).
      val excFull = t1(Q60cExciseDuplicates.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      // PRODUCTION WRITE TIER (VERDICT r18 #2): same operator, no
      // final global sort — partitioned unsorted parquet shards
      // through the staged committer. The gap to q60c_full_excise is
      // exactly the driver-dump `orderBy(doc_id)` range-sort
      // DiagReassemble priced (39.1 vs 11.7 s at 1000×); the row pins
      // the operator's own near-linear hop as the served exit.
      val shardDir = s"/tmp/graft_excise_shards_${dir.hashCode.toHexString}"
      val excWrite = t1(Q60cExciseDuplicates.writeShards(
        Tables.documents(spark, dir), shardDir))
      graft.plans.Stores.deleteTree(java.nio.file.Paths.get(shardDir))
      graft.plans.Stores.evict(spark, "graft_spanstore")
      val excBuild = t1(Q60dExciseStore.ensureStore(spark, dir))
      def excServeOnce() = t1(Q60dExciseStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val excServe = math.min(excServeOnce(), excServeOnce())
      // COMPACTION PRICING (VERDICT r18 #3): fragment the store with
      // admit waves (each appends ≥1 file per touched bucket), price
      // a serve over the fragmented layout, compact, price the same
      // serve again — the s23b trade measured on the BATCH span
      // family. Waves slice the test split so each admit is a
      // realistic delta-sized ingest of fresh doc_ids.
      val spansT = Q60dExciseStore.ensureStore(spark, dir)
      val testDocs = Tables.documents(spark, dir)
        .filter(Q40TrainTestSplit.splitCol === "test")
        .select(col("doc_id"), col("text"))
      val waves = 8
      (0 until waves).foreach { wv =>
        Q60dExciseStore.admit(spark,
          testDocs.filter(pmod(col("doc_id"), lit(waves.toLong)) === wv),
          spansT)
      }
      def fragServeOnce() = t1(Q60dExciseStore.serve(spark, testDocs, spansT)
        .write.format("noop").mode("overwrite").save())
      val fragServe = math.min(fragServeOnce(), fragServeOnce())
      val compacted =
        if (t1(Q60dExciseStore.compactStore(spark, spansT)) < 0) -1.0
        else math.min(fragServeOnce(), fragServeOnce())
      graft.plans.Stores.evict(spark, "graft_spanstore")
      Map("q60c_full_excise" -> excFull, "q60c_write_excise" -> excWrite,
        "q60d_store_build" -> excBuild, "q60d_store_serve" -> excServe,
        "q60d_serve_fragmented" -> fragServe,
        "q60d_serve_compacted" -> compacted)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] excise section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (ex1, ex10) =
      if (wantExcise) (excisePoints(sfDir), excisePoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val ex100: Map[String, Double] =
      if (!wantExcise || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); excisePoints(Scale100Dir) }
    val ex1000: Map[String, Double] =
      if (!wantExcise ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); excisePoints(Scale1000Dir) }
    val mediaNames = Seq("q25d_bands16", "q25f_store_build",
      "q25f_store_serve", "q25h_store_build", "q25h_store_serve")
    val wantMedia = only.forall(names => mediaNames.exists(names))
    def mediaPoints(dir: String): Map[String, Double] = try withDecadeShuffle(dir) {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] media point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      // Image near-dup band-width knob: the 16-bit-band variant
      // prices the 256×-tighter buckets against q25d's 8-bit default
      // — the candidate-density lever for large image corpora; the
      // adaptive top-k surface (topPairs) since round 11.
      val wide = t1 {
        import graft.multimodal.{Q25cImageFeatures, Q25dImageNearDup}
        Q25dImageNearDup.topPairs(
            Q25cImageFeatures.extractImageFeatures(
              Q25cImageFeatures.imageTable(spark, dir)).toDF()
              .select(col("media_id"), col("dhash")), bandBits = 16)
          .write.format("noop").mode("overwrite").save()
      }
      // BUILD points are min-of-2 COLD builds (round 19): three
      // same-code same-corpus fourth-decade runs measured the single
      // -sample builds swinging 3.4 → 121 s (q25h) and 19 → 205 s
      // (q25f) on a quiet guest — host-level contention the guest
      // cannot see; the page-cache protocol (warmPageCache + the
      // "cache":"hot" label) controls the cache axis, min-of-2
      // controls the steal axis. Affordable only since the round-19
      // SPI/codegen fixes (each cold build is seconds, not minutes).
      def build2(prefix: String)(b: => Unit): Double = {
        graft.plans.Stores.evict(spark, prefix)
        val a = t1(b)
        graft.plans.Stores.evict(spark, prefix)
        val c = t1(b)
        val ok = Seq(a, c).filter(_ >= 0)
        if (ok.isEmpty) -1.0 else ok.min
      }
      // Image-store lifecycle (q25f): build pays the train-split
      // codec pass ONCE (PNG encode+decode per image — the dominant
      // term, scaling with the corpus); serve prices a delta ingest.
      val imgBuild = build2("graft_imgstore")(
        graft.multimodal.Q25fImageDedupStore.ensureStore(spark, dir))
      def imgServeOnce() = t1(graft.multimodal.Q25fImageDedupStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val imgServe = math.min(imgServeOnce(), imgServeOnce())
      graft.plans.Stores.evict(spark, "graft_imgstore")
      // Audio-store lifecycle (q25h): the image split without the PNG
      // codec term.
      val audBuild = build2("graft_audstore")(
        graft.multimodal.Q25hAudioDedupStore.ensureStore(spark, dir))
      def audServeOnce() = t1(graft.multimodal.Q25hAudioDedupStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val audServe = math.min(audServeOnce(), audServeOnce())
      graft.plans.Stores.evict(spark, "graft_audstore")
      Map("q25d_bands16" -> wide,
        "q25f_store_build" -> imgBuild, "q25f_store_serve" -> imgServe,
        "q25h_store_build" -> audBuild, "q25h_store_serve" -> audServe)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] media section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (md1, md10) =
      if (wantMedia) (mediaPoints(sfDir), mediaPoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val md100: Map[String, Double] =
      if (!wantMedia || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); mediaPoints(Scale100Dir) }
    val md1000: Map[String, Double] =
      if (!wantMedia ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); mediaPoints(Scale1000Dir) }
    // RETRIEVAL-STORE lifecycle (VERDICT r14 next #1): the positional
    // postings layout's decade points. Build pays the corpus tokenize
    // + positions aggregation once; the four serve tiers (plain BM25,
    // phrase adjacency, phrase-boost, proximity-boost) are all
    // bucket-pruned index reads whose curves must sit FAR below
    // build's — positions arrays are the store's heaviest column, so
    // this is where "phrase serve stays pruned at scale" stops being
    // a plan assert and becomes a measured claim. The s25-shaped
    // point serves the SAME phrase plan over an epoch-append
    // (unbucketed) postings table — the streaming index's layout —
    // where the term isin is a pushed scan filter instead of a
    // static bucket prune; its gap to q74c_phrase_serve prices
    // exactly what the s23b compaction buys.
    // On the synthesized corpora the '#k' suffixes are letter-
    // stripped by the normalizer (the InvertedIndex note): N× docs,
    // same vocabulary, N×-longer posting lists — the honest
    // retrieval scale-up.
    val retrNames = Seq("q74b_store_build", "q74b_store_serve",
      "q74c_phrase_serve", "q74d_boost_serve", "q74e_prox_serve",
      "s25_epoch_phrase_serve", "q74f_edge_plan_literal",
      "q74f_edge_plan_100k", "q74f_edge_serve_100k")
    val wantRetr = only.forall(names => retrNames.exists(names))
    // Fail-soft like every other section: a build that dies at one
    // decade must cost that decade's points, not the whole run (the
    // unguarded ensure would otherwise escape and kill every later
    // JSON line).
    def retrievalPoints(dir: String): Map[String, Double] = try {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] retrieval point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      graft.plans.Stores.evict(spark, "graft_bm25store")
      val build = t1(Q74bBm25Store.ensureStore(spark, dir))
      val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, dir)
      def serve(df: => DataFrame): Double = {
        def s1() = t1(df.write.format("noop").mode("overwrite").save())
        math.min(s1(), s1())
      }
      val bServe = serve(Q74bBm25Store.serveFrom(spark, postT, lenT, metaT))
      val cServe = serve(Q74cBm25PhraseStore.serveFrom(spark, postT))
      val dServe = serve(Q74dBm25PhraseBoost.serveFrom(spark, postT, lenT, metaT))
      val eServe = serve(Q74eBm25ProximityBoost.serveFrom(spark, postT, lenT, metaT))
      val epochT = "graft_scale_epoch_postings"
      graft.plans.Stores.dropManaged(spark, epochT)
      // Untimed: the stream pays the appends per epoch; this point
      // prices only the SERVE over the accumulated layout.
      val epochOk = t1(Q74Bm25.postingsOf(Tables.documents(spark, dir))
        .write.format("parquet").saveAsTable(epochT)) >= 0
      val sServe =
        if (!epochOk) -1.0
        else serve(Q74cBm25PhraseStore.serveFromFrame(spark, spark.table(epochT)))
      graft.plans.Stores.dropManaged(spark, epochT)
      // Contract-edge pricing (VERDICT r15 #3): planning + serve at
      // the query-batch ceiling's two sides. edge_plan_literal = the
      // largest literal-pruned batch (the biggest In the analyzer
      // must chew — the occupancy-derived 4·B bound); edge_*_100k =
      // the broadcast-join fallback at the MaxTerms contract edge.
      // Terms are synthetic non-matching strings — the points price
      // PLAN BUILD and the scan/join machinery, which is exactly what
      // the old unpriced caps would have blown (a flat 10⁴ literal
      // measured 4–5 s of planning for a prune worth nothing at 16
      // buckets — the round-16 threshold change).
      def edgeBatch(n: Long) = spark.range(n)
        .select((col("id") % 1000).cast("int").as("query_id"),
          concat(lit("zzedge"), col("id")).as("word"))
      def edgeScored(n: Long) = Q74bBm25Store.scoredFromQueries(
        spark, postT, lenT, metaT, edgeBatch(n))
      val edgePlanLiteral = t1 {
        edgeScored(Q74bBm25Store.LiteralPruneMaxTerms.toLong)
          .queryExecution.executedPlan }
      val edgePlan100k = t1 {
        edgeScored(Q74bBm25Store.MaxTerms.toLong)
          .queryExecution.executedPlan }
      val edgeServe100k =
        serve(Q74Bm25.topK(edgeScored(Q74bBm25Store.MaxTerms.toLong), 10))
      graft.plans.Stores.evict(spark, "graft_bm25store")
      Map("q74b_store_build" -> build, "q74b_store_serve" -> bServe,
        "q74c_phrase_serve" -> cServe, "q74d_boost_serve" -> dServe,
        "q74e_prox_serve" -> eServe, "s25_epoch_phrase_serve" -> sServe,
        "q74f_edge_plan_literal" -> edgePlanLiteral,
        "q74f_edge_plan_100k" -> edgePlan100k,
        "q74f_edge_serve_100k" -> edgeServe100k)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] retrieval section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (rt1, rt10) =
      if (wantRetr) (retrievalPoints(sfDir), retrievalPoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val rt100: Map[String, Double] =
      if (!wantRetr || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); retrievalPoints(Scale100Dir) }
    // Fourth decade for the positional store (opt-in like the other
    // 1000× passes): the build pays a ~1.3 GB tokenize + positions
    // aggregation; the serves must stay pruned-index-read flat-ish.
    val rt1000: Map[String, Double] =
      if (!wantRetr ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); retrievalPoints(Scale1000Dir) }
    // OPEN-VOCABULARY retrieval decades (VERDICT r16 #2): the N×
    // suffix corpora present N× tokens over the SAME 31 distinct
    // words, so their serve rows cannot separate "the prune holds"
    // from "every query term is a stopword of a closed vocabulary" —
    // the fourth-decade serve growth was ARGUED away on that basis.
    // This section synthesizes a deterministic ZIPFIAN open-vocabulary
    // corpus instead: token ranks are drawn log-uniformly over
    // [1, 10⁶] via xxhash64 (P(rank r) ∝ 1/r — Zipf(1) frequencies,
    // no engine RNG), so realized vocabulary GROWS with the corpus
    // (Heaps-like: rare ranks only appear in big corpora) and the
    // fixed query batch is a vanishing vocabulary fraction. The
    // serve's static bucket prune is ASSERTED on the plan before
    // timing (SelectedBucketsCount ≤ |terms| — the pinned invariant).
    val OvVocabMax = 1000000L
    val OvBaseDocs = 1000L
    val OvTokensPerDoc = 200
    /** The word the synthesis emits for rank r (digits → letters). */
    def ovWord(r: Long): String =
      "w" + r.toString.map(d => ('a' + (d - '0')).toChar)
    val ovTermBatch: Seq[(Int, Seq[String])] = Seq(
      (1, Seq(ovWord(2), ovWord(317))),      // common + mid
      (2, Seq(ovWord(51), ovWord(4211))),    // mid + rare
      (3, Seq(ovWord(9), ovWord(68111))),    // common + very rare
      (4, Seq(ovWord(1201), ovWord(250007))))// rare + tail
    val ovPhrases: Seq[(Int, Seq[String])] = Seq(
      (1, Seq(ovWord(1), ovWord(2))),
      (2, Seq(ovWord(3), ovWord(1))))
    val ovNames = Seq("ov_store_build", "ov_term_serve",
      "ov_phrase_serve", "ov_epoch_phrase_serve")
    val wantOv = only.forall(names => ovNames.exists(names))
    def ovDir(scale: Int) = s"/tmp/graft_openvocab$scale"
    def synthesizeOv(scale: Int): Unit = {
      val dir = ovDir(scale)
      val fpFile = java.nio.file.Paths.get(s"$dir/_synth_fingerprint")
      val fp = s"ov1|$OvVocabMax|$OvBaseDocs|$OvTokensPerDoc|x$scale"
      if (java.nio.file.Files.exists(fpFile) &&
          new String(java.nio.file.Files.readAllBytes(fpFile),
            "UTF-8") == fp) {
        System.err.println(s"[scalebench] reusing $dir")
        return
      }
      val rankExpr =
        s"cast(exp((pmod(xxhash64(id * 131071 + i), 1000000) + 0.5) " +
          s"/ 1000000.0 * ln(cast($OvVocabMax as double))) as bigint)"
      spark.range(OvBaseDocs * scale)
        .select(col("id").as("doc_id"),
          expr(s"array_join(transform(sequence(1, $OvTokensPerDoc), " +
            s"i -> concat('w', translate(cast($rankExpr as string), " +
            "'0123456789', 'abcdefghij'))), ' ')").as("text"),
          lit("en").as("lang"), lit("synth").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(if (scale >= 1000) 128 else 16)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      java.nio.file.Files.write(fpFile, fp.getBytes("UTF-8"))
    }
    def ovPoints(scale: Int): Map[String, Double] = try {
      synthesizeOv(scale)
      val dir = ovDir(scale)
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] ov point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      graft.plans.Stores.evict(spark, "graft_bm25store")
      val build = t1(Q74bBm25Store.ensureStore(spark, dir))
      val (postT, lenT, metaT) = Q74bBm25Store.ensureStore(spark, dir)
      import spark.implicits._
      def termServeDf() = Q74Bm25.topK(
        Q74bBm25Store.scoredFromQueries(spark, postT, lenT, metaT,
          ovTermBatch.flatMap { case (q, ts) => ts.map(q -> _) }
            .toDF("query_id", "word")), 10)
      // Pinned invariant: the postings scan bucket-prunes from the
      // batch — fail the section loudly if the prune ever drops.
      // (AQE wraps scans in adaptive/query-stage nodes — walk them.)
      def flat(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        import org.apache.spark.sql.execution.adaptive.{
          AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec        => Seq(q.plan)
          case r: ReusedExchangeExec    => Seq(r.child)
          case other                    => other.children
        }
        p +: kids.flatMap(flat)
      }
      val nTerms = ovTermBatch.flatMap(_._2).distinct.size
      val probe = termServeDf()
      probe.write.format("noop").mode("overwrite").save()
      val scans = flat(probe.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(
            _.table.startsWith("graft_bm25store_postings")) => f
      }
      require(scans.nonEmpty && scans.forall(
          _.optionalBucketSet.exists(_.cardinality() <= nTerms)),
        s"open-vocab serve lost the static bucket prune: " +
          scans.map(_.optionalBucketSet.map(_.cardinality())))
      def serve(df: => DataFrame): Double = {
        def s1() = t1(df.write.format("noop").mode("overwrite").save())
        math.min(s1(), s1())
      }
      val termServe = serve(termServeDf())
      val phraseServe = serve(Q74cBm25PhraseStore.serveFromFrame(
        spark, spark.table(postT), ovPhrases))
      // The s25 layout twin: the SAME phrase serve over an
      // epoch-append (unbucketed) postings table — pushed scan filter
      // instead of static prune, the compaction trade s23b prices.
      val epochT = "graft_scale_ov_epoch"
      graft.plans.Stores.dropManaged(spark, epochT)
      val epochOk = t1(Q74Bm25.postingsOf(Tables.documents(spark, dir))
        .write.format("parquet").saveAsTable(epochT)) >= 0
      val epochServe =
        if (!epochOk) -1.0
        else serve(Q74cBm25PhraseStore.serveFromFrame(
          spark, spark.table(epochT), ovPhrases))
      graft.plans.Stores.dropManaged(spark, epochT)
      graft.plans.Stores.evict(spark, "graft_bm25store")
      Map("ov_store_build" -> build, "ov_term_serve" -> termServe,
        "ov_phrase_serve" -> phraseServe,
        "ov_epoch_phrase_serve" -> epochServe)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(
        s"[scalebench] ov section @ ${ovDir(scale)} FAILED: ${e.getMessage}")
      Map.empty
    }
    val (ov1, ov10) =
      if (wantOv) (ovPoints(1), ovPoints(10))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val ov100: Map[String, Double] =
      if (!wantOv || !scale100Enabled) Map.empty else ovPoints(100)
    val ov1000: Map[String, Double] =
      if (!wantOv ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else ovPoints(1000)
    // Focused ANN-store decades (round 17): q19e's serve dropped its
    // per-serve membership copy — the oracle now pins the store
    // DIRECTORY (ADVICE r16) — so the lifecycle gets a re-measured
    // row without re-paying the whole store-family sweep.
    val annNames = Seq("q19e_ann_build", "q19e_ann_serve")
    val wantAnn = only.forall(names => annNames.exists(names))
    def annPoints(dir: String): Map[String, Double] = try {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] ann point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$dir/embeddings.parquet"))) Map.empty
      else {
        graft.plans.Stores.evict(spark, "graft_annstore")
        val b = t1(Q19eAnnIvfStore.ensureStore(spark, dir))
        def s1() = t1(Q19eAnnIvfStore.run(spark, dir)
          .write.format("noop").mode("overwrite").save())
        val s = math.min(s1(), s1())
        graft.plans.Stores.evict(spark, "graft_annstore")
        Map("q19e_ann_build" -> b, "q19e_ann_serve" -> s)
          .filter(_._2 >= 0)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] ann section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (an1, an10) =
      if (wantAnn) (annPoints(sfDir), annPoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val an100: Map[String, Double] =
      if (!wantAnn || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); annPoints(Scale100Dir) }
    val an1000: Map[String, Double] =
      if (!wantAnn ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); annPoints(Scale1000Dir) }
    // DRIFT-GATE measurement decades (round 15): each gated store's
    // decide() is one corpus tokenize + a vocabulary-sized dictionary
    // pass (greedy fold / Viterbi DP per DISTINCT word) + a per-lang
    // rollup — the claim is that the measurement scales with the
    // corpus SCAN, never with the dictionary machinery. On the
    // synthesized corpora the '#k' suffixes are letter-stripped, so
    // N× corpora present N× tokens over the SAME distinct-word set:
    // the dictionary passes are decade-invariant by construction and
    // any superlinear term would be in the join/rollup.
    val gateNames = Seq("q64n_gate_decide", "q64o_gate_decide",
      "q64p_gate_decide", "q64q_gate_decide_sampled",
      "q64q_gate_decide_sampled_pruned")
    val wantGates = only.forall(names => gateNames.exists(names))
    def gatePoints(dir: String): Map[String, Double] = try {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] gate point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      // Stores are built from the MEASURED dir's own corpus (the
      // bind-or-build fast path makes repeat calls serve-only), so
      // decide() measures arrival-sized work against a same-scale
      // baseline — the production shape.
      val (vN, sN) = Q64nBpeDriftGatedStore.ensureStore(spark, dir)
      val (pO, sO) = Q64oWordpieceDriftGatedStore.ensureStore(spark, dir)
      val (pP, sP) = Q64pUnigramDriftGatedStore.ensureStore(spark, dir)
      val docs = Tables.documents(spark, dir)
      def point(body: => DataFrame): Double = {
        def s1() = t1(body.write.format("noop").mode("overwrite").save())
        math.min(s1(), s1())
      }
      val n = point(Q64nBpeDriftGatedStore.decide(spark, vN, sN, docs))
      val o = point(Q64oWordpieceDriftGatedStore.decide(spark, pO, sO, docs))
      val p = point(Q64pUnigramDriftGatedStore.decide(spark, pP, sP, docs))
      // The SAMPLED decide (VERDICT r16 #5): the production shape —
      // no audit columns — priced against the full q64o decide above
      // (same store, same gate arithmetic, 1/16 of the docs). Read
      // from the standard layout its floor is the CORPUS SCAN (the
      // text column is read before the doc-id filter drops 15/16 of
      // it) — measured ~3–5× under the full decide, not 16×.
      val q = point(Q64qSampledDriftGate.decideSampled(spark, pO, sO, docs))
      // The LAYOUT-AWARE twin, now the REAL layout (VERDICT r17 #4):
      // the corpus written once hive-partitioned by the sample nibble
      // (graft.plans.Layout.writeSampleNibbled — the untimed write is
      // the layout's pay-once cost), then the production decide
      // partition-prunes the sampled arm to 1/16 of the directories
      // (plan-asserted in Round18Spec). The presence pass reads only
      // the lang column across partitions — the honest production
      // shape the round-17 materialized-sample stand-in approximated.
      // Layout-write failure must cost only THIS point, not the
      // decade's already-measured rows (round-17 review — the same
      // fail-soft contract as point()).
      val nibDir = s"/tmp/graft_gate_nib_${dir.hashCode.toHexString}"
      val qp =
        if (t1(graft.plans.Layout.writeSampleNibbled(docs, nibDir)) < 0) -1.0
        else point(Q64qSampledDriftGate.decideSampledPruned(spark, pO, sO,
          spark.read.parquet(nibDir)))
      Map("q64n_gate_decide" -> n, "q64o_gate_decide" -> o,
        "q64p_gate_decide" -> p, "q64q_gate_decide_sampled" -> q,
        "q64q_gate_decide_sampled_pruned" -> qp)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] gate section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (gt1, gt10) =
      if (wantGates) (gatePoints(sfDir), gatePoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val gt100: Map[String, Double] =
      if (!wantGates || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); gatePoints(Scale100Dir) }
    // Fourth decade for the drift-gate measurements (VERDICT r15 #7):
    // one 1000× point per family, same opt-in as the other 1000×
    // passes, so the gate cost curve matches the text/retrieval
    // families' coverage.
    val gt1000: Map[String, Double] =
      if (!wantGates ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); gatePoints(Scale1000Dir) }
    // DSIR store lifecycle (round 16): build pays the two corpus gram
    // passes + the top-K bar once per snapshot; serve prices one
    // corpus gram pass + the broadcast λ join + the O(1) compare —
    // the ingest-admission cost every arriving shard pays (s27 runs
    // the same serve per micro-batch). On the synthesized corpora the
    // '#k' suffixes are letter-stripped, so N× corpora present N×
    // bigram occurrences over the same bucket set — the honest
    // scale-up for a bucketed-count model.
    val dsirNames = Seq("q77d_store_build", "q77d_store_serve")
    val wantDsir = only.forall(names => dsirNames.exists(names))
    def dsirPoints(dir: String): Map[String, Double] = try {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] dsir point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      graft.plans.Stores.evict(spark, "graft_dsirstore")
      val build = t1(Q77dDsirStore.ensureStore(spark, dir))
      def s1() = t1(Q77dDsirStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val serveT = math.min(s1(), s1())
      graft.plans.Stores.evict(spark, "graft_dsirstore")
      Map("q77d_store_build" -> build, "q77d_store_serve" -> serveT)
        .filter(_._2 >= 0)
    } catch { case e: Throwable =>
      System.err.println(s"[scalebench] dsir section @ $dir FAILED: ${e.getMessage}")
      Map.empty
    }
    val (dt1, dt10) =
      if (wantDsir) (dsirPoints(sfDir), dsirPoints(Scale10Dir))
      else (Map.empty[String, Double], Map.empty[String, Double])
    val dt100: Map[String, Double] =
      if (!wantDsir || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); dsirPoints(Scale100Dir) }
    // Fourth decade for the DSIR store (VERDICT r16 #4): build pays
    // the ~1.3 GB gram passes + the top-K bar; the serve must stay
    // one gram pass + the broadcast λ join — matching the decade
    // coverage every other store family already has. Same opt-in.
    val dt1000: Map[String, Double] =
      if (!wantDsir ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); dsirPoints(Scale1000Dir) }
    // Text-dedup CLOSURE at the deep decades (VERDICT r12 item 7):
    // the label-propagation loop is O(component-diameter) iterations
    // × one shuffle each — the most plausible remaining superlinear
    // candidate past its 100× tuning point. Three points per decade:
    // the closure itself (q18f), the pay-once labels-store build
    // (q18g = closure + bucketed persist) and the store serve (the
    // production read path every q42/q58 consumer takes). 100× runs
    // with SCALE100 (default on when filtered here); 1000× is the
    // same opt-in as the store family (SPARK_GRAFT_SCALE1000=1).
    val closureNames = Seq("q18f_closure", "q18g_store_build",
      "q18g_store_serve")
    val wantClosure = only.forall(names => closureNames.exists(names))
    def closurePoints(dir: String): Map[String, Double] = {
      warmPageCache(dir)
      def t1(body: => Unit): Double =
        try { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scalebench] closure point @ $dir FAILED: ${e.getMessage}")
          -1.0 }
      val closure = math.min(
        t1(Q18fDedupClusters.run(spark, dir)
          .write.format("noop").mode("overwrite").save()),
        t1(Q18fDedupClusters.run(spark, dir)
          .write.format("noop").mode("overwrite").save()))
      graft.plans.Stores.evict(spark, "graft_lblstore")
      val build = t1(Q18gDedupLabelsStore.ensureStore(spark, dir))
      def serveOnce() = t1(Q18gDedupLabelsStore.run(spark, dir)
        .write.format("noop").mode("overwrite").save())
      val serve = math.min(serveOnce(), serveOnce())
      graft.plans.Stores.evict(spark, "graft_lblstore")
      // A failed point (t1's -1 sentinel) is OMITTED from the map —
      // emitting it would put a negative "timing" in the BENCH JSON
      // that reads as data (ADVICE r13); the failure is already loud
      // on stderr, and the ratio rows below skip absent names.
      Map("q18f_closure" -> closure, "q18g_store_build" -> build,
        "q18g_store_serve" -> serve).filter(_._2 >= 0)
    }
    val cl100: Map[String, Double] =
      if (!wantClosure || !scale100Enabled) Map.empty
      else { synthesize100(spark, sfDir); closurePoints(Scale100Dir) }
    val cl1000: Map[String, Double] =
      if (!wantClosure ||
          sys.env.getOrElse("SPARK_GRAFT_SCALE1000", "0") != "1") Map.empty
      else { synthesize1000(spark, sfDir); closurePoints(Scale1000Dir) }
    spark.stop()
    def row(qs: Seq[GraftQuery], m: Map[String, Double]) = qs
      .map(q => "\"" + q.name + "\":" + f"${m(q.name)}%.3f")
      .mkString("{", ",", "}")
    def ratio(num: Double, den: Double): Double =
      if (num < 0 || den <= 0) -1.0 else num / den
    // Deep-decade (1000×) ratio row with DENOMINATOR FALLBACK
    // (ADVICE r16): a 1000×-only run (SPARK_GRAFT_SCALE1000=1 with
    // SCALE100=0) must not print an empty ratio object and silently
    // lose the cost-curve comparison the point exists for — when the
    // 100× pass didn't run, fall back to the 10× points and LABEL the
    // row accordingly (…_1000x_vs_10x).
    def deepRatioRow(names: Seq[String], top: Map[String, Double],
        at100: Map[String, Double], at10: Map[String, Double],
        key: String): String = {
      val (den, label) =
        if (names.exists(at100.contains)) (at100, s"${key}_1000x_vs_100x")
        else (at10, s"${key}_1000x_vs_10x")
      val body = names.filter(n => top.contains(n) && den.contains(n))
        .map(n => "\"" + n + "\":" + f"${ratio(top(n), den(n))}%.2f")
        .mkString("{", ",", "}")
      s"""{"$label":$body}"""
    }
    val ratios = picked.map(q =>
      "\"" + q.name + "\":" + f"${ratio(at10(q.name), at1(q.name))}%.2f")
      .mkString("{", ",", "}")
    println(s"""{"scale":"sf0.1","queries":${row(picked, at1)}}""")
    println(s"""{"scale":"sf0.1x10","queries":${row(picked, at10)}}""")
    println(s"""{"ratio_10x":$ratios}""")
    if (st1.nonEmpty) {
      def srow(m: Map[String, Double]) = storeNames
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      val sratio = storeNames
        .map(n => "\"" + n + "\":" + f"${ratio(st10(n), st1(n))}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale_stores":"sf0.1","points":${srow(st1)}}""")
      println(s"""{"scale_stores":"sf0.1x10","points":${srow(st10)}}""")
      println(s"""{"store_ratio_10x":$sratio}""")
      if (st100.nonEmpty) {
        val r100 = storeNames
          .map(n => "\"" + n + "\":" + f"${ratio(st100(n), st10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"scale_stores":"sf0.1x100","cache":"hot","points":${srow(st100)}}""")
        println(s"""{"store_ratio_100x_vs_10x":$r100}""")
      }
      if (st1000.nonEmpty) {
        println(s"""{"scale_stores":"sf0.1x1000","cache":"hot","points":${srow(st1000)}}""")
        println(deepRatioRow(storeNames, st1000, st100, st10, "store_ratio"))
      }
    }
    if (Seq(ex1, ex10, ex100, ex1000).exists(_.nonEmpty)) {
      def erow(m: Map[String, Double]) = exciseNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      if (ex1.nonEmpty)
        println(s"""{"scale_excise":"sf0.1","points":${erow(ex1)}}""")
      if (ex10.nonEmpty) {
        println(s"""{"scale_excise":"sf0.1x10","points":${erow(ex10)}}""")
        val r = exciseNames.filter(n => ex10.contains(n) && ex1.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(ex10(n), ex1(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"excise_ratio_10x":$r}""")
      }
      if (ex100.nonEmpty) {
        println(s"""{"scale_excise":"sf0.1x100","cache":"hot","points":${erow(ex100)}}""")
        val r = exciseNames.filter(n => ex100.contains(n) && ex10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(ex100(n), ex10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"excise_ratio_100x_vs_10x":$r}""")
      }
      if (ex1000.nonEmpty) {
        println(s"""{"scale_excise":"sf0.1x1000","cache":"hot","points":${erow(ex1000)}}""")
        println(deepRatioRow(exciseNames, ex1000, ex100, ex10, "excise_ratio"))
      }
    }
    if (Seq(md1, md10, md100, md1000).exists(_.nonEmpty)) {
      def mrow(m: Map[String, Double]) = mediaNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      if (md1.nonEmpty)
        println(s"""{"scale_media":"sf0.1","points":${mrow(md1)}}""")
      if (md10.nonEmpty) {
        println(s"""{"scale_media":"sf0.1x10","points":${mrow(md10)}}""")
        val r = mediaNames.filter(n => md10.contains(n) && md1.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(md10(n), md1(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"media_ratio_10x":$r}""")
      }
      if (md100.nonEmpty) {
        println(s"""{"scale_media":"sf0.1x100","cache":"hot","points":${mrow(md100)}}""")
        val r = mediaNames.filter(n => md100.contains(n) && md10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(md100(n), md10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"media_ratio_100x_vs_10x":$r}""")
      }
      if (md1000.nonEmpty) {
        println(s"""{"scale_media":"sf0.1x1000","cache":"hot","points":${mrow(md1000)}}""")
        println(deepRatioRow(mediaNames, md1000, md100, md10, "media_ratio"))
      }
    }
    if (sem.nonEmpty) {
      def srow(f: ((Double, Double)) => Double) = semNames
        .map(n => "\"" + n + "\":" + f"${f(sem(n))}%.3f").mkString("{", ",", "}")
      val sr = semNames
        .map(n => "\"" + n + "\":" + f"${ratio(sem(n)._2, sem(n)._1)}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale_semantic":"sf0.1","points":${srow(_._1)}}""")
      println(s"""{"scale_semantic":"sf0.1x10","points":${srow(_._2)}}""")
      println(s"""{"semantic_ratio_10x":$sr}""")
    }
    if (at100.nonEmpty) {
      val r2 = deep.map(q =>
        "\"" + q.name + "\":" + f"${ratio(at100(q.name), at10(q.name))}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale":"sf0.1x100","cache":"hot","queries":${row(deep, at100)}}""")
      println(s"""{"ratio_100x_vs_10x":$r2}""")
    }
    if (rt1.nonEmpty) {
      def rrow(m: Map[String, Double]) = retrNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      val rratio = retrNames.filter(n => rt1.contains(n) && rt10.contains(n))
        .map(n => "\"" + n + "\":" + f"${ratio(rt10(n), rt1(n))}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale_retrieval":"sf0.1","points":${rrow(rt1)}}""")
      println(s"""{"scale_retrieval":"sf0.1x10","points":${rrow(rt10)}}""")
      println(s"""{"retrieval_ratio_10x":$rratio}""")
      if (rt100.nonEmpty) {
        val r100 = retrNames.filter(n => rt100.contains(n) && rt10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(rt100(n), rt10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"scale_retrieval":"sf0.1x100","cache":"hot","points":${rrow(rt100)}}""")
        println(s"""{"retrieval_ratio_100x_vs_10x":$r100}""")
      }
      if (rt1000.nonEmpty) {
        println(s"""{"scale_retrieval":"sf0.1x1000","cache":"hot","points":${rrow(rt1000)}}""")
        println(deepRatioRow(retrNames, rt1000, rt100, rt10,
          "retrieval_ratio"))
      }
    }
    // Gate on ANY decade (round-17 review): a failed 1× point must
    // not silently discard the expensive deep-decade measurements
    // that still succeeded.
    if (Seq(ov1, ov10, ov100, ov1000).exists(_.nonEmpty)) {
      def orow(m: Map[String, Double]) = ovNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      val oratio = ovNames.filter(n => ov1.contains(n) && ov10.contains(n))
        .map(n => "\"" + n + "\":" + f"${ratio(ov10(n), ov1(n))}%.2f")
        .mkString("{", ",", "}")
      if (ov1.nonEmpty)
        println(s"""{"scale_openvocab":"1x","points":${orow(ov1)}}""")
      if (ov10.nonEmpty) {
        println(s"""{"scale_openvocab":"10x","points":${orow(ov10)}}""")
        println(s"""{"openvocab_ratio_10x":$oratio}""")
      }
      if (ov100.nonEmpty) {
        val o100 = ovNames.filter(n => ov100.contains(n) && ov10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(ov100(n), ov10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"scale_openvocab":"100x","cache":"hot","points":${orow(ov100)}}""")
        println(s"""{"openvocab_ratio_100x_vs_10x":$o100}""")
      }
      if (ov1000.nonEmpty) {
        println(s"""{"scale_openvocab":"1000x","cache":"hot","points":${orow(ov1000)}}""")
        println(deepRatioRow(ovNames, ov1000, ov100, ov10,
          "openvocab_ratio"))
      }
    }
    if (Seq(an1, an10, an100, an1000).exists(_.nonEmpty)) {
      def arow(m: Map[String, Double]) = annNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      if (an1.nonEmpty)
        println(s"""{"scale_ann":"sf0.1","points":${arow(an1)}}""")
      if (an10.nonEmpty)
        println(s"""{"scale_ann":"sf0.1x10","points":${arow(an10)}}""")
      if (an100.nonEmpty)
        println(s"""{"scale_ann":"sf0.1x100","cache":"hot","points":${arow(an100)}}""")
      if (an1000.nonEmpty) {
        println(s"""{"scale_ann":"sf0.1x1000","cache":"hot","points":${arow(an1000)}}""")
        println(deepRatioRow(annNames, an1000, an100, an10, "ann_ratio"))
      }
    }
    if (gt1.nonEmpty) {
      def grow(m: Map[String, Double]) = gateNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      val gratio = gateNames.filter(n => gt1.contains(n) && gt10.contains(n))
        .map(n => "\"" + n + "\":" + f"${ratio(gt10(n), gt1(n))}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale_gates":"sf0.1","points":${grow(gt1)}}""")
      println(s"""{"scale_gates":"sf0.1x10","points":${grow(gt10)}}""")
      println(s"""{"gate_ratio_10x":$gratio}""")
      if (gt100.nonEmpty) {
        val g100 = gateNames.filter(n => gt100.contains(n) && gt10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(gt100(n), gt10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"scale_gates":"sf0.1x100","cache":"hot","points":${grow(gt100)}}""")
        println(s"""{"gate_ratio_100x_vs_10x":$g100}""")
      }
      if (gt1000.nonEmpty) {
        println(s"""{"scale_gates":"sf0.1x1000","cache":"hot","points":${grow(gt1000)}}""")
        println(deepRatioRow(gateNames, gt1000, gt100, gt10, "gate_ratio"))
      }
    }
    if (dt1.nonEmpty) {
      def drow(m: Map[String, Double]) = dsirNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      val dratio = dsirNames.filter(n => dt1.contains(n) && dt10.contains(n))
        .map(n => "\"" + n + "\":" + f"${ratio(dt10(n), dt1(n))}%.2f")
        .mkString("{", ",", "}")
      println(s"""{"scale_dsir":"sf0.1","points":${drow(dt1)}}""")
      println(s"""{"scale_dsir":"sf0.1x10","points":${drow(dt10)}}""")
      println(s"""{"dsir_ratio_10x":$dratio}""")
      if (dt100.nonEmpty) {
        val d100 = dsirNames.filter(n => dt100.contains(n) && dt10.contains(n))
          .map(n => "\"" + n + "\":" + f"${ratio(dt100(n), dt10(n))}%.2f")
          .mkString("{", ",", "}")
        println(s"""{"scale_dsir":"sf0.1x100","cache":"hot","points":${drow(dt100)}}""")
        println(s"""{"dsir_ratio_100x_vs_10x":$d100}""")
      }
      if (dt1000.nonEmpty) {
        println(s"""{"scale_dsir":"sf0.1x1000","cache":"hot","points":${drow(dt1000)}}""")
        println(deepRatioRow(dsirNames, dt1000, dt100, dt10, "dsir_ratio"))
      }
    }
    if (cl100.nonEmpty) {
      def crow(m: Map[String, Double]) = closureNames.filter(m.contains)
        .map(n => "\"" + n + "\":" + f"${m(n)}%.3f").mkString("{", ",", "}")
      println(s"""{"scale_closure":"sf0.1x100","cache":"hot","points":${crow(cl100)}}""")
      if (cl1000.nonEmpty) {
        println(s"""{"scale_closure":"sf0.1x1000","cache":"hot","points":${crow(cl1000)}}""")
        // Closure's own 10× pass doesn't exist (the family starts at
        // 100×) — the fallback then degrades to an empty object only
        // when NEITHER denominator ran, which a closure-only 1000×
        // invocation cannot produce (cl100 is forced by SCALE100's
        // default-on).
        println(deepRatioRow(closureNames, cl1000, cl100, Map.empty,
          "closure_ratio"))
      }
    }
  }
}
