package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.plans.{Bucketing, Stores}

/** Round 11: the persisted-store cross-process build protocol (file
  * lock + fingerprint-named commit marker + bind-from-marker) and
  * compact's crash-recovery preamble. */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  private def wh = Paths.get(java.net.URI.create(
    spark.conf.get("spark.sql.warehouse.dir")).getPath)

  private def freshDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("r11store").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  test("store protocol: two sessions racing ensure -> exactly one build, both read the same store") {
    val dir = freshDir((1L to 40L).map(i => (i, s"doc $i payload ${i % 7}")))
    val prefix = s"r11race_${System.nanoTime()}"
    try {
      val builds = new AtomicInteger(0)
      val s2 = spark.newSession()
      def callEnsure(s: org.apache.spark.sql.SparkSession) =
        Stores.ensure(s, prefix, dir, Seq("t"),
          buckets = Map("t" -> (("k", 4)))) { case Seq(t) =>
          builds.incrementAndGet()
          Thread.sleep(300) // widen the race window
          Bucketing.writeBucketed(
            Tables.documents(s, dir).select(col("doc_id").as("k"),
              col("n_chars").as("v")), t, "k", 4)
        }
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call() = callEnsure(spark) })
        val fb = pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call() = callEnsure(s2) })
        val (na, nb) = (fa.get(), fb.get())
        assert(na == nb, "the two sessions resolved different store names")
        assert(builds.get() == 1, s"expected exactly one build, got ${builds.get()}")
        assert(spark.table(na.head).count() == 40)
        assert(s2.table(nb.head).count() == 40)
        // The commit marker exists and is fingerprint-named.
        val markers = {
          import scala.jdk.CollectionConverters._
          val s = Files.list(wh)
          try s.iterator().asScala.map(_.getFileName.toString)
            .filter(n => n.startsWith(prefix) && n.endsWith(".committed")).toVector
          finally s.close()
        }
        assert(markers.size == 1, s"markers: $markers")
      } finally pool.shutdown()
    } finally {
      dropPrefixed(prefix)
      cleanup(dir)
    }
  }

  /** Drop every table (and marker/lock file) a test's unique prefix
    * created, so the shared-session warehouse stays clean. */
  private def dropPrefixed(prefix: String): Unit = {
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(t => Stores.dropManaged(spark, t))
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(wh)) {
      val s = Files.list(wh)
      val leftovers = try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix)).toVector
      finally s.close()
      leftovers.foreach(Stores.deleteTree)
    }
  }

  test("store protocol: a committed store from a dead catalog is BOUND, not rebuilt; bucket posture survives") {
    val dir = freshDir((1L to 30L).map(i => (i, s"bind fixture ${i % 5}")))
    val prefix = s"r11bind_${System.nanoTime()}"
    val builds = new AtomicInteger(0)
    def callEnsure() =
      Stores.ensure(spark, prefix, dir, Seq("t"),
        buckets = Map("t" -> (("k", 4)))) { case Seq(t) =>
        builds.incrementAndGet()
        Bucketing.writeBucketed(
          Tables.documents(spark, dir).select(col("doc_id").as("k"),
            col("n_chars").as("v")), t, "k", 4)
      }
    try {
      val names = callEnsure()
      assert(builds.get() == 1)
      val t = names.head
      val rows = spark.table(t).orderBy(col("k")).collect().toSeq
      // Simulate a FRESH PROCESS sharing the warehouse: the in-memory
      // catalog forgets the table while the data + marker persist.
      // (DROP TABLE on a managed table deletes data, so stash the
      // store directory around the drop.)
      val loc = wh.resolve(t)
      val stash = Files.createTempDirectory("r11stash").resolve(t)
      org.apache.commons.io.FileUtils.copyDirectory(loc.toFile, stash.toFile)
      spark.sql(s"DROP TABLE $t")
      org.apache.commons.io.FileUtils.copyDirectory(stash.toFile, loc.toFile)
      assert(!spark.catalog.tableExists(t) && Files.isDirectory(loc))
      // ensure() must BIND the committed data, not rebuild it.
      val names2 = callEnsure()
      assert(names2 == names)
      assert(builds.get() == 1, "bind path must not rebuild")
      assert(spark.table(t).orderBy(col("k")).collect().toSeq == rows)
      // The re-bound table keeps the bucket spec: a self-join on the
      // bucket key plans ZERO exchanges.
      val joined = Bucketing.colocatedJoin(spark, t, t, "k")
      joined.collect()
      val plan = flattenPlan(joined.queryExecution.executedPlan)
      assert(!plan.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
        "bound store lost its bucket layout:\n" +
          joined.queryExecution.executedPlan.toString)
      org.apache.commons.io.FileUtils.deleteDirectory(
        stash.getParent.toFile)
    } finally {
      dropPrefixed(prefix)
      cleanup(dir)
    }
  }

  test("store protocol: a half-built orphan (no marker) is cleared and rebuilt exactly once") {
    val dir = freshDir((1L to 10L).map(i => (i, s"orphan fixture $i")))
    val prefix = s"r11orphan_${System.nanoTime()}"
    val builds = new AtomicInteger(0)
    def callEnsure() =
      Stores.ensure(spark, prefix, dir, Seq("t")) { case Seq(t) =>
        builds.incrementAndGet()
        Tables.documents(spark, dir).select(col("doc_id").as("k"))
          .write.format("parquet").saveAsTable(t)
      }
    try {
      // Fabricate a dead JVM's uncommitted half-build: the warehouse
      // directory exists, no catalog entry, NO marker.
      val fp = Stores.fingerprint(spark, dir)
      val tag = callEnsure().head.split("_").takeRight(2).head // dirTag via name
      assert(builds.get() == 1)
      val t = s"${prefix}_t_${tag}_$fp"
      spark.sql(s"DROP TABLE $t") // managed drop deletes data
      val orphan = wh.resolve(t)
      Files.createDirectories(orphan)
      Files.writeString(orphan.resolve("part-corrupt.parquet"), "not parquet")
      // marker survived the simulated death of the first build's JVM;
      // delete it to model a crash BEFORE commit.
      import scala.jdk.CollectionConverters._
      val s = Files.list(wh)
      val marker = try s.iterator().asScala.find(p =>
        p.getFileName.toString.startsWith(prefix) &&
          p.getFileName.toString.endsWith(".committed")) finally s.close()
      marker.foreach(Files.delete(_))
      val names2 = callEnsure()
      assert(builds.get() == 2, "uncommitted orphan must be rebuilt")
      assert(spark.table(names2.head).count() == 10)
    } finally {
      dropPrefixed(prefix)
      cleanup(dir)
    }
  }

  test("the REAL signature store binds across a catalog death: no rebuild, zero-exchange posture intact") {
    import graft.queries.Q57bDeltaDedupStore
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    Stores.evict(spark, "graft_sigstore")
    val (bandsT, exactT) = Q57bDeltaDedupStore.ensureStore(spark, sf01)
    val want = Q57bDeltaDedupStore.run(spark, sf01).collect().toSeq.map(_.toSeq)
    // Kill the catalog's knowledge of the store while data + marker
    // survive (the fresh-process state), via stash/drop/restore.
    val stash = Files.createTempDirectory("r11sig")
    for (t <- Seq(bandsT, exactT)) {
      org.apache.commons.io.FileUtils.copyDirectory(
        wh.resolve(t).toFile, stash.resolve(t).toFile)
      spark.sql(s"DROP TABLE $t")
      org.apache.commons.io.FileUtils.copyDirectory(
        stash.resolve(t).toFile, wh.resolve(t).toFile)
    }
    try {
      def listing(t: String): Seq[(String, Long, Long)] = {
        import scala.jdk.CollectionConverters._
        val s = Files.walk(wh.resolve(t))
        try s.iterator().asScala.filter(Files.isRegularFile(_)).toVector
          .map(p => (p.getFileName.toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis)).sortBy(_._1)
        finally s.close()
      }
      val before = Seq(bandsT, exactT).map(listing)
      val (b2, e2) = Q57bDeltaDedupStore.ensureStore(spark, sf01)
      assert((b2, e2) == ((bandsT, exactT)))
      assert(Seq(bandsT, exactT).map(listing) == before,
        "bind must serve the committed files untouched, not rebuild them")
      // Same rows, and the band join's store side still exchange-free
      // under forced shuffled joins — the bucket spec survived the
      // external re-bind.
      withConfs(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val df = Q57bDeltaDedupStore.run(spark, sf01)
        assert(df.collect().toSeq.map(_.toSeq) == want)
        val nodes = flattenPlan(df.queryExecution.executedPlan)
        val bandJoins = nodes.filter {
          case j: SortMergeJoinExec     => j.leftKeys.exists(_.toString.contains("bkey"))
          case j: ShuffledHashJoinExec  => j.leftKeys.exists(_.toString.contains("bkey"))
          case j: BroadcastHashJoinExec => j.leftKeys.exists(_.toString.contains("bkey"))
          case _ => false
        }
        assert(bandJoins.nonEmpty, "expected the band-key store join")
        val storeSides = bandJoins.flatMap(_.children.filter(c =>
          flattenPlan(c).exists {
            case f: FileSourceScanExec =>
              f.tableIdentifier.exists(_.table.startsWith("graft_sigstore_bands"))
            case _ => false
          }))
        assert(storeSides.nonEmpty)
        storeSides.foreach { side =>
          assert(flattenPlan(side).collect {
            case s: ShuffleExchangeLike => s }.isEmpty,
            "store side of the band join must stay exchange-free after bind")
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(stash.toFile)
    } finally Stores.evict(spark, "graft_sigstore")
  }

  test("compact: crash between the two publish renames is recovered by the next compact") {
    val table = s"r11compact_${System.nanoTime()}"
    val staging = table + "__compacting"
    val retired = table + "__retired"
    val df = (1L to 50L).map(i => (i % 4, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, table, "k", 4)
    val want = spark.table(table).orderBy(col("k"), col("v")).collect().toSeq
    try {
      // Reproduce the crash window: staging fully written, old table
      // renamed away, publish rename never ran.
      Bucketing.writeBucketed(spark.table(table).repartition(4, col("k")),
        staging, "k", 4)
      spark.sql(s"ALTER TABLE $table RENAME TO $retired")
      assert(!spark.catalog.tableExists(table))
      // Re-running compact must first republish, then compact normally.
      Bucketing.compact(spark, table, "k", 4)
      assert(spark.catalog.tableExists(table))
      assert(!spark.catalog.tableExists(staging) &&
        !spark.catalog.tableExists(retired))
      assert(spark.table(table).orderBy(col("k"), col("v")).collect().toSeq == want)
      assert(Bucketing.dataFileCount(spark, table) <= 4)
    } finally Stores.dropManaged(spark, table)
  }

  test("compact: cross-JVM crash recovery rebuilds from the surviving directory") {
    val table = s"r11compactx_${System.nanoTime()}"
    val staging = table + "__compacting"
    val df = (1L to 24L).map(i => (i % 3, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, table, "k", 3)
    val want = spark.table(table).orderBy(col("k"), col("v")).collect().toSeq
    try {
      // Dead-JVM simulation: data directories exist, catalog has no
      // entries. Stage a complete copy under the staging name, then
      // unbind EVERYTHING without deleting directories (stash/restore
      // around managed drops).
      Bucketing.writeBucketed(spark.table(table).repartition(3, col("k")),
        staging, "k", 3)
      val stash = Files.createTempDirectory("r11cx")
      for (t <- Seq(table, staging)) {
        org.apache.commons.io.FileUtils.copyDirectory(
          wh.resolve(t).toFile, stash.resolve(t).toFile)
        spark.sql(s"DROP TABLE $t")
      }
      // Only the staging dir survives (the crash happened after the
      // retire rename moved the published dir away — model the worst
      // case where just one complete copy remains).
      org.apache.commons.io.FileUtils.copyDirectory(
        stash.resolve(staging).toFile, wh.resolve(staging).toFile)
      assert(!spark.catalog.tableExists(table) &&
        Files.isDirectory(wh.resolve(staging)))
      Bucketing.compact(spark, table, "k", 3)
      assert(spark.table(table).orderBy(col("k"), col("v")).collect().toSeq == want)
      assert(Bucketing.dataFileCount(spark, table) <= 3)
      org.apache.commons.io.FileUtils.deleteDirectory(stash.toFile)
    } finally Stores.dropManaged(spark, table)
  }
}
