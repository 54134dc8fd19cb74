package graft.plans

import org.apache.spark.sql.SparkSession

/** Shared machinery for PERSISTED derived stores (the q57b pattern):
  * a table family whose names embed (a) a tag of the corpus DIR and
  * (b) a fingerprint of the corpus FILES, so
  *  - stores for different dirs coexist (alternating dirs in one
  *    session must not evict each other and re-pay the corpus scan),
  *  - a regenerated corpus changes the fingerprint under the same dir
  *    tag, and the superseded store is dropped — eviction scoped to
  *    the one dir whose store went stale, bounding warehouse growth
  *    without touching live stores.
  *
  * Used by the signature store (`Q57bDeltaDedupStore` — bucketed band
  * rows + content hashes) and the incremental-aggregate store
  * (`Q65IncrementalStats` — mergeable per-key partials). Synchronized
  * single-JVM cache fill; a shared production warehouse would build
  * stores in one writer job, not lazily from readers.
  */
object Stores {

  /** Drop a managed table AND clear its warehouse directory if a dead
    * JVM left one behind: the in-memory catalog forgets tables across
    * JVMs while the warehouse persists, and both CREATE TABLE and
    * ALTER ... RENAME refuse a pre-existing destination location.
    * The safe preamble for any run-scoped/staging managed table. */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.nio.file.Paths.get(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val loc = wh.resolve(table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Corpus fingerprint from file METADATA only (no data scan): a
    * store keyed by (dir, file names, lengths, mtimes) goes stale
    * exactly when the fixture is regenerated. */
  def fingerprint(spark: SparkSession, dir: String,
                  table: String = "documents.parquet"): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = fs.listStatus(p).filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$stats".getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
  }

  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString

  /** Resolve the fingerprinted table names for `kinds` under `prefix`
    * for this (dir, corpus-files) snapshot; if any is absent, evict
    * every stale same-dir-tag incarnation (catalog AND orphaned
    * warehouse directories — the in-memory catalog forgets tables
    * across JVMs but the warehouse persists) and invoke `build` with
    * the names to create them. Returns the names in `kinds` order. */
  def ensure(spark: SparkSession, prefix: String, dir: String,
             kinds: Seq[String])(build: Seq[String] => Unit): Seq[String] =
    this.synchronized {
      val tag = dirTag(dir)
      val fp = fingerprint(spark, dir)
      val names = kinds.map(k => s"${prefix}_${k}_${tag}_$fp")
      if (!names.forall(spark.catalog.tableExists)) {
        import scala.jdk.CollectionConverters._
        def stale(t: String): Boolean =
          kinds.exists(k => t.startsWith(s"${prefix}_${k}_$tag")) &&
            !names.contains(t)
        spark.catalog.listTables().collect()
          .map(_.name).filter(stale)
          .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
        val wh = java.nio.file.Paths.get(java.net.URI.create(
          spark.conf.get("spark.sql.warehouse.dir")).getPath)
        if (java.nio.file.Files.isDirectory(wh))
          java.nio.file.Files.list(wh).iterator().asScala.toSeq
            // Clear stale incarnations AND current-name orphans: a
            // previous JVM's warehouse directory survives while the
            // in-memory catalog forgets the table, and CREATE TABLE AS
            // refuses a pre-existing managed location even under
            // Overwrite (LOCATION_ALREADY_EXISTS). A current-name
            // orphan is only ever a dead JVM's store for this same
            // fingerprint — rebuilding it here is the point.
            .filter(d => stale(d.getFileName.toString) ||
              (names.contains(d.getFileName.toString) &&
                !spark.catalog.tableExists(d.getFileName.toString)))
            .foreach(d => java.nio.file.Files.walk(d).iterator().asScala
              .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_)))
        build(names)
      }
      names
    }
}
