package graft

import org.apache.spark.sql.SparkSession

/** Session factory: one place for the conventions every entry point
  * (Verify, Bench, tests, driver smoke) must share.
  *
  * - UTC session time zone (oracle parity; DuckDB renders UTC).
  * - AQE on: runtime shuffle coalescing + skew-join handling is the
  *   100 TB posture (SURVEY §4.2) and costs nothing at fixture scale.
  * - `nanosAsLong`: an `events` fixture generation that stores
  *   TIMESTAMP(NANOS), which Spark 4.x refuses to read as a
  *   timestamp, is read as a raw Long and truncated to micros
  *   (Tables.events) matching DuckDB's own ns→µs truncation
  *   bit-for-bit.
  * - `inferTimestampNTZ=false`: the current fixture generation stores
  *   TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4.x would
  *   otherwise infer as TIMESTAMP_NTZ — a type `unix_micros`,
  *   event-time watermarks, and parquet filter pushdown (LayoutSpec's
  *   pinned gap) all reject. Disabling inference restores the
  *   pre-3.4 read: INT64 micros surface as TIMESTAMP (LTZ) with the
  *   stored value as epoch micros — under the UTC session time zone
  *   that renders the exact wall clock DuckDB reads natively, so the
  *   oracle parity is unchanged.
  * - shuffle.partitions defaults to the local core count, not 200 —
  *   at cluster scale this is a submit-time setting, never hardcoded.
  */
object Engine {
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"
  val InferNTZ    = "spark.sql.parquet.inferTimestampNTZ.enabled"

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config(NanosAsLong, "true")
    .config(InferNTZ, "false")
    // Cached-batch row count sized so CONCURRENT columnar builders fit
    // in heap for wide-row caches: the default 10000 rows/batch OOMed
    // the 1000×-decade closure run (q18f's shingle cache — each task
    // builds its whole batch's array<string> column in ByteBuffers
    // that ensureFreeSpace grows by DOUBLING, ×32 concurrent tasks,
    // EVEN on the disk-spill path, which serializes through the same
    // builders; stack pinned in BASELINE round-13). 1000 rows/batch
    // bounds the transient per-task allocation ~10× for the same
    // cached bytes; fixture-scale bench impact measured nil.
    .config("spark.sql.inMemoryColumnarStorage.batchSize", "1000")
    // Let AQE re-coalesce the OUTPUT partitioning of cached plans
    // (default false since SPARK-38101, kept off upstream only so a
    // cached frame's partitioning stays reusable by downstream
    // exchanges). Measured r20 (guide §2.4): the iterative queries
    // persist small frames whose cached plan otherwise pins the
    // pre-AQE partition count — q18f's pair cache materialized as 64
    // mostly-empty partitions that every label-propagation iteration
    // re-scanned twice, q59's edge cache likewise — so each iteration
    // paid ~100 empty-task launches. With the flag, cache partitioning
    // follows AQE's byte targets: q59 7.7→5.1 s, q18f 10.5→9.2 s,
    // q18b −0.4 s in a same-window A/B pair (flag side measured under
    // WORSE ambient, cal 1.21 vs 0.94), no row regressed beyond noise.
    // Scale posture: coalescing is byte-driven, so corpus-scale cached
    // frames (above advisory size per core) keep full parallelism —
    // this only collapses the fixture-scale empty-partition tax.
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.ui.enabled", "false")

  /** SQL FRONT DOOR: register every fixture table of `dir` as a temp
    * view so the whole pack is runnable as `spark.sql` TEXT — the
    * engine is DataFrame-first, but a session built through
    * [[configure]] already carries the graft extensions
    * (`graft_normalize_fast`, `graft_token_score`, `graft_asof_le` +
    * the as-of rewrite rule and native exec), so a SQL user gets the
    * native functions and the custom operator with no code:
    *
    * {{{
    *   val spark = Engine.session()
    *   Engine.registerTables(spark, "/root/testdata/sf0.01")
    *   spark.sql("""SELECT graft_normalize_fast(tok) w, count(*) n
    *                FROM documents LATERAL VIEW explode(split(text,
    *                '\\s+')) AS tok GROUP BY w""")
    * }}}
    *
    * Views go through [[Tables]] so SQL reads the same canonicalized
    * columns the DataFrame pack reads (`events.ts` ns→µs included).
    * SqlFrontDoorSpec pins headline queries running as SQL text and
    * matching their DataFrame twins row for row. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Local session for tests / ad-hoc runs. `local[n, 2]` allows ONE
    * task retry — the cluster posture (where `spark.task.maxFailures`
    * defaults to 4 and retries/speculative attempts are routine)
    * rather than local mode's fail-job-on-first-error default, so
    * read-path determinism under retry is actually exercised
    * (Round11cSpec kills corpus-source tasks mid-read and byte-checks
    * the golden output). Deterministic failures still fail the job —
    * both attempts throw. */
  def session(cores: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores, 2]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
