package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Engine
import graft.queries.GraftQuery

/** S1–S6 as driver-checkable queries: each builds a REAL file-source
  * stream over the fixture parquet, runs the Streams transform through
  * a memory sink to completion, and returns the final table — so the
  * streaming pack goes through the same DuckDB oracle gate as the
  * batch queries instead of being test-only.
  *
  * Determinism: each fixture is a single parquet file, so the file
  * source delivers exactly one micro-batch; complete/update-mode final
  * state (and append-mode state past the watermark, S3) is then a pure
  * function of the data. Rendering conventions follow GraftQuery:
  * window bounds as epoch-microsecond longs, money-ish sums as
  * decimals, a total ORDER BY everywhere.
  */
object StreamQueries {
  private val runId = new AtomicInteger(0)

  /** Execute a streaming plan to completion on a memory sink; return
    * the final result as a batch DataFrame.
    *
    * Shuffle partitions are scoped down for the stream's lifetime:
    * a stateful operator materializes one state store PER shuffle
    * partition per operator (a stream-stream join keeps two), and at
    * fixture scale 32-way state is pure per-store overhead. This is
    * the standard per-job knob a streaming deployment sets to match
    * its key cardinality — results are identical under any partition
    * count; only the state layout changes. (On a real cluster the
    * count is fixed into the checkpoint at first start — size it for
    * peak state there.) */
  private[graft] def runToBatch(spark: SparkSession, stream: DataFrame,
                                mode: String): DataFrame =
    runToBatch(spark, stream, mode, rocksdb = false)

  /** State-store custom-metric names of the LAST completed run —
    * how a test proves which provider actually engaged (RocksDB
    * reports rocksdb* metrics; the default HDFS-backed store reports
    * none of them). */
  @volatile private[graft] var lastStateMetrics: Seq[String] = Nil

  /** The delta-dedup streams (s12/s12b) run under the RocksDB state
    * store BY DEFAULT: their state grows with the ingest (one verdict
    * row per delta doc — at real ingest rates that outgrows executor
    * heap, which is exactly what the default HDFSBackedStateStore
    * keeps resident). RocksDB spills to local disk. The default is
    * scoped to state that GROWS WITH THE STREAM: s11's per-source
    * counter dashboard is bounded by source cardinality and stays on
    * the heap store (the s13 rule — bounded hot state lives in the
    * stream, and paying RocksDB's native per-trigger cost for a
    * 5-row dashboard bought nothing but a 2.6× floor breach, r10
    * verdict). Opt out per session with
    * `spark.graft.streaming.rocksdb=false` (fixture-scale benches of
    * OTHER operators don't pay the native-store per-trigger cost).
    * Round8Spec proved operator-result equality under the provider;
    * Round10Spec pins s12's oracle equality + engagement through
    * this default path and measures the per-trigger overhead
    * (BASELINE.md note). */
  private[graft] def rocksDefault(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.streaming.rocksdb").forall {
      // tolerant parse: the natural opt-out spellings must not turn
      // into a plan-time crash from a raw String.toBoolean
      _.trim.toLowerCase match {
        case "false" | "0" | "off" | "no" => false
        case "true" | "1" | "on" | "yes"  => true
        case other => throw new IllegalArgumentException(
          s"spark.graft.streaming.rocksdb must be a boolean, got '$other'")
      }
    }

  /** EPOCH-GUARDED append maintenance for the stateless append-model
    * streams (s15/s16/s17): drive `src` to completion, appending
    * `frame(batch)` per non-empty micro-batch to `tableT` with the
    * epoch id riding IN the appended rows (`_epoch`), and the commit
    * recorded in a SEPARATE one-row-per-epoch marker table
    * (`tableT`_epochs) written AFTER the data append. The marker is
    * the guard — NOT the data rows — because a parquet job commit is
    * a sequence of task-file renames, not atomic: a crash mid-commit
    * can leave a PARTIAL epoch visible, and a rows-presence guard
    * would then skip the rest of that epoch (silent loss, ADVICE
    * r12). The marker append is one task writing one file, so its
    * visibility IS atomic (a single rename). Replay cases:
    * marker present → the data append completed before the marker
    * did → skip; marker absent but epoch rows present → a crashed
    * attempt left partial (or complete-but-unmarked) data → scrub
    * that epoch's rows and re-apply. This is s13's exactly-once
    * contract (`Q65IncrementalStats.refreshEpoch`) in append form.
    * Priming writes must tag `_epoch` = −1; readers drop the column
    * ([[epochless]]). `checkpoint` pins the location so the
    * injection spec can force a genuine replay; None = run-scoped
    * temp checkpoint. `injectBeforeMarker` is the failure-injection
    * hook for the dead-JVM recovery spec (no-op default): called with
    * the epoch id AFTER its data append and BEFORE its commit marker
    * — throwing there reproduces exactly the torn state the guard
    * exists for. Returns epochs APPLIED (replays don't count). */
  private[graft] def maintainAppend(spark: SparkSession, tableT: String,
      src: DataFrame, checkpoint: Option[String] = None,
      injectBeforeMarker: Long => Unit = _ => ())
      (frame: DataFrame => DataFrame): Long = {
    val markerT = epochMarkerTable(tableT)
    if (!spark.catalog.tableExists(markerT)) {
      // A previous JVM's crash (or a caller that dropped only the
      // data table) can leave the marker's managed LOCATION on disk
      // with no catalog entry — saveAsTable then fails with
      // LOCATION_ALREADY_EXISTS even in Overwrite mode. Unknown to
      // the catalog ⇒ the directory is garbage by definition: clear
      // it before bootstrapping.
      graft.plans.Stores.deleteTree(
        graft.plans.Stores.warehouse(spark).resolve(markerT))
      spark.range(1).select(lit(-1L).as("_epoch")).repartition(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .format("parquet").saveAsTable(markerT)
    }
    // Read-repair before the first guard read (VERDICT r17 #1): a
    // hard-killed prior run can leave a physically torn part file in
    // the data table (or the marker table) that would fail the scan
    // before the epoch scrub below could excise its rows; the
    // checkpointed replay then re-applies the quarantined epoch.
    graft.plans.ReadRepair.repairTable(spark, tableT)
    graft.plans.ReadRepair.repairTable(spark, markerT)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val w0 = src.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val w = checkpoint.fold(w0)(c => w0.option("checkpointLocation", c))
    val q = w.foreachBatch { (batch: DataFrame, epochId: Long) =>
        // refreshTable BEFORE the guard read: the appends run on the
        // micro-batch session clone, whose saveAsTable invalidates
        // ITS relation cache, not this outer session's — without the
        // refresh the guard's first (pre-append) read pins an empty
        // file listing and every later check replays against it.
        spark.catalog.refreshTable(tableT)
        spark.catalog.refreshTable(markerT)
        if (!batch.isEmpty &&
            spark.table(markerT).filter(col("_epoch") === epochId).isEmpty) {
          // No marker for this epoch. If data rows exist anyway, a
          // crashed attempt died between (some of) the data renames
          // and the marker write — scrub them and re-apply, instead
          // of trusting a possibly-partial append. Rare (crash-replay
          // only), so the full rewrite is acceptable; the rewrite
          // shares the overwrite-model stores' crash posture.
          if (!spark.table(tableT)
                .filter(col("_epoch") === epochId).isEmpty) {
            val keep = spark.table(tableT)
              .filter(col("_epoch") =!= epochId).localCheckpoint(true)
            // insertInto, NOT saveAsTable(Overwrite): the scrub must
            // work on a re-BOUND table too (a restarted process binds
            // the surviving warehouse dir as EXTERNAL — the Q74b
            // writeMeta rule), where saveAsTable would re-create
            // managed over the populated location and throw
            // LOCATION_ALREADY_EXISTS. Round16Spec reproduces the
            // dead-JVM restart literally.
            keep.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .insertInto(tableT)
            spark.catalog.refreshTable(tableT)
          }
          frame(batch).withColumn("_epoch", lit(epochId))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .format("parquet").saveAsTable(tableT)
          injectBeforeMarker(epochId)
          // Commit LAST, as one single-file append: visible ⇒ the
          // data append above fully committed.
          spark.range(1).select(lit(epochId).as("_epoch")).repartition(1)
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .format("parquet").saveAsTable(markerT)
          batches.incrementAndGet()
        }
        ()
      }
      .start()
    q.awaitTermination()
    // the last guard refresh predates the last append — leave the
    // outer session's view fresh for the caller's result read
    spark.catalog.refreshTable(tableT)
    batches.get()
  }

  /** The one-row-per-epoch commit-marker table paired with an
    * append-model table (see [[maintainAppend]]). Run-scoped like its
    * data table; callers dropping the pair must drop BOTH names
    * (`dropManaged` removes exactly the name it is given), and
    * [[maintainAppend]]'s bootstrap clears a crash-leftover marker
    * location on its own. */
  private[graft] def epochMarkerTable(tableT: String): String =
    tableT + "_epochs"

  /** Strip the epoch-guard tag before a guarded table feeds a
    * result/merge frame. */
  private[graft] def epochless(df: DataFrame): DataFrame = df.drop("_epoch")

  private[graft] def runToBatch(spark: SparkSession, stream: DataFrame,
                                mode: String, rocksdb: Boolean): DataFrame = this.synchronized {
    // synchronized: the save/set/restore of the GLOBAL shuffle-
    // partitions conf is not re-entrant — two interleaved calls would
    // restore the scoped '8' as the session default for everything
    // after (review finding). Streaming runs are sequential anyway.
    val name = s"graft_stream_${runId.incrementAndGet()}"
    val partsKey = "spark.sql.shuffle.partitions"
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.get(partsKey)
    val storeBefore = spark.conf.getOption(storeKey)
    spark.conf.set(partsKey, "8")
    if (rocksdb) spark.conf.set(storeKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Reset UP FRONT: a run that throws must not leave the PREVIOUS
    // run's provider metrics as this run's apparent signal.
    lastStateMetrics = Nil
    try {
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      try { q.processAllAvailable() } finally { q.stop() }
      import scala.jdk.CollectionConverters._
      lastStateMetrics = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet.asScala)
    } finally {
      spark.conf.set(partsKey, before)
      if (rocksdb) storeBefore match {
        case Some(v) => spark.conf.set(storeKey, v)
        case None    => spark.conf.unset(storeKey)
      }
    }
    // localCheckpoint then drop the view: the memory sink pins a full
    // result copy in the driver for the SESSION lifetime otherwise —
    // one leaked table per streaming run (bench: 12 queries × reruns).
    val out = spark.table(name).localCheckpoint(true)
    spark.catalog.dropTempView(name)
    out
  }

  /** File-source stream over `events` with the same ns→µs timestamp
    * canonicalization as the batch loader (Tables.events). */
  private[graft] def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set(Engine.NanosAsLong, "true")
    spark.conf.set(Engine.InferNTZ, "false") // epoch-µs LTZ, as Tables.load
    val sch = spark.read.parquet(s"$dir/events.parquet").schema
    // Glob form: the file-stream source requires a directory basePath.
    val raw = spark.readStream.schema(sch).parquet(s"$dir/{events}.parquet")
    if (sch("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  private[graft] def docsStream(spark: SparkSession, dir: String): DataFrame = {
    val sch = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(sch).parquet(s"$dir/{documents}.parquet")
  }

  private[graft] def embsStream(spark: SparkSession, dir: String): DataFrame = {
    val sch = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(sch).parquet(s"$dir/{embeddings}.parquet")
  }

  /** DuckDB: events.ts is TIMESTAMP(NANOS); epoch µs by exact integer
    * division — matches Tables.events' `ts div 1000`. */
  private[streaming] val duckUs = "epoch_ns(ts) // 1000"

  val all: Seq[GraftQuery] = Seq(
    S1Tumbling, S2Sliding, S3WatermarkLate, S4SessionWindow, S5Dedup,
    S6IncrementalIndex, S7StatefulProfiles, S8StreamStreamJoin,
    S9StreamStaticJoin, S10StreamStreamOuterJoin, S11StreamCuration,
    S12StreamDeltaDedup, S12bStreamDeltaDedupStore,
    S13StreamIncrementalStats, S14StreamImageDedupStore,
    S15StreamBpeEncodeStore, S16StreamSemanticDedupStore,
    S17StreamMultimodalAdmission, S18StreamAudioDedupStore,
    S19StreamAnnIngest, S20StreamExcise, S21StreamWarc,
    S22StreamVideoDedupStore, S23StreamBm25Index, S23bStreamBm25Compact,
    S24StreamHybridFusion, S25StreamPhrase, S26StreamDriftGate,
    S27StreamDsirAdmission)
}

/** S1 — tumbling 1-hour counts per event_type (complete mode). */
object S1Tumbling extends GraftQuery {
  import StreamQueries._
  val name = "s1_stream_tumbling"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.tumblingCounts(eventsStream(spark, dir)), "complete")
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
      .orderBy(col("window_start_us"), col("event_type"))
  val oracle = Some(s"""
    WITH e AS (SELECT ${StreamQueries.duckUs} AS us, event_type FROM events)
    SELECT (us // 3600000000) * 3600000000 AS window_start_us, event_type, count(*) AS n
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
  """.trim)
}

/** S2 — 1-hour windows sliding every 15 min: decimal-exact sum + count
  * (complete mode); every event lands in exactly 4 windows. */
object S2Sliding extends GraftQuery {
  import StreamQueries._
  val name = "s2_stream_sliding"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.slidingValueAgg(eventsStream(spark, dir)), "complete")
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("sum_value").cast("double").as("sum_value"), col("n"),
        (col("sum_value").cast("double") / col("n")).as("avg_value"))
      .orderBy(col("window_start_us"))
  val oracle = Some(s"""
    WITH e AS (SELECT ${StreamQueries.duckUs} AS us, value FROM events),
    w AS (SELECT ((us // 900000000) - j) * 900000000 AS ws, value
          FROM e, unnest(range(0, 4)) AS u(j)),
    g AS (SELECT ws AS window_start_us,
          SUM(CAST(CAST(CAST(value AS DOUBLE) AS VARCHAR) AS DECIMAL(18,6))) AS sum_value,
          count(*) AS n
          FROM w GROUP BY ws)
    SELECT window_start_us, CAST(CAST(sum_value AS VARCHAR) AS DOUBLE) AS sum_value, n,
           CAST(CAST(sum_value AS VARCHAR) AS DOUBLE) / n AS avg_value
    FROM g ORDER BY window_start_us
  """.trim)
}

/** S3 — watermark + late data: append mode emits only windows whose
  * end is at or before the watermark (max event time − 10 min, at
  * millisecond precision); the open tail windows stay withheld. */
object S3WatermarkLate extends GraftQuery {
  import StreamQueries._
  val name = "s3_stream_watermark_late"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.watermarkedTumbling(eventsStream(spark, dir)), "append")
      .select(unix_micros(col("window.start")).as("window_start_us"), col("n"))
      .orderBy(col("window_start_us"))
  val oracle = Some(s"""
    WITH e AS (SELECT ${StreamQueries.duckUs} AS us FROM events),
    wm AS (SELECT ((max(us) // 1000) - 600000) * 1000 AS wm_us FROM e)
    SELECT (us // 3600000000) * 3600000000 AS window_start_us, count(*) AS n
    FROM e GROUP BY 1
    HAVING window_start_us + 3600000000 <= (SELECT wm_us FROM wm)
    ORDER BY 1
  """.trim)
}

/** S4 — 30-minute-gap session windows per user (complete mode — the
  * one output mode Spark supports for session-window aggregations
  * besides watermarked append). Must agree with batch Q17: same gap,
  * new session iff gap STRICTLY exceeds 30 min — an event landing
  * exactly on the previous session's end merges into it (verified by
  * StreamingSpec). */
object S4SessionWindow extends GraftQuery {
  import StreamQueries._
  val name = "s4_stream_session_window"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.sessionWindows(eventsStream(spark, dir)), "complete")
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_start_us"))
  val oracle = Some(s"""
    WITH e AS (SELECT user_id, ${StreamQueries.duckUs} AS us, value FROM events),
    f AS (SELECT user_id, us, value,
          CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
               THEN 1 ELSE 0 END AS new_s
          FROM e),
    s AS (SELECT user_id, us, value,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
          FROM f)
    SELECT user_id, min(us) AS session_start_us,
           max(us) + 1800000000 AS session_end_us,
           count(*) AS n_events,
           CAST(CAST(SUM(CAST(CAST(CAST(value AS DOUBLE) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us
  """.trim)
}

/** S5 — streaming dedup: the stream unioned with itself (every event
  * arrives twice) deduplicated back to unique event_ids within the
  * watermark. */
object S5Dedup extends GraftQuery {
  import StreamQueries._
  val name = "s5_stream_dedup"
  def run(spark: SparkSession, dir: String): DataFrame = {
    // self-union: one file source feeding two plan branches (the
    // s8/s10 shape) — a second eventsStream() would register and scan
    // an entire second source every trigger for identical rows
    val s = eventsStream(spark, dir)
    val doubled = s.union(s)
    runToBatch(spark, Streams.dedupByEventId(doubled), "append")
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id"))
  }
  val oracle = Some(s"""
    SELECT event_id, event_type, ${StreamQueries.duckUs} AS us
    FROM events ORDER BY event_id
  """.trim)
}

/** S7 — flatMapGroupsWithState per-user profiles (update mode): the
  * single-batch file stream means each user emits exactly one final
  * profile row; every statistic is order-independent, so the result
  * equals the batch groupBy the oracle computes. StreamingSpec
  * additionally drives the operator through TWO MemoryStream batches
  * to pin incremental state maintenance. */
object S7StatefulProfiles extends GraftQuery {
  import StreamQueries._
  val name = "s7_stream_stateful_profiles"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.userProfiles(eventsStream(spark, dir)).toDF(), "update")
      .orderBy(col("user_id"))
  val oracle = Some(s"""
    SELECT user_id, count(*) AS n_events,
      CAST(count(DISTINCT event_type) AS INT) AS n_types,
      array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
      MIN(${StreamQueries.duckUs}) AS first_us,
      MAX(${StreamQueries.duckUs}) AS last_us,
      MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY user_id ORDER BY user_id
  """.trim)
}

/** S8 — stream-stream inner join (append mode): clicks × same-user
  * purchases within 30 minutes after the click. The single-batch file
  * source delivers both sides in micro-batch 0, so the inner join's
  * append output is the complete, deterministic match set — the same
  * rows the oracle's batch self-join computes. Streams.clickPurchaseJoin
  * carries the two-sided watermark + time-bound state-eviction
  * contract (see its doc). */
object S8StreamStreamJoin extends GraftQuery {
  import StreamQueries._
  val name = "s8_stream_stream_join"
  def run(spark: SparkSession, dir: String): DataFrame = {
    // one file source, self-joined: both sides filter the same stream
    val ev = eventsStream(spark, dir)
    val joined = Streams.clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
    runToBatch(spark, joined, "append")
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("gap_us"))
      .orderBy(col("click_id"), col("purchase_id"))
  }
  val oracle = Some(s"""
    WITH e AS (SELECT event_id, user_id, event_type, ${StreamQueries.duckUs} AS us FROM events)
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           c.us AS click_us, p.us AS purchase_us, p.us - c.us AS gap_us
    FROM e c JOIN e p ON c.user_id = p.user_id
      AND c.event_type = 'click' AND p.event_type = 'purchase'
      AND p.us BETWEEN c.us AND c.us + 1800000000
    ORDER BY click_id, purchase_id
  """.trim)
}

/** S9 — stream-static join (complete mode): events enriched against
  * the static customer dimension (user_id joins c_custkey by fixture
  * construction), counted + decimal-summed per (segment, type). The
  * static side is broadcast — the join holds no state; events with no
  * matching customer (user 0) drop, matching the oracle's inner
  * join. */
object S9StreamStaticJoin extends GraftQuery {
  import StreamQueries._
  val name = "s9_stream_static_join"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.enrichedSegmentAgg(
      eventsStream(spark, dir), graft.Tables.customer(spark, dir)), "complete")
      .select(col("c_mktsegment"), col("event_type"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  val oracle = Some("""
    SELECT c_mktsegment, event_type, count(*) AS n,
      CAST(CAST(SUM(CAST(CAST(CAST(value AS DOUBLE) AS VARCHAR) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    ORDER BY c_mktsegment, event_type
  """.trim)
}

/** S10 — stream-stream LEFT OUTER join (append mode): s8's join with
  * unmatched clicks surfaced. Matched rows emit in the data batch;
  * null-extended rows emit in the watermark-advance (no-data) batch
  * that follows, and ONLY for clicks whose 30-min window closed
  * strictly below the final watermark `min(max click ts, max purchase
  * ts) − 10 min` (ms precision) — clicks nearer the stream head stay
  * buffered, exactly what an unbounded run would do. The oracle
  * replays both rules (batch left join + the eviction predicate). */
object S10StreamStreamOuterJoin extends GraftQuery {
  import StreamQueries._
  val name = "s10_stream_stream_outer_join"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val joined = Streams.clickPurchaseJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "leftOuter")
    runToBatch(spark, joined, "append")
      .select(col("click_id"), col("user_id"),
        unix_micros(col("click_ts")).as("click_us"),
        col("purchase_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
      .orderBy(col("click_id"), col("purchase_id").asc_nulls_first)
  }
  val oracle = Some(s"""
    WITH e AS (SELECT event_id, user_id, event_type, ${StreamQueries.duckUs} AS us FROM events),
    c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
    p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
    wm AS (SELECT (LEAST((SELECT max(us) FROM c), (SELECT max(us) FROM p))
                   // 1000 - 600000) * 1000 AS wm_us),
    j AS (SELECT c.event_id AS click_id, c.user_id, c.us AS click_us,
                 p.event_id AS purchase_id, p.us AS purchase_us
          FROM c LEFT JOIN p ON c.user_id = p.user_id
            AND p.us BETWEEN c.us AND c.us + 1800000000)
    SELECT click_id, user_id, click_us, purchase_id, purchase_us
    FROM j
    WHERE purchase_id IS NOT NULL
       OR click_us + 1800000000 < (SELECT wm_us FROM wm)
    ORDER BY click_id, purchase_id NULLS FIRST
  """.trim)
}

/** S6 — Q1 incrementalized: the reference's inverted index as a
  * streaming aggregation (update mode); final state must equal the
  * batch Q1 result, so it shares Q1's oracle. */
object S6IncrementalIndex extends GraftQuery {
  import StreamQueries._
  val name = "s6_stream_inverted_index"
  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, Streams.incrementalInvertedIndex(docsStream(spark, dir)), "update")
      .select(col("word"),
        substring(col("word"), 1, 1).as("letter"),
        size(col("doc_ids")).cast("long").as("df"),
        array_join(col("doc_ids"), " ").as("doc_ids"))
      .orderBy(col("df").desc, col("word").asc)
  val oracle = graft.queries.InvertedIndex.oracle
}

/** S11 — ingest-time curation: the q50/q42 admission gates (PII-free,
  * not too short) run as a stateless map over the document stream,
  * feeding a running per-source admission dashboard (streaming
  * aggregation, complete mode). This is the shape a 100 TB ingest
  * actually deploys curation in — filter documents AS they arrive and
  * keep per-source counters current, rather than re-scanning the
  * corpus after the fact. The gate itself adds no state; the only
  * state store is the per-source counter row (bounded by source
  * cardinality, not corpus size) — which is why this stream runs on
  * the default heap state store, NOT the RocksDB ingest default:
  * bounded hot state belongs in the stream (the s13 split), and the
  * native store's per-trigger cost is pure overhead on a dashboard
  * of a few rows. Final state is a pure function of the data, so it
  * shares the batch oracle. */
object S11StreamCuration extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Curation, NorthStar, Q42CorpusClean}
  val name = "s11_stream_curation"

  private[graft] def gated(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      (size(regexp_extract_all(col("text"), lit(Curation.EmailPat), lit(0))) +
        size(regexp_extract_all(col("text"), lit(Curation.PhonePat), lit(0))) +
        size(regexp_extract_all(col("text"), lit(Curation.Ipv4Pat), lit(0))))
        .cast("long").as("pii"),
      size(expr(NorthStar.toksExpr)).cast("long").as("n_toks"))
      .withColumn("kept",
        col("pii") === 0 && col("n_toks") >= Q42CorpusClean.MinTokens)

  private[graft] def dashboard(gated: DataFrame): DataFrame =
    gated.groupBy(col("source")).agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
      sum(col("pii")).cast("long").as("pii_total"),
      sum(when(col("kept"), col("n_toks")).otherwise(0L))
        .cast("long").as("toks_kept"))

  def run(spark: SparkSession, dir: String): DataFrame =
    runToBatch(spark, dashboard(gated(docsStream(spark, dir))), "complete",
        rocksdb = false) // bounded per-source state: heap store (see Scaladoc)
      .orderBy(col("source"))

  val oracle = Some(raw"""
    WITH d AS (
      SELECT source,
        CAST(length(regexp_extract_all(text, '${Curation.EmailPat}'))
           + length(regexp_extract_all(text, '${Curation.PhonePat}'))
           + length(regexp_extract_all(text, '${Curation.Ipv4Pat}')) AS BIGINT) AS pii,
        CAST(len(${NorthStar.duckToks}) AS BIGINT) AS n_toks
      FROM documents),
    g AS (SELECT source, pii, n_toks,
          (pii = 0 AND n_toks >= ${Q42CorpusClean.MinTokens}) AS kept FROM d)
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(sum(pii) AS BIGINT) AS pii_total,
      CAST(sum(CASE WHEN kept THEN n_toks ELSE 0 END) AS BIGINT) AS toks_kept
    FROM g GROUP BY source ORDER BY source
  """.trim)
}

/** S12 — DELTA DEDUP AT INGEST: q57's shard-vs-corpus dedup as a
  * streaming query — every arriving document (the q40 test split
  * standing in for "the incoming crawl") is checked against the
  * EXISTING corpus (train split, a static frame) and lands in the
  * final state as exact_dup / near_dup / new. This is the deploy
  * shape of delta dedup: admit-or-reject as data arrives, not a
  * nightly batch.
  *
  * Streaming constraints drive the design:
  *  - MinHash signatures are computed PER ROW with higher-order
  *    functions (32 array_min folds over the shingle hashes) —
  *    stateless, so no pre-aggregation stage is needed on the stream
  *    side (a groupBy signature stage would chain two stateful
  *    operators, which update mode forbids). Same VALUES as q18b's
  *    flat-agg pipeline — method independence is exactly what the
  *    shared oracle proves.
  *  - Both tiers and the "new" fallback are three STATELESS branches
  *    of the same stream (exact md5 stream-static join, banded
  *    stream-static join, identity), unioned into ONE stateful
  *    aggregation: min(struct(priority, 32−matches, base)) picks
  *    exact over near, then highest estimate, then lowest base id —
  *    all integer comparisons.
  *  - State is one row per delta doc (bounded by the delta, not the
  *    corpus); the static band frame is the corpus-side index.
  * Shares q57's DuckDB oracle verbatim. */
object S12StreamDeltaDedup extends GraftQuery {
  import StreamQueries._
  import graft.queries.{NorthStar, Q40TrainTestSplit, Q57DeltaDedup}
  val name = "s12_stream_delta_dedup"

  /** Per-row MinHash machinery (stream-safe: no aggregation), built
    * from NorthStar's shared constants — same values as q18b. */
  private val sigExpr =
    s"transform(sequence(1, 32), i_ -> array_min(transform(hs, h_ -> " +
      s"(((${NorthStar.MinhashA} * i_) % ${NorthStar.MinhashP}) * h_ + " +
      s"((${NorthStar.MinhashB} * i_ + 7) % ${NorthStar.MinhashP})) % ${NorthStar.MinhashP})))"
  // band geometry + match count are NorthStar's shared builders —
  // q18b, s12 and the oracle can only change banding together
  private val bandsExpr = NorthStar.bandKeysExpr("sig")
  private val matchesExpr = NorthStar.matchCountExpr("dsig", "bsig")

  /** (doc_id, sig, carry...) — NULL sig for docs with < 3 tokens (no
    * shingles); works on a static OR streaming frame. `carry` columns
    * ride through the projection chain so a caller can derive hash +
    * signature from ONE scan of the text. */
  private def sigFrame(docs: DataFrame, carry: String*): DataFrame = {
    val cs = carry.map(col)
    docs
      .select(col("doc_id") +: expr(NorthStar.toksExpr).as("t") +: cs: _*)
      .select(col("doc_id") +:
        when(size(col("t")) >= 3,
          expr(NorthStar.let("t", "t", NorthStar.shinglesExpr))).as("sh") +:
        cs: _*)
      // `hs` is a let-bound LAMBDA variable, not a projection alias:
      // CollapseProject inlines a single-referenced alias into the
      // 32-iteration signature fold — md5 per shingle 32x per row,
      // the exact measured regression q18b/q18c's notes price out —
      // but it cannot inline through a lambda binding.
      .select(col("doc_id") +:
        when(col("sh").isNotNull,
          expr(NorthStar.let("hs",
            s"transform(sh, s_ -> ${NorthStar.shingleHashExpr("s_")})",
            sigExpr))).as("sig") +:
        cs: _*)
  }

  /** (doc_id, sig, bkey) — one row per band of each doc with a
    * signature. */
  private def bandFrame(docs: DataFrame): DataFrame =
    sigFrame(docs).filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"), explode(expr(bandsExpr)).as("bkey"))

  /** The three stateless branches + one stateful best-verdict agg
    * over ANY corpus-side index pair — s12 hands a per-run
    * checkpointed frame, s12b the persisted bucketed store tables.
    * `baseHash`: (th, base_id); `baseBands`: (base_id, bsig, bkey). */
  private[streaming] def verdictStream(delta: DataFrame,
      baseHash: DataFrame, baseBands: DataFrame): DataFrame = {
    val exact = delta.select(col("doc_id"), md5(col("text")).as("th"))
      .join(baseHash, Seq("th"))
      .select(col("doc_id"), lit(0).as("pri"), lit(0).as("negest"),
        col("base_id"))
    val near = bandFrame(delta)
      .select(col("doc_id"), col("sig").as("dsig"), col("bkey"))
      .join(baseBands, Seq("bkey"))
      .select(col("doc_id"), col("base_id"),
        expr(matchesExpr).as("matches"))
      .filter(col("matches") >= 16) // est_jaccard >= 0.5
      .select(col("doc_id"), lit(1).as("pri"),
        (lit(32) - col("matches")).as("negest"), col("base_id"))
    val fresh = delta.select(col("doc_id"), lit(2).as("pri"),
      lit(0).as("negest"), lit(null).cast("long").as("base_id"))
    exact.unionByName(near).unionByName(fresh)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("pri"), col("negest"), col("base_id"))).as("b"))
  }

  /** Final-state rows → q57's audit contract. */
  private[streaming] def formatVerdicts(best: DataFrame): DataFrame =
    best.select(col("doc_id"),
        when(col("b.pri") === 0, lit("exact_dup"))
          .when(col("b.pri") === 1, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        col("b.base_id").as("base_id"),
        when(col("b.pri") === 1,
          (lit(32) - col("b.negest")).cast("double") / 32.0d)
          .otherwise(lit(null).cast("double")).as("est_jaccard"))
      .orderBy(col("doc_id"))

  private[streaming] def deltaStream(spark: SparkSession, dir: String): DataFrame =
    docsStream(spark, dir)
      .withColumn("split", Q40TrainTestSplit.splitCol)
      .filter(col("split") === "test")

  def run(spark: SparkSession, dir: String): DataFrame = {
    // wide: the corpus re-sign below (md5 + the 32-hash MinHash fold
    // in ONE projection chain into a localCheckpoint) is this row's
    // dominant map stage (r20 stage dump: 3.1 s of task time on 8
    // tasks, nothing else over 1.8 s) — the q64g single-dominant-
    // stage rule (Tables.spreadN).
    val static = graft.Tables.documents(spark, dir, wide = true)
      .withColumn("split", Q40TrainTestSplit.splitCol)
      .filter(col("split") === "train")
    // ONE corpus-side text scan (review finding: md5 and signatures
    // were two separate full-text scans): hash + nullable signature
    // in a single projection, checkpointed NARROW (doc_id, 16-byte
    // md5, 32 longs — never text). localCheckpoint because a
    // stream-static join re-evaluates the static plan EVERY trigger —
    // without the barrier the deploy shape would re-scan and re-sign
    // the whole existing corpus per micro-batch.
    val signed = sigFrame(static.withColumn("th", md5(col("text"))), "th")
      .select(col("doc_id").as("base_id"), col("th"), col("sig"))
      .localCheckpoint()
    val baseHash = signed.select(col("th"), col("base_id"))
    val baseBands = signed.filter(col("sig").isNotNull)
      .select(col("base_id"), col("sig").as("bsig"),
        explode(expr(bandsExpr)).as("bkey"))
    val best = verdictStream(deltaStream(spark, dir), baseHash, baseBands)
    formatVerdicts(runToBatch(spark, best, "complete",
      rocksdb = rocksDefault(spark)))
  }

  val oracle = Q57DeltaDedup.oracle
}

/** S12b — s12 against the PERSISTED signature store (q57b's tables):
  * the full deploy shape of incremental ingest. s12's corpus index is
  * a per-run `localCheckpoint` — rebuilt every run, dead with the
  * JVM; here the stream-static joins read the bucketed store tables,
  * which are built once, survive restarts, and serve every trigger
  * AND every run. Per trigger the static side is a bucketed table
  * scan (no corpus text ever re-read, no signatures ever recomputed);
  * at 100 TB this is the difference between an ingest pipeline that
  * starts in seconds and one that re-signs the corpus on every
  * deploy. Same branches, same stateful verdict agg, same RocksDB
  * default, and the SAME q57 oracle as s12 — batch store path (q57b),
  * checkpoint stream path (s12) and store stream path (s12b) must all
  * agree row for row. */
object S12bStreamDeltaDedupStore extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q57bDeltaDedupStore, Q57DeltaDedup}
  val name = "s12b_stream_delta_dedup_store"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val (bandsT, exactT) = Q57bDeltaDedupStore.ensureStore(spark, dir)
    val baseHash = spark.table(exactT)
      .select(col("th"), col("doc_id").as("base_id"))
    val baseBands = spark.table(bandsT)
      .select(col("doc_id").as("base_id"), col("sig").as("bsig"), col("bkey"))
    val best = S12StreamDeltaDedup.verdictStream(
      S12StreamDeltaDedup.deltaStream(spark, dir), baseHash, baseBands)
    S12StreamDeltaDedup.formatVerdicts(runToBatch(spark, best, "complete",
      rocksdb = rocksDefault(spark)))
  }

  val oracle = Q57DeltaDedup.oracle
}

/** S13 — STREAMING MATERIALIZED-VIEW MAINTENANCE: q65's incremental
  * per-source statistics maintained BY the ingest stream itself. s11
  * keeps its dashboard in the STREAM's state store; this query keeps
  * it in the PERSISTED aggregate store (`plans/Stores`) instead —
  * every micro-batch runs one O(batch)+O(store) refresh
  * (`Q65IncrementalStats.refresh`: delta partials merged into the
  * one-row-per-source table), so the view survives restarts, is
  * readable by any other session mid-ingest, and the streaming query
  * itself is STATELESS (foreachBatch over raw document rows — no
  * state store at all; the store table IS the state).
  *
  * This is the deploy split for 100 TB reporting: bounded hot state
  * (per-source counters) can live in the stream (s11); unbounded or
  * shared state belongs in a transactional store the stream refreshes
  * per epoch. The refresh is EPOCH-IDEMPOTENT (round 12): the
  * last-applied epoch id commits in the same table overwrite as the
  * merged partials (`Q65IncrementalStats.refreshEpoch`), so a
  * replayed micro-batch is recognized and skipped — the standard
  * foreachBatch contract (at-least-once delivery + idempotent sink =
  * exactly-once), enforced and failure-injection-tested by
  * Round12Spec (kill the epoch's commit record, restart from the
  * checkpoint, assert no double count).
  *
  * The working table starts as a copy of q65's fingerprinted
  * train-split store (built once per corpus, shared with the batch
  * path — the two refresh paths cannot drift because they call the
  * SAME partials/refresh/merge functions), absorbs the streamed test
  * split, and the final report is the merged store ALONE — nothing is
  * recomputed from the corpus at read time. Shares q65's full-corpus
  * recompute oracle: "stream-maintained view equals batch recompute"
  * is the driver's hash gate. */
object S13StreamIncrementalStats extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q40TrainTestSplit, Q65IncrementalStats}
  val name = "s13_stream_incremental_stats"
  private val s13Run = new AtomicInteger(0)

  /** Drive `delta` (a streaming frame of document rows) to completion,
    * refreshing store table `statsT` once per non-empty micro-batch
    * through the EPOCH-GUARDED refresh ([[Q65IncrementalStats
    * .refreshEpoch]]): the applied epoch id commits atomically with
    * the merged partials, so a micro-batch replayed after a crash
    * (killed between sink apply and checkpoint commit) is recognized
    * and skipped — at-least-once delivery + idempotent sink =
    * exactly-once store contents, now enforced, not just documented.
    * `checkpoint` pins the location so Round12Spec can kill a commit
    * record and restart into a genuine replay; None = run-scoped temp
    * checkpoint (the batch-surface default). Returns the number of
    * refreshes APPLIED (replays don't count). */
  private[graft] def maintain(spark: SparkSession, statsT: String,
      delta: DataFrame, checkpoint: Option[String] = None): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val writer0 = delta.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val writer = checkpoint.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty &&
            Q65IncrementalStats.refreshEpoch(spark, statsT, batch, epochId))
          batches.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val base = Q65IncrementalStats.ensureStore(spark, dir)
    // Run-scoped working copy: the fingerprinted base store stays
    // train-only (q65's contract); re-running s13 must not find its
    // own previous refreshes and double-count the delta.
    val runT = s"graft_s13_store_${s13Run.incrementAndGet()}"
    // dropManaged first: the counter restarts per JVM, so a killed
    // run's orphaned warehouse dir under the same name would fail the
    // CREATE with LOCATION_ALREADY_EXISTS (the writeBucketed hazard).
    graft.plans.Stores.dropManaged(spark, runT)
    spark.table(base).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintain(spark, runT,
        docsStream(spark, dir).filter(Q40TrainTestSplit.splitCol === "test"))
      // Report from the store alone (epoch marker excluded);
      // checkpoint before dropping the table the plan reads from.
      Q65IncrementalStats.merge(spark.table(runT)
          .filter(col("source") =!= Q65IncrementalStats.EpochKey))
        .localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $runT")
  }

  val oracle = Q65IncrementalStats.oracle
}

/** S14 — STREAMING IMAGE-DEDUP INGEST against the persisted dHash
  * store (q25f's table): the s12b lifecycle applied to the image
  * modality. Arriving images (the test-split png tier of the document
  * stream) are decoded through the REAL PNG codec path per
  * micro-batch — the synthesis + `ImageIO` mapPartitions steps are
  * stateless, so the exact batch operators run on the streaming frame
  * unchanged — then banded and joined against the bucketed store (a
  * stream-static join reading pre-partitioned parquet; no image is
  * ever re-hashed corpus-side), and the single stateful operator is
  * the per-image best-base struct aggregation. State grows with the
  * ingest (one verdict row per arriving image), so the stream runs
  * under the RocksDB default like s12/s12b — the s13 rule.
  *
  * Shares q25f's ALL-PAIRS oracle: the streamed banded verdicts must
  * equal the exhaustive batch decision — recall guarantee, store
  * correctness, and stream plumbing in one hash gate. */
object S14StreamImageDedupStore extends GraftQuery {
  import StreamQueries._
  import graft.multimodal.{Multimodal, Q25cImageFeatures, Q25fImageDedupStore}
  import graft.queries.Q40TrainTestSplit
  val name = "s14_stream_image_dedup_store"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val store = Q25fImageDedupStore.storeFrame(spark,
      Q25fImageDedupStore.ensureStore(spark, dir))
    val deltaFeats = Q25cImageFeatures.extractImageFeatures(
        Q25cImageFeatures.imageFrames(
          Multimodal.mediaFrame(docsStream(spark, dir))
            .filter(Q40TrainTestSplit.splitColOf("media_id") === "test")))
      .toDF().select(col("media_id"), col("dhash"))
    val best = Q25fImageDedupStore.verdictFrame(deltaFeats, store)
    Q25fImageDedupStore.formatVerdicts(runToBatch(spark, best, "complete",
      rocksdb = rocksDefault(spark)))
  }

  val oracle = Q25fImageDedupStore.oracle
}

/** S15 — STREAMING TOKENIZER ENCODE against the persisted vocabulary
  * (q64e's store): the tokenizer-artifact lifecycle closed end to
  * end. The vocabulary is trained ONCE per corpus fingerprint
  * (q64c's driver-local learner through `plans/Stores`); every
  * arriving micro-batch of documents is encoded by the SAME
  * broadcast dictionary join as the batch tiers
  * (`Q64bBpeEncode.encodePartials` — one implementation, so the
  * batch recompute (q64b), in-memory (q64d), store (q64e) and
  * streaming (s15) paths cannot drift), and the per-epoch partials
  * are appended to a run-scoped working table; the report is the
  * merged partials with fertility derived after the final merge.
  *
  * The streaming query itself is STATELESS (foreachBatch, no state
  * store — the partials table is the state), the s13 rule: encode
  * telemetry is shared, restart-surviving reporting state, so it
  * belongs in a persisted table the stream refreshes per epoch, not
  * in an executor state store. Mergeability is exact: documents are
  * row-atomic per batch, so per-batch distinct-doc counts and token
  * sums ADD — the q65 partials algebra, which is why a multi-epoch
  * ingest equals the one-shot batch encode bit for bit (Round11eSpec
  * drives file-per-trigger epochs; the driver's hash gate holds s15
  * to q64b's full-corpus oracle).
  *
  * 100 TB posture: per trigger the work is O(batch) — tokenize,
  * broadcast-join the vocab-sized dictionary, reduce to a
  * languages-cardinality partial row set; nothing is ever re-encoded
  * and the trained artifact is never re-learned. */
object S15StreamBpeEncodeStore extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q64bBpeEncode, Q64eBpeEncodeStore}
  val name = "s15_stream_bpe_encode_store"
  private val s15Run = new AtomicInteger(0)

  /** Drive `docs` (a streaming frame of document rows) to completion,
    * appending one encode-partial row set per non-empty micro-batch
    * to `partialsT` through the epoch guard ([[StreamQueries
    * .maintainAppend]] — a replayed micro-batch is recognized and
    * skipped); returns the number of epochs APPLIED. */
  private[graft] def maintain(spark: SparkSession, partialsT: String,
      dict: DataFrame, docs: DataFrame,
      checkpoint: Option[String] = None): Long =
    maintainAppend(spark, partialsT, docs, checkpoint)(
      Q64bBpeEncode.encodePartials(_, dict))

  /** Encode an arbitrary document stream against this corpus
    * snapshot's persisted vocabulary; shared by `run` and the
    * multi-epoch spec. */
  private[graft] def encodeStream(spark: SparkSession, dir: String,
      docs: DataFrame): DataFrame = {
    val dict = broadcast(spark.table(
      Q64eBpeEncodeStore.ensureVocab(spark, dir)))
    val runT = s"graft_s15_partials_${s15Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    // Pin the table + schema up front (an empty stream must still
    // report an empty frame, not a missing-table error).
    Q64bBpeEncode.encodePartials(
        spark.table(s"parquet.`$dir/documents.parquet`").limit(0), dict)
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintain(spark, runT, dict, docs)
      Q64bBpeEncode.finishFertility(epochless(spark.table(runT)))
        .localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $runT")
      spark.sql(s"DROP TABLE IF EXISTS ${epochMarkerTable(runT)}")
    }
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    encodeStream(spark, dir, docsStream(spark, dir))

  /** The stream over the full corpus must equal q64b's one-shot
    * batch encode — recompute, store and streaming tiers share one
    * hash gate. */
  val oracle: Option[String] = Q64bBpeEncode.oracle
}

/** S16 — STREAMING SEMANTIC-DEDUP INGEST against the persisted
  * cluster store (q70b's tables): the store-stream column of the
  * dedup matrix for the EMBEDDING family (text s12b, image s14,
  * semantic here). Arriving delta vectors (the test split of the
  * embeddings stream) are assigned per micro-batch against the
  * broadcast stored centroids and verdict-joined against the
  * bucketed assignment store by the SAME `Q70bSemanticDedupStore
  * .ingest` function the batch tier runs — one implementation, so
  * the batch-store and stream-store tiers cannot drift.
  *
  * Unlike s12/s14 (whose best-base aggregation is kept in stream
  * state under the RocksDB default), the semantic verdict needs NO
  * cross-trigger state at all: each delta vector's verdict is a pure
  * function of (vector, store) — candidates live in the same
  * micro-batch as the vector by construction. So the stream is
  * STATELESS (foreachBatch appends each epoch's verdict frame to a
  * run-scoped audit table — the s13 rule: shared, restart-surviving
  * results belong in a persisted table, and the right amount of
  * executor state is none).
  *
  * Shares q70b's ALL-PAIRS oracle: the per-epoch streamed verdicts
  * must equal the exhaustive train×test decision — cluster-recall,
  * store correctness and stream plumbing in one hash gate. */
object S16StreamSemanticDedupStore extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q40TrainTestSplit, Q70bSemanticDedupStore}
  val name = "s16_stream_semantic_dedup_store"
  private val s16Run = new AtomicInteger(0)

  /** Drive a delta embedding stream to completion, appending one
    * verdict frame per non-empty micro-batch through the epoch guard
    * ([[StreamQueries.maintainAppend]]); returns epochs APPLIED. */
  private[graft] def maintain(spark: SparkSession, verdictsT: String,
      cent: DataFrame, store: DataFrame, delta: DataFrame,
      checkpoint: Option[String] = None): Long =
    maintainAppend(spark, verdictsT, delta, checkpoint)(
      Q70bSemanticDedupStore.ingest(_, cent, store))

  private[graft] def embeddingsStream(spark: SparkSession,
      dir: String): DataFrame = {
    val sch = spark.read.parquet(s"$dir/embeddings.parquet").schema
    spark.readStream.schema(sch).parquet(s"$dir/{embeddings}.parquet")
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val (centT, assignT) = Q70bSemanticDedupStore.ensureStore(spark, dir)
    val cent = spark.table(centT)
    val store = spark.table(assignT)
    val runT = s"graft_s16_verdicts_${s16Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    Q70bSemanticDedupStore.ingest(
        spark.read.parquet(s"$dir/embeddings.parquet").limit(0), cent, store)
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintain(spark, runT, cent, store,
        embeddingsStream(spark, dir)
          .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test"))
      epochless(spark.table(runT)).orderBy(col("vec_id")).localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $runT")
      spark.sql(s"DROP TABLE IF EXISTS ${epochMarkerTable(runT)}")
    }
  }

  val oracle: Option[String] = Q70bSemanticDedupStore.oracle
}

/** S17 — STREAMING MULTIMODAL ADMISSION: q71's cross-modality
  * decision at INGEST TIME, against the persisted stores — the
  * capstone composition of the store column. Arriving documents (the
  * test split) pass four gates per micro-batch: s11's text
  * admission (PII-free, token floor — stateless map), the image
  * delta-dedup against q25f's banded dHash store (the real PNG codec
  * runs per batch; `verdictFrame` is the same function s14 streams),
  * the semantic delta-dedup against q70b's cluster store (the
  * same `ingest` s16 streams, over the batch's embeddings), and —
  * since q25h landed (round-11 cont.) — the audio delta-dedup
  * against the persisted fingerprint store (the same generic
  * `verdictFrame` s18 streams). One admission row per document:
  * admit ⇔ text_ok ∧ ¬image_dup ∧ ¬sem_dup ∧ ¬audio_dup.
  *
  * Every gate is a pure function of (row, stores), so the stream is
  * STATELESS (foreachBatch appends per-epoch admission frames — the
  * s16 rationale, now across four gates at once), and every gate is
  * the FACTORED production operator: this query contains no
  * decision logic of its own, only the composition.
  *
  * The oracle replays all four decisions relationally over the
  * test split (text gates + exhaustive train×test image and audio
  * Hamming + the q70b delta chain) — the full multimodal admission
  * pipeline, codec path and store recall guarantees included, in
  * one hash gate. */
object S17StreamMultimodalAdmission extends GraftQuery {
  import StreamQueries._
  import graft.multimodal.{Multimodal, Q25cImageFeatures, Q25dImageNearDup, Q25fImageDedupStore, Q25hAudioDedupStore}
  import graft.queries.{Curation, NorthStar, Q40TrainTestSplit, Q42CorpusClean, Q70bSemanticDedupStore}
  val name = "s17_stream_multimodal_admission"
  private val s17Run = new AtomicInteger(0)

  /** One micro-batch of raw document rows → admission verdicts
    * against the three persisted stores (image, semantic, audio —
    * the audio gate landed with q25h, round-11 continuation). */
  private[graft] def admitBatch(docs: DataFrame, imgStore: DataFrame,
      cent: DataFrame, semStore: DataFrame, embs: DataFrame,
      audStore: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val gates = docs.select(col("doc_id"),
      ((size(regexp_extract_all(col("text"), lit(Curation.EmailPat), lit(0))) +
        size(regexp_extract_all(col("text"), lit(Curation.PhonePat), lit(0))) +
        size(regexp_extract_all(col("text"), lit(Curation.Ipv4Pat), lit(0)))) === 0 &&
        size(expr(NorthStar.toksExpr)) >= Q42CorpusClean.MinTokens).as("text_ok"))
    val feats = Q25cImageFeatures.extractImageFeatures(
        Q25cImageFeatures.imageFrames(Multimodal.mediaFrame(docs)))
      .toDF().select(col("media_id"), col("dhash"))
    val imgDup = Q25fImageDedupStore.formatVerdicts(
        Q25fImageDedupStore.verdictFrame(feats, imgStore))
      .filter(col("verdict") === "dup")
      .select(col("media_id").as("doc_id"), lit(true).as("image_dup"))
    val semDup = Q70bSemanticDedupStore.ingest(
        embs.join(docs.select(col("doc_id").as("vec_id")), "vec_id"),
        cent, semStore)
      .filter(col("verdict") === "dup")
      .select(col("vec_id").as("doc_id"), lit(true).as("sem_dup"))
    val audFeats = graft.multimodal.Q25gAudioNearDup.extractFingerprints(
        Multimodal.wavRows(Multimodal.mediaFrame(docs)),
        codec = Multimodal.WavCodec).toDF()
      .select(col("media_id"), col("ahash").as("dhash"))
    val audDup = Q25hAudioDedupStore.store.formatVerdicts(
        Q25hAudioDedupStore.store.verdictFrame(audFeats, audStore))
      .filter(col("verdict") === "dup")
      .select(col("media_id").as("doc_id"), lit(true).as("audio_dup"))
    gates
      .join(imgDup, Seq("doc_id"), "left")
      .join(semDup, Seq("doc_id"), "left")
      .join(audDup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text_ok"),
        coalesce(col("image_dup"), lit(false)).as("image_dup"),
        coalesce(col("sem_dup"), lit(false)).as("sem_dup"),
        coalesce(col("audio_dup"), lit(false)).as("audio_dup"))
      .withColumn("admit",
        col("text_ok") && !col("image_dup") && !col("sem_dup") &&
          !col("audio_dup"))
  }

  /** Drive a delta document stream to completion, appending one
    * admission frame per non-empty micro-batch through the epoch
    * guard ([[StreamQueries.maintainAppend]]); returns epochs
    * APPLIED. */
  private[graft] def maintain(spark: SparkSession, verdictsT: String,
      imgStore: DataFrame, cent: DataFrame, semStore: DataFrame,
      embs: DataFrame, audStore: DataFrame, docs: DataFrame,
      checkpoint: Option[String] = None): Long =
    maintainAppend(spark, verdictsT, docs, checkpoint)(
      admitBatch(_, imgStore, cent, semStore, embs, audStore))

  def run(spark: SparkSession, dir: String): DataFrame = {
    val imgStore = Q25fImageDedupStore.storeFrame(spark,
      Q25fImageDedupStore.ensureStore(spark, dir))
    val (centT, assignT) = Q70bSemanticDedupStore.ensureStore(spark, dir)
    val (cent, semStore) = (spark.table(centT), spark.table(assignT))
    val embs = graft.Tables.embeddings(spark, dir)
    val audStore = Q25hAudioDedupStore.store.storeFrame(spark,
      Q25hAudioDedupStore.ensureStore(spark, dir))
    val runT = s"graft_s17_verdicts_${s17Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    admitBatch(spark.read.parquet(s"$dir/documents.parquet").limit(0),
        imgStore, cent, semStore, embs, audStore)
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintain(spark, runT, imgStore, cent, semStore, embs, audStore,
        docsStream(spark, dir)
          .filter(Q40TrainTestSplit.splitCol === "test"))
      epochless(spark.table(runT)).orderBy(col("doc_id")).localCheckpoint(true)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $runT")
      spark.sql(s"DROP TABLE IF EXISTS ${epochMarkerTable(runT)}")
    }
  }

  private val duckSplitDoc =
    "CASE WHEN instr('0123456789abcdef', " +
      "substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 13 " +
      "THEN 'train' ELSE 'test' END"

  val oracle = Some(s"""
    WITH del AS (
      SELECT doc_id, text FROM documents
      WHERE ($duckSplitDoc) = 'test'),
    gate AS (
      SELECT doc_id,
        (CAST(length(regexp_extract_all(text, '${Curation.EmailPat}'))
            + length(regexp_extract_all(text, '${Curation.PhonePat}'))
            + length(regexp_extract_all(text, '${Curation.Ipv4Pat}')) AS BIGINT) = 0
         AND CAST(len(${NorthStar.duckToks}) AS BIGINT) >= ${Q42CorpusClean.MinTokens})
          AS text_ok
      FROM del),
    ${Q25cImageFeatures.duckChain},
    isp AS (
      SELECT media_id,
        CASE WHEN instr('0123456789abcdef',
               substr(md5(CAST(media_id AS VARCHAR)), 32, 1)) - 1 < 13
             THEN 'train' ELSE 'test' END AS split
      FROM m),
    iham AS (
      SELECT dx.media_id,
        CAST(SUM(bit_count(xor(x.b, y.b))) AS BIGINT) AS hamming
      FROM isp dx JOIN isp bx ON dx.split = 'test' AND bx.split = 'train'
      JOIN by_row x ON x.media_id = dx.media_id
      JOIN by_row y ON y.media_id = bx.media_id AND y.gy = x.gy
      GROUP BY dx.media_id, bx.media_id),
    idup AS (SELECT DISTINCT media_id AS doc_id FROM iham
             WHERE hamming <= ${Q25dImageNearDup.MaxHamming}),
    ${Q70bSemanticDedupStore.duckDeltaChain},
    sdup AS (SELECT vb AS doc_id FROM doms),
    ${graft.multimodal.Q25gAudioNearDup.duckFpChain("a")},
    asp AS (
      SELECT media_id,
        CASE WHEN instr('0123456789abcdef',
               substr(md5(CAST(media_id AS VARCHAR)), 32, 1)) - 1 < 13
             THEN 'train' ELSE 'test' END AS split
      FROM am),
    aham AS (
      SELECT dx.media_id,
        CAST(SUM(bit_count(xor(x.b, y.b))) AS BIGINT) AS hamming
      FROM asp dx JOIN asp bx ON dx.split = 'test' AND bx.split = 'train'
      JOIN aby_row x ON x.media_id = dx.media_id
      JOIN aby_row y ON y.media_id = bx.media_id AND y.bi = x.bi
      GROUP BY dx.media_id, bx.media_id),
    adup AS (SELECT DISTINCT media_id AS doc_id FROM aham
             WHERE hamming <= ${Q25dImageNearDup.MaxHamming})
    SELECT dl.doc_id, ga.text_ok,
      (i.doc_id IS NOT NULL) AS image_dup,
      (sd.doc_id IS NOT NULL) AS sem_dup,
      (au.doc_id IS NOT NULL) AS audio_dup,
      (ga.text_ok AND i.doc_id IS NULL AND sd.doc_id IS NULL
        AND au.doc_id IS NULL) AS admit
    FROM del dl
    JOIN gate ga ON ga.doc_id = dl.doc_id
    LEFT JOIN idup i ON i.doc_id = dl.doc_id
    LEFT JOIN sdup sd ON sd.doc_id = dl.doc_id
    LEFT JOIN adup au ON au.doc_id = dl.doc_id
    ORDER BY dl.doc_id
  """.trim)
}

/** S18 — STREAMING AUDIO-DEDUP INGEST against the persisted
  * fingerprint store (q25h's table): s14's lifecycle with the hash
  * family swapped, completing the modality dedup matrix's STREAM
  * column for audio. Arriving clips (the test-split wav tier of the
  * document stream) are fingerprinted per micro-batch — the
  * synthesis + energy-contour mapPartitions steps are stateless, so
  * the exact batch operators ride the streaming frame unchanged —
  * then banded and joined against the bucketed store by the SAME
  * generic `BandedHashStore.verdictFrame` the batch path and the
  * image twin use (three consumers, one implementation: the paths
  * cannot drift); the single stateful operator is the per-clip
  * best-base struct aggregation. State grows with the ingest, so the
  * RocksDB default applies (the s13 rule).
  *
  * Shares q25h's ALL-PAIRS oracle: the streamed banded verdicts must
  * equal the exhaustive batch decision — recall guarantee, store
  * correctness, and stream plumbing in one hash gate. */
object S18StreamAudioDedupStore extends GraftQuery {
  import StreamQueries._
  import graft.multimodal.{Multimodal, Q25gAudioNearDup, Q25hAudioDedupStore}
  import graft.queries.Q40TrainTestSplit
  val name = "s18_stream_audio_dedup_store"

  def run(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = Q25hAudioDedupStore.store.storeFrame(spark,
      Q25hAudioDedupStore.ensureStore(spark, dir))
    val deltaFeats = Q25gAudioNearDup.extractFingerprints(
        Multimodal.wavRows(Multimodal.mediaFrame(docsStream(spark, dir))
          .filter(Q40TrainTestSplit.splitColOf("media_id") === "test")),
        codec = Multimodal.WavCodec)
      .toDF().select(col("media_id"), col("ahash").as("dhash"))
    val best = Q25hAudioDedupStore.store.verdictFrame(deltaFeats, store)
    Q25hAudioDedupStore.store.formatVerdicts(
      runToBatch(spark, best, "complete", rocksdb = rocksDefault(spark)))
  }

  val oracle = Q25hAudioDedupStore.oracle
}

/** S19 — STREAMING ANN INGEST: the ADMIT step of the persisted IVF
  * index (q19e), closing the ANN store's lifecycle the way `admit`
  * closes q25f/q25h's. The quantizer is FROZEN — the standard IVF
  * insertion contract: each arriving micro-batch of embeddings is
  * routed to its nearest STORED centroid (K-row broadcast +
  * squared-distance fold + min-of-struct argmax, map-only) and
  * appended to the lists table THROUGH its partition column, so the
  * serve path's pruned-scan posture survives every epoch; a
  * meaningful quantizer drift is a REBUILD, the q64f retrain split.
  *
  * The index here holds the train-split vectors (so the test split
  * is a genuine arriving delta); epochs append into a run-scoped
  * working copy — the fingerprinted base index stays train-only, the
  * s13 re-run rule. The stream is STATELESS (foreachBatch; the
  * partitioned table is the state). Rows-only driver check like the
  * rest of the ANN family (assignments depend on the fitted
  * centroids); Round11fSpec pins stream ≡ one-shot batch ingest,
  * driver-recomputed nearest-centroid agreement, partition routing,
  * and that a post-ingest query FINDS an ingested vector. */
object S19StreamAnnIngest extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q19eAnnIvfStore, Q40TrainTestSplit}
  val name = "s19_stream_ann_ingest"
  private val s19Run = new AtomicInteger(0)

  /** Drive an embedding stream to completion, assigning + appending
    * per non-empty micro-batch; returns epochs. */
  private[graft] def maintain(spark: SparkSession, centT: String,
      listsT: String, vecs: DataFrame): Long = {
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = vecs.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Q19eAnnIvfStore.appendToLists(spark, listsT,
            Q19eAnnIvfStore.assign(spark, centT, batch))
          batches.incrementAndGet()
        }
        ()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }

  /** Snapshot dir (the frozen quantizer's centroid table) of the
    * last [[run]] — the q19f bridge applied to the INGEST tier: the
    * KMeans fit isn't replayable, but the routing of arrivals
    * through the FROZEN stored centroids is pure relational
    * arithmetic (double left-fold sqdist, argmin with ties to the
    * lowest list — the [[graft.queries.Q19eAnnIvfStore.assign]]
    * contract), and the test split is the portable md5 nibble.
    * Dir-keyed (VERDICT r17 #5): interleaved corpora pair via
    * [[oracleFor]]. */
  private val snapshot = new graft.plans.SnapRegistry[String]

  def run(spark: SparkSession, dir: String): DataFrame = {
    val (centT, listsT) = Q19eAnnIvfStore.ensureTrainStore(spark, dir)
    val runT = s"graft_s19_lists_${s19Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    spark.table(listsT)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").partitionBy("list_id").saveAsTable(runT)
    try {
      maintain(spark, centT, runT, embsStream(spark, dir)
        .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test"))
      // The quantizer is FROZEN (write-once per fingerprint): its own
      // warehouse directory is the pinned artifact — no copy needed
      // (the round-16 review).
      snapshot.put(dir, graft.plans.Stores.warehouse(spark)
        .resolve(centT).toAbsolutePath.toString)
      // Report the routed deltas FROM the store (the table is the
      // state); checkpoint before dropping the table the plan reads.
      spark.table(runT)
        .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test")
        .select(col("vec_id"), col("list_id").cast("int").as("list_id"))
        .orderBy(col("vec_id")).localCheckpoint(true)
    } finally spark.sql(s"DROP TABLE IF EXISTS $runT")
  }

  /** HASH oracle over the pinned quantizer: re-route every test-split
    * vector through the stored centroids — the same double left-fold
    * sqdist and (d2, list_id) argmin the ingest ran per epoch. Full
    * stream drained ⇒ the accumulated routing equals this one-shot
    * replay (assignment is per-row; epochs cannot interact). */
  def oracle: Option[String] = snapshot.latest.map(bridge)
  private[graft] def oracleFor(dir: String): Option[String] =
    snapshot.forDir(dir).map(bridge)
  private def bridge(centSnap: String): String = {
    s"""
    WITH cents AS (SELECT list_id, centroid FROM read_parquet('$centSnap/*.parquet')),
    t AS (SELECT vec_id, embedding FROM embeddings
          WHERE instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 32, 1)) - 1 >= 13),
    d AS (SELECT t.vec_id, c.list_id,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(t.embedding)+1),
            i -> (CAST(t.embedding[i] AS DOUBLE) - c.centroid[i]) * (CAST(t.embedding[i] AS DOUBLE) - c.centroid[i]))),
          (a_, x_) -> a_ + x_) AS d2
      FROM t, cents c),
    a AS (SELECT vec_id, list_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, list_id ASC) AS rn
          FROM d)
    SELECT vec_id, CAST(list_id AS INT) AS list_id
    FROM a WHERE rn = 1 ORDER BY vec_id
    """.trim
  }
}

/** S20 — STREAMING excision ingest against q60d's persisted span
  * store: the substring-dedup family's streaming tier, completing its
  * recompute (q60c) / store (q60d) / stream column. Per micro-batch,
  * arriving delta docs explode to window positions (stateless),
  * stream-static LEFT-join the bucketed span store (no corpus-side
  * re-hash, the s12b posture); the one stateful aggregation groups by
  * span hash and keeps (keeper occurrence, all occurrences, store-hit
  * count) — ORDER-INDEPENDENT state, so the verdict is identical
  * however the delta is split across triggers: intra-delta
  * first-occurrence precedence is decided by the (doc_id, i) MIN over
  * the whole stream, not by arrival order. After the stream drains,
  * the final state resolves to removal starts (occurrence ≠ keeper OR
  * hash in store) and q60c's shared mask/reassembly runs as one batch
  * over the delta — exactly q60d's contract, so q60d's oracle gates
  * this path row-identically (cleaned text included).
  *
  * State per span hash is its delta occurrence list — bounded by the
  * shard's own multiplicity (a production shard's repeats of ONE
  * window are few; the base corpus's occurrences never enter state) —
  * and state grows with the shard ⇒ RocksDB default (the s13 rule).
  */
object S20StreamExcise extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q60cExciseDuplicates, Q60dExciseStore, Q40TrainTestSplit}
  val name = "s20_stream_excise"

  /** The stream pipeline over any (doc_id, text) delta stream +
    * static twin — the composable surface run() and the multi-epoch
    * spec share. */
  private[graft] def exciseStream(spark: SparkSession,
      deltaStream: DataFrame, deltaStatic: DataFrame,
      spansT: String): DataFrame = {
    val store = spark.table(spansT)
      .select(col("span_h"), lit(true).as("in_store"))
    val dpos = Q60cExciseDuplicates.spanPositions(
      deltaStream.select(col("doc_id"),
        expr(graft.queries.NorthStar.toksExpr).as("t")))
    val state = dpos.join(store, Seq("span_h"), "left")
      .groupBy(col("span_h"))
      .agg(min(struct(col("doc_id"), col("i"))).as("keeper"),
        collect_list(struct(col("doc_id"), col("i"))).as("occs"),
        count(col("in_store")).as("n_store"))
    val finalState = runToBatch(spark, state, "complete",
      rocksdb = rocksDefault(spark))
    val removals = finalState
      .select(col("keeper"), col("n_store"), explode(col("occs")).as("o"))
      .filter(col("n_store") > 0 ||
        !(col("o.doc_id") === col("keeper.doc_id") &&
          col("o.i") === col("keeper.i")))
      .select(col("o.doc_id").as("doc_id"), col("o.i").as("i"))
    val toks = deltaStatic
      .select(col("doc_id"), expr(graft.queries.NorthStar.toksExpr).as("t"))
    Q60cExciseDuplicates.reassemble(toks, removals)
  }

  def run(spark: SparkSession, dir: String): DataFrame = {
    val spansT = Q60dExciseStore.ensureStore(spark, dir)
    exciseStream(spark,
      docsStream(spark, dir)
        .withColumn("split", Q40TrainTestSplit.splitCol)
        .filter(col("split") === "test"),
      graft.Tables.documents(spark, dir)
        .filter(Q40TrainTestSplit.splitCol === "test"),
      spansT)
  }

  /** Same contract as the batch store path — the oracle is shared. */
  val oracle = Q60dExciseStore.oracle
}

/** S21 — STREAMING WARC ingest: q72b's container front end at ingest
  * time, completing the raw-web family's stream tier (a real crawl
  * pipeline consumes WARC files as they LAND, not as a batch). The
  * whole pipeline is stateless — record synthesis (the q72b fixture
  * riding the stream unchanged, the s14 synthesis rule), the
  * LENGTH-driven framing walk, the HTTP payload split, and q72's
  * block gates all run per micro-batch in append mode with zero
  * state — so the stream is trivially exactly-once under replay and
  * its output is the batch contract row for row: q72b's oracle gates
  * this path unchanged (archive packing never affects per-record
  * output). Multi-record in-stream framing (one FILE per trigger,
  * several records per file, decoys included) is pinned by WarcSpec's
  * streaming case via [[warcStream]].
  */
object S21StreamWarc extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q72HtmlExtract, Q72bWarcExtract}
  val name = "s21_stream_warc"

  /** Gate chain over ANY (warc) archive stream — the composable
    * surface run() and the multi-record spec share. */
  private[graft] def warcStream(archives: DataFrame): DataFrame =
    Q72HtmlExtract.extractCols(
      Q72bWarcExtract.parseArchives(archives)
        .withColumn("doc_id",
          expr("cast(regexp_extract(uri, 'doc/([0-9]+)', 1) as bigint)")),
      Seq("uri", "http_status"))

  def run(spark: SparkSession, dir: String): DataFrame = {
    val stream = docsStream(spark, dir)
      .select(col("doc_id"), expr(Q72bWarcExtract.pageSql).as("page"))
      .select(expr(Q72bWarcExtract.recordSql).as("warc"))
    runToBatch(spark, warcStream(stream), "append")
      .orderBy(col("doc_id"))
  }

  /** Same per-record contract as the batch container path. */
  val oracle = Q72bWarcExtract.oracle
}

/** S22 — STREAMING VIDEO-DEDUP INGEST against the persisted
  * fingerprint store (q25j's table): s14/s18's lifecycle with the
  * hash family swapped, completing the modality dedup matrix's
  * STREAM column for video (the matrix is now full: text
  * s12/s12b, image s14, audio s18, video here). Arriving videos
  * (the test-split class-1 tier of the document stream) are
  * synthesized, demuxed, decoded and fingerprinted per micro-batch —
  * the container synthesis + temporal-pool mapPartitions steps are
  * stateless, so the exact batch operators ride the streaming frame
  * unchanged — then pair-banded and joined against the bucketed
  * store by the SAME generic `BandedHashStore.verdictFrame` the
  * batch path and the image/audio twins use (four consumers, one
  * implementation: the paths cannot drift); the single stateful
  * operator is the per-video best-base struct aggregation. State
  * grows with the ingest, so the RocksDB default applies (the s13
  * rule).
  *
  * Shares q25j's ALL-PAIRS oracle: the streamed banded verdicts must
  * equal the exhaustive batch decision — recall guarantee, store
  * correctness, and stream plumbing in one hash gate. */
object S22StreamVideoDedupStore extends GraftQuery {
  import StreamQueries._
  import graft.multimodal.{Multimodal, Q25eVideoScenes, Q25iVideoNearDup,
    Q25jVideoDedupStore}
  import graft.queries.Q40TrainTestSplit
  val name = "s22_stream_video_dedup_store"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val store = Q25jVideoDedupStore.store.storeFrame(spark,
      Q25jVideoDedupStore.ensureStore(spark, dir))
    val deltaFeats = Q25iVideoNearDup.extractFingerprints(
      Q25eVideoScenes.videoFrames(
        Multimodal.mediaFrame(docsStream(spark, dir))
          .filter(Q40TrainTestSplit.splitColOf("media_id") === "test")))
    val best = Q25jVideoDedupStore.store.verdictFrame(deltaFeats, store)
    Q25jVideoDedupStore.store.formatVerdicts(
      runToBatch(spark, best, "complete", rocksdb = rocksDefault(spark)))
  }

  val oracle = Q25jVideoDedupStore.oracle
}

/** S23 — STREAMING BM25 INDEX MAINTENANCE: the retrieval family's
  * stream tier (q74 recompute, q74b store, here the index kept fresh
  * at INGEST TIME). Each micro-batch contributes its postings
  * increment — `Q74Bm25.postingsOf(batch)`, the SAME tokenize+count
  * the batch tiers run — appended exactly-once through the epoch
  * guard ([[StreamQueries.maintainAppend]]: marker committed after
  * the data append, replay scrubs a partial epoch and re-applies).
  * Appends can never conflict: a doc_id arrives in exactly one batch,
  * so the accumulated table IS the full postings index.
  *
  * Serve derives lengths and the N/Σdl scalars FROM the accumulated
  * postings (dl = Σ tf per doc — the postings carry every word) and
  * feeds q74's own rank() tail. A production deployment at 100 TB
  * would additionally maintain the lengths/meta rollups incrementally
  * (the q65 mergeable-partials pattern) instead of re-reducing the
  * index per serve; at index scale that is one keyed reduce and the
  * exactly-once maintenance — the part a stream can get wrong — is
  * what this tier pins.
  *
  * The full corpus streamed through must serve exactly q74's batch
  * answer: SHARES q74's oracle, one hash gate across all three tiers. */
object S23StreamBm25Index extends GraftQuery {
  import StreamQueries._
  import graft.queries.Q74Bm25
  val name = "s23_stream_bm25_index"
  private val s23Run = new AtomicInteger(0)

  /** Drive `docs` to completion, appending one postings increment per
    * non-empty micro-batch to `postT`; returns epochs APPLIED. */
  private[graft] def maintain(spark: SparkSession, postT: String,
      docs: DataFrame, checkpoint: Option[String] = None): Long =
    maintainAppend(spark, postT, docs, checkpoint)(Q74Bm25.postingsOf)

  /** Serve BM25 from an accumulated postings table — q74's rank()
    * tail over index-derived tf/dl/scalars. */
  private[graft] def serve(spark: SparkSession, postT: String): DataFrame = {
    import spark.implicits._
    val post = epochless(spark.table(postT))
    val dl = post.groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("long").as("dl"))
      .localCheckpoint(true)
    val scal = dl.agg(count(lit(1)).cast("long"),
      sum(col("dl")).cast("long")).head()
    val qwords = Q74Bm25.querySet.flatMap(_._2).distinct.toDF("word")
    val tf = post.join(broadcast(qwords), Seq("word"))
      .localCheckpoint(true)
    Q74Bm25.rank(spark, tf, dl, scal.getLong(0), scal.getLong(1))
  }

  /** Build this run's streamed index (bootstrap + full drive of the
    * corpus stream), hand the accumulated postings table to `f`, and
    * tear the run-scoped pair down after — shared by the serve tier
    * (run) and the compaction tier (s23b). */
  private[graft] def withIndex[A](spark: SparkSession, dir: String)
      (f: String => A): A = {
    val runT = s"graft_s23_postings_${s23Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    // Pin table + schema up front (an empty stream must still serve
    // an empty index, not a missing-table error).
    Q74Bm25.postingsOf(
        spark.table(s"parquet.`$dir/documents.parquet`").limit(0))
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintain(spark, runT, docsStream(spark, dir))
      f(runT)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $runT")
      spark.sql(s"DROP TABLE IF EXISTS ${epochMarkerTable(runT)}")
    }
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    withIndex(spark, dir)(runT => serve(spark, runT).localCheckpoint(true))

  /** The streamed index must serve exactly the batch answer. */
  val oracle: Option[String] = Q74Bm25.oracle
}

/** S23b — COMPACTION of the streamed BM25 index: s23's exactly-once
  * ingest necessarily accumulates one file set per epoch (each
  * micro-batch appends its postings increment), and a long-lived
  * streaming index degrades into a small-files scan. Compaction
  * rewrites the accumulated postings into q74b's bucketed-by-word
  * store layout — a pure LAYOUT move (one shuffle of the index, NO
  * corpus re-tokenize) — and serving from the compacted table must
  * answer exactly what the fragmented table did: SHARES q74's oracle,
  * so recompute / store / stream / stream-compacted are all one hash
  * gate. The spec additionally pins the operational claims: the file
  * count actually drops and the pre/post serves are row-identical. */
object S23bStreamBm25Compact extends GraftQuery {
  import StreamQueries._
  import graft.queries.Q74Bm25
  val name = "s23b_stream_bm25_compact"
  private val s23bRun = new AtomicInteger(0)

  /** Rewrite `postT` (epoch-append layout) into a bucketed-by-word
    * postings table; returns the compacted table's name. */
  private[graft] def compactTo(spark: SparkSession, postT: String): String = {
    val compactT = s"graft_s23b_compact_${s23bRun.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, compactT)
    // repartition by the bucket key so each task owns one bucket and
    // writes ONE file — without it bucketBy fans out to (input
    // partitions × buckets) files and the "compaction" fragments
    // (the Bucketing.compact rule).
    graft.plans.Bucketing.writeBucketed(
      epochless(spark.table(postT))
        .repartition(graft.queries.Q74bBm25Store.PostingsBuckets, col("word")),
      compactT, "word", graft.queries.Q74bBm25Store.PostingsBuckets)
    compactT
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    S23StreamBm25Index.withIndex(spark, dir) { runT =>
      val compactT = compactTo(spark, runT)
      try S23StreamBm25Index.serve(spark, compactT).localCheckpoint(true)
      finally graft.plans.Stores.dropManaged(spark, compactT)
    }

  /** Compacted serve ≡ fragmented serve ≡ batch answer. */
  val oracle: Option[String] = Q74Bm25.oracle
}

/** S24 — HYBRID FUSION OVER A FRESHLY-INGESTED INDEX, SERVED FOR
  * CALLER QUERY TABLES: the retrieval family's freshness story
  * (round-14 residual #2), completed with q75d's parameterization
  * (VERDICT r16 #3). q75b fuses the compiled query pack from the
  * STATIC full-corpus IVF store; a production search path serves
  * each arriving QUERY BATCH — a (query_id, word) term table from
  * the analyzer and a (query_id, qv) probe pairing from the encoder
  * — while new embeddings stream in. Here the base index holds the
  * train-split vectors (q19e's `ensureTrainStore` — the s19 shape),
  * the test split arrives as a genuine embedding stream routed
  * through the FROZEN quantizer into a run-scoped working copy
  * (s19's `maintain` — appends ride the list_id partition column, so
  * the serve's pruned-scan posture survives every epoch), and the
  * fusion then serves the caller tables through EXACTLY q75b's
  * parameterized arm + fusion plans
  * ([[graft.queries.Q75bHybridRrfStore.lexArmFor]]/`semArmFrom`/
  * `fuse` — shared code, arithmetic cannot fork). The entry replays
  * q75d's fixture batch — q74f's term table with probe vectors whose
  * vec_id == query_id — so the parameterization is exercised, not a
  * default. Round17Spec plan-asserts both prunes survive the
  * streamed serve: the lex postings scan bucket-prunes from the
  * dynamic term batch and the lists scan partition-prunes to the
  * probed lists.
  *
  * HASH oracle (q75b's bridge, lex chain parameterized by the same
  * term batch); Round14Spec keeps the epoch-split-invariance and
  * both-arms gates. */
object S24StreamHybridFusion extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q19eAnnIvfStore, Q40TrainTestSplit,
    Q75bHybridRrfStore, Q75dFusionQueryTables, Q74fBm25QueryTable}
  val name = "s24_stream_hybrid_fusion"
  private val s24Run = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The caller tables this entry serves: q75d's fixture batch —
    * q74f's (query_id, word) terms; probe pairs vec_id == query_id
    * (disjoint from every compiled-in set, so q19h's self-exclusion
    * rule applies unchanged). */
  private[graft] val termBatch: Seq[(Int, Seq[String])] =
    Q75dFusionQueryTables.termBatch
  private[graft] val queryPairs: Seq[(Int, Long)] =
    Q75dFusionQueryTables.vecIds.map(v => (v.toInt, v))

  /** Fuse the caller tables from a bound (centroids, working-lists)
    * family — shared by the streamed run and the spec's one-shot
    * batch twin. */
  private[graft] def fuseFrom(spark: SparkSession, dir: String,
      centT: String, listsT: String): DataFrame =
    Q75bHybridRrfStore.fuse(
      Q75bHybridRrfStore.lexArmFor(spark, dir,
        Q74fBm25QueryTable.queriesDf(spark)),
      Q75bHybridRrfStore.semArmFrom(spark, dir, centT, listsT, queryPairs))

  /** Build the run-scoped working index (train-split base copy), run
    * `ingest` over it, hand (centT, workT) to `f`, tear down. */
  private[graft] def withWorkingIndex[A](spark: SparkSession, dir: String)
      (ingest: (String, String) => Unit)(f: (String, String) => A): A = {
    val (centT, listsT) = Q19eAnnIvfStore.ensureTrainStore(spark, dir)
    val workT = s"graft_s24_lists_${s24Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, workT)
    spark.table(listsT)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").partitionBy("list_id").saveAsTable(workT)
    try { ingest(centT, workT); f(centT, workT) }
    finally spark.sql(s"DROP TABLE IF EXISTS $workT")
  }

  /** Snapshot dirs (probe triples, post-ingest working membership) of
    * the last [[run]] — q75b's bridge over the FRESH index: once the
    * stream has drained, the working index is rows on disk, so the
    * fused serve over it replays exactly like the static tier.
    * Dir-keyed (VERDICT r17 #5): interleaved corpora pair via
    * [[oracleFor]]. */
  private val snapshot = new graft.plans.SnapRegistry[(String, String)]

  def run(spark: SparkSession, dir: String): DataFrame =
    withWorkingIndex(spark, dir) { (centT, workT) =>
      S19StreamAnnIngest.maintain(spark, centT, workT,
        embsStream(spark, dir)
          .filter(Q40TrainTestSplit.splitColOf("vec_id") === "test"))
      ()
    } { (centT, workT) =>
      snapshot.put(dir, Q75bHybridRrfStore.writeSnapshots(spark,
        Q75bHybridRrfStore.probeTriples(spark, dir, centT, queryPairs),
        workT,
        graft.plans.Stores.snapPath(spark, "graft_s24_probe_snap", dir,
          Seq("embeddings.parquet")),
        graft.plans.Stores.snapPath(spark, "graft_s24_mem_snap", dir,
          Seq("embeddings.parquet"))))
      fuseFrom(spark, dir, centT, workT).localCheckpoint(true)
    }

  /** HASH oracle (round 16; caller tables round 17): q75b's
    * pinned-snapshot fusion replay over the snapshots taken AFTER
    * the ingest drained — the streamed working index is gated to
    * serve exactly what its rows say — with the LEX chain replayed
    * over the same caller term batch the serve took (VERDICT r16
    * #3). Round14Spec keeps the epoch-split-invariance and
    * both-arms gates. */
  def oracle: Option[String] = snapshot.latest.map(bridge)
  private[graft] def oracleFor(dir: String): Option[String] =
    snapshot.forDir(dir).map(bridge)
  private def bridge(v: (String, String)): String =
    Q75bHybridRrfStore.duckFusionOracle(v._1, v._2,
      termBatch = Some(termBatch))
}

/** S25 — PHRASE QUERIES over the STREAMED positional index: closes
  * positional retrieval's stream column (round-14 residual #4). s23's
  * exactly-once maintenance already accumulates POSITIONS with every
  * postings increment (they ride `Q74Bm25.postingsOf` — additive like
  * tf), so the streamed index answers phrase queries with no extra
  * maintenance at all: this tier streams the corpus in (s23's
  * `withIndex` — epoch-guarded appends), then serves q74c's phrase
  * plan over the accumulated table ([[graft.queries
  * .Q74cBm25PhraseStore.serveFromFrame]] — shared code; on the
  * epoch-append layout the term filter is a pushed scan filter where
  * the bucketed store gets static pruning, which is exactly the
  * compaction trade s23b prices).
  *
  * SHARES q74c's oracle: the streamed index must answer phrase
  * queries exactly as the built store does — one more tier under the
  * positional family's single hash gate. */
object S25StreamPhrase extends GraftQuery {
  import StreamQueries._
  import graft.queries.Q74cBm25PhraseStore
  val name = "s25_stream_phrase"

  def run(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.S23StreamBm25Index.withIndex(spark, dir) { runT =>
      Q74cBm25PhraseStore.serveFromFrame(spark,
          epochless(spark.table(runT)))
        .localCheckpoint(true)
    }

  /** Streamed-index phrase serve ≡ store phrase serve. */
  val oracle: Option[String] = Q74cBm25PhraseStore.oracle
}

/** S26 — STREAMING DRIFT GATE: the drift-gated stores' ingest twin
  * (q64n/q64o/q64p decide() at stream time). Arriving documents are
  * measured per micro-batch against the three bound tokenizer stores
  * — BPE vocab, WordPiece pieces, Unigram scores — and the per-epoch
  * frames carry only the families' ADDITIVE counters (n_words,
  * oov/unk words, in-vocab token and word sums per language): the
  * per-lang RATES the gates threshold are NOT additive, so the
  * correct stream shape is mergeable partials + gate-at-serve (the
  * q65/s13 posture), never per-batch verdict rows. Serve rolls the
  * epochs up and runs each family's own gate arithmetic
  * ([[graft.queries.Q64nBpeDriftGatedStore.gateOf]] et al. — shared
  * code, the thresholds cannot fork), aligned to one console schema
  * (family, lang, fertilities, aux signal, retrain).
  *
  * Full corpus streamed ⇒ exactly the batch gates' answers (the s23
  * invariance: additive counters are epoch-split-invariant), so the
  * oracle is the three gate oracles' aligned UNION — one hash gate
  * across batch and streamed drift decisions.
  *
  * Since round 16 the gate report is PERSISTED per corpus snapshot
  * ([[S26StreamDriftGate.ensureGateReport]] — VERDICT r15 #2): an
  * arriving snapshot whose fingerprint matches a bound report serves
  * with one table read instead of re-measuring three families per
  * epoch; the streamed path remains the build plan (and the specs'
  * direct surface). */
object S26StreamDriftGate extends GraftQuery {
  import StreamQueries._
  import graft.queries.{Q64nBpeDriftGatedStore, Q64oWordpieceDriftGatedStore, Q64pUnigramDriftGatedStore}
  val name = "s26_stream_drift_gate"
  private val s26Run = new AtomicInteger(0)

  /** One micro-batch → the three families' additive partials, column-
    * aligned (aux_words = the family's OOV/[UNK] word counter). */
  private[graft] def partialsBatch(spark: SparkSession, batch: DataFrame,
      vocabN: String, piecesO: String, piecesP: String): DataFrame = {
    val bpe = Q64nBpeDriftGatedStore
      .measured(spark, batch, broadcast(spark.table(vocabN)))
      .select(lit("bpe").as("family"), col("lang"), col("n_words"),
        col("oov_words").as("aux_words"),
        col("invocab_ntok"), col("invocab_words"))
    val wp = Q64oWordpieceDriftGatedStore.measured(spark, batch, piecesO)
      .select(lit("wordpiece").as("family"), col("lang"), col("n_words"),
        col("unk_words").as("aux_words"),
        col("invocab_ntok"), col("invocab_words"))
    val uni = Q64pUnigramDriftGatedStore.measured(spark, batch, piecesP)
      .select(lit("unigram").as("family"), col("lang"), col("n_words"),
        col("oov_words").as("aux_words"),
        col("invocab_ntok"), col("invocab_words"))
    bpe.unionByName(wp).unionByName(uni)
  }

  /** Roll the accumulated partials up and gate each family against
    * its frozen baseline — the serve every epoch split must agree on. */
  private[graft] def gateRollup(spark: SparkSession, partials: DataFrame,
      statsN: String, statsO: String, statsP: String): DataFrame = {
    val rolled = partials.groupBy(col("family"), col("lang"))
      .agg(sum(col("n_words")).as("n_words"),
        sum(col("aux_words")).as("aux_words"),
        sum(col("invocab_ntok")).as("invocab_ntok"),
        sum(col("invocab_words")).as("invocab_words"))
      .localCheckpoint(true) // three family filters read it
    def fam(name: String, auxAs: String) = rolled
      .filter(col("family") === name)
      .select(col("lang"), col("n_words"), col("aux_words").as(auxAs),
        col("invocab_ntok"), col("invocab_words"))
    val bpe = Q64nBpeDriftGatedStore
      .gateOf(spark, fam("bpe", "oov_words"), statsN)
      .select(lit("bpe").as("family"), col("lang"),
        col("stored_fertility"), col("current_fertility"),
        col("oov_rate").as("aux_signal"), lit("oov_rate").as("aux_kind"),
        col("n_words"), col("oov_words").as("aux_words"),
        col("rel_drift"), col("retrain"))
    val wp = Q64oWordpieceDriftGatedStore
      .gateOf(spark, fam("wordpiece", "unk_words"), statsO)
      .select(lit("wordpiece").as("family"), col("lang"),
        col("stored_fertility"), col("current_fertility"),
        col("unk_jump").as("aux_signal"), lit("unk_jump").as("aux_kind"),
        col("n_words"), col("unk_words").as("aux_words"),
        col("rel_drift"), col("retrain"))
    val uni = Q64pUnigramDriftGatedStore
      .gateOf(spark, fam("unigram", "oov_words"), statsP)
      .select(lit("unigram").as("family"), col("lang"),
        col("stored_fertility"), col("current_fertility"),
        col("oov_rate").as("aux_signal"), lit("oov_rate").as("aux_kind"),
        col("n_words"), col("oov_words").as("aux_words"),
        col("rel_drift"), col("retrain"))
    bpe.unionByName(wp).unionByName(uni)
      .orderBy(col("family"), col("lang"))
  }

  /** The full streamed measurement — bootstrap, drive, roll up, gate.
    * The persisted report's BUILD plan; specs exercising the epoch
    * machinery drive this path directly. */
  private[graft] def streamedGate(spark: SparkSession, dir: String): DataFrame = {
    val (vocabN, statsN) = Q64nBpeDriftGatedStore.ensureStore(spark, dir)
    val (piecesO, statsO) = Q64oWordpieceDriftGatedStore.ensureStore(spark, dir)
    val (piecesP, statsP) = Q64pUnigramDriftGatedStore.ensureStore(spark, dir)
    val runT = s"graft_s26_partials_${s26Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    partialsBatch(spark,
        spark.read.parquet(s"$dir/documents.parquet").limit(0),
        vocabN, piecesO, piecesP)
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintainAppend(spark, runT, docsStream(spark, dir))(
        partialsBatch(spark, _, vocabN, piecesO, piecesP))
      gateRollup(spark, epochless(spark.table(runT)),
        statsN, statsO, statsP).localCheckpoint(true)
    } finally {
      graft.plans.Stores.dropManaged(spark, runT)
      graft.plans.Stores.dropManaged(spark, epochMarkerTable(runT))
    }
  }

  /** Build (or bind) the PERSISTED streamed-gate report for this
    * corpus snapshot (VERDICT r15 #2 — the q78 pattern applied to the
    * stream tier): the gate verdict is a pure function of the
    * snapshot (both measurement sides derive from it), so when the
    * ARRIVING snapshot's fingerprint matches a bound report the serve
    * is ONE tiny table read — the three-family per-epoch measurement
    * (the board's most expensive floor) is paid once per snapshot at
    * build. A different or partial arrival changes the fingerprint
    * and takes the full streamed path. The layout version folds in
    * the six gate thresholds (q78's rule) plus the three family-store
    * layouts: a threshold or stats-schema change must retire the
    * report exactly like a corpus change. */
  private[graft] def ensureGateReport(spark: SparkSession, dir: String): String =
    graft.plans.Stores.ensure(spark, "graft_s26rpt", dir, Seq("report"),
        layoutVersion = graft.queries.Q78DriftConsole.reportLayoutVersion +
          "n" + Q64nBpeDriftGatedStore.layoutV +
          "o" + Q64oWordpieceDriftGatedStore.layoutV +
          "p" + Q64pUnigramDriftGatedStore.layoutV) {
      case Seq(reportT) =>
        streamedGate(spark, dir)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .format("parquet").saveAsTable(reportT)
    }.head

  def run(spark: SparkSession, dir: String): DataFrame =
    spark.table(ensureGateReport(spark, dir))
      .orderBy(col("family"), col("lang"))

  /** The three gate oracles, aligned and stitched (the q78 pattern):
    * full corpus streamed ⇒ each family reads exactly its batch gate. */
  val oracle: Option[String] = Some {
    def arm(fam: String, sig: String, kind: String, words: String,
        inner: String) =
      s"""SELECT '$fam' AS family, lang, stored_fertility,
        current_fertility, $sig AS aux_signal, '$kind' AS aux_kind,
        n_words, $words AS aux_words, rel_drift, retrain
      FROM (${inner.trim}) ${fam}_t"""
    s"""
    ${arm("bpe", "oov_rate", "oov_rate", "oov_words",
      Q64nBpeDriftGatedStore.oracle.get)}
    UNION ALL
    ${arm("wordpiece", "unk_jump", "unk_jump", "unk_words",
      Q64oWordpieceDriftGatedStore.oracle.get)}
    UNION ALL
    ${arm("unigram", "oov_rate", "oov_rate", "oov_words",
      Q64pUnigramDriftGatedStore.oracle.get)}
    ORDER BY family, lang
  """.trim
  }
}

/** S27 — STREAMING DSIR ADMISSION: data selection at INGEST time,
  * completing the DSIR family's stream column (q77 recompute, q77c
  * arbitrary target, q77d store — here the store consumed per
  * micro-batch, the deploy shape: score every arriving shard against
  * the FROZEN importance model and admit iff the weight clears the
  * curator's bar). Per epoch: one map-only gram pass over the batch,
  * the ≤B-row broadcast λ join, one per-doc exact-integer aggregate,
  * the O(1) threshold compare ([[graft.queries.Q77dDsirStore
  * .serveFrom]] — shared code, the tiers cannot drift); verdict
  * frames append exactly-once through the epoch guard
  * ([[StreamQueries.maintainAppend]]).
  *
  * Scoring is PER-DOC (no cross-doc state at all), so the streamed
  * verdicts are trivially epoch-split-invariant and the full corpus
  * streamed ⇒ exactly q77d's batch serve: SHARES q77d's oracle — one
  * hash gate across the store and stream tiers. */
object S27StreamDsirAdmission extends GraftQuery {
  import StreamQueries._
  import graft.queries.Q77dDsirStore
  val name = "s27_stream_dsir_admission"
  private val s27Run = new AtomicInteger(0)

  def run(spark: SparkSession, dir: String): DataFrame = {
    val (lamT, barT) = Q77dDsirStore.ensureStore(spark, dir)
    val (thresh, lam0) = Q77dDsirStore.barOf(spark, barT)
    val runT = s"graft_s27_verdicts_${s27Run.incrementAndGet()}"
    graft.plans.Stores.dropManaged(spark, runT)
    Q77dDsirStore.serveFrom(spark,
        spark.read.parquet(s"$dir/documents.parquet").limit(0),
        lamT, thresh, lam0)
      .withColumn("_epoch", lit(-1L))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(runT)
    try {
      maintainAppend(spark, runT, docsStream(spark, dir))(
        Q77dDsirStore.serveFrom(spark, _, lamT, thresh, lam0))
      epochless(spark.table(runT)).orderBy(col("doc_id"))
        .localCheckpoint(true)
    } finally {
      graft.plans.Stores.dropManaged(spark, runT)
      graft.plans.Stores.dropManaged(spark, epochMarkerTable(runT))
    }
  }

  /** Streamed admission ≡ the store's batch serve. */
  val oracle: Option[String] = Q77dDsirStore.oracle
}
