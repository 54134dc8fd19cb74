package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{RankedOrder, TopKOrdersAgg}

/** Round-5 analytics surface: bounded-state per-key top-k (q7b),
  * unpivot/melt (q35), decimal-exact statistical moments (q36),
  * generated date-spine gap fill (q37), distribution window functions
  * (q38), a blocked fuzzy string-match join (q39), a deterministic
  * train/test split (q40), and tie-safe argmax (q41). Same
  * conventions as Relational (decimal money math, VARCHAR-roundtrip
  * oracle casts, total ORDER BY). */
object Analytics {
  val all: Seq[GraftQuery] = Seq(
    Q7bTopKAgg, Q35Unpivot, Q36StatsMoments, Q37DateSpine,
    Q38WindowDistribution, Q39FuzzyMatch, Q40TrainTestSplit, Q41ArgMax,
    Q63GapFill, Q66Scd2Dimension, Q67RollingWindow)
}

/** Q7b — q7's per-customer top-3 through the bounded typed
  * `Aggregator` instead of a window sort: at most k rows of state per
  * key, map-side partial combine (≤k rows per key per map task reach
  * the shuffle), associative merge — the 100 TB shape for per-key
  * top-k over skewed keys, where q7's `row_number` plan must shuffle
  * and sort EVERY row of a hot key in one task. Shares q7's oracle:
  * both rankings are total orders, so the results are identical. */
object Q7bTopKAgg extends GraftQuery {
  val name = "q7b_topk_per_key_agg"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKOrdersAgg(3), ExpressionEncoder[RankedOrder]())
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col.o_orderkey").as("o_orderkey"),
        col("col.o_totalprice").as("o_totalprice"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }
  val oracle = Q7WindowRank.oracle
}

/** Q35 — unpivot (melt): three lineitem measures rotated into
  * (metric, val) rows, then aggregated per (returnflag, metric) —
  * q28's pivot run in reverse. Unpivot is a zero-shuffle Expand (rows
  * ×3, no exchange); the one shuffle is the aggregation's. The
  * measures are cast to a common decimal before the rotate so `val`
  * stays engine-exact. */
object Q35Unpivot extends GraftQuery {
  val name = "q35_unpivot_measures"
  def run(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(14,2)").as("l_quantity"),
        col("l_extendedprice").cast("decimal(14,2)").as("l_extendedprice"),
        col("l_discount").cast("decimal(14,2)").as("l_discount"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")
      // Spark's unpivot RETAINS null measures where DuckDB's UNPIVOT
      // drops them by default — align explicitly (no-op on the
      // fixture, which has no null measures)
      .filter(col("val").isNotNull)
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("val")).cast("double").as("total"))
      .orderBy(col("l_returnflag"), col("metric"))
  val oracle = Some("""
    WITH u AS (
      SELECT l_returnflag, metric, val FROM (
        SELECT l_returnflag,
          CAST(l_quantity AS DECIMAL(14,2)) AS l_quantity,
          CAST(l_extendedprice AS DECIMAL(14,2)) AS l_extendedprice,
          CAST(l_discount AS DECIMAL(14,2)) AS l_discount
        FROM lineitem)
      UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount)))
    SELECT l_returnflag, metric, count(*) AS n,
      CAST(CAST(SUM(val) AS VARCHAR) AS DOUBLE) AS total
    FROM u GROUP BY l_returnflag, metric ORDER BY l_returnflag, metric
  """.trim)
}

/** Q36 — statistical moments with decimal-exact accumulation: n, Σx,
  * Σx², Σxy run in DECIMAL (order-independent, engine-exact — the
  * mergeable, shuffle-once shape), then mean/variance/stddev/corr are
  * derived in ONE identical double expression tree per statistic in
  * both engines, so the hash matches bit-for-bit. Spark's built-in
  * `stddev_samp`/`corr` (Welford-style central moments) are emitted
  * as in-query tolerance FLAGS against the decimal-exact values
  * (oracle emits literal TRUE — q30b's sketch-gate pattern): the
  * built-ins are exercised honestly without hashing their
  * non-portable low-order bits. */
object Q36StatsMoments extends GraftQuery {
  val name = "q36_stats_moments"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast("decimal(12,2)")
    val p = col("l_extendedprice").cast("decimal(14,2)")
    val agg = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sq2"),
        sum(p).as("sp"), sum(p * p).as("sp2"),
        sum(p * q).as("spq"),
        stddev_samp(col("l_quantity")).as("builtin_std_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("builtin_corr"))
    val dn = col("n").cast("double")
    val (dq, dq2) = (col("sq").cast("double"), col("sq2").cast("double"))
    val (dp, dp2) = (col("sp").cast("double"), col("sp2").cast("double"))
    val dpq = col("spq").cast("double")
    val varQty = (dq2 - dq * dq / dn) / (dn - lit(1.0))
    val stdQty = sqrt(varQty)
    val corrM = (dpq - dp * dq / dn) /
      sqrt((dp2 - dp * dp / dn) * (dq2 - dq * dq / dn))
    agg.select(col("l_returnflag"), col("n"),
      (dq / dn).as("mean_qty"), varQty.as("var_qty"), stdQty.as("std_qty"),
      (dp / dn).as("mean_price"), corrM.as("corr_qty_price"),
      (abs(col("builtin_std_qty") - stdQty) <= lit(1e-9) * stdQty)
        .as("builtin_std_ok"),
      (abs(col("builtin_corr") - corrM) <= lit(1e-9)).as("builtin_corr_ok"))
      .orderBy(col("l_returnflag"))
  }
  // Identical double expression trees, decimal sums VARCHAR-roundtripped
  // (DuckDB's direct decimal->double cast double-rounds; see ADVICE r3).
  val oracle = Some("""
    WITH a AS (
      SELECT l_returnflag, count(*) AS n,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS dq,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS dq2,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS dp,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS dp2,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS dpq
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      dq / CAST(n AS DOUBLE) AS mean_qty,
      (dq2 - dq * dq / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_qty,
      sqrt((dq2 - dq * dq / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS std_qty,
      dp / CAST(n AS DOUBLE) AS mean_price,
      (dpq - dp * dq / CAST(n AS DOUBLE)) /
        sqrt((dp2 - dp * dp / CAST(n AS DOUBLE)) * (dq2 - dq * dq / CAST(n AS DOUBLE))) AS corr_qty_price,
      TRUE AS builtin_std_ok,
      TRUE AS builtin_corr_ok
    FROM a ORDER BY l_returnflag
  """.trim)
}

/** Q37 — generated date spine + gap fill: a month spine generated
  * with sequence() between the data's own bounds (computed in-plan —
  * no driver collect), left-joined to monthly revenue, missing months
  * zero-filled. The spine side is a handful of rows broadcast against
  * the aggregated months; the base table is read once. */
object Q37DateSpine extends GraftQuery {
  val name = "q37_date_spine"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(date_trunc("month", col("o_orderdate")).as("mo"),
        col("o_totalprice"))
    val monthly = o.groupBy(col("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(14,2)")).as("rev"))
    val spine = o.agg(min(col("mo")).as("lo"), max(col("mo")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 MONTH"))).as("mo"))
    spine.join(monthly, Seq("mo"), "left")
      .select(date_format(col("mo"), "yyyy-MM").as("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0).cast("decimal(24,2)"))
          .cast("double").as("revenue"))
      .orderBy(col("month"))
  }
  val oracle = Some("""
    WITH o AS (SELECT date_trunc('month', o_orderdate) AS mo, o_totalprice FROM orders),
    b AS (SELECT min(mo) AS lo, max(mo) AS hi FROM o),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mo FROM b),
    m AS (SELECT mo, count(*) AS n_orders,
          SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
          FROM o GROUP BY mo)
    SELECT strftime(spine.mo, '%Y-%m') AS month,
      COALESCE(m.n_orders, 0) AS n_orders,
      CAST(CAST(COALESCE(m.rev, CAST(0 AS DECIMAL(24,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM spine LEFT JOIN m ON spine.mo = m.mo ORDER BY month
  """.trim)
}

/** Q38 — distribution window functions: ntile quartiles,
  * percent_rank, cume_dist per order-status partition. The ordering
  * key (price, orderkey) is total, so ranks are tie-free and each
  * statistic is one exact integer ratio evaluated in one IEEE
  * division — engine-exact without rounding. */
object Q38WindowDistribution extends GraftQuery {
  val name = "q38_window_distribution"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }
  val oracle = Some("""
    SELECT o_orderstatus, o_orderkey, o_totalprice,
      CAST(ntile(4) OVER w AS INT) AS quartile,
      percent_rank() OVER w AS pr,
      cume_dist() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, o_orderkey
  """.trim)
}

/** Q40 — deterministic train/test split, the training-pipeline
  * staple: each document is assigned a split by a content-independent
  * pseudo-random key — the last hex nibble of md5(doc_id) — so the
  * assignment is stable across runs, engines, partitionings and
  * re-shards (never `rand()`, which is neither reproducible nor
  * oracle-checkable; never `doc_id % k`, which aliases any
  * id-assignment pattern). Nibbles 0–12 → train (~81%), 13–15 → test.
  * Emitted as per-(split, lang) counts + share-of-split so the oracle
  * also checks the stratification the split is supposed to preserve.
  * Per-row, shuffle-free until the final small aggregation. */
object Q40TrainTestSplit extends GraftQuery {
  val name = "q40_train_test_split"
  /** The split key, shared with q46's decontamination pass: train iff
    * the last md5(doc_id) nibble < 13. */
  private[graft] def splitCol: org.apache.spark.sql.Column =
    splitColOf("doc_id")
  /** Same split key over any id column carrying doc ids (q25f/s14
    * apply it to `media_id`, which IS the doc id by synthesis). */
  private[graft] def splitColOf(idCol: String): org.apache.spark.sql.Column = {
    val nib = expr(
      s"locate(substring(md5(cast($idCol as string)), 32, 1), '0123456789abcdef') - 1")
    when(nib < 13, lit("train")).otherwise(lit("test"))
  }
  /** DuckDB mirror of [[splitCol]] (instr/locate swap arg order). */
  private[queries] val duckSplit =
    "CASE WHEN instr('0123456789abcdef', " +
      "substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 13 " +
      "THEN 'train' ELSE 'test' END"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("split", splitCol)
    val bySplit = Window.partitionBy(col("split"))
    docs.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(bySplit).cast("double"))
      .orderBy(col("split"), col("lang"))
  }
  val oracle = Some(s"""
    WITH d AS (
      SELECT lang, $duckSplit AS split
      FROM documents),
    g AS (SELECT split, lang, count(*) AS n FROM d GROUP BY split, lang)
    SELECT split, lang, n,
      CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY split) AS DOUBLE) AS share
    FROM g ORDER BY split, lang
  """.trim)
}

/** Q41 — argmax per group, tie-safe: the row-level winner per lang is
  * `max(struct(n_chars, doc_id))` — lexicographic struct ordering
  * makes the tie-break (doc_id) part of the ORDER ITSELF, so the
  * result is deterministic where a bare `max_by(doc_id, n_chars)`
  * would be free to pick any tied row. One ordinary min/max
  * aggregation: mergeable, one shuffle, no window sort. */
object Q41ArgMax extends GraftQuery {
  val name = "q41_argmax_per_group"
  def run(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(max(struct(col("n_chars").as("nc"), col("doc_id").as("id"))).as("mx"),
           min(struct(col("n_chars").as("nc"), col("doc_id").as("id"))).as("mn"),
           count(lit(1)).as("n_docs"))
      .select(col("lang"),
        col("mx.nc").as("max_chars"), col("mx.id").as("longest_doc"),
        col("mn.nc").as("min_chars"), col("mn.id").as("shortest_doc"),
        col("n_docs"))
      .orderBy(col("lang"))
  val oracle = Some("""
    SELECT lang,
      (max({'nc': n_chars, 'id': doc_id})).nc AS max_chars,
      (max({'nc': n_chars, 'id': doc_id})).id AS longest_doc,
      (min({'nc': n_chars, 'id': doc_id})).nc AS min_chars,
      (min({'nc': n_chars, 'id': doc_id})).id AS shortest_doc,
      count(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
  """.trim)
}

/** Q39 — fuzzy string matching as a BLOCKED join: distinct part
  * names paired within a first-token block, scored with Levenshtein
  * edit distance, kept at distance 1–4. The block key bounds
  * candidates (never all-pairs — same posture as the q18 dedup
  * family); at 100 TB the token key shuffles once and skewed blocks
  * split under AQE. */
object Q39FuzzyMatch extends GraftQuery {
  val name = "q39_fuzzy_match"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
      .withColumn("tok", split(col("p_name"), " ").getItem(0))
    val a = names.select(col("p_name").as("name_a"), col("tok"))
    val b = names.select(col("p_name").as("name_b"), col("tok"))
    a.join(b, "tok")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist").between(1, 4))
      .select(col("name_a"), col("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }
  val oracle = Some("""
    WITH n AS (SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS tok FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
      CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM n a JOIN n b ON a.tok = b.tok AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 4
    ORDER BY name_a, name_b
  """.trim)
}

/** Q63 — time-series gap fill + linear interpolation: every user's
  * daily reading series aligned to the global calendar spine, missing
  * days filled by linear interpolation between the neighboring
  * observations (edges forward-/back-filled) — the feature-pipeline
  * resample step (sensor/metric series into a dense training matrix).
  *
  * Determinism: the per-day sample is `min_by(value, event_id)` — ONE
  * stored double picked by a total key, never an order-dependent
  * float SUM/AVG. The interpolation is the identical expression tree
  * in both engines over identical operands (one exact-integer day
  * ratio, one multiply, one add — no reassociation), so outputs are
  * bit-deterministic UNROUNDED. Spine bounds are two driver scalars
  * (q62's rule), so the per-user spine is explode(sequence(...)) —
  * no cartesian join, no 1-row broadcast. Windows are PARTITIONed BY
  * user — key-parallel, never global. prev/next pairs are consistent
  * because `reading IS NULL ⇔ the CASE'd day IS NULL`: the IGNORE
  * NULLS pair picks the same row.
  */
object Q63GapFill extends GraftQuery {
  val name = "q63_gap_fill"
  def run(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value"), col("event_id"))
      .groupBy(col("user_id"), col("day"))
      .agg(min_by(col("value"), col("event_id")).as("reading"))
    // Guard the two driver scalars: an empty events table yields null
    // bounds, and a null-interpolated sequence() would NPE — return
    // the (empty) output shape instead of crashing.
    val bounds = daily.agg(min(col("day")), max(col("day"))).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(1))
      return daily.limit(0).select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("reading").cast("double").as("value"),
        lit("observed").as("source"))
    val Array(lo, hi) = bounds.toSeq.map(_.toString).toArray
    val spine = daily.select(col("user_id")).distinct()
      .select(col("user_id"), explode(expr(
        s"sequence(to_date('$lo'), to_date('$hi'), interval 1 day)")).as("day"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    val obsDay = when(col("reading").isNotNull, col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("prev_v", last(col("reading"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("reading"), ignoreNulls = true).over(wNext))
      .withColumn("next_day", first(obsDay, ignoreNulls = true).over(wNext))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        when(col("reading").isNotNull, col("reading"))
          .when(col("prev_v").isNotNull && col("next_v").isNotNull,
            col("prev_v") + (col("next_v") - col("prev_v")) *
              (datediff(col("day"), col("prev_day")).cast("double") /
                datediff(col("next_day"), col("prev_day"))))
          .when(col("prev_v").isNotNull, col("prev_v"))
          .otherwise(col("next_v")).as("value"),
        when(col("reading").isNotNull, lit("observed"))
          .when(col("prev_v").isNotNull && col("next_v").isNotNull,
            lit("interpolated"))
          .when(col("prev_v").isNotNull, lit("ffill"))
          .otherwise(lit("bfill")).as("source"))
      .orderBy(col("user_id"), col("day"))
  }

  val oracle = Some("""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
        arg_min(value, event_id) AS reading
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
      SELECT u.user_id, CAST(unnest(generate_series(
        (SELECT lo FROM b), (SELECT hi FROM b), INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM daily) u),
    j AS (SELECT s.user_id, s.day, d.reading
          FROM spine s LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day = d.day),
    w AS (
      SELECT user_id, day, reading,
        last_value(reading IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
        last_value(CASE WHEN reading IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_day,
        first_value(reading IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN reading IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_day
      FROM j)
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
      CASE WHEN reading IS NOT NULL THEN reading
           WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
             prev_v + (next_v - prev_v) *
               (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                 / date_diff('day', prev_day, next_day))
           WHEN prev_v IS NOT NULL THEN prev_v
           ELSE next_v END AS value,
      CASE WHEN reading IS NOT NULL THEN 'observed'
           WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interpolated'
           WHEN prev_v IS NOT NULL THEN 'ffill'
           ELSE 'bfill' END AS source
    FROM w ORDER BY user_id, day
  """.trim)
}

/** Q66 — SLOWLY-CHANGING-DIMENSION (type 2) BUILD from an event log:
  * collapse each user's event stream into versioned dimension rows
  * with effective-time ranges — (user_id, version, segment,
  * [valid_from, valid_to)) where `segment` is the user's event_type
  * and a new version opens exactly when it CHANGES. This is the
  * standard warehouse ETL step the engine's as-of join (q32) consumes
  * on the other side: q32 looks up "the dimension row in effect at
  * time t"; q66 is how that dimension table is produced from raw
  * events in the first place.
  *
  * Scale shape — change detection and range assembly are WINDOW
  * functions over the SAME (user_id, ts-ordered) partitioning, never
  * a self-join: one hash shuffle by user_id, one sort per window
  * step, and the second/third windows (lead/row_number over the
  * change rows) re-sort the already-partitioned filtered frame
  * without a second exchange (Catalyst reuses the child
  * distribution). At 100 TB the cost is one corpus shuffle — the
  * minimum any per-user ordered computation pays — and no step's
  * state exceeds a single user's rows. Determinism under timestamp
  * ties: both engines order by (ts, event_id); event_id is unique, so
  * the change sequence — and therefore every version row — is total-
  * ordered and bit-stable.
  *
  * Rendering follows GraftQuery: effective bounds as epoch-µs longs
  * (`valid_to_us` NULL on each user's current row — the open range),
  * total ORDER BY (user_id, version).
  *
  * Reference anchor: the reference has no temporal model at all
  * (src/main.cpp builds a static index in one shot); SCD2 is the
  * incremental-world generalization its users would need first.
  */
object Q66Scd2Dimension extends GraftQuery {
  val name = "q66_scd2_dimension"

  def run(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .withColumn("version", row_number().over(byTime).cast("long"))
      .select(col("user_id"),
        col("version"),
        col("event_type").as("segment"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val oracle = Some(raw"""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    s AS (
      SELECT user_id, event_type, ts, event_id FROM o
      WHERE prev IS NULL OR prev <> event_type),
    v AS (
      SELECT user_id, event_type, ts,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
      FROM s)
    SELECT user_id, version, event_type AS segment,
      epoch_us(ts) AS valid_from_us,
      epoch_us(valid_to) AS valid_to_us,
      (valid_to IS NULL) AS is_current
    FROM v ORDER BY user_id, version
  """.trim)
}

/** Q67 — interval-bounded rolling aggregates: per-customer 7-day
  * rolling order count and revenue, one row per order — the RANGE
  * window-frame family (value-bounded, peer-inclusive) that none of
  * the ROWS-frame queries (q8's running sum, q38's distributions)
  * exercise. A RANGE frame is the correct tool when the window is
  * defined by TIME, not by row count: two orders on the same
  * timestamp are peers and must see the same frame (a ROWS frame
  * would split them by arbitrary physical order), and gaps wider
  * than the interval naturally empty the frame.
  *
  * Scale shape: one hash shuffle by customer + one sort by time —
  * the same minimum q66 pays; Spark's WindowExec maintains the
  * sliding frame with two monotone pointers per partition (each row
  * enters and leaves the frame once — O(rows), not O(rows ×
  * frame)). Engine parity: the frame is expressed over epoch-µs
  * BIGINTs with an exact integer bound (7 days = 604_800_000_000 µs)
  * in BOTH engines — never over engine-specific interval arithmetic
  * — and both ends are peer-inclusive, so the row sets are identical
  * by construction; revenue accumulates in DECIMAL(18,2) (order-
  * independent) and surfaces as double via the q36 VARCHAR-roundtrip
  * convention.
  */
object Q67RollingWindow extends GraftQuery {
  val name = "q67_rolling_window"
  private val SevenDaysUs = 7L * 24 * 3600 * 1000000L

  /** The windowed core over any (o_custkey, o_orderdate, o_orderkey,
    * o_totalprice) frame — factored so the spec can drive crafted
    * peer/boundary fixtures through the exact production window. */
  private[graft] def rolling(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od_us"))
      .rangeBetween(-SevenDaysUs, Window.currentRow)
    orders
      .select(col("o_custkey"), unix_micros(col("o_orderdate")).as("od_us"),
        col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("rev_7d", sum(col("price")).over(w).cast("double"))
      .select(col("o_custkey"), col("od_us"), col("o_orderkey"),
        col("n_7d"), col("rev_7d"))
      .orderBy(col("o_custkey"), col("od_us"), col("o_orderkey"))
  }

  def run(spark: SparkSession, dir: String): DataFrame =
    rolling(Tables.orders(spark, dir))

  val oracle = Some(s"""
    WITH o AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS od_us, o_orderkey,
        CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders)
    SELECT o_custkey, od_us, o_orderkey,
      count(*) OVER w AS n_7d,
      CAST(CAST(SUM(price) OVER w AS VARCHAR) AS DOUBLE) AS rev_7d
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY od_us
      RANGE BETWEEN $SevenDaysUs PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, od_us, o_orderkey
  """.trim)
}
