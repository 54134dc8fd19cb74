package graft

import org.apache.spark.sql.DataFrame

/** Round 11 — FULL SQL-front-door parity sweep: every batch query's
  * oracle SQL is attempted as `spark.sql` TEXT over the registered
  * fixture views; where the text parses, the result must equal the
  * DataFrame twin ROW FOR ROW. The sweep is parameterized over the
  * whole `SparkEntry` pack, so a NEW query whose oracle happens to be
  * ANSI-parseable is parity-checked automatically, and any divergence
  * between what the SQL text computes and what the DataFrame computes
  * (dialect drift) is a test failure, not a silent skew.
  *
  * EXCLUSION LIST (documented, pinned): the oracle pack is written in
  * DuckDB dialect by design (it is what the driver's DuckDB gate
  * executes), so most strings cannot parse in Spark. The excluded
  * queries fall into these construct classes:
  *  - `unnest(...)` table function (Spark: LATERAL VIEW explode):
  *    q1 family, q20, q26, q49, q62, q64 family, q68 …
  *  - `//` integer division (Spark: `div`): most ParseException rows
  *    — q2–q4, q6, q8–q9, q15–q17, q21–q22, q42 family, q44–q48,
  *    q51–q59, q61, q63, q67, q69 …
  *  - DuckDB list/JSON/time functions with no Spark builtin:
  *    `list_filter`/`list_reduce`/`list_aggregate` (q23, q24, q43,
  *    q47, q55, q60, q65), `json_extract_string` (q14, q31),
  *    `strftime` (q13), `quantile_cont` (q30, q30b), `epoch_us`
  *    (q32 family, q66), `array_to_string` (q18),
  *    `grouping(a, b)` 2-arg form (q10).
  *  - SAME NAME, DIFFERENT SEMANTICS — the sharpest drift case, kept
  *    excluded on purpose: DuckDB `regexp_replace(s, pat, rep, 'g')`
  *    takes a FLAGS string where Spark's 4th argument is a numeric
  *    position, so q50's text parses but fails at runtime with a cast
  *    error (and would silently replace only the first match if the
  *    flag were dropped). Spark-side global replace is the 3-arg
  *    form; the DataFrame twin uses it.
  *
  * Complement: `SqlFrontDoorSpec` hand-writes Spark-dialect twins for
  * seven headline shapes (decimal money chain, broadcast-hinted join
  * chain, dedup, native normalize fn, as-of marker → native exec,
  * SCD2 window chain, RANGE frame) — those cover the Spark-SQL-text
  * surface for constructs the DuckDB strings express differently. */
class SqlParitySpec extends SparkSpec {

  /** Queries whose DuckDB oracle text is ALSO valid Spark SQL — the
    * auto-swept parity set. Pinned so (a) a regression that silently
    * DROPS one from parseability fails the spec, and (b) a new
    * parseable oracle must be added here (and thereby swept). */
  private val expectedParseable: Set[String] = Set(
    "q5_semi_anti_join",
    "q7_window_rank_orders",
    "q7b_topk_per_key_agg",
    "q11_set_ops",
    "q12_distinct_agg",
    "q12c_hll_sketch_union",
    "q38_window_distribution",
    "q39_fuzzy_match")

  /** Canonicalize a collected value for cross-plan comparison:
    * numeric types widen to BigDecimal (the SQL text may type a
    * literal column differently than the DataFrame twin), arrays
    * recurse, everything else compares as-is. */
  private def canon(v: Any): Any = v match {
    case null                      => null
    case b: java.math.BigDecimal   => BigDecimal(b).bigDecimal.stripTrailingZeros
    case b: scala.math.BigDecimal  => b.bigDecimal.stripTrailingZeros
    case i: java.lang.Integer      => new java.math.BigDecimal(i.longValue())
    case l: java.lang.Long         => new java.math.BigDecimal(l)
    case s: java.lang.Short        => new java.math.BigDecimal(s.longValue())
    case d: java.lang.Double       => d // IEEE doubles compare exactly
    case f: java.lang.Float        => f
    case seq: scala.collection.Seq[_] => seq.map(canon)
    case other                     => other
  }

  private def canonRows(df: DataFrame): Seq[Seq[Any]] = {
    val order = df.columns.sorted
    df.select(order.head, order.tail: _*).collect().toSeq
      .map(_.toSeq.map(canon))
  }

  test("SQL parity sweep: every Spark-parseable oracle matches its DataFrame twin row for row") {
    Engine.registerTables(spark, sf)
    val batch = SparkEntry.all.filter(q =>
      q.oracle.isDefined && !q.name.matches("^s\\d+_.*"))
    assert(batch.size >= 85, s"batch oracle pack shrank to ${batch.size}")
    var parseable = Set.empty[String]
    val drift = scala.collection.mutable.ArrayBuffer.empty[String]
    batch.foreach { q =>
      val viaSql =
        try Some(spark.sql(q.oracle.get)) catch { case _: Throwable => None }
      viaSql.foreach { sqlDf =>
        parseable += q.name
        try {
          val a = canonRows(sqlDf)
          val b = canonRows(q.run(spark, sf))
          if (a != b) drift += s"${q.name}: SQL text and DataFrame twin diverge " +
            s"(${a.size} vs ${b.size} rows; first diff at index " +
            s"${a.zip(b).indexWhere { case (x, y) => x != y }})"
        } catch { case e: Throwable =>
          // Parses but cannot execute under Spark semantics — the
          // q50 class; it must be a documented exclusion, not silent.
          if (expectedParseable.contains(q.name))
            drift += s"${q.name}: runtime failure ${e.getClass.getSimpleName}"
        }
      }
    }
    assert(drift.isEmpty, drift.mkString("\n"))
    // q50 parses but fails at runtime (regexp_replace flags vs
    // position) — it is allowed to appear in `parseable` without
    // being in the pinned set; everything else must match exactly.
    assert(parseable - "q50_pii_redact" == expectedParseable,
      s"parseable set drifted:\n got ${(parseable - "q50_pii_redact").toSeq.sorted}" +
        s"\n want ${expectedParseable.toSeq.sorted}")
  }
}
