package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable operator/query (SURVEY §2.B contract).
  *
  * Conventions for DuckDB-hash stability (SURVEY §2.B):
  *  - every result has a total ORDER BY ending in a unique key;
  *  - money aggregates go through DECIMAL(18,2) (order-independent,
  *    engine-exact) and are surfaced as DOUBLE after rounding;
  *  - genuinely-float outputs (ln/exp folds, similarity estimates)
  *    are ROUND(..., 4); but a ratio of two exact integers is
  *    surfaced UNROUNDED — one IEEE division is bit-deterministic,
  *    while ROUND on it is the hazard: exact short decimals land on
  *    halfway points that Spark (HALF_UP on the shortest decimal
  *    repr) and DuckDB (on the binary double) round differently
  *    (q55, −261/12000 at sf0.1);
  *  - timestamps are rendered as strings (UTC) or epoch integers —
  *    never as raw TIMESTAMP columns;
  *  - column names are identical in `run` and `oracle`.
  */
trait GraftQuery {
  def name: String
  def run(spark: SparkSession, dir: String): DataFrame
  /** DuckDB-dialect SQL over the same parquet tables; None → the
    * driver records a weaker rows-only check. */
  def oracle: Option[String]
}
