package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable operator/query (SURVEY §2.B contract).
  *
  * Conventions for DuckDB-hash stability (SURVEY §2.B):
  *  - every result has a total ORDER BY ending in a unique key;
  *  - money aggregates go through DECIMAL(18,2) (order-independent,
  *    engine-exact) and are surfaced as DOUBLE after rounding;
  *  - float similarity/ratio outputs are ROUND(..., 4);
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
