package graft

import org.apache.spark.sql.functions._

/** The native codegen normalizer must be indistinguishable from Q1's
  * regex tier (and the reference's filterWord semantics, §1.4). */
class NormalizeWordSpec extends SparkSpec {
  import spark.implicits._

  private val inputs = Seq(
    "word-count", "index2", "HeLLo", "123", "?!?", "", "MiXeD42cAsE",
    "ünïcödé", "abécd", "ZZtop", "a", "Z")

  test("native expression == lower(regexp_replace) on edge inputs") {
    val df = inputs.toDF("tok")
    val out = df.select(
      expr("graft_normalize_fast(tok)").as("native"),
      lower(regexp_replace(col("tok"), "[^a-zA-Z]", "")).as("regex"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    inputs.foreach { s =>
      val e = graft.functions.NormalizeWord(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      val interpreted = e.eval(null).asInstanceOf[UTF8String].toString
      val viaDf = Seq(s).toDF("tok")
        .select(expr("graft_normalize_fast(tok)")).as[String].head()
      assert(interpreted === viaDf, s"input '$s'")
    }
  }

  test("null propagates") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "tok")
      .select(expr("graft_normalize_fast(tok)")).collect()
    assert(r.head.isNullAt(0))
  }
}
