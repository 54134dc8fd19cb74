package graft

import org.apache.spark.sql.functions._

/** The c-tier optimizer rule (plans.LevenshteinThresholdRule):
  * unthresholded levenshtein comparisons must plan as the banded
  * early-exit form, and the rewrite must never change results. */
class LevenshteinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Seq("kitten", "sitting", "kitchen", "mitten", "flaw", "lawn", "kitten")
      .toDF("w")

  test("lev <= k and BETWEEN plan as the threshold form") {
    val le = words.as("a").crossJoin(words.as("b"))
      .filter(levenshtein($"a.w", $"b.w") <= 2)
    val optLe = le.queryExecution.optimizedPlan.toString
    assert(optLe.contains("levenshtein(w#") && optLe.contains("Some(2)) >= 0"),
      s"expected thresholded lev in:\n$optLe")

    val between = words.as("a").crossJoin(words.as("b"))
      .filter(levenshtein($"a.w", $"b.w").between(1, 3))
    val optB = between.queryExecution.optimizedPlan.toString
    assert(optB.contains("Some(3)) >= 1"), s"expected banded BETWEEN in:\n$optB")
    // the rewrite collapsed the two comparisons into one call
    assert(optB.sliding("levenshtein".length).count(_ == "levenshtein") === 1)
  }

  test("rewrite is semantics-preserving against a brute-force filter") {
    def brute(k: Int): Set[(String, String)] = {
      val ws = words.as[String].collect()
      (for {
        a <- ws; b <- ws
        if levDist(a, b) >= 1 && levDist(a, b) <= k
      } yield (a, b)).toSet
    }
    def levDist(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (k <- Seq(1, 2, 3)) {
      val got = words.as("a").crossJoin(words.as("b"))
        .filter(levenshtein($"a.w", $"b.w").between(1, k))
        .select($"a.w", $"b.w").as[(String, String)].collect().toSet
      assert(got === brute(k), s"k=$k mismatch")
    }
  }

  test("q39's join condition carries the threshold form") {
    val plan = graft.queries.Q39FuzzyMatch.run(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Some(4)) >= 1"),
      s"q39 should plan the banded lev join predicate:\n$plan")
  }
}
