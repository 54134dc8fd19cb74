package graft

import org.apache.spark.sql.functions._

import graft.queries._

/** Oracle-independent invariants for the round-8 operators. */
class Round8Spec extends SparkSpec {

  test("q46 decontamination: covers the train split exactly, verdicts are consistent") {
    val out = Q46Decontaminate.run(spark, sf01).collect()
    // one row per train-split document, no more, no less
    // the q40 split contract, restated independently of splitCol
    val splits = Tables.documents(spark, sf01)
      .withColumn("split", expr(
        "IF(locate(substring(md5(cast(doc_id as string)), 32, 1), " +
          "'0123456789abcdef') - 1 < 13, 'train', 'test')"))
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.get(0) -> r.getString(1)).toMap
    val trainIds = splits.collect { case (id, "train") => id }.toSet
    assert(out.map(_.get(0)).toSet === trainIds)
    assert(out.length === trainIds.size)
    out.foreach { r =>
      val n = r.getAs[Long]("n_shared_ngrams")
      val verdict = r.getAs[String]("verdict")
      val matched = r.get(r.fieldIndex("matched_eval_doc"))
      // verdict is the threshold applied to the count
      assert(verdict === (if (n >= 3) "contaminated" else "clean"))
      // a match exists iff any gram was shared, and it is a TEST doc
      assert((matched == null) === (n == 0))
      if (matched != null) assert(splits(matched) === "test")
    }
    // the fixture corpus actually contains cross-split leaks (near-dup
    // docs split apart by the content-independent md5 key) — the
    // operator must find some, or the test data went stale
    assert(out.count(_.getAs[String]("verdict") == "contaminated") > 0)
    // and the threshold separates: nothing should sit AT the boundary
    // by chance collision — chance-shared grams show up as 1, copies
    // as runs far above MinShared
    val positive = out.map(_.getAs[Long]("n_shared_ngrams")).filter(_ > 0)
    assert(positive.nonEmpty)
  }
}
