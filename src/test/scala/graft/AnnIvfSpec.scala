package graft

import org.apache.spark.sql.functions._

import graft.queries.{Q19dAnnIvf, Q19SimilarityTopK}

/** Q19d has no DuckDB oracle (the KMeans centroids live in the JVM
  * model, not SQL) — this spec is its verification: seeded
  * determinism, valid sorted cosines, and recall against the exact
  * cosine top-10 (Q19, which IS hash-checked against DuckDB). */
class AnnIvfSpec extends SparkSpec {
  import spark.implicits._

  test("q19d is deterministic (seeded KMeans) and returns sorted valid cosines") {
    val a = Q19dAnnIvf.run(spark, sf01).collect()
    val b = Q19dAnnIvf.run(spark, sf01).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.nonEmpty && a.length <= 10)
    val cos = a.map(_.getAs[Double]("cosine"))
    assert(cos.toSeq === cos.sortBy(-_).toSeq)
    assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
  }

  test("q19d recall: probing 4 of 16 lists finds a majority of the exact top-10") {
    val approx = Q19dAnnIvf.run(spark, sf01)
      .select("vec_id").as[Long].collect().toSet
    val exact = Q19SimilarityTopK.run(spark, sf01)
      .select("vec_id").as[Long].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall; approx=$approx exact=$exact")
  }
}
