package graft

import org.apache.spark.sql.functions._

import graft.queries.Q19cAnnSparkMl

/** Q19c has no DuckDB oracle (the LSH hyperplanes live in the model,
  * not SQL) — this spec is its verification: seeded determinism, valid
  * distances, and recall against the exact nearest neighbors. */
class AnnSparkMlSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopK(k: Int): Seq[Long] = {
    // exact Euclidean top-k by distance to vec 0 (double fold per row)
    val e = Tables.embeddings(spark, sf01)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).as[Seq[Double]].head()
    val qLit = array(q.map(lit): _*)
    e.filter(col("vec_id") =!= 0)
      .withColumn("qv", qLit)
      .select(col("vec_id"),
        sqrt(expr(
          "aggregate(zip_with(cast(embedding as array<double>), qv, (x, y) -> (x-y)*(x-y)), " +
            "cast(0 as double), (acc, p) -> acc + p)")).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(k)
      .select("vec_id").as[Long].collect().toSeq
  }

  test("q19c is deterministic (seeded LSH) and returns sorted valid distances") {
    val a = Q19cAnnSparkMl.run(spark, sf01).collect()
    val b = Q19cAnnSparkMl.run(spark, sf01).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.nonEmpty && a.length <= 10)
    val dists = a.map(_.getAs[Double]("euclid_dist"))
    assert(dists.toSeq === dists.sorted.toSeq)
    assert(dists.forall(_ >= 0))
  }

  test("q19c recall: finds a majority of the exact top-10 neighborhood") {
    val approx = Q19cAnnSparkMl.run(spark, sf01)
      .select("vec_id").as[Long].collect().toSet
    val exact = exactTopK(10).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall; approx=$approx exact=$exact")
  }
}
