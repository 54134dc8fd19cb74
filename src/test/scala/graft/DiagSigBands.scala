package graft
import org.apache.spark.sql.functions._

/** Occupancy probe for the q57b signature store's band keys at the
  * 100× corpus — turns the round-12 residual claim ("MinHash bands
  * are high-entropy by construction, no measured need for the
  * pair-band layout") into a measurement. Not a test; run via
  * `Test/runMain graft.DiagSigBands`. */
object DiagSigBands {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale100"
    graft.plans.Stores.evict(spark, "graft_sigstore")
    val (bandsT, _) = graft.queries.Q57bDeltaDedupStore.ensureStore(spark, dir)
    val occ = spark.table(bandsT).groupBy("bkey").count()
      .agg(count(lit(1)).as("buckets"), sum(col("count")).as("rows"),
        max(col("count")).as("maxocc"),
        sum(col("count") * col("count")).as("sumsq")).head()
    val (b, r, m, s2) = (occ.getLong(0), occ.getLong(1), occ.getLong(2), occ.getLong(3))
    println(f"DIAG sigbands buckets=$b rows=$r maxOcc=$m meanOcc=${r.toDouble / b}%.2f candidateBound=$s2")
    graft.plans.Stores.evict(spark, "graft_sigstore")
    spark.stop()
  }
}
