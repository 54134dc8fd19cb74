package graft
import org.apache.spark.sql.functions._

/** Crossover probe for the q25d top-k dispatch (SliceDispatch):
  * crafted exact-dup clustering at several severities, each arm
  * timed independently with its number printed AS IT LANDS. Group
  * hashes are splitmix-mixed so distinct groups are band-decorrelated
  * like real dHashes (a sequential-hex first draft made every rep
  * pair a band collision — probe artifact, not a data shape). The
  * enumeration arm is skipped past g=400: at g=1600 it spilled
  * ~37 GB of shuffle and filled the disk without completing (the
  * measured result IS the death). Not a test; run via
  * `Test/runMain graft.DiagBands [g ...]`. */
object DiagBands {
  def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29; x
  }
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50, 200, 1600)
    def t(b: => Unit): Double = { val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    sizes.foreach { g =>
      val groups = 160000 / g
      val hashes = (0 until groups).map(i => f"${mix(i.toLong)}%016x")
      val df = (0 until 160000).map(i => (i.toLong, hashes(i % groups)))
        .toDF("media_id", "dhash").localCheckpoint()
      val bounded = t { graft.multimodal.Q25dImageNearDup.closestPairs(df, bandBits = 16)
        .write.format("noop").mode("overwrite").save() }
      println(f"DIAG g=$g bounded=$bounded%.2f")
      if (g <= 400) {
        val enum1 = t { graft.multimodal.Q25dImageNearDup.verifiedCandidates(df, bandBits = 16)
          .orderBy(col("hamming"), col("id_a"), col("id_b")).limit(25)
          .write.format("noop").mode("overwrite").save() }
        println(f"DIAG g=$g enum=$enum1%.2f")
      }
    }
    spark.stop()
  }
}
