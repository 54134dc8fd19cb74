package graft

/** r19 diagnostic: spread width sweep, min-of-3 per cell. */
object DiagSpreadWidth {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = Seq(
      queries.Q64gWordpieceEncode, queries.Q61bGopherRepetition,
      queries.Q42bCorpusCleanFull, queries.Q18bDedupMinHash,
      queries.Q58bShardExport, queries.Q76cTripletsBackfilled)
    def noop(q: queries.GraftQuery): Unit =
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
    qs.foreach(q => try noop(q) catch { case e: Throwable => println(s"warm ${q.name}: $e") })
    for (n <- Seq(32, 8, 6)) {
      System.setProperty("graft.spread.n", n.toString)
      qs.foreach { q =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); noop(q)
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[diag] n=$n%2d ${q.name}%-28s min=${ts.min}%6.2f  med=${ts.sorted.apply(1)}%6.2f")
      }
    }
    System.clearProperty("graft.spread.n")
    spark.stop()
  }
}
