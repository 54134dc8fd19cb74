package graft

import org.apache.spark.sql.functions._

/** Fourth-decade decomposition probe for the excise family
  * (ScaleBench round 18 measured q60c 100×→1000× hop ~30× for ×10
  * data at both 32 and 256 shuffle partitions): times each stage of
  * the full-excise surface independently — tokenize+persist, span
  * explode, the per-span aggregate, the join-back removals, the
  * reassembly — and prints the span-multiplicity profile (distinct
  * hashes, max occurrence group, removal fraction) so the
  * superlinear term can be NAMED rather than guessed. Also times a
  * ONE-SHUFFLE window variant of the keeper computation (the agg +
  * join-back shape exchanges the corpus-scale span frame twice on
  * span_h; a window over span_h does it once) to price the candidate
  * fix in place. Not a test; run via
  * `Test/runMain graft.DiagExcise1000 [dir ...]`. */
object DiagExcise1000 {
  def main(args: Array[String]): Unit = {
    val spark = Engine.configure(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_scale100", "/tmp/graft_scale1000")
    def t(b: => Unit): Double = {
      val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
    import graft.queries.{NorthStar, Q60cExciseDuplicates}
    import org.apache.spark.storage.StorageLevel
    dirs.foreach { dir =>
      println(s"DIAG dir=$dir shuffle=${spark.conf.get("spark.sql.shuffle.partitions")}")
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), expr(NorthStar.toksExpr).as("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val tTok = t { toks.count() }
      val nDocs = toks.count()
      val pos = Q60cExciseDuplicates.spanPositions(toks)
      val tPos = t { pos.write.format("noop").mode("overwrite").save() }
      val nPos = pos.count()
      // span-multiplicity profile
      val prof = pos.groupBy(col("span_h")).count()
        .agg(count(lit(1)), max(col("count")),
          sum(when(col("count") >= 2, col("count")).otherwise(0L))).head()
      val (nSpans, maxOcc, dupOcc) =
        (prof.getLong(0), prof.getLong(1), prof.getLong(2))
      println(f"DIAG docs=$nDocs pos=$nPos distinct_spans=$nSpans " +
        f"max_occ=$maxOcc dup_occ_frac=${dupOcc.toDouble / nPos}%.3f " +
        f"t_tokenize=$tTok%.1f t_pos_scan=$tPos%.1f")
      // stage: agg + join-back (the current q60c shape)
      val bySpan = pos.groupBy("span_h")
        .agg(count(lit(1)).as("n_occ"),
          min(struct(col("doc_id"), col("i"))).as("keeper"))
        .filter(col("n_occ") >= 2)
      val tAgg = t { bySpan.write.format("noop").mode("overwrite").save() }
      val removals = pos.join(bySpan, "span_h")
        .filter(!(col("doc_id") === col("keeper.doc_id") &&
          col("i") === col("keeper.i")))
        .select(col("doc_id"), col("i"))
      val tRem = t { removals.write.format("noop").mode("overwrite").save() }
      // stage: ONE-SHUFFLE window variant of the same removals
      val W = org.apache.spark.sql.expressions.Window
      val win = W.partitionBy(col("span_h"))
      val removalsW = pos
        .withColumn("n_occ", count(lit(1)).over(win))
        .withColumn("keeper", min(struct(col("doc_id"), col("i"))).over(win))
        .filter(col("n_occ") >= 2 &&
          !(col("doc_id") === col("keeper.doc_id") &&
            col("i") === col("keeper.i")))
        .select(col("doc_id"), col("i"))
      val tRemW = t { removalsW.write.format("noop").mode("overwrite").save() }
      // stage: reassembly from the agg+join removals
      val tRe = t { Q60cExciseDuplicates.reassemble(toks, removals)
        .write.format("noop").mode("overwrite").save() }
      println(f"DIAG t_agg=$tAgg%.1f t_removals_aggjoin=$tRem%.1f " +
        f"t_removals_window=$tRemW%.1f t_reassemble=$tRe%.1f")
      toks.unpersist()
    }
    spark.stop()
  }
}
