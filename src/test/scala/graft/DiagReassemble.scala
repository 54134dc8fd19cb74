package graft

import org.apache.spark.sql.functions._

/** Decomposition probe for q60c's reassembly at the fourth decade
  * (the one excise stage still ~14× per 10× data after the round-18
  * window fix): separates the islands/collect stage, the mask join
  * WITHOUT the final global sort, and the full surfaced frame WITH
  * it — the hypothesis being that the `orderBy(doc_id)` on the
  * corpus-sized rewritten-text output (the driver-dump contract, not
  * the operator) is the spill term. Run via
  * `Test/runMain graft.DiagReassemble [dir ...]`. */
object DiagReassemble {
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
    import graft.queries.{NorthStar, Q60cExciseDuplicates, Q60RepeatedSpans}
    import org.apache.spark.storage.StorageLevel
    val w = Q60RepeatedSpans.Width
    dirs.foreach { dir =>
      println(s"DIAG dir=$dir")
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), expr(NorthStar.toksExpr).as("t"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      toks.count()
      val W = org.apache.spark.sql.expressions.Window
      val win = W.partitionBy(col("span_h"))
      val removals = Q60cExciseDuplicates.spanPositions(toks)
        .withColumn("n_occ", count(lit(1)).over(win))
        .withColumn("keeper", min(struct(col("doc_id"), col("i"))).over(win))
        .filter(col("n_occ") >= 2 &&
          !(col("doc_id") === col("keeper.doc_id") &&
            col("i") === col("keeper.i")))
        .select(col("doc_id"), col("i"))
        .localCheckpoint(true)
      val nRem = removals.count()
      // islands + per-doc collect (the reassemble head)
      val dwin = W.partitionBy(col("doc_id")).orderBy(col("i"))
      val spans = removals
        .withColumn("prev_end", max(col("i") + lit(w - 1)).over(
          dwin.rowsBetween(W.unboundedPreceding, -1)))
        .withColumn("brk",
          when(col("prev_end").isNull || col("i") > col("prev_end") + 1, 1)
            .otherwise(0))
        .withColumn("grp", sum(col("brk")).over(
          dwin.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("i")).as("s"), (max(col("i")) + lit(w - 1)).as("e"))
      val removalSpans = spans.groupBy("doc_id")
        .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
      var rs: org.apache.spark.sql.DataFrame = null
      val tSpans = t { rs = removalSpans.localCheckpoint(true) }
      val nSpanDocs = rs.count()
      val masked = toks.join(rs, Seq("doc_id"), "left")
        .withColumn("spans", coalesce(col("spans"),
          expr("cast(array() as array<struct<s: int, e: int>>)")))
        .withColumn("kept", expr(
          s"""IF(size(t) = 0, cast(array() as array<string>),
             transform(filter(sequence(1, size(t)),
               j_ -> NOT exists(spans,
                 sp_ -> j_ >= sp_.s AND j_ <= sp_.e)),
               j_ -> element_at(t, j_)))"""))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(col("t")) - size(col("kept"))).cast("long").as("n_removed"),
          concat_ws(" ", col("kept")).as("cleaned_text"))
      val tMaskNoSort = t { masked.write.format("noop")
        .mode("overwrite").save() }
      val tMaskSorted = t { masked.orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save() }
      println(f"DIAG removals=$nRem span_docs=$nSpanDocs " +
        f"t_spans_collect=$tSpans%.1f t_mask_nosort=$tMaskNoSort%.1f " +
        f"t_mask_sorted=$tMaskSorted%.1f")
      toks.unpersist(); removals.unpersist()
    }
    spark.stop()
  }
}
