package graft.queries

/** The batch (non-streaming, non-side-effecting) slice of the query
  * surface, for whole-surface plan audits. */
object GraftQueryAudit {
  def batchQueries: Seq[GraftQuery] =
    graft.SparkEntry.all.filterNot(q => q.name.startsWith("s"))
}
