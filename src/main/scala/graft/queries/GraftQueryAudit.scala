package graft.queries

/** The batch (non-streaming) slice of the query surface, for
  * whole-surface plan audits. Membership-based: a future batch query
  * whose name happens to start with 's' must still be audited. */
object GraftQueryAudit {
  def batchQueries: Seq[GraftQuery] = {
    val streaming = graft.streaming.StreamQueries.all.toSet
    graft.SparkEntry.all.filterNot(streaming)
  }
}
