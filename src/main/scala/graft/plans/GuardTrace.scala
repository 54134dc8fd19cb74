package graft.plans

/** Recorder for RECOVERY-GUARD touches (round 19, VERDICT r18 #5):
  * [[ReadRepair.repairTable]] and [[AdmitLog.scrub]] report every
  * table they guard here, so the repair-coverage audit
  * ([[FamilyRegistry.serveGuarded]]) can assert BEHAVIORALLY that a
  * store family's serve path runs under a guard — instead of the
  * hand-enumerated hook list rounds 17–18 maintained, which a new
  * family could silently fall outside of. Always on: the record is
  * one concurrent-set insert per guard call (guards are per-serve,
  * never per-row), so there is nothing to toggle. */
private[graft] object GuardTrace {
  private val touched =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def record(table: String): Unit = touched.add(table)

  def clear(): Unit = touched.clear()

  def snapshot(): Set[String] = {
    import scala.jdk.CollectionConverters._
    touched.asScala.toSet
  }
}
