package graft.plans

/** Corpus-dir-keyed registry for the oracle-bridge snapshots
  * (VERDICT r17 next #5). The bridge queries (q19d/e/f/g, q70c,
  * q75b, s19, s24, q55b) pin their non-relational selections (fitted
  * memberships, probe picks, trained weights) to disk during run()
  * and replay them in the DuckDB oracle. The snapshot PATHS are
  * fingerprint-keyed on disk (ADVICE r16, `Stores.snapPath`), but a
  * single `@volatile` var paired run and oracle last-run-wins in the
  * JVM: two interleaved runs over different corpus dirs would hand
  * BOTH oracles the second run's snapshot. Keying the registry by
  * the corpus dir closes that — `forDir` pairs each oracle with its
  * own run's artifact, and `latest` keeps the driver contract
  * (Verify reads `oracle` right after running that same dir, so the
  * last completed run is exactly what it wants).
  *
  * put() stores the RESOLVED fingerprinted paths, not the dir — a
  * dir regenerated between a run and its oracle read still serves
  * the run's own snapshot, UNLESS a newer run over the regenerated
  * dir has already retired it ([[Stores.snapPath]] evicts superseded
  * same-tag snapshot dirs, ADVICE r17); the driver's sequential
  * run-then-read never hits that window. */
final class SnapRegistry[A] {
  private val byDir = new java.util.concurrent.ConcurrentHashMap[String, A]()
  @volatile private var lastDir: Option[String] = None

  def put(dir: String, v: A): Unit = { byDir.put(dir, v); lastDir = Some(dir) }
  def forDir(dir: String): Option[A] = Option(byDir.get(dir))
  def latest: Option[A] = lastDir.flatMap(forDir)
}
